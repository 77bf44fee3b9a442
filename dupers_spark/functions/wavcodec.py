"""Pure-numpy decode of the WAV variants the stdlib ``wave`` module
rejects: IEEE float (format tag 3), ITU-T G.711 A-law (6) and µ-law (7),
IMA/DVI ADPCM (0x11), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping any of
those. Every format here is a public spec (RIFF/WAVE layout, the G.711
companding formulas, the IMA ADPCM reference algorithm) implementable
without a codec LIBRARY — the same rule that admitted WAV-PCM, AVI/DIB
and baseline JPEG. Anything else (MP3, AAC, …) still surfaces as an
accounted decode_ok=False row upstream.

Encoders for the same formats are included so tests can round-trip real
bytes (fixture policy: real container, synthetic content).

Reference parity: dupers hashes opaque bytes (pkg/dupe/dupe.go:129-157);
decoding is this repo's §2.8 multimodal addition.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_PCM = 0x0001
WAVE_FLOAT = 0x0003
WAVE_ALAW = 0x0006
WAVE_MULAW = 0x0007
WAVE_IMA_ADPCM = 0x0011
WAVE_EXTENSIBLE = 0xFFFE


class UnsupportedWav(ValueError):
    """Format tag / layout outside the decodable set — callers account
    these rows as decode_ok=False, never drop them silently."""


# ------------------------------------------------------------ RIFF parsing

def _chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedWav("not a RIFF/WAVE stream")
    i = 12
    n = len(data)
    while i + 8 <= n:
        tag = data[i:i + 4]
        (size,) = struct.unpack("<I", data[i + 4:i + 8])
        yield tag, i + 8, min(size, n - i - 8)
        i += 8 + size + (size & 1)  # chunks are word-aligned


def _parse(data: bytes) -> tuple[dict, bytes, int | None]:
    fmt: dict = {}
    payload = b""
    fact_samples = None
    for tag, p, sz in _chunks(data):
        body = data[p:p + sz]
        if tag == b"fmt ":
            (ftag, nch, rate, _bps, balign, bits) = struct.unpack(
                "<HHIIHH", body[:16])
            if ftag == WAVE_EXTENSIBLE:
                if sz < 26:
                    raise UnsupportedWav("EXTENSIBLE fmt without subformat")
                # cbSize(2) validBits(2) mask(4) then the GUID whose first
                # two bytes are the real format tag
                (ftag,) = struct.unpack("<H", body[24:26])
            fmt = {"tag": ftag, "nch": nch, "rate": rate,
                   "block_align": balign, "bits": bits}
        elif tag == b"fact":
            (fact_samples,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            payload = body
    if not fmt:
        raise UnsupportedWav("WAV without a fmt chunk")
    if fmt["nch"] < 1:
        raise UnsupportedWav("WAV with zero channels")
    return fmt, payload, fact_samples


# -------------------------------------------------- G.711 companding (pub)

def _mulaw_decode_table() -> np.ndarray:
    u = (~np.arange(256, dtype=np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) | 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = (a & 0x80) != 0  # NB: in A-law a SET sign bit means POSITIVE
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) | 8,
                   (((mant << 4) | 0x108) << (exp - 1)))
    return np.where(sign, mag, -mag).astype(np.int16)


_MULAW_LUT = _mulaw_decode_table()
_ALAW_LUT = _alaw_decode_table()


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear → µ-law bytes (G.711, bias 0x84, clip 32635)."""
    x = np.clip(x.astype(np.int64), -32635, 32635)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.abs(x) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear → A-law bytes (G.711, even-bit inversion 0x55)."""
    x = np.clip(x.astype(np.int64), -32767, 32767)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.abs(x)
    exp = (np.floor(np.log2(np.maximum(mag, 1))) - 7).clip(0, 7).astype(np.int64)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


# ------------------------------------------------ IMA ADPCM (ref algorithm)

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_nibbles(nibs: np.ndarray, pred: int, idx: int) -> np.ndarray:
    out = np.empty(len(nibs), dtype=np.int64)
    for i, nib in enumerate(nibs):
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX[nib & 7])))
        out[i] = pred
    return out


def _ima_decode(payload: bytes, nch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk → interleaved int16 samples (n, nch). Each
    block: per-channel 4-byte header (predictor int16, step index, pad),
    then 4-byte-per-channel interleaved nibble words."""
    if (block_align < 4 * nch or block_align % 4
            or (block_align - 4 * nch) % (4 * nch)):
        raise UnsupportedWav("bad IMA ADPCM block alignment")
    spb = (block_align - 4 * nch) * 2 // nch + 1  # samples/channel/block
    chans = [[] for _ in range(nch)]
    for b0 in range(0, len(payload) - block_align + 1, block_align):
        block = payload[b0:b0 + block_align]
        for c in range(nch):
            pred, idx = struct.unpack_from("<hB", block, 4 * c)
            if idx > 88:
                raise UnsupportedWav("IMA step index out of range")
            # data words: groups of 4 bytes rotate across channels
            raw = np.frombuffer(block, dtype=np.uint8)[4 * nch:]
            words = raw.reshape(-1, 4 * nch)[:, 4 * c:4 * c + 4].reshape(-1)
            nibs = np.empty(len(words) * 2, dtype=np.uint8)
            nibs[0::2] = words & 0x0F
            nibs[1::2] = words >> 4
            chans[c].append(np.concatenate(
                [[pred], _ima_decode_nibbles(nibs, pred, idx)])[:spb])
    cols = [np.concatenate(ch) if ch else np.empty(0, dtype=np.int64)
            for ch in chans]
    return np.stack(cols, axis=-1)


def ima_encode(x: np.ndarray, nch: int = 1,
               block_align: int = 256) -> tuple[bytes, int]:
    """Interleaved int16 (n, nch) → (IMA ADPCM payload, samples/channel) —
    the reference encoder, for fixture synthesis and round-trip tests."""
    x = x.reshape(-1, nch).astype(np.int64)
    spb = (block_align - 4 * nch) * 2 // nch + 1
    n = x.shape[0]
    nblocks = -(-n // spb) if n else 0
    pad = nblocks * spb - n
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)])
    out = bytearray()
    idx = [0] * nch
    for b in range(nblocks):
        seg = x[b * spb:(b + 1) * spb]
        headers = b""
        nib_cols = []
        for c in range(nch):
            pred = int(seg[0, c])
            headers += struct.pack("<hBB", pred, idx[c], 0)
            nibs = np.empty(spb - 1, dtype=np.uint8)
            for i in range(spb - 1):
                step = int(_IMA_STEPS[idx[c]])
                delta = int(seg[i + 1, c]) - pred
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                diff = step >> 3
                if delta >= step:
                    nib |= 4
                    delta -= step
                    diff += step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                    diff += step >> 1
                if delta >= step >> 2:
                    nib |= 1
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx[c] = max(0, min(88, idx[c] + int(_IMA_INDEX[nib & 7])))
                nibs[i] = nib
            if len(nibs) % 2:
                nibs = np.append(nibs, 0)
            nib_cols.append((nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8))
        words = np.stack([col.reshape(-1, 4) for col in nib_cols], axis=1)
        out += headers + words.tobytes()
    return bytes(out), spb


# ------------------------------------------------------------------ decode

def decode_wav_nonpcm(data: bytes) -> tuple:
    """WAV bytes (float / A-law / µ-law / IMA ADPCM) → the same contract as
    multimodal._wav_pcm: (mono float64 samples, rate, n_channels,
    full_scale, n_frames). Raises UnsupportedWav for anything else."""
    fmt, payload, fact = _parse(data)
    tag, nch = fmt["tag"], fmt["nch"]
    if tag == WAVE_FLOAT:
        if fmt["bits"] == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        elif fmt["bits"] == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float64)
        else:
            raise UnsupportedWav(f"float WAV with bits={fmt['bits']}")
        x = x[:len(x) - len(x) % nch]
        full = 1.0
    elif tag in (WAVE_ALAW, WAVE_MULAW):
        lut = _ALAW_LUT if tag == WAVE_ALAW else _MULAW_LUT
        x = lut[np.frombuffer(payload, dtype=np.uint8)].astype(np.float64)
        x = x[:len(x) - len(x) % nch]
        full = 32767.0
    elif tag == WAVE_IMA_ADPCM:
        dec = _ima_decode(payload, nch, fmt["block_align"])
        if fact is not None:
            dec = dec[:fact]
        return (dec.mean(axis=1).astype(np.float64), fmt["rate"], nch,
                32767.0, dec.shape[0])
    elif tag == WAVE_PCM:
        raise UnsupportedWav(
            "PCM belongs to the stdlib wave path (multimodal._wav_pcm)")
    else:
        raise UnsupportedWav(f"WAV format tag 0x{tag:04X} needs a codec "
                             "library absent from this container")
    n_frames = len(x) // nch
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    if fact is not None and fact < n_frames:
        x, n_frames = x[:fact], fact
    return x, fmt["rate"], nch, full, n_frames


# ------------------------------------------------------------------ encode

def write_wav(tag: int, rate: int, nch: int, payload: bytes,
              bits: int, block_align: int, n_samples: int) -> bytes:
    """Assemble a minimal RIFF/WAVE stream (fmt + fact + data)."""
    fmt = struct.pack("<HHIIHH", tag, nch, rate,
                      rate * block_align, block_align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<II", 4, n_samples))
    data = b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        data += b"\x00"
    body = b"WAVE" + chunks + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav(x: np.ndarray, rate: int, tag: int, nch: int = 1,
               block_align: int = 256) -> bytes:
    """Mono/interleaved int16 (or float in [-1,1] for WAVE_FLOAT) → WAV
    bytes in the requested format — the test/fixture twin of
    decode_wav_nonpcm."""
    if tag == WAVE_FLOAT:
        payload = x.astype("<f4").tobytes()
        return write_wav(tag, rate, nch, payload, 32, 4 * nch,
                         len(x) // nch)
    if tag == WAVE_MULAW:
        return write_wav(tag, rate, nch, mulaw_encode(x).tobytes(), 8, nch,
                         len(x) // nch)
    if tag == WAVE_ALAW:
        return write_wav(tag, rate, nch, alaw_encode(x).tobytes(), 8, nch,
                         len(x) // nch)
    if tag == WAVE_IMA_ADPCM:
        payload, spb = ima_encode(x, nch=nch, block_align=block_align)
        bits = 4
        return write_wav(tag, rate, nch, payload, bits, block_align,
                         len(x) // nch)
    raise UnsupportedWav(f"no encoder for tag 0x{tag:04X}")
