"""Pure-stdlib RIFF/AVI video container codec (24-bit DIB + Motion-JPEG).

The container has no ffmpeg/opencv, so — exactly like the WAV-PCM move for
audio (multimodal._wav_features) — we support the mainstream video layouts
that need no codec LIBRARY: AVI with BI_RGB (biCompression = 0) 24-bit DIB
frames ('00db' chunks), and AVI Motion-JPEG ('MJPG' fourcc, '00dc' chunks),
whose frames are plain baseline JPEGs decoded by functions/jpegcodec.py
(incl. the MJPG convention of omitted DHT segments — the decoder falls back
to the Annex-K tables). The layout is the public MSDN/OpenDML AVI spec
(RIFF 'AVI ' → LIST hdrl(avih, LIST strl(strh 'vids', strf
BITMAPINFOHEADER)) → LIST movi → idx1); a DIB frame's pixel payload is
byte-identical to the BMP DIB layout in functions/imagecodec.py (bottom-up
rows, BGR, 4-byte row alignment). Remaining compressed codecs (H.264, …)
are detected via biCompression/strh.fccHandler and raise
``UnsupportedVideo`` — callers record decode_ok=False, never silently skip.

Reference parity: dupers treats media as opaque bytes and hashes them
(pkg/dupe/dupe.go:129-157); this module is part of the §2.8 multimodal
extension (decode / frame-sample as Arrow-batched UDFs), not a port.

All functions are deterministic (no wall clock, no RNG) so the
two-parallelism scaling benchmark doubles as a correctness check.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedVideo(NotImplementedError):
    """Raised for any video payload that would need a codec library."""


def _pad_row(w: int) -> int:
    return (w * 3 + 3) & ~3


def _dib_bits(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → bottom-up BGR rows, 4-byte aligned (BI_RGB)."""
    h, w, _ = frame.shape
    stride = _pad_row(w)
    rows = frame[::-1, :, ::-1]  # bottom-up, RGB→BGR
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = rows.reshape(h, w * 3)
    return out.tobytes()


def _undib_bits(data: bytes, w: int, h: int) -> np.ndarray:
    stride = _pad_row(w)
    if len(data) < stride * h:
        raise UnsupportedVideo("frame chunk shorter than DIB geometry")
    arr = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    rows = arr[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # top-down, BGR→RGB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF chunks are even-sized
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian, the biCompression value


def encode_avi(frames: list[np.ndarray], fps: int = 30,
               codec: str = "DIB") -> bytes:
    """Frames (each (h, w, 3) RGB uint8, all same shape) → real AVI bytes.

    codec "DIB" writes uncompressed BI_RGB '00db' chunks; "MJPG" writes
    Motion-JPEG '00dc' chunks (each frame a baseline JPEG from
    functions/jpegcodec.py). Writes the standard RIFF structure including
    the idx1 index, so the output opens in any AVI reader — used to
    synthesize test/benchmark fixtures (this container is real, only its
    content is synthetic).
    """
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    if codec not in ("DIB", "MJPG"):
        raise ValueError("codec must be 'DIB' or 'MJPG'")
    h, w, _ = frames[0].shape
    for fr in frames:  # validate BEFORE encoding — a mis-shaped frame must
        if fr.shape != (h, w, 3):  # fail here, not deep in the JPEG encoder
            raise ValueError("all frames must share one shape")
    usec = int(round(1_000_000 / fps))
    n = len(frames)

    if codec == "MJPG":
        from dupers_spark.functions.jpegcodec import encode_baseline_jpeg

        payloads = [encode_baseline_jpeg(fr) for fr in frames]
        ctag, fcc, compression = b"00dc", b"MJPG", MJPG_FOURCC
    else:
        payloads = [_dib_bits(fr) for fr in frames]
        ctag, fcc, compression = b"00db", b"DIB ", 0
    frame_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I", usec, frame_bytes * fps, 0, 0x10, n, 0, 1, frame_bytes,
        w, h, 0, 0, 0, 0)
    strh = (b"vids" + fcc + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       frame_bytes, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_chunks, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for bits in payloads:
        movi_chunks.append(_chunk(ctag, bits))
        idx.append(struct.pack("<4sIII", ctag, 0x10, off, len(bits)))
        off += 8 + len(bits) + (len(bits) & 1)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_len) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def probe_avi(data: bytes) -> dict:
    """Parse container metadata WITHOUT decoding pixels → dict with
    width, height, fps, n_frames, fourcc, compression, stream_no (the
    0-based index of the 'vids' stream within hdrl — its two-digit chunk
    prefix inside movi). Raises UnsupportedVideo on non-AVI bytes,
    codec-compressed streams, or containers with no video stream.

    The strf is bound to the strl whose strh declares fccType 'vids'
    (tracked via ``cur_type``) — an audio strl appearing first must NOT
    have its WAVEFORMATEX misread as a BITMAPINFOHEADER."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise UnsupportedVideo("not a RIFF/AVI payload")
    meta: dict = {}
    stream_no = -1
    for tag, p, n in _iter_chunks(data, 12, len(data)):
        if tag != b"LIST" or data[p:p + 4] != b"hdrl":
            continue
        for t2, p2, n2 in _iter_chunks(data, p + 4, p + n):
            if t2 == b"avih":
                f = struct.unpack_from("<14I", data, p2)
                meta.update(usec_per_frame=f[0], n_frames=f[4],
                            width=f[8], height=f[9])
            elif t2 == b"LIST" and data[p2:p2 + 4] == b"strl":
                stream_no += 1
                cur_type = None
                for t3, p3, n3 in _iter_chunks(data, p2 + 4, p2 + n2):
                    if t3 == b"strh":
                        cur_type = data[p3:p3 + 4]
                        if cur_type == b"vids" and "stream_no" not in meta:
                            meta["stream_no"] = stream_no
                            meta["fourcc"] = data[p3 + 4:p3 + 8].decode(
                                "ascii", "replace").strip()
                    elif (t3 == b"strf" and cur_type == b"vids"
                          and meta.get("stream_no") == stream_no
                          and "compression" not in meta):
                        # bind the strf to the SELECTED vids strl only — a
                        # second vids stream's format must never describe
                        # the first stream's chunks (frames would be read
                        # from one stream's prefix with another's codec);
                        # a selected strl with no strf falls through to
                        # the loud UnsupportedVideo below
                        bi = struct.unpack_from("<IiiHHI", data, p3)
                        meta["compression"] = bi[5]
                        meta["bit_count"] = bi[4]
        break
    if "width" not in meta:
        raise UnsupportedVideo("AVI without an avih header")
    if "stream_no" not in meta or "compression" not in meta:
        raise UnsupportedVideo("AVI without a 'vids' strl/strf stream header")
    if meta["compression"] == 0 and meta.get("bit_count", 24) == 24:
        meta["codec"] = "DIB"
    elif meta["compression"] == MJPG_FOURCC:
        meta["codec"] = "MJPG"  # frames are baseline JPEGs (jpegcodec.py)
    else:
        raise UnsupportedVideo(
            f"compressed/non-24-bit video ({meta.get('fourcc')!r}, "
            f"biCompression={meta.get('compression')}) needs a codec "
            "library absent from this container")
    meta["fps"] = (round(1_000_000 / meta["usec_per_frame"], 3)
                   if meta["usec_per_frame"] else 0.0)
    return meta


def _iter_movi_chunks(data: bytes, start: int, end: int):
    """Flatten a movi chunk run, recursing into 'LIST rec ' interleave
    groups (the standard OpenDML layout for interleaved A/V)."""
    for tag, p, n in _iter_chunks(data, start, end):
        if tag == b"LIST" and data[p:p + 4] == b"rec ":
            yield from _iter_movi_chunks(data, p + 4, p + n)
        else:
            yield tag, p, n


def iter_avi_frames(data: bytes, every_n: int = 1):
    """Yield (frame_no, (h, w, 3) RGB uint8) for frames 0, every_n,
    2·every_n, … — only SAMPLED frames are decoded; skipped chunks cost a
    header read. Only the 'vids' stream's '##db'/'##dc' BI_RGB chunks are
    counted as frames (## = the stream's two-digit prefix from probe_avi),
    so a second stream's '01db' chunks and 'rec '-grouped interleaving are
    handled per spec instead of miscounted."""
    meta = probe_avi(data)
    w, h = meta["width"], meta["height"]
    if meta["codec"] == "MJPG":
        from dupers_spark.functions.jpegcodec import decode_baseline_jpeg

        def decode(chunk: bytes) -> np.ndarray:
            try:
                px = decode_baseline_jpeg(chunk)
            except (ValueError, NotImplementedError) as e:
                raise UnsupportedVideo(f"bad MJPG frame: {e}") from e
            if px.shape != (h, w, 3):
                raise UnsupportedVideo("MJPG frame geometry != container")
            return px
    else:
        def decode(chunk: bytes) -> np.ndarray:
            return _undib_bits(chunk, w, h)
    prefix = b"%02d" % meta["stream_no"]
    frame_no = 0
    for tag, p, n in _iter_chunks(data, 12, len(data)):
        if tag != b"LIST" or data[p:p + 4] != b"movi":
            continue
        for t2, p2, n2 in _iter_movi_chunks(data, p + 4, p + n):
            if t2[:2] != prefix or t2[2:4] not in (b"db", b"dc"):
                continue  # other streams / index droppings
            if frame_no % every_n == 0:
                yield frame_no, decode(data[p2:p2 + n2])
            frame_no += 1
        break
