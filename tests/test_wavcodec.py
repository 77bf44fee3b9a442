"""Compressed/float WAV decode (functions/wavcodec.py): G.711 companding
round-trips, IMA ADPCM reference-algorithm round-trips, float WAV
exactness, and the multimodal._wav_pcm fallback — closing more of the
"codec-compressed media" gap with formats whose math is public.

Fixture strategy mirrors the reference's pinned-digest approach
(/root/reference/internal/mock/mock.go:53-59): deterministic inputs,
explicit failure modes.
"""

import numpy as np
import pytest

from dupers_spark.functions import wavcodec as wc


def _sine16(n=4096, rate=8000, hz=440, amp=20000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.int16)


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = ref - got.astype(np.float64)
    return 10 * np.log10(np.mean(ref * ref) / max(np.mean(err * err), 1e-12))


# ------------------------------------------------------------ G.711 tables

@pytest.mark.parametrize("enc,lut", [(wc.mulaw_encode, wc._MULAW_LUT),
                                     (wc.alaw_encode, wc._ALAW_LUT)])
def test_g711_tables_are_involutive(enc, lut):
    """decode(encode(decode(byte))) == decode(byte) for every code word —
    the standard companding consistency check. (Byte-exact involution
    holds everywhere except µ-law's negative zero 0x7F, which every
    implementation collapses onto positive zero 0xFF — decode-identical.)"""
    codes = np.arange(256, dtype=np.uint8)
    re = enc(lut[codes].astype(np.int64))
    assert np.array_equal(lut[re], lut[codes])
    assert np.sum(re != codes) <= 1  # only the µ-law negative zero
    pos = np.sort(lut[lut >= 0])
    assert np.all(np.diff(pos) >= 0)


def test_mulaw_known_extremes():
    # byte 0xFF is the µ-law code for 0; 0x7F its negative-zero twin
    assert wc._MULAW_LUT[0xFF] == 0
    assert wc._MULAW_LUT[0x7F] == 0
    assert wc._MULAW_LUT.max() == 32124 and wc._MULAW_LUT.min() == -32124


def test_alaw_known_extremes():
    assert wc._ALAW_LUT.max() == 32256 and wc._ALAW_LUT.min() == -32256
    # A-law has no code for exactly 0 — smallest magnitudes are ±8
    assert np.abs(wc._ALAW_LUT).min() == 8


@pytest.mark.parametrize("tag,min_snr", [(wc.WAVE_MULAW, 30.0),
                                         (wc.WAVE_ALAW, 30.0)])
def test_g711_wav_roundtrip(tag, min_snr):
    x = _sine16()
    data = wc.encode_wav(x, 8000, tag)
    got, rate, nch, full, n_frames = wc.decode_wav_nonpcm(data)
    assert (rate, nch, full, n_frames) == (8000, 1, 32767.0, len(x))
    assert _snr_db(x, got) >= min_snr


def test_float_wav_is_exact():
    x = (np.sin(np.linspace(0, 20, 2048)) * 0.7).astype(np.float32)
    data = wc.encode_wav(x, 16000, wc.WAVE_FLOAT)
    got, rate, nch, full, n_frames = wc.decode_wav_nonpcm(data)
    assert (rate, nch, full, n_frames) == (16000, 1, 1.0, 2048)
    assert np.array_equal(got, x.astype(np.float64))


# ---------------------------------------------------------------- IMA ADPCM

@pytest.mark.parametrize("nch", [1, 2])
def test_ima_adpcm_roundtrip(nch):
    """Reference-algorithm encode → decode at ≥20 dB SNR (4-bit ADPCM's
    nominal quality on a sine), correct frame count, mono-mix contract."""
    mono = _sine16(n=3000, amp=12000)
    x = np.stack([mono] * nch, axis=-1).reshape(-1) if nch > 1 else mono
    data = wc.encode_wav(x, 8000, wc.WAVE_IMA_ADPCM, nch=nch)
    got, rate, got_nch, full, n_frames = wc.decode_wav_nonpcm(data)
    assert (rate, got_nch, full) == (8000, nch, 32767.0)
    assert n_frames == 3000 and len(got) == 3000
    assert _snr_db(mono, got) >= 20.0


def test_ima_adpcm_bad_block_align_is_loud():
    with pytest.raises(wc.UnsupportedWav):
        wc._ima_decode(b"\x00" * 64, nch=3, block_align=64)


# ------------------------------------------------------- format edge cases

def test_extensible_wrapper_unwraps_subformat():
    x = _sine16(n=512)
    data = bytearray(wc.encode_wav(x, 8000, wc.WAVE_MULAW))
    # rewrite fmt to WAVE_FORMAT_EXTENSIBLE with a µ-law subformat GUID
    import struct

    i = data.find(b"fmt ")
    (old_len,) = struct.unpack("<I", data[i + 4:i + 8])
    body = bytes(data[i + 8:i + 8 + old_len])
    ext = (struct.pack("<H", wc.WAVE_EXTENSIBLE) + body[2:16]
           + struct.pack("<HHI", 22, 8, 1)
           + struct.pack("<H", wc.WAVE_MULAW) + b"\x00" * 14)
    new = (bytes(data[:i + 4]) + struct.pack("<I", len(ext)) + ext
           + bytes(data[i + 8 + old_len:]))
    new = b"RIFF" + struct.pack("<I", len(new) - 8) + new[8:]
    got, rate, nch, full, n_frames = wc.decode_wav_nonpcm(bytes(new))
    want, *_ = wc.decode_wav_nonpcm(bytes(data))
    assert np.array_equal(got, want)


def test_unknown_tag_and_garbage_are_loud():
    x = _sine16(n=256)
    data = wc.encode_wav(x, 8000, wc.WAVE_MULAW)
    import struct

    i = data.find(b"fmt ") + 8
    mp3 = data[:i] + struct.pack("<H", 0x0055) + data[i + 2:]
    with pytest.raises(wc.UnsupportedWav, match="0x0055"):
        wc.decode_wav_nonpcm(mp3)
    with pytest.raises(wc.UnsupportedWav):
        wc.decode_wav_nonpcm(b"ID3\x04not a wav at all")


# ------------------------------------------- multimodal._wav_pcm fallback

def test_wav_pcm_falls_back_to_nonpcm_decoders():
    from dupers_spark.operators.multimodal import _wav_features, _wav_pcm

    x = _sine16()
    for tag in (wc.WAVE_MULAW, wc.WAVE_ALAW, wc.WAVE_IMA_ADPCM,
                wc.WAVE_FLOAT):
        src = (x.astype(np.float32) / 32767.0 if tag == wc.WAVE_FLOAT
               else x)
        got, rate, nch, full, n_frames = _wav_pcm(
            wc.encode_wav(src, 8000, tag))
        assert rate == 8000 and n_frames == len(x)
        d, r, c, rms, clip, cent = _wav_features(
            wc.encode_wav(src, 8000, tag))
        assert abs(d - len(x) / 8000) < 1e-9
        # the sine's energy survives every codec: rms ≈ amp/√2 (the
        # centroid is noise-weighted, so only sanity-bound it — the
        # per-format SNR round-trip tests above pin fidelity)
        want_rms = (20000 / 32767.0) / np.sqrt(2)
        assert abs(rms - want_rms) / want_rms < 0.05, (tag, rms)
        assert 0 < cent < 2000, (tag, cent)
    # non-audio bytes still raise (accounted decode_ok=False upstream)
    with pytest.raises(Exception):
        _wav_pcm(b"\x00\x01\x02\x03" * 16)
