"""Multimodal decode/feature/PSNR stage — the BASELINE per-row invariants."""

import pytest
from pyspark.sql import functions as F

from dupers_spark.operators import exact, multimodal as mm
from dupers_spark.sources import datagen

N = 200


def test_recomputed_phash_matches_stored_for_lossless(spark, images_small):
    feats = mm.image_features(images_small)
    chk = feats.join(
        images_small.select(
            "image_id", F.col("phash").alias("phash_stored"), "fmt"
        ),
        "image_id",
    ).filter(F.col("decode_ok") & (F.col("fmt") != "jpg"))
    assert chk.filter(F.col("phash") != F.col("phash_stored")).count() == 0
    assert chk.count() > 0


def test_zero_byte_row_flagged_not_decoded(spark, images_small):
    feats = mm.image_features(images_small)
    bad = feats.filter(~F.col("decode_ok")).collect()
    assert [r["image_id"] for r in bad] == datagen.zero_byte_ids(N)


def test_exact_pairs_psnr_infinite_and_captions_equal(spark, images_small):
    """Byte-identical pairs decode to identical pixels (PSNR = inf) and
    carry equal captions — the decoded-pixel allclose + caption-equality
    invariant on the exact engine's output."""
    sigs = exact.signatures(images_small)
    pairs = exact.dup_pairs(sigs).select("a", "b")
    scored = mm.pair_psnr(pairs, images_small).collect()
    assert scored
    for r in scored:
        assert r["pixels_comparable"]
        assert r["psnr_db"] is None or r["psnr_db"] > 100  # inf → None via float? keep loose
    caps = {r["image_id"]: r["caption"] for r in images_small.select("image_id", "caption").collect()}
    for r in scored:
        assert caps[r["a"]] == caps[r["b"]]


def test_reencoded_near_dups_meet_psnr_gate(spark, images_small):
    """r0 vs r2 (same pixels, different codec — lossy allowed): PSNR ≥ 40 dB
    (BASELINE input_hint invariant)."""
    pairs = spark.createDataFrame(
        [(f"img_{g*10:08d}", f"img_{g*10+2:08d}") for g in range(N // 10)],
        ["a", "b"],
    )
    scored = mm.pair_psnr(pairs, images_small).collect()
    assert scored
    for r in scored:
        assert r["pixels_comparable"]
        assert r["psnr_db"] is None or r["psnr_db"] >= 40.0


def test_thumbnails(spark, images_small):
    th = mm.image_thumbnails(images_small, size=8)
    rows = th.filter(F.col("thumb").isNotNull()).collect()
    assert len(rows) == N - 1
    assert all(len(r["thumb"]) == 64 for r in rows)


def _make_wav(freq_hz: float, seconds: float = 0.5, rate: int = 8000,
              amp: float = 0.5, width: int = 2, channels: int = 1) -> bytes:
    """Synthesize a PCM sine-wave WAV entirely with stdlib wave + numpy."""
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * seconds)) / rate
    # clip like a real recorder/DAC would: amp > 1 saturates at full scale
    x = np.clip(amp * np.sin(2 * np.pi * freq_hz * t), -1.0, 1.0)
    if width == 2:
        pcm = (x * 32767).astype("<i2")
    elif width == 1:
        pcm = ((x * 127) + 128).astype("u1")
    else:
        raise ValueError(width)
    if channels == 2:
        pcm = np.repeat(pcm, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_audio_features_real_wav_pcm(spark):
    """audio_features is REAL for WAV-PCM: duration/rate exact, RMS of an
    A-sine = amp/√2, a clipped square wave shows clipping_rate ≈ 1, and the
    spectral centroid of a pure tone sits near its frequency. Non-WAV
    payloads surface as decode_ok=False rows, never exceptions."""
    import numpy as np

    sine = _make_wav(440.0, amp=0.5)
    loud = _make_wav(100.0, amp=2.0)        # int16 saturates → clipping
    stereo8 = _make_wav(440.0, amp=0.5, width=1, channels=2)
    df = spark.createDataFrame(
        [("sine", bytearray(sine)), ("loud", bytearray(loud)),
         ("stereo8", bytearray(stereo8)), ("junk", bytearray(b"not a wav"))],
        ["media_id", "bytes"],
    )
    rows = {r["media_id"]: r for r in mm.audio_features(df).collect()}
    assert len(rows) == 4
    s = rows["sine"]
    assert s["decode_ok"] and s["sample_rate"] == 8000 and s["n_channels"] == 1
    assert abs(s["duration_s"] - 0.5) < 1e-9
    assert abs(s["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert s["clipping_rate"] < 0.001
    assert 350 < s["spectral_centroid_hz"] < 900  # tone + window leakage
    assert rows["loud"]["clipping_rate"] > 0.5    # saturated square-ish
    st = rows["stereo8"]
    assert st["decode_ok"] and st["n_channels"] == 2
    assert abs(st["rms"] - 0.5 / np.sqrt(2)) < 0.02  # 8-bit quantization
    assert not rows["junk"]["decode_ok"]


# ---------------------------------------------------------------- video

def _frame(seed: int, i: int, w: int = 32, h: int = 24):
    """Deterministic coarse-block frame: distinct phash per (seed, i)."""
    import numpy as np

    rng = np.random.default_rng(seed * 100_003 + i)
    block = rng.integers(0, 256, (h // 8, w // 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(block, 8, axis=0), 8, axis=1)


def _make_video(seed: int, n_frames: int, fps: int = 10) -> bytes:
    from dupers_spark.functions.videocodec import encode_avi

    return encode_avi([_frame(seed, i) for i in range(n_frames)], fps=fps)


def test_avi_codec_roundtrip():
    """encode_avi → iter_avi_frames reproduces every pixel; probe_avi reads
    the container geometry without decoding."""
    import numpy as np

    from dupers_spark.functions import videocodec as vc

    frames = [_frame(7, i) for i in range(5)]
    data = vc.encode_avi(frames, fps=25)
    meta = vc.probe_avi(data)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 5)
    assert meta["fps"] == 25.0 and meta["fourcc"] == "DIB"
    decoded = list(vc.iter_avi_frames(data))
    assert [f for f, _ in decoded] == [0, 1, 2, 3, 4]
    for (_, px), orig in zip(decoded, frames):
        assert np.array_equal(px, orig)
    # odd width exercises 4-byte row padding
    odd = [_frame(9, 0)[:, :31], _frame(9, 1)[:, :31]]
    rt = list(vc.iter_avi_frames(vc.encode_avi(odd, fps=10)))
    assert np.array_equal(rt[1][1], odd[1])
    with pytest.raises(NotImplementedError):
        vc.probe_avi(b"RIFFxxxxNOPE")


def test_avi_mjpg_codec_roundtrip():
    """Motion-JPEG AVIs decode for real: '00dc' chunks are baseline JPEGs
    (functions/jpegcodec.py), probe reports codec MJPG, and per-frame
    reconstruction meets the ≥40 dB lossy invariant. A non-MJPG compressed
    fourcc still raises (accounted decode_ok=False upstream)."""
    import struct

    import numpy as np

    from dupers_spark.functions import videocodec as vc
    from dupers_spark.functions.imagecodec import psnr

    frames = [_frame(13, i) for i in range(4)]
    data = vc.encode_avi(frames, fps=10, codec="MJPG")
    meta = vc.probe_avi(data)
    assert meta["codec"] == "MJPG" and meta["fourcc"] == "MJPG"
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 24, 4)
    decoded = list(vc.iter_avi_frames(data))
    assert [f for f, _ in decoded] == [0, 1, 2, 3]
    for (_, px), orig in zip(decoded, frames):
        assert px.shape == orig.shape
        assert psnr(px, orig) >= 40.0
    # H.264-style fourcc is still unsupported, loudly
    h264 = data.replace(struct.pack("<I", vc.MJPG_FOURCC),
                        b"H264").replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(NotImplementedError):
        vc.probe_avi(h264)


def _make_interleaved_avi(frames, fps: int = 10) -> bytes:
    """Hand-build a spec-shaped AVI the simple encoder never emits: an
    AUDIO strl FIRST in hdrl (so the video stream is stream 01), movi
    frames wrapped in 'LIST rec ' interleave groups, each group carrying
    the audio stream's '00wb' chunk before the video '01db' chunk. Probes
    the two ADVICE-flagged parse paths: strf must bind to the 'vids' strl
    (not the first strl) and frame iteration must recurse into rec groups
    matching only the video stream's prefix."""
    import struct

    from dupers_spark.functions import videocodec as vc

    h, w, _ = frames[0].shape
    usec = int(round(1_000_000 / fps))
    n = len(frames)
    frame_bytes = vc._pad_row(w) * h
    avih = struct.pack("<14I", usec, frame_bytes * fps, 0, 0x10, n, 0, 2,
                       frame_bytes, w, h, 0, 0, 0, 0)
    # stream 0: audio — its strf is a WAVEFORMATEX, NOT a BITMAPINFOHEADER
    strh_a = (b"auds" + b"\x00\x00\x00\x00" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, n, 320, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, 0, 0))
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)  # PCM fmt
    # stream 1: the video stream
    strh_v = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h))
    strf_v = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                         0, 0, 0, 0)
    hdrl = vc._list(
        b"hdrl",
        vc._chunk(b"avih", avih)
        + vc._list(b"strl", vc._chunk(b"strh", strh_a)
                   + vc._chunk(b"strf", strf_a))
        + vc._list(b"strl", vc._chunk(b"strh", strh_v)
                   + vc._chunk(b"strf", strf_v)))
    recs = []
    for fr in frames:
        recs.append(vc._list(
            b"rec ",
            vc._chunk(b"00wb", b"\x00" * 320)          # audio payload
            + vc._chunk(b"01db", vc._dib_bits(fr))))   # video frame
    movi = vc._list(b"movi", b"".join(recs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_interleaved_rec_groups_and_audio_first_strl():
    """An audio-first, rec-grouped AVI decodes exactly like the simple
    layout: strf binds to the vids strl, '00wb' audio chunks are not
    counted as frames, and rec groups are recursed into."""
    import numpy as np

    from dupers_spark.functions import videocodec as vc

    frames = [_frame(11, i) for i in range(4)]
    data = _make_interleaved_avi(frames, fps=10)
    meta = vc.probe_avi(data)
    assert meta["stream_no"] == 1
    assert meta["compression"] == 0 and meta["bit_count"] == 24
    assert (meta["width"], meta["height"]) == (32, 24)
    decoded = list(vc.iter_avi_frames(data))
    assert [f for f, _ in decoded] == [0, 1, 2, 3]
    for (_, px), orig in zip(decoded, frames):
        assert np.array_equal(px, orig)
    # sampling honors the true frame numbering across rec groups
    sampled = list(vc.iter_avi_frames(data, every_n=2))
    assert [f for f, _ in sampled] == [0, 2]


def test_avi_without_vids_stream_is_unsupported_not_misparsed():
    """An AVI whose only strl is audio must raise UnsupportedVideo (an
    accounted decode_ok=False row) — not have its WAVEFORMATEX misread as
    a BITMAPINFOHEADER."""
    import struct

    import pytest as _pytest

    from dupers_spark.functions import videocodec as vc

    avih = struct.pack("<14I", 100000, 0, 0, 0x10, 0, 0, 1, 0, 32, 24,
                       0, 0, 0, 0)
    strh_a = (b"auds" + b"\x00\x00\x00\x00"
              + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 1, 320,
                            0xFFFFFFFF, 0) + struct.pack("<4H", 0, 0, 0, 0))
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    hdrl = vc._list(b"hdrl", vc._chunk(b"avih", avih)
                    + vc._list(b"strl", vc._chunk(b"strh", strh_a)
                               + vc._chunk(b"strf", strf_a)))
    body = b"AVI " + hdrl + vc._list(b"movi", b"")
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with _pytest.raises(vc.UnsupportedVideo):
        vc.probe_avi(data)


def test_video_frame_sampling(spark):
    """sample_video_frames decodes only frames 0, n, 2n, … re-encoded as
    PNG; undecodable payloads surface as ONE decode_ok=False row."""
    import numpy as np

    from dupers_spark.functions.imagecodec import decode_png

    vid = _make_video(1, n_frames=10, fps=10)
    df = spark.createDataFrame(
        [("v1", bytearray(vid)), ("junk", bytearray(b"mpeg4 maybe"))],
        ["media_id", "bytes"],
    )
    rows = mm.sample_video_frames(df, every_n=4).collect()
    good = sorted((r for r in rows if r["media_id"] == "v1"),
                  key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in good] == [0, 4, 8]
    assert [round(r["ts_s"], 3) for r in good] == [0.0, 0.4, 0.8]
    assert np.array_equal(decode_png(bytes(good[1]["frame_png"])), _frame(1, 4))
    bad = [r for r in rows if r["media_id"] == "junk"]
    assert len(bad) == 1 and not bad[0]["decode_ok"]
    assert bad[0]["frame_no"] is None


def test_video_near_dup_trimmed_copy(spark):
    """The frame-phash shingle engine pairs a video with its trimmed copy
    (9/11 shared 2-shingles → Jaccard ≈ 0.82) but not with unrelated
    content; codec-compressed payloads are excluded with accounting."""
    from dupers_spark.functions.videocodec import encode_avi
    from dupers_spark.operators import video as vo
    from dupers_spark.operators.components import connected_components

    full = [_frame(5, i) for i in range(12)]
    orig = encode_avi(full, fps=10)
    trimmed = encode_avi(full[2:], fps=10)
    other = _make_video(6, n_frames=12)
    df = spark.createDataFrame(
        [("orig", bytearray(orig)), ("trim", bytearray(trimmed)),
         ("other", bytearray(other)), ("h264", bytearray(b"\x00\x00junk"))],
        ["media_id", "bytes"],
    )
    edges, verified, dropped = vo.video_near_dup_edges(df, every_n=1)
    v = verified.collect()
    assert {tuple(sorted((r["a"], r["b"]))) for r in v} == {("orig", "trim")}
    assert v[0]["sim"] >= 0.7
    assert dropped.count() == 0
    labels = {r["image_id"]: r["component_id"]
              for r in connected_components(edges).collect()}
    assert labels["orig"] == labels["trim"]
    # undecodable payload accounted via video_features, not silently lost
    feats = mm.video_features(df, every_n=1)
    assert feats.filter(~F.col("decode_ok")).count() == 1


def test_audio_near_dup_gain_and_trim(spark):
    """The windowed peak-band fingerprint engine: a half-gain copy is
    token-IDENTICAL (rank statistics are gain-invariant) and a
    window-aligned trim pairs via shingle Jaccard; unrelated clips and
    undecodable payloads stay out."""
    from dupers_spark.operators import audio as ao
    from dupers_spark.sources import datagen as dg

    clips = dg.make_audio(spark, 10)  # one full group: r0..r9
    df = clips.unionByName(spark.createDataFrame(
        [("badbytes", bytearray(b"not a wav"), 0, "wav")],
        dg.AUDIO_SCHEMA))

    toks = {r["media_id"]: r["caption"]
            for r in ao.audio_token_table(df).collect()}
    assert "badbytes" not in toks  # undecodable excluded here
    assert toks["aud_00000000"] == toks["aud_00000001"]  # gain-invariant
    assert toks["aud_00000000"].split()[2:] == \
        toks["aud_00000002"].split()  # trim drops exactly 2 leading tokens

    edges, verified, _dropped = ao.audio_near_dup_edges(df)
    groups = {tuple(sorted((r["a"], r["b"]))) for r in edges.collect()}
    # {r0, r1, r2} connect (any spanning shape); no edge touches r3..r9
    touched = {x for e in groups for x in e}
    assert touched == {"aud_00000000", "aud_00000001", "aud_00000002"}
    sims = {tuple(sorted((r["a"], r["b"]))): r["sim"]
            for r in verified.collect()}
    trim_pair = tuple(sorted(("aud_00000000", "aud_00000002")))
    if trim_pair in sims:  # r2 may verify against r0 or the collapsed rep
        assert sims[trim_pair] >= 0.8


def test_audio_token_table_accounting_is_exact(spark):
    """Every row audio_features reports decode_ok=True appears in the token
    table — including a VALID zero-frame WAV, which gets the empty-clip
    sentinel token instead of being silently dropped (ADVICE round-5: the
    old blanket except undercounted drops)."""
    import io
    import wave

    from dupers_spark.operators import audio as ao

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"")  # zero frames, still a valid WAV
    empty_wav = buf.getvalue()

    df = spark.createDataFrame(
        [("empty", bytearray(empty_wav)),
         ("tone", bytearray(_make_wav(440.0))),
         ("junk", bytearray(b"not a wav"))],
        ["media_id", "bytes"])
    feats = {r["media_id"]: r["decode_ok"]
             for r in mm.audio_features(df).collect()}
    toks = {r["media_id"]: r["caption"]
            for r in ao.audio_token_table(df).collect()}
    # exact accounting: token-table membership ≡ decode_ok
    assert set(toks) == {m for m, ok in feats.items() if ok} == \
        {"empty", "tone"}
    assert toks["empty"] == str(ao.EMPTY_CLIP_TOKEN)
    # two empty clips are duplicates of each other (identical captions)
    assert not feats["junk"]


def test_encode_avi_validates_shapes_before_encoding():
    """A mis-shaped frame must fail with the intended message, not a
    confusing error from deep inside the JPEG encoder after wasted work."""
    import pytest

    from dupers_spark.functions import videocodec as vc

    frames = [_frame(1, 0), _frame(1, 1)[..., 0]]  # second frame is 2-D
    for codec in ("DIB", "MJPG"):
        with pytest.raises(ValueError, match="share one shape"):
            vc.encode_avi(frames, codec=codec)
