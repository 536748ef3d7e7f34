"""Perceptual image hashing + hamming near-dup (operators/multimodal)."""

from __future__ import annotations

import numpy as np

from tabata_spark.operators.multimodal import phash64, phash_near_pairs, with_phash
from tests.test_multimodal_codecs import make_png


def _img(seed: int, h: int = 48, w: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth structure (random low-freq field) so perceptual hashing
    # has something perceptual to hold on to
    base = rng.integers(0, 255, (6, 6, 3))
    img = np.kron(base, np.ones((h // 6, w // 6, 1))).astype(np.uint8)
    return img


def test_phash_invariant_to_noise_and_scale():
    a = _img(1)
    # light pixel noise
    noisy = np.clip(
        a.astype(int) + np.random.default_rng(2).integers(-6, 7, a.shape),
        0,
        255,
    ).astype(np.uint8)
    # 2x upscale (same picture, different resolution)
    big = np.kron(a, np.ones((2, 2, 1))).astype(np.uint8)
    ha, hn, hb = phash64(a), phash64(noisy), phash64(big)
    # standard pHash near-dup band is <= 10 of 64 bits
    assert bin((ha ^ hn) & ((1 << 64) - 1)).count("1") <= 10
    # a rescale is the SAME continuous image: area-resample makes the
    # hash exactly scale-consistent
    assert ha == hb
    # a different picture is far away
    other = phash64(_img(99))
    assert bin((ha ^ other) & ((1 << 64) - 1)).count("1") > 10


def test_with_phash_and_near_pairs(spark):
    imgs = {
        0: _img(1),
        1: np.kron(_img(1), np.ones((2, 2, 1))).astype(np.uint8),  # dup of 0
        2: _img(7),
        3: _img(8),
        4: _img(1, 96, 96),  # another rescale of 0
    }
    rows = [(i, bytearray(make_png(im))) for i, im in imgs.items()]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    hashed = with_phash(media)
    assert hashed.count() == 5
    pairs = {
        (r["id_a"], r["id_b"])
        for r in phash_near_pairs(hashed, max_hamming=6).collect()
    }
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    assert all({a, b} <= {0, 1, 4} for a, b in pairs)  # no false pairs


def test_near_pairs_rejects_unsound_max_hamming(spark):
    # The pigeonhole guarantee needs max_hamming <= n_blocks-1; beyond
    # it recall is silently incomplete, so the operator must refuse.
    import pytest

    hashed = spark.createDataFrame([(0, 1), (1, 2)], "doc_id long, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_pairs(hashed, max_hamming=8, n_blocks=8)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_pairs(hashed, max_hamming=10, n_blocks=8)


def test_undecodable_blobs_are_skipped(spark):
    rows = [
        (0, bytearray(make_png(_img(3)))),
        (1, bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    assert with_phash(media).count() == 1
