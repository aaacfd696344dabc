"""Perceptual-hash image dedup: dHash invariance (brightness shift,
re-encode), sensitivity (different patterns far apart), banded
Hamming join exactness, and non-image exclusion."""

import numpy as np
from pyspark.sql import functions as F

from xtdb_spark.pipeline import multimodal
from xtdb_spark.pipeline.codecs import encode_bmp, encode_png, encode_wav
from xtdb_spark.pipeline.dedup import near_dup_phash


def _gradient(w=64, h=64, tilt=1.0, bright=0):
    x = np.arange(w)[None, :] * tilt + np.arange(h)[:, None] * 0.5
    px = ((x % 256) + bright).clip(0, 255).astype(np.uint8)
    return np.repeat(px[:, :, None], 3, axis=2)


def _checker(w=64, h=64, cell=8):
    y, x = np.mgrid[0:h, 0:w]
    px = (((x // cell + y // cell) % 2) * 255).astype(np.uint8)
    return np.repeat(px[:, :, None], 3, axis=2)


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, content binary")


def _hashes(spark, rows):
    df = multimodal.phash_images(_media(spark, rows))
    return {r["media_id"]: (r["phash"], r["ok"]) for r in df.collect()}


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_invariance_and_sensitivity(spark):
    base = _gradient()
    got = _hashes(spark, [
        (1, encode_png(base)),
        (2, encode_png(_gradient(bright=6))),     # brightness shift
        (3, encode_bmp(base)),                    # same pixels, other codec
        (4, encode_png(_checker())),              # different pattern
        (5, encode_wav(np.zeros(100, dtype=np.int16))),  # not an image
        (6, b"\x00\x01corrupt"),
    ])
    assert got[1][1] and got[2][1] and got[3][1] and got[4][1]
    assert not got[5][1] and not got[6][1]
    assert _ham(got[1][0], got[2][0]) <= 3        # near-dup survives shift
    assert got[1][0] == got[3][0]                 # codec-independent
    assert _ham(got[1][0], got[4][0]) > 10        # distinct stays distant


def test_banded_join_finds_exactly_near_pairs(spark):
    rows = [(1, encode_png(_gradient())),
            (2, encode_png(_gradient(bright=6))),
            (3, encode_png(_checker())),
            (4, encode_png(_checker(cell=8))),    # identical to 3
            # DECREASING horizontal gradient: every gradient SIGN
            # flips vs the increasing one (dHash is sign structure,
            # not magnitude — a steeper increasing tilt would hash
            # identically, as would a transpose that stays monotone)
            (5, encode_png(np.repeat((255 - 3 * np.arange(64))
                                     .clip(0, 255).astype(np.uint8)
                                     [None, :, None], 64, axis=0)
                           .repeat(3, axis=2)))]
    hashes = multimodal.phash_images(_media(spark, rows)) \
        .filter(F.col("ok"))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in near_dup_phash(hashes, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert pairs[(3, 4)] == 0
    assert all(k in {(1, 2), (3, 4)} for k in pairs), pairs


def test_hot_band_guard(spark):
    # near-constant corpus (solid-color thumbnails): every image
    # shares every band — the df cap must keep the self-join from
    # going quadratic, mirroring the audio path's max_block_df
    rows = [(i, 0x0F0F0F0F0F0F0F0F) for i in range(12)]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    assert near_dup_phash(df, max_band_df=5).count() == 0
    # guard off: exhaustive small-corpus mode finds all C(12,2) pairs
    assert near_dup_phash(df, max_band_df=None).count() == 66


def test_banded_join_matches_brute_force(spark):
    # random-ish hashes straight in (no decode): banding must find
    # EVERY pair within the radius that brute force finds
    import random
    rnd = random.Random(7)
    base = [rnd.getrandbits(64) for _ in range(30)]
    hs = []
    for i, h in enumerate(base):
        hs.append((2 * i, h))
        flipped = h
        for bit in rnd.sample(range(64), rnd.randint(0, 4)):
            flipped ^= 1 << bit
        hs.append((2 * i + 1, flipped))
    signed = [(i, v - (1 << 64) if v >= (1 << 63) else v)
              for i, v in hs]
    df = spark.createDataFrame(signed, "media_id long, phash long")
    got = {(r["id_a"], r["id_b"])
           for r in near_dup_phash(df, max_hamming=3).collect()}
    vals = dict(hs)
    brute = {(a, b) for a in vals for b in vals
             if a < b and _ham(vals[a], vals[b]) <= 3}
    assert got == brute and len(brute) >= 10
