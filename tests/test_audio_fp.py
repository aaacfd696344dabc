"""Audio fingerprint near-dup: volume/noise invariance on real WAV
bytes through the pure-Python codec, distinct material stays apart,
hot-block quadratic guard."""

import numpy as np
from pyspark.sql import functions as F

from xtdb_spark.pipeline import multimodal
from xtdb_spark.pipeline.codecs import encode_wav
from xtdb_spark.pipeline.dedup import near_dup_audio

SR = 8000


def _melody(notes, dur=0.25, amp=6000.0, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * dur)) / SR
    sig = np.concatenate([amp * np.sin(2 * np.pi * f * t) for f in notes])
    if noise:
        sig = sig + rng.normal(0, noise * amp, sig.shape)
    return encode_wav(np.clip(sig, -32768, 32767).astype(np.int16), SR)


NOTES_A = [440, 523, 659, 440, 784, 659, 523, 440]
NOTES_B = [311, 370, 415, 554, 311, 622, 494, 370]


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_fingerprint_invariance_and_pairs(spark):
    rows = [
        (1, _melody(NOTES_A)),
        (2, _melody(NOTES_A, amp=3000.0)),          # half volume
        (3, _melody(NOTES_A, noise=0.02, seed=3)),  # mild noise
        (4, _melody(NOTES_B)),                      # different melody
        (5, b"not audio at all"),
    ]
    fps = multimodal.audio_fingerprints(_media(spark, rows))
    assert fps.filter(F.col("media_id") == 5).count() == 0
    n1 = fps.filter(F.col("media_id") == 1).count()
    assert n1 > 10
    pairs = {(r["id_a"], r["id_b"]): r["ratio"]
             for r in near_dup_audio(fps).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.9   # volume-invariant
    assert (1, 3) in pairs                            # noise-tolerant
    assert not any(4 in k for k in pairs), pairs      # melody B apart


def test_hot_block_guard(spark):
    # constant tone -> every clip shares the same degenerate blocks;
    # the df cap must keep the self-join from going quadratic
    rows = [(i, _melody([440] * 4)) for i in range(12)]
    fps = multimodal.audio_fingerprints(_media(spark, rows))
    pairs = near_dup_audio(fps, max_block_df=5)
    assert pairs.count() == 0
