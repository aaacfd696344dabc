"""Video near-dup: real animated-GIF decode → per-frame dHash →
clip-level shared-frame vote; plus the vote math on bare hashes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xtdb_spark.pipeline import multimodal
from xtdb_spark.pipeline.codecs import encode_gif
from xtdb_spark.pipeline.dedup import near_dup_video


def _clip(fx, fy, n_frames=6, bright=0):
    frames = []
    y, x = np.mgrid[0:32, 0:32]
    for k in range(n_frames):
        px = (128 + 110 * np.sin(2 * np.pi * (fx * x + 4 * k) / 32)
              * np.cos(2 * np.pi * fy * y / 32) + bright) \
            .clip(0, 255).astype(np.uint8)
        frames.append(np.repeat(px[:, :, None], 3, axis=2))
    return encode_gif(frames, delays_ms=[100] * n_frames)


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_video_near_dup_end_to_end(spark):
    rows = [(1, _clip(1, 2)),
            (2, _clip(1, 2, bright=5)),     # brightness-shifted copy
            (3, _clip(3, 1)),               # different motion pattern
            (4, b"not a video")]
    fps = multimodal.video_fingerprints(_media(spark, rows),
                                        on_error="skip")
    per_clip = {r["media_id"]: r["n"] for r in
                fps.groupBy("media_id").agg(F.count("*").alias("n"))
                .collect()}
    assert 4 not in per_clip and per_clip[1] == 6
    pairs = {(r["id_a"], r["id_b"]): r["ratio"]
             for r in near_dup_video(fps).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8
    assert all(3 not in k for k in pairs), pairs


def test_video_fp_raises_on_bad_bytes_by_default(spark):
    with pytest.raises(Exception):
        multimodal.video_fingerprints(
            _media(spark, [(1, b"GIF89a-truncated")])).collect()


def test_frame_identity_deterministic_under_perturbation(spark):
    # _fid must be CONTENT-derived: the same input partitioned
    # differently (and therefore recomputed with different intra-
    # partition row orders by the three join branches) must produce
    # identical pairs — a positional id (monotonically_increasing_id)
    # fails this on a cluster
    rows = []
    for clip in range(1, 5):
        for k in range(4):
            base = (clip * 1013904223 + k * 2654435761) & ((1 << 63) - 1)
            rows.append((clip, k, base))
            # a near-twin clip: same hashes, one low bit flipped
            rows.append((clip + 10, k, base ^ 1))
    fps = spark.createDataFrame(
        rows, "media_id long, frame_idx int, phash long")
    runs = []
    for df in (fps, fps.repartition(7, "phash"),
               fps.repartition(3, "media_id")):
        got = sorted(
            (r["id_a"], r["id_b"], r["n_matched"], r["ratio"])
            for r in near_dup_video(df, max_hamming=2,
                                    min_ratio=0.5).collect())
        runs.append(got)
    assert runs[0] == runs[1] == runs[2]
    assert {(a, b) for a, b, _, _ in runs[0]} == {
        (c, c + 10) for c in range(1, 5)}


def test_vote_math_on_bare_hashes(spark):
    rows = [(10, 0, 111), (10, 1, 222), (10, 2, 333), (10, 3, 444),
            (20, 0, 111), (20, 1, 222), (20, 2, 900), (20, 3, 901),
            (30, 0, 555), (30, 1, 666), (30, 2, 777), (30, 3, 888)]
    fps = spark.createDataFrame(
        rows, "media_id long, frame_idx int, phash long")
    got = {(r["id_a"], r["id_b"]): (r["n_matched"], r["ratio"])
           for r in near_dup_video(fps, max_hamming=0,
                                   min_ratio=0.5).collect()}
    assert got == {(10, 20): (2, 0.5)}
