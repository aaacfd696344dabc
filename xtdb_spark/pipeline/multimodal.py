"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, batch iteration, partition sizing)
is real and tested; the actual codec work (image decode, resampling,
frame extraction) is STUBBED — the container has no image/audio
libraries — behind `_decode_image_bytes`, which produces a
deterministic fake so the pipeline shape is exercisable end-to-end.
Swap the stub for PIL/torchaudio/pyav in production; the mapInPandas
contract (arrow-batched bytes in → struct rows out) is unchanged.

Design for 100 TB of media:
- media rides in parquet binary columns next to its metadata → one
  scan, no small-file problem, predicate pushdown on metadata prunes
  files before any bytes are decoded.
- decode runs in `mapInPandas` (arrow batches, one Python worker per
  core) with `maxRecordsPerBatch` tuned down so a batch of images
  fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, content binary, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "checksum string, feat_mean double, feat_dim int")


def _decode_image_bytes(content: bytes, fake_decode: bool = False) -> list[float]:
    """STUB decoder. Real implementation: PIL.Image.open(BytesIO(b))
    → resize → np.asarray. Here: a deterministic 4-dim fake feature
    derived from the bytes so tests are stable.

    Raises NotImplementedError unless fake_decode is explicitly
    requested, so accidental production use surfaces loudly.
    """
    if not fake_decode:
        raise NotImplementedError(
            "media decode needs an image/audio library; "
            "pass fake_decode=True for the deterministic stub")
    if not content:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(content)
    return [float(n), float(content[0]), float(content[-1]),
            float(sum(content[:16]) % 256)]


def extract_features(media: DataFrame, batch_size: int | None = 64,
                     fake_decode: bool = False) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (arrow-batched).
    Pure plumbing demo: checksum and byte-stats are computed for real,
    the decode step goes through the stub.

    batch_size caps rows per arrow batch so a batch of decoded media
    fits executor memory; it is a session-wide conf, so pass None to
    leave the session default untouched (e.g. when mixing with other
    arrow-heavy work)."""
    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [_decode_image_bytes(b, fake_decode) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(b) if b is not None else 0
                            for b in pdf["content"]],
                "checksum": [hashlib.md5(b or b"").hexdigest()
                             for b in pdf["content"]],
                "feat_mean": [sum(f) / len(f) for f in feats],
                "feat_dim": [len(f) for f in feats],
            })

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests: content bytes
    derived from the id."""
    return (spark.range(n)
            .select(F.col("id").alias("media_id"),
                    F.when(F.col("id") % 3 == 0, "image")
                    .when(F.col("id") % 3 == 1, "audio")
                    .otherwise("video").alias("kind"),
                    F.encode(F.concat(F.lit("media-payload-"),
                                      F.col("id").cast("string"),
                                      F.repeat(F.lit("x"), (F.col("id") % 17 + 1)
                                               .cast("int"))), "UTF-8")
                    .alias("content"),
                    (F.col("id") % 640).cast("int").alias("width"),
                    (F.col("id") % 480).cast("int").alias("height"),
                    F.lit(16000).cast("int").alias("sample_rate")))
