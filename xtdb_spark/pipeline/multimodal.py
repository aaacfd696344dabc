"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, batch iteration, partition sizing)
is real and tested. Two tiers of "decode":

- **Header/metadata sniffing is REAL** (`sniff_bytes`/`sniff_media`):
  PNG/JPEG/GIF/BMP/WAV container headers are plain byte layouts, so
  format, dimensions, sample rate, and channel count come from
  actual parsing with no codec library.
- **Pixel/sample decode is REAL for PNG / BMP / GIF / JPEG
  (baseline AND progressive) / WAV** via the pure-Python codecs in
  `pipeline/codecs.py` (zlib + struct + numpy — scanline unfilter,
  LZW, Huffman entropy decode + IDCT, PCM frames): features and
  resize operate on actual pixels/samples for every format the
  sniffer identifies.  **Video frame sampling is REAL too (round
  7)** for animated GIF (full compositing) and MJPEG-in-AVI (RIFF
  demux + the JPEG decoder); only inter-frame codecs (H.264 etc.)
  remain behind the `fake_decode` gate — those genuinely need a
  media library, and accidental production use raises.
  The mapInPandas contract (arrow-batched bytes in → struct rows
  out) is identical either way.

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
    """Media → 4-dim feature vector. REAL decode for PNG / BMP / GIF
    / baseline JPEG / WAV (pure-Python codecs, pipeline/codecs.py):
    images yield [width, height, mean_pixel, channels], audio yields
    [n_frames, sample_rate, mean_abs_amplitude, channels] — all from
    actual pixels/samples. Bytes outside the codec subset
    (video, exotic JPEG codings) fall through to the deterministic
    byte-stats stub when `fake_decode=True`, else raise — accidental
    production use of the stub surfaces loudly."""
    from xtdb_spark.pipeline import codecs

    if content:
        decoded = codecs.decode_media(bytes(content))
        if decoded is not None:
            kind, payload = decoded
            if kind == "image":
                px = payload
                ch = 1 if px.ndim == 2 else px.shape[2]
                return [float(px.shape[1]), float(px.shape[0]),
                        float(px.mean()), float(ch)]
            sr, ch, samples = payload
            import numpy as np

            return [float(samples.shape[0]), float(sr),
                    float(np.abs(samples.astype("int32")).mean()
                          if samples.size else 0.0), float(ch)]
    if not fake_decode:
        raise NotImplementedError(
            "bytes are outside the pure-Python codec subset "
            "(PNG/BMP/WAV); pass fake_decode=True for the "
            "deterministic stub or install an image/audio library")
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

    return (media.select("media_id", "kind", "content")
            .mapInPandas(featurize, FEATURE_SCHEMA))


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


RESIZED_SCHEMA = ("media_id long, kind string, width int, height int, "
                  "content binary, n_bytes long")


def resize_images(media: DataFrame, target_w: int = 224,
                  target_h: int = 224, fake_decode: bool = False,
                  batch_size: int | None = 64) -> DataFrame:
    """Resize the image rows to (target_w, target_h) via mapInPandas.
    Real plumbing: the `kind = 'image'` filter runs BEFORE the UDF (so
    at scale the scan prunes non-image row groups and no video bytes
    cross into Python), output metadata reflects the new geometry, and
    the bytes column round-trips arrow batching. The pixel work is the
    STUB (deterministic byte transform sized to the target) — swap in
    PIL in production; the contract is unchanged."""
    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))
    images = media.filter(F.col("kind") == "image")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xtdb_spark.pipeline import codecs

        out_len = max(4, (target_w * target_h) // 64)
        for pdf in batches:
            contents = []
            for b in pdf["content"]:
                b = b or b""
                decoded = codecs.decode_media(bytes(b)) if b else None
                if decoded is not None and decoded[0] == "image":
                    # REAL resample: nearest-neighbor over actual
                    # pixels, re-encoded as PNG
                    px = codecs.resize_nearest(decoded[1],
                                               target_w, target_h)
                    contents.append(codecs.encode_png(px))
                    continue
                if not fake_decode:
                    raise NotImplementedError(
                        "bytes outside the PNG/BMP codec subset; pass "
                        "fake_decode=True for the deterministic stub")
                # deterministic fake "resample": tile the source bytes
                # to the target byte budget
                contents.append((b * (out_len // max(1, len(b)) + 1))[:out_len])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": target_w,
                "height": target_h,
                "content": contents,
                "n_bytes": [len(c) for c in contents],
            })

    return (images.select("media_id", "kind", "content")
            .mapInPandas(do_resize, RESIZED_SCHEMA))


FRAME_SCHEMA = ("media_id long, frame_idx int, ts_ms long, frame binary")


def sample_frames(media: DataFrame, n_frames: int = 4,
                  fps: float = 25.0, fake_decode: bool = False,
                  batch_size: int | None = 16,
                  on_error: str = "raise") -> DataFrame:
    """Sample `n_frames` evenly-spaced frames from each video row —
    the 1→N mapInPandas expansion pattern (one input row yields many
    output rows; arrow batches keep memory bounded even though the
    cardinality grows).

    REAL decode (round 7): animated GIF (full compositing —
    placement, transparency, disposal) and MJPEG-in-AVI (RIFF demux
    + the pure-Python JPEG decoder) — frames come back as PNG bytes
    with container-derived timestamps. Bytes outside those container
    formats (H.264 etc. — inter-frame codecs genuinely need a media
    library) raise, unless `fake_decode=True` falls back to the
    deterministic byte-slice stub.

    `on_error`: "raise" (default) fails the job on undecodable or
    CORRUPT bytes (truncated GIF/AVI raise too, not just unrecognized
    containers — one bad row would otherwise kill the stage after 4
    task retries with a confusing struct.error); "skip" drops such
    rows and keeps going — the right setting for a 100 TB corpus
    where some crawl bytes are always damaged (pair with an anti-join
    on media_id to audit what was dropped)."""
    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))
    videos = media.filter(F.col("kind") == "video")

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from xtdb_spark.pipeline import codecs

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                b = bytes(b or b"")
                decoded = None
                err = None
                try:
                    if b[:6] in (b"GIF87a", b"GIF89a"):
                        decoded = codecs.decode_gif_frames(b)
                    elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                        decoded = codecs.decode_avi_frames(b)
                except (codecs.UnsupportedMedia, ValueError,
                        IndexError, struct.error) as e:
                    # recognized container, corrupt/truncated bytes
                    decoded, err = None, e
                if err is not None:
                    if on_error == "skip":
                        continue
                    if not fake_decode:
                        raise ValueError(
                            f"undecodable video bytes for media_id "
                            f"{mid!r} ({type(err).__name__}: {err}); "
                            f"pass on_error='skip' to drop corrupt "
                            f"rows") from err
                    # fake_decode: corrupt media stubs like any other
                    # undecodable bytes (fall through)
                if decoded:
                    k = min(n_frames, len(decoded))
                    picks = sorted({round(j * (len(decoded) - 1)
                                          / max(1, k - 1))
                                    for j in range(k)})
                    for i, p in enumerate(picks):
                        ts, px = decoded[p]
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(int(ts))
                        frames.append(codecs.encode_png(px))
                    continue
                if not fake_decode:
                    raise NotImplementedError(
                        "bytes outside the GIF/MJPEG-AVI container "
                        "subset (inter-frame codecs need a media "
                        "library); pass fake_decode=True for the "
                        "deterministic stub")
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(int(i * (1000.0 / fps) * step))
                    frames.append(b[i * step:(i + 1) * step] or b"\x00")
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "ts_ms": tss, "frame": frames})

    return (videos.select("media_id", "content")
            .mapInPandas(do_sample, FRAME_SCHEMA))


# ---- real header sniffing (no codec libraries needed) -----------------------

SNIFF_SCHEMA = ("media_id long, format string, width int, height int, "
                "sample_rate int, channels int, n_bytes long")


def sniff_bytes(b: bytes | None):
    """REAL media metadata extraction — container headers are plain
    byte layouts, so unlike pixel decode this needs no codec library.
    Returns (format, width, height, sample_rate, channels); fields
    that don't apply are None. Formats: PNG (IHDR, big-endian dims at
    offset 16), JPEG (marker walk to SOFn), GIF (LE uint16 logical
    screen), BMP (BITMAPINFOHEADER LE int32), WAV (RIFF fmt chunk).
    Truncated/unknown bytes → ('unknown', None, …) rather than an
    exception, so one corrupt blob can't kill a 100 TB scan."""
    if not b:
        return ("empty", None, None, None, None)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return ("png", w, h, None, None)
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = int.from_bytes(b[i + 2:i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(b[i + 5:i + 7], "big")
                    w = int.from_bytes(b[i + 7:i + 9], "big")
                    return ("jpeg", w, h, None, None)
                i += 2 + seglen
            return ("jpeg", None, None, None, None)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            return ("gif", w, h, None, None)
        if b[:2] == b"BM" and len(b) >= 26:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return ("bmp", w, abs(h), None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                clen = int.from_bytes(b[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 16 <= len(b):
                    ch = int.from_bytes(b[i + 10:i + 12], "little")
                    sr = int.from_bytes(b[i + 12:i + 16], "little")
                    return ("wav", None, None, sr, ch)
                i += 8 + clen + (clen % 2)
            return ("wav", None, None, None, None)
    except Exception:
        pass
    return ("unknown", None, None, None, None)


def sniff_media(media: DataFrame, batch_size: int | None = 256) -> DataFrame:
    """Typed metadata for a binary media column via header sniffing —
    the ingest-side step that tags blobs with (format, geometry,
    sample rate) BEFORE any expensive decode, so downstream filters
    (`WHERE format = 'png' AND width >= 512`) prune at the metadata
    level and only qualifying bytes ever reach a codec. Arrow-batched
    mapInPandas; unlike extract_features this path is fully real —
    no stub, no library."""
    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))

    def do_sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [sniff_bytes(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "format": [r[0] for r in rows],
                "width": pd.array([r[1] for r in rows], dtype="Int32"),
                "height": pd.array([r[2] for r in rows], dtype="Int32"),
                "sample_rate": pd.array([r[3] for r in rows], dtype="Int32"),
                "channels": pd.array([r[4] for r in rows], dtype="Int32"),
                "n_bytes": [len(b) if b is not None else 0
                            for b in pdf["content"]],
            })

    return (media.select("media_id", "content")
            .mapInPandas(do_sniff, SNIFF_SCHEMA))


PHASH_SCHEMA = "media_id long, phash long, ok boolean"


def _dhash64(px) -> int:
    """64-bit difference hash (dHash): grayscale → 8×9 block-mean
    downsample → horizontal gradient sign bits. The standard
    perceptual image fingerprint — stable under resize/recompression/
    small brightness shifts, which is exactly what byte checksums
    miss. Returned as a SIGNED 64-bit int (Spark long)."""
    import numpy as np

    a = px.astype("float64")
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    rs = np.linspace(0, h, 9).astype(int)
    cs = np.linspace(0, w, 10).astype(int)
    small = np.empty((8, 9))
    for i in range(8):
        r0, r1 = rs[i], max(rs[i + 1], rs[i] + 1)
        for j in range(9):
            c0, c1 = cs[j], max(cs[j + 1], cs[j] + 1)
            small[i, j] = a[min(r0, h - 1):min(r1, h),
                            min(c0, w - 1):min(c1, w)].mean()
    v = 0
    for b in (small[:, 1:] > small[:, :-1]).flatten():
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_images(media: DataFrame,
                 batch_size: int | None = 64) -> DataFrame:
    """media_id → perceptual hash for every row whose bytes decode as
    an image through the pure-Python codecs (ok=false otherwise —
    audio, video, corrupt bytes). Arrow-batched mapInPandas, real
    pixels only (no stub). Pair with dedup.near_dup_phash for the
    banded near-duplicate join."""
    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))

    def do_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xtdb_spark.pipeline import codecs

        for pdf in batches:
            ids, hashes, oks = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                decoded = codecs.decode_media(bytes(b)) if b else None
                if decoded is not None and decoded[0] == "image":
                    hashes.append(_dhash64(decoded[1]))
                    oks.append(True)
                else:
                    hashes.append(0)
                    oks.append(False)
            yield pd.DataFrame({"media_id": ids, "phash": hashes,
                                "ok": oks})

    return (media.select("media_id", "content")
            .mapInPandas(do_hash, PHASH_SCHEMA))


AUDIO_FP_SCHEMA = "media_id long, block_idx int, block_hash long"


def _audio_blocks(samples, sr: int, win: int = 1024, hop: int = 256,
                  n_bands: int = 15, frames_per_block: int = 16,
                  stride: int = 4) -> list[int]:
    """Dominant-band contour fingerprint (the landmark idea behind
    Shazam-style matching, simplified to one peak per frame): frame
    the signal, rFFT, take the log-spaced band holding the most
    energy — a 4-bit symbol per frame that is EXACTLY invariant to
    volume (argmax survives scaling and int16 quantization, which
    sign-of-difference schemes do not on sparse tonal content) and
    tolerant of mild noise. 16 consecutive symbols pack into one
    64-bit block word; overlapping blocks (stride 4 frames) buy
    alignment tolerance. A clip is its list of block words."""
    import numpy as np

    a = samples.astype("float64")
    if a.ndim == 2:
        a = a.mean(axis=1)
    if a.shape[0] < win + hop:
        return []
    n_frames = 1 + (a.shape[0] - win) // hop
    freqs = np.fft.rfftfreq(win, 1.0 / max(sr, 1))
    hi = min(4000.0, float(freqs[-1]) or 4000.0)
    edges = np.geomspace(100.0, hi, n_bands + 1)
    band_of = np.searchsorted(edges, freqs, side="right") - 1
    valid = (band_of >= 0) & (band_of < n_bands)
    window = np.hanning(win)
    sym = np.empty(n_frames, dtype=np.int64)
    for t in range(n_frames):
        spec = np.abs(np.fft.rfft(a[t * hop:t * hop + win] * window))
        e = np.bincount(band_of[valid], weights=spec[valid],
                        minlength=n_bands)
        sym[t] = int(e.argmax())
    blocks = []
    for k in range(0, n_frames - frames_per_block + 1, stride):
        v = 0
        for s in sym[k:k + frames_per_block]:
            v = (v << 4) | int(s)
        blocks.append(v - (1 << 64) if v >= (1 << 63) else v)
    return blocks


def audio_fingerprints(media: DataFrame,
                       batch_size: int | None = 64) -> DataFrame:
    """media_id → exploded (block_idx, block_hash) fingerprint rows
    for every row whose bytes decode as audio (WAV via the
    pure-Python codec); non-audio rows contribute nothing. Pair with
    dedup.near_dup_audio."""
    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))

    def do_fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xtdb_spark.pipeline import codecs

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                decoded = codecs.decode_media(bytes(b)) if b else None
                if decoded is None or decoded[0] != "audio":
                    continue
                sr, _ch, samples = decoded[1]
                for i, h in enumerate(_audio_blocks(samples, sr)):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(h)
            yield pd.DataFrame({"media_id": ids, "block_idx": idxs,
                                "block_hash": hashes})

    return (media.select("media_id", "content")
            .mapInPandas(do_fp, AUDIO_FP_SCHEMA))


VIDEO_FP_SCHEMA = "media_id long, frame_idx int, phash long"


def video_fingerprints(media: DataFrame, n_frames: int = 8,
                       batch_size: int | None = 16,
                       on_error: str = "raise") -> DataFrame:
    """media_id → per-sampled-frame perceptual hash for every row
    whose bytes decode as a video container (animated GIF /
    MJPEG-AVI via the pure-Python codecs): up to `n_frames`
    evenly-spaced frames, each dHashed like a still image
    (_dhash64). Pair with dedup.near_dup_video — the clip-level
    shared-frame vote. `on_error="skip"` drops undecodable/corrupt
    rows (the 100 TB crawl setting, same contract as
    sample_frames)."""
    import numpy as np

    spark = media.sparkSession
    if batch_size is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_size))

    def do_fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xtdb_spark.pipeline import codecs

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                try:
                    bb = bytes(b) if b else b""
                    if bb[:6] in (b"GIF87a", b"GIF89a"):
                        frames = [f for _, f in codecs.decode_gif_frames(bb)]
                    elif bb[:4] == b"RIFF" and bb[8:12] == b"AVI ":
                        frames = [f for _, f in codecs.decode_avi_frames(bb)]
                    else:
                        raise codecs.UnsupportedMedia("not a video")
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                if not frames:
                    continue
                pick = np.linspace(0, len(frames) - 1,
                                   min(n_frames, len(frames))).astype(int)
                for i, fi in enumerate(dict.fromkeys(pick)):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(_dhash64(frames[fi]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "phash": hashes})

    return (media.select("media_id", "content")
            .mapInPandas(do_fp, VIDEO_FP_SCHEMA))
