"""Large-scale training-data pipeline operators.

Beyond reference parity (the reference has no corpus-prep surface),
these are the operations a 100 TB pretraining-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding near-dup), similarity search, text analysis, and multimodal
column plumbing. All hot paths are pure DataFrame compositions —
shuffles only on blocking keys, no driver-side loops.
"""

from xtdb_spark.pipeline import dedup, similarity, text  # noqa: F401
