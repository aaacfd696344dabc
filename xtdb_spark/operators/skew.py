"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; explicit salting remains the tool of choice when one key
dominates so heavily that even split partitions overwhelm a task —
the classic power-law keys of web/event data at 100 TB.

`salted_join(facts, dim, key, salt)` replicates the (small) dim side
`salt` times and scatters the fact side uniformly across the salt
space, so a hot key's rows spread over `salt` tasks instead of one.
Exact same join result for fact-preserving join types (inner, left,
left_semi, left_anti), `salt`× dim replication cost. Dim-preserving
types (right/full) are REJECTED: an unmatched dim row would surface
once per salt value — `salt` duplicate null-extended rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(facts: DataFrame, dim: DataFrame, key: str, salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join `facts ⋈ dim` on `key` with the fact side salted.
    `dim` rows are exploded ×salt (keep dim the smaller side).

    Only fact-preserving join types are allowed: under right/full
    outer an unmatched dim row appears once per salt value (×salt
    duplicate null-extended rows), which is NOT the same result as
    the unsalted join. Flip the sides (facts must be the salted,
    preserved side) or dedup unmatched dim rows yourself."""
    allowed = {"inner", "cross", "left", "leftouter",
               "semi", "leftsemi", "anti", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is dim-preserving — unmatched "
            f"dim rows would duplicate ×{salt}. Use one of "
            "inner/left/left_semi/left_anti (facts = preserved side).")
    salted_facts = facts.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                          F.lit(salt))).cast("int"))
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt - 1).cast("int"))))
    out = salted_facts.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")
