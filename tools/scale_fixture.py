"""Build a key-shifted N× fixture from an existing sf_dir (default 10×) —
the "sf1-equivalent" input for the bench scale curve (VERDICT_r02 task 8).

Plain row duplication would corrupt join semantics (duplicate keys fan
out quadratically), so every copy shifts ITS OWN key space by a large
stride on every primary/foreign key — FK pairs shift together, so join
selectivity, per-key group sizes, and per-user event streams are exactly
those of the base fixture, and runtime growth reflects DATA VOLUME, not
artificial key collisions. region/nation stay single-copy (their row
count is constant in SF, mirroring TPC-H).

Caveat recorded in the bench output: documents/embeddings copies carry
identical text/vectors, which inflates the OUTPUT of cross-row pair
finding (near-dup mining over 10 copies of everything legitimately finds
~45× the pairs); those operators are excluded from the scaling-exponent
score for that reason, not because their plans misbehave.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import TABLES, table_path

#: key columns shifted per copy (FK pairs shift together).
SHIFT_COLS: dict[str, tuple[str, ...]] = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

STRIDE = 100_000_000


def build(spark: SparkSession, base_sf_dir: str, out_dir: str, copies: int = 10) -> str:
    """Materialize the N× fixture under ``out_dir`` (idempotent: returns
    immediately if a prior build completed, marker file ``_DONE``)."""
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = spark.read.parquet(table_path(base_sf_dir, t))
        keys = SHIFT_COLS[t]
        if not keys:  # constant-cardinality dims: single copy
            out = src
        else:
            # one narrow pass: explode a literal copy-index array, shift
            # every key by copy*STRIDE — no shuffle, scales as a map
            out = (
                src.withColumn(
                    "__copy", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
                )
                .select(
                    *[
                        (F.col(c) + F.col("__copy") * F.lit(STRIDE)).alias(c)
                        if c in keys
                        else F.col(c)
                        for c in src.columns
                    ]
                )
            )
        out.write.mode("overwrite").parquet(table_path(out_dir, t))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
