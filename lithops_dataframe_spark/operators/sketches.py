"""Distributed probabilistic filters & sketches (SURVEY §2.11 scale path).

Three families, two verification regimes:

- **Bloom filter** and **Count-Min sketch** are built *from scratch as
  DataFrame compositions* (explode → narrow hash expressions → one
  ``groupBy`` each) using the md5-derived hash primitives of
  functions/hashing.py. Because the only hash source is md5, the ENTIRE
  sketch — every set bit, every counter cell — is bit-identically
  replayable in DuckDB SQL, so these get full value-hash oracles rather
  than tolerance checks. This is the brief's "custom operator Spark
  lacks → composition of existing DataFrame ops" clause: Spark exposes
  ``count_min_sketch``/bloom builders only as opaque binaries with no SQL
  estimator, so we build the estimator-friendly relational form instead.
- **HLL** uses Spark's native Datasketches functions (``hll_sketch_agg`` /
  ``hll_union_agg``) — mergeable partial sketches, the real 100 TB
  cardinality path — and is gated by an error-tolerance predicate the
  oracle pins TRUE (sketch internals differ from DuckDB's, so value
  equality is the wrong contract; bounded error is the contract).

Scale shapes:
- Bloom build: one shuffle of (word_idx, mask) pairs — the filter itself
  is ``m/8`` bytes spread over ``m/64`` rows; for production m (≤ a few
  GB) the collected form is broadcastable next to a scan, which is the
  point: an O(bits) prefilter replaces an O(|set|) shuffle join, with
  false positives removed by an exact verify join over the (tiny)
  candidate set. No false negatives ⇒ prefilter+verify ≡ exact join.
- CMS build: explode(d rows per item) → groupBy (row, col) sum — bounded
  d×w cells regardless of input size, mergeable by addition, query cost
  d lookups. Heavy-hitter estimation over 100 TB token streams without
  per-token state.

Reference context: the reference (dataframe/core.py) has no sketch
surface; this extends the LLM-pipeline requirements of BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lithops_dataframe_spark.functions import hashing as H

__all__ = [
    "bloom_positions",
    "bloom_build",
    "bloom_probe_hits",
    "cms_build",
    "cms_estimate",
]


# ---------------------------------------------------------------------------
# Bloom filter: relational form (word_idx BIGINT, bits BIGINT[32-bit words])
# ---------------------------------------------------------------------------
# 32-bit words: masks stay in [1, 2^31] so no sign-bit wrap semantics can
# differ between engines' BIGINT bit ops.
_WORD_BITS = 32


def bloom_positions(col: Column, *, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a value: pos_j = md5(value ⊕ j) % m."""
    return F.array(
        *[H.token_hash60(F.concat(col, F.lit(f"#{j}"))) % m_bits for j in range(k)]
    )


def bloom_build(values: DataFrame, col: str, *, m_bits: int, k: int) -> DataFrame:
    """Build the filter: distinct values → k positions each → OR'd 32-bit
    words. One narrow explode + one groupBy(word_idx) with ``bit_or`` —
    map-side partial aggregation keeps the shuffle at O(m/32) rows."""
    pos = (
        values.select(F.explode(bloom_positions(F.col(col), m_bits=m_bits, k=k)).alias("pos"))
        .select(
            (F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pos % {_WORD_BITS} AS INT))").alias("mask"),
        )
    )
    return pos.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))


def bloom_probe_hits(
    probes: DataFrame, col: str, bloom: DataFrame, *, m_bits: int, k: int, keep: list[str]
) -> DataFrame:
    """Rows of ``probes`` whose ``col`` value tests bloom-positive (all k
    bits set). ``keep`` columns are carried through.

    Join shape: k narrow BROADCAST joins (one per hash function) against
    the ≤ m/32-row filter frame, each adding one bit-test column; the
    conjunction filters inline. ZERO shuffles of the probe stream — no
    explode, no re-aggregation (the first cut exploded k rows per probe
    and grouped them back, which shuffled every probe value and cost more
    than the exact join it was supposed to avoid — measured 4.4 s → this
    shape at sf0.1).
    """
    out = probes
    hit_cols = []
    for j in range(k):
        pos = H.token_hash60(F.concat(F.col(col), F.lit(f"#{j}"))) % m_bits
        out = (
            out.withColumn(f"__p{j}", pos)
            .withColumn(f"__w{j}", (F.col(f"__p{j}") / _WORD_BITS).cast("long"))
            .withColumn(
                f"__m{j}", F.expr(f"shiftleft(1L, CAST(__p{j} % {_WORD_BITS} AS INT))")
            )
        )
        bj = bloom.select(
            F.col("word_idx").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}")
        )
        out = out.join(F.broadcast(bj), f"__w{j}", "left")
        hit_cols.append(
            (F.coalesce(F.col(f"__b{j}"), F.lit(0)).bitwiseAND(F.col(f"__m{j}")) == F.col(f"__m{j}"))
        )
    cond = hit_cols[0]
    for c in hit_cols[1:]:
        cond = cond & c
    drop = [f"__{p}{j}" for j in range(k) for p in ("p", "w", "m", "b")]
    return out.filter(cond).drop(*drop)


# ---------------------------------------------------------------------------
# Count-Min sketch: relational form (row BIGINT, col BIGINT, cnt BIGINT)
# ---------------------------------------------------------------------------


def _cms_col(col: Column, j: int, width: int) -> Column:
    return H.token_hash60(F.concat(col, F.lit(f"@{j}"))) % width


def cms_build(items: DataFrame, col: str, *, depth: int, width: int) -> DataFrame:
    """Count-Min sketch of the multiset in ``items[col]``: each occurrence
    increments cell (j, h_j(x)) for j < depth. Emitted as (row, col, cnt)
    with at most depth×width rows — fixed-size state, mergeable by
    addition, built with one explode + one groupBy."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"), _cms_col(F.col(col), j, width).alias("c")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    ).select(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    queries: DataFrame, col: str, cms: DataFrame, *, depth: int, width: int
) -> DataFrame:
    """Point-frequency estimates: est(x) = min_j cell(j, h_j(x)). The CMS
    side is ≤ depth×width rows → broadcast join; guarantees est ≥ true
    count (deterministically, not probabilistically)."""
    posed = queries.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"), _cms_col(F.col(col), j, width).alias("c")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(col, F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        posed.join(F.broadcast(cms), ["r", "c"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
