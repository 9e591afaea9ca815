"""Pandas-UDF surface queries (SURVEY §2.9's ABSENT rows): grouped-map
``applyInPandas`` (frame→frame per group — the UDTF-like shape) and a
grouped-agg pandas UDAF, both oracle-checked against DuckDB.

Scale notes: grouped-map materializes each group as one pandas frame in one
task — correct for bounded groups (here: returnflag×linestatus, ≤6 groups
split across tasks by hash). For unbounded groups the same semantics should
be expressed with window functions (see udf_grouped_zscore's docstring);
the query exists to verify the *API surface* with real Arrow plumbing.

Float discipline: pandas/numpy sum order differs from DuckDB's, so ratio
outputs are rounded to 4 decimals on both sides (error ~1e-8, granularity
1e-4 → no boundary flakes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register

_ZSCORE_ORACLE = """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ROUND((l_extendedprice - AVG(l_extendedprice) OVER w)
                 / STDDEV_SAMP(l_extendedprice) OVER w, 4) AS price_z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
"""

_WAVG_ORACLE = """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
"""

_TRIM_ORACLE = """
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(AVG(l_extendedprice), 4) AS trimmed_mean,
           COUNT(*) AS n_kept
    FROM ranked
    WHERE rk > n // 10 AND rk <= n - n // 10
    GROUP BY l_returnflag
"""


@register("udf_grouped_zscore", oracle=_ZSCORE_ORACLE)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score via grouped-map ``applyInPandas``.

    At 100 TB, per-row standardization against group stats should be the
    window-function plan in the oracle SQL (two passes, no group
    materialization); the grouped-map form verifies the pandas
    frame→frame surface (reference analog: the intended ACA/groupby-apply
    machinery, core.py:551-758).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"]
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "price_z": z.round(4),
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        zscore, "l_orderkey long, l_linenumber long, l_returnflag string, price_z double"
    )


@register("udf_grouped_agg_weighted_avg", oracle=_WAVG_ORACLE)
def udf_grouped_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per returnflag via a GROUPED_AGG
    pandas UDAF — the generic-UDAF shape of the reference's
    chunk/combine/aggregate contract (core.py:15-144)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@register("udf_grouped_trimmed_mean", oracle=_TRIM_ORACLE)
def udf_grouped_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean per group via grouped-map — an order-statistic
    aggregate SQL needs window machinery for; pandas does it in-group.
    Oracle mirrors with row_number/count windows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")

    def tmean(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"].sort_values().reset_index(drop=True)
        n = len(x)
        k = n // 10
        kept = x.iloc[k : n - k]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "trimmed_mean": [round(float(kept.mean()), 4)],
                "n_kept": [len(kept)],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        tmean, "l_returnflag string, trimmed_mean double, n_kept long"
    )


_APPLY_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN l_discount >= 0.05 THEN 'deep' ELSE 'shallow' END AS disc_band
    FROM lineitem WHERE l_orderkey <= 200
"""


@register("frame_apply_axis1", oracle=_APPLY_ORACLE)
def frame_apply_axis1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDFrame.apply(axis=1) — the reference's row-wise pandas UDF path
    (reference core.py:171-262) as mapInPandas with mandatory meta.
    Per-row IEEE arithmetic is bit-identical across engines, so the charge
    column needs no rounding for the value hash."""
    from lithops_dataframe_spark.frame import LDFrame

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
    )

    def row_fn(row: pd.Series) -> pd.Series:
        return pd.Series(
            {
                "l_orderkey": row["l_orderkey"],
                "l_linenumber": row["l_linenumber"],
                "charge": row["l_extendedprice"] * (1 - row["l_discount"]) * (1 + row["l_tax"]),
                "disc_band": "deep" if row["l_discount"] >= 0.05 else "shallow",
            }
        )

    return (
        LDFrame(li)
        .apply(
            row_fn,
            axis=1,
            meta="l_orderkey long, l_linenumber int, charge double, disc_band string",
        )
        .spark
    )


_MAP_PARTITIONS_ORACLE = """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           LENGTH(text) AS text_len
    FROM documents WHERE doc_id < 500
"""


@register("frame_map_partitions", oracle=_MAP_PARTITIONS_ORACLE)
def frame_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDFrame.map_partitions with partition_info (reference
    core.py:407-548): per-partition pandas transform, Arrow-batched; the
    injected partition number is consumed by the function (sanity-checked)
    but excluded from the output so the result is layout-independent."""
    from lithops_dataframe_spark.frame import LDFrame

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
    )

    def per_partition(pdf: pd.DataFrame, partition_info=None) -> pd.DataFrame:
        assert partition_info is None or partition_info.get("number", -1) >= -1
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                # nullable Int64 (not int64): a NULL text row must emit
                # NULL counts like the oracle's LENGTH(NULL), not crash
                # the astype (r10 edge row)
                "n_tokens": pdf["text"].str.split(" ").str.len().astype("Int64"),
                "text_len": pdf["text"].str.len().astype("Int64"),
            }
        )

    return (
        LDFrame(docs)
        .map_partitions(
            per_partition,
            "doc_id long, n_tokens long, text_len long",
            partition_info=True,
        )
        .spark
    )


_ARROW_ORACLE = """
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           octet_length(encode(text))::BIGINT AS n_bytes,
           (length(text) - length(replace(text, ' ', '')))::BIGINT AS n_spaces
    FROM documents
"""


@register("udf_map_in_arrow", oracle=_ARROW_ORACLE)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the arrow-NATIVE batch UDF path (§2.9) — the
    RecordBatch goes straight to pyarrow.compute kernels with no
    Arrow→pandas conversion on either side, the fastest Python hot-path
    Spark offers. Here: per-document byte/char/space counts via
    vectorized pa.compute, verified against a SQL oracle.

    Scale shape: partition-local narrow map, vectorized C++ kernels under
    the Python veneer, batch size = spark.sql.execution.arrow.maxRecordsPerBatch.
    Prefer this over mapInPandas when the transformation is expressible in
    pa.compute — no per-batch pandas object materialization."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches):
        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            n_chars = pc.utf8_length(text)
            n_bytes = pc.binary_length(pc.cast(text, pa.binary()))
            n_spaces = pc.subtract(
                n_chars, pc.utf8_length(pc.replace_substring(text, " ", ""))
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(n_chars, pa.int64()),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(n_spaces, pa.int64()),
                ],
                names=["doc_id", "n_chars", "n_bytes", "n_spaces"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(fn, "doc_id long, n_chars long, n_bytes long, n_spaces long")


_COGROUP_ORACLE = """
    WITH p AS (
        SELECT user_id, COUNT(*) AS n_purch,
               -- canonical half-up cents (FLOOR(x*100 + 0.5)), mirrored
               -- by np.floor in the pandas side: np.round is HALF-EVEN
               -- and bit 888.5 -> 888 where both engines say 889
               -- (edge-fixture r8, value 8.885)
               SUM((FLOOR(value * 100 + 0.5))::BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    c AS (
        SELECT user_id, COUNT(*) AS n_click
        FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT COALESCE(p.user_id, c.user_id) AS user_id,
           COALESCE(p.n_purch, 0)::BIGINT AS n_purch,
           COALESCE(c.n_click, 0)::BIGINT AS n_click,
           -- ONE IEEE division of exact integers (bit-identical across
           -- engines); ROUND(x, 4) diverged at a .00005 tie at sf0.1
           COALESCE(p.cents, 0)
               / (100.0 * GREATEST(COALESCE(c.n_click, 0), 1))
               AS spend_per_click
    FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
"""


@register("udf_cogroup_reconcile", oracle=_COGROUP_ORACLE)
def udf_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map ``applyInPandas`` (SURVEY §2.9 — the two-frame sibling
    of grouped-map): purchases and clicks cogroup and each task receives
    BOTH sides' rows for its keys as pandas frames — the Arrow analog of
    a full outer join+aggregate, which is exactly what the oracle replays.

    Constant-factor design (VERDICT r4 task 8): cogrouping directly on
    user_id paid one Arrow round-trip + pandas-frame construction PER
    USER (~4.3 s at sf0.1). The cogroup key is instead a BUCKET
    (``user_id % 64``), so each pandas call receives a multi-user batch
    and reconciles per-user with one vectorized ``groupby`` — identical
    output, same cogroup API surface proven, ~users/64× fewer Arrow
    crossings. Still one co-partitioned shuffle of the two inputs
    (FlatMapCoGroupsInPandas); at cluster scale raise the bucket count
    toward the parallelism target, it only changes batch size.

    Spend sums as exact integer cents in pandas; spend_per_click is ONE
    IEEE division of exact integers run JVM-side, mirrored verbatim in
    the oracle — bit-identical, no rounding step at all (an earlier
    ROUND(x, 4) diverged at a .00005 half-up/half-even tie, caught by
    the sf0.1 oracle sweep)."""
    n_buckets = 64
    # each side gets its OWN scan (fresh exprIds): cogrouping two
    # branches of one DataFrame trips Spark's self-join attribute dedup,
    # which rebinds the right side's non-grouping user_id to the left's
    # exprId — the right pandas frame then arrives without the column
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .withColumn("__b", F.pmod("user_id", F.lit(n_buckets)))
    )
    clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id")
        .withColumn("__b", F.pmod("user_id", F.lit(n_buckets)))
    )

    def reconcile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left):
            import numpy as np

            # np.floor(x+0.5), NOT .round(): numpy rounds HALF-EVEN
            # (888.5 → 888) while the oracle and every JVM-side cents
            # column round half-up (edge-fixture r8 catch at 8.885)
            p = (
                left.assign(
                    cents=np.floor(left["value"] * 100 + 0.5).astype("int64")
                )
                .groupby("user_id")
                .agg(n_purch=("cents", "size"), spend_cents=("cents", "sum"))
                .reset_index()
            )
        else:
            p = pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_purch": pd.Series(dtype="int64"),
                    "spend_cents": pd.Series(dtype="int64"),
                }
            )
        if len(right):
            c = right.groupby("user_id").size().rename("n_click").reset_index()
        else:
            c = pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_click": pd.Series(dtype="int64"),
                }
            )
        m = p.merge(c, on="user_id", how="outer")
        for col in ("n_purch", "n_click", "spend_cents"):
            m[col] = m[col].fillna(0).astype("int64")
        return m[["user_id", "n_purch", "n_click", "spend_cents"]]

    return (
        purchases.groupBy("__b")
        .cogroup(clicks.groupBy("__b"))
        .applyInPandas(
            reconcile,
            "user_id long, n_purch long, n_click long, spend_cents long",
        )
        .select(
            "user_id",
            "n_purch",
            "n_click",
            # one multiply + one divide on exactly-represented integers —
            # bit-identical to the oracle's expression; the former
            # ROUND(x, 4) hit a .00005 half-up/half-even tie at sf0.1
            # (found by the 10x-the-gate-SF oracle sweep, round-2 lesson)
            (
                F.col("spend_cents")
                / (F.lit(100.0) * F.greatest(F.col("n_click"), F.lit(1)))
            ).alias("spend_per_click"),
        )
    )


_OLS_ORACLE = """
    WITH p AS (
        SELECT user_id,
               datediff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS x,
               ROUND(value * 100)::BIGINT AS y
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT user_id, COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
               SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
               SUM(x * x)::BIGINT AS sxx
        FROM p GROUP BY user_id
    )
    SELECT user_id, n AS n_obs,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_day,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS intercept_cents
    FROM s WHERE n >= 2 AND (n * sxx - sx * sx) != 0
"""


@register("udf_grouped_ols_trend", oracle=_OLS_ORACLE)
def udf_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment model TRAINING via grouped-map ``applyInPandas``
    (round 5): fit an independent OLS spend-trend line per user — the
    "thousands of small models" pattern (per-store demand curves,
    per-user engagement slopes) that grouped-map exists for. Groups
    arrive bucketed (user_id % 32, the r5 cogroup lesson — one Arrow
    batch carries many users) and every per-user fit inside is a
    vectorized pandas groupby, so the Python cost is a handful of numpy
    array ops per BATCH, not per model.

    EXACT cross-engine oracle with no tolerance gate: all five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are integer sums (day
    index × spend cents), and slope/intercept are emitted as the same
    IEEE double expressions of those exact integers in both engines —
    closed-form training is hash-comparable where iterative float loops
    need rounding discipline."""
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
            .cast("long")
            .alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        .withColumn("__b", F.pmod("user_id", F.lit(32)))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(xy=pdf["x"] * pdf["y"], xx=pdf["x"] * pdf["x"])
        m = (
            pdf.groupby("user_id")
            .agg(
                n=("x", "size"),
                sx=("x", "sum"),
                sy=("y", "sum"),
                sxy=("xy", "sum"),
                sxx=("xx", "sum"),
            )
            .reset_index()
        )
        den = m["n"] * m["sxx"] - m["sx"] * m["sx"]
        keep = (m["n"] >= 2) & (den != 0)
        m, den = m[keep], den[keep]
        num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
        # int64 / int64 → float64: numpy converts each operand exactly
        # (all < 2^53) and performs the single IEEE division DuckDB's
        # BIGINT `/` performs — bit-identical
        slope = num / den
        intercept = (m["sy"] - slope * m["sx"]) / m["n"]
        return pd.DataFrame(
            {
                "user_id": m["user_id"],
                "n_obs": m["n"].astype("int64"),
                "slope_cents_per_day": slope,
                "intercept_cents": intercept,
            }
        )

    return p.groupBy("__b").applyInPandas(
        fit,
        "user_id long, n_obs long, slope_cents_per_day double, intercept_cents double",
    )
