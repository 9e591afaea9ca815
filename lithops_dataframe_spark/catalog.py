"""Fixture/table loaders for the driver's star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under an
``sf_dir`` such as ``/root/testdata/sf0.01``.

Scale notes: parquet scans get column pruning + predicate pushdown from
Catalyst for free; loaders never collect or cache eagerly. At 100 TB the
same loaders point at partitioned parquet/object-store layouts — Spark's
Hadoop FS connectors (s3a://, gs://, abfss://) replace the local paths
transparently (reference analog: the IBM-COS object URL in
``/root/reference/dataframe/io.py:80-85``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions whose row count is CONSTANT in SF — the only tables the query
# library ever broadcast-hints. supplier/customer/part scale linearly with
# SF and are deliberately excluded: their joins are AQE-sized (broadcast
# while they fit the threshold, shuffle at 100 TB).
BROADCAST_DIMS = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """The events-table contract normalizer (batch AND streaming inputs):

    - ts: parquet TIMESTAMP(NANOS) → read as long nanos
      (spark.sql.legacy.parquet.nanosAsLong) and truncate to micros,
      matching DuckDB's ns→µs truncation in the oracle.
    - value: non-finite measurement policy (r12 edge class) — NaN/±Inf
      map to NULL (missing measurement) at first touch. Real streams
      carry them (sensor glitches, upstream division artifacts) and the
      engines disagree structurally: ANSI cents-exact casts crash on
      BOTH engines, and where nothing crashes the comparison/ordering
      semantics fork (Spark NaN > x is TRUE and NaN sorts largest;
      DuckDB follows IEEE in comparisons). NULL routes every downstream
      statistic through the NULL-skip machinery both engines agree on.
      The oracle twin is the shadowing CTE every events oracle gets in
      plans/registry.py::register.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lithops_dataframe_spark.operators.util import finite_or_null

    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, not floor(x/1000): double division loses ulps at
        # ~1.7e18 ns and shifts some timestamps by 1 µs vs the oracle.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("value", finite_or_null("value"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); Spark refuses it unless the
        # legacy nanos-as-long conf is on. Set it here (runtime-settable SQL
        # conf) so ANY SparkSession — including the driver's, which doesn't use
        # our session builder — can read the table.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` works on them."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
