"""Parquet/JSON/ORC sources and the write sinks (ABSENT in the reference —
SURVEY §2.1 requires them for the target surface).

All readers return lazy DataFrames; writers are the standard Spark sinks
with mode control. At 100 TB, parquet + partitionBy(columns) is the layout
of record; writers accept ``partition_by`` for that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """``schema`` makes the read robust to an EMPTY sink directory (an
    all-rows-filtered upstream stage writes only _SUCCESS, and schema
    inference then fails with UNABLE_TO_INFER_SCHEMA — r9 edge sweep).
    At 100 TB production readers always pass explicit schemas anyway
    (inference costs a footer-read listing pass)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    return df.select(*columns) if columns else df


def read_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options: str,
) -> None:
    """``df.to_parquet/to_csv/to_json`` analog (sinks ABSENT in reference)."""
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
