"""File-level proof for io_merge_upsert_partitioned: the dynamic
partition overwrite must leave every UNTOUCHED month partition's files
byte-identical (same paths, same sizes, same mtimes) — the oracle's
full-table replay proves row survival; this proves the cheaper claim
that those partitions were never even rewritten (the O(touched) cost
model in SCALE.md)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def _snapshot(path: str) -> dict[str, tuple[int, float]]:
    return {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(os.path.join(path, "m=*", "*.parquet"))
    }


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    base = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.lit("base").alias("src"),
        )
    )
    path = str(tmp_path / "orders_by_month")
    base.write.partitionBy("m").mode("overwrite").parquet(path)
    before = _snapshot(path)

    upd = base.filter((F.col("k") % 97 == 0) & F.col("m").startswith("1996-")).select(
        "k", "m", (F.col("cents") + 500).alias("cents"), F.lit("upd").alias("src")
    )
    months = [r["m"] for r in upd.select("m").distinct().collect()]
    assert months, "fixture produced no touched months — test vacuous"

    target = spark.read.parquet(path)
    merged = target.filter(F.col("m").isin(months)).join(
        upd.select("k"), "k", "left_anti"
    ).unionByName(upd.select(*target.columns))
    (
        merged.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("m")
        .mode("overwrite")
        .parquet(path)
    )

    after = _snapshot(path)
    touched_prefixes = tuple(os.path.join(path, f"m={m}") + os.sep for m in months)
    before_untouched = {
        f: s for f, s in before.items() if not f.startswith(touched_prefixes)
    }
    after_untouched = {
        f: s for f, s in after.items() if not f.startswith(touched_prefixes)
    }
    assert before_untouched == after_untouched, (
        "dynamic overwrite disturbed files in partitions the batch never touched"
    )
    # and the touched partitions really were rewritten
    assert any(
        before.get(f) != after.get(f)
        for f in set(before) | set(after)
        if f.startswith(touched_prefixes)
    ), "no touched partition changed — overwrite did nothing"
