"""Differential tests for asof_join against pandas merge_asof — the
reference's pandas-parity oracle — across directions, exact-match
handling, and grouped (`by`) joins, on data with ties and unmatched keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lithops_dataframe_spark.operators.joins import asof_join, range_join

LEFT = pd.DataFrame(
    {
        "t": [1.0, 2.0, 3.0, 5.0, 7.0, 7.0, 10.0],
        "g": ["a", "a", "b", "a", "b", "a", "c"],
        "lv": [10, 20, 30, 40, 50, 60, 70],
    }
)
RIGHT = pd.DataFrame(
    {
        "t": [0.5, 2.0, 4.0, 6.5, 9.0],
        "g": ["a", "a", "b", "a", "b"],
        "rv": [100, 200, 300, 400, 500],
    }
)


def _right(by):
    # ungrouped case: drop g from the right side so both engines keep a
    # single unsuffixed g column from the left
    return RIGHT if by else RIGHT.drop(columns=["g"])


def _spark_asof(spark, by, direction, allow_exact):
    l = spark.createDataFrame(LEFT)
    r = spark.createDataFrame(_right(by))
    out = asof_join(
        l, r, on="t", by=by, direction=direction, allow_exact_matches=allow_exact
    ).toPandas()
    return sorted(map(tuple, out[["t", "g", "lv", "rv"]].fillna(-1).values.tolist()))


def _pandas_asof(by, direction, allow_exact):
    exp = pd.merge_asof(
        LEFT.sort_values("t"),
        _right(by).sort_values("t"),
        on="t",
        by=by,
        direction=direction,
        allow_exact_matches=allow_exact,
    )
    return sorted(map(tuple, exp[["t", "g", "lv", "rv"]].fillna(-1).values.tolist()))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
@pytest.mark.parametrize("by", [None, "g"])
def test_asof_matches_pandas(spark, by, direction, allow_exact):
    got = _spark_asof(spark, by, direction, allow_exact)
    exp = _pandas_asof(by, direction, allow_exact)
    assert got == exp, f"by={by} direction={direction} exact={allow_exact}"


def test_range_join_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    pts = pd.DataFrame({"p": rng.uniform(0, 100, 200), "pid": range(200)})
    iv = pd.DataFrame(
        {
            "lo": rng.uniform(0, 90, 40),
            "w": rng.uniform(0.5, 25, 40),
            "iid": range(40),
        }
    )
    iv["hi"] = iv["lo"] + iv["w"]
    got = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv[["lo", "hi", "iid"]]),
        "p",
        "lo",
        "hi",
        bucket_width=10.0,
    ).toPandas()
    exp = pts.merge(iv, how="cross")
    exp = exp[(exp["p"] >= exp["lo"]) & (exp["p"] < exp["hi"])]
    assert sorted(zip(got["pid"], got["iid"])) == sorted(zip(exp["pid"], exp["iid"]))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_global_multi_partition(spark, direction):
    """by=None at scale: the union is range-partitioned (here forced to 6
    partitions well below row count) and carried in two passes — results
    must still match pandas merge_asof exactly, including left rows whose
    match lives in an EARLIER partition (carry-in patch path)."""
    rng = np.random.RandomState(11)
    l = pd.DataFrame({"t": np.sort(rng.uniform(0, 1000, 400)), "lv": np.arange(400)})
    # sparse right side => long runs of left rows (and whole partitions)
    # with no local right row, exercising the boundary carry
    r = pd.DataFrame({"t": np.sort(rng.uniform(0, 1000, 7)), "rv": np.arange(7)})
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "6")
    # AQE would legitimately coalesce this tiny shuffle back to 1 task;
    # disable so the test actually runs the multi-partition carry path
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        sdf = asof_join(
            spark.createDataFrame(l).repartition(6),
            spark.createDataFrame(r).repartition(3),
            on="t",
            direction=direction,
        )
        assert sdf.rdd.getNumPartitions() > 1
        got = sdf.toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)
    exp = pd.merge_asof(l, r, on="t", direction=direction)
    got = got.sort_values("lv").reset_index(drop=True)
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


def test_asof_carries_matched_rows_own_nulls(spark):
    """The matched right row travels as one struct: a null in the nearest
    right row must NOT be backfilled from an older right row (pandas
    semantics), which per-column last(ignorenulls) would get wrong."""
    l = pd.DataFrame({"t": [5.0], "g": ["a"]})
    r = pd.DataFrame(
        {"t": [1.0, 3.0], "g": ["a", "a"], "rv": [111.0, None], "rw": [7.0, 8.0]}
    )
    out = asof_join(
        spark.createDataFrame(l), spark.createDataFrame(r), on="t", by="g"
    ).toPandas()
    assert out["rw"].tolist() == [8.0]
    assert pd.isna(out["rv"]).all(), "nearest row's null must be carried as-is"


@pytest.mark.parametrize("by", [None, "g"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_nearest_matches_pandas(spark, by, allow_exact):
    got = _spark_asof(spark, by, "nearest", allow_exact)
    exp = _pandas_asof(by, "nearest", allow_exact)
    assert got == exp, f"by={by} exact={allow_exact}"


def test_asof_nearest_tie_prefers_backward(spark):
    l = pd.DataFrame({"t": [5.0], "lv": [1]})
    r = pd.DataFrame({"t": [3.0, 7.0], "rv": [10, 20]})  # equidistant
    out = asof_join(
        spark.createDataFrame(l), spark.createDataFrame(r), on="t", direction="nearest"
    ).toPandas()
    exp = pd.merge_asof(l, r, on="t", direction="nearest")
    assert out["rv"].tolist() == exp["rv"].tolist() == [10]


def test_asof_nearest_random_differential(spark):
    rng = np.random.RandomState(23)
    l = pd.DataFrame({"t": np.sort(rng.uniform(0, 100, 150)), "lv": np.arange(150)})
    r = pd.DataFrame({"t": np.sort(rng.uniform(-10, 110, 30)), "rv": np.arange(30)})
    got = asof_join(
        spark.createDataFrame(l), spark.createDataFrame(r), on="t", direction="nearest"
    ).toPandas().sort_values("lv")
    exp = pd.merge_asof(l, r, on="t", direction="nearest")
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


def test_asof_nearest_multi_partition_no_materialization(spark):
    """VERDICT r4 task 4: nearest must (a) match pandas on a ≥4-partition
    left frame WITH duplicate rows, and (b) derive its re-join key from
    row content instead of eagerly localCheckpoint-ing the whole left
    side (a checkpoint surfaces as 'ExistingRDD' in the analyzed plan)."""
    rng = np.random.RandomState(31)
    t = np.sort(rng.uniform(0, 500, 300))
    t[50:60] = t[50]  # ties on the join axis
    l = pd.DataFrame({"t": t, "lv": rng.randint(0, 5, 300)})
    # true duplicate rows (same t AND lv) — interchangeable, must not
    # break the content-derived pairing
    l = pd.concat([l, l.iloc[100:110]], ignore_index=True).sort_values("t")
    r = pd.DataFrame({"t": np.sort(rng.uniform(-20, 520, 40)), "rv": np.arange(40)})
    sdf = asof_join(
        spark.createDataFrame(l).repartition(5),
        spark.createDataFrame(r),
        on="t",
        direction="nearest",
    )
    # localCheckpoint renders as 'LogicalRDD' in the ANALYZED plan
    # ('ExistingRDD' only appears in physical plans) — assert on the
    # string that actually detects a regression to eager materialization
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" not in plan, "nearest path eagerly materialized the left frame"
    # compare row-aligned per (t, lv) — a sorted-multiset compare of rv
    # alone would miss wrong PAIRINGS that permute matches between rows
    got = sorted(
        map(tuple, sdf.toPandas()[["t", "lv", "rv"]].fillna(-1).values.tolist())
    )
    expdf = pd.merge_asof(l.sort_values("t"), r, on="t", direction="nearest")
    exp = sorted(map(tuple, expdf[["t", "lv", "rv"]].fillna(-1).values.tolist()))
    assert got == exp


def test_asof_nearest_unhashable_column_falls_back(spark):
    """A VARIANT left column can't feed xxhash64/orderBy — the nearest
    path must route to the checkpoint fallback instead of crashing
    (review finding r5), and still match pandas."""
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        pd.DataFrame({"t": [1.0, 4.0, 9.0], "props": ['{"a":1}', '{"a":2}', '{"a":3}']})
    ).withColumn("props", F.parse_json("props"))
    r = spark.createDataFrame(pd.DataFrame({"t": [2.0, 8.0], "rv": [10, 20]}))
    out = asof_join(l, r, on="t", direction="nearest").toPandas().sort_values("t")
    assert out["rv"].tolist() == [10, 10, 20]


def test_asof_nearest_nondeterministic_plan_falls_back(spark):
    """ADVICE r5: a left PLAN containing re-evaluation-unstable expressions
    (rand, bare limit, ...) must route nearest to the checkpoint fallback —
    the backward and forward passes re-evaluate the lineage, and a
    content-derived key would silently mispair rows whose contents changed
    between evaluations. Assert the fallback engaged (LogicalRDD in the
    analyzed plan) and the join is still correct."""
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        pd.DataFrame({"t": [1.0, 4.0, 9.0]})
    ).withColumn("noise", F.rand(7))
    r = spark.createDataFrame(pd.DataFrame({"t": [2.0, 8.0], "rv": [10, 20]}))
    sdf = asof_join(l, r, on="t", direction="nearest")
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan, "rand() left plan must take the checkpoint path"
    out = sdf.toPandas().sort_values("t")
    assert out["rv"].tolist() == [10, 10, 20]

    # bare LIMIT selects an arbitrary row subset per evaluation — same route
    l2 = spark.createDataFrame(
        pd.DataFrame({"t": [1.0, 4.0, 9.0, 12.0]})
    ).limit(4)
    sdf2 = asof_join(l2, r, on="t", direction="nearest")
    assert "LogicalRDD" in sdf2._jdf.queryExecution().analyzed().toString()
    assert sdf2.count() == 4


def test_asof_nearest_caller_supplied_key(spark):
    """left_key short-circuits key derivation: results identical and the
    plan carries no derived __lh/__ln columns."""
    l = pd.DataFrame({"t": [1.0, 4.0, 9.0], "k": [0, 1, 2]})
    r = pd.DataFrame({"t": [2.0, 8.0], "rv": [10, 20]})
    sdf = asof_join(
        spark.createDataFrame(l),
        spark.createDataFrame(r),
        on="t",
        direction="nearest",
        left_key="k",
    )
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "__lh" not in plan and "LogicalRDD" not in plan
    out = sdf.toPandas().sort_values("k")
    exp = pd.merge_asof(l, r, on="t", direction="nearest")
    assert out["rv"].tolist() == exp["rv"].tolist()


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketed interval-overlap join equals the brute-force theta join,
    duplicate-free, across bucket boundaries and containments."""
    from lithops_dataframe_spark.operators.joins import interval_overlap_join

    rng = np.random.RandomState(13)
    l = pd.DataFrame(
        {"llo": rng.uniform(0, 100, 80), "lw": rng.uniform(0.5, 30, 80), "lid": range(80)}
    )
    l["lhi"] = l["llo"] + l["lw"]
    r = pd.DataFrame(
        {"rlo": rng.uniform(-10, 110, 30), "rw": rng.uniform(0.5, 50, 30), "rid": range(30)}
    )
    r["rhi"] = r["rlo"] + r["rw"]
    got = interval_overlap_join(
        spark.createDataFrame(l[["llo", "lhi", "lid"]]),
        spark.createDataFrame(r[["rlo", "rhi", "rid"]]),
        "llo", "lhi", "rlo", "rhi",
        bucket_width=8.0,
    ).toPandas()
    exp = l.merge(r, how="cross")
    exp = exp[(exp["llo"] < exp["rhi"]) & (exp["rlo"] < exp["lhi"])]
    assert sorted(zip(got["lid"], got["rid"])) == sorted(zip(exp["lid"], exp["rid"]))
    assert len(got) == len(set(zip(got["lid"], got["rid"]))), "duplicates emitted"


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("by", [None, "g"])
def test_asof_tolerance_matches_pandas(spark, by, direction):
    """tolerance (r6): matches farther than the tolerance are discarded —
    the left row survives with nulls, exactly pandas merge_asof."""
    l = spark.createDataFrame(LEFT)
    r = spark.createDataFrame(_right(by))
    got = asof_join(
        l, r, on="t", by=by, direction=direction, tolerance=1.5
    ).toPandas()
    got_rows = sorted(map(tuple, got[["t", "g", "lv", "rv"]].fillna(-1).values.tolist()))
    exp = pd.merge_asof(
        LEFT.sort_values("t"),
        _right(by).sort_values("t"),
        on="t",
        by=by,
        direction=direction,
        tolerance=1.5,
    )
    exp_rows = sorted(map(tuple, exp[["t", "g", "lv", "rv"]].fillna(-1).values.tolist()))
    assert got_rows == exp_rows, f"by={by} direction={direction}"
