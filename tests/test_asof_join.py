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
