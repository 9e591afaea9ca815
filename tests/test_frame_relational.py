"""Differential tests for the LDFrame relational veneer (merge / groupby /
sort / dedup / fillna / dropna) against pandas on the same data — the
reference's duck-typed surface (utils.py:319-336 requires merge+groupby
attributes; its merge subsystem was the never-written multi.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from lithops_dataframe_spark.frame import LDFrame

LEFT = pd.DataFrame(
    {
        "k": [1, 2, 2, 3, 4],
        "v": [10.0, 20.0, 21.0, 30.0, 40.0],
        "tag": ["a", "b", "b", "c", "d"],
    }
)
RIGHT = pd.DataFrame({"k": [2, 3, 3, 5], "w": [200, 300, 301, 500], "tag": ["x", "y", "z", "q"]})


@pytest.fixture(scope="module")
def lf(spark):
    return LDFrame(spark.createDataFrame(LEFT).repartition(3))


@pytest.fixture(scope="module")
def rf(spark):
    return LDFrame(spark.createDataFrame(RIGHT).repartition(2))


def _norm(pdf: pd.DataFrame, cols):
    return sorted(map(tuple, pdf[cols].fillna("∅").values.tolist()))


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_merge_matches_pandas(lf, rf, how):
    got = lf.merge(rf, on="k", how=how).to_pandas()
    exp = LEFT.merge(RIGHT, on="k", how=how)
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    assert _norm(got, cols) == _norm(exp, cols)


def test_groupby_agg_dict(lf):
    got = lf.groupby("k").agg({"v": ["sum", "max"], "tag": "count"}).to_pandas()
    exp = (
        LEFT.groupby("k")
        .agg(v_sum=("v", "sum"), v_max=("v", "max"), tag_count=("tag", "count"))
        .reset_index()
    )
    assert _norm(got, ["k", "v_sum", "v_max", "tag_count"]) == _norm(
        exp, ["k", "v_sum", "v_max", "tag_count"]
    )


def test_groupby_shortcuts(lf):
    got = lf.groupby("tag").sum().to_pandas()
    exp = LEFT.groupby("tag")[["k", "v"]].sum().reset_index()
    assert _norm(got, ["tag", "k", "v"]) == _norm(exp, ["tag", "k", "v"])
    gotc = lf.groupby("tag").count().to_pandas()
    expc = LEFT.groupby("tag").size().rename("count").reset_index()
    assert _norm(gotc, ["tag", "count"]) == _norm(expc, ["tag", "count"])


def test_sort_values_head(lf):
    got = lf.sort_values("v", ascending=False).head(2)
    exp = LEFT.sort_values("v", ascending=False).head(2).reset_index(drop=True)
    assert got["v"].tolist() == exp["v"].tolist()


def test_drop_duplicates_rename_drop(lf):
    assert lf.drop_duplicates(["k"]).spark.count() == LEFT.drop_duplicates(["k"]).shape[0]
    assert lf.rename({"v": "val"}).columns == ["k", "val", "tag"]
    assert lf.drop("tag").columns == ["k", "v"]


def test_fillna_dropna(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": ["x", "y", None]})
    f = LDFrame(spark.createDataFrame(pdf, schema="a double, b string"))
    assert f.fillna(0.0).to_pandas()["a"].tolist() == [1.0, 0.0, 3.0]
    assert f.dropna().spark.count() == 1
    assert f.dropna(subset=["a"]).spark.count() == 2
    assert f.dropna(how="all").spark.count() == 3


def test_value_counts_nlargest(lf):
    got = lf.value_counts("tag").toPandas()
    exp = LEFT["tag"].value_counts()
    assert dict(zip(got["tag"], got["count"])) == exp.to_dict()
    top = lf.nlargest(2, "v").to_pandas()
    assert sorted(top["v"].tolist()) == sorted(LEFT.nlargest(2, "v")["v"].tolist())
    bot = lf.nsmallest(2, "v").to_pandas()
    assert sorted(bot["v"].tolist()) == sorted(LEFT.nsmallest(2, "v")["v"].tolist())


def test_persist_unpersist(lf):
    assert lf.persist().spark.is_cached
    assert not lf.unpersist().spark.is_cached


def test_melt_matches_pandas(lf):
    got = lf.melt(["k"], ["v"], "var", "val").to_pandas()
    exp = LEFT.melt(id_vars=["k"], value_vars=["v"], var_name="var", value_name="val")
    assert sorted(map(tuple, got[["k", "var", "val"]].values.tolist())) == sorted(
        map(tuple, exp[["k", "var", "val"]].values.tolist())
    )


def test_sample_deterministic_with_seed(lf):
    pinned = lf.spark.repartition(2)
    from lithops_dataframe_spark.frame import LDFrame

    a = sorted(r["k"] for r in LDFrame(pinned).sample(0.6, seed=7).spark.collect())
    b = sorted(r["k"] for r in LDFrame(pinned).sample(0.6, seed=7).spark.collect())
    assert a == b


def test_sample_by_strata(spark):
    import pandas as pd

    pdf = pd.DataFrame({"g": ["a"] * 100 + ["b"] * 100, "x": range(200)})
    from lithops_dataframe_spark.frame import LDFrame

    f = LDFrame(spark.createDataFrame(pdf))
    got = f.sample_by("g", {"a": 1.0, "b": 0.0}, seed=1).to_pandas()
    assert set(got["g"]) == {"a"} and len(got) == 100


def test_merge_semi_anti(lf, rf):
    semi = lf.merge(rf, on="k", how="semi").to_pandas()
    assert sorted(semi["k"].unique()) == [2, 3]
    anti = lf.merge(rf, on="k", how="anti").to_pandas()
    assert sorted(anti["k"].unique()) == [1, 4]
