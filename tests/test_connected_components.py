"""connected_components: correctness on a deep (chain) graph and bounded
lineage via the periodic localCheckpoint (a 1000-iteration-capable loop must
not grow its plan linearly with rounds)."""

from __future__ import annotations

from lithops_dataframe_spark.operators.dedup import connected_components


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_chain_graph_converges_to_min_label(spark):
    # path 0-1-2-...-11: diameter 11 forces ~11 propagation rounds, well
    # past several checkpoint boundaries.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a: long, id_b: long"
    )
    out = connected_components(pairs)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == {i: 0 for i in range(12)}


def test_two_components_and_early_exit(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long"
    )
    out = connected_components(pairs, max_iterations=20)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_lineage_bounded_by_checkpoint(spark):
    """After a deep run the returned frame's plan must hang off a
    checkpoint scan (ExistingRDD / LogicalRDD), not the full join chain —
    the plan string for 11 rounds stays around the 1-round size instead of
    growing ~linearly with iterations."""
    deep = spark.createDataFrame([(i, i + 1) for i in range(11)], "id_a: long, id_b: long")
    shallow = spark.createDataFrame([(1, 2)], "id_a: long, id_b: long")
    deep_plan = _plan(connected_components(deep))
    shallow_plan = _plan(connected_components(shallow))
    assert "LogicalRDD" in deep_plan or "ExistingRDD" in deep_plan
    assert len(deep_plan) < 5 * len(shallow_plan)
