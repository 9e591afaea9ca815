"""Property-based differential for asof_join vs pandas merge_asof
(all three directions, exact-match toggled, ties, duplicates, random
partitioning) — written for the r5 derived-key nearest path, whose
correctness argument ("content-derived keys pair duplicates
consistently across the two directional passes") deserves adversarial
inputs a fixture never produces: heavy value ties, exact duplicate
rows, one-sided misses."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lithops_dataframe_spark.operators.joins import asof_join

# small integer-grid times produce dense TIES; values distinct per row
times = st.lists(
    st.integers(min_value=0, max_value=15), min_size=1, max_size=14
)


@st.composite
def asof_case(draw):
    lt = sorted(draw(times))
    # right times are DEDUPED: among right rows tied on the join key,
    # pandas picks by input order, which has no distributed analog — the
    # engine's winner among exact right ties is unspecified. Left ties
    # and duplicated left times stay in (each left row matches
    # independently).
    rt = sorted(set(draw(times)))
    dup = draw(st.integers(min_value=0, max_value=2))
    lt = sorted(lt + lt[:dup])  # duplicated left times
    parts = draw(st.integers(min_value=1, max_value=4))
    return lt, rt, parts


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=asof_case())
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas_on_random_cases(spark, direction, allow_exact, case):
    lt, rt, parts = case
    l = pd.DataFrame({"t": np.array(lt, dtype="float64")})
    l["lv"] = np.arange(len(l))  # distinct payload per left row
    r = pd.DataFrame({"t": np.array(rt, dtype="float64")})
    r["rv"] = np.arange(len(r))
    got = (
        asof_join(
            spark.createDataFrame(l).repartition(parts),
            spark.createDataFrame(r),
            on="t",
            direction=direction,
            allow_exact_matches=allow_exact,
        )
        .toPandas()
        .sort_values(["t", "lv"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        l.sort_values(["t", "lv"]),
        r,
        on="t",
        direction=direction,
        allow_exact_matches=allow_exact,
    ).reset_index(drop=True)
    # duplicate left rows share (t, lv)? no — lv is distinct even for
    # duplicated times, so row-aligned compare catches wrong pairings
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist(), (
        f"direction={direction} exact={allow_exact} lt={lt} rt={rt}"
    )
