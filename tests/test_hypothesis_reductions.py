"""Property-based differential testing (SURVEY §5.2.4): randomized frames
(values, nulls, partition counts) → LDFrame reductions must match pandas.
Bounded example counts keep Spark-job overhead sane; hypothesis still
explores null-heavy/empty/single-row corners a fixture never hits."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lithops_dataframe_spark.frame import LDFrame

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
cell = st.one_of(st.none(), finite)


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    a = draw(st.lists(cell, min_size=n, max_size=n))
    b = draw(st.lists(cell, min_size=n, max_size=n))
    parts = draw(st.integers(min_value=1, max_value=4))
    return pd.DataFrame({"a": a, "b": b}, dtype="float64"), parts


def _close(x, y):
    if x is None and (y is None or (isinstance(y, float) and math.isnan(y))):
        return True
    if y is None or (isinstance(y, float) and math.isnan(y)):
        return x is None
    if x is None:
        return False
    return math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(fp=frames())
@pytest.mark.parametrize("op", ["sum", "mean", "min", "max", "std"])
def test_reductions_match_pandas_on_random_frames(spark, op, fp):
    pdf, parts = fp
    ldf = LDFrame(
        spark.createDataFrame(pdf, schema="a double, b double").repartition(parts)
    )
    got = getattr(ldf, op)(axis=0).collect()[0].asDict()
    exp = getattr(pdf, op)(axis=0, skipna=True)
    for c in ("a", "b"):
        e = exp[c]
        e = None if (isinstance(e, float) and math.isnan(e)) else e
        # SQL convention: sum over all-null → NULL (pandas gives 0.0)
        if op == "sum" and e == 0.0 and pdf[c].notna().sum() == 0:
            e = None
        assert _close(got[c], e), f"{op} col={c}: spark={got[c]} pandas={e}\n{pdf}"
