"""Property-based tests (SURVEY.md §5.4): algebraic invariants that must
hold for arbitrary inputs, checked with hypothesis on tiny frames."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_rags_spark.operators.relational import multi_join, rollup_sum

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(-1000, 1000), st.floats(0, 100, allow_nan=False)),
    min_size=1,
    max_size=25,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(rows=ROWS)
@_SETTINGS
def test_rollup_sum_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, "k string, x long, y double")
    got = {
        r["k"]: (r["sx"], r["sy"])
        for r in rollup_sum(df, "k", {"sx": "x", "sy": "y"}).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "x", "y"])
    want = pdf.groupby("k").agg(sx=("x", "sum"), sy=("y", "sum"))
    assert set(got) == set(want.index)
    for k, (sx, sy) in got.items():
        assert sx == want.loc[k, "sx"]
        assert math.isclose(sy, want.loc[k, "sy"], rel_tol=1e-9, abs_tol=1e-9)


@given(
    keys_a=st.sets(KEYS, min_size=1),
    keys_b=st.sets(KEYS, min_size=1),
    keys_c=st.sets(KEYS, min_size=1),
)
@_SETTINGS
def test_multi_join_keeps_exactly_key_intersection(spark, keys_a, keys_b, keys_c):
    """Inner multi-join output keys == intersection of all input key sets
    (the reference's drop semantics, dag-transform.py:171-181)."""
    mk = lambda ks, col: spark.createDataFrame([(k, 1) for k in ks], ["Team", col])
    out = multi_join(
        mk(keys_a, "x"), "a", {"b": mk(keys_b, "y"), "c": mk(keys_c, "z")}, key="Team"
    )
    got = {r["a.Team"] if "a.Team" in r else r["Team"] for r in
           out.select("a.Team").collect()}
    assert got == (keys_a & keys_b & keys_c)


@given(rows=ROWS, scale=st.integers(2, 9))
@_SETTINGS
def test_ratio_metrics_scale_invariance(spark, rows, scale):
    """x/y is invariant under scaling both numerator and denominator —
    the property every 'per match' reference metric relies on."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k string, x long, y double")
    base = df.select(
        (F.col("x") / F.nullif(F.col("y"), F.lit(0.0))).alias("r")
    ).collect()
    scaled = df.select(
        ((F.col("x") * scale) / F.nullif(F.col("y") * scale, F.lit(0.0))).alias("r")
    ).collect()
    for b, s in zip(base, scaled):
        if b["r"] is None:
            assert s["r"] is None
        else:
            assert math.isclose(b["r"], s["r"], rel_tol=1e-9)