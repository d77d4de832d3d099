"""Explicit StructType schema registry.

The reference never declares a schema — every read is
``inferSchema=True`` (reference dag-transform.py:134-163), which costs an
extra full pass per read and yields fragile types.  At 100 TB an inference
pass over the input is unacceptable; every registered dataset here has an
explicit schema (SURVEY.md §1.2).

Two families:
- ``TESTDATA``: the driver's TPC-H-ish parquet tables (FIXTURES.md §B).
- ``FOOTBALL``: the reference's 18 source tables (FIXTURES.md §A), with the
  reference's exact column names including spaces/parens/% — quoting those
  correctly is part of the surface under test (reference dag-transform.py:190).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §B)
# --------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --------------------------------------------------------------------------
# Reference-shaped football tables (FIXTURES.md §A; columns proven by
# select/expr usage in reference dag-transform.py — spaces/% kept exactly)
# --------------------------------------------------------------------------


def _tbl(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


_S, _I, _D = T.StringType(), T.IntegerType(), T.DoubleType()

FOOTBALL: dict[str, T.StructType] = {
    # attack inputs (reference dag-transform.py:134-163,183-198)
    "big_chance_team": _tbl(("Team", _S), ("Big Chances", _I)),
    "clean_sheet_team": _tbl(("Team", _S), ("Clean Sheets", _I)),
    "effective_clearance_team": _tbl(
        ("Team", _S), ("Clearances per Match", _D), ("Total Clearances", _I)
    ),
    "expected_goals_team": _tbl(("Team", _S), ("Expected Goals", _D)),
    "ontarget_scoring_att_team": _tbl(
        ("Team", _S), ("Shots on Target per Match", _D), ("Shot Conversion Rate (%)", _D)
    ),
    "penalty_won_team": _tbl(
        ("Team", _S), ("Penalties Won", _I), ("Conversion Rate (%)", _D)
    ),
    "possession_won_att": _tbl(
        ("Team", _S), ("Possession Won Final 3rd per Match", _D), ("Total Possessions Won", _I)
    ),
    "team_goals_per_match": _tbl(
        ("Team", _S), ("Goals per Match", _D), ("Total Goals Scored", _I), ("Matches", _I)
    ),
    "touches_in_opp_box_team": _tbl(("Team", _S), ("Touches in Opposition Box", _I)),
    # player grain (reference dag-transform.py:166-169)
    "player_expected_assists": _tbl(
        ("Player", _S), ("Team", _S), ("Actual Assists", _I), ("Expected Assists (xA)", _D)
    ),
    # defense inputs (reference dag-transform.py:246-259,270-282)
    "expected_goals_conceded_team": _tbl(
        ("Team", _S), ("Matches", _I), ("Expected Goals Conceded", _D)
    ),
    "goals_conceded_team_match": _tbl(
        ("Team", _S), ("Goals Conceded per Match", _D), ("Total Goals Conceded", _I)
    ),
    "interception_team": _tbl(
        ("Team", _S), ("Interceptions per Match", _D), ("Total Interceptions", _I)
    ),
    "penalty_conceded_team": _tbl(
        ("Team", _S), ("Penalties Conceded", _I), ("Penalty Goals Conceded", _I)
    ),
    "saves_team": _tbl(("Team", _S), ("Saves per Match", _D), ("Total Saves", _I)),
    "won_tackle_team": _tbl(
        ("Team", _S), ("Successful Tackles per Match", _D), ("Tackle Success (%)", _D)
    ),
    # discipline inputs (reference dag-transform.py:328-336,344-350)
    "fk_foul_lost_team": _tbl(("Team", _S), ("Matches", _I), ("Fouls per Match", _D)),
    "total_yel_card_team": _tbl(("Team", _S), ("Yellow Cards", _I), ("Red Cards", _I)),
}
