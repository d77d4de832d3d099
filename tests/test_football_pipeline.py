"""Pin the reference's transform semantics (SURVEY.md §2.2 R1-R7).

Fixtures follow FIXTURES.md §A requirements: a team missing from one joined
input (inner-join drop), zero divisors (Big Chances=0, Red Cards=0), multiple
players per team (rollup).  Expected values come from an independent pandas
implementation of the same formulas.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from bigdata_rags_spark.pipelines.football import (
    attack_pipeline,
    defense_pipeline,
    discipline_pipeline,
    player_assists_rollup,
)
from bigdata_rags_spark.schemas import FOOTBALL

TEAMS = ["Arsenal", "Brentford", "Chelsea", "Derby", "Everton"]


def _fixtures() -> dict[str, pd.DataFrame]:
    t = TEAMS
    return {
        # Derby has Big Chances = 0 (zero-divisor case)
        "big_chance_team": pd.DataFrame({"Team": t, "Big Chances": [50, 40, 30, 0, 20]}),
        # Everton missing -> dropped by the attack join (inner-join drop case)
        "clean_sheet_team": pd.DataFrame({"Team": t[:4], "Clean Sheets": [12, 9, 7, 3]}),
        "effective_clearance_team": pd.DataFrame(
            {"Team": t, "Clearances per Match": [18.5, 22.1, 19.0, 25.3, 21.0],
             "Total Clearances": [703, 840, 722, 961, 798]}
        ),
        "expected_goals_team": pd.DataFrame(
            {"Team": t, "Expected Goals": [68.2, 52.7, 61.4, 31.8, 44.9]}
        ),
        "ontarget_scoring_att_team": pd.DataFrame(
            {"Team": t, "Shots on Target per Match": [5.8, 4.2, 5.1, 2.9, 3.7],
             "Shot Conversion Rate (%)": [14.2, 11.8, 13.1, 8.4, 10.5]}
        ),
        "penalty_won_team": pd.DataFrame(
            {"Team": t, "Penalties Won": [6, 4, 5, 1, 3],
             "Conversion Rate (%)": [83.3, 75.0, 80.0, 100.0, 66.7]}
        ),
        "possession_won_att": pd.DataFrame(
            {"Team": t, "Possession Won Final 3rd per Match": [6.1, 4.8, 5.5, 3.2, 4.1],
             "Total Possessions Won": [232, 182, 209, 122, 156]}
        ),
        "team_goals_per_match": pd.DataFrame(
            {"Team": t, "Goals per Match": [2.4, 1.8, 2.1, 0.9, 1.4],
             "Total Goals Scored": [91, 68, 80, 34, 53], "Matches": [38, 38, 38, 38, 38]}
        ),
        "touches_in_opp_box_team": pd.DataFrame(
            {"Team": t, "Touches in Opposition Box": [1100, 860, 990, 540, 720]}
        ),
        "player_expected_assists": pd.DataFrame(
            {
                "Player": ["P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8", "P9", "P10"],
                "Team": ["Arsenal", "Arsenal", "Brentford", "Brentford", "Chelsea",
                         "Chelsea", "Derby", "Derby", "Everton", "Everton"],
                "Actual Assists": [12, 8, 7, 5, 10, 6, 2, 1, 4, 3],
                "Expected Assists (xA)": [9.5, 7.2, 6.1, 4.4, 8.8, 5.9, 1.7, 1.2, 3.6, 2.9],
            }
        ),
        "expected_goals_conceded_team": pd.DataFrame(
            {"Team": t, "Matches": [38] * 5,
             "Expected Goals Conceded": [32.1, 48.6, 39.2, 66.8, 51.3]}
        ),
        "goals_conceded_team_match": pd.DataFrame(
            {"Team": t, "Goals Conceded per Match": [0.8, 1.3, 1.1, 1.9, 1.4],
             "Total Goals Conceded": [29, 51, 43, 71, 54]}
        ),
        "interception_team": pd.DataFrame(
            {"Team": t, "Interceptions per Match": [9.4, 11.2, 10.1, 12.8, 10.9],
             "Total Interceptions": [357, 426, 384, 486, 414]}
        ),
        "penalty_conceded_team": pd.DataFrame(
            {"Team": t, "Penalties Conceded": [3, 6, 4, 9, 5],
             "Penalty Goals Conceded": [2, 5, 3, 8, 4]}
        ),
        "saves_team": pd.DataFrame(
            {"Team": t, "Saves per Match": [2.8, 3.6, 3.1, 4.4, 3.8],
             "Total Saves": [106, 137, 118, 167, 144]}
        ),
        "won_tackle_team": pd.DataFrame(
            {"Team": t, "Successful Tackles per Match": [11.2, 12.8, 11.9, 13.5, 12.1],
             "Tackle Success (%)": [68.4, 64.2, 66.8, 61.5, 63.9]}
        ),
        "fk_foul_lost_team": pd.DataFrame(
            {"Team": t, "Matches": [38] * 5, "Fouls per Match": [10.2, 12.4, 11.1, 13.8, 11.9]}
        ),
        # Chelsea has Red Cards = 0 (zero-divisor case)
        "total_yel_card_team": pd.DataFrame(
            {"Team": t, "Yellow Cards": [62, 78, 70, 95, 74], "Red Cards": [2, 4, 0, 7, 3]}
        ),
    }


@pytest.fixture(scope="module")
def spark_tables(spark):
    return {
        name: spark.createDataFrame(pdf, schema=FOOTBALL[name])
        for name, pdf in _fixtures().items()
    }


def _rows(df) -> dict[str, dict]:
    return {r["Team"]: r.asDict() for r in df.collect()}


def _close(a, b) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)


def _safe(n, d):
    return np.nan if d == 0 else n / d


def test_player_rollup_sums_per_team(spark_tables):
    out = {r["Team"]: r for r in player_assists_rollup(
        spark_tables["player_expected_assists"]).collect()}
    assert out["Arsenal"]["Actual Assists"] == 20
    assert math.isclose(out["Arsenal"]["Expected Assists"], 16.7)
    assert out["Derby"]["Actual Assists"] == 3
    assert len(out) == 5


def test_attack_inner_join_drops_missing_team(spark_tables):
    rows = _rows(attack_pipeline(spark_tables))
    # Everton absent from clean_sheet_team -> dropped (reference :171-181)
    assert set(rows) == {"Arsenal", "Brentford", "Chelsea", "Derby"}


def test_attack_metrics_match_pandas(spark_tables):
    fx = _fixtures()
    rows = _rows(attack_pipeline(spark_tables))
    for team, r in rows.items():
        def v(tbl, col):
            pdf = fx[tbl]
            return pdf.loc[pdf["Team"] == team, col].iloc[0]

        assists = fx["player_expected_assists"]
        actual_assists = assists.loc[assists["Team"] == team, "Actual Assists"].sum()
        gpm = v("team_goals_per_match", "Goals per Match")
        matches = v("team_goals_per_match", "Matches")
        goals = v("team_goals_per_match", "Total Goals Scored")
        bc = v("big_chance_team", "Big Chances")
        expected = {
            "Goal Conversion Rate": _safe(gpm, bc),
            "Clearance Efficiency": _safe(v("effective_clearance_team", "Total Clearances"), matches),
            "Possession Effectiveness": _safe(
                v("possession_won_att", "Possession Won Final 3rd per Match"),
                v("touches_in_opp_box_team", "Touches in Opposition Box")),
            "Penalty Impact": _safe(v("penalty_won_team", "Penalties Won"), goals),
            "Offensive Performance": (gpm + v("expected_goals_team", "Expected Goals")) / 2,
            "Assist to Goal Ratio": _safe(actual_assists, goals),
            "Shooting Efficiency": v("ontarget_scoring_att_team", "Shots on Target per Match")
            * v("ontarget_scoring_att_team", "Shot Conversion Rate (%)") / 100,
            "Clean Sheet Impact": _safe(v("clean_sheet_team", "Clean Sheets"), matches),
            "Chances per Possession": _safe(
                bc, v("possession_won_att", "Possession Won Final 3rd per Match")),
            "Combined Attack Efficiency": _safe(
                bc + v("expected_goals_team", "Expected Goals")
                + v("touches_in_opp_box_team", "Touches in Opposition Box"), matches),
        }
        for name, want in expected.items():
            assert _close(r[name], want), f"{team} {name}: got {r[name]} want {want}"


def test_attack_zero_big_chances_yields_null(spark_tables):
    rows = _rows(attack_pipeline(spark_tables))
    assert rows["Derby"]["Goal Conversion Rate"] is None


def test_defense_metrics_match_pandas(spark_tables):
    fx = _fixtures()
    rows = _rows(defense_pipeline(spark_tables))
    assert set(rows) == set(TEAMS)
    for team, r in rows.items():
        def v(tbl, col):
            pdf = fx[tbl]
            return pdf.loc[pdf["Team"] == team, col].iloc[0]

        matches = v("expected_goals_conceded_team", "Matches")
        conceded = v("goals_conceded_team_match", "Total Goals Conceded")
        ints = v("interception_team", "Total Interceptions")
        saves = v("saves_team", "Total Saves")
        pens = v("penalty_conceded_team", "Penalties Conceded")
        expected = {
            "Interceptions Efficiency": _safe(ints, matches),
            "Goals Conceded Efficiency": v("goals_conceded_team_match", "Goals Conceded per Match"),
            "Save Effectiveness": _safe(saves, conceded),
            "Penalty Average per Match": _safe(pens, matches),
            "Penalty Impact on Goals": _safe(
                v("penalty_conceded_team", "Penalty Goals Conceded"), conceded),
            "Saves per Match Ratio": _safe(v("saves_team", "Saves per Match"), matches),
            "Successful Tackles Average": v("won_tackle_team", "Successful Tackles per Match"),
            "Conceded vs Interceptions Ratio": _safe(conceded, ints),
            "Goals Conceded to Saves Ratio": _safe(conceded, saves),
            "Interceptions per Penalty Conceded": _safe(ints, pens),
        }
        for name, want in expected.items():
            assert _close(r[name], want), f"{team} {name}: got {r[name]} want {want}"


def test_discipline_metrics_and_zero_red_cards(spark_tables):
    fx = _fixtures()
    rows = _rows(discipline_pipeline(spark_tables))
    assert set(rows) == set(TEAMS)
    # Chelsea Red Cards = 0 -> NULL ratio (NULLIF guard; reference would NULL pre-ANSI)
    assert rows["Chelsea"]["Yellow to Red Cards Ratio"] is None
    for team, r in rows.items():
        def v(tbl, col):
            pdf = fx[tbl]
            return pdf.loc[pdf["Team"] == team, col].iloc[0]

        matches = v("fk_foul_lost_team", "Matches")
        fpm = v("fk_foul_lost_team", "Fouls per Match")
        yc = v("total_yel_card_team", "Yellow Cards")
        rc = v("total_yel_card_team", "Red Cards")
        ints = v("interception_team", "Total Interceptions")
        expected = {
            "Interceptions Efficiency": _safe(ints, matches),
            "Fouls to Interceptions Ratio": _safe(
                fpm, v("interception_team", "Interceptions per Match")),
            "Yellow Cards per Match": _safe(yc, matches),
            "Red Cards per Match": _safe(rc, matches),
            "Fouls per Yellow Card": _safe(fpm * matches, yc),
            "Interceptions per Card": _safe(ints, yc + rc),
            "Cards per Match": _safe(yc + rc, matches),
            "Yellow to Red Cards Ratio": _safe(yc, rc),
            "Discipline Index": _safe(yc * 1 + rc * 2 + fpm * matches, matches),
            "Interceptions Impact": _safe(ints, fpm * matches),
        }
        for name, want in expected.items():
            assert _close(r[name], want), f"{team} {name}: got {r[name]} want {want}"


def test_output_column_names_keep_reference_spelling(spark_tables):
    cols = attack_pipeline(spark_tables).columns
    assert "Shot Conversion Rate (%)" in cols
    # reference dag-transform.py:168/:192 alias spellings, exactly (ADVICE r1)
    assert "Expected Assists" in cols and "Expected Assists (xA)" not in cols
    assert "Penalties Conversion Rate (%)" in cols
    assert "Combined Attack Efficiency" in cols
