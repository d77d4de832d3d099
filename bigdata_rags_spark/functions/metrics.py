"""The reference's 30 derived metrics as data (SURVEY.md §2.2, R7).

Formulas transcribed one-for-one from the reference's ``withColumn(expr)``
chains — attack dag-transform.py:205-236, defense :287-318, discipline
:355-387 — with one deliberate change: every division is NULLIF-guarded so
x/0 -> NULL holds both pre-ANSI and ANSI-on (the reference relies on Spark
<4 defaults; SURVEY.md §2.2 hazard note).  Column names keep the reference's
exact spelling (spaces, parens, %), backtick-quoted.

These dicts feed ``operators.relational.derive_metrics`` (name -> SQL expr).
"""

from __future__ import annotations


def _div(num: str, den: str) -> str:
    return f"{num} / NULLIF({den}, 0)"


ATTACK_METRICS: dict[str, str] = {
    # reference dag-transform.py:206-208
    "Goal Conversion Rate": _div("`Goals per Match`", "`Big Chances`"),
    # :209
    "Clearance Efficiency": _div("`Total Clearances`", "`Matches`"),
    # :210-213
    "Possession Effectiveness": _div(
        "`Possession Won Final 3rd per Match`", "`Touches in Opposition Box`"
    ),
    # :214
    "Penalty Impact": _div("`Penalties Won`", "`Total Goals Scored`"),
    # :215-217
    "Offensive Performance": "(`Goals per Match` + `Expected Goals`) / 2",
    # :218-220
    "Assist to Goal Ratio": _div("`Actual Assists`", "`Total Goals Scored`"),
    # :221-224
    "Shooting Efficiency": "`Shots on Target per Match` * `Shot Conversion Rate (%)` / 100",
    # :225
    "Clean Sheet Impact": _div("`Clean Sheets`", "`Matches`"),
    # :226-229
    "Chances per Possession": _div(
        "`Big Chances`", "`Possession Won Final 3rd per Match`"
    ),
    # :230-235
    "Combined Attack Efficiency": (
        "(`Big Chances` + `Expected Goals` + `Touches in Opposition Box`)"
        " / NULLIF(`Matches`, 0)"
    ),
}

DEFENSE_METRICS: dict[str, str] = {
    # reference dag-transform.py:288-290
    "Interceptions Efficiency": _div("`Total Interceptions`", "`Matches`"),
    # :291 (identity copy in the reference)
    "Goals Conceded Efficiency": "`Goals Conceded per Match`",
    # :292-294
    "Save Effectiveness": _div("`Total Saves`", "`Total Goals Conceded`"),
    # :295-297
    "Penalty Average per Match": _div("`Penalties Conceded`", "`Matches`"),
    # :298-301
    "Penalty Impact on Goals": _div("`Penalty Goals Conceded`", "`Total Goals Conceded`"),
    # :302
    "Saves per Match Ratio": _div("`Saves per Match`", "`Matches`"),
    # :303-305 (identity copy)
    "Successful Tackles Average": "`Successful Tackles per Match`",
    # :306-309
    "Conceded vs Interceptions Ratio": _div(
        "`Total Goals Conceded`", "`Total Interceptions`"
    ),
    # :310-313
    "Goals Conceded to Saves Ratio": _div("`Total Goals Conceded`", "`Total Saves`"),
    # :314-317
    "Interceptions per Penalty Conceded": _div(
        "`Total Interceptions`", "`Penalties Conceded`"
    ),
}

DISCIPLINE_METRICS: dict[str, str] = {
    # reference dag-transform.py:356-358
    "Interceptions Efficiency": _div("`Total Interceptions`", "`Matches`"),
    # :359-362
    "Fouls to Interceptions Ratio": _div(
        "`Fouls per Match`", "`Interceptions per Match`"
    ),
    # :363
    "Yellow Cards per Match": _div("`Yellow Cards`", "`Matches`"),
    # :364
    "Red Cards per Match": _div("`Red Cards`", "`Matches`"),
    # :365-368
    "Fouls per Yellow Card": "(`Fouls per Match` * `Matches`) / NULLIF(`Yellow Cards`, 0)",
    # :369-372
    "Interceptions per Card": (
        "`Total Interceptions` / NULLIF(`Yellow Cards` + `Red Cards`, 0)"
    ),
    # :373-375
    "Cards per Match": "(`Yellow Cards` + `Red Cards`) / NULLIF(`Matches`, 0)",
    # :376
    "Yellow to Red Cards Ratio": _div("`Yellow Cards`", "`Red Cards`"),
    # :377-382
    "Discipline Index": (
        "(`Yellow Cards` * 1 + `Red Cards` * 2 + `Fouls per Match` * `Matches`)"
        " / NULLIF(`Matches`, 0)"
    ),
    # :383-386
    "Interceptions Impact": (
        "`Total Interceptions` / NULLIF(`Fouls per Match` * `Matches`, 0)"
    ),
}
