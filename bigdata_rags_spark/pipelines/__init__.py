"""Pipeline drivers: the reference's three transform families and the
raw->stage->exploration zone runner."""

from bigdata_rags_spark.pipelines.football import (
    attack_pipeline,
    defense_pipeline,
    discipline_pipeline,
    player_assists_rollup,
)

__all__ = [
    "attack_pipeline",
    "defense_pipeline",
    "discipline_pipeline",
    "player_assists_rollup",
]
