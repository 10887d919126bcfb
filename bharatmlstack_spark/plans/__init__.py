from bharatmlstack_spark.plans.explain_tools import (
    explain_formatted,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
from bharatmlstack_spark.plans.skew import salted_agg, salted_join
from bharatmlstack_spark.plans.zorder import z_value, z_value_sql, zorder_layout

__all__ = [
    "explain_formatted",
    "has_broadcast_join",
    "has_whole_stage_codegen",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
    "salted_agg",
    "salted_join",
    "z_value",
    "z_value_sql",
    "zorder_layout",
]
