from apache_beam_challange_spark.operators.relational import (
    drop_null_rows,
    group_count,
    project,
    top_k,
)
from apache_beam_challange_spark.operators.joins import (
    all_pairs,
    full_outer_zero_fill,
)

__all__ = [
    "all_pairs",
    "drop_null_rows",
    "full_outer_zero_fill",
    "group_count",
    "project",
    "top_k",
]
