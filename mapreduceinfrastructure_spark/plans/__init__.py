from .explain import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "shuffle_count",
    "wholestage_codegen_spans",
]
