from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .text import read_text_lines

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_text_lines",
]
