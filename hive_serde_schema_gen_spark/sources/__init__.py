from .ndjson import read_ndjson, read_ndjson_lines
from .tables import TABLES, load_table, register_views

__all__ = ["read_ndjson", "read_ndjson_lines", "TABLES", "load_table", "register_views"]
