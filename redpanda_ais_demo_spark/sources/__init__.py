from . import jsonl
from .tables import TABLES, load_table, register_views

__all__ = ["TABLES", "jsonl", "load_table", "register_views"]
