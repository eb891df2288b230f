from .corpus import CORPUS_TABLES, load_table, load_tables, register_views

__all__ = ["CORPUS_TABLES", "load_table", "load_tables", "register_views"]
