from .catalog import CATALOG, CatalogQuery, query

# Importing the modules registers their queries into CATALOG.
from . import tpch, star, events, docs, vectors, stream  # noqa: E402,F401

__all__ = ["CATALOG", "CatalogQuery", "query"]
