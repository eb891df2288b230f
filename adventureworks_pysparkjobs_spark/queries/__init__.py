from .catalog import CATALOG, CatalogQuery, query

# Importing the modules registers their queries into CATALOG. Order is
# the driver's checked window: the first 50 entries (tpch..stream) each
# get a driver correctness row; `extras` MUST stay last — its bonus
# entries append beyond the window (locally oracle-tested all the same)
# without evicting a checked query.
from . import tpch, star, events, docs, vectors, stream, extras  # noqa: E402,F401

__all__ = ["CATALOG", "CatalogQuery", "query"]
