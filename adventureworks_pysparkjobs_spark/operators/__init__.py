from .relational import dec, enforce_schema, sessionize, topk_per_group

__all__ = ["dec", "enforce_schema", "sessionize", "topk_per_group"]
