"""Reusable column-function surface of the engine.

Everything here is a Column -> Column (or Column-producing) function built
on pyspark.sql.functions — JVM-evaluated, codegen-friendly. This is the
public 'expression library' counterpart to the operator library.
"""

from ..operators.relational import dec
from .fiscal import fiscal_cols, fiscal_sql
from ..operators.similarity import cosine, dot_fold, norm_fold, srp_bucket
from ..operators.text import (
    bpe_tokens,
    language_scores,
    shingles,
    token_count,
    tokens,
)

__all__ = [
    "dec",
    "fiscal_cols",
    "fiscal_sql",
    "cosine",
    "dot_fold",
    "norm_fold",
    "srp_bucket",
    "bpe_tokens",
    "language_scores",
    "shingles",
    "token_count",
    "tokens",
]
