"""Shared text primitives: tokenization and shingling, with exactly
matching Spark-expression and DuckDB-SQL formulations.

Convention: whitespace tokenization of trimmed lowercase text; w-word
shingles; documents shorter than w words collapse to a single
whole-document shingle (both sides implement the same CASE)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empty strings removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda x: x != F.lit("")
    )


TOKENS_SQL = (
    "list_filter(string_split_regex(lower(trim({expr})), '\\s+'), x -> x <> '')"
)


def shingles(tok: Column, w: int = 3) -> Column:
    """w-word shingles of a token array (single whole-doc shingle when
    shorter than w tokens).

    PERFORMANCE CONTRACT: pass a *column reference* to a materialized
    token array, never the tokens() expression itself — the lambda
    body embeds `tok` verbatim, so an expression argument is
    re-evaluated per shingle index (O(tokens^2) tokenization; measured
    5x slowdown at sf0.1). Bind tokens with
    ``df.select(tokens(...).alias("toks"))`` first.
    """
    return F.when(
        F.size(tok) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - F.lit(w - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, w)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tok)))


def shingles_sql(tok_expr: str, w: int = 3) -> str:
    return (
        f"CASE WHEN len({tok_expr}) >= {w} THEN "
        f"list_transform(generate_series(1, len({tok_expr}) - {w - 1}), "
        f"i -> array_to_string(({tok_expr})[i:i+{w - 1}], ' ')) "
        f"ELSE [array_to_string({tok_expr}, ' ')] END"
    )
