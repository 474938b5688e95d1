"""Text primitives: tokenization, stopwords, n-gram shingles.

Tokenization contract (shared with every DuckDB oracle):
``split(trim(lower(text)), '\\s+')`` — lowercase, trim, split on
whitespace runs. Keep the two sides in lock-step or value hashes
drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Per-language stopword marker lists for the n-gram-heuristic
#: language ID (SURVEY §2 #36). Fixed priority order en>de>fr>es
#: breaks ties deterministically.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "et", "est", "une", "dans", "que", "pour"],
    "es": ["el", "los", "las", "y", "es", "una", "por", "como"],
}

#: BPE-ish token pattern: letter runs | single digits | single
#: punctuation. Mirrors a byte-pair pre-tokenizer's coarse split.
BPE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text (array<string>)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def stopword_hits(text_tokens: Column, lang: str) -> Column:
    """Count of distinct stopword types present (set intersection —
    JVM-side, no UDF)."""
    return F.size(
        F.array_intersect(text_tokens, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def _check_shingle_n(n: int) -> None:
    if not 1 <= n <= 8:
        raise ValueError(f"shingle width n must be in 1..8, got {n}")


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    posexplode + n-1 positional self-joins — identical semantics to
    the unnest/generate_subscripts SQL the oracles use. Scale: one
    narrow explode, no UDF; downstream consumers join on `shingle`
    (the inverted-index pattern), never on doc pairs.
    """
    _check_shingle_n(n)
    toks = df.select(
        F.col(id_col).alias("_id"), F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    joined = toks.alias("t1")
    for k in range(2, n + 1):
        joined = joined.join(
            toks.alias(f"t{k}"),
            (F.col("t1._id") == F.col(f"t{k}._id"))
            & (F.col(f"t{k}.pos") == F.col("t1.pos") + (k - 1)),
        )
    return joined.select(
        F.col("t1._id").alias(id_col),
        F.concat_ws(" ", *[f"t{k}.w" for k in range(1, n + 1)]).alias("shingle"),
    ).distinct()


def shingle_array_expr(n: int = 3) -> Column:
    """Distinct word n-gram shingle array over a `_toks` column, as
    one higher-order expression.

    MUST stay an inline expression wherever it feeds explode():
    exploding a materialized column attribute instead lets Catalyst's
    InferFiltersFromGenerate add `size(col) > 0`, which filter
    pushdown then re-inlines BELOW the projection — re-evaluating the
    whole tokenize+shingle expression several times per row (measured
    12× slowdown at sf0.1). The inference guard skips complex
    generator expressions, so inline form avoids the trap entirely.
    """
    # Guard: sequence(0, k) runs DESCENDING when k < 0, so short docs
    # must short-circuit to an empty array, not sequence(0, -1).
    _check_shingle_n(n)
    return F.when(
        F.size("_toks") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("_toks", i + j + 1) for j in range(n)],
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _toks): non-empty whitespace tokens of lowercased text."""
    toks_col = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    return df.select(F.col(id_col), toks_col.alias("_toks"))


def word_shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc as ONE array column
    (id, shingles array<string>) — no self-joins, no shuffle."""
    return with_tokens(df, id_col, text_col).select(
        F.col(id_col), shingle_array_expr(n).alias("shingles")
    )


def word_shingles_fast(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Same output as word_shingles but via one narrow explode of the
    inline shingle expression (see shingle_array_expr on why inline).
    Preferred at scale; word_shingles kept as the SQL-parity
    construction."""
    return with_tokens(df, id_col, text_col).select(
        F.col(id_col), F.explode(shingle_array_expr(n)).alias("shingle")
    )
