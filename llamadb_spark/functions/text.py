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


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    posexplode + positional self-joins — identical semantics to the
    unnest/generate_subscripts SQL the oracles use. Scale: one
    narrow explode, no UDF; downstream consumers join on `shingle`
    (the inverted-index pattern), never on doc pairs.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.posexplode(tokens(F.col(text_col))).alias("pos", "w")
    )
    t1, t2, t3 = toks.alias("t1"), toks.alias("t2"), toks.alias("t3")
    shingled = (
        t1.join(
            t2,
            (F.col("t1._id") == F.col("t2._id")) & (F.col("t2.pos") == F.col("t1.pos") + 1),
        )
        .join(
            t3,
            (F.col("t1._id") == F.col("t3._id")) & (F.col("t3.pos") == F.col("t1.pos") + 2),
        )
        .select(
            F.col("t1._id").alias(id_col),
            F.concat_ws(" ", "t1.w", "t2.w", "t3.w").alias("shingle"),
        )
    )
    if n != 3:
        raise NotImplementedError("word_shingles currently fixed at n=3")
    return shingled.distinct()


def shingle_array_expr() -> Column:
    """Distinct word 3-gram shingle array over a `_toks` column, as
    one higher-order expression.

    MUST stay an inline expression wherever it feeds explode():
    exploding a materialized column attribute instead lets Catalyst's
    InferFiltersFromGenerate add `size(col) > 0`, which filter
    pushdown then re-inlines BELOW the projection — re-evaluating the
    whole tokenize+shingle expression several times per row (measured
    12× slowdown at sf0.1). The inference guard skips complex
    generator expressions, so inline form avoids the trap entirely.
    """
    # Guard: sequence(0, n) runs DESCENDING when n < 0, so short docs
    # must short-circuit to an empty array, not sequence(0, -1).
    return F.when(
        F.size("_toks") >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("_toks", i + 1),
                    F.element_at("_toks", i + 2),
                    F.element_at("_toks", i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _toks): non-empty whitespace tokens of lowercased text."""
    toks_col = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    return df.select(F.col(id_col), toks_col.alias("_toks"))


def word_shingle_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct word 3-gram shingles per doc as ONE array column
    (id, shingles array<string>) — no self-joins, no shuffle."""
    return with_tokens(df, id_col, text_col).select(
        F.col(id_col), shingle_array_expr().alias("shingles")
    )


def word_shingles_fast(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Same output as word_shingles but via one narrow explode of the
    inline shingle expression (see shingle_array_expr on why inline).
    Preferred at scale; word_shingles kept as the SQL-parity
    construction."""
    return with_tokens(df, id_col, text_col).select(
        F.col(id_col), F.explode(shingle_array_expr()).alias("shingle")
    )
