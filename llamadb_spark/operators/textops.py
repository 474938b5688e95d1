"""Text analysis operators (SURVEY §2 #36-39): language ID, quality
scoring, token counting, fingerprinting. All built-in functions —
these run per-row inside whole-stage codegen with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from llamadb_spark.functions.text import (
    BPE_PATTERN,
    STOPWORDS,
    distinct_tokens,
    stopword_hits,
    tokens,
)


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count distinct stopword types per
    language, argmax with fixed priority en>de>fr>es, 'und'
    (undetermined) when no list hits.

    Output: (id, hits_en, hits_de, hits_fr, hits_es, pred_lang).
    """
    toks = distinct_tokens(col(text_col))
    d = docs.select(
        col(id_col),
        *[
            stopword_hits(toks, lang).cast("long").alias(f"hits_{lang}")
            for lang in STOPWORDS
        ],
    )
    best = F.greatest(*[col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.when(best == 0, "und")
    for lang in STOPWORDS:  # insertion order = priority order
        pred = pred.when(col(f"hits_{lang}") == best, lang)
    return d.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score from length / punctuation / stopword /
    type-token signals:

      lexical_diversity = distinct tokens / tokens
      length_factor     = min(1, tokens/100)
      punct_ratio       = non-alnum-non-space chars / chars
      stop_ratio        = english stopword hits / distinct tokens
      quality = round(diversity * length_factor * (1-punct_ratio)
                      * (0.5 + 0.5*min(1, 4*stop_ratio)), 6)

    Output: (id, n_tokens, n_distinct, punct_ratio, stop_ratio, quality).
    """
    toks = tokens(col(text_col))
    dtoks = distinct_tokens(col(text_col))
    n_tok = F.size(toks).cast("double")
    n_dis = F.size(dtoks).cast("double")
    n_chars = F.length(col(text_col)).cast("double")
    n_punct = F.length(
        F.regexp_replace(F.lower(col(text_col)), r"[a-z0-9\s]", "")
    ).cast("double")
    hits = stopword_hits(dtoks, "en").cast("double")
    punct_ratio = F.round(n_punct / n_chars, 6)
    stop_ratio = F.round(hits / n_dis, 6)
    quality = F.round(
        (n_dis / n_tok)
        * F.least(lit(1.0), n_tok / 100.0)
        * (1 - n_punct / n_chars)
        * (0.5 + 0.5 * F.least(lit(1.0), 4 * hits / n_dis)),
        6,
    )
    return docs.select(
        col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(dtoks).cast("long").alias("n_distinct"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts + chars (the billing
    triple of a training-data pipeline).

    Output: (id, n_chars, ws_tokens, bpe_tokens).
    """
    return docs.select(
        col(id_col),
        F.length(col(text_col)).cast("long").alias("n_chars"),
        F.size(tokens(col(text_col))).cast("long").alias("ws_tokens"),
        F.regexp_count(F.lower(col(text_col)), lit(BPE_PATTERN))
        .cast("long")
        .alias("bpe_tokens"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase
    text (the exact-dedup key), plus a 64-bit rolling-style prefix
    (first 16 hex chars as bigint) for compact storage/joins.

    Output: (id, fp_md5, fp64).
    """
    norm = F.regexp_replace(F.trim(F.lower(col(text_col))), r"\s+", " ")
    fp = F.md5(norm)
    return docs.select(
        col(id_col),
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp64"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 100, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary by document frequency: for each token, how
    many documents contain it (distinct per doc), top-k with a
    deterministic (df desc, token asc) tiebreak.

    Scale: explode of distinct per-doc tokens → groupBy(token) with
    map-side partial count; top-k is TakeOrderedAndProject (no global
    sort materialization).
    """
    toks = docs.select(F.explode(distinct_tokens(col(text_col))).alias("token"))
    return (
        toks.filter(col("token") != "")
        .groupBy("token")
        .agg(F.count(lit(1)).alias("df"))
        .orderBy(col("df").desc(), col("token"))
        .limit(k)
    )


def repetition_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repeated word-3-gram fraction per document — the standard
    boilerplate/spam signal (1 - distinct/total shingles). Computed
    from TWO array expressions in one narrow projection: no explode,
    no shuffle at all.

    Output: (id, n_shingles, n_distinct, rep_ratio) — docs with < 3
    tokens score 0.
    """
    from llamadb_spark.functions.text import shingle_array_expr, with_tokens

    total_expr = F.greatest(F.size("_toks") - 2, lit(0))
    base = with_tokens(docs, id_col, text_col).select(
        col(id_col),
        total_expr.alias("n_shingles"),
        F.size(shingle_array_expr()).alias("n_distinct"),
    )
    return base.select(
        col(id_col),
        col("n_shingles").cast("long").alias("n_shingles"),
        col("n_distinct").cast("long").alias("n_distinct"),
        F.when(col("n_shingles") > 0,
               F.round(1.0 - col("n_distinct") / col("n_shingles"), 6))
        .otherwise(lit(0.0))
        .alias("rep_ratio"),
    )
