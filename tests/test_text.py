"""Text analysis operator tests: edge cases the oracle-parity runs
don't exercise (short docs, punctuation-heavy, non-listed langs)."""

from __future__ import annotations

from llamadb_spark.operators import textops


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_langid_picks_marker_language(spark):
    docs = _docs_df(
        spark,
        [
            (1, "the cat and the dog of it is"),
            (2, "der hund und die katze ist nicht"),
            (3, "le chat est dans les jardins pour"),
            (4, "el perro y los gatos es una"),
            (5, "xyzzy plugh qwerty"),
        ],
    )
    out = {r.doc_id: r.pred_lang for r in textops.language_id(docs).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_quality_score_ranges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = textops.quality_score(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_token_counts_basics(spark):
    docs = _docs_df(spark, [(1, "Hello, world! 42 times"), (2, "one")])
    out = {r.doc_id: r for r in textops.token_counts(docs).collect()}
    assert out[1].ws_tokens == 4
    # bpe-ish: hello , world ! 4 2 times → 7
    assert out[1].bpe_tokens == 7
    assert out[2].ws_tokens == 1


def test_fingerprint_normalization(spark):
    docs = _docs_df(spark, [(1, "A  B\tC"), (2, "a b c"), (3, "a b d")])
    out = {r.doc_id: r for r in textops.fingerprints(docs).collect()}
    assert out[1].fp_md5 == out[2].fp_md5
    assert out[1].fp64 == out[2].fp64
    assert out[1].fp_md5 != out[3].fp_md5


def test_t12_pmi_no_cartesian_and_sane_values(spark, sf_dir):
    from llamadb_spark.operators.textops import pmi_collocations

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = pmi_collocations(docs, min_count=2, k=10)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the 1-row scale anchor must join as a broadcast, never cartesian
    assert "CartesianProduct" not in p
    rows = df.collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r.c_ab >= 2 and r.c_1 >= r.c_ab and r.c_2 >= r.c_ab
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_word_shingle_widths(spark):
    from llamadb_spark.functions.text import (
        word_shingle_arrays,
        word_shingles,
        word_shingles_fast,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "solo")], ["doc_id", "text"]
    )

    def got(df):
        return {(r[0], r[1]) for r in df.collect()}

    for n, expected_doc1 in [
        (2, {"a b", "b c", "c d", "d e"}),
        (3, {"a b c", "b c d", "c d e"}),
        (5, {"a b c d e"}),
    ]:
        fast = got(word_shingles_fast(docs, "doc_id", "text", n=n))
        joins = got(word_shingles(docs, "doc_id", "text", n=n))
        assert fast == joins
        assert {s for d, s in fast if d == 1} == expected_doc1
    # n=2: doc 2 contributes its single bigram, doc 3 nothing
    n2 = got(word_shingles_fast(docs, "doc_id", "text", n=2))
    assert (2, "x y") in n2 and not any(d == 3 for d, _ in n2)
    # arrays agree with the exploded form
    arr = word_shingle_arrays(docs, "doc_id", "text", n=2).collect()
    flat = {(r["doc_id"], s) for r in arr for s in r["shingles"]}
    assert flat == n2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        word_shingles_fast(docs, "doc_id", "text", n=0)


def test_compression_ratio_orders_repetition(spark):
    """The zlib-ratio quality signal: repetitive text must compress
    harder (lower ratio) than diverse text, and ratios stay in sane
    bounds for non-trivial inputs."""
    from pyspark.sql import Row

    from llamadb_spark.operators.textops import compression_ratio

    docs = spark.createDataFrame([
        Row(doc_id=1, text="spam " * 400),                    # pure repetition
        Row(doc_id=2, text=" ".join(f"w{i}x{i*7%13}" for i in range(400))),
        Row(doc_id=3, text=""),                               # dropped
    ])
    rows = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].zlib_ratio < rows[2].zlib_ratio
    for r in rows.values():
        assert 0.0 < r.zlib_ratio <= 1.1
        assert r.n_zlib_bytes > 0 and r.n_raw_bytes > 0


def test_bm25_saturation_and_length_normalization(spark):
    """BM25 vs raw TF-IDF behavior: (1) TF saturates — doubling an
    already-high term count moves the score sublinearly (k1 cap);
    (2) longer documents are penalized at equal tf (b-normalization);
    (3) ranking is deterministic with id tiebreaks."""
    docs = spark.createDataFrame(
        [
            (1, "data " * 2 + "filler alpha beta"),
            (2, "data " * 8 + "filler alpha beta"),
            (3, "data " * 2 + "filler " * 30),
            (4, "unrelated words only here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.bm25
        for r in textops.bm25_topk(docs, ["data"], k=10).collect()
    }
    assert 4 not in out  # no query term, no row
    # saturation: 4x the tf gives < 4x the score
    assert out[2] > out[1]
    assert out[2] < 4 * out[1]
    # length normalization: same tf, much longer doc scores lower
    assert out[3] < out[1]


def test_hybrid_rrf_fuses_both_rankings(spark, sf_dir):
    """s15: every fused row carries a valid rank from at least one
    list, the RRF score matches its rank components exactly, and the
    result is the top-k of the union by (rounded score, id)."""
    from llamadb_spark.queries.pipeline import (
        HYBRID_POOL,
        HYBRID_TOPK,
        RRF_K,
        s15_hybrid_rrf,
    )

    rows = s15_hybrid_rrf(spark, sf_dir).collect()
    assert len(rows) == HYBRID_TOPK
    for r in rows:
        assert r.lex_rank > 0 or r.vec_rank > 0
        assert 0 <= r.lex_rank <= HYBRID_POOL
        assert 0 <= r.vec_rank <= HYBRID_POOL
        want = 0.0
        if r.lex_rank:
            want += 1.0 / (RRF_K + r.lex_rank)
        if r.vec_rank:
            want += 1.0 / (RRF_K + r.vec_rank)
        assert abs(r.rrf - round(want, 6)) < 1e-9
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_linear_quality_score_exact_integer_logits(spark):
    """Hand-computed BIGINT dot products: weights are integer
    micro-units, OOV tokens take the OOV weight, bias shifts the
    threshold, and is_quality is the integer sign test."""
    from llamadb_spark.operators.textops import linear_quality_score

    docs = spark.createDataFrame(
        [
            (1, "good good bad"),
            (2, "bad bad unknowntok"),
            (3, "good"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_tokens, r.logit_micro, r.is_quality)
        for r in linear_quality_score(
            docs,
            weights_micro={"good": 500_000, "bad": -300_000},
            bias_micro=-400_000,
            oov_micro=-50_000,
        ).collect()
    }
    assert out == {
        1: (3, 500_000 * 2 - 300_000 - 400_000, True),     # 300_000
        2: (3, -300_000 * 2 - 50_000 - 400_000, False),    # -1_050_000
        3: (1, 500_000 - 400_000, True),                   # 100_000
    }


def test_linear_quality_broadcast_path_equals_literal_map(spark):
    """>1024-term vocabularies switch to the broadcast-joined weights
    dimension; padding the dict with never-occurring tokens must not
    change any output row vs the literal-map path."""
    from llamadb_spark.operators.textops import linear_quality_score

    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad unknowntok"), (3, "good")],
        ["doc_id", "text"],
    )
    small = {"good": 500_000, "bad": -300_000}
    big = dict(small)
    big.update({f"zpad{i}": i for i in range(1030)})  # force broadcast path
    kw = dict(bias_micro=-400_000, oov_micro=-50_000)
    lit_rows = {
        r.doc_id: (r.n_tokens, r.logit_micro, r.is_quality)
        for r in linear_quality_score(docs, small, **kw).collect()
    }
    bc_rows = {
        r.doc_id: (r.n_tokens, r.logit_micro, r.is_quality)
        for r in linear_quality_score(docs, big, **kw).collect()
    }
    assert lit_rows == bc_rows
    # and the broadcast plan really broadcasts the dim side
    plan = linear_quality_score(docs, big, **kw)._jdf.queryExecution()
    assert "Broadcast" in plan.executedPlan().toString()


def test_gopher_repetition_hand_checked(spark):
    """t29 ppm math against a hand-computed doc: 'a b a b a b c'
    (13 chars). Top 2-gram 'a b' occurs 3x (3 chars) -> 3*3 ppm of
    13; dup-5gram 'a b a b a' x1... (no 5-gram repeats) -> 0."""
    import pyspark.sql.functions as F

    from llamadb_spark.queries import pipeline_text as P

    # doc 2: 60 distinct tokens — every n-gram unique, so the top
    # shares are one occurrence's chars over the doc (the gates
    # assume long docs; a tiny all-distinct doc would still "fail"
    # them by construction)
    long_distinct = " ".join(f"tok{i:02d}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, "a b a b a b c"), (2, long_distinct)],
        "doc_id long, text string",
    )
    # reuse the operator body via a monkeypatched _docs
    orig = P._docs
    try:
        P._docs = lambda spark, sf_dir: docs.withColumn(
            "source", F.lit("s")
        )
        rows = {r.doc_id: r for r in
                P.t29_gopher_repetition(spark, "ignored").collect()}
    finally:
        P._docs = orig
    r1 = rows[1]
    assert r1.top2_ppm == (3 * 3 * 1_000_000) // 13  # 'a b' 3x
    assert r1.top3_ppm == (2 * 5 * 1_000_000) // 13  # 'a b a' 2x
    assert r1.top4_ppm == (2 * 7 * 1_000_000) // 13  # 'a b a b' 2x
    # the three 5-grams ('a b a b a', 'b a b a b', 'a b a b c') are
    # all distinct -> no duplicate-5-gram mass
    assert r1.dup5_ppm == 0
    assert not r1.passes_gopher  # top2 share 69% >> 20%
    r2 = rows[2]
    assert r2.dup5_ppm == 0 and r2.passes_gopher


def test_gopher_repetition_short_docs_no_crash(spark):
    """ADVICE r08 (high): docs with fewer than n tokens used to build
    sequence(1, 0) = DESCENDING [1, 0] and slice(tk, 0, n) threw
    INVALID_PARAMETER_VALUE.START, killing the whole query. A 1-token
    doc (under every n in 2..5) and a 3-token doc (under n=4,5 only)
    must instead contribute empty gram arrays — zero ppm across the
    board for the 1-token doc, and agree with DuckDB's empty
    generate_series(1, 0) semantics."""
    import pyspark.sql.functions as F

    from llamadb_spark.queries import pipeline_text as P

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "three tokens here"), (3, "x y x y x y")],
        "doc_id long, text string",
    )
    orig = P._docs
    try:
        P._docs = lambda spark, sf_dir: docs.withColumn(
            "source", F.lit("s")
        )
        rows = {r.doc_id: r for r in
                P.t29_gopher_repetition(spark, "ignored").collect()}
    finally:
        P._docs = orig
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert (r1.top2_ppm, r1.top3_ppm, r1.top4_ppm, r1.dup5_ppm) == (
        0, 0, 0, 0,
    )
    assert r1.passes_gopher
    r2 = rows[2]  # 3 tokens: 2- and 3-grams exist, 4/5-grams don't
    assert r2.top2_ppm > 0 and r2.top3_ppm > 0
    assert r2.top4_ppm == 0 and r2.dup5_ppm == 0
    r3 = rows[3]  # 6 tokens, 'x y' 3x of 11 chars
    assert r3.top2_ppm == (3 * 3 * 1_000_000) // 11
