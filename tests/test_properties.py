"""Property-based tests (hypothesis): operator semantics verified
against pure-python references on randomized inputs — the fuzzing
layer on top of the fixed DuckDB-oracle suite."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from llamadb_spark.operators.asof import asof_join
from llamadb_spark.operators.dedup import jaccard_ngram_pairs
from llamadb_spark.sql.dialect import LlamaError, translate_type

_SPARK_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(bits=st.integers(min_value=-10, max_value=200), signed=st.booleans())
@settings(max_examples=100, deadline=None)
def test_translate_type_int_widths(bits, signed):
    name = ("i" if signed else "u") + str(bits)
    valid = 8 <= bits <= 64 and bits % 8 == 0
    if not valid:
        try:
            translate_type(name)
        except LlamaError:
            return
        raise AssertionError(f"{name} should have been rejected")
    dtype, (lo, hi) = translate_type(name)
    # bounds are exactly the reference's N-bit ranges
    assert (hi - lo + 1) == 2**bits
    assert (lo == 0) != signed


@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=0, max_size=12
    ),
)
@_SPARK_SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right):
    # unique (key, ts) per side — matches the real-data contract
    left = list({(k, t): None for k, t in left}.keys())
    right = list({(k, t): None for k, t in right}.keys())
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(right)],
        "k long, ts long, v double",
    )
    got = {
        r.lid: r.v_right
        for r in asof_join(ldf, rdf, key="k", right_value_cols=["v"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, float(j)) for j, (rk, rt) in enumerate(right) if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, t, cands)


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@_SPARK_SETTINGS
def test_jaccard_matches_python_reference(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in jaccard_ngram_pairs(docs, threshold=0.0).collect()
    }

    def shingles(t: str) -> set[str]:
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            inter = len(sa & sb)
            if inter:
                expect[(a, b)] = round(inter / len(sa | sb), 6)
    assert got == expect


@given(
    points=st.lists(st.integers(0, 40), min_size=1, max_size=10),
    intervals=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)), min_size=0, max_size=8
    ),
    width=st.sampled_from([1.0, 3.0, 7.5]),
)
@_SPARK_SETTINGS
def test_range_join_matches_bruteforce(spark, points, intervals, width):
    from llamadb_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "pid long, v double"
    )
    ivs = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(intervals)],
        "iid long, lo double, hi double",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            pts, ivs, point_col="v", lo_col="lo", hi_col="hi", bucket_width=width
        ).collect()
    }
    expect = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, w) in enumerate(intervals)
        if lo <= p <= lo + w
    }
    assert got == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=15
    ).map(lambda es: [(a, b) for a, b in es if a != b])
)
@_SPARK_SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    from llamadb_spark.operators.dedup import connected_components

    if not edges:
        return
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    assert got == expect


_COLTYPES = {
    "U8": st.integers(0, 255),
    "I8": st.integers(-128, 127),
    "U16": st.integers(0, 2**16 - 1),
    "I32": st.integers(-(2**31), 2**31 - 1),
    "I64": st.integers(-(2**63), 2**63 - 1),
    "U64": st.integers(0, 2**64 - 1),
    "STRING": st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz 0123456789", min_size=0, max_size=12
    ),
    "F64": st.integers(-(10**6), 10**6).map(lambda i: i / 4.0),
}

_table_counter = [0]


@given(
    cols=st.lists(
        st.sampled_from(sorted(_COLTYPES)), min_size=1, max_size=4
    ),
    data=st.data(),
)
@_SPARK_SETTINGS
def test_dialect_create_insert_select_roundtrip(spark, cols, data):
    """Fuzz the dialect end-to-end: any CREATE with reference types,
    any in-bounds values must insert and read back exactly (the
    reference's tempdb roundtrip invariant, randomized)."""
    from llamadb_spark.sql import LlamaSession

    db = LlamaSession(spark)
    _table_counter[0] += 1
    name = f"fuzz_{_table_counter[0]}"
    coldefs = ", ".join(f"c{i} {t} NULL" for i, t in enumerate(cols))
    db.execute(f"CREATE TABLE {name} ({coldefs})")

    n_rows = data.draw(st.integers(1, 3))
    rows = [
        tuple(data.draw(_COLTYPES[t]) for t in cols) for _ in range(n_rows)
    ]

    def sql_lit(t, v):
        if t == "STRING":
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    tuples = ", ".join(
        "(" + ", ".join(sql_lit(t, v) for t, v in zip(cols, row)) + ")"
        for row in rows
    )
    db.execute(f"INSERT INTO {name} VALUES {tuples}")
    got = sorted(
        tuple(
            int(v) if cols[i] == "U64" else v for i, v in enumerate(r)
        )
        for r in db.execute(f"SELECT * FROM {name}").collect()
    )
    assert got == sorted(rows)


@given(
    t=st.sampled_from(["U8", "I8", "U16", "I32"]),
    above=st.booleans(),
)
@_SPARK_SETTINGS
def test_dialect_out_of_bounds_always_rejected(spark, t, above):
    from llamadb_spark.sql import LlamaSession

    db = LlamaSession(spark)
    _table_counter[0] += 1
    name = f"fuzzb_{_table_counter[0]}"
    db.execute(f"CREATE TABLE {name} (c0 {t})")
    _, (lo, hi) = translate_type(t)
    bad = hi + 1 if above else lo - 1
    try:
        db.execute(f"INSERT INTO {name} VALUES ({bad})")
    except LlamaError:
        return
    raise AssertionError(f"{t} accepted out-of-range {bad}")


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 1_000)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 8),
)
@_SPARK_SETTINGS
def test_weighted_sample_matches_python_reference(spark, rows, k):
    """The PPS keep-test is pure integer arithmetic — a python
    re-implementation must select the identical set."""
    from llamadb_spark.operators.sampling import KNUTH, PREMOD, weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id for r in weighted_sample(df, k=k, weight_col="w").collect()}
    total = sum(w for _, w in rows)
    expected = {
        d
        for d, w in rows
        if total > 0
        and ((d % PREMOD) * KNUTH) % 1_000_000_000 * total < k * w * 1_000_000_000
    }
    assert got == expected


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=2,
        max_size=8,
    )
)
@_SPARK_SETTINGS
def test_containment_matches_python_reference(spark, texts):
    """Containment pairs against a pure-python shingle-set reference:
    same pairs, same orientation (smaller set inside), same value."""
    from llamadb_spark.operators.dedup import containment_pairs

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shingles(t):
        toks = [w for w in t.strip().lower().split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in docs}
    expected = set()
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            c = round(inter / min(len(sets[a]), len(sets[b])), 6)
            if c >= 0.5:
                small_is_a = (len(sets[a]) < len(sets[b])) or (
                    len(sets[a]) == len(sets[b]) and a < b
                )
                inner, outer = (a, b) if small_is_a else (b, a)
                expected.add((inner, outer, c))
    got = {
        (r.inner_id, r.outer_id, r.containment)
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    assert got == expected


@given(
    n=st.integers(min_value=1, max_value=20),
    start=st.integers(min_value=-5, max_value=5),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_recursive_series_matches_closed_form(spark, n, start):
    """WITH RECURSIVE series generation agrees with the closed form
    for arbitrary spans — the fixpoint loop neither drops nor
    duplicates rounds."""
    from llamadb_spark.sql.dialect import recursive_sql

    rows = recursive_sql(
        spark,
        f"WITH RECURSIVE t(n) AS (SELECT {start} AS n UNION ALL "
        f"SELECT n + 1 FROM t WHERE n < {start + n - 1}) "
        "SELECT count(*) AS c, sum(n) AS s, min(n) AS lo, max(n) AS hi FROM t",
    ).collect()
    r = rows[0]
    assert r.c == n
    assert r.lo == start and r.hi == start + n - 1
    assert r.s == sum(range(start, start + n))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(
                alphabet=st.characters(
                    min_codepoint=1, max_codepoint=0x2FF
                ),
                max_size=6,
            ),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sort_key_encoding_preserves_typed_order(spark, rows):
    """docs/Indexing and Sorting.md parity: the memcmp-sortable
    composite key must order (int64, string, int64) tuples exactly
    like the typed comparison — full int range, prefixes, empty
    strings, multi-byte codepoints. (NUL is excluded from the string
    alphabet — the encoder's documented terminator assumption.)"""
    from llamadb_spark.functions.keycodec import (
        int64_key,
        sort_key,
        string_key,
    )

    df = spark.createDataFrame(rows, "a long, s string, b long")
    got = [
        (r.a, r.s, r.b)
        for r in df.select(
            "a", "s", "b",
            sort_key(
                int64_key("a"), string_key("s"), int64_key("b")
            ).alias("k"),
        )
        .orderBy("k", "a", "s", "b")
        .collect()
    ]
    assert got == sorted(rows)


@given(
    target=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    source=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_upsert_matches_reference_model(spark, target, source):
    """MERGE fuzz: for arbitrary unique-keyed target/source tables,
    UPDATE-matched + INSERT-unmatched must equal the dict-merge
    reference model computed in plain Python."""
    from llamadb_spark.sql import LlamaSession

    db = LlamaSession(spark)
    db.execute("CREATE TABLE fz_t (id I32, v I32)")
    db.execute("CREATE TABLE fz_s (id I32, v I32)")
    for rows, name in ((target, "fz_t"), (source, "fz_s")):
        if rows:
            vals = ", ".join(f"({k}, {v})" for k, v in rows)
            db.execute(f"INSERT INTO {name} VALUES {vals}")
    db.execute(
        "MERGE INTO fz_t USING fz_s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = t.v + s.v "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"
    )
    got = {
        r.id: r.v for r in db.execute("SELECT id, v FROM fz_t").collect()
    }
    model = dict(target)
    for k, v in source:
        model[k] = model[k] + v if k in model else v
    assert got == model


@given(
    texts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=30),
        min_size=2,
        max_size=4,
    )
)
@_SPARK_SETTINGS
def test_substring_spans_match_python_reference(spark, texts):
    """Seed-and-chain span detection vs a brute-force diagonal walk:
    every maximal cross-doc shared character run >= L, with exact
    offsets, over adversarial tiny-alphabet strings (where chance
    runs, multiple diagonals, and run-length-exactly-L edges all
    occur)."""
    from llamadb_spark.operators.spans import substring_span_pairs

    L = 5
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.a_id, r.b_id, r.a_start, r.b_start, r.run_len)
        for r in substring_span_pairs(
            docs, min_len=L, max_gram_occ=10**9
        ).collect()
    }

    expect = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            A, B = texts[a], texts[b]
            for d in range(-(len(B) - 1), len(A)):
                run = 0
                i = max(d, 0)
                j = i - d
                while i < len(A) and j < len(B):
                    if A[i] == B[j]:
                        run += 1
                    else:
                        if run >= L:
                            expect.add((a, b, i - run + 1, j - run + 1, run))
                        run = 0
                    i += 1
                    j += 1
                if run >= L:
                    expect.add((a, b, i - run + 1, j - run + 1, run))
    assert got == expect


@given(
    texts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=30),
        min_size=2,
        max_size=3,
    ),
    stride=st.sampled_from([2, 3]),
)
@_SPARK_SETTINGS
def test_strided_spans_contained_and_recall_bounded(spark, texts, stride):
    """The stride knob's documented bounds: every strided span is
    contained in an exact span on the same diagonal; every exact run
    of length >= L + stride - 1 is detected with under-coverage
    < stride - 1 per end."""
    from llamadb_spark.operators.spans import substring_span_pairs

    L = 5
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    from collections import defaultdict

    exact = defaultdict(list)
    for r in substring_span_pairs(
        docs, min_len=L, max_gram_occ=10**9
    ).collect():
        exact[(r.a_id, r.b_id, r.a_start - r.b_start)].append(
            (r.a_start, r.run_len)
        )
    strided = defaultdict(list)
    for r in substring_span_pairs(
        docs, min_len=L, max_gram_occ=10**9, stride=stride
    ).collect():
        strided[(r.a_id, r.b_id, r.a_start - r.b_start)].append(
            (r.a_start, r.run_len)
        )
    # containment: each strided span sits inside SOME exact span on
    # its (pair, diagonal) — a diagonal can carry several runs
    for key, spans_ in strided.items():
        assert key in exact
        for s, n in spans_:
            assert any(
                es <= s and s + n <= es + en for es, en in exact[key]
            ), (key, s, n, exact[key])
    # recall: every exact run long enough to guarantee an aligned
    # seed is found, with bounded under-coverage on each end
    for key, runs_ in exact.items():
        for es, en in runs_:
            if en >= L + stride - 1:
                hits = [
                    (s, n)
                    for s, n in strided.get(key, [])
                    if es <= s and s + n <= es + en
                ]
                assert hits, (key, es, en)
                s, n = max(hits, key=lambda x: x[1])
                assert s - es < stride  # start under-coverage bound
                assert (es + en) - (s + n) < stride  # end bound


# --- BPE replace-chain equivalence (operators/bpe.py) ---------------

def _chain_encode_py(word: str, merges) -> list[str]:
    """Python mirror of the rank-ordered replace chain: str.replace
    has the same non-overlapping left-to-right resume-after-match
    semantics as Spark's and DuckDB's replace()."""
    s = "".join(f"|{c}~" for c in word)
    for a, b in merges:
        s = s.replace(f"|{a}~|{b}~", f"|{a}{b}~")
    return [t[:-1] for t in s.split("|") if t]


@given(
    word=st.text(
        alphabet="abcdefghilmnoprstuw", min_size=0, max_size=24
    )
)
@settings(max_examples=300, deadline=None)
def test_bpe_replace_chain_matches_priority_queue(word):
    """The load-bearing equivalence (operators/bpe.py fact #1+#2):
    rank-ordered replace sweeps over the |tok~ rendering produce
    EXACTLY the classic min-rank-pair priority-queue encode — on
    random words including adjacent-repeat shapes (llll, thethe)
    where a naive separator encoding diverges."""
    from llamadb_spark.operators.bpe import DEFAULT_MERGES, bpe_encode_py

    assert _chain_encode_py(word, DEFAULT_MERGES) == bpe_encode_py(
        word, DEFAULT_MERGES
    )


def test_bpe_spark_chain_matches_reference(spark):
    """Engine pin: the Spark column form (regexp_replace + replace
    chain) agrees with the priority-queue reference on fixed
    adversarial words — adjacent self-merges, chained merges, words
    with no applicable merges, and the empty-ish edge."""
    import pyspark.sql.functions as F

    from llamadb_spark.operators.bpe import (
        DEFAULT_MERGES,
        bpe_encode_py,
        bpe_encoded,
        bpe_token_count,
    )

    words = [
        "llllll", "thethethe", "forfor", "withwith", "aaaa", "x",
        "the", "thither", "weathers", "zzzz", "q", "others",
        "information", "understanding", "warehouse",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    rows = {
        r.word: (r.enc, r.n)
        for r in df.select(
            "word",
            bpe_encoded(F.col("word"), DEFAULT_MERGES).alias("enc"),
            bpe_token_count(F.col("word"), DEFAULT_MERGES).alias("n"),
        ).collect()
    }
    for w in words:
        toks = bpe_encode_py(w, DEFAULT_MERGES)
        want_enc = "".join(f"|{t}~" for t in toks)
        assert rows[w] == (want_enc, len(toks)), (w, rows[w], toks)


def test_check_merges_rejects_malformed_tables():
    """ADVICE r09: the rank-order ≡ priority-queue equivalence only
    holds for well-formed tables; _check_merges must enforce it, not
    assume it. The duplicate-product example is the documented
    divergence: on 'abcd' the chain gives [abc, d], the priority
    queue [abcd]."""
    import pytest

    from llamadb_spark.operators.bpe import _check_merges, bpe_encode_py

    dup = [("a", "b"), ("b", "c"), ("a", "bc"), ("abc", "d"), ("ab", "c")]
    with pytest.raises(ValueError, match="duplicates an earlier"):
        _check_merges(dup)
    # and the divergence it guards against is real:
    assert bpe_encode_py("abcd", dup) == ["abcd"]

    with pytest.raises(ValueError, match="neither a single character"):
        _check_merges([("a", "b"), ("cd", "e")])  # 'cd' never formed
    _check_merges([("a", "b"), ("ab", "c")])  # well-formed passes


def _synth_8k_merges():
    from tools.bpe_scale_eval import synth_merges

    return synth_merges(8192)


@given(word=st.text(alphabet="abcdefghij", min_size=0, max_size=20))
@settings(max_examples=150, deadline=None)
def test_bpe_chain_matches_arrow_kernel_8k_merges(word):
    """The chain ≡ priority-queue pin at PRODUCTION merge-table size
    (the Arrow path's kernel is bpe_encode_py): pure-Python replace
    chain — same left-to-right resume-after-match semantics as
    Spark's and DuckDB's replace(), no Catalyst depth limit — against
    the queue kernel on an 8192-merge well-formed table."""
    from llamadb_spark.operators.bpe import bpe_encode_py

    merges = _MERGES_8K
    assert _chain_encode_py(word, merges) == bpe_encode_py(word, merges)


_MERGES_8K = _synth_8k_merges()


def test_bpe_arrow_vocab_encode_8k_merges(spark):
    """VERDICT r09 #1 done-criterion: a >=8k-merge encode runs green
    on Spark. The chain form cannot ship at this size (analyzer
    StackOverflowError at >=384 merges, measured in
    tools/bpe_scale_eval.py) so bpe_encode_vocab must route to the
    Arrow mapInPandas path; its output is pinned against the pure-
    Python replace-chain mirror word by word."""
    from tools.bpe_scale_eval import synth_words

    from llamadb_spark.operators.bpe import (
        REPLACE_CHAIN_MAX_MERGES,
        bpe_encode_vocab,
    )

    merges = _MERGES_8K
    assert len(merges) > REPLACE_CHAIN_MAX_MERGES
    words = synth_words(300)
    vocab = spark.createDataFrame([(w,) for w in set(words)], "word string")
    got = {
        r.word: (r.encoded, r.n_tok)
        for r in bpe_encode_vocab(vocab, merges).collect()
    }
    plan = bpe_encode_vocab(vocab, merges)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan
    for w in set(words):
        toks = _chain_encode_py(w, merges)
        want = ("".join(f"|{t}~" for t in toks), len(toks))
        assert got[w] == want, (w, got[w], want)
