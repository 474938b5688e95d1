"""BPE tokenization — exact byte-pair-encoding token counts, the
currency a training run actually spends (VERDICT r08 #2: every token
count in the budget/packing path was whitespace/regex-based, and the
two diverge 30-50% on web text).

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public; the encode loop is the same one
GPT-2's public ``bpe()`` uses): start from characters, repeatedly
merge the adjacent token pair with the lowest merge rank until no
rankable pair remains. Two public facts make a fully-declarative
Spark formulation possible:

1. **Rank-order equivalence.** Applying merges in ascending rank
   order (one canonical sweep per rank) equals the priority-queue
   form: merging rank r creates a token that exists only after
   training step r, so every pair involving it has rank > r — a
   later merge can never create an earlier pair, and one sweep per
   rank is complete. (Pinned against a classic priority-queue
   reference implementation by a hypothesis property test.)
2. **A canonical sweep is a string replace.** Render the token
   sequence as ``|tok~`` units (``|`` starts a token, ``~`` ends it;
   both outside the word alphabet): merging (A, B) -> AB is
   ``replace(s, '|A~|B~', '|AB~')``. The leading ``|`` anchors a
   token start, the ``~`` terminators make token matches
   prefix-unambiguous, and because the pattern consumes neither the
   previous token's terminator nor the next token's opener, adjacent
   occurrences never overlap — replace()'s left-to-right
   resume-after-match scan IS the canonical stride-2 BPE sweep
   (``aaaa`` with merge (a,a) -> ``|aa~|aa~``, exactly [aa, aa]).

So the encoder is a chain of built-in ``replace`` calls — whole-stage
codegen, zero Python — and the token count is just the number of
``|`` openers left. The same chain renders as DuckDB SQL, giving the
oracle an exact independent twin (no banded attestation needed).

Scale: encoding runs once per DISTINCT word (the vocabulary — Heaps'
law sublinear in corpus size), never per occurrence; per-doc counts
come from an ordinary count/sum join-back keyed by word (AQE-managed,
skew-splittable) and a map-side-combinable per-doc aggregate. At
100 TB the vocab table is millions of rows while the corpus is
trillions of tokens — the encode cost rounds to zero.

Reference parity note: the reference engine (/root/reference) has no
tokenizer; this operator exists for the training-data-pipeline
surface the brief adds (token budgeting p15/p19, packing p03).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

#: Deterministic demonstration merge table (rank = list position,
#: ascending). Well-formed: each side is a single character or the
#: product of an earlier merge. Swap in a real tokenizer's merge list
#: (e.g. a BPE trained on the target corpus) for production counts —
#: the encoder is merge-table-agnostic.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("t", "o"), ("i", "t"), ("i", "s"), ("e", "s"), ("in", "g"),
    ("an", "d"), ("a", "r"), ("o", "u"), ("s", "t"), ("l", "e"),
    ("a", "l"), ("e", "d"), ("c", "o"), ("d", "e"), ("s", "e"),
    ("m", "e"), ("h", "a"), ("the", "r"), ("u", "r"), ("l", "i"),
    ("l", "l"), ("c", "h"), ("h", "i"), ("w", "h"), ("l", "o"),
    ("u", "s"), ("f", "o"), ("fo", "r"), ("w", "i"), ("wi", "th"),
    ("b", "e"), ("w", "e"), ("w", "a"), ("o", "f"), ("m", "a"),
    ("p", "r"), ("p", "o"), ("er", "s"),
)

#: Words are lowercase letter runs; the markers are outside [a-z].
_OPEN, _TERM = "|", "~"
WORD_SPLIT = "[^a-z]+"


def _check_merges(merges) -> None:
    for a, b in merges:
        for part in (a, b):
            if not part or any(c in (_OPEN, _TERM) for c in part):
                raise ValueError(f"merge part {part!r} contains a marker")


def bpe_encoded(word: Column, merges=DEFAULT_MERGES) -> Column:
    """Encode a lowercase letter-word column to its ``|tok~`` BPE
    rendering via the rank-ordered replace chain (all JVM string
    functions)."""
    _check_merges(merges)
    c = F.regexp_replace(word, "(.)", f"{_OPEN}$1{_TERM}")
    for a, b in merges:
        c = F.replace(
            c,
            F.lit(f"{_OPEN}{a}{_TERM}{_OPEN}{b}{_TERM}"),
            F.lit(f"{_OPEN}{a}{b}{_TERM}"),
        )
    return c


def bpe_token_count(word: Column, merges=DEFAULT_MERGES) -> Column:
    """Exact BPE token count of a word = surviving ``|`` openers."""
    enc = bpe_encoded(word, merges)
    return (
        F.length(enc) - F.length(F.replace(enc, F.lit(_OPEN), F.lit("")))
    ).cast("long")


def bpe_token_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges=DEFAULT_MERGES,
) -> DataFrame:
    """Per-document exact BPE token counts.

    Output: (id_col, n_words, bpe_tokens, ws_tokens) — letter-word
    occurrences, their summed BPE tokens, and the t03-comparable
    whitespace count (the two counts are the 'budget currency'
    divergence p15/p19 care about). Docs with no letter words get
    zeros.

    Plan shape: explode words -> count per (doc, word) [one shuffle,
    map-side combine] -> join the DISTINCT-word encode table [vocab-
    bounded build, AQE-skew-splittable join] -> per-doc sum [map-side
    combine]. The replace-chain encode runs |vocab| times total.
    """
    words = (
        docs.select(
            col(id_col),
            F.explode(F.split(F.lower(col(text_col)), WORD_SPLIT)).alias(
                "word"
            ),
        )
        .filter(col("word") != "")
    )
    per_word = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    vocab = per_word.select("word").distinct().select(
        "word", bpe_token_count(col("word"), merges).alias("n_tok")
    )
    per_doc = (
        per_word.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(col("n_occ") * col("n_tok")).alias("bpe_tokens"),
        )
    )
    ws = docs.select(
        col(id_col),
        F.size(F.split(F.trim(F.lower(col(text_col))), r"\s+"))
        .cast("long")
        .alias("ws_tokens"),
    )
    return ws.join(per_doc, id_col, "left").select(
        col(id_col),
        F.coalesce(col("n_words"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(col("bpe_tokens"), F.lit(0))
        .cast("long")
        .alias("bpe_tokens"),
        col("ws_tokens"),
    )


def bpe_encode_sql(word_expr: str, merges=DEFAULT_MERGES) -> str:
    """The identical rank-ordered replace chain as DuckDB SQL text —
    the oracle's independent twin of :func:`bpe_encoded`."""
    _check_merges(merges)
    e = f"regexp_replace({word_expr}, '(.)', '{_OPEN}\\1{_TERM}', 'g')"
    for a, b in merges:
        e = (
            f"replace({e}, '{_OPEN}{a}{_TERM}{_OPEN}{b}{_TERM}',"
            f" '{_OPEN}{a}{b}{_TERM}')"
        )
    return e


def bpe_encode_py(word: str, merges=DEFAULT_MERGES) -> list[str]:
    """Classic priority-queue BPE encode (the GPT-2 ``bpe()`` loop) —
    the independent reference the replace-chain form is tested
    against; NOT used by any query plan."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        a, b = best
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks
