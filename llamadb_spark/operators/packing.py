"""Sequence packing: bin documents into fixed token budgets.

Training pipelines pack variable-length documents into fixed-size
context windows to avoid padding waste. Optimal bin packing is
NP-hard; first-fit-decreasing (FFD) is the standard ≤ (11/9)·OPT+1
greedy. FFD is inherently sequential, so the distributed form shards
the corpus by a deterministic key hash, runs FFD independently per
shard (Arrow-batched `applyInPandas` — the documented pattern for
per-group imperative logic), and namespaces bin ids by shard. Packing
quality is unaffected at scale: each shard still packs thousands of
docs, so the FFD bound holds per shard.

Determinism: shard = key % n_shards (pure function of the data), and
docs are sorted (tokens desc, key asc) inside each shard — identical
output for any partitioning or cluster size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from llamadb_spark.functions.text import tokens

#: Bins per shard namespace — far above any realistic per-shard bin
#: count (shard of ~1M docs / ~2 docs per bin ≪ 10^9).
_SHARD_SPAN = 1_000_000_000


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Pack documents into bins of ≤ `budget` tokens with
    first-fit-decreasing per deterministic shard. Oversized docs
    (> budget tokens) get a singleton bin rather than being dropped —
    the caller decides whether to truncate.

    The budget CURRENCY defaults to whitespace tokens computed here;
    pass ``sizes`` — a (id_col, n_tokens) frame, e.g. exact BPE
    counts from operators/bpe.bpe_token_counts — to pack in the
    currency a training run actually spends (VERDICT r09 #6). The
    FFD machinery is currency-agnostic; the join replaces the inline
    count and everything downstream is unchanged.

    Output: (id, n_tokens, bin_id, bin_fill) — bin_fill is the bin's
    total tokens, repeated on each member row.
    """
    if sizes is not None:
        sized = docs.select(col(id_col).alias("doc_id")).join(
            sizes.select(
                col(id_col).alias("doc_id"),
                col("n_tokens").cast("long").alias("n_tokens"),
            ),
            "doc_id",
        ).select(
            "doc_id", "n_tokens", (col("doc_id") % n_shards).alias("shard")
        )
    else:
        sized = docs.select(
            col(id_col).alias("doc_id"),
            F.size(tokens(col(text_col))).cast("long").alias("n_tokens"),
            (col(id_col) % n_shards).alias("shard"),
        )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        remaining: list[int] = []  # capacity left per local bin
        fills: list[int] = []
        assigned: list[int] = []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            placed = -1
            if tok <= budget:
                for i, cap in enumerate(remaining):
                    if cap >= tok:
                        placed = i
                        break
            if placed < 0:
                placed = len(remaining)
                remaining.append(max(budget - tok, 0))
                fills.append(tok)
            else:
                remaining[placed] -= tok
                fills[placed] += tok
            assigned.append(placed)
        base = shard * _SHARD_SPAN
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "bin_id": [base + a for a in assigned],
                "bin_fill": [fills[a] for a in assigned],
            }
        )

    return sized.groupBy("shard").applyInPandas(
        _pack, "doc_id long, n_tokens long, bin_id long, bin_fill long"
    )
