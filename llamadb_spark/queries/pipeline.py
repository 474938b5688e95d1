"""Training-data pipeline queries (SURVEY §2 d/s/t/m/p rows): dedup,
similarity search, text analysis, multimodal metadata — each wired
to the operator implementations with a DuckDB oracle where the
semantics are SQL-expressible (minhash/simhash/hyperplane-LSH use
xxhash64, which DuckDB lacks → rows-only checks by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llamadb_spark.operators import dedup, multimodal, similarity, textops
from llamadb_spark.functions import text as text_fns
from llamadb_spark.functions.text import STOPWORDS


def _rebalance(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread an under-partitioned scan across the cluster before the
    CPU-heavy per-row work every pipeline operator does on these
    tables (shingling, hashing, vector math).

    A parquet scan parallelizes at ROW-GROUP granularity; a
    single-row-group file (how the sf* documents/embeddings tables
    are written) is one task no matter how many cores exist, and
    everything up to the first shuffle then serializes on it —
    measured 18 s single-task vs ~1 s spread for the sf0.1 shingle
    index. The one round-robin exchange of the raw rows is orders of
    magnitude cheaper than serializing the transform; when the scan
    already has enough splits (the 100 TB case) this is a no-op.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rebalance(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rebalance(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


# --- dedup ---------------------------------------------------------------

def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir))


ORACLE_D01 = r"""
SELECT sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS text_sha,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""

JACCARD_THRESHOLD = 0.12


#: Stop-shingle cap for the oracled jaccard family (d02 and the
#: cluster/split queries built on it). Passed EXPLICITLY so the
#: oracle SQL below can mirror it — the operator drops shingles with
#: df > cap from the index before the self-join (set sizes stay
#: full), and the oracle does the same, so operator and oracle stay
#: hash-equal even on a corpus where the cap actually fires.
STOP_SHINGLE_DF = 10_000


def d02_jaccard_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    )


ORACLE_D02 = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
),
pos AS (
  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN pos c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
kept AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
                    HAVING count(*) <= {STOP_SHINGLE_DF})
),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, n_inter,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
      >= {JACCARD_THRESHOLD}
"""


def d06_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters: connected components over the
    jaccard pair graph, every doc labeled with its component's min
    doc_id. Oracle: same pair SQL + a recursive-CTE reachability
    closure in DuckDB."""
    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    return dedup.connected_components(pairs)


ORACLE_D06 = rf"""
WITH RECURSIVE pairs AS (
  {ORACLE_D02}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS node, least(u, min(v)) AS cluster_id
FROM reach GROUP BY u
"""


def d07_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: pairs → clusters → filtered corpus. The
    operation a production pipeline actually runs — keep each
    cluster's min-doc_id representative, drop the rest, and report
    the surviving corpus per source.

    Scale: the drop-list (non-canonical cluster members) is
    proportional to duplicates found — usually small, but web-scale
    corpora can dedup away 30-80% of documents, so its size is
    data-dependent, NOT bounded. No broadcast hint: AQE broadcasts
    the anti-join side at runtime when it is genuinely small and
    falls back to a shuffle join when it is not (a forced hint here
    OOMs executors on a duplicate-heavy corpus). The per-source
    aggregate does map-side partial agg on top.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir)
    pairs = dedup.jaccard_ngram_pairs(
        docs, threshold=JACCARD_THRESHOLD, stop_shingle_df=STOP_SHINGLE_DF
    ).select("a_id", "b_id")
    cc = dedup.connected_components(pairs)
    losers = cc.filter(col("node") != col("cluster_id")).select(
        col("node").alias("doc_id")
    )
    survivors = docs.join(losers, "doc_id", "left_anti")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


ORACLE_D07 = f"""
WITH cc AS ({ORACLE_D06})
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
GROUP BY source
"""


def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection with a driver-attestable banded
    contract: the output is the EXACT d02 pair set (ids + exact
    Jaccard, DuckDB-recomputable) with a ``found_by_lsh`` boolean per
    pair — LSH recall over ground-truth near-dups becomes the
    hash-matched value. The oracle recomputes the exact pairs and
    claims TRUE; an LSH miss flips the boolean and fails the hash.
    The corpus's genuine near-dups all sit at J ≥ 0.9 where the
    8-band/r=4 miss probability is ≤ (1-0.9^4)^8 ≈ 2e-4 per pair,
    and signatures are deterministic (JVM xxhash64), so the booleans
    are stable at a given SF. (The raw candidate list itself stays
    available via operators/dedup.minhash_lsh_pairs.)"""
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir)
    # ONE staged shingle index feeds both the exact twin and the
    # MinHash path (the production shape: stage the inverted index,
    # run every sketch off it) — one barrier, one shingle pass
    idx = dedup.hashed_shingle_index(docs)
    exact = dedup.jaccard_ngram_pairs(
        docs,
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
        index=idx,
    ).select("a_id", "b_id", "jaccard")
    lsh = (
        dedup.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD, index=idx)
        .select("a_id", "b_id")
        .withColumn("_f", F.lit(True))
    )
    return exact.join(lsh, ["a_id", "b_id"], "left").select(
        "a_id",
        "b_id",
        col("jaccard").alias("exact_j"),
        F.coalesce("_f", F.lit(False)).alias("found_by_lsh"),
    )


ORACLE_D03 = rf"""
WITH pairs AS ({ORACLE_D02})
SELECT a_id, b_id, jaccard AS exact_j, TRUE AS found_by_lsh
FROM pairs
"""


#: Hamming band d04 attests on genuine near-dup pairs: measured max
#: is 12 bits at sf0.001-0.01 over 64-bit fingerprints (J >= 0.9
#: pairs); 16 leaves 4 bits of margin. Fingerprints are xxhash64-
#: deterministic, so the band is stable at a given SF.
D04_HAMMING_BAND = 16


def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprinting with a driver-attestable banded
    contract: for every EXACT near-dup pair (d02's machinery —
    DuckDB-recomputable), the 64-bit SimHash fingerprints of the two
    docs must agree to within D04_HAMMING_BAND bits — the property
    that makes SimHash a usable near-dup blocking key. Output: the
    exact pair set + ``hamming_le_band`` boolean; the oracle
    recomputes the exact side and claims TRUE. (Per-doc fingerprints
    stay available via operators/dedup.simhash_fingerprints.)"""
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir)
    pairs = dedup.jaccard_ngram_pairs(
        docs, threshold=JACCARD_THRESHOLD, stop_shingle_df=STOP_SHINGLE_DF
    ).select("a_id", "b_id", "jaccard")
    # referenced by both join sides — stage the n_docs fingerprint
    # rows once instead of recomputing the bit-vote aggregation twice
    fp = (
        dedup.simhash_fingerprints(docs)
        .select("doc_id", "simhash")
        .localCheckpoint()
    )
    ham = F.bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
    return (
        pairs.join(
            fp.select(col("doc_id").alias("a_id"), col("simhash").alias("fp_a")),
            "a_id",
        )
        .join(
            fp.select(col("doc_id").alias("b_id"), col("simhash").alias("fp_b")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            col("jaccard").alias("exact_j"),
            (ham <= D04_HAMMING_BAND).alias("hamming_le_band"),
        )
    )


ORACLE_D04 = rf"""
WITH pairs AS ({ORACLE_D02})
SELECT a_id, b_id, jaccard AS exact_j, TRUE AS hamming_le_band
FROM pairs
"""


EMBED_NEARDUP_THRESHOLD = 0.4


def d05_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embed_neardup_pairs(
        _emb(spark, sf_dir), threshold=EMBED_NEARDUP_THRESHOLD
    )


ORACLE_D05 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.v, b.v), 6) >= {EMBED_NEARDUP_THRESHOLD}
"""


def d08_semantic_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SEMANTIC dedup via the EXACT escape hatch: this key
    deliberately calls semantic_dedup_pairs(exact=True) — the blocked
    all-pairs small-corpus VERIFICATION path — because its oracle is
    the exact recursive-CTE closure and the key's role is to prove
    the dedup-apply contract against exhaustive ground truth. The
    library DEFAULT (operators/similarity.semantic_dedup_pairs with
    exact=False) is the LSH-bucketed generator; its end-to-end key is
    d12_semantic_dedup_lsh, the documented 100 TB path with the same
    output contract. Do not run the exact form on a corpus that
    doesn't comfortably fit a single machine's O(N²) compute budget.

    Pipeline shape: pairs → connected components → keep each
    cluster's min-vec_id representative → surviving corpus per label
    (the embedding-space twin of d07's lexical dedup-apply).

    Scale: identical join discipline to d07 — the drop list's size
    is duplicate-DEPENDENT (can approach corpus scale on a
    duplicate-heavy corpus), so no broadcast hint: AQE picks
    broadcast vs shuffle for the LEFT ANTI join at runtime from the
    drop list's actual size.
    """
    from pyspark.sql.functions import col

    emb = _emb(spark, sf_dir)
    pairs = similarity.semantic_dedup_pairs(
        emb, threshold=EMBED_NEARDUP_THRESHOLD, exact=True
    ).select("a_id", "b_id")
    cc = dedup.connected_components_star(pairs)
    losers = cc.filter(col("node") != col("cluster_id")).select(
        col("node").alias("vec_id")
    )
    survivors = emb.join(losers, "vec_id", "left_anti")
    return survivors.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.avg(F.sqrt(F.aggregate(
                col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            ))),
            6,
        ).alias("avg_norm"),
    )


ORACLE_D08 = f"""
WITH RECURSIVE pairs AS (
  WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND round(list_cosine_similarity(a.v, b.v), 6) >= {{thr}}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cc AS (SELECT u AS node, least(u, min(v)) AS cluster_id FROM reach GROUP BY u)
SELECT label,
       count(*) AS n_vecs,
       round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x)))), 6) AS avg_norm
FROM embeddings
WHERE vec_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
GROUP BY label
""".replace("{thr}", str(EMBED_NEARDUP_THRESHOLD))


#: LSH parameters for the approximate semantic-dedup path. Tuned on a
#: measured recall/cost frontier (sf0.01 recall vs sf0.1 runtime):
#: 4 planes x 16 tables hit recall 0.98 but hot 16-bucket tables made
#: the candidate join dominate (37 s at sf0.1); 5 x 24 measured
#: recall 0.966 at a third of that cost; 6 x 40 holds the SAME 0.966
#: recall 28% faster still (3.6 s vs 5.0 s at sf0.1 — candidate
#: volume n²/2^planes x tables drops 17% and buckets parallelize
#: finer; 7 x 56 over-rotates to 0.949). Boundary collision
#: probability 1-(1-(1-theta/pi)^6)^40 ~ 0.93, and real near-dup
#: pairs sit well above the boundary. Deterministic: the Gaussian
#: plane matrix regenerates from a fixed seed on every executor.
D12_LSH_PLANES = 6
D12_LSH_TABLES = 40


def d12_semantic_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate semantic dedup — the documented 100 TB DEFAULT
    path for what d08 computes exactly: hyperplane-LSH candidate
    pairs (bucketed with occupancy caps, never all-pairs) → exact
    cosine verify at the same threshold (inside lsh_ann_pairs) →
    connected components → keep each cluster's min-vec_id
    representative → surviving corpus per label. Same output contract
    as d08; at corpus scale the LSH bucket join replaces d05's
    O(N²/B) blocked all-pairs stage, which is the only part of d08
    that cannot survive 100 TB. At bench SFs the exact path is
    actually FASTER (5k vectors: N² is trivial while LSH pays a fixed
    num_tables x num_planes x d hashing cost per row) — the
    asymptotics, not the small-scale constant, are what this key
    demonstrates.

    rows-only BY DESIGN: a banded oracle would require computing the
    exact all-pairs survivor set inside this key's own plan — the
    very O(N^2) stage this path exists to replace — so the evidence
    is pair recall >= 0.9 vs the exact d05 generator
    (tests/test_dedup.py), the measured pair-generation scaling
    exponent (bench d12_scaling), and the suite-wide plan audit
    confirming no CartesianProduct / all-pairs stage.
    """
    from pyspark.sql.functions import col

    emb = _emb(spark, sf_dir)
    # the library DEFAULT path (exact=False): LSH-bucketed candidates
    pairs = similarity.semantic_dedup_pairs(
        emb,
        threshold=EMBED_NEARDUP_THRESHOLD,
        num_planes=D12_LSH_PLANES,
        num_tables=D12_LSH_TABLES,
    ).select("a_id", "b_id")
    cc = dedup.connected_components_star(pairs)
    losers = cc.filter(col("node") != col("cluster_id")).select(
        col("node").alias("vec_id")
    )
    survivors = emb.join(losers, "vec_id", "left_anti")
    return survivors.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.avg(F.sqrt(F.aggregate(
                col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            ))),
            6,
        ).alias("avg_norm"),
    )


#: The "incoming batch" for the incremental-dedup demonstration:
#: one source partition plays the role of today's crawl drop.
D13_BATCH_SOURCE = "src0"


def d13_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: match ONE source partition (the incoming
    batch) against the rest of the corpus — the incremental form of
    d02/d07 that a production pipeline actually runs per crawl drop.
    See dedup.incremental_jaccard_matches for the one-sided index
    join; batch×batch and corpus×corpus pairs are never formed.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir)
    batch = docs.filter(col("source") == D13_BATCH_SOURCE)
    corpus = docs.filter(col("source") != D13_BATCH_SOURCE)
    return dedup.incremental_jaccard_matches(
        batch,
        corpus,
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    )


ORACLE_D13 = rf"""
WITH toks AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents
),
pos AS (
  SELECT doc_id, source, unnest(tk) AS w, generate_subscripts(tk, 1) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.source,
         a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN pos c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
corpus_kept AS (
  SELECT doc_id, shingle FROM sh
  WHERE source <> '{D13_BATCH_SOURCE}'
    AND shingle IN (SELECT shingle FROM sh WHERE source <> '{D13_BATCH_SOURCE}'
                    GROUP BY shingle HAVING count(*) <= {STOP_SHINGLE_DF})
),
batch_sh AS (SELECT doc_id, shingle FROM sh WHERE source = '{D13_BATCH_SOURCE}'),
inter AS (
  SELECT n.doc_id AS a_id, o.doc_id AS b_id, count(*) AS n_inter
  FROM batch_sh n JOIN corpus_kept o ON n.shingle = o.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT a_id, b_id, n_inter,
         round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
           AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
),
best AS (
  SELECT a_id, b_id, n_inter, jaccard,
         row_number() OVER (PARTITION BY a_id
                            ORDER BY jaccard DESC, b_id) AS rk
  FROM scored
  WHERE jaccard >= {JACCARD_THRESHOLD}
)
SELECT a_id AS doc_id, b_id AS match_id, n_inter, jaccard
FROM best WHERE rk = 1
"""


def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster centrality: PageRank over the d02 jaccard
    pair graph — ranks each doc's centrality within its duplicate
    neighborhood (the better canonical-representative pick than
    min-id for large clusters). See operators/graph.pagerank."""
    from llamadb_spark.operators.graph import pagerank

    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    return pagerank(pairs, iters=3)


ORACLE_G01_TEMPLATE = rf"""
WITH pairs AS (
  {{d02}}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
),
deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
r0 AS (SELECT u, 1.0 AS rank FROM deg),
r1 AS (
  SELECT e.v AS u, 0.15 + 0.85 * sum(r.rank / dg.d) AS rank
  FROM edges e JOIN r0 r ON r.u = e.u JOIN deg dg ON dg.u = e.u
  GROUP BY e.v
),
r2 AS (
  SELECT e.v AS u, 0.15 + 0.85 * sum(r.rank / dg.d) AS rank
  FROM edges e JOIN r1 r ON r.u = e.u JOIN deg dg ON dg.u = e.u
  GROUP BY e.v
),
r3 AS (
  SELECT e.v AS u, 0.15 + 0.85 * sum(r.rank / dg.d) AS rank
  FROM edges e JOIN r2 r ON r.u = e.u JOIN deg dg ON dg.u = e.u
  GROUP BY e.v
)
SELECT u AS node, round(rank, 6) AS rank FROM r3
"""

ORACLE_G01 = ORACLE_G01_TEMPLATE.replace("{d02}", ORACLE_D02)


def g02_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph: how many docs have
    k near-duplicates. The first diagnostic on any dedup run — a
    heavy high-degree tail means boilerplate/template families (one
    hub similar to thousands), a flat histogram means pairwise
    copies. Two map-side-combined aggregations over the pair list;
    no joins."""
    from pyspark.sql.functions import col

    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    # explode, not union: a union would reference (and re-plan) the
    # whole pair-generation pipeline twice
    nodes = pairs.select(
        F.explode(F.array(col("a_id"), col("b_id"))).alias("node")
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


ORACLE_G02_TEMPLATE = r"""
WITH pairs AS (
  {d02}
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a_id AS node FROM pairs
    UNION ALL
    SELECT b_id FROM pairs
  ) GROUP BY node
)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""

ORACLE_G02 = ORACLE_G02_TEMPLATE.replace("{d02}", ORACLE_D02)


def g03_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph + global clustering
    coefficient — triangles distinguish transitive duplicate FAMILIES
    (A~B~C~A: one boilerplate template) from coincidental pairwise
    matches (A~B, B~C, A≁C: chained borderline similarity), which
    decides whether cluster-level or pair-level remediation is right.

    Classic two-join triangle counting on oriented edges: pairs
    already carry a_id < b_id, so each triangle a<b<c is found
    exactly once as (a,b)+(b,c) wedges closed by a semi-join on
    (a,c). At 100 TB you'd orient by (degree, id) instead of raw id
    to bound wedge fan-out by arboricity (the id orientation here is
    equivalent work when ids are uncorrelated with degree); the
    occupancy-capped pair graph keeps degrees bounded upstream.
    Wedge count Σ d(d-1)/2 gives the clustering denominator.
    """
    from pyspark.sql.functions import col

    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    pairs = pairs.localCheckpoint()  # 4 consumers below
    wedges = (
        pairs.select(col("a_id").alias("a"), col("b_id").alias("b"))
        .join(
            pairs.select(col("a_id").alias("b"), col("b_id").alias("c")), "b"
        )
        .select("a", "b", "c")
    )
    tris = wedges.join(
        pairs.select(col("a_id").alias("a"), col("b_id").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    deg = (
        pairs.select(F.explode(F.array("a_id", "b_id")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # three 1-row scalar aggregates cross-joined — fully declarative,
    # nothing driver-side
    return (
        pairs.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(tris.agg(F.count(F.lit(1)).alias("n_triangles")))
        .crossJoin(
            deg.agg(F.sum(col("d") * (col("d") - 1) / 2).alias("_w"))
        )
        .select(
            "n_edges",
            "n_triangles",
            F.round(
                F.when(
                    col("_w") > 0, 3.0 * col("n_triangles") / col("_w")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("global_clustering"),
        )
    )


ORACLE_G03_TEMPLATE = r"""
WITH pairs AS (
  {d02}
),
e AS (SELECT a_id, b_id FROM pairs),
tri AS (
  SELECT count(*) AS n_tri
  FROM e e1
  JOIN e e2 ON e2.a_id = e1.b_id
  JOIN e e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT a_id AS node FROM e UNION ALL SELECT b_id FROM e
  ) GROUP BY node
),
w AS (SELECT sum(d * (d - 1) / 2.0) AS n_wedges FROM deg)
SELECT (SELECT count(*) FROM e) AS n_edges,
       CAST(n_tri AS BIGINT) AS n_triangles,
       round(CASE WHEN n_wedges > 0 THEN 3.0 * n_tri / n_wedges
                  ELSE 0.0 END, 6) AS global_clustering
FROM tri, w
"""

ORACLE_G03 = ORACLE_G03_TEMPLATE.replace("{d02}", ORACLE_D02)


def t19_token_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective token yield per source: docs/tokens before and after
    lexical dedup (d07's survivor set) — the number a data team
    actually budgets with ("we crawled X tokens, Y survive dedup").
    Reuses the pair→CC drop list; token counts are the t03 whitespace
    contract. One extra left join + per-source aggregate on top of
    the dedup pipeline — the marginal cost of the report is one
    shuffle.
    """
    from pyspark.sql.functions import col

    from llamadb_spark.functions.text import tokens

    docs = _docs(spark, sf_dir)
    pairs = dedup.jaccard_ngram_pairs(
        docs, threshold=JACCARD_THRESHOLD, stop_shingle_df=STOP_SHINGLE_DF
    ).select("a_id", "b_id")
    cc = dedup.connected_components(pairs)
    losers = cc.filter(col("node") != col("cluster_id")).select(
        col("node").alias("doc_id"), F.lit(1).alias("_drop")
    )
    ntok = F.size(F.filter(tokens(col("text")), lambda t: t != ""))
    base = docs.select("doc_id", "source", ntok.alias("n_tok")).join(
        losers, "doc_id", "left"
    )
    kept = col("_drop").isNull()
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_before"),
        F.sum(kept.cast("long")).alias("n_docs_after"),
        F.sum("n_tok").alias("tokens_before"),
        F.sum(F.when(kept, col("n_tok")).otherwise(0)).alias("tokens_after"),
        F.round(
            F.sum(F.when(kept, col("n_tok")).otherwise(0))
            / F.sum("n_tok").cast("double"),
            6,
        ).alias("token_yield"),
    )


ORACLE_T19_TEMPLATE = r"""
WITH RECURSIVE pairs AS (
  {d02}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cc AS (SELECT u AS node, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
losers AS (SELECT node FROM cc WHERE node <> cluster_id),
tok AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS n_tok
  FROM documents
)
SELECT source,
       count(*) AS n_docs_before,
       CAST(count(*) FILTER (doc_id NOT IN (SELECT node FROM losers))
            AS BIGINT) AS n_docs_after,
       CAST(sum(n_tok) AS BIGINT) AS tokens_before,
       CAST(coalesce(sum(n_tok) FILTER (doc_id NOT IN (SELECT node FROM losers)), 0)
            AS BIGINT) AS tokens_after,
       round(coalesce(sum(n_tok) FILTER (doc_id NOT IN (SELECT node FROM losers)), 0)
             / CAST(sum(n_tok) AS DOUBLE), 6) AS token_yield
FROM tok
GROUP BY source
"""

ORACLE_T19 = ORACLE_T19_TEMPLATE.replace("{d02}", ORACLE_D02)


CONTAINMENT_THRESHOLD = 0.3


def d14_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excerpt detection: smaller-doc shingle containment in a larger
    doc (see dedup.containment_pairs — jaccard's union denominator
    hides quotes; containment's min() denominator flags them)."""
    return dedup.containment_pairs(
        _docs(spark, sf_dir),
        threshold=CONTAINMENT_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    )


ORACLE_D14 = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
),
pos AS (
  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN pos c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
kept AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
                    HAVING count(*) <= {STOP_SHINGLE_DF})
),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT a_id, b_id, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
         round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
           AS containment
  FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
)
SELECT CASE WHEN n_a < n_b OR (n_a = n_b AND a_id < b_id)
            THEN a_id ELSE b_id END AS inner_id,
       CASE WHEN n_a < n_b OR (n_a = n_b AND a_id < b_id)
            THEN b_id ELSE a_id END AS outer_id,
       n_inter, containment
FROM scored
WHERE containment >= {CONTAINMENT_THRESHOLD}
"""


# --- similarity search ---------------------------------------------------

KNN_QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7]
KNN_K = 5


def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_bruteforce(_emb(spark, sf_dir), KNN_QUERY_IDS, k=KNN_K)


ORACLE_S01 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS q_v FROM e
      WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q_v, e.v), 6) AS cos
  FROM q, e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) t WHERE rank <= {KNN_K}
"""


def s02_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only BY DESIGN: a banded oracle would need the exact
    # all-pairs twin inside this key's own plan, defeating the point
    # of the scale path (this is the bucketed generator that REPLACES
    # O(N^2) work at 100 TB). Precision is structural (lsh_ann_pairs
    # exact-verifies every candidate's cosine before emitting);
    # recall vs s01/d05 is asserted in tests/test_similarity.py.
    return similarity.lsh_ann_pairs(_emb(spark, sf_dir), threshold=0.4)


#: IVF recall bands the banded oracle attests. The synthetic
#: embeddings are near-isotropic (no cluster structure for the coarse
#: quantizer to exploit), so per-query recall@5 is modest by
#: construction; the index is deterministic (hash-sampled seeds,
#: fixed Lloyd passes), and the measured per-query floor at
#: sf0.001-0.01 is 0.4 with nprobe=8 — both bands hold with ≥1
#: neighbor of margin on every query.
S03_MIN_RECALL = 0.2
S03_MIN_MEAN_RECALL = 0.5
S03_NPROBE = 8


def s03_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse cells + nprobe probe) with a driver-attestable
    banded contract: per query, emit the EXACT top-1 neighbor and its
    cosine (DuckDB-recomputable via list_cosine_similarity — the s01
    machinery) plus a boolean claiming IVF recall@k ≥ S03_MIN_RECALL
    against the exact top-k computed in Spark. The oracle recomputes
    exact top-1 and claims TRUE, so the hash matches iff the index
    actually achieves the recall band on every query."""
    from pyspark.sql.functions import col

    emb = _emb(spark, sf_dir)
    # iters=1: a single Lloyd refinement already clears the recall
    # band with 2x margin at every SF (measured min-recall 0.40 vs
    # the 0.2 band, mean 0.77-0.80 vs 0.5, sf0.001/0.01/0.1) — the
    # second pass bought no recall, only a full extra corpus pass +
    # collect (attestation-cost trim, VERDICT r06 #4)
    approx = similarity.ivf_topk(
        emb, KNN_QUERY_IDS, k=KNN_K, n_cells=16, nprobe=S03_NPROBE, iters=1
    )
    # the exact twin feeds BOTH the recall join and the top-1
    # projection: stage its |queries|·k rows once instead of running
    # the brute-force scan twice
    exact = similarity.knn_bruteforce(
        emb, KNN_QUERY_IDS, k=KNN_K
    ).localCheckpoint()
    hits = (
        approx.join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    top1 = exact.filter(col("rank") == 1).select(
        "query_id",
        col("neighbor_id").alias("exact_top1"),
        col("cos").alias("top1_cos"),
    )
    from pyspark.sql.window import Window

    w_all = Window.partitionBy()
    return top1.join(hits, "query_id", "left").select(
        "query_id",
        "exact_top1",
        "top1_cos",
        (
            F.coalesce(col("n_hit"), F.lit(0))
            >= F.lit(float(S03_MIN_RECALL)) * KNN_K
        ).alias("recall_ok"),
        (
            F.avg(F.coalesce(col("n_hit"), F.lit(0)) / F.lit(float(KNN_K))).over(
                w_all
            )
            >= S03_MIN_MEAN_RECALL
        ).alias("mean_recall_ok"),
    )


ORACLE_S03 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS q_v FROM e
      WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q_v, e.v), 6) AS cos
  FROM q, e WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id AS exact_top1, cos AS top1_cos,
       TRUE AS recall_ok, TRUE AS mean_recall_ok
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) t WHERE rank = 1
"""


# --- text analysis -------------------------------------------------------

def t01_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.language_id(_docs(spark, sf_dir))


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_HITS = ", ".join(
    f"len(list_intersect(tk, {_sql_list(ws)})) AS hits_{lang}"
    for lang, ws in STOPWORDS.items()
)
_BEST = "greatest(hits_en, hits_de, hits_fr, hits_es)"
ORACLE_T01 = rf"""
WITH d AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS tk
  FROM documents
),
h AS (SELECT doc_id, {_HITS} FROM d)
SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
       CASE WHEN {_BEST} = 0 THEN 'und'
            WHEN hits_en = {_BEST} THEN 'en'
            WHEN hits_de = {_BEST} THEN 'de'
            WHEN hits_fr = {_BEST} THEN 'fr'
            WHEN hits_es = {_BEST} THEN 'es'
       END AS pred_lang
FROM h
"""


def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(_docs(spark, sf_dir))


_EN = _sql_list(STOPWORDS["en"])
ORACLE_T02 = rf"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE) AS n_dis,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), {_EN})) AS DOUBLE) AS hits
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(n_dis AS BIGINT) AS n_distinct,
       round(n_punct / n_chars, 6) AS punct_ratio,
       round(hits / n_dis, 6) AS stop_ratio,
       round((n_dis / n_tok) * least(1.0, n_tok / 100.0)
             * (1 - n_punct / n_chars)
             * (0.5 + 0.5 * least(1.0, 4 * hits / n_dis)), 6) AS quality
FROM d
"""


def t20_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile stratification — the bucketing step of
    curriculum/quality-mixing pipelines (CCNet's perplexity buckets,
    quality-weighted sampling): per decile of the t02 quality score,
    document count and score stats.

    Scale note: NOT an ntile window — a global ntile funnels the
    whole corpus through one task. Instead: exact decile cut points
    via max-accuracy percentile_approx (one aggregation; at max
    accuracy it degenerates to the exact lower quantile, bit-equal
    to DuckDB's quantile_disc — the q53 precedent), broadcast the
    9-value array, assign buckets with a codegen'd array filter, and
    aggregate. Two shuffles total, no global sort.
    """
    from pyspark.sql.functions import broadcast, col

    q = textops.quality_score(_docs(spark, sf_dir)).select("doc_id", "quality")
    cuts = q.agg(
        F.percentile_approx(
            "quality", [i / 10.0 for i in range(1, 10)], 2147483647
        ).alias("cuts")
    )
    bucketed = q.crossJoin(broadcast(cuts)).select(
        "quality",
        (
            F.size(F.filter(col("cuts"), lambda c: c <= col("quality"))) + 1
        ).alias("decile"),
    )
    return bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.min("quality"), 6).alias("min_quality"),
        F.round(F.max("quality"), 6).alias("max_quality"),
    )


ORACLE_T20_TEMPLATE = r"""
WITH scored AS (
  {t02}
),
cuts AS (
  SELECT quantile_disc(quality,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
  FROM scored
),
bucketed AS (
  SELECT quality,
         1 + len(list_filter(cuts, c -> c <= quality)) AS decile
  FROM scored, cuts
)
SELECT decile, count(*) AS n_docs,
       round(avg(quality), 6) AS avg_quality,
       round(min(quality), 6) AS min_quality,
       round(max(quality), 6) AS max_quality
FROM bucketed
GROUP BY decile
"""


ORACLE_T20 = ORACLE_T20_TEMPLATE.replace("{t02}", ORACLE_T02)


def t03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_counts(_docs(spark, sf_dir))


ORACLE_T03 = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprints(_docs(spark, sf_dir))


ORACLE_T04 = r"""
WITH f AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5
  FROM documents
)
SELECT doc_id, fp_md5,
       CAST(concat('0x', substr(fp_md5, 1, 15)) AS BIGINT) AS fp64
FROM f
"""


def t05_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.vocab_topk(_docs(spark, sf_dir), k=100)


ORACLE_T05 = r"""
SELECT token, count(*) AS df FROM (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
) t
WHERE token <> ''
GROUP BY token
ORDER BY df DESC, token
LIMIT 100
"""


def t06_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.repetition_ratio(_docs(spark, sf_dir))


ORACLE_T06 = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS i FROM toks
),
sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN pos c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
dcount AS (SELECT doc_id, count(*) AS n_distinct FROM sh GROUP BY 1),
tot AS (SELECT doc_id, greatest(len(tk) - 2, 0) AS n_shingles FROM toks)
SELECT t.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(n_distinct, 0) AS BIGINT) AS n_distinct,
       CASE WHEN n_shingles > 0
            THEN round(1.0 - coalesce(n_distinct, 0)
                       / CAST(n_shingles AS DOUBLE), 6)
            ELSE 0.0 END AS rep_ratio
FROM tot t LEFT JOIN dcount d USING (doc_id)
"""


def t07_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.scrub_pii(_docs(spark, sf_dir))


ORACLE_T07 = r"""
WITH s AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\s]+', '<URL>', 'g'),
           '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS clean
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(text,
         '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
       CAST(length(clean) AS BIGINT) AS clean_chars,
       sha256(clean) AS clean_sha
FROM s
"""


CHUNK_SIZE, CHUNK_STRIDE = 400, 300


def t08_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.chunk_documents(
        _docs(spark, sf_dir), size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )


ORACLE_T08 = f"""
WITH ks AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           greatest(CAST(floor((length(text) - 1) / {CHUNK_STRIDE}) AS INT), 0)))
           AS k
  FROM documents
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(length(substr(text, 1 + k * {CHUNK_STRIDE}, {CHUNK_SIZE})) AS BIGINT)
         AS chunk_chars,
       sha256(substr(text, 1 + k * {CHUNK_STRIDE}, {CHUNK_SIZE})) AS chunk_sha
FROM ks
"""


SAMPLE_RATES = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.75}


def p01_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from llamadb_spark.operators import sampling

    return sampling.stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars"),
        rates=SAMPLE_RATES,
    )


ORACLE_P01 = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ((doc_id % 100003) * 2654435761) % 1000 <
      CASE lang WHEN 'en' THEN {int(SAMPLE_RATES['en']*1000)}
                WHEN 'de' THEN {int(SAMPLE_RATES['de']*1000)}
                WHEN 'fr' THEN {int(SAMPLE_RATES['fr']*1000)}
                WHEN 'es' THEN {int(SAMPLE_RATES['es']*1000)}
                ELSE 1000 END
"""


#: Deterministic pseudo eval-set: every 97th doc plays the held-out
#: benchmark whose n-grams must not leak into training.
EVAL_MOD = 97
#: 4-grams: strict enough to mean real overlap, loose enough that the
#: synthetic corpus actually exhibits leakage (8-grams find zero).
CONTAM_N = 4


def p02_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    from pyspark.sql.functions import col

    train = docs.filter(col("doc_id") % EVAL_MOD != 0)
    eval_docs = docs.filter(col("doc_id") % EVAL_MOD == 0)
    return textops.contamination_check(train, eval_docs, n=CONTAM_N)


ORACLE_P02 = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, k, k + {CONTAM_N - 1}), ' ') AS shingle
  FROM (
    SELECT doc_id, tk,
           unnest(generate_series(1, len(tk) - {CONTAM_N - 1})) AS k
    FROM toks WHERE len(tk) >= {CONTAM_N}
  )
),
ev AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
SELECT tr.doc_id,
       count(DISTINCT tr.shingle) AS n_shared_ngrams,
       count(DISTINCT ev.doc_id) AS n_eval_docs
FROM tr JOIN ev ON tr.shingle = ev.shingle
GROUP BY tr.doc_id
"""


P03_BUDGET = 2048


def p03_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (first-fit-decreasing per shard) with a
    driver-attestable contract: one output row per document carrying
    the exact-computable token count plus the packing invariants as
    booleans — bin fill within budget (oversized docs get singleton
    bins) and fill accounting covering the doc. Row-set equality with
    the oracle (one row per document) attests the every-doc-exactly-
    once invariant; the booleans attest the bin discipline. The bin
    assignment itself (greedy, not SQL-expressible) stays available
    via operators/packing.pack_sequences and its property tests."""
    from pyspark.sql.functions import col

    from llamadb_spark.operators import packing

    packed = packing.pack_sequences(_docs(spark, sf_dir), budget=P03_BUDGET)
    return packed.select(
        "doc_id",
        "n_tokens",
        (
            (col("bin_fill") <= P03_BUDGET) | (col("n_tokens") > P03_BUDGET)
        ).alias("fits_budget"),
        (col("bin_fill") >= col("n_tokens")).alias("fill_covers_doc"),
    )


ORACLE_P03 = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
         AS n_tokens,
       TRUE AS fits_budget,
       TRUE AS fill_covers_doc
FROM documents
"""


def s04_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.quantize_embeddings(_emb(spark, sf_dir))


ORACLE_S04 = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v, len(v) AS n_dims,
         CASE WHEN list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0
              THEN list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
              ELSE 1.0 END AS scale
  FROM e
)
SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims, scale,
       array_to_string(
         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT)), ',') AS q_csv
FROM s
"""


#: Query terms for the TF-IDF retrieval baseline — mid-frequency
#: corpus vocabulary so scores spread meaningfully.
TFIDF_QUERY = ["data", "join", "stream", "filter"]
TFIDF_K = 20


def t09_tfidf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.tfidf_topk(_docs(spark, sf_dir), TFIDF_QUERY, k=TFIDF_K)


ORACLE_T09 = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ({", ".join(repr(t) for t in TFIDF_QUERY)})
  GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, count(*) AS n_terms,
       round(sum(tf * ln((n_docs + 1) / (df + 1.0))), 6) AS score
FROM tf JOIN df USING (token), n
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {TFIDF_K}
"""


#: RRF fusion constant (the standard 60 from Cormack et al.) and
#: retrieval depths for the hybrid key.
RRF_K = 60
HYBRID_POOL = 50
HYBRID_TOPK = 20


def t27_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.bm25_topk(_docs(spark, sf_dir), TFIDF_QUERY, k=TFIDF_K)


def _bm25_sql(limit: int) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS token
  FROM documents
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS dlen
  FROM documents
),
a AS (SELECT avg(dlen) AS avgdl FROM dl),
n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ({", ".join(repr(t) for t in TFIDF_QUERY)})
  GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id AS doc_id, count(*) AS n_terms,
       round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen / avgdl))),
             6) AS bm25
FROM tf JOIN df USING (token) JOIN dl USING (doc_id), a, n
GROUP BY tf.doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {limit}
"""


ORACLE_T27 = _bm25_sql(TFIDF_K)


def s15_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval with reciprocal-rank fusion —
    the standard two-tower search stack in one declarative plan: a
    BM25 ranking over `documents` and an exact-cosine ranking over
    `embeddings` (query = the min-vec_id embedding; doc_id == vec_id
    is the corpus linkage at every SF) are each cut to a top-POOL
    list, then fused by RRF: score(d) = Σ 1/(K + rank_d) over the
    lists containing d, top-HYBRID_TOPK by (rounded score, id).

    Fully exact-oracled: both rankings and the fusion are
    DuckDB-recomputable; ordering uses ROUNDED scores with id
    tiebreaks on both engines so pool cutoffs can't flip on a last-
    ulp difference.

    Scale: each ranking ends in TakeOrderedAndProject (top-POOL);
    the rank windows run over the POOL-bounded lists, never the
    corpus; the fusion join is POOL x POOL rows.
    """
    from pyspark.sql.functions import broadcast, col
    from pyspark.sql.window import Window

    from llamadb_spark.operators.similarity import cosine

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)

    lex_pool = textops.bm25_topk(docs, TFIDF_QUERY, k=HYBRID_POOL)
    w_lex = Window.partitionBy().orderBy(col("bm25").desc(), col("doc_id"))
    lex = lex_pool.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    qv = [
        float(x)
        for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    qcol = F.array(*[F.lit(x) for x in qv])
    scored = emb.select(
        col("vec_id").alias("doc_id"),
        F.round(
            cosine(col("embedding").cast("array<double>"), qcol), 6
        ).alias("cos"),
    )
    vec_pool = scored.orderBy(col("cos").desc(), col("doc_id")).limit(
        HYBRID_POOL
    )
    w_vec = Window.partitionBy().orderBy(col("cos").desc(), col("doc_id"))
    vec = vec_pool.select(
        "doc_id", F.row_number().over(w_vec).alias("vec_rank")
    )

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
        F.round(
            F.when(
                col("lex_rank").isNotNull(),
                1.0 / (RRF_K + col("lex_rank")),
            ).otherwise(0.0)
            + F.when(
                col("vec_rank").isNotNull(),
                1.0 / (RRF_K + col("vec_rank")),
            ).otherwise(0.0),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(col("rrf").desc(), col("doc_id")).limit(HYBRID_TOPK)


ORACLE_S15 = rf"""
WITH lex_pool AS ({_bm25_sql(HYBRID_POOL)}),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM lex_pool
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
sc AS (SELECT vec_id AS doc_id, round(list_cosine_similarity(v, qv), 6) AS cos
       FROM e, q),
vec_pool AS (SELECT * FROM sc ORDER BY cos DESC, doc_id LIMIT {HYBRID_POOL}),
vec AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
  FROM vec_pool
),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         COALESCE(lex_rank, 0) AS lex_rank,
         COALESCE(vec_rank, 0) AS vec_rank,
         round(COALESCE(1.0 / ({RRF_K} + lex_rank), 0)
               + COALESCE(1.0 / ({RRF_K} + vec_rank), 0), 6) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, lex_rank, vec_rank, rrf
FROM fused ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOPK}
"""



def s05_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroids(_emb(spark, sf_dir))


ORACLE_S05 = """
SELECT label, CAST(i - 1 AS BIGINT) AS dim, round(avg(x), 6) AS centroid
FROM (
  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
GROUP BY 1, 2
"""


def p04_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column census over documents (operators/
    profiling.py): null counts, exact distinct cardinalities, native
    min/max — the pre-training data-quality gate."""
    from llamadb_spark.operators.profiling import profile_columns

    return profile_columns(_docs(spark, sf_dir), ["lang", "source", "n_chars"])


ORACLE_P04 = """
SELECT 'lang' AS column_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT lang) AS n_distinct,
       CAST(min(lang) AS VARCHAR) AS min_val, CAST(max(lang) AS VARCHAR) AS max_val
FROM documents
UNION ALL
SELECT 'source', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT source),
       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'n_chars', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT n_chars),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
FROM documents
"""


def t10_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus entropy profile: per-doc unigram Shannon entropy
    (operators/textops.py token_entropy), rolled up per language.
    Low-entropy languages flag template-heavy slices of the corpus."""
    ent = textops.token_entropy(_docs(spark, sf_dir), carry_cols=("lang",))
    return (
        ent.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
            F.round(F.min("entropy"), 6).alias("min_entropy"),
            F.round(F.max("entropy"), 6).alias("max_entropy"),
        )
    )


ORACLE_T10 = r"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
), tc AS (
  SELECT doc_id, lang, token, count(*) AS c
  FROM tok WHERE token <> ''
  GROUP BY doc_id, lang, token
), ent AS (
  SELECT doc_id, lang,
         ln(sum(c)) - sum(c * ln(c)) / sum(c) AS entropy
  FROM tc GROUP BY doc_id, lang
)
SELECT lang, count(*) AS n_docs,
       round(avg(entropy), 6) AS avg_entropy,
       round(min(entropy), 6) AS min_entropy,
       round(max(entropy), 6) AS max_entropy
FROM ent GROUP BY lang
"""


def s06_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-label centroid cosine matrix — which classes sit close
    in embedding space (label-confusion structure, cluster-merge
    candidates). Built on the dims-long centroid form: per-(label,
    dim) means self-joined on dim, grouped per label pair.

    Scale: the corpus pass is ONE map-side-combined aggregation to
    k×d rows (tiny); the pairwise cosine works entirely on that k×d
    table — a broadcast self-join on dim with k² output, independent
    of corpus size. No collect, no UDF, all codegen'd."""
    emb = _emb(spark, sf_dir)
    dims = (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
        )
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("m"))
    )
    a, b = dims.alias("a"), dims.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.round(
                F.sum(F.col("a.m") * F.col("b.m"))
                / (
                    F.sqrt(F.sum(F.col("a.m") * F.col("a.m")))
                    * F.sqrt(F.sum(F.col("b.m") * F.col("b.m")))
                ),
                6,
            ).alias("cos")
        )
        .orderBy("label_a", "label_b")
    )


ORACLE_S06 = """
WITH dims AS (
  SELECT label, dim, avg(x) AS m
  FROM (SELECT label,
               unnest(CAST(embedding AS DOUBLE[])) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings)
  GROUP BY label, dim
)
SELECT a.label AS label_a, b.label AS label_b,
       round(sum(a.m * b.m)
             / (sqrt(sum(a.m * a.m)) * sqrt(sum(b.m * b.m))), 6) AS cos
FROM dims a JOIN dims b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
"""


def p05_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted deletion (GDPR/takedown shape): remove every document
    on a tombstone list from the corpus via broadcast LEFT ANTI join.

    The tombstone list is deterministic here (doc_id % 97 == 0 stands
    in for the request table). Scale: deletion lists are tiny relative
    to the corpus → broadcast anti join, no corpus shuffle at all;
    the corpus pass stays a single scan. This is the compliance twin
    of d07's dedup-apply (same anti-join shape, different driver).
    """
    docs = _docs(spark, sf_dir)
    tombstones = docs.filter((F.col("doc_id") % 97) == 0).select("doc_id")
    return (
        docs.join(F.broadcast(tombstones), "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
    )


ORACLE_P05 = """
SELECT doc_id, lang, source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents t
                  WHERE t.doc_id % 97 = 0 AND t.doc_id = d.doc_id)
"""


def t11_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix: actual corpus language vs
    the stopword-heuristic prediction (t01), with per-actual-language
    share. The standard quality-eval rollup a pipeline runs after any
    heuristic labeler.

    Scale: the prediction is computed per-row in the same scan as the
    actual label (no join — language_id carries lang through), so the
    only shuffle is the tiny (lang × pred_lang) aggregation.
    """
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    pred = textops.language_id(docs, id_col="doc_id", carry_cols=("lang",))
    per_pair = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql.window import Window

    total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return per_pair.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("share_of_actual"),
    )


ORACLE_T11 = f"""
WITH pred AS ({ORACLE_T01}),
pairs AS (
  SELECT d.lang, p.pred_lang, count(*) AS n_docs
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY d.lang, p.pred_lang
)
SELECT lang, pred_lang, n_docs,
       round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE),
             6) AS share_of_actual
FROM pairs
"""


PMI_MIN_COUNT = 5
PMI_K = 20


def t12_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram PMI collocation ranking (operators/textops.py
    pmi_collocations)."""
    return textops.pmi_collocations(
        _docs(spark, sf_dir), min_count=PMI_MIN_COUNT, k=PMI_K
    )


ORACLE_T12 = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
bi AS (
  SELECT a.w || ' ' || b.w AS bigram
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bic AS (
  SELECT bigram, count(*) AS c_ab FROM bi
  GROUP BY 1 HAVING count(*) >= {PMI_MIN_COUNT}
),
uni AS (SELECT w, count(*) AS c_w FROM pos GROUP BY 1),
tot AS (SELECT CAST(sum(c_w) AS DOUBLE) AS n_total FROM uni)
SELECT bigram, c_ab, u1.c_w AS c_1, u2.c_w AS c_2,
       round(ln(c_ab * n_total)
             - ln(CAST(u1.c_w AS DOUBLE) * u2.c_w), 6) AS pmi
FROM bic, tot
JOIN uni u1 ON u1.w = string_split(bigram, ' ')[1]
JOIN uni u2 ON u2.w = string_split(bigram, ' ')[2]
ORDER BY pmi DESC, bigram
LIMIT {PMI_K}
"""


def s07_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification accuracy per label
    (operators/similarity.py centroid_classify)."""
    return similarity.centroid_classify(_emb(spark, sf_dir))


ORACLE_S07 = """
WITH v AS (
  SELECT vec_id AS _id, label AS _true,
         generate_subscripts(embedding, 1) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings
),
dims AS (
  SELECT _cand, dim, avg(m) AS m
  FROM (SELECT label AS _cand,
               generate_subscripts(embedding, 1) AS dim,
               unnest(CAST(embedding AS DOUBLE[])) AS m
        FROM embeddings)
  GROUP BY _cand, dim
),
scored AS (
  SELECT v._id, v._true, d._cand,
         sum(v.x * d.m) AS dot,
         sqrt(sum(v.x * v.x)) AS nv
  FROM v JOIN dims d ON v.dim = d.dim
  GROUP BY v._id, v._true, d._cand
),
cnorm AS (
  SELECT _cand, sqrt(sum(m * m)) AS nc FROM dims GROUP BY _cand
),
cos AS (
  SELECT s._id, s._true, s._cand,
         round(s.dot / (s.nv * c.nc), 6) AS cos
  FROM scored s JOIN cnorm c ON s._cand = c._cand
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY _id
                                 ORDER BY cos DESC, _cand) AS rk
    FROM cos
  ) WHERE rk = 1
)
SELECT _true AS label,
       count(*) AS n_vecs,
       CAST(sum(CASE WHEN _cand = _true THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(sum(CASE WHEN _cand = _true THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS accuracy
FROM best GROUP BY _true
"""


def p06_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split census: deterministic hash-range
    assignment (operators/sampling.py dataset_split) rolled up per
    (split, lang) with per-language shares."""
    from pyspark.sql.window import Window

    from llamadb_spark.operators.sampling import dataset_split

    out = dataset_split(_docs(spark, sf_dir))
    per = out.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return per.select(
        "split", "lang", "n_docs", F.round(F.col("n_docs") / total, 6).alias("share")
    )


ORACLE_P06 = """
WITH labeled AS (
  SELECT lang,
         CASE WHEN ((doc_id % 100003) * 2654435761) % 1000 < 800 THEN 'train'
              WHEN ((doc_id % 100003) * 2654435761) % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
per AS (
  SELECT split, lang, count(*) AS n_docs FROM labeled GROUP BY 1, 2
)
SELECT split, lang, n_docs,
       round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE),
             6) AS share
FROM per
"""


# --- multimodal ----------------------------------------------------------

def m01_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = multimodal.media_metadata(_docs(spark, sf_dir))
    return df.withColumn("n_bytes", df["n_bytes"].cast("long"))


ORACLE_M01 = """
SELECT doc_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha
FROM documents
"""


def m02_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full media pipeline: envelope → Arrow-batched decode stub →
    declarative aspect-fit resize. The stub derives dims from the
    payload sha256, which DuckDB can replicate — so even the UDF
    stage gets a value-match oracle."""
    env = multimodal.attach_payload(_docs(spark, sf_dir))
    decoded = multimodal.decode_media(env)
    return multimodal.resize_media(decoded, target=224).select(
        "doc_id", "width", "height", "out_w", "out_h", "sha_prefix"
    )


ORACLE_M02 = """
WITH d AS (
  SELECT doc_id,
         CAST(CAST(concat('0x', substr(sha256(text), 1, 4)) AS INT)
              % 1920 + 1 AS INT) AS width,
         CAST(CAST(concat('0x', substr(sha256(text), 5, 4)) AS INT)
              % 1080 + 1 AS INT) AS height,
         substr(sha256(text), 1, 16) AS sha_prefix
  FROM documents
)
SELECT doc_id, width, height,
       CAST(greatest(floor(width * least(224.0 / width, 224.0 / height)), 1)
            AS INT) AS out_w,
       CAST(greatest(floor(height * least(224.0 / width, 224.0 / height)), 1)
            AS INT) AS out_h,
       sha_prefix
FROM d
"""


def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over the media envelope
    (operators/multimodal.py sample_frames)."""
    return multimodal.sample_frames(_docs(spark, sf_dir))


ORACLE_M03 = """
WITH env AS (
  SELECT doc_id, sha256(text) AS content_sha,
         CAST(CAST(concat('0x', substr(sha256(text), 9, 3)) AS INT)
              % 120 + 1 AS INT) AS duration_s
  FROM documents
),
frames AS (
  SELECT doc_id, content_sha, duration_s,
         CAST(least(duration_s, 16) AS INT) AS n_frames,
         unnest(generate_series(0, least(duration_s, 16) - 1)) AS frame_idx
  FROM env
)
SELECT doc_id, duration_s, n_frames,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * 1000 AS BIGINT) AS frame_ts_ms,
       sha256(content_sha || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sha
FROM frames
"""


def p08_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit over the orders table (the
    deequ/dbt-test pattern): each check is ONE conditional aggregate,
    all checks ride a single table scan (one agg, no per-check jobs);
    referential integrity adds one broadcast anti-join count. Output
    one row per check so a pipeline can alert on n_violations > 0.

    Checks: primary-key uniqueness, NOT NULL, value domain,
    non-negativity, date bounds, referential integrity to customer.
    """
    from pyspark.sql.functions import broadcast, col, lit

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    one_pass = orders.agg(
        (F.count(lit(1)) - F.countDistinct("o_orderkey")).alias(
            "pk_duplicate_orderkeys"
        ),
        F.count_if(col("o_custkey").isNull()).alias("null_custkeys"),
        F.count_if(
            ~col("o_orderstatus").isin("F", "O", "P")
        ).alias("bad_status_values"),
        F.count_if(col("o_totalprice") <= 0).alias("nonpositive_totalprice"),
        F.count_if(
            (col("o_orderdate") < lit("1990-01-01").cast("timestamp"))
            | (col("o_orderdate") > lit("2030-01-01").cast("timestamp"))
        ).alias("out_of_range_orderdate"),
    )
    orphan = (
        orders.join(
            broadcast(cust), orders.o_custkey == cust.c_custkey, "left_anti"
        )
        .agg(F.count(lit(1)).alias("orphan_custkeys"))
    )
    wide = one_pass.crossJoin(orphan)
    checks = [
        "pk_duplicate_orderkeys",
        "null_custkeys",
        "bad_status_values",
        "nonpositive_totalprice",
        "out_of_range_orderdate",
        "orphan_custkeys",
    ]
    stacked = ", ".join(f"'{c}', {c}" for c in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stacked}) AS (check_name, n_violations)"
    )


ORACLE_P08 = """
SELECT 'pk_duplicate_orderkeys' AS check_name,
       count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
UNION ALL
SELECT 'null_custkeys', count(*) FILTER (o_custkey IS NULL) FROM orders
UNION ALL
SELECT 'bad_status_values',
       count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')) FROM orders
UNION ALL
SELECT 'nonpositive_totalprice',
       count(*) FILTER (o_totalprice <= 0) FROM orders
UNION ALL
SELECT 'out_of_range_orderdate',
       count(*) FILTER (o_orderdate < TIMESTAMP '1990-01-01'
                        OR o_orderdate > TIMESTAMP '2030-01-01') FROM orders
UNION ALL
SELECT 'orphan_custkeys', count(*) FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
"""


def p09_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from llamadb_spark.operators.sampling import exact_k_sample

    return exact_k_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"), k=25
    )


ORACLE_P09 = """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY ((doc_id % 100003) * 2654435761) % 1000000000, doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rk <= 25
"""


P11_SAMPLE_K = 100


def p11_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: keep docs with probability proportional
    to their length (n_chars), expected sample ≈ 100 docs — see
    operators/sampling.weighted_sample for the integer-exact draw."""
    from llamadb_spark.operators.sampling import weighted_sample

    return weighted_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        k=P11_SAMPLE_K,
        weight_col="n_chars",
    )


ORACLE_P11 = f"""
WITH w AS (SELECT sum(n_chars) AS w_total FROM documents)
SELECT doc_id, lang, n_chars,
       round(least(1.0, {P11_SAMPLE_K} * n_chars / CAST(w_total AS DOUBLE)), 6)
         AS incl_prob
FROM documents, w
WHERE CAST(((doc_id % 100003) * 2654435761) % 1000000000 AS HUGEINT) * w_total
      < {P11_SAMPLE_K} * CAST(n_chars AS HUGEINT) * 1000000000
"""


#: Candidate width for edit-distance dedup: long-run candidates are
#: near-verbatim, so a small absolute edit budget separates true
#: near-dups from coincidental run sharing.
EDIT_DIST_MAX = 80


def d11_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup with EXACT edit-distance verification: candidate
    pairs from the shared long-run index (d09 — bounded, never
    O(n²)), then levenshtein on the candidate pair's full texts via
    one join-back. The candidate set is duplicate-bounded, so the
    O(len²) edit-distance work runs on a tiny fraction of the corpus
    — the standard sieve: cheap blocking first, exact verify second.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    cand = dedup.shared_ngram_pairs(docs, n=LONGRUN_N).select("a_id", "b_id")
    # Join-back direction matters at scale: join the candidate list
    # (duplicate-DEPENDENT size, and text-weighted once `_ta` is
    # attached) against the corpus scan, but leave the strategy to
    # AQE — a forced broadcast of candidate full texts OOMs on a
    # duplicate-heavy corpus, while AQE still broadcasts when the
    # candidate set is genuinely small.
    with_a = docs.select(
        col("doc_id").alias("a_id"), col("text").alias("_ta")
    ).join(cand, "a_id")
    scored = docs.select(
        col("doc_id").alias("b_id"), col("text").alias("_tb")
    ).join(with_a, "b_id").withColumn(
        "edit_dist", F.levenshtein("_ta", "_tb").cast("long")
    )
    return scored.filter(col("edit_dist") <= EDIT_DIST_MAX).select(
        "a_id", "b_id", "edit_dist"
    )


# ORACLE_D11 is defined after ORACLE_D09 below (it embeds the d09
# candidate SQL as a CTE).


def p10_leakproof_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: hash-range assignment
    keyed on each document's dedup CLUSTER id (its own id when it has
    no near-dups), so near-duplicate documents can never straddle a
    split boundary — the leakage mode a plain per-doc split
    (p06/dataset_split) cannot prevent. Composition: d06's connected
    components → join the cluster map onto the corpus (size =
    near-dup doc count, data-dependent, so no broadcast hint — AQE
    chooses at runtime) → the same deterministic hash-range CASE as
    dataset_split, on the canonical id.

    Output: (split, n_docs, n_clusters) — the no-straddle invariant
    itself is asserted in tests/test_pipeline_ops.py.
    """
    from pyspark.sql.functions import col

    from llamadb_spark.operators.sampling import bucket_hash

    docs = _docs(spark, sf_dir)
    pairs = dedup.jaccard_ngram_pairs(
        docs, threshold=JACCARD_THRESHOLD, stop_shingle_df=STOP_SHINGLE_DF
    ).select("a_id", "b_id")
    cc = dedup.connected_components(pairs).select(
        col("node").alias("doc_id"), "cluster_id"
    )
    labeled = docs.select("doc_id").join(cc, "doc_id", "left")
    canonical = F.coalesce(col("cluster_id"), col("doc_id"))
    b = bucket_hash(canonical)
    split = (
        F.when(b < 800, "train").when(b < 900, "val").otherwise("test")
    )
    return (
        labeled.select(split.alias("split"), canonical.alias("_canon"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_canon").alias("n_clusters"),
        )
        .orderBy("split")
    )


ORACLE_P10 = f"""
WITH cc AS ({ORACLE_D06}),
labeled AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS canon
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
),
assigned AS (
  SELECT canon,
         CASE WHEN ((canon % 100003) * 2654435761) % 1000 < 800 THEN 'train'
              WHEN ((canon % 100003) * 2654435761) % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split
  FROM labeled
)
SELECT split, count(*) AS n_docs, count(DISTINCT canon) AS n_clusters
FROM assigned
GROUP BY split
ORDER BY split
"""


def d10_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as d06 (near-dup pairs → min-id component
    labels) computed by the alternating large-star/small-star
    algorithm instead of min-label propagation — hash-matching the
    SAME recursive-CTE oracle proves the two distributed algorithms
    agree on real data, not just unit graphs."""
    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    return dedup.connected_components_star(pairs)


CHUNK_BYTES = 512


def m05_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup over raw payload bytes
    (multimodal.dedup_media). The envelope payload IS the UTF-8 text
    bytes, so DuckDB's sha256(text) digests the same bytes and the
    check is a full hash-match without a blob-hash function."""
    env = multimodal.attach_payload(_docs(spark, sf_dir))
    return multimodal.dedup_media(env)


ORACLE_M05 = """
SELECT sha256(text) AS payload_sha,
       min(doc_id) AS keep_id,
       count(*) AS n_copies,
       CAST(min(octet_length(encode(text))) AS INT) AS n_bytes
FROM documents
GROUP BY sha256(text)
"""


def m04_payload_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window binary chunking (operators/multimodal.py
    chunk_payload). DuckDB has no blob slicing, so the oracle checks
    the framing — every (doc, chunk_idx, chunk_len) — arithmetically;
    chunk CONTENT (sha + exact reconstruction) is byte-asserted in
    tests/test_multimodal.py."""
    env = multimodal.attach_payload(_docs(spark, sf_dir))
    return multimodal.chunk_payload(env, chunk_bytes=CHUNK_BYTES).select(
        "doc_id", "chunk_idx", "chunk_len"
    )


ORACLE_M04 = f"""
WITH env AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
),
idx AS (
  SELECT doc_id, n_bytes,
         unnest(generate_series(0,
             CAST(ceil(n_bytes / {CHUNK_BYTES}.0) AS BIGINT) - 1)) AS chunk_idx
  FROM env WHERE n_bytes > 0
)
SELECT doc_id, chunk_idx,
       least(CAST({CHUNK_BYTES} AS BIGINT),
             n_bytes - chunk_idx * {CHUNK_BYTES}) AS chunk_len
FROM idx
"""


def t14_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.unigram_logprob(_docs(spark, sf_dir))


ORACLE_T14 = r"""
WITH toks AS (
  SELECT doc_id, t.tok AS token
  FROM documents,
       unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                          x -> x <> '')) AS t(tok)
),
counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
probs AS (
  SELECT token, c / CAST((SELECT sum(c) FROM counts) AS DOUBLE) AS p
  FROM counts
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(p)), 6) AS avg_logprob
FROM toks JOIN probs USING (token)
GROUP BY doc_id
"""


def t16_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.bigram_logprob(_docs(spark, sf_dir))


ORACLE_T16 = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
bis AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram, t[i] AS w1
  FROM toks, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
cab AS (SELECT bigram, count(*) AS c_ab FROM bis GROUP BY 1),
ca AS (SELECT w1, count(*) AS c_a FROM bis GROUP BY 1),
probs AS (
  SELECT bigram, c_ab / CAST(c_a AS DOUBLE) AS p
  FROM cab JOIN ca ON ca.w1 = string_split(cab.bigram, ' ')[1]
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(ln(p)), 6) AS avg_logprob
FROM bis JOIN probs USING (bigram)
GROUP BY doc_id
"""


RERANK_COARSE_MULT = 4


def s11_rerank_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: int8 coarse scoring → exact cosine
    re-rank of k·4 candidates (see similarity.rerank_knn)."""
    return similarity.rerank_knn(
        _emb(spark, sf_dir),
        KNN_QUERY_IDS,
        k=KNN_K,
        coarse_mult=RERANK_COARSE_MULT,
    )


ORACLE_S11 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
quant AS (
  SELECT vec_id, v,
         CASE WHEN list_aggregate(list_transform(v, x -> abs(x)), 'max') > 0
              THEN list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
              ELSE 1.0 END AS scale,
         list_transform(v, x ->
           CAST(floor(x / (CASE WHEN list_aggregate(list_transform(v, y -> abs(y)), 'max') > 0
                                THEN list_aggregate(list_transform(v, y -> abs(y)), 'max') / 127.0
                                ELSE 1.0 END) + 0.5) AS DOUBLE)) AS q
  FROM e
),
queries AS (
  SELECT vec_id AS query_id, v AS q_v, scale AS q_scale, q AS q_q
  FROM quant WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})
),
coarse AS (
  SELECT qs.query_id, c.vec_id, c.v, qs.q_v,
         c.scale * qs.q_scale * list_dot_product(c.q, qs.q_q) AS approx,
         row_number() OVER (
             PARTITION BY qs.query_id
             ORDER BY c.scale * qs.q_scale * list_dot_product(c.q, qs.q_q) DESC,
                      c.vec_id) AS crk
  FROM quant c, queries qs
  WHERE c.vec_id <> qs.query_id
),
exact AS (
  SELECT query_id, vec_id AS neighbor_id,
         round(list_cosine_similarity(v, q_v), 6) AS cos
  FROM coarse WHERE crk <= {KNN_K} * {RERANK_COARSE_MULT}
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM exact
) WHERE rank <= {KNN_K}
"""


ZIPF_TOP_N = 100


def t17_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-100 token frequencies: OLS slope of
    ln(freq) against ln(rank). Natural-language corpora sit near
    slope -1; a corpus drifting toward 0 is template/boilerplate
    heavy, steeper than -1.2 means a truncated/duplicated head — a
    one-number corpus-health gauge (Zipf 1949; used as a quality
    probe in corpus curation).

    One token-count aggregation (map-side combined), a DISTRIBUTED
    top-100 (orderBy+limit plans as TakeOrdered — per-partition
    heaps, never a vocabulary-sized single-partition sort; a global
    row_number window here would funnel the whole vocab through one
    task at 100 TB), then a rank window over just the 100 survivors
    and regr_slope/regr_r2 — all JVM built-ins.
    """
    from pyspark.sql.window import Window

    from llamadb_spark.functions.text import tokens

    toks = _docs(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    top100 = counts.orderBy(F.col("c").desc(), F.col("token")).limit(ZIPF_TOP_N)
    w = Window.orderBy(F.col("c").desc(), F.col("token"))
    top = top100.withColumn("rank", F.row_number().over(w))
    return top.agg(
        F.count(F.lit(1)).alias("n_fit"),
        F.round(
            F.expr("regr_slope(ln(c), ln(rank))"), 6
        ).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(c), ln(rank))"), 6).alias("fit_r2"),
    )


ORACLE_T17 = rf"""
WITH toks AS (
  SELECT t.tok AS token
  FROM documents,
       unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                          x -> x <> '')) AS t(tok)
),
counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank
  FROM counts QUALIFY rank <= {ZIPF_TOP_N}
)
SELECT count(*) AS n_fit,
       round(regr_slope(ln(c), ln(rank)), 6) AS zipf_slope,
       round(regr_r2(ln(c), ln(rank)), 6) AS fit_r2
FROM top
"""


KEYWORDS_PER_DOC = 3


def t15_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-k tokens by TF-IDF
    within each document (rarity-weighted salience — the zero-model
    keyword baseline). One explode → tf counts, a df-table join, then
    a per-doc window rank. Deterministic tiebreak on the token string
    so retries can't flip keywords.

    Scale: the df table is the FULL corpus vocabulary — billions of
    distinct tokens at 100 TB (typos, numerals, code) — so it is
    never broadcast-hinted; the tf↔df join shuffles on token (both
    sides already derive from the same explode) and AQE can still
    broadcast when the vocabulary is genuinely small. Only the
    one-row n_docs scalar keeps an explicit broadcast. Contrast
    tfidf_topk (textops.py), whose df table is query-term-bounded
    and therefore safely hinted.

    Output: (doc_id, kw_rank, token, tfidf).
    """
    from pyspark.sql.functions import broadcast, col
    from pyspark.sql.window import Window

    from llamadb_spark.functions.text import tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens(col("text"))).alias("token")
    ).filter(col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_tab, "token")
        .crossJoin(broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(col("tf") * F.log((col("n_docs") + 1) / (col("df") + 1)), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        col("tfidf").desc(), col("token")
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w).cast("long"))
        .filter(col("kw_rank") <= KEYWORDS_PER_DOC)
        .select("doc_id", "kw_rank", "token", "tfidf")
    )


ORACLE_T15 = rf"""
WITH toks AS (
  SELECT doc_id, t.tok AS token
  FROM documents,
       unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                          x -> x <> '')) AS t(tok)
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfs AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token,
         round(tf * ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dfs USING (token) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS kw_rank
  FROM scored
)
SELECT doc_id, kw_rank, token, tfidf
FROM ranked WHERE kw_rank <= {KEYWORDS_PER_DOC}
"""


T13_SUPPORT = 0.02


def t13_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based heavy hitters with a driver-attestable contract:
    the output is the EXACT heavy-hitter set (token + exact count,
    both DuckDB-recomputable) plus an ``in_sketch`` boolean per row —
    the sketch's one-sided guarantee (every token with frequency >
    support IS surfaced) becomes the hash-matched value. The oracle
    recomputes the exact set and claims TRUE; a missed heavy hitter
    flips the boolean and fails the hash. False positives riding
    along in the sketch are permitted by the guarantee and don't
    appear in the output."""
    from pyspark.sql.functions import broadcast, col

    from llamadb_spark.functions.text import tokens

    docs = _docs(spark, sf_dir)
    cand = textops.heavy_hitter_tokens(docs, support=T13_SUPPORT)
    tok = docs.select(F.explode(tokens(col("text"))).alias("token")).filter(
        col("token") != ""
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    total = counts.agg(F.sum("exact_count").alias("total"))
    heavy = counts.crossJoin(broadcast(total)).filter(
        col("exact_count") > T13_SUPPORT * col("total")
    )
    return (
        heavy.join(
            cand.withColumn("in_sketch", F.lit(True)), "token", "left"
        )
        .select(
            "token",
            "exact_count",
            F.coalesce("in_sketch", F.lit(False)).alias("in_sketch"),
        )
    )


ORACLE_T13 = rf"""
WITH toks AS (
  SELECT t.tok AS token
  FROM documents,
       unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                          x -> x <> '')) AS t(tok)
),
cnt AS (SELECT token, count(*) AS exact_count FROM toks GROUP BY token),
tot AS (SELECT sum(exact_count) AS total FROM cnt)
SELECT token, exact_count, TRUE AS in_sketch
FROM cnt CROSS JOIN tot
WHERE exact_count > {T13_SUPPORT} * total
"""


#: Long-run width for exact substring-style dedup: 8 consecutive
#: shared words ≈ verbatim copying in the synthetic corpus (6 and 8
#: find the same 25 exact-dup pairs; 4 starts catching boilerplate).
LONGRUN_N = 8


def d09_shared_longrun(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.shared_ngram_pairs(_docs(spark, sf_dir), n=LONGRUN_N)


ORACLE_D09 = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, k, k + {LONGRUN_N - 1}), ' ') AS shingle
  FROM (
    SELECT doc_id, tk,
           unnest(generate_series(1, len(tk) - {LONGRUN_N - 1})) AS k
    FROM toks WHERE len(tk) >= {LONGRUN_N}
  )
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


ORACLE_D11 = rf"""
WITH cand AS ({ORACLE_D09}),
scored AS (
  SELECT a_id, b_id,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
  FROM cand
  JOIN documents da ON da.doc_id = a_id
  JOIN documents db ON db.doc_id = b_id
)
SELECT a_id, b_id, edit_dist FROM scored WHERE edit_dist <= {EDIT_DIST_MAX}
"""


def s08_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embed_dim_stats(_emb(spark, sf_dir))


ORACLE_S08 = """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT CAST(k - 1 AS BIGINT) AS dim, v[k] AS x
  FROM (SELECT v, unnest(generate_series(1, len(v))) AS k FROM e)
)
SELECT dim, round(avg(x), 6) AS mean, round(var_pop(x), 6) AS var,
       round(min(x), 6) AS lo, round(max(x), 6) AS hi
FROM x GROUP BY dim
"""


#: s09 bands: a k=8 orthonormal projection can only contract norms,
#: and on these near-isotropic embeddings the top-8 components carry
#: well above an isotropic share of the variance. Both measured with
#: wide margin at sf0.001-0.1; eigensolves are deterministic for
#: fixed data.
S09_K = 8
S09_MIN_EXPLAINED = 0.2


def s09_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection with a driver-attestable banded contract: one
    row per vector with the exact-computable original norm (DuckDB
    recomputes it from the embedding list) plus the projection
    invariants as booleans — the projected norm never exceeds the
    original (orthonormal basis = contraction), the output has
    exactly k components, and the k-dim subspace explains at least
    S09_MIN_EXPLAINED of total variance (corpus-level boolean,
    computed without a global window). Eigenvector SIGN is
    implementation-defined, so raw coordinates are not oracle
    material; norms are sign-invariant. Raw projections stay
    available via operators/similarity.pca_project."""
    from pyspark.sql.functions import broadcast, col

    emb = _emb(spark, sf_dir)
    proj = similarity.pca_project(emb, k=S09_K)
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    both = proj.join(
        emb.select(
            "vec_id", col("embedding").cast("array<double>").alias("_v")
        ),
        "vec_id",
    ).select(
        "vec_id",
        sq(col("_v")).alias("_on2"),
        sq(col("pc")).alias("_pn2"),
        F.size("pc").alias("_k"),
    )
    tot = both.agg(
        F.sum("_pn2").alias("_tp"), F.sum("_on2").alias("_to")
    )
    return both.alias("b").crossJoin(broadcast(tot.alias("t"))).select(
        col("b.vec_id").alias("vec_id"),
        F.round(F.sqrt(col("b._on2")), 6).alias("orig_norm"),
        (F.sqrt(col("b._pn2")) <= F.sqrt(col("b._on2")) + 1e-9).alias(
            "proj_contracts"
        ),
        (col("b._k") == S09_K).alias("k_dims_ok"),
        (col("t._tp") >= S09_MIN_EXPLAINED * col("t._to")).alias(
            "explained_ok"
        ),
    )


ORACLE_S09 = """
SELECT vec_id,
       round(sqrt(list_aggregate(
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6)
         AS orig_norm,
       TRUE AS proj_contracts,
       TRUE AS k_dims_ok,
       TRUE AS explained_ok
FROM embeddings
"""


S10_K = 10


def _mean_pairwise_cos(picks: DataFrame, emb: DataFrame) -> DataFrame:
    """1-row frame: mean pairwise cosine among the k picked vectors.
    Both sides of the pair join are k-bounded (k(k-1)/2 pairs), so
    they are broadcast — the non-equi pair join becomes a shuffle-
    free BroadcastNestedLoop over k rows instead of inheriting the
    session's shuffle partitioning."""
    from pyspark.sql.functions import broadcast, col

    from llamadb_spark.operators.similarity import cosine

    v = emb.select("vec_id", col("embedding").cast("array<double>").alias("v"))
    pv = v.join(broadcast(picks.select("vec_id")), "vec_id")
    a = pv.select(col("vec_id").alias("ia"), col("v").alias("va"))
    b = pv.select(col("vec_id").alias("ib"), col("v").alias("vb"))
    return (
        a.join(broadcast(b), col("ia") < col("ib"))
        .select(cosine(col("va"), col("vb")).alias("c"))
        .agg(F.avg("c").alias("mean_cos"))
    )


def s10_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking with a driver-attestable contract: a single
    summary row whose exact columns the oracle recomputes — the first
    MMR pick is by construction the pure-relevance argmax (exact
    top-1 by cosine to the query, ties to the lower vec_id) with its
    relevance — plus booleans attesting k picks were produced and the
    DIVERSITY property that justifies MMR: mean pairwise cosine among
    the MMR picks does not exceed that of the plain relevance top-k.
    The greedy loop itself stays available via
    operators/similarity.mmr_rerank (property tests in
    tests/test_similarity.py)."""
    from pyspark.sql.functions import broadcast, col

    emb = _emb(spark, sf_dir)
    # orderBy before limit: LIMIT without ORDER BY is not stable
    # across partition layouts, which would break the operator's
    # determinism contract.
    qv = [
        float(x)
        for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    mmr = similarity.mmr_rerank(emb, qv, k=S10_K, pool=100, lam=0.7)
    # plain relevance top-k (query vector included, like MMR's pool)
    from llamadb_spark.operators.similarity import cosine

    qcol = F.array(*[F.lit(float(x)) for x in qv])
    scored = emb.select(
        "vec_id",
        cosine(col("embedding").cast("array<double>"), qcol).alias("rel"),
    )
    topk = scored.orderBy(col("rel").desc(), "vec_id").limit(S10_K)
    mmr_div = _mean_pairwise_cos(mmr.select("vec_id"), emb)
    plain_div = _mean_pairwise_cos(topk.select("vec_id"), emb)
    first = mmr.orderBy("mmr_rank").limit(1).select(
        col("vec_id").alias("top_pick_id"),
        F.round("relevance", 6).alias("top_relevance"),
    )
    n = mmr.agg(F.count(F.lit(1)).alias("_n"))
    return (
        first.crossJoin(broadcast(n))
        .crossJoin(broadcast(mmr_div.select(col("mean_cos").alias("_md"))))
        .crossJoin(broadcast(plain_div.select(col("mean_cos").alias("_pd"))))
        .select(
            "top_pick_id",
            "top_relevance",
            col("_n").cast("long").alias("k_picked"),
            (col("_md") <= col("_pd") + 1e-9).alias("diversity_ok"),
        )
    )


ORACLE_S10 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
sc AS (SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS rel
       FROM e, q)
SELECT vec_id AS top_pick_id, rel AS top_relevance,
       CAST({S10_K} AS BIGINT) AS k_picked, TRUE AS diversity_ok
FROM sc ORDER BY rel DESC, vec_id LIMIT 1
"""


#: Corpus-mixing targets: cap the overrepresented languages, keep
#: everything else (de's target exceeds its count → keep-all arm).
MIXTURE_TARGETS = {"en": 100, "zh": 50, "de": 1000}


def p07_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing (operators/sampling.py mixture_sample):
    per-language keep thresholds derived from one count aggregate,
    broadcast back onto the corpus, applied with the deterministic
    key hash — reproducible at any cluster size, one corpus pass."""
    from llamadb_spark.operators.sampling import mixture_sample

    return mixture_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        target_counts=MIXTURE_TARGETS,
    )


ORACLE_P07 = f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
thresh AS (
  SELECT lang,
         least(1000, floor(1000.0 * CASE lang
             WHEN 'en' THEN {MIXTURE_TARGETS['en']}
             WHEN 'zh' THEN {MIXTURE_TARGETS['zh']}
             WHEN 'de' THEN {MIXTURE_TARGETS['de']}
             END / n)) AS t
  FROM counts
)
SELECT doc_id, d.lang AS lang
FROM documents d LEFT JOIN thresh USING (lang)
WHERE t IS NULL OR ((doc_id % 100003) * 2654435761) % 1000 < t
"""


def m06_media_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-gated media curation: decode (Arrow stub, dims
    sha-derived so DuckDB replicates them — the m02 oracle trick) →
    keep payloads with aspect ratio in [0.5, 2.0] and short side
    ≥ 256 px (the standard vision-pretraining gate) → bucket the
    survivors by megapixels and report counts + mean aspect.

    Scale: the filter runs on decoded METADATA only (12 bytes/row
    through the shuffle, payloads never leave the scan), and the
    aggregation is a 3-group map-side-combined rollup — the shape of
    a real corpus-curation pass over billions of images.
    """
    env = multimodal.attach_payload(_docs(spark, sf_dir))
    decoded = multimodal.decode_media(env)
    aspect = F.col("width") / F.col("height")
    mp = F.col("width") * F.col("height") / F.lit(1_000_000.0)
    kept = decoded.filter(
        (aspect >= 0.5)
        & (aspect <= 2.0)
        & (F.least("width", "height") >= 256)
    )
    bucket = (
        F.when(mp < 0.3, "small")
        .when(mp < 1.0, "medium")
        .otherwise("large")
    )
    return kept.groupBy(bucket.alias("mp_bucket")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg(aspect), 6).alias("avg_aspect"),
        F.round(F.sum(mp), 4).alias("total_mp"),
    )


ORACLE_M06 = """
WITH d AS (
  SELECT CAST(CAST(concat('0x', substr(sha256(text), 1, 4)) AS INT)
              % 1920 + 1 AS INT) AS width,
         CAST(CAST(concat('0x', substr(sha256(text), 5, 4)) AS INT)
              % 1080 + 1 AS INT) AS height
  FROM documents
),
kept AS (
  SELECT width, height,
         CAST(width AS DOUBLE) / height AS aspect,
         width * height / 1000000.0 AS mp
  FROM d
  WHERE CAST(width AS DOUBLE) / height BETWEEN 0.5 AND 2.0
    AND least(width, height) >= 256
)
SELECT CASE WHEN mp < 0.3 THEN 'small'
            WHEN mp < 1.0 THEN 'medium'
            ELSE 'large' END AS mp_bucket,
       count(*) AS n_items,
       round(avg(aspect), 6) AS avg_aspect,
       round(sum(mp), 4) AS total_mp
FROM kept
GROUP BY 1
"""


#: m07: media items acting as cross-modal queries (caller-bounded —
#: the broadcast-side contract of crossmodal_knn).
M07_QUERY_DOCS = [0, 1, 2, 3, 4]
M07_K = 5


def m07_crossmodal_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval plumbing: stub-embed a bounded set of
    media payloads into the text-embedding space (CLIP-image-tower
    stand-in — deterministic sha-chain features, unit norm) and
    retrieve each one's top-5 cosine neighbors from the embeddings
    corpus. rows-only: the stub features have no SQL twin;
    determinism/unit-norm/row-count invariants live in
    tests/test_multimodal.py.

    Scale order matters: the query FILTER runs before the Arrow
    embed stage, so only |query_ids| payloads ever cross to Python;
    the corpus streams once against the broadcast query vectors and
    the only shuffle is the k·|queries|-row top-k window.
    """
    from pyspark.sql.functions import col

    media = multimodal.attach_payload(_docs(spark, sf_dir)).filter(
        col("doc_id").isin(M07_QUERY_DOCS)
    )
    vecs = multimodal.embed_media_stub(media)
    out = multimodal.crossmodal_knn(
        vecs, _emb(spark, sf_dir), M07_QUERY_DOCS, k=M07_K
    )
    # driver-attestable banded contract: per media query, the oracle
    # recomputes the exact columns (query id, k neighbors returned)
    # and claims the cosine-validity band; the stub features
    # themselves have no SQL twin (determinism/unit-norm invariants
    # in tests/test_multimodal.py), so the attestation covers the
    # retrieval plumbing: every query produced exactly k DISTINCT
    # corpus neighbors with cosines in [-1, 1].
    return out.groupBy(col("media_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        (F.count_distinct(col("neighbor_id")) == M07_K).alias(
            "neighbors_distinct"
        ),
        ((F.min("cos") >= -1.0) & (F.max("cos") <= 1.0)).alias(
            "cos_bounded"
        ),
    )


ORACLE_M07 = f"""
SELECT doc_id AS media_id,
       CAST({M07_K} AS BIGINT) AS n_neighbors,
       TRUE AS neighbors_distinct,
       TRUE AS cos_bounded
FROM documents
WHERE doc_id IN ({", ".join(str(i) for i in M07_QUERY_DOCS)})
"""


#: p17: temperature exponent + doc budget for α-smoothed sampling.
P17_ALPHA = 0.7
P17_BUDGET = 300


def p17_alpha_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed multilingual sampling (the mBERT/XLM-R
    mixture scheme): target share of language l ∝ (raw share)^α with
    α<1, so low-resource languages are upsampled relative to their
    raw mass and high-resource ones capped — then a doc budget turns
    shares into per-language keep rates applied with the repo's
    deterministic hash draw. Report per language: raw vs kept counts
    and raw vs target share.

    Determinism discipline (d16/p12): smoothed weights are quantized
    to integer nano-units BEFORE normalizing, and keep thresholds
    come from pure BIGINT division — no partition-order double sums,
    no cross-engine floor flips. Scale: two n_langs-row aggregates
    broadcast onto one corpus pass; the final report is an
    n_langs-group rollup.
    """
    from pyspark.sql.functions import col

    from llamadb_spark.operators.sampling import bucket_hash

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # the scalar totals derive from `counts` itself, so each
    # crossJoin is a self-join by lineage — qualified aliases keep
    # column resolution unambiguous under Spark's self-join detection
    total = counts.agg(F.sum("n").alias("n_total"))
    w = (
        counts.alias("c")
        .crossJoin(F.broadcast(total.alias("t")))
        .select(
            col("c.lang").alias("lang"),
            col("c.n").alias("n"),
            col("t.n_total").alias("n_total"),
            F.floor(
                F.lit(1e9)
                * F.pow(col("c.n") / col("t.n_total"), F.lit(P17_ALPHA))
            )
            .cast("long")
            .alias("wq"),
        )
    )
    wsum = w.agg(F.sum("wq").alias("sumwq"))
    th = (
        w.alias("w")
        .crossJoin(F.broadcast(wsum.alias("s")))
        .selectExpr(
            "w.lang AS lang",
            "w.n AS n",
            "w.n_total AS n_total",
            "w.wq AS wq",
            "s.sumwq AS sumwq",
            f"least(CAST(1000 AS BIGINT), "
            f"(w.wq * {P17_BUDGET} * 1000) div (s.sumwq * w.n)) "
            f"AS _thresh",
        )
    )
    # one corpus pass: the n_langs-row threshold table broadcasts
    # onto docs and BOTH counts (raw + kept) come out of one agg —
    # no join-back between derived frames
    flagged = docs.join(
        F.broadcast(th.select("lang", "_thresh", "n_total", "wq", "sumwq")),
        "lang",
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(
                F.when(
                    bucket_hash(col("doc_id")) < col("_thresh"), 1
                ).otherwise(0)
            ).alias("n_kept"),
            F.first("n_total").alias("_N"),
            F.first("wq").alias("_wq"),
            F.first("sumwq").alias("_sumwq"),
        )
        .select(
            "lang",
            "n_raw",
            "n_kept",
            F.round(col("n_raw") / col("_N"), 6).alias("raw_share"),
            F.round(col("_wq") / col("_sumwq"), 6).alias("target_share"),
        )
    )


ORACLE_P17 = f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT sum(n) AS n_total FROM counts),
w AS (
  SELECT lang, n, n_total,
         CAST(floor(1e9 * pow(n / CAST(n_total AS DOUBLE), {P17_ALPHA}))
              AS BIGINT) AS wq
  FROM counts CROSS JOIN tot
),
sw AS (SELECT sum(wq) AS sumwq FROM w),
th AS (
  SELECT lang, n, n_total, wq, sumwq,
         least(CAST(1000 AS BIGINT),
               (wq * {P17_BUDGET} * 1000) // (sumwq * n)) AS thresh
  FROM w CROSS JOIN sw
),
kc AS (
  SELECT d.lang, count(*) AS n_kept
  FROM documents d JOIN th ON th.lang = d.lang
  WHERE ((doc_id % 100003) * 2654435761) % 1000 < th.thresh
  GROUP BY d.lang
)
SELECT t.lang, t.n AS n_raw, coalesce(kc.n_kept, 0) AS n_kept,
       round(t.n / CAST(t.n_total AS DOUBLE), 6) AS raw_share,
       round(t.wq / CAST(t.sumwq AS DOUBLE), 6) AS target_share
FROM th t LEFT JOIN kc ON kc.lang = t.lang
"""


def p12_dup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware training weights: every exact-duplicate copy
    of a document gets weight 1/cluster_size, so each distinct text
    contributes exactly once to the training objective no matter how
    many times the crawl saw it ("count once" weighting — the soft
    alternative to dropping copies, and the form loss-reweighting
    pipelines actually consume). Per source: raw doc count vs the
    effective (deduplicated) document mass, and the dup tax.

    Scale: sha2 groupBy (the d01 shuffle, digest+count only), then
    the per-doc weight rides a sha-keyed join back onto (doc_id,
    source, sha) — both sides pre-projected; one final 5-group agg.

    Determinism: weights are summed as integer micro-units
    (floor(1e6/n_copies), exact longs — the d16/s14 discipline)
    because a double Σ(1/n) is partition-order dependent in the last
    ulp and a 6dp round of it can flip between runs/engines.
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.sha2("text", 256).alias("sha")
    )
    sizes = docs.groupBy("sha").agg(F.count(F.lit(1)).alias("n_copies"))
    weighted = docs.join(sizes, "sha").select(
        "source",
        F.floor(F.lit(1000000.0) / F.col("n_copies"))
        .cast("long")
        .alias("w_micro"),
    )
    return weighted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("w_micro") / 1e6, 6).alias("effective_docs"),
        F.round(
            F.lit(1.0) - F.sum("w_micro") / (F.lit(1e6) * F.count(F.lit(1))),
            6,
        ).alias("dup_tax"),
    )


ORACLE_P12 = """
WITH sized AS (
  SELECT source,
         CAST(floor(1000000.0 / count(*) OVER (PARTITION BY sha256(text)))
              AS BIGINT) AS w_micro
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(sum(w_micro) / 1000000.0, 6) AS effective_docs,
       round(1.0 - sum(w_micro) / (1000000.0 * count(*)), 6) AS dup_tax
FROM sized
GROUP BY source
"""


def t21_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap: Jaccard similarity of the
    DISTINCT token sets of every source pair — the redundancy
    diagnostic a corpus-mixing plan starts from (two crawls with 0.9
    vocabulary Jaccard contribute far less than their size suggests).

    Scale: one distinct over (source, token) — the only corpus-sized
    shuffle; the intersection self-join fans out per token only to
    the sources containing it (≤ n_sources rows a side), so pair
    volume is bounded by n_sources² per token, never doc-count². Per
    -source set sizes ride a broadcast join onto the ≤ n_sources²
    pair rows. Top-10 most-overlapping pairs, deterministic order.
    """
    from pyspark.sql.functions import broadcast, col

    tok = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(text_fns.tokens(col("text"))).alias("token"),
        )
        .filter(col("token") != "")
        .distinct()
    )
    tok = tok.localCheckpoint()  # two consumers: sizes + the self-join
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_tok"))
    a = tok.select(col("source").alias("src_a"), "token")
    b = tok.select(col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            broadcast(sizes.select(col("source").alias("src_a"), col("n_tok").alias("n_a"))),
            "src_a",
        )
        .join(
            broadcast(sizes.select(col("source").alias("src_b"), col("n_tok").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6
            ).alias("jaccard"),
        )
        .orderBy(col("jaccard").desc(), "src_a", "src_b")
        .limit(10)
    )


ORACLE_T21 = r"""
WITH tok AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
),
clean AS (SELECT source, token FROM tok WHERE token <> ''),
sizes AS (SELECT source, count(*) AS n_tok FROM clean GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM clean a JOIN clean b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       round(CAST(n_common AS DOUBLE)
             / (sa.n_tok + sb.n_tok - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY jaccard DESC, src_a, src_b
LIMIT 10
"""


def t22_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-drift diagnostic: Jensen-Shannon divergence between
    each source's unigram distribution and the whole-corpus
    distribution — the quantitative form of "does this crawl look
    like the rest of my data" (0 = identical mix, ln 2 = disjoint
    vocabularies). The metric mixture-rebalancing and dedup-budget
    decisions key off.

    Scale: token counts aggregate map-side; the per-source KL terms
    need every (source, vocab-token) cell, built as sources × vocab
    (|vocab|·n_sources rows — vocabulary-bounded like t14/t15, no
    broadcast hints, AQE picks the join strategy); one final
    per-source sum. All logs are JVM-side ln.
    """
    from pyspark.sql.functions import col

    tok = (
        _docs(spark, sf_dir)
        .select("source", F.explode(text_fns.tokens(col("text"))).alias("token"))
        .filter(col("token") != "")
    )
    tok = tok.localCheckpoint()  # consumers: per-source counts + vocab
    c_st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_st"))
    n_s = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    c_t = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c_t"))
    n_total = tok.count()

    # every (source, vocab token) cell: p may be 0 where a source
    # lacks a corpus token (its KL(P||M) term is 0); q is always > 0
    cells = (
        n_s.crossJoin(c_t)
        .join(c_st, ["source", "token"], "left")
        .select(
            "source",
            (F.coalesce(col("c_st"), F.lit(0)) / col("n_s")).alias("p"),
            (col("c_t") / F.lit(float(n_total))).alias("q"),
        )
        .withColumn("m", (col("p") + col("q")) / 2)
    )
    # Determinism (the d16/s14 discipline): per-cell KL terms are
    # quantized to integer micro-nats and summed as exact longs — a
    # double Σ over |vocab|·n_sources cells is partition-order
    # dependent in the last ulp, which can flip the 6dp round. The
    # per-cell term is a pure function of exact counts (identical
    # doubles both engines, ln agrees to ≤1 ulp), so the floor to a
    # 1e-6 grid is stable; the quantization shifts js by at most
    # |vocab|·5e-7, identically on both sides.
    kl_terms = cells.select(
        "source",
        F.floor(
            F.when(col("p") > 0, col("p") * F.log(col("p") / col("m")))
            .otherwise(F.lit(0.0))
            * 1e6
        )
        .cast("long")
        .alias("kl_p_u"),
        F.floor(col("q") * F.log(col("q") / col("m")) * 1e6)
        .cast("long")
        .alias("kl_q_u"),
    )
    return kl_terms.groupBy("source").agg(
        F.round((F.sum("kl_p_u") + F.sum("kl_q_u")) / 2e6, 6).alias(
            "js_divergence"
        )
    )


ORACLE_T22 = r"""
WITH tok AS (
  SELECT source,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
),
clean AS (SELECT source, token FROM tok WHERE token <> ''),
c_st AS (SELECT source, token, count(*) AS c_st FROM clean GROUP BY 1, 2),
n_s AS (SELECT source, count(*) AS n_s FROM clean GROUP BY 1),
c_t AS (SELECT token, count(*) AS c_t FROM clean GROUP BY 1),
tot AS (SELECT count(*) AS n FROM clean),
cells AS (
  SELECT n_s.source,
         coalesce(c_st.c_st, 0) / CAST(n_s.n_s AS DOUBLE) AS p,
         c_t.c_t / CAST(tot.n AS DOUBLE) AS q
  FROM n_s CROSS JOIN c_t CROSS JOIN tot
  LEFT JOIN c_st ON c_st.source = n_s.source AND c_st.token = c_t.token
),
terms AS (
  SELECT source,
         CAST(floor((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))
                          ELSE 0.0 END) * 1000000.0) AS BIGINT) AS kl_p_u,
         CAST(floor(q * ln(q / ((p + q) / 2)) * 1000000.0) AS BIGINT) AS kl_q_u
  FROM cells
)
SELECT source, round((sum(kl_p_u) + sum(kl_q_u)) / 2000000.0, 6)
       AS js_divergence
FROM terms
GROUP BY source
"""


def d15_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-family size distribution: how many near-dup clusters exist
    at each size — the diagnostic that distinguishes a corpus with a
    million pairwise dupes (size-2 families, crawl artifacts) from
    one dominated by a few giant boilerplate families (size-1000,
    template farms), which need different remediation. Two tiny
    aggregations on top of d06's component labels; oracled through
    the same recursive-CTE closure.
    """
    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    cc = dedup.connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(F.count(F.lit(1)).alias("n_clusters"))


ORACLE_D15 = rf"""
WITH cc AS (
  {ORACLE_D06}
),
sizes AS (SELECT cluster_id, count(*) AS size FROM cc GROUP BY cluster_id)
SELECT size, count(*) AS n_clusters FROM sizes GROUP BY size
"""


def p13_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorization of document lengths: clip n_chars
    at that language's [p05, p95] before computing summary stats —
    the outlier-robust preprocessing step for any length-based
    quality gate (one 10 MB html blob shouldn't drag a language's
    mean length). Exact percentiles per group via percentile_cont
    semantics, clip applied in the same pass via a broadcast-size
    bounds table (n_langs rows).

    Output per lang: n_docs, clipped mean/stddev, clip fractions.
    """
    from pyspark.sql.functions import broadcast, col

    docs = _docs(spark, sf_dir).select("lang", col("n_chars").cast("double"))
    bounds = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    clipped = docs.join(broadcast(bounds), "lang").select(
        "lang",
        F.greatest(F.least(col("n_chars"), col("hi")), col("lo")).alias("w"),
        (col("n_chars") < col("lo")).cast("int").alias("clip_lo"),
        (col("n_chars") > col("hi")).cast("int").alias("clip_hi"),
    )
    return clipped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("w"), 6).alias("mean_clipped"),
        F.round(F.stddev_pop("w"), 6).alias("std_clipped"),
        F.round(F.avg("clip_lo"), 6).alias("frac_clip_lo"),
        F.round(F.avg("clip_hi"), 6).alias("frac_clip_hi"),
    )


ORACLE_P13 = """
WITH d AS (SELECT lang, CAST(n_chars AS DOUBLE) AS n_chars FROM documents),
b AS (
  SELECT lang,
         percentile_cont(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
         percentile_cont(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
  FROM d GROUP BY lang
),
c AS (
  SELECT d.lang,
         greatest(least(n_chars, hi), lo) AS w,
         CASE WHEN n_chars < lo THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN n_chars > hi THEN 1 ELSE 0 END AS clip_hi
  FROM d JOIN b ON d.lang = b.lang
)
SELECT lang, count(*) AS n_docs,
       round(avg(w), 6) AS mean_clipped,
       round(stddev_pop(w), 6) AS std_clipped,
       round(avg(clip_lo), 6) AS frac_clip_lo,
       round(avg(clip_hi), 6) AS frac_clip_hi
FROM c
GROUP BY lang
"""


def t23_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility proxy per language: UTF-8 bytes per
    whitespace token — the compression-rate signal that decides how
    much raw text a language needs per training token (scripts that
    tokenize poorly burn budget). One scan, per-doc byte and token
    counts via built-ins, one per-language aggregate.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir)
    per_doc = docs.select(
        "lang",
        F.octet_length(F.encode(col("text"), "UTF-8")).alias("n_bytes"),
        F.size(F.filter(text_fns.tokens(col("text")), lambda x: x != "")).alias(
            "n_tok"
        ),
    ).filter(col("n_tok") > 0)
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.sum("n_bytes") / F.sum("n_tok"), 6).alias(
            "bytes_per_token"
        ),
    )


ORACLE_T23 = r"""
WITH per_doc AS (
  SELECT lang,
         octet_length(encode(text)) AS n_bytes,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS n_tok
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(sum(n_bytes) / CAST(sum(n_tok) AS DOUBLE), 6) AS bytes_per_token
FROM per_doc
WHERE n_tok > 0
GROUP BY lang
"""


#: Data-loader shard count for the p14 balance report.
P14_N_SHARDS = 16


def p14_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment + balance report: every document is
    deterministically hashed to one of N loader shards and the report
    shows per-shard doc/token mass — the check that no data-loader
    worker starves or hotspots (skew here directly serializes a
    training run). Hash sharding is reproducible across runs and
    cluster sizes (same contract as the p06 split).

    Scale: one scan, one N-group aggregate; the token count is the
    t03 whitespace contract.
    """
    from pyspark.sql.functions import col

    from llamadb_spark.operators.sampling import bucket_hash

    docs = _docs(spark, sf_dir)
    shard = bucket_hash(col("doc_id"), buckets=P14_N_SHARDS).alias("shard")
    n_tok = F.size(F.filter(text_fns.tokens(col("text")), lambda x: x != ""))
    return (
        docs.select(shard, n_tok.alias("n_tok"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


ORACLE_P14 = rf"""
WITH d AS (
  SELECT ((doc_id % 100003) * 2654435761) % {P14_N_SHARDS} AS shard,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS n_tok
  FROM documents
)
SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM d GROUP BY shard
"""


#: p15: whitespace-token budget for the selected corpus — fixed
#: absolute so the cut bites harder as SF grows (top ~50% at
#: sf0.001, top ~5% at sf0.01), exactly how a real token budget
#: behaves against a growing crawl.
P15_TOKEN_BUDGET = 50_000


def p15_token_budget_select(
    spark: SparkSession, sf_dir: str, token_counter: str = "ws"
) -> DataFrame:
    """Token-budget corpus selection: keep the highest-quality
    documents whose cumulative token count fits a fixed training
    budget — the "I can afford N tokens, which docs make the cut"
    decision every pretraining data plan ends with. Selection is
    the maximal prefix of the quality-descending order (t02's quality
    score, doc_id tie-break) whose running token total stays within
    budget; reported per source (where the surviving mass comes
    from).

    ``token_counter``: the budget currency — "ws" (default, the
    DuckDB-oracled contract: whitespace tokens) or "bpe" (exact BPE
    counts via operators/bpe.py — what a training run actually
    spends; VERDICT r08 #2). The candidate ORDER is currency-
    independent, so the two selections are nested prefixes.

    Scale: the running total comes from operators/ranking.py
    distributed_cumsum — range-repartition on the order + per-
    partition window + partition-count-bounded offsets — NOT a
    global-order window, which would single-task the whole corpus
    (the e20 hazard, audited suite-wide). One scan for scoring, one
    range shuffle, one final ≤n_sources-group aggregate; the bpe
    variant adds the vocab-bounded encode + one word-keyed join.
    """
    from pyspark.sql.functions import col

    from llamadb_spark.operators.ranking import distributed_cumsum

    docs = _docs(spark, sf_dir)
    scored = textops.quality_score(docs).select(
        "doc_id", "n_tokens", "quality"
    )
    base = scored.join(docs.select("doc_id", "source"), "doc_id")
    if token_counter == "bpe":
        from llamadb_spark.operators.bpe import bpe_token_counts

        bt = bpe_token_counts(docs).select(
            "doc_id", col("bpe_tokens").alias("budget_tokens")
        )
        base = base.join(bt, "doc_id").drop("n_tokens")
    else:
        base = base.withColumnRenamed("n_tokens", "budget_tokens")
    cum = distributed_cumsum(
        base,
        [col("quality").desc(), col("doc_id").asc()],
        "budget_tokens",
        out_col="cum_tokens",
    )
    return (
        cum.filter(col("cum_tokens") <= P15_TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_selected"),
            F.sum("budget_tokens").alias("tokens_selected"),
        )
    )


ORACLE_P15 = rf"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE) AS n_dis,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), {_EN})) AS DOUBLE) AS hits
  FROM documents
),
q AS (
  SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tokens,
         round((n_dis / n_tok) * least(1.0, n_tok / 100.0)
               * (1 - n_punct / n_chars)
               * (0.5 + 0.5 * least(1.0, 4 * hits / n_dis)), 6) AS quality
  FROM d
),
c AS (
  SELECT source, n_tokens,
         sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM q
)
SELECT source, count(*) AS n_docs_selected,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_selected
FROM c WHERE cum_tokens <= {P15_TOKEN_BUDGET}
GROUP BY source
"""


#: p16: per-source epoch multipliers — the mixture weights a
#: pretraining run actually trains with (>1 = upsample by repetition,
#: <1 = deterministic subsample, absent = 1.0 pass-through).
P16_EPOCHS = {"src0": 2.5, "src1": 0.25, "src2": 1.75, "src3": 3.0}


def p16_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixture materialization: emit each document
    floor(m) times plus one more copy with probability frac(m), where
    m is its source's epoch multiplier — how "wiki × 3.2 epochs, web
    × 0.8" becomes an actual training manifest. The fractional draw
    is the repo's deterministic doc_id hash (the p06/p14 contract),
    so retries and reruns materialize the identical corpus. Output:
    the manifest rows (doc_id, source, copy_id).

    Scale: no join and no shuffle at all — a literal CASE for the
    multiplier, one hash, one explode whose fan-out is bounded by
    ceil(max multiplier) (a small constant); the manifest streams
    straight to the sink. Down-sampled sources (m < 1) drop docs by
    the same hash, so a source's keep-set is stable as m grows.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    m = F.lit(1.0)
    for src, mult in P16_EPOCHS.items():
        m = F.when(col("source") == src, F.lit(float(mult))).otherwise(m)
    draw = ((col("doc_id") % 100003) * 2654435761) % 1000000
    whole = F.floor(m).cast("long")
    frac = m - F.floor(m)
    n_copies = whole + F.when(draw < frac * 1e6, 1).otherwise(0)
    return (
        docs.withColumn("n_copies", n_copies)
        .filter(col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("long"), col("n_copies")))
            .alias("copy_id"),
        )
    )


def _p16_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {m}" for s, m in P16_EPOCHS.items()
    )
    return f"CASE source {arms} ELSE 1.0 END"


ORACLE_P16 = f"""
WITH d AS (
  SELECT doc_id, source,
         {_p16_case_sql()} AS m,
         ((doc_id % 100003) * 2654435761) % 1000000 AS draw
  FROM documents
),
c AS (
  SELECT doc_id, source,
         CAST(floor(m) AS BIGINT)
         + CASE WHEN draw < (m - floor(m)) * 1000000 THEN 1 ELSE 0 END AS n
  FROM d
)
SELECT doc_id, source,
       unnest(generate_series(1, n)) AS copy_id
FROM c WHERE n > 0
"""


def s13_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: nearest neighbors restricted to the
    query's OWN label (metadata pre-filter + ANN — "similar items in
    the same category", the retrieval shape recommendation and RAG
    systems actually serve). The filter applies BEFORE scoring, so
    the result is exact within the filtered corpus — not a post-hoc
    filter of top-k from everywhere, which under-fills k for rare
    labels.

    Scale: the label equi-join IS the pre-filter (queries are a
    broadcast-size set; each scores only its label's partition of
    the corpus) — a selective filter shrinks compute proportionally,
    the property a post-filter ANN lacks.
    """
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    from llamadb_spark.functions.vector import as_double, cosine

    emb = _emb(spark, sf_dir)
    q = emb.filter(col("vec_id").isin(KNN_QUERY_IDS)).select(
        col("vec_id").alias("query_id"),
        as_double(col("embedding")).alias("q_v"),
        col("label").alias("q_label"),
    )
    c = emb.select(
        col("vec_id").alias("neighbor_id"),
        as_double(col("embedding")).alias("c_v"),
        col("label").alias("c_label"),
    )
    scored = (
        F.broadcast(q)
        .join(c, col("q_label") == col("c_label"))
        .filter(col("neighbor_id") != col("query_id"))
        .withColumn("cos", F.round(cosine(col("q_v"), col("c_v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        col("cos").desc(), col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= KNN_K)
        .select("query_id", col("q_label").alias("label"), "neighbor_id", "cos", "rank")
    )


ORACLE_S13 = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label, v AS q_v FROM e
      WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})),
scored AS (
  SELECT q.query_id, q.label, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q_v, e.v), 6) AS cos
  FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.query_id
)
SELECT query_id, label, neighbor_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) t WHERE rank <= {KNN_K}
"""


#: Lower bound for the d16 similarity sweep — spans BELOW the
#: production JACCARD_THRESHOLD (0.12) so the curve shows both sides
#: of the chosen operating point.
D16_MIN_J = 0.05


def d16_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold tuning curve: near-dup pair counts per
    0.1-wide Jaccard band from 0.3 up — ONE pass at the lowered
    threshold instead of re-running dedup per candidate threshold.
    The curve is how the production threshold gets chosen (the knee
    where pair volume explodes marks where 'near-dup' stops meaning
    duplication and starts meaning topical similarity).
    """
    from pyspark.sql.functions import col

    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=D16_MIN_J,
        stop_shingle_df=STOP_SHINGLE_DF,
    )
    bucket = F.round(F.floor(col("jaccard") * 10) / 10, 1)
    # sum in integer micro-jaccards: float averaging is partition-
    # order dependent in the last ulp, which flips a 6dp round on
    # boundary values — integers can't
    micro = F.round(col("jaccard") * 1_000_000).cast("bigint")
    return pairs.groupBy(bucket.alias("j_band")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(micro).alias("sum_j_micros"),
    )


ORACLE_D16 = f"""
WITH pairs AS (
{ORACLE_D02.replace(f">= {JACCARD_THRESHOLD}", f">= {D16_MIN_J}")}
)
SELECT round(floor(jaccard * 10) / 10, 1) AS j_band,
       count(*) AS n_pairs,
       CAST(sum(CAST(round(jaccard * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_j_micros
FROM pairs GROUP BY 1
"""

# the sweep oracle must really carry the lowered threshold — a silent
# failed replace would diverge from the Spark side's D16_MIN_J
assert f">= {D16_MIN_J}" in ORACLE_D16


def t24_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-band census (the CCNet bucketing step): documents
    and token mass per 0.25-nat band of unigram log-prob — the table
    a quality-filtered training mix is budgeted from ("keep the top
    two bands, sample the middle, drop the tail"). Bands come from
    t14's per-doc scores; both engines round scores to 6dp first, so
    band edges agree exactly.
    """
    from pyspark.sql.functions import col

    scored = textops.unigram_logprob(_docs(spark, sf_dir))
    band = F.round(F.floor(col("avg_logprob") * 4) / 4, 2)
    return scored.groupBy(band.alias("lp_band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


ORACLE_T24 = f"""
WITH scored AS (
{ORACLE_T14}
)
SELECT round(floor(avg_logprob * 4) / 4, 2) AS lp_band,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM scored GROUP BY 1
"""


def s14_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-silhouette per label: for each vector, a = euclidean
    distance to its OWN label centroid, b = distance to the nearest
    OTHER centroid, silhouette = (b−a)/max(a,b) — the standard "are
    these classes actually separated in embedding space" score
    (negative mean ⇒ the label's members sit closer to another
    class's prototype than their own: a labeling or embedding
    problem). The centroid form is the O(N·k) approximation of full
    silhouette's O(N²) pairwise distances — the only version that
    scales.

    Determinism: centroids are rounded to 6dp in BOTH engines before
    any distance (the s05 contract), and per-vector silhouettes sum
    as integer micro-units (the d16 rule) so partition order can't
    flip the mean.

    Scale: one k-row broadcast (the packed centroid table) against
    the corpus → N·k distance rows → per-label aggregate.
    """
    from pyspark.sql.functions import broadcast, col

    emb = _emb(spark, sf_dir)
    cents = (
        similarity.label_centroids(emb)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s["centroid"],
            ).alias("cv")
        )
        .select(col("label").alias("c_label"), "cv")
    )
    v = emb.select(
        "vec_id", "label",
        F.transform(col("embedding"), lambda x: x.cast("double")).alias("ev"),
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(col("ev"), col("cv"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dists = v.crossJoin(broadcast(cents)).select(
        "vec_id", "label", "c_label", dist.alias("d")
    )
    ab = dists.groupBy("vec_id", "label").agg(
        F.min(F.when(col("c_label") == col("label"), col("d"))).alias("a"),
        F.min(F.when(col("c_label") != col("label"), col("d"))).alias("b"),
    )
    sil_micro = F.round(
        1_000_000.0 * (col("b") - col("a")) / F.greatest("a", "b")
    ).cast("bigint")
    return ab.select("label", sil_micro.alias("sm")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("sm") / 1_000_000.0 / F.count(F.lit(1)), 4).alias(
            "mean_silhouette"
        ),
    )


ORACLE_S14 = """
WITH cent AS (
  SELECT label, CAST(i - 1 AS BIGINT) AS dim, round(avg(x), 6) AS c
  FROM (
    SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  )
  GROUP BY 1, 2
),
cent_arr AS (
  SELECT label AS c_label, list(c ORDER BY dim) AS cv FROM cent GROUP BY label
),
v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
dists AS (
  SELECT v.vec_id, v.label, c.c_label, list_distance(v.ev, c.cv) AS d
  FROM v CROSS JOIN cent_arr c
),
ab AS (
  SELECT vec_id, label,
         min(CASE WHEN c_label = label THEN d END) AS a,
         min(CASE WHEN c_label <> label THEN d END) AS b
  FROM dists GROUP BY 1, 2
),
sil AS (
  SELECT label,
         CAST(round(1000000.0 * (b - a) / greatest(a, b)) AS BIGINT) AS sm
  FROM ab
)
SELECT label, count(*) AS n_vecs,
       round(sum(sm) / 1000000.0 / count(*), 4) AS mean_silhouette
FROM sil GROUP BY label
"""


def t25_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (Heaps'-law view): processing sources
    in a fixed (lexicographic) order, how many DISTINCT tokens does
    each source add that no earlier source contained — the marginal
    novelty a new crawl contributes, which is what decides whether
    ingesting it is worth the compute. A flat tail means new sources
    re-tread the same vocabulary (redundant with t21's pairwise
    overlap; this is the cumulative view).

    Scale: one (token → first source) aggregate over the distinct
    (source, token) set — first-occurrence attribution is min(source)
    per token, one shuffle, no per-prefix rescans.
    """
    from pyspark.sql.functions import col

    tok = (
        _docs(spark, sf_dir)
        .select("source", F.explode(text_fns.tokens(col("text"))).alias("token"))
        .filter(col("token") != "")
        .distinct()
    )
    first = tok.groupBy("token").agg(F.min("source").alias("source"))
    per_src = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    new = first.groupBy("source").agg(F.count(F.lit(1)).alias("n_new"))
    return (
        per_src.join(new, "source", "left")
        .select(
            "source",
            "n_vocab",
            F.coalesce(col("n_new"), F.lit(0)).alias("n_new_tokens"),
        )
    )


ORACLE_T25 = r"""
WITH tok AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents
),
clean AS (SELECT source, token FROM tok WHERE token <> ''),
first AS (SELECT token, min(source) AS source FROM clean GROUP BY token),
per_src AS (SELECT source, count(*) AS n_vocab FROM clean GROUP BY source),
new AS (SELECT source, count(*) AS n_new FROM first GROUP BY source)
SELECT p.source, p.n_vocab, coalesce(n.n_new, 0) AS n_new_tokens
FROM per_src p LEFT JOIN new n ON n.source = p.source
"""


#: Absolute error band the calibration attests per pair. k=32 hashes
#: give estimator std ≈ sqrt(J(1-J)/32) ≤ 0.088; the signatures are
#: deterministic (JVM xxhash64), so per-pair errors are fixed numbers
#: at a given SF — 0.30 (>3.4σ) holds with wide margin at sf0.001-0.1
#: (the tighter RMSE envelope is asserted in tests/test_dedup.py).
D18_ERR_BAND = 0.30


def d18_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration with a driver-attestable banded
    contract: over the EXACT high-Jaccard pair set (d02's shingle
    machinery — DuckDB-recomputable, unlike LSH candidates), compare
    the k=32 SIGNATURE-estimated Jaccard (matching positions / k,
    what d03 filters on) against the exact Jaccard, and emit per pair
    the exact-computable columns (ids, shared-shingle count, exact
    Jaccard) plus ``est_within_band`` — the report that tells you
    whether k=32 hashes is enough before trusting a threshold at
    corpus scale. The oracle recomputes the exact side and claims
    TRUE, so the hash matches iff the estimator landed inside the
    band on every pair.

    Scale: signatures join back ONLY onto the exact pair list
    (blocked, never all-pairs); one zip_with per pair for the
    position-match count.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir)
    # shared staged shingle index (see d03): exact pairs + signatures
    # off one barrier and one shingle pass
    idx = dedup.hashed_shingle_index(docs)
    pairs = dedup.jaccard_ngram_pairs(
        docs,
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
        index=idx,
    ).select("a_id", "b_id", "n_inter", "jaccard")
    # referenced by both join sides — stage the n_docs signature rows
    # once instead of re-running the shingle+minhash pipeline twice
    sigs = dedup.minhash_signatures(
        docs, num_hashes=32, index=idx
    ).localCheckpoint()
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(32.0)
    )
    return (
        pairs.join(
            sigs.select(col("doc_id").alias("a_id"), col("sig").alias("sig_a")),
            "a_id",
        )
        .join(
            sigs.select(col("doc_id").alias("b_id"), col("sig").alias("sig_b")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            "n_inter",
            col("jaccard").alias("exact_j"),
            (F.abs(est - col("jaccard")) <= D18_ERR_BAND).alias(
                "est_within_band"
            ),
        )
    )


ORACLE_D18 = rf"""
WITH pairs AS ({ORACLE_D02})
SELECT a_id, b_id, n_inter, jaccard AS exact_j, TRUE AS est_within_band
FROM pairs
"""


def d17_pair_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where do near-duplicates come from — the SAME source
    (re-crawl/retry artifacts, fixable upstream) or ACROSS sources
    (syndication/mirrors, inherent to the web)? Counts per canonical
    source pair with an intra/cross flag; the answer decides whether
    dedup budget goes into crawl hygiene or cross-source blocking.

    Scale: two dim-bounded joins of the (tiny) pair list back onto
    (doc_id → source); the aggregate key space is n_sources².
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    pairs = dedup.jaccard_ngram_pairs(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        stop_shingle_df=STOP_SHINGLE_DF,
    ).select("a_id", "b_id")
    tagged = (
        pairs.join(
            docs.select(col("doc_id").alias("a_id"), col("source").alias("src_a")),
            "a_id",
        )
        .join(
            docs.select(col("doc_id").alias("b_id"), col("source").alias("src_b")),
            "b_id",
        )
        .select(
            F.least("src_a", "src_b").alias("src_lo"),
            F.greatest("src_a", "src_b").alias("src_hi"),
        )
    )
    return tagged.groupBy("src_lo", "src_hi").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max(F.when(col("src_lo") == col("src_hi"), "intra").otherwise("cross")).alias(
            "kind"
        ),
    )


ORACLE_D17 = rf"""
WITH pairs AS (
  {ORACLE_D02}
),
tagged AS (
  SELECT least(da.source, db.source) AS src_lo,
         greatest(da.source, db.source) AS src_hi
  FROM pairs p
  JOIN documents da ON da.doc_id = p.a_id
  JOIN documents db ON db.doc_id = p.b_id
)
SELECT src_lo, src_hi, count(*) AS n_pairs,
       CASE WHEN src_lo = src_hi THEN 'intra' ELSE 'cross' END AS kind
FROM tagged GROUP BY 1, 2
"""


#: t26 ratio band: measured zlib ratios at sf0.001-0.1 span
#: [0.39, 1.02] (a 48-byte doc can exceed 1.0 from header overhead);
#: [0.2, 1.05] leaves margin both sides, and every doc >= 200 raw
#: bytes compresses strictly below 1.0. zlib level 6 is
#: deterministic, so the booleans are stable at a given SF.
T26_RATIO_LO = 0.2
T26_RATIO_HI = 1.05
T26_LONG_DOC_BYTES = 200


def t26_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal with a driver-attestable
    banded contract: per non-empty document, the exact-computable raw
    byte length (DuckDB: octet_length(encode(text))) plus booleans
    attesting the ratio sits in the sane-text band and that every
    long document actually compresses (< 1.0) — the Gopher-style
    filter's operating assumptions. Raw ratios stay available via
    operators/textops.compression_ratio (bounds/monotonicity tests in
    tests/test_text.py)."""
    from pyspark.sql.functions import col

    cr = textops.compression_ratio(_docs(spark, sf_dir))
    return cr.select(
        "doc_id",
        "n_raw_bytes",
        (
            (col("zlib_ratio") > T26_RATIO_LO)
            & (col("zlib_ratio") < T26_RATIO_HI)
        ).alias("ratio_in_band"),
        (
            (col("n_raw_bytes") < T26_LONG_DOC_BYTES)
            | (col("zlib_ratio") < 1.0)
        ).alias("long_docs_compress"),
    )


ORACLE_T26 = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_raw_bytes,
       TRUE AS ratio_in_band,
       TRUE AS long_docs_compress
FROM documents
WHERE length(text) > 0
"""


#: s12 occupancy bands: uniform share is 1/16 = 0.0625; measured
#: shares at sf0.001-0.1 stay within [0.04, 0.09]. The k-means
#: assignment is deterministic (hash-sampled seeds, fixed Lloyd
#: passes), so the bands are stable at a given SF.
S12_N_CELLS = 16
S12_MAX_SHARE = 0.15
S12_MIN_SHARE = 0.02


def s12_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy balance with a driver-attestable banded
    contract: a single summary row with exact-computable columns (all
    S12_N_CELLS cells non-empty; total points = corpus size — mass
    conservation the oracle recomputes via count(*)) plus booleans
    attesting every cell's share sits inside the balance band (the
    property that makes nprobe/n_cells a meaningful cost model). Raw
    per-cell sizes stay available via
    operators/similarity.ivf_cluster_sizes."""
    from pyspark.sql.functions import col

    cs = similarity.ivf_cluster_sizes(_emb(spark, sf_dir), n_cells=S12_N_CELLS)
    return cs.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n_vecs").cast("long").alias("n_points"),
        (F.max("share") <= S12_MAX_SHARE).alias("max_share_ok"),
        (F.min("share") >= S12_MIN_SHARE).alias("min_share_ok"),
    )


ORACLE_S12 = f"""
SELECT CAST({S12_N_CELLS} AS BIGINT) AS n_cells,
       count(*) AS n_points,
       TRUE AS max_share_ok,
       TRUE AS min_share_ok
FROM embeddings
"""


#: d19/d20: exact substring-span dedup (Lee et al. 2022 semantics).
#: Seeding: every doc with doc_id % 50 == 3 gets a guarded excerpt
#: twin (id + 1_000_000) so the corpus deterministically contains
#: known overlapping byte ranges; the detector must recover their
#: exact spans (plus any organic duplicate runs already present).
D19_MIN_LEN = 40
D19_MAX_GRAM_OCC = 200
D19_EXCERPT_MOD = 50
D19_EXCERPT_REM = 3
D19_EXCERPT_FROM = 21
D19_EXCERPT_LEN = 160


def _d19_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ guarded excerpts — the seeded-overlap corpus both
    d19 and its DuckDB oracle detect spans over."""
    from pyspark.sql.functions import col

    base = _docs(spark, sf_dir).select("doc_id", "text")
    excerpts = base.filter(
        col("doc_id") % D19_EXCERPT_MOD == D19_EXCERPT_REM
    ).select(
        (col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("zqx-"),
            F.substring("text", D19_EXCERPT_FROM, D19_EXCERPT_LEN),
            F.lit("-xqz"),
        ).alias("text"),
    )
    return base.unionByName(excerpts)


def d19_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at span granularity: every maximal
    cross-doc shared character run ≥ 40 chars, with exact offsets
    (operators/spans.py seed-and-chain; Lee et al. 2022 suffix-array
    semantics, distributed). Oracle recomputes the identical span set
    in DuckDB SQL from the same seeded corpus — a fully independent
    detection, not a replay of the construction."""
    from llamadb_spark.operators.spans import substring_span_pairs

    return substring_span_pairs(
        _d19_corpus(spark, sf_dir),
        min_len=D19_MIN_LEN,
        max_gram_occ=D19_MAX_GRAM_OCC,
    )


def d20_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply half: cut each detected span out of the HIGHER-id
    doc of its pair (merged-interval removal), returning the cleaned
    text per affected doc. Hash-matches DuckDB's independent removal
    (same policy) exactly."""
    from llamadb_spark.operators.spans import (
        remove_spans,
        substring_span_pairs,
    )

    corpus = _d19_corpus(spark, sf_dir)
    spans = substring_span_pairs(
        corpus, min_len=D19_MIN_LEN, max_gram_occ=D19_MAX_GRAM_OCC
    )
    return remove_spans(corpus, spans)


def d21_duplication_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplication profile over the d19 seeded corpus: per
    source — docs, affected docs, total vs duplicated chars (merged
    b-side span intervals, overlap-safe) and an exact integer
    per-mille duplication ratio. The go/no-go number before running
    the d20 removal at corpus scale; oracle recomputes the identical
    profile in DuckDB from its own independent span detection."""
    from pyspark.sql.functions import col

    from llamadb_spark.operators.spans import (
        duplication_profile,
        substring_span_pairs,
    )

    base = _docs(spark, sf_dir).select("doc_id", "text", "source")
    excerpts = base.filter(
        col("doc_id") % D19_EXCERPT_MOD == D19_EXCERPT_REM
    ).select(
        (col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("zqx-"),
            F.substring("text", D19_EXCERPT_FROM, D19_EXCERPT_LEN),
            F.lit("-xqz"),
        ).alias("text"),
        F.lit("excerpt").alias("source"),
    )
    corpus = base.unionByName(excerpts)
    spans = substring_span_pairs(
        corpus, min_len=D19_MIN_LEN, max_gram_occ=D19_MAX_GRAM_OCC
    )
    return duplication_profile(corpus, spans, group_col="source")


_D19_CORPUS_SQL = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         'zqx-' || substr(text, {D19_EXCERPT_FROM}, {D19_EXCERPT_LEN})
             || '-xqz' AS text
  FROM documents WHERE doc_id % {D19_EXCERPT_MOD} = {D19_EXCERPT_REM}
),
grams AS (
  SELECT doc_id, p AS pos,
         substr(text, CAST(p AS INT), {D19_MIN_LEN}) AS gram
  FROM corpus, unnest(generate_series(1, length(text) - {D19_MIN_LEN - 1}))
       AS t(p)
  WHERE length(text) >= {D19_MIN_LEN}
),
grams_ok AS (
  SELECT * FROM grams
  QUALIFY count(*) OVER (PARTITION BY gram) <= {D19_MAX_GRAM_OCC}
),
m AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.pos AS a_pos, b.pos AS b_pos, a.pos - b.pos AS diag
  FROM grams_ok a JOIN grams_ok b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
),
spans AS (
  SELECT a_id, b_id, min(a_pos) AS a_start, min(b_pos) AS b_start,
         count(*) + {D19_MIN_LEN - 1} AS run_len
  FROM (
    SELECT *, a_pos - row_number() OVER (
      PARTITION BY a_id, b_id, diag ORDER BY a_pos) AS grp
    FROM m
  )
  GROUP BY a_id, b_id, diag, grp
)
"""

ORACLE_D19 = f"""
WITH {_D19_CORPUS_SQL}
SELECT a_id, b_id, a_start, b_start, run_len FROM spans
"""

ORACLE_D20 = f"""
WITH {_D19_CORPUS_SQL},
iv AS (
  SELECT b_id AS doc_id, b_start AS s, b_start + run_len AS e FROM spans
),
flagged AS (
  SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                 THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max_e
    FROM iv
  )
),
merged AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM (
    SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e)
              AS isl
    FROM flagged
  )
  GROUP BY doc_id, isl
),
gaps AS (
  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
           AS gs,
         s AS ge
  FROM merged
  UNION ALL
  SELECT m.doc_id, max(m.e) AS gs, any_value(length(c.text) + 1) AS ge
  FROM merged m JOIN corpus c ON c.doc_id = m.doc_id
  GROUP BY m.doc_id
),
pieces AS (
  SELECT g.doc_id, g.gs,
         substr(c.text, CAST(g.gs AS INT),
                CAST(greatest(g.ge - g.gs, 0) AS INT)) AS piece
  FROM gaps g JOIN corpus c ON c.doc_id = g.doc_id
),
stats AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(e - s) AS BIGINT) AS removed_chars
  FROM merged GROUP BY doc_id
)
SELECT s.doc_id, s.n_spans, s.removed_chars,
       coalesce(p.clean_text, '') AS clean_text
FROM stats s
JOIN (
  SELECT doc_id, string_agg(piece, '' ORDER BY gs) AS clean_text
  FROM pieces GROUP BY doc_id
) p ON p.doc_id = s.doc_id
"""


#: t28: fastText-style linear quality scorer — PUBLIC-IN-CODE integer
#: micro-unit weights over the corpus vocabulary (single source of
#: truth for both the Spark literal map and the oracle's VALUES
#: table). Content/operator terms score positive, filler and junk
#: markers negative; the bias demands enough positive mass per doc.
T28_WEIGHTS_MICRO = {
    "query": 220_000, "join": 200_000, "hash": 180_000,
    "scan": 160_000, "merge": 170_000, "sort": 150_000,
    "filter": 190_000, "group": 140_000, "agg": 210_000,
    "window": 230_000, "stream": 120_000, "table": 110_000,
    "column": 130_000, "row": 90_000, "vector": 240_000,
    "batch": 100_000, "key": 80_000, "value": 70_000,
    "data": 60_000, "line": 50_000, "order": 95_000,
    "part": 85_000, "customer": 75_000, "spark": 250_000,
    "fast": 150_000, "big": -100_000, "small": -100_000,
    "slow": -600_000, "the": -400_000, "a": -350_000,
    "dup": -2_000_000,
}
T28_BIAS_MICRO = -6_500_000


def t28_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (VERDICT r06 #6): logistic-
    regression document scorer evaluated as an exact BIGINT dot
    product of token counts with integer-quantized weights — the
    public fastText/CCNet quality-classifier recipe, with zero
    Python in the hot path and no float-summation-order hazard."""
    return textops.linear_quality_score(
        _docs(spark, sf_dir),
        weights_micro=T28_WEIGHTS_MICRO,
        bias_micro=T28_BIAS_MICRO,
    )


_T28_VALUES = ", ".join(
    f"('{t}', {w})" for t, w in sorted(T28_WEIGHTS_MICRO.items())
)

ORACLE_T28 = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
w AS (SELECT * FROM (VALUES {_T28_VALUES}) AS t(tok, w_micro))
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(coalesce(w.w_micro, 0)) + {T28_BIAS_MICRO} AS BIGINT)
         AS logit_micro,
       (sum(coalesce(w.w_micro, 0)) + {T28_BIAS_MICRO}) > 0 AS is_quality
FROM toks LEFT JOIN w USING (tok)
GROUP BY doc_id
"""




ORACLE_D21 = f"""
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         'zqx-' || substr(text, {D19_EXCERPT_FROM}, {D19_EXCERPT_LEN})
             || '-xqz' AS text,
         'excerpt' AS source
  FROM documents WHERE doc_id % {D19_EXCERPT_MOD} = {D19_EXCERPT_REM}
),
grams AS (
  SELECT doc_id, p AS pos,
         substr(text, CAST(p AS INT), {D19_MIN_LEN}) AS gram
  FROM corpus, unnest(generate_series(1, length(text) - {D19_MIN_LEN - 1}))
       AS t(p)
  WHERE length(text) >= {D19_MIN_LEN}
),
grams_ok AS (
  SELECT * FROM grams
  QUALIFY count(*) OVER (PARTITION BY gram) <= {D19_MAX_GRAM_OCC}
),
m AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.pos AS a_pos, b.pos AS b_pos, a.pos - b.pos AS diag
  FROM grams_ok a JOIN grams_ok b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
),
spans AS (
  SELECT a_id, b_id, min(a_pos) AS a_start, min(b_pos) AS b_start,
         count(*) + {D19_MIN_LEN - 1} AS run_len
  FROM (
    SELECT *, a_pos - row_number() OVER (
      PARTITION BY a_id, b_id, diag ORDER BY a_pos) AS grp
    FROM m
  )
  GROUP BY a_id, b_id, diag, grp
),
iv AS (
  SELECT b_id AS doc_id, b_start AS s, b_start + run_len AS e FROM spans
),
flagged AS (
  SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                 THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max_e
    FROM iv
  )
),
merged AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM (
    SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e)
              AS isl
    FROM flagged
  )
  GROUP BY doc_id, isl
),
per_doc AS (
  SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dup_chars
  FROM merged GROUP BY doc_id
)
SELECT c.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_affected,
       CAST(sum(length(c.text)) AS BIGINT) AS total_chars,
       CAST(sum(coalesce(p.dup_chars, 0)) AS BIGINT) AS dup_chars,
       CAST((1000 * sum(coalesce(p.dup_chars, 0)))
            // sum(length(c.text)) AS BIGINT) AS dup_permille
FROM corpus c LEFT JOIN per_doc p ON p.doc_id = c.doc_id
GROUP BY c.source
"""


#: d22: within-doc repeat seeding — every doc with doc_id % 40 == 7
#: re-appends a mid-section of itself, planting an internal repeat
#: the detector must recover at exact offsets.
D22_REPEAT_MOD = 40
D22_REPEAT_REM = 7
D22_REPEAT_FROM = 11
D22_REPEAT_LEN = 90


def d22_intra_doc_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated substrings (Lee et al.'s self-repeat
    half, #272): maximal pairs of occurrences of runs ≥ 40 chars
    inside one doc, exact offsets — template stutter / generation
    degeneracy at span granularity (t06's repetition ratio tells you
    HOW MUCH a doc repeats; this tells you exactly WHERE). Seeded
    corpus: docs ≡ 7 (mod 40) re-append a mid-section of themselves;
    the DuckDB oracle detects independently over the same corpus."""
    from pyspark.sql.functions import col

    from llamadb_spark.operators.spans import intra_doc_repeat_spans

    base = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = base.select(
        "doc_id",
        F.when(
            col("doc_id") % D22_REPEAT_MOD == D22_REPEAT_REM,
            F.concat(
                col("text"),
                F.lit(" :: "),
                F.substring("text", D22_REPEAT_FROM, D22_REPEAT_LEN),
            ),
        ).otherwise(col("text")).alias("text"),
    )
    return intra_doc_repeat_spans(
        corpus, min_len=D19_MIN_LEN, max_gram_occ=D19_MAX_GRAM_OCC
    )


ORACLE_D22 = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % {D22_REPEAT_MOD} = {D22_REPEAT_REM}
              THEN text || ' :: '
                   || substr(text, {D22_REPEAT_FROM}, {D22_REPEAT_LEN})
              ELSE text END AS text
  FROM documents
),
grams AS (
  SELECT doc_id, p AS pos,
         substr(text, CAST(p AS INT), {D19_MIN_LEN}) AS gram
  FROM corpus, unnest(generate_series(1, length(text) - {D19_MIN_LEN - 1}))
       AS t(p)
  WHERE length(text) >= {D19_MIN_LEN}
),
grams_ok AS (
  SELECT * FROM grams
  QUALIFY count(*) OVER (PARTITION BY gram) <= {D19_MAX_GRAM_OCC}
),
m AS (
  SELECT a.doc_id, a.pos AS a_pos, b.pos AS b_pos,
         b.pos - a.pos AS diag
  FROM grams_ok a JOIN grams_ok b
    ON a.gram = b.gram AND a.doc_id = b.doc_id AND a.pos < b.pos
)
SELECT doc_id, min(a_pos) AS first_start, min(b_pos) AS second_start,
       count(*) + {D19_MIN_LEN - 1} AS run_len
FROM (
  SELECT *, a_pos - row_number() OVER (
    PARTITION BY doc_id, diag ORDER BY a_pos) AS grp
  FROM m
)
GROUP BY doc_id, diag, grp
"""


def d24_quality_dedup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster representative selection — the
    production keep-policy: within each near-dup cluster keep the
    HIGHEST-QUALITY member (t28's exact integer logit, doc_id
    tie-break), not the arbitrary min-id d07 keeps. Real pipelines
    choose the canonical copy by quality (the cleanest crawl of a
    syndicated article), and the swap is free — the cluster pass
    already exists; only the per-cluster argmax changes.

    Output: (cluster_id, keep_id, n_members, keep_logit_micro), one
    row per near-dup cluster. Exactly DuckDB-oracled (recursive-CTE
    clusters + VALUES-table logits + the same window argmax).

    Scale: the d02/d06 machinery (blocked pairs, min-label CC) plus
    ONE window partitioned by cluster_id (cluster-bounded) and a
    broadcast-joinable logit table; nothing new shuffles corpus-wide.
    """
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    pairs = dedup.jaccard_ngram_pairs(
        docs, threshold=JACCARD_THRESHOLD, stop_shingle_df=STOP_SHINGLE_DF
    ).select("a_id", "b_id")
    cc = dedup.connected_components(pairs)
    logits = textops.linear_quality_score(
        docs, weights_micro=T28_WEIGHTS_MICRO, bias_micro=T28_BIAS_MICRO
    ).select(col("doc_id").alias("node"), "logit_micro")
    m = cc.join(logits, "node")
    w = Window.partitionBy("cluster_id").orderBy(
        col("logit_micro").desc(), col("node").asc()
    )
    return (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .filter(col("rn") == 1)
        .select(
            "cluster_id",
            col("node").alias("keep_id"),
            "n_members",
            col("logit_micro").alias("keep_logit_micro"),
        )
    )


ORACLE_D24 = rf"""
WITH RECURSIVE pairs AS (
  {ORACLE_D02}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cc AS (
  SELECT u AS node, least(u, min(v)) AS cluster_id
  FROM reach GROUP BY u
),
qtoks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
),
wt AS (SELECT * FROM (VALUES {{T28V}}) AS t(tok, w_micro)),
q AS (
  SELECT doc_id,
         CAST(sum(coalesce(wt.w_micro, 0)) + {{T28B}} AS BIGINT)
           AS logit_micro
  FROM qtoks LEFT JOIN wt USING (tok)
  GROUP BY doc_id
),
m AS (
  SELECT cc.node, cc.cluster_id, q.logit_micro,
         row_number() OVER (PARTITION BY cc.cluster_id
                            ORDER BY q.logit_micro DESC, cc.node) AS rn,
         count(*) OVER (PARTITION BY cc.cluster_id) AS n_members
  FROM cc JOIN q ON q.doc_id = cc.node
)
SELECT cluster_id, node AS keep_id, n_members,
       logit_micro AS keep_logit_micro
FROM m WHERE rn = 1
""".replace("{T28V}", _T28_VALUES).replace("{T28B}", str(T28_BIAS_MICRO))


#: t29 Gopher repetition gates (Rae et al. 2021 Table A1, public):
#: a doc fails if the most common word 2/3/4-gram covers more than
#: 20/18/16% of its characters, or duplicated 5-grams more than 15%.
#: Fractions are exact integer PARTS-PER-MILLION (BIGINT `div`) so
#: the hash oracle never sees a float.
T29_TOP_PPM = {2: 200_000, 3: 180_000, 4: 160_000}
T29_DUP5_PPM = 150_000


def t29_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style n-gram repetition signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1 — public):
    per document, the character share of the MOST COMMON word
    2/3/4-gram and the EXCESS character mass of duplicated 5-grams
    ((count-1)·gram_chars — the documented simplification of the
    paper's overlap-deduplicated character count; the union-of-
    occurrence-intervals form is what operators/spans.py computes at
    span granularity), each as exact integer ppm of doc chars, plus
    the pass/fail gate at the published thresholds. Complements t06
    (single-n dup-shingle ratio) with the actual multi-n published
    filter set.

    Scale: token arrays built once per doc; n-grams via
    transform/slice (JVM higher-order fns, no explode join-back);
    per-(doc, n) tops via one aggregate over exploded grams — all
    shuffles keyed by doc_id with map-side combine. No Python, no
    floats.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.split(F.trim(F.lower(col("text"))), r"\s+").alias("tk"),
    )

    def grams(n: int):
        # Guard: Spark's sequence(1, 0) is DESCENDING [1, 0], and
        # slice(tk, 0, n) then throws INVALID_PARAMETER_VALUE.START —
        # any doc with fewer than n whitespace tokens would kill the
        # query. DuckDB's generate_series(1, 0) is empty, so the
        # guarded form also restores cross-engine agreement.
        return toks.select(
            "doc_id",
            "n_chars",
            F.lit(n).alias("n"),
            F.explode(
                F.expr(
                    f"transform("
                    f" if(size(tk) >= {n}, sequence(1, size(tk)-{n-1}),"
                    f"    cast(array() as array<int>)),"
                    f" i -> concat_ws(' ', slice(tk, i, {n})))"
                )
            ).alias("gram"),
        )

    counts = (
        grams(2).unionByName(grams(3)).unionByName(grams(4))
        .unionByName(grams(5))
        .groupBy("doc_id", "n_chars", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("gchars", F.length("gram").cast("long"))
    )
    # top n-gram per (doc, n) for n in 2..4: max by (cnt, gram) —
    # deterministic tie-break on the gram text
    top = (
        counts.filter(col("n") <= 4)
        .groupBy("doc_id", "n_chars", "n")
        .agg(
            F.max(F.struct("cnt", "gram", "gchars")).alias("t")
        )
        .select(
            "doc_id",
            "n",
            F.expr("(t.cnt * t.gchars * 1000000) div n_chars").alias("ppm"),
        )
    )
    dup5 = (
        counts.filter((col("n") == 5) & (col("cnt") >= 2))
        .groupBy("doc_id", "n_chars")
        .agg(F.sum((col("cnt") - 1) * col("gchars")).alias("dupchars"))
        .select(
            "doc_id",
            F.expr("(dupchars * 1000000) div n_chars").alias("dup5_ppm"),
        )
    )
    wide = (
        top.groupBy("doc_id")
        .pivot("n", [2, 3, 4])
        .agg(F.first("ppm"))
        .select(
            "doc_id",
            F.coalesce(col("2"), F.lit(0)).alias("top2_ppm"),
            F.coalesce(col("3"), F.lit(0)).alias("top3_ppm"),
            F.coalesce(col("4"), F.lit(0)).alias("top4_ppm"),
        )
    )
    return (
        docs.select("doc_id")
        .join(wide, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(col("top2_ppm"), F.lit(0)).alias("top2_ppm"),
            F.coalesce(col("top3_ppm"), F.lit(0)).alias("top3_ppm"),
            F.coalesce(col("top4_ppm"), F.lit(0)).alias("top4_ppm"),
            F.coalesce(col("dup5_ppm"), F.lit(0)).alias("dup5_ppm"),
        )
        .withColumn(
            "passes_gopher",
            (col("top2_ppm") <= T29_TOP_PPM[2])
            & (col("top3_ppm") <= T29_TOP_PPM[3])
            & (col("top4_ppm") <= T29_TOP_PPM[4])
            & (col("dup5_ppm") <= T29_DUP5_PPM),
        )
    )


ORACLE_T29 = f"""
WITH base AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         string_split_regex(trim(lower(text)), '\\s+') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, n_chars, n.n,
         array_to_string(tk[i:i+n.n-1], ' ') AS gram
  FROM base,
       (SELECT unnest([2, 3, 4, 5]) AS n) AS n,
       unnest(generate_series(1, greatest(len(tk) - n.n + 1, 0))) AS t(i)
),
counts AS (
  SELECT doc_id, n_chars, n, gram, count(*) AS cnt,
         CAST(length(gram) AS BIGINT) AS gchars
  FROM g GROUP BY ALL
),
top AS (
  SELECT doc_id, n, (cnt * gchars * 1000000) // n_chars AS ppm
  FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                 ORDER BY cnt DESC, gram DESC) AS rn
    FROM counts WHERE n <= 4
  ) WHERE rn = 1
),
dup5 AS (
  SELECT doc_id,
         (sum((cnt - 1) * gchars) * 1000000) // any_value(n_chars)
           AS dup5_ppm
  FROM counts WHERE n = 5 AND cnt >= 2 GROUP BY doc_id
),
wide AS (
  SELECT doc_id,
         coalesce(max(ppm) FILTER (n = 2), 0) AS top2_ppm,
         coalesce(max(ppm) FILTER (n = 3), 0) AS top3_ppm,
         coalesce(max(ppm) FILTER (n = 4), 0) AS top4_ppm
  FROM top GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(coalesce(w.top2_ppm, 0) AS BIGINT) AS top2_ppm,
       CAST(coalesce(w.top3_ppm, 0) AS BIGINT) AS top3_ppm,
       CAST(coalesce(w.top4_ppm, 0) AS BIGINT) AS top4_ppm,
       CAST(coalesce(d.dup5_ppm, 0) AS BIGINT) AS dup5_ppm,
       (coalesce(w.top2_ppm, 0) <= {T29_TOP_PPM[2]}
        AND coalesce(w.top3_ppm, 0) <= {T29_TOP_PPM[3]}
        AND coalesce(w.top4_ppm, 0) <= {T29_TOP_PPM[4]}
        AND coalesce(d.dup5_ppm, 0) <= {T29_DUP5_PPM}) AS passes_gopher
FROM base b
LEFT JOIN wide w USING (doc_id)
LEFT JOIN dup5 d USING (doc_id)
"""


def t30_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BPE token counts per document (VERDICT r08 #2 — the
    budget currency t03's whitespace/regex counts approximate; the
    two diverge 30-50% on web text). Sennrich et al. 2016 encode,
    expressed as a rank-ordered chain of built-in string replaces
    over a ``|tok~`` rendering (see operators/bpe.py for the two
    public equivalences that make this exact), run ONCE per distinct
    word and joined back — |vocab| encodes for a trillion-token
    corpus. Output: (doc_id, n_words, bpe_tokens, ws_tokens), all
    exact BIGINTs; the oracle runs the identical replace chain in
    DuckDB, generated from the same merge table.

    Scale: explode→per-(doc,word) count (map-side combine) →
    vocab-bounded encode → word-keyed join-back (AQE-skew-splittable)
    → per-doc sum (map-side combine). No Python, no windows; the
    encode chain is whole-stage codegen."""
    from llamadb_spark.operators.bpe import bpe_token_counts

    return bpe_token_counts(_docs(spark, sf_dir))


def _oracle_t30() -> str:
    from llamadb_spark.operators.bpe import WORD_SPLIT, bpe_encode_sql

    enc = bpe_encode_sql("word")
    return f"""
WITH words AS (
  SELECT doc_id, w AS word FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '{WORD_SPLIT}')) AS w
    FROM documents
  ) WHERE w <> ''
),
per_word AS (
  SELECT doc_id, word, count(*) AS n_occ FROM words GROUP BY ALL
),
vocab AS (
  SELECT word,
         CAST(length(enc) - length(replace(enc, '|', '')) AS BIGINT)
           AS n_tok
  FROM (SELECT DISTINCT word, {enc} AS enc FROM per_word)
),
per_doc AS (
  SELECT p.doc_id,
         CAST(sum(p.n_occ) AS BIGINT) AS n_words,
         CAST(sum(p.n_occ * v.n_tok) AS BIGINT) AS bpe_tokens
  FROM per_word p JOIN vocab v USING (word) GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_words, 0) AS n_words,
       coalesce(p.bpe_tokens, 0) AS bpe_tokens,
       CAST(len(string_split_regex(trim(lower(d.text)), '\\s+'))
            AS BIGINT) AS ws_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


ORACLE_T30 = _oracle_t30()


#: d25 line-dedup corpus construction: body sliced into fixed-width
#: lines plus a per-source boilerplate header — the exact pattern
#: C4-style line dedup exists to remove (site chrome repeated on
#: every page of a source).
D25_LINE_W = 80


def d25_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-LINE removal (the C4 pipeline step,
    Raffel et al. 2020 §2.2 — public: "we removed any line that
    occurred more than once in the data set", keep-first form):
    every distinct line keeps its FIRST occurrence by (doc_id,
    line_no); later occurrences are stripped and documents
    reassembled from their surviving lines. The seeded corpus gives
    each doc a per-source boilerplate header line + fixed-width body
    slices, so dedup must strip the header everywhere except the
    first doc of each source — the real-world site-chrome case.

    Output: one row per doc — (doc_id, n_lines, n_removed,
    clean_text). Exactly DuckDB-oracled.

    Scale (VERDICT r08 #1): keep-first is a groupBy(line).min(
    struct(doc_id, line_no)) — a MAP-SIDE-COMBINABLE partial
    aggregate, so a boilerplate line present in a large fraction of
    all docs (the C4 site-chrome case) combines to one row per map
    task before the shuffle; the join-back on line is an ordinary
    equi-join that AQE's OptimizeSkewedJoin CAN split. The previous
    row_number window partitioned by raw line content concentrated
    every occurrence of the hottest line into ONE non-splittable
    window partition (AQE splits joins, not windows) — right answer,
    wrong plan at 100×. Then a per-doc regroup. Nothing quadratic,
    no Python.
    """
    from pyspark.sql.functions import col

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    w = D25_LINE_W
    # Guard: ceil(0/w)=0 would give Spark's DESCENDING sequence(1,0)
    # = [1, 0] → two spurious body lines for an empty-text doc, vs
    # the oracle's empty generate_series(1, 0) (ADVICE r08).
    body = F.expr(
        f"if(length(text) >= 1,"
        f" transform(sequence(1, CAST(ceil(length(text)/{w}.0) AS INT)),"
        f"   i -> substring(text, (i-1)*{w}+1, {w})),"
        f" cast(array() as array<string>))"
    )
    header = F.concat(F.lit("hdr-"), col("source"), F.lit("-boilerplate"))
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.concat(F.array(header), body)
        ).alias("line_no", "line"),
    )
    # First occurrence per distinct line: lexicographic struct min ==
    # ORDER BY doc_id, line_no. Partial-agg shape — skew-irrelevant.
    keep = (
        lines.groupBy("line")
        .agg(F.min(F.struct("doc_id", "line_no")).alias("k"))
        .select(
            "line",
            col("k.doc_id").alias("keep_doc"),
            col("k.line_no").alias("keep_line_no"),
        )
    )
    marked = lines.join(keep, "line").withColumn(
        "is_first",
        (col("doc_id") == col("keep_doc"))
        & (col("line_no") == col("keep_line_no")),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((~col("is_first")).cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                col("is_first"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select("doc_id", "n_lines", "n_removed", "clean_text")
    )


ORACLE_D25 = f"""
WITH lines AS (
  SELECT doc_id, 0 AS line_no,
         'hdr-' || source || '-boilerplate' AS line
  FROM documents
  UNION ALL
  SELECT doc_id, i AS line_no,
         substr(text, (i-1)*{D25_LINE_W}+1, {D25_LINE_W}) AS line
  FROM documents,
       unnest(generate_series(
         1, CAST(ceil(length(text)/{D25_LINE_W}.0) AS INT))) AS t(i)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY line
                               ORDER BY doc_id, line_no) AS rn
  FROM lines
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_removed,
       coalesce(string_agg(line, chr(10) ORDER BY line_no)
                FILTER (rn = 1), '') AS clean_text
FROM ranked GROUP BY doc_id
"""


def d23_intra_doc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc repeat REMOVAL apply (VERDICT r07 #7 — the Lee et
    al. self-repeat cut d22 detects but nothing applied): merge each
    doc's SECOND-occurrence intervals [second_start, second_start +
    run_len) and cut them, keeping the first occurrence — for
    periodic stutter ("ababab…") the occurrences overlap and the cut
    correctly collapses the run to its leading period. Same interval
    tooling as d20/p18 (remove_spans), same seeded self-repeat corpus
    as d22; output (doc_id, n_spans, removed_chars, clean_text) per
    affected doc, hash-matched by an independent DuckDB removal twin.

    Scale: detector windows are per (doc, diagonal); removal windows
    per doc — nothing global (the d20 analysis applies verbatim)."""
    from pyspark.sql.functions import col

    from llamadb_spark.operators.spans import (
        intra_doc_repeat_spans,
        remove_spans,
    )

    base = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = base.select(
        "doc_id",
        F.when(
            col("doc_id") % D22_REPEAT_MOD == D22_REPEAT_REM,
            F.concat(
                col("text"),
                F.lit(" :: "),
                F.substring("text", D22_REPEAT_FROM, D22_REPEAT_LEN),
            ),
        ).otherwise(col("text")).alias("text"),
    )
    spans = intra_doc_repeat_spans(
        corpus, min_len=D19_MIN_LEN, max_gram_occ=D19_MAX_GRAM_OCC
    )
    iv = spans.select(
        col("doc_id").alias("b_id"),
        col("second_start").alias("b_start"),
        "run_len",
    )
    return remove_spans(corpus, iv)


ORACLE_D23 = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % {D22_REPEAT_MOD} = {D22_REPEAT_REM}
              THEN text || ' :: '
                   || substr(text, {D22_REPEAT_FROM}, {D22_REPEAT_LEN})
              ELSE text END AS text
  FROM documents
),
grams AS (
  SELECT doc_id, p AS pos,
         substr(text, CAST(p AS INT), {D19_MIN_LEN}) AS gram
  FROM corpus, unnest(generate_series(1, length(text) - {D19_MIN_LEN - 1}))
       AS t(p)
  WHERE length(text) >= {D19_MIN_LEN}
),
grams_ok AS (
  SELECT * FROM grams
  QUALIFY count(*) OVER (PARTITION BY gram) <= {D19_MAX_GRAM_OCC}
),
m AS (
  SELECT a.doc_id, a.pos AS a_pos, b.pos AS b_pos,
         b.pos - a.pos AS diag
  FROM grams_ok a JOIN grams_ok b
    ON a.gram = b.gram AND a.doc_id = b.doc_id AND a.pos < b.pos
),
reps AS (
  SELECT doc_id, min(b_pos) AS second_start,
         count(*) + {D19_MIN_LEN - 1} AS run_len
  FROM (
    SELECT *, a_pos - row_number() OVER (
      PARTITION BY doc_id, diag ORDER BY a_pos) AS grp
    FROM m
  )
  GROUP BY doc_id, diag, grp
),
iv AS (
  SELECT doc_id, second_start AS s, second_start + run_len AS e FROM reps
),
flagged AS (
  SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                 THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max_e
    FROM iv
  )
),
merged AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM (
    SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e)
              AS isl
    FROM flagged
  )
  GROUP BY doc_id, isl
),
gaps AS (
  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
           AS gs,
         s AS ge
  FROM merged
  UNION ALL
  SELECT m2.doc_id, max(m2.e) AS gs, any_value(length(c.text) + 1) AS ge
  FROM merged m2 JOIN corpus c ON c.doc_id = m2.doc_id
  GROUP BY m2.doc_id
),
pieces AS (
  SELECT g.doc_id, g.gs,
         substr(c.text, CAST(g.gs AS INT),
                CAST(greatest(g.ge - g.gs, 0) AS INT)) AS piece
  FROM gaps g JOIN corpus c ON c.doc_id = g.doc_id
),
stats AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(e - s) AS BIGINT) AS removed_chars
  FROM merged GROUP BY doc_id
)
SELECT s.doc_id, s.n_spans, s.removed_chars,
       coalesce(p.clean_text, '') AS clean_text
FROM stats s
JOIN (
  SELECT doc_id, string_agg(piece, '' ORDER BY gs) AS clean_text
  FROM pieces GROUP BY doc_id
) p ON p.doc_id = s.doc_id
"""


def p18_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at SPAN granularity (#273): the d19 seeded
    corpus's excerpt twins play the EVAL set (ids ≥ 1e6); any
    training doc sharing a run ≥ 40 chars with an eval doc gets those
    exact byte ranges cut (Lee et al. decontamination: drop the
    overlapping substrings, keep the rest of the doc — p02's n-gram
    scan says WHO leaks; this removes WHAT leaked). Organic
    train↔train duplicate spans are deliberately untouched — that's
    d20's job, not decontamination. Output: one row per affected
    train doc (doc_id, n_spans, removed_chars, clean_text), exactly
    DuckDB-oracled."""
    from pyspark.sql.functions import col

    from llamadb_spark.operators.spans import (
        remove_spans,
        substring_span_pairs,
    )

    corpus = _d19_corpus(spark, sf_dir)
    spans = substring_span_pairs(
        corpus, min_len=D19_MIN_LEN, max_gram_occ=D19_MAX_GRAM_OCC
    )
    is_eval_a = col("a_id") >= 1_000_000
    is_eval_b = col("b_id") >= 1_000_000
    # exactly one side eval; relabel so the TRAIN side is the removal
    # target (remove_spans cuts the b side)
    train_side = spans.filter(is_eval_a != is_eval_b).select(
        F.when(is_eval_b, col("a_id")).otherwise(col("b_id")).alias("b_id"),
        F.when(is_eval_b, col("a_start"))
        .otherwise(col("b_start"))
        .alias("b_start"),
        "run_len",
    )
    train = corpus.filter(col("doc_id") < 1_000_000)
    return remove_spans(train, train_side)


ORACLE_P18 = f"""
WITH {_D19_CORPUS_SQL},
iv AS (
  SELECT a_id AS doc_id, a_start AS s, a_start + run_len AS e
  FROM spans WHERE b_id >= 1000000 AND a_id < 1000000
  UNION ALL
  SELECT b_id, b_start, b_start + run_len
  FROM spans WHERE a_id >= 1000000 AND b_id < 1000000
),
flagged AS (
  SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                 THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max_e
    FROM iv
  )
),
merged AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM (
    SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e)
              AS isl
    FROM flagged
  )
  GROUP BY doc_id, isl
),
gaps AS (
  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
           AS gs,
         s AS ge
  FROM merged
  UNION ALL
  SELECT m.doc_id, max(m.e) AS gs, any_value(length(c.text) + 1) AS ge
  FROM merged m JOIN corpus c ON c.doc_id = m.doc_id
  GROUP BY m.doc_id
),
pieces AS (
  SELECT g.doc_id, g.gs,
         substr(c.text, CAST(g.gs AS INT),
                CAST(greatest(g.ge - g.gs, 0) AS INT)) AS piece
  FROM gaps g JOIN corpus c ON c.doc_id = g.doc_id
),
stats AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(e - s) AS BIGINT) AS removed_chars
  FROM merged GROUP BY doc_id
)
SELECT s.doc_id, s.n_spans, s.removed_chars,
       coalesce(p.clean_text, '') AS clean_text
FROM stats s
JOIN (
  SELECT doc_id, string_agg(piece, '' ORDER BY gs) AS clean_text
  FROM pieces GROUP BY doc_id
) p ON p.doc_id = s.doc_id
"""


#: p19: the composed end-to-end curation pipeline (VERDICT r07 #3).
#: Token budget bites AFTER the quality filter; fixed absolute like
#: p15 so the cut tightens as SF grows. Shard count distinct from
#: p14's so the two keys can't mask each other's regressions.
P19_TOKEN_BUDGET = 20_000
P19_N_SHARDS = 8


def p19_pipeline_manifest(
    spark: SparkSession, sf_dir: str, token_counter: str = "ws"
) -> DataFrame:
    """The artifact a data team actually ships (VERDICT r07 #3): ONE
    DAG composing the already-proven stages end-to-end — raw corpus →
    exact dedup (d01 policy) → near-dup clusters (d02 Jaccard pairs →
    d06 connected components, keep min-id representative) → span
    removal + eval decontamination with the d19 detector staged ONCE
    (its localCheckpointed output feeds BOTH the d20 train↔train cut
    and the p18 train↔eval cut) → model-based quality filter (t28) on
    the CLEANED text → token-budget selection (p15 machinery,
    distributed cumsum — no global-order window) → sequence packing
    (p03 invariants) → deterministic loader shards (p14 hash).

    The near-dup stage uses the DETERMINISTIC lexical path (d02/d06)
    rather than the seeded LSH default (d12) precisely so the final
    manifest is exactly DuckDB-oracled; at 100 TB you swap in
    semantic_dedup_pairs' LSH default (#263) — the composition is
    identical from clusters onward.

    Output: one row per SELECTED doc (doc_id, source, shard,
    n_tokens, logit_micro, fits_budget, fill_covers_doc) — membership
    attests every upstream cut, token counts attest the clean-text
    accounting, booleans attest the packing discipline. The oracle
    recomputes the whole pipeline independently in SQL (recursive-CTE
    clusters, window-islands spans, VALUES-table scoring).

    Scale: each stage is the audited operator; staging boundaries are
    localCheckpoints so no stage's plan re-executes inside another's
    (the detector re-run finding of VERDICT r07 #2 — measured fixed
    here: PLAN_REPORT shows one detection).
    """
    from pyspark.sql.functions import col

    from llamadb_spark.operators import packing
    from llamadb_spark.operators.ranking import distributed_cumsum
    from llamadb_spark.operators.sampling import bucket_hash
    from llamadb_spark.operators.spans import (
        remove_spans,
        substring_span_pairs,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")

    # Stage 1 — exact dedup: keep each sha's min doc_id
    keep = dedup.exact_dedup(docs).select(col("keep_id").alias("doc_id"))
    surv1 = docs.join(keep, "doc_id", "left_semi")

    # Stage 2 — near-dup clusters over the exact-dedup survivors;
    # drop every non-representative cluster member
    pairs = dedup.jaccard_ngram_pairs(
        surv1, threshold=JACCARD_THRESHOLD, stop_shingle_df=STOP_SHINGLE_DF
    ).select("a_id", "b_id")
    losers = (
        dedup.connected_components(pairs)
        .filter(col("node") != col("cluster_id"))
        .select(col("node").alias("doc_id"))
    )
    surv2 = surv1.join(losers, "doc_id", "left_anti").localCheckpoint()

    # Stage 3 — span detection ONCE over survivors + eval excerpts
    # (the d19 eval twins, built from the ORIGINAL corpus: the eval
    # set is external and does not dedup away with its source doc)
    evals = docs.filter(
        col("doc_id") % D19_EXCERPT_MOD == D19_EXCERPT_REM
    ).select(
        (col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("zqx-"),
            F.substring("text", D19_EXCERPT_FROM, D19_EXCERPT_LEN),
            F.lit("-xqz"),
        ).alias("text"),
    )
    spans = substring_span_pairs(
        surv2.select("doc_id", "text").unionByName(evals),
        min_len=D19_MIN_LEN,
        max_gram_occ=D19_MAX_GRAM_OCC,
    ).localCheckpoint()  # detector output staged ONCE, consumed twice
    tt = spans.filter(col("b_id") < 1_000_000).select(
        "b_id", "b_start", "run_len"
    )  # train↔train: cut the HIGHER id (d20 policy)
    te = spans.filter(
        (col("b_id") >= 1_000_000) & (col("a_id") < 1_000_000)
    ).select(
        col("a_id").alias("b_id"),
        col("a_start").alias("b_start"),
        "run_len",
    )  # train↔eval: cut the TRAIN side (p18 policy)
    cleaned = remove_spans(surv2, tt.unionByName(te))
    surv3 = (
        surv2.join(cleaned.select("doc_id", "clean_text"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(col("clean_text"), col("text")).alias("text"),
        )
        .localCheckpoint()
    )

    # Stage 4 — model-based quality filter on the CLEANED text
    q = textops.linear_quality_score(
        surv3, weights_micro=T28_WEIGHTS_MICRO, bias_micro=T28_BIAS_MICRO
    ).filter(col("is_quality"))

    # Stage 5 — token-budget selection (quality-descending prefix).
    # token_counter="bpe" budgets in exact BPE tokens of the CLEANED
    # text (operators/bpe.py — the currency training actually spends,
    # VERDICT r08 #2); the candidate ORDER (logit desc, doc_id) is
    # currency-independent, so ws/bpe selections are nested prefixes.
    if token_counter == "bpe":
        from llamadb_spark.operators.bpe import bpe_token_counts

        bt = bpe_token_counts(surv3).select(
            "doc_id", col("bpe_tokens").alias("budget_tokens")
        )
        qb = q.select("doc_id", "logit_micro").join(bt, "doc_id")
    else:
        qb = q.select(
            "doc_id", col("n_tokens").alias("budget_tokens"), "logit_micro"
        )
    sel = distributed_cumsum(
        qb,
        [col("logit_micro").desc(), col("doc_id").asc()],
        "budget_tokens",
        out_col="cum_tokens",
    ).filter(col("cum_tokens") <= P19_TOKEN_BUDGET)

    # Stage 6 — pack the selected docs, assign loader shards
    packed = packing.pack_sequences(
        surv3.join(sel.select("doc_id"), "doc_id", "left_semi"),
        budget=P03_BUDGET,
    )
    return (
        packed.join(sel.select("doc_id", "logit_micro"), "doc_id")
        .join(surv3.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            bucket_hash(col("doc_id"), buckets=P19_N_SHARDS).alias("shard"),
            "n_tokens",
            "logit_micro",
            (
                (col("bin_fill") <= P03_BUDGET)
                | (col("n_tokens") > P03_BUDGET)
            ).alias("fits_budget"),
            (col("bin_fill") >= col("n_tokens")).alias("fill_covers_doc"),
        )
    )


ORACLE_P19 = rf"""
WITH RECURSIVE surv1 AS (
  SELECT d.doc_id, d.text, d.source FROM documents d
  JOIN (
    SELECT min(doc_id) AS doc_id FROM documents
    GROUP BY sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
  ) k USING (doc_id)
),
jtoks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM surv1
),
jpos AS (
  SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS i
  FROM jtoks
),
jsh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM jpos a
  JOIN jpos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN jpos c ON a.doc_id = c.doc_id AND c.i = a.i + 2
),
jsizes AS (SELECT doc_id, count(*) AS n_sh FROM jsh GROUP BY 1),
jkept AS (
  SELECT doc_id, shingle FROM jsh
  WHERE shingle IN (SELECT shingle FROM jsh GROUP BY shingle
                    HAVING count(*) <= {STOP_SHINGLE_DF})
),
jinter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
  FROM jkept a JOIN jkept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT a_id, b_id FROM jinter
  JOIN jsizes sa ON sa.doc_id = a_id
  JOIN jsizes sb ON sb.doc_id = b_id
  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM prs
  UNION ALL
  SELECT b_id, a_id FROM prs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
losers AS (
  SELECT u AS doc_id FROM reach GROUP BY u HAVING min(v) < u
),
surv2 AS (
  SELECT * FROM surv1 WHERE doc_id NOT IN (SELECT doc_id FROM losers)
),
spancorpus AS (
  SELECT doc_id, text FROM surv2
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         'zqx-' || substr(text, {D19_EXCERPT_FROM}, {D19_EXCERPT_LEN})
             || '-xqz' AS text
  FROM documents WHERE doc_id % {D19_EXCERPT_MOD} = {D19_EXCERPT_REM}
),
grams AS (
  SELECT doc_id, p AS pos,
         substr(text, CAST(p AS INT), {D19_MIN_LEN}) AS gram
  FROM spancorpus, unnest(generate_series(1, length(text) - {D19_MIN_LEN - 1}))
       AS t(p)
  WHERE length(text) >= {D19_MIN_LEN}
),
grams_ok AS (
  SELECT * FROM grams
  QUALIFY count(*) OVER (PARTITION BY gram) <= {D19_MAX_GRAM_OCC}
),
m AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.pos AS a_pos, b.pos AS b_pos, a.pos - b.pos AS diag
  FROM grams_ok a JOIN grams_ok b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
),
spans AS (
  SELECT a_id, b_id, min(a_pos) AS a_start, min(b_pos) AS b_start,
         count(*) + {D19_MIN_LEN - 1} AS run_len
  FROM (
    SELECT *, a_pos - row_number() OVER (
      PARTITION BY a_id, b_id, diag ORDER BY a_pos) AS grp
    FROM m
  )
  GROUP BY a_id, b_id, diag, grp
),
iv AS (
  SELECT b_id AS doc_id, b_start AS s, b_start + run_len AS e
  FROM spans WHERE b_id < 1000000
  UNION ALL
  SELECT a_id, a_start, a_start + run_len
  FROM spans WHERE b_id >= 1000000 AND a_id < 1000000
),
flagged AS (
  SELECT *, CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                 THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max_e
    FROM iv
  )
),
merged AS (
  SELECT doc_id, isl, min(s) AS s, max(e) AS e
  FROM (
    SELECT *, sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e)
              AS isl
    FROM flagged
  )
  GROUP BY doc_id, isl
),
gaps AS (
  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
           AS gs,
         s AS ge
  FROM merged
  UNION ALL
  SELECT m2.doc_id, max(m2.e) AS gs, any_value(length(c.text) + 1) AS ge
  FROM merged m2 JOIN surv2 c ON c.doc_id = m2.doc_id
  GROUP BY m2.doc_id
),
pieces AS (
  SELECT g.doc_id, g.gs,
         substr(c.text, CAST(g.gs AS INT),
                CAST(greatest(g.ge - g.gs, 0) AS INT)) AS piece
  FROM gaps g JOIN surv2 c ON c.doc_id = g.doc_id
),
cleanedtext AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY gs) AS clean_text
  FROM pieces GROUP BY doc_id
),
surv3 AS (
  SELECT s.doc_id, s.source, coalesce(c.clean_text, s.text) AS text
  FROM surv2 s LEFT JOIN cleanedtext c USING (doc_id)
),
qtoks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS tok
  FROM surv3
),
w AS (SELECT * FROM (VALUES {_T28_VALUES}) AS t(tok, w_micro)),
q AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(coalesce(w.w_micro, 0)) + {T28_BIAS_MICRO} AS BIGINT)
           AS logit_micro
  FROM qtoks LEFT JOIN w USING (tok)
  GROUP BY doc_id
  HAVING (sum(coalesce(w.w_micro, 0)) + {T28_BIAS_MICRO}) > 0
),
c AS (
  SELECT doc_id, n_tokens, logit_micro,
         sum(n_tokens) OVER (ORDER BY logit_micro DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM q
)
SELECT s.doc_id, v.source,
       CAST(((s.doc_id % 100003) * 2654435761) % {P19_N_SHARDS} AS BIGINT)
         AS shard,
       s.n_tokens, s.logit_micro,
       TRUE AS fits_budget, TRUE AS fill_covers_doc
FROM c s JOIN surv3 v USING (doc_id)
WHERE s.cum_tokens <= {P19_TOKEN_BUDGET}
"""


#: s16 PQ bands: measured PQ+rerank recall@5 is 0.90/0.97/0.90 mean
#: and 0.60/0.80/0.80 min at sf0.001/0.01/0.1 (m=16 subspaces, 32
#: codes, shortlist 50, deterministic xxhash64 seeds) — the 0.2/0.5
#: bands leave 3x/1.8x margin.
S16_MIN_RECALL = 0.2
S16_MIN_MEAN_RECALL = 0.5


def s16_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) with the s03
    banded contract: PQ-ADC shortlist → exact rerank; output per
    query = exact top-1 neighbor + cosine (DuckDB-recomputable, the
    s01 machinery) + booleans claiming per-query and mean recall@k of
    the PQ path against the exact top-k. The codes are m=16 small
    ints per vector — the 16x index-size reduction that makes
    billion-vector search storable; the oracle recomputes the exact
    side and claims TRUE."""
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    emb = _emb(spark, sf_dir)
    # iters=1 (same move as s03): the second Lloyd pass buys no
    # recall vs the bands — measured with iters=1: mean 0.83-0.95,
    # min 0.60-0.80 across sf0.001/0.01/0.1, still 3x above the
    # 0.2/0.5 bands — and costs a full corpus pass + collect
    approx = similarity.pq_rerank_topk(emb, KNN_QUERY_IDS, k=KNN_K, iters=1)
    exact = similarity.knn_bruteforce(
        emb, KNN_QUERY_IDS, k=KNN_K
    ).localCheckpoint()
    hits = (
        approx.join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    top1 = exact.filter(col("rank") == 1).select(
        "query_id",
        col("neighbor_id").alias("exact_top1"),
        col("cos").alias("top1_cos"),
    )
    w_all = Window.partitionBy()
    return top1.join(hits, "query_id", "left").select(
        "query_id",
        "exact_top1",
        "top1_cos",
        (
            F.coalesce(col("n_hit"), F.lit(0))
            >= F.lit(float(S16_MIN_RECALL)) * KNN_K
        ).alias("recall_ok"),
        (
            F.avg(
                F.coalesce(col("n_hit"), F.lit(0)) / F.lit(float(KNN_K))
            ).over(w_all)
            >= S16_MIN_MEAN_RECALL
        ).alias("mean_recall_ok"),
    )


ORACLE_S16 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS q_v FROM e
      WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q_v, e.v), 6) AS cos
  FROM q, e WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id AS exact_top1, cos AS top1_cos,
       TRUE AS recall_ok, TRUE AS mean_recall_ok
FROM ranked WHERE rnk = 1
"""


#: s17 IVF-PQ bands: measured recall@5 at (cells=16, nprobe=8, m=16,
#: codes=32, shortlist=200, iters=1) is mean 0.775-0.800 / min 0.40
#: across sf0.001/0.01/0.1 — IDENTICAL to s03's IVF-exact recall at
#: the same nprobe (measured side by side): the PQ shortlist + exact
#: rerank loses nothing within the probed cells. Same 0.2/0.5 bands
#: as s03, leaving 2x / 1.55x margin.
S17_MIN_RECALL = 0.2
S17_MIN_MEAN_RECALL = 0.5
S17_NPROBE = 8
S17_SHORTLIST = 200


def s17_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (VERDICT r07 #6 — the production 100 TB shape,
    bucketed AND compressed): s03's coarse cells bound candidates to
    nprobe/K of the corpus, s16's PQ-ADC scores only those candidates
    from m-int codes, exact rerank of the shortlist. Banded contract
    like s03/s16: exact top-1 + cosine (DuckDB-recomputable) plus
    recall-band booleans the oracle claims TRUE. Measured: recall
    equals s03's at matched probe cost (see band constants)."""
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    emb = _emb(spark, sf_dir)
    approx = similarity.ivfpq_topk(
        emb, KNN_QUERY_IDS, k=KNN_K,
        shortlist=S17_SHORTLIST, n_cells=16, nprobe=S17_NPROBE, iters=1,
    )
    exact = similarity.knn_bruteforce(
        emb, KNN_QUERY_IDS, k=KNN_K
    ).localCheckpoint()
    hits = (
        approx.join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    top1 = exact.filter(col("rank") == 1).select(
        "query_id",
        col("neighbor_id").alias("exact_top1"),
        col("cos").alias("top1_cos"),
    )
    w_all = Window.partitionBy()
    return top1.join(hits, "query_id", "left").select(
        "query_id",
        "exact_top1",
        "top1_cos",
        (
            F.coalesce(col("n_hit"), F.lit(0))
            >= F.lit(float(S17_MIN_RECALL)) * KNN_K
        ).alias("recall_ok"),
        (
            F.avg(
                F.coalesce(col("n_hit"), F.lit(0)) / F.lit(float(KNN_K))
            ).over(w_all)
            >= S17_MIN_MEAN_RECALL
        ).alias("mean_recall_ok"),
    )


ORACLE_S17 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS q_v FROM e
      WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q_v, e.v), 6) AS cos
  FROM q, e WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id AS exact_top1, cos AS top1_cos,
       TRUE AS recall_ok, TRUE AS mean_recall_ok
FROM ranked WHERE rnk = 1
"""


QUERIES = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_jaccard_ngram": d02_jaccard_ngram,
    "d03_minhash_lsh": d03_minhash_lsh,
    "d06_dedup_clusters": d06_dedup_clusters,
    "d07_dedup_apply": d07_dedup_apply,
    "d04_simhash": d04_simhash,
    "d05_embed_neardup": d05_embed_neardup,
    "s01_knn_bruteforce": s01_knn_bruteforce,
    "s02_lsh_ann": s02_lsh_ann,
    "s03_ivf_ann": s03_ivf_ann,
    "t01_langid": t01_langid,
    "t02_quality_score": t02_quality_score,
    "t03_token_count": t03_token_count,
    "t04_fingerprint": t04_fingerprint,
    "t05_vocab_topk": t05_vocab_topk,
    "t06_repetition": t06_repetition,
    "m01_multimodal_meta": m01_multimodal_meta,
    "m02_decode_resize": m02_decode_resize,
    "t07_pii_scrub": t07_pii_scrub,
    "t08_chunk_documents": t08_chunk_documents,
    "p01_stratified_sample": p01_stratified_sample,
    "p02_contamination": p02_contamination,
    "p03_pack_sequences": p03_pack_sequences,
    "s04_embed_quantize": s04_embed_quantize,
    "t09_tfidf_rank": t09_tfidf_rank,
    "s05_label_centroids": s05_label_centroids,
    "p04_profile": p04_profile,
    "t10_token_entropy": t10_token_entropy,
    "s06_centroid_sim": s06_centroid_sim,
    "p05_tombstone_delete": p05_tombstone_delete,
    "t11_langid_confusion": t11_langid_confusion,
    "t12_pmi_collocations": t12_pmi_collocations,
    "t13_heavy_hitters": t13_heavy_hitters,
    "t27_bm25_rank": t27_bm25_rank,
    "s15_hybrid_rrf": s15_hybrid_rrf,
    "t14_unigram_logprob": t14_unigram_logprob,
    "t15_doc_keywords": t15_doc_keywords,
    "t16_bigram_logprob": t16_bigram_logprob,
    "t17_zipf_slope": t17_zipf_slope,
    "s11_rerank_ann": s11_rerank_ann,
    "s07_centroid_classify": s07_centroid_classify,
    "s08_embed_dim_stats": s08_embed_dim_stats,
    "s09_pca_project": s09_pca_project,
    "s10_mmr_rerank": s10_mmr_rerank,
    "p06_dataset_split": p06_dataset_split,
    "p07_mixture_sample": p07_mixture_sample,
    "p08_dq_report": p08_dq_report,
    "p09_exact_k_sample": p09_exact_k_sample,
    "p11_weighted_sample": p11_weighted_sample,
    "p10_leakproof_split": p10_leakproof_split,
    "m03_frame_sample": m03_frame_sample,
    "m04_payload_chunks": m04_payload_chunks,
    "m05_media_dedup": m05_media_dedup,
    "d08_semantic_dedup_apply": d08_semantic_dedup_apply,
    "d12_semantic_dedup_lsh": d12_semantic_dedup_lsh,
    "d13_incremental_dedup": d13_incremental_dedup,
    "d14_containment_pairs": d14_containment_pairs,
    "g01_pagerank": g01_pagerank,
    "g02_degree_histogram": g02_degree_histogram,
    "t19_token_yield": t19_token_yield,
    "t20_quality_deciles": t20_quality_deciles,
    "d09_shared_longrun": d09_shared_longrun,
    "d10_dedup_clusters_star": d10_dedup_clusters_star,
    "d11_editdist_pairs": d11_editdist_pairs,
    "m06_media_filter": m06_media_filter,
    "m07_crossmodal_knn": m07_crossmodal_knn,
    "p12_dup_weights": p12_dup_weights,
    "t21_source_overlap": t21_source_overlap,
    "t22_source_divergence": t22_source_divergence,
    "p13_winsorize": p13_winsorize,
    "t23_token_fertility": t23_token_fertility,
    "d15_cluster_sizes": d15_cluster_sizes,
    "g03_triangle_count": g03_triangle_count,
    "p14_shard_balance": p14_shard_balance,
    "p15_token_budget_select": p15_token_budget_select,
    "p16_epoch_upsample": p16_epoch_upsample,
    "p17_alpha_mixture": p17_alpha_mixture,
    "s13_filtered_knn": s13_filtered_knn,
    "d16_threshold_sweep": d16_threshold_sweep,
    "t24_quality_bands": t24_quality_bands,
    "s14_silhouette": s14_silhouette,
    "t25_vocab_growth": t25_vocab_growth,
    "t26_compression_ratio": t26_compression_ratio,
    "d17_pair_provenance": d17_pair_provenance,
    "d18_minhash_calibration": d18_minhash_calibration,
    "d19_substring_spans": d19_substring_spans,
    "d20_substring_apply": d20_substring_apply,
    "t28_linear_quality": t28_linear_quality,
    "t29_gopher_repetition": t29_gopher_repetition,
    "t30_bpe_tokens": t30_bpe_tokens,
    "d21_duplication_profile": d21_duplication_profile,
    "d22_intra_doc_repeats": d22_intra_doc_repeats,
    "d23_intra_doc_apply": d23_intra_doc_apply,
    "d24_quality_dedup_reps": d24_quality_dedup_reps,
    "d25_line_dedup": d25_line_dedup,
    "p18_span_decontaminate": p18_span_decontaminate,
    "s16_pq_ann": s16_pq_ann,
    "s17_ivfpq_ann": s17_ivfpq_ann,
    "s12_cluster_balance": s12_cluster_balance,
    "p19_pipeline_manifest": p19_pipeline_manifest,
}

ORACLES = {
    "d01_exact_dedup": ORACLE_D01,
    "d02_jaccard_ngram": ORACLE_D02,
    "d05_embed_neardup": ORACLE_D05,
    "d06_dedup_clusters": ORACLE_D06,
    "d13_incremental_dedup": ORACLE_D13,
    "d14_containment_pairs": ORACLE_D14,
    "g01_pagerank": ORACLE_G01,
    "g02_degree_histogram": ORACLE_G02,
    "t19_token_yield": ORACLE_T19,
    "t20_quality_deciles": ORACLE_T20,
    "d07_dedup_apply": ORACLE_D07,
    "s01_knn_bruteforce": ORACLE_S01,
    "s03_ivf_ann": ORACLE_S03,
    "t13_heavy_hitters": ORACLE_T13,
    "t27_bm25_rank": ORACLE_T27,
    "s15_hybrid_rrf": ORACLE_S15,
    "d18_minhash_calibration": ORACLE_D18,
    "d19_substring_spans": ORACLE_D19,
    "d20_substring_apply": ORACLE_D20,
    "t28_linear_quality": ORACLE_T28,
    "t29_gopher_repetition": ORACLE_T29,
    "t30_bpe_tokens": ORACLE_T30,
    "d21_duplication_profile": ORACLE_D21,
    "d22_intra_doc_repeats": ORACLE_D22,
    "d23_intra_doc_apply": ORACLE_D23,
    "d24_quality_dedup_reps": ORACLE_D24,
    "d25_line_dedup": ORACLE_D25,
    "p18_span_decontaminate": ORACLE_P18,
    "p19_pipeline_manifest": ORACLE_P19,
    "s16_pq_ann": ORACLE_S16,
    "s17_ivfpq_ann": ORACLE_S17,
    "d03_minhash_lsh": ORACLE_D03,
    "d04_simhash": ORACLE_D04,
    "p03_pack_sequences": ORACLE_P03,
    "s09_pca_project": ORACLE_S09,
    "s10_mmr_rerank": ORACLE_S10,
    "s12_cluster_balance": ORACLE_S12,
    "t26_compression_ratio": ORACLE_T26,
    "m07_crossmodal_knn": ORACLE_M07,
    "t01_langid": ORACLE_T01,
    "t02_quality_score": ORACLE_T02,
    "t03_token_count": ORACLE_T03,
    "t04_fingerprint": ORACLE_T04,
    "t05_vocab_topk": ORACLE_T05,
    "t06_repetition": ORACLE_T06,
    "m01_multimodal_meta": ORACLE_M01,
    "m02_decode_resize": ORACLE_M02,
    "t07_pii_scrub": ORACLE_T07,
    "t08_chunk_documents": ORACLE_T08,
    "p01_stratified_sample": ORACLE_P01,
    "p02_contamination": ORACLE_P02,
    "s04_embed_quantize": ORACLE_S04,
    "t09_tfidf_rank": ORACLE_T09,
    "s05_label_centroids": ORACLE_S05,
    "p04_profile": ORACLE_P04,
    "t10_token_entropy": ORACLE_T10,
    "s06_centroid_sim": ORACLE_S06,
    "p05_tombstone_delete": ORACLE_P05,
    "t11_langid_confusion": ORACLE_T11,
    "t12_pmi_collocations": ORACLE_T12,
    "t14_unigram_logprob": ORACLE_T14,
    "t15_doc_keywords": ORACLE_T15,
    "t16_bigram_logprob": ORACLE_T16,
    "t17_zipf_slope": ORACLE_T17,
    "s11_rerank_ann": ORACLE_S11,
    "s07_centroid_classify": ORACLE_S07,
    "s08_embed_dim_stats": ORACLE_S08,
    "p06_dataset_split": ORACLE_P06,
    "p07_mixture_sample": ORACLE_P07,
    "p08_dq_report": ORACLE_P08,
    "p09_exact_k_sample": ORACLE_P09,
    "p11_weighted_sample": ORACLE_P11,
    "p10_leakproof_split": ORACLE_P10,
    "m06_media_filter": ORACLE_M06,
    "p12_dup_weights": ORACLE_P12,
    "t21_source_overlap": ORACLE_T21,
    "t22_source_divergence": ORACLE_T22,
    "p13_winsorize": ORACLE_P13,
    "t23_token_fertility": ORACLE_T23,
    "d15_cluster_sizes": ORACLE_D15,
    "g03_triangle_count": ORACLE_G03,
    "p14_shard_balance": ORACLE_P14,
    "p15_token_budget_select": ORACLE_P15,
    "p16_epoch_upsample": ORACLE_P16,
    "p17_alpha_mixture": ORACLE_P17,
    "s13_filtered_knn": ORACLE_S13,
    "d16_threshold_sweep": ORACLE_D16,
    "t24_quality_bands": ORACLE_T24,
    "s14_silhouette": ORACLE_S14,
    "t25_vocab_growth": ORACLE_T25,
    "d17_pair_provenance": ORACLE_D17,
    "m03_frame_sample": ORACLE_M03,
    "m04_payload_chunks": ORACLE_M04,
    "m05_media_dedup": ORACLE_M05,
    "d08_semantic_dedup_apply": ORACLE_D08,
    "d09_shared_longrun": ORACLE_D09,
    "d10_dedup_clusters_star": ORACLE_D06,
    "d11_editdist_pairs": ORACLE_D11,
}
