"""LLM-data-pipeline extension operators — OP-X1…X6 (SURVEY.md §2.8).

The north-star operator family over ``documents`` (free text) and
``embeddings`` (array<float>[64]): dedup, near-dup, similarity search,
text analysis, multimodal plumbing, classification at scale.

Scale posture (100 TB):

- Exact dedup (X1) groups on a 256-bit content hash, not the raw text —
  the shuffle moves 32-byte keys instead of documents.
- Near-dup (X2) uses a shingle inverted-index join (explode → join on
  shingle → count per pair), never an all-pairs cross join: cost is
  Σ df(shingle)², which stays sparse because 3-gram shingles are
  high-cardinality. A MinHashLSH variant covers the case where even the
  inverted index is too hot (banding keeps candidate pairs sub-quadratic).
- Similarity search (X3) ships a brute-force top-k as the correctness
  baseline and a random-hyperplane LSH bucketed variant as the scale
  path (candidates only join within a bucket).
- Everything stays in native Column expressions / higher-order functions
  (JVM, whole-stage codegen) except the one deliberately-pandas_udf
  scorer (X6), which demonstrates the Arrow batch path.

FP parity with the DuckDB oracle: every dot product folds left-to-right
over ``double`` (both engines do a sequential IEEE-754 fold → bit-exact),
and displayed floats are rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import round_half_up, sql_round_half_up
from ..operators.checkpoint import ckpt
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Shared tokenization (must stay in lockstep with the oracle SQL + the
# pandas_udf in X6: lowercase, split on non-alphanumeric, drop empties).
# ---------------------------------------------------------------------------

def tokens_col(text: str | F.Column = "text") -> F.Column:
    """Lowercase → split on non-[a-z0-9] → drop empties.

    Cross-engine contract (property-tested vs ``SQL_TOKENS`` in
    tests/test_property_kernels.py): identical token streams for every
    ASCII string. The domain is ASCII BY DESIGN — unicode case-folding
    genuinely diverges between engines (Java ``lower('İ')`` yields
    'i' + U+0307 so the combining mark splits a token; DuckDB's yields
    a bare 'i'), so a non-ASCII corpus must be normalized or the
    divergent rows quarantined before the x2/x4 oracles can be
    trusted; a companion test asserts the documents corpus is ASCII at
    every shipped SF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")


#: DuckDB expression mirroring ``tokens_col`` exactly.
SQL_TOKENS = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
              "x -> x <> '')")


def shingles_col(toks: F.Column, n: int = 3) -> F.Column:
    """Distinct n-gram shingles of a token array (space-joined).

    Built from n shifted ``slice``s folded with ``zip_with`` — the token
    expression is referenced a CONSTANT number of times. The naive
    ``transform(sequence, i -> element_at(toks, i+j))`` form inlines
    (and re-evaluates) the tokenizer 3×n_grams times per row in Spark's
    interpreted higher-order path — measured 20×+ slower.
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, j + 1, m),
                           lambda acc, x: F.concat_ws(" ", acc, x))
    return F.array_distinct(grams)


def sql_ngrams(n: int) -> str:
    """DuckDB n-gram comprehension over a token list named ``t`` — the
    single source for every shingle/n-gram oracle in this module."""
    parts = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]"
                               for j in range(n))
    return (f"CASE WHEN len(t) >= {n} THEN list_distinct("
            f"[{parts} FOR i IN range(1, len(t) - {n - 2})]) "
            f"ELSE [] END")


#: DuckDB 3-gram shingle list over a token list named ``t``.
SQL_SHINGLES = sql_ngrams(3)


# ---------------------------------------------------------------------------
# OP-X1 — exact dedup: content hash, deterministic survivor
# ---------------------------------------------------------------------------

@register(
    "x1_exact_dedup",
    oracle="""
    SELECT doc_id, lang, source, n_chars, dup_count
    FROM (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY text) AS dup_count
      FROM documents
    ) WHERE rn = 1
    """,
)
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X1 — exact dedup with a deterministic survivor (min doc_id per
    content group), the first stage of any training-data pipeline.

    Spark groups on ``sha2(text, 256)`` so the shuffle key is 32 bytes
    regardless of document size — at 100 TB the hash is what moves, not
    the text. The oracle partitions by the raw text (equivalent modulo
    SHA-256 collisions). Survivor choice is a window with a total order
    (SURVEY.md §7 hard-part 4: never an orderless ``first()``).
    """
    d = _t(spark, sf_dir, "documents")
    h = d.withColumn("content_hash", F.sha2(F.col("text"), 256))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (h.select(
                "doc_id", "lang", "source", "n_chars",
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(
                    Window.partitionBy("content_hash")).alias("dup_count"))
             .filter(F.col("rn") == 1)
             .drop("rn"))


# ---------------------------------------------------------------------------
# OP-X2 — near-duplicate detection
# ---------------------------------------------------------------------------

#: Shared CTE chain (ends in ``jpairs(doc_a, doc_b, n_common, jac)``):
#: the exact-Jaccard near-dup pairs at threshold 0.8, reused by the
#: pair query and the cluster query so the two oracles cannot drift.
_SQL_JPAIRS = f"""
    toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES} AS s FROM toks
    ),
    tok AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    cpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM tok a JOIN tok b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jpairs AS (
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jac
      FROM cpairs
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    )"""


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs (doc_a < doc_b, Jaccard ≥ 0.8) — the Spark
    twin of ``_SQL_JPAIRS``; shared by the pair and cluster queries."""
    d = _t(spark, sf_dir, "documents")
    # The repartition is a materialization barrier as much as a spread:
    # the shingle arrays are computed ONCE and shuffled, instead of the
    # tokenize+shingle expression tree being re-inlined into the sizes
    # relation and both sides of the self-join.
    sh = d.select(
        "doc_id", shingles_col(tokens_col("text")).alias("s")) \
         .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # Carry |A| through the explode instead of re-joining a sizes
    # relation afterwards: one int per index row buys back two joins
    # after the pair aggregation (measured ~15% on the full query; at
    # scale it also removes the risk of the sizes side outgrowing the
    # broadcast threshold and degrading to a third shuffle).
    tok = sh.select("doc_id", F.size("s").alias("n"),
                    F.explode("s").alias("shingle"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("n_common"),
                   F.min(F.col("a.n")).alias("na"),
                   F.min(F.col("b.n")).alias("nb")))
    jac = (F.col("n_common") * F.lit(1.0)
           / (F.col("na") + F.col("nb") - F.col("n_common")))
    return (pairs.filter(jac >= 0.8)
                 .select("doc_a", "doc_b", "n_common", jac.alias("jac")))


@register(
    "x2_neardup_jaccard",
    oracle=f"""
    WITH {_SQL_JPAIRS}
    SELECT doc_a, doc_b, n_common, (CASE WHEN (jac) < 0 THEN -FLOOR(ABS(jac) * 1000000.0 + 0.5) ELSE FLOOR(ABS(jac) * 1000000.0 + 0.5) END / 1000000.0 + 0.0) AS jaccard
    FROM jpairs
    """,
)
def x2_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 — near-dup pairs by exact 3-gram-shingle Jaccard ≥ 0.8.

    Inverted-index join, NOT a cross join: explode shingles, self-join on
    the shingle, count common shingles per pair, then Jaccard =
    |∩| / (|A|+|B|-|∩|). Cost is Σ df(s)² over shingles — sparse because
    3-grams are near-unique — vs O(N²) for all-pairs. This is the
    oracle-checkable exact form; ``x2_neardup_minhash_lsh`` is the
    banded approximation for when the index itself is too large.
    """
    return (_jaccard_pairs(spark, sf_dir)
            .select("doc_a", "doc_b", "n_common",
                    round_half_up(F.col("jac"), 6).alias("jaccard")))


@register(
    "x2_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_JPAIRS},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM jpairs
      UNION
      SELECT doc_b, doc_a FROM jpairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_survivor
    FROM comp
    """,
)
def x2_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 — near-dup *clusters*: the pair list is not what a dedup
    pipeline keeps — it keeps one survivor per connected component of
    the near-dup graph (A~B, B~C ⇒ {A,B,C} is one cluster even when
    A~C itself is below threshold). Components via iterative min-label
    propagation (``operators/graph.py``: one shuffle per round, rounds =
    cluster diameter ≈ 2-3 for duplicate cliques; lineage truncated per
    round). Survivor = min doc_id, so the choice is total-ordered and
    retry-stable. The oracle replays reachability with a recursive CTE —
    transitive closure is affordable there because only near-dup pairs
    enter the recursion."""
    from ..operators.graph import connected_components

    pairs = _jaccard_pairs(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b")
    wsz = Window.partitionBy("component")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(wsz).alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_survivor"))


@register(
    "x2_neardup_clusters_contracting",
    oracle=f"""
    WITH RECURSIVE {_SQL_JPAIRS},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM jpairs
      UNION
      SELECT doc_b, doc_a FROM jpairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_survivor
    FROM comp
    """,
)
def x2_neardup_clusters_contracting(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """OP-X2 — the SAME near-dup clusters via large-star/small-star
    contraction (Kiveris et al., SoCC'14; ``operators/graph.py``), the
    O(log²)-round algorithm that replaces min-label propagation when
    components can be DEEP (duplicate chains, web-graph-shaped dup
    structure) — propagation pays O(diameter) rounds, contraction does
    not. Oracle-exact against the identical recursive-CTE reachability
    oracle as x2_neardup_clusters, so both physical strategies are
    pinned to one semantic contract."""
    from ..operators.graph import connected_components_contracting

    pairs = _jaccard_pairs(spark, sf_dir)
    cc = connected_components_contracting(pairs, "doc_a", "doc_b")
    wsz = Window.partitionBy("component")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(wsz).alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_survivor"))


@register(
    "x2_neardup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_JPAIRS}
    SELECT COUNT(*) AS n_true,
           TRUE AS verified_subset,
           TRUE AS recall_ok
    FROM jpairs
    """,
)
def x2_neardup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (scale path) — MinHash + LSH banding, all in native SQL
    expressions (no MLlib dependency, no Python in the hot path).

    Per doc: 32 minhash values via ``min(xxhash64(shingle, seed_i))``;
    band into 8 bands × 4 rows; candidate pairs = docs sharing any band
    signature (a groupBy on the band hash — sub-quadratic); verify
    candidates with exact Jaccard. xxhash64 is engine-specific, so the
    pair list itself can't be SQL-replayed — instead the query emits a
    *quality report* the oracle can check exactly (VERDICT r2 item 3):
    the true pair count, that every reported pair survives exact
    verification (precision 1.0 by construction, asserted via
    anti-join), and that banding recall ≥ 0.5 (expected ≈ 0.985+ per
    pair at s ≥ 0.8 under the 8×4 s-curve; 0.5 keeps the assertion
    deterministic-in-practice on small SFs with a handful of planted
    pairs). The portable-md5 twin (x2_neardup_minhash_portable) keeps
    the pair-level oracle-exact check.
    """
    d = _t(spark, sf_dir, "documents")
    sh = d.select("doc_id",
                  shingles_col(tokens_col("text")).alias("s")) \
          .repartition(spark.sparkContext.defaultParallelism, "doc_id") \
          .filter(F.size("s") > 0)
    n_hashes, band_rows = 32, 4
    mh = sh.select(
        "doc_id", "s",
        F.array(*[
            F.array_min(F.transform(
                "s", lambda x: F.xxhash64(x, F.lit(i))))
            for i in range(n_hashes)
        ]).alias("sig"))
    bands = mh.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes // band_rows - 1)),
            lambda b: F.hash(F.slice(
                "sig", b * band_rows + 1, band_rows)))
        ).alias("band_idx", "band_hash"))
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    found = (cand.join(sa, "doc_a").join(sb, "doc_b")
                 .withColumn("jaccard", inter * F.lit(1.0) / union)
                 .filter(F.col("jaccard") >= 0.8)
                 .select("doc_a", "doc_b"))
    exact = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    n_true = exact.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    n_extra = (found.join(exact, ["doc_a", "doc_b"], "left_anti")
                    .agg(F.count(F.lit(1)).alias("n_extra")))
    # Three 1-row aggregates — the cross joins are bounded by contract.
    return (n_true.crossJoin(n_found).crossJoin(n_extra)
            .select("n_true",
                    (F.col("n_extra") == 0).alias("verified_subset"),
                    F.when(F.col("n_true") == 0, F.lit(True))
                     .otherwise(F.col("n_found")
                                >= 0.5 * F.col("n_true"))
                     .alias("recall_ok")))


def _portable_sig(d: DataFrame, n_hashes: int = 16) -> DataFrame:
    """Portable-md5 MinHash signatures ``(doc_id, sig)`` over any
    (doc_id, text) relation — byte-replayable in DuckDB (string MIN of
    salted md5 hex per hash index)."""
    spark = d.sparkSession
    sh = (d.select("doc_id", shingles_col(tokens_col("text")).alias("s"))
           .repartition(spark.sparkContext.defaultParallelism, "doc_id")
           .filter(F.size("s") > 0))

    def salted_md5(i: int):
        # Returns a UNARY lambda: a two-parameter lambda (even via a
        # default arg) is promoted by PySpark to the (element, index)
        # form, which would shadow the salt with the index Column.
        prefix = f"{i}:"
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    return sh.select(
        "doc_id",
        F.array(*[
            F.array_min(F.transform("s", salted_md5(i)))
            for i in range(n_hashes)
        ]).alias("sig"))


def _portable_bands(d: DataFrame) -> DataFrame:
    """Portable-md5 MinHash band hashes ``(doc_id, band_idx,
    band_hash)`` over any (doc_id, text) relation — the signature/band
    pipeline shared by x2_neardup_minhash_portable and the incremental
    ingest form, byte-replayable in DuckDB."""
    n_hashes, band_rows = 16, 4
    sig = _portable_sig(d, n_hashes)
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.md5(F.array_join(
                F.slice("sig", b * band_rows + 1, band_rows), "|"))
            for b in range(n_hashes // band_rows)
        ])).alias("band_idx", "band_hash"))


@register(
    "x2_neardup_minhash_portable",
    oracle=f"""
    WITH {_SQL_JPAIRS},
    shingled AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    mh AS (
      SELECT t1.doc_id, t.i,
             min(md5(CAST(t.i AS VARCHAR) || ':' || t1.shingle)) AS mh
      FROM (SELECT doc_id, unnest(s) AS shingle FROM shingled) t1
      CROSS JOIN range(16) t(i)
      GROUP BY t1.doc_id, t.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
      FROM mh GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, (CASE WHEN (j.jac) < 0 THEN -FLOOR(ABS(j.jac) * 1000000.0 + 0.5) ELSE FLOOR(ABS(j.jac) * 1000000.0 + 0.5) END / 1000000.0 + 0.0) AS jaccard
    FROM cand c JOIN jpairs j
      ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
    """,
)
def x2_neardup_minhash_portable(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """OP-X2 — MinHash+LSH with an *engine-portable* hash family:
    minhash_i = min over shingles of the md5 hex string salted with the
    hash index (string MIN is engine-independent), banded 4×4, verified
    with exact Jaccard. Same banding pipeline as
    ``x2_neardup_minhash_lsh`` (which keeps xxhash64 — the cheap JVM
    path for production) but every stage is replayable in DuckDB, so
    the full candidate-generation + verification pipeline is
    oracle-checked, not just spot-tested. 16 md5s per shingle is the
    price of portability; the xxhash64 twin is the scale recommendation.
    """
    bands = _portable_bands(_t(spark, sf_dir, "documents"))
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    verified = _jaccard_pairs(spark, sf_dir)
    return (cand.join(verified, ["doc_a", "doc_b"])
                .select("doc_a", "doc_b",
                        round_half_up(F.col("jac"), 6).alias("jaccard")))


@register(
    "x2_incremental_minhash",
    oracle=f"""
    WITH {_SQL_JPAIRS},
    shingled AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    mh AS (
      SELECT t1.doc_id, t.i,
             min(md5(CAST(t.i AS VARCHAR) || ':' || t1.shingle)) AS mh
      FROM (SELECT doc_id, unnest(s) AS shingle FROM shingled) t1
      CROSS JOIN range(16) t(i)
      GROUP BY t1.doc_id, t.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
      FROM mh GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT c.doc_id AS corpus_id, a.doc_id AS arrival_id
      FROM bands c JOIN bands a
        ON c.band_idx = a.band_idx AND c.band_hash = a.band_hash
       AND c.doc_id < 400 AND a.doc_id >= 400
    ),
    ver AS (
      SELECT cand.arrival_id, cand.corpus_id,
             {sql_round_half_up('j.jac', 6)} AS jac6
      FROM cand JOIN jpairs j
        ON j.doc_a = cand.corpus_id AND j.doc_b = cand.arrival_id
    ),
    best AS (
      SELECT arrival_id, corpus_id, jac6,
             ROW_NUMBER() OVER (PARTITION BY arrival_id
                                ORDER BY jac6 DESC, corpus_id) AS rn
      FROM ver
    )
    SELECT d.doc_id,
           b.corpus_id AS dup_of,
           b.jac6 AS jaccard,
           CASE WHEN b.corpus_id IS NULL THEN 'unique'
                ELSE 'near_dup_of_corpus' END AS verdict
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.arrival_id = d.doc_id
    """,
)
def x2_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (incremental form) — near-dedup a batch of arrivals
    against the published corpus's STORED MinHash band index, the
    ingest-time twin of x1_incremental_dedup for near-duplicates: at
    100 TB you never re-band the warehouse; the day's arrivals band
    locally and probe the persisted (band_idx, band_hash) index, only
    band-colliding (arrival, corpus) pairs are verified with exact
    Jaccard, and each arrival gets a deterministic best match (highest
    rounded Jaccard, then lowest corpus id) or 'unique'.

    Candidate generation is banding-pigeonhole (sub-quadratic, no
    all-pairs); verification joins the exact-Jaccard pair relation
    restricted to cross-split pairs, so only candidates pay the
    verify cost. The whole pipeline — signatures, band hashes,
    candidate join, verify, best-match choice — replays in the oracle
    byte-for-byte (portable md5 hash family), so the candidate set
    itself (including banding misses) is cross-engine exact."""
    d = _t(spark, sf_dir, "documents")
    # the band pipeline feeds both the corpus index and the arrival
    # probes; recomputing it per side measures FASTER than a ckpt
    # materialization here (the pipeline fuses into each side's scan,
    # and the split filters prune it to disjoint halves)
    bands = _portable_bands(d)
    corpus_idx = bands.filter(F.col("doc_id") < 400)
    arr_bands = bands.filter(F.col("doc_id") >= 400)
    cand = (corpus_idx.alias("c")
            .join(arr_bands.alias("a"),
                  (F.col("c.band_idx") == F.col("a.band_idx"))
                  & (F.col("c.band_hash") == F.col("a.band_hash")))
            .select(F.col("c.doc_id").alias("corpus_id"),
                    F.col("a.doc_id").alias("arrival_id"))
            .distinct())
    # Exact Jaccard restricted to CROSS-SPLIT pairs: the inverted-index
    # join takes corpus postings on one side and arrival postings on
    # the other, so corpus×corpus and arrival×arrival pair work —
    # quadratic in the big split at scale — is never generated. The
    # oracle's jpairs CTE computes the full relation (DuckDB prunes it
    # fine at test SF) and the ver CTE filters to the same cross-split
    # subset, so values are identical.
    sh = (d.select("doc_id",
                   shingles_col(tokens_col("text")).alias("s"))
           .repartition(spark.sparkContext.defaultParallelism, "doc_id"))
    tok = sh.select("doc_id", F.size("s").alias("n"),
                    F.explode("s").alias("shingle"))
    ca = tok.filter(F.col("doc_id") < 400).alias("ca")
    ar = tok.filter(F.col("doc_id") >= 400).alias("ar")
    cross = (ca.join(ar, F.col("ca.shingle") == F.col("ar.shingle"))
               .groupBy(F.col("ca.doc_id").alias("jc"),
                        F.col("ar.doc_id").alias("ja"))
               .agg(F.count(F.lit(1)).alias("n_common"),
                    F.min(F.col("ca.n")).alias("na"),
                    F.min(F.col("ar.n")).alias("nb")))
    jac = (F.col("n_common") * F.lit(1.0)
           / (F.col("na") + F.col("nb") - F.col("n_common")))
    jp = cross.filter(jac >= 0.8).select("jc", "ja", jac.alias("jac"))
    ver = (cand.join(jp, (jp["jc"] == cand["corpus_id"])
                         & (jp["ja"] == cand["arrival_id"]))
               .select("arrival_id", "corpus_id",
                       round_half_up(F.col("jac"), 6).alias("jac6")))
    w = Window.partitionBy("arrival_id").orderBy(
        F.col("jac6").desc(), "corpus_id")
    best = (ver.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    arrivals = d.filter(F.col("doc_id") >= 400).select("doc_id")
    return (arrivals
            .join(best, arrivals["doc_id"] == best["arrival_id"], "left")
            .select(
                "doc_id",
                F.col("corpus_id").alias("dup_of"),
                F.col("jac6").alias("jaccard"),
                F.when(F.col("corpus_id").isNull(), "unique")
                 .otherwise("near_dup_of_corpus").alias("verdict")))


# ---------------------------------------------------------------------------
# OP-X2 — band-index compaction: the dedup twin of x3_index_compaction
# (VERDICT r9 next-round #2 — completes ingest→serve→maintain for dedup)
# ---------------------------------------------------------------------------

@register(
    "x2_band_index_compaction",
    oracle=f"""
    WITH {_SQL_JPAIRS},
    jsym AS (SELECT doc_a AS x, doc_b AS y, jac FROM jpairs
             UNION ALL SELECT doc_b, doc_a, jac FROM jpairs),
    shingled AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    mh AS (
      SELECT t1.doc_id, t.i,
             min(md5(CAST(t.i AS VARCHAR) || ':' || t1.shingle)) AS mh
      FROM (SELECT doc_id, unnest(s) AS shingle FROM shingled) t1
      CROSS JOIN range(16) t(i)
      GROUP BY t1.doc_id, t.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
      FROM mh GROUP BY doc_id, i // 4
    ),
    w1cand AS (
      SELECT DISTINCT c.doc_id AS cid, a.doc_id AS aid
      FROM bands c JOIN bands a
        ON c.band_idx = a.band_idx AND c.band_hash = a.band_hash
      WHERE c.doc_id % 5 <= 2 AND a.doc_id % 5 = 3
    ),
    dropped AS (
      SELECT DISTINCT w.aid AS doc_id
      FROM w1cand w JOIN jsym j ON j.x = w.cid AND j.y = w.aid
    ),
    survivors AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 5 <= 3
        AND doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    pcand AS (
      SELECT DISTINCT c.doc_id AS cid, a.doc_id AS aid
      FROM bands c JOIN bands a
        ON c.band_idx = a.band_idx AND c.band_hash = a.band_hash
      WHERE c.doc_id % 5 <= 3 AND a.doc_id % 5 = 4
        AND c.doc_id IN (SELECT doc_id FROM survivors)
    ),
    pver AS (
      SELECT p.aid, p.cid,
             {sql_round_half_up('j.jac', 6)} AS jac6
      FROM pcand p JOIN jsym j ON j.x = p.cid AND j.y = p.aid
    ),
    best AS (
      SELECT aid, cid, jac6,
             ROW_NUMBER() OVER (PARTITION BY aid
                                ORDER BY jac6 DESC, cid) AS rn
      FROM pver
    ),
    stats AS (
      SELECT CAST((SELECT COUNT(*) FROM dropped) AS BIGINT)
               AS n_dropped_docs,
             CAST((SELECT COUNT(*) FROM survivors) AS BIGINT)
               AS n_survivors,
             CAST((SELECT COUNT(*) FROM bands WHERE doc_id % 5 <= 3)
               AS BIGINT) AS n_bands_before,
             CAST((SELECT COUNT(*) FROM bands WHERE doc_id % 5 <= 3
                   AND doc_id NOT IN (SELECT doc_id FROM dropped))
               AS BIGINT) AS n_bands_after
    )
    SELECT d.doc_id AS probe_id,
           b.cid AS dup_of,
           b.jac6 AS jaccard,
           CASE WHEN b.cid IS NULL THEN 'unique'
                ELSE 'dup_of_survivor' END AS verdict,
           TRUE AS decisions_match,
           s.n_dropped_docs, s.n_survivors,
           s.n_bands_before, s.n_bands_after,
           ((s.n_bands_before - s.n_bands_after) * 10
            >= s.n_bands_before) AS compaction_due
    FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 4) d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.aid = d.doc_id
    CROSS JOIN stats s
    """,
)
def x2_band_index_compaction(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """OP-X2 — COMPACTION of the near-dup band index, the missing
    maintain step of the dedup lifecycle (ingest:
    x2_incremental_minhash / its stream, serve: the probe path,
    maintain: HERE) — the x2 analogue of ``x3_index_compaction``
    (VERDICT r9 next-round #2). After dedup-at-ingest appends, the
    stored band + posting tables retain every known-dup document's
    rows, so the probe target grows with GROSS arrivals, not unique
    corpus size; compaction rewrites both keeping only
    verdict-unique survivors.

    Three document waves by ``doc_id % 5`` (modular, NOT an id-prefix
    split — the design-time degeneracy probe showed near-dup partners
    scatter across the whole id space, so a prefix wave has ZERO dups
    at sf0.1): corpus (0–2) is the published index; wave 1 (3) was
    ingested and verdicted against it (band-collide → exact-Jaccard
    ≥ 0.8, both directions — the corpus partner of an arrival may
    carry either the lower or higher id); its dup docs are the
    compaction debt. Wave 2 (4) are the probes served AFTER
    compaction.

    Two physically different serving plans run side by side, the
    x3_index_compaction falsifiability pattern: the COMPACTED index
    (the appended full index anti-joined to the dropped set — the
    rewrite of the stored state) and a FRESH index (re-banding the
    survivor documents from scratch). Identical survivor sets must
    imply identical candidate sets and therefore identical
    deterministic best matches (jac6 DESC, cid ASC), so
    ``decisions_match`` is hash-pinned TRUE per probe against the
    oracle's canonical single computation; ``compaction_due`` pins the
    integer trigger policy (dropped bands ≥ 10% of the index).

    Scale shape: banding is per-doc pure (recomputed per side — the
    r5 measurement: this pipeline is faster recomputed than ckpt'd);
    the expensive wave-1 verify pipeline funnels into the tiny
    ``dropped`` id set, which IS ckpt'd (multi-consumed, expensive
    lineage); the probe verify joins postings restricted to survivor
    × probe splits only, so no quadratic pair work outside
    band-collisions; every join key is a digest or an id — document
    text never shuffles."""
    d = _t(spark, sf_dir, "documents")
    wave = F.col("doc_id") % 5
    bands = _portable_bands(d)
    sh = (d.select("doc_id",
                   shingles_col(tokens_col("text")).alias("s"))
           .repartition(spark.sparkContext.defaultParallelism,
                        "doc_id"))
    tok = sh.select("doc_id", F.size("s").alias("n"),
                    F.explode("s").alias("shingle"))

    def collide(idx: DataFrame, probes: DataFrame) -> DataFrame:
        return (idx.alias("c")
                .join(probes.alias("a"),
                      (F.col("c.band_idx") == F.col("a.band_idx"))
                      & (F.col("c.band_hash")
                         == F.col("a.band_hash")))
                .select(F.col("c.doc_id").alias("cid"),
                        F.col("a.doc_id").alias("aid"))
                .distinct())

    def verified(left_tok: DataFrame, right_tok: DataFrame
                 ) -> DataFrame:
        cross = (left_tok.alias("ca")
                 .join(right_tok.alias("ar"),
                       F.col("ca.shingle") == F.col("ar.shingle"))
                 .groupBy(F.col("ca.doc_id").alias("jc"),
                          F.col("ar.doc_id").alias("ja"))
                 .agg(F.count(F.lit(1)).alias("n_common"),
                      F.min(F.col("ca.n")).alias("na"),
                      F.min(F.col("ar.n")).alias("nb")))
        jac = (F.col("n_common") * F.lit(1.0)
               / (F.col("na") + F.col("nb") - F.col("n_common")))
        return (cross.filter(jac >= 0.8)
                     .select(F.col("jc").alias("cid"),
                             F.col("ja").alias("aid"),
                             round_half_up(jac, 6).alias("jac6")))

    # wave-1 ingest verdicts vs the corpus index → the dropped set
    cand1 = collide(bands.filter(wave <= 2), bands.filter(wave == 3))
    ver1 = (cand1.join(verified(tok.filter(wave <= 2),
                                tok.filter(wave == 3)),
                       ["cid", "aid"]))
    dropped = ckpt(ver1.select(F.col("aid").alias("doc_id"))
                       .distinct())

    full_idx = bands.filter(wave <= 3)
    compacted_idx = full_idx.join(dropped, "doc_id", "left_anti")
    fresh_idx = _portable_bands(
        d.filter(wave <= 3).join(dropped, "doc_id", "left_anti"))

    # verified survivor×probe pairs, computed ONCE; the two servings
    # differ in their CANDIDATE dataflow (compacted vs fresh bands)
    tok_surv = (tok.filter(wave <= 3)
                   .join(dropped, "doc_id", "left_anti"))
    jp = verified(tok_surv, tok.filter(wave == 4))
    probe_bands = bands.filter(wave == 4)

    w = Window.partitionBy("aid").orderBy(F.col("jac6").desc(), "cid")

    def serve(idx: DataFrame) -> DataFrame:
        ver = collide(idx, probe_bands).join(jp, ["cid", "aid"])
        return (ver.withColumn("rn", F.row_number().over(w))
                   .filter(F.col("rn") == 1).drop("rn"))

    b_comp = serve(compacted_idx)
    b_fresh = serve(fresh_idx).select(
        F.col("aid").alias("f_aid"), F.col("cid").alias("f_cid"),
        F.col("jac6").alias("f_jac6"))

    stats = (dropped.agg(F.count(F.lit(1)).cast("long")
                          .alias("n_dropped_docs"))
             .crossJoin(d.filter(wave <= 3)
                         .join(dropped, "doc_id", "left_anti")
                         .agg(F.count(F.lit(1)).cast("long")
                               .alias("n_survivors")))
             .crossJoin(full_idx.agg(F.count(F.lit(1)).cast("long")
                                      .alias("n_bands_before")))
             .crossJoin(compacted_idx.agg(
                 F.count(F.lit(1)).cast("long")
                  .alias("n_bands_after"))))

    probes = d.filter(wave == 4).select("doc_id")
    out = (probes
           .join(b_comp, probes["doc_id"] == b_comp["aid"], "left")
           .join(b_fresh, probes["doc_id"] == F.col("f_aid"), "left")
           .crossJoin(F.broadcast(stats)))
    return out.select(
        F.col("doc_id").alias("probe_id"),
        F.col("cid").alias("dup_of"),
        F.col("jac6").alias("jaccard"),
        F.when(F.col("cid").isNull(), "unique")
         .otherwise("dup_of_survivor").alias("verdict"),
        (F.col("cid").eqNullSafe(F.col("f_cid"))
         & F.col("jac6").eqNullSafe(F.col("f_jac6")))
         .alias("decisions_match"),
        "n_dropped_docs", "n_survivors",
        "n_bands_before", "n_bands_after",
        ((F.col("n_bands_before") - F.col("n_bands_after")) * 10
         >= F.col("n_bands_before")).alias("compaction_due"))


# ---------------------------------------------------------------------------
# OP-X3 — embedding similarity search (top-k cosine)
# ---------------------------------------------------------------------------

def _as_double_vec(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential left-to-right double fold — bit-exact vs DuckDB's
    ``list_reduce`` on the same operand order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


#: DuckDB sequential dot product over two DOUBLE[] lists named a and b.
def _sql_dot(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0.0, "
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)")


# ---------------------------------------------------------------------------
# Fixed-cardinality index parameters (VERDICT r4 item 1).
#
# Every ANN/clustering index build below derives its centroid set,
# codebook, and query sample by *hash-rank selection*: order the corpus
# by a deterministic engine-portable pseudo-hash of vec_id and keep the
# first K rows. Properties that make this THE scale shape:
#
# - **N-independent output**: K is a literal constant, so the broadcast
#   sides (centroid table, PQ codebook, ADC lookup table) have the same
#   size at sf0.001 and at 100 TB — the contract the docstrings claim is
#   now enforced by construction, not by convention. (The previous
#   ``vec_id % 50`` medoids gave K = N/50: correct locally, unbounded at
#   scale — VERDICT r4 "What's wrong" #1.)
# - **Distributed selection**: ``orderBy(h).limit(K)`` plans as
#   ``TakeOrderedAndProject`` — each partition keeps its local top-K and
#   the driver merges K×partitions candidate rows; no global sort, no
#   single-partition window (same pattern as operators/kmeans.py seeding).
# - **Engine parity**: the hash is pure BIGINT arithmetic
#   ``((vec_id % M) * mult + inc) % M`` with M = 2^31-1 — every
#   intermediate ≤ (M-1)·1103515245 < 2^63, so Spark and DuckDB compute
#   the identical value with no overflow in either engine; ties can't
#   occur below M but vec_id is still appended as a total-order key.
# - **Pseudo-random spread**: an LCG-style multiply decorrelates the
#   selection from any vec_id locality (ingest order, shard order), so
#   the medoid sample behaves like a uniform draw — the standard seeding
#   a production index would use before k-means refinement.
# ---------------------------------------------------------------------------

K_COARSE = 32    #: IVF coarse-centroid count (cells)
K_CODES = 32     #: PQ codebook entries per subspace
N_QUERIES = 32   #: query-batch size for PQ demos + recall reports

_HMOD = 2147483647
#: (multiplier, increment) per role — distinct constants so the three
#: samples are mutually decorrelated (overlap is allowed and harmless).
_H_CENT = (1103515245, 12345)
_H_CODE = (69069, 1)
_H_QUERY = (214013, 2531011)


def _hrank(mi: tuple[int, int]) -> F.Column:
    mult, inc = mi
    vid = F.col("vec_id").cast("long")
    return ((vid % _HMOD) * mult + inc) % _HMOD


def _hash_sample(df: DataFrame, k: int, mi: tuple[int, int]) -> DataFrame:
    """First ``k`` rows of ``df`` by ``(hash(vec_id), vec_id)`` — a
    distributed partial top-k (TakeOrderedAndProject) whose output size
    is a constant regardless of corpus size."""
    return df.orderBy(_hrank(mi).asc(), F.col("vec_id").asc()).limit(k)


def _sql_hrank(mi: tuple[int, int]) -> str:
    mult, inc = mi
    return f"(((vec_id % {_HMOD}) * {mult} + {inc}) % {_HMOD})"


def _sql_hash_sample(mi: tuple[int, int], k: int) -> str:
    """ORDER BY/LIMIT tail of the oracle twin of :func:`_hash_sample`."""
    return f"ORDER BY {_sql_hrank(mi)}, vec_id LIMIT {k}"


@register(
    "x3_cosine_topk_bruteforce",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, e,
             sqrt({_sql_dot('e', 'e')}) AS nrm
      FROM v
    ),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             b.label AS neighbor_label,
             {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label,
           (CASE WHEN (cos) < 0 THEN -FLOOR(ABS(cos) * 1000000.0 + 0.5) ELSE FLOOR(ABS(cos) * 1000000.0 + 0.5) END / 1000000.0 + 0.0) AS cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM pairs
    ) WHERE rn <= 3
    """,
)
def x3_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — brute-force cosine top-3 neighbors per vector: the
    correctness baseline for similarity search. All-pairs join + window
    top-k; fine at test SF, deliberately NOT the 100 TB plan — that is
    ``x3_ann_lsh_topk`` (bucketed candidates). Dot products fold
    left-to-right over double on both engines → bit-exact ordering.
    """
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label",
                 _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    # The table is one small file → one scan partition; without an
    # explicit spread the O(N²) pair work runs in a single task. The
    # broadcast side stays whole; the probe side fans out per core.
    a = n.repartition(spark.sparkContext.defaultParallelism,
                      "vec_id").alias("a")
    b = F.broadcast(n.alias("b"))
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    pairs = (a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
              .select(F.col("a.vec_id").alias("query_id"),
                      F.col("b.vec_id").alias("neighbor_id"),
                      F.col("b.label").alias("neighbor_label"),
                      cos.alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= 3)
                 .select("query_id", "neighbor_id", "neighbor_label",
                         round_half_up(F.col("cos"), 6).alias("cos_sim")))


def _lsh_planes(dim: int = 64, n_planes: int = 8) -> list[list[float]]:
    """Deterministic seeded hyperplanes, shared verbatim by the Spark
    plan and the SQL oracle (same doubles on both sides)."""
    import random
    rng = random.Random(42)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


_LSH_PLANES = _lsh_planes()

#: VALUES rows (plane_idx, DOUBLE[] weights) for the oracle. Python float
#: repr is shortest-round-trip, so DuckDB parses the identical double.
_SQL_LSH_PLANES = ", ".join(
    "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(w) for w in plane))
    for p, plane in enumerate(_LSH_PLANES))


@register(
    "x3_ann_lsh_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    planes(p, w) AS (VALUES {_SQL_LSH_PLANES}),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN {_sql_dot('e', 'w')} >= 0
                        THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
      FROM n CROSS JOIN planes GROUP BY vec_id
    ),
    b AS (
      SELECT n.vec_id, n.e, n.nrm, s.bucket
      FROM n JOIN sig s USING (vec_id)
    ),
    cand AS (
      SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_sql_dot('a.e', 'c.e')} / (a.nrm * c.nrm) AS cos
      FROM b a JOIN b c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, (CASE WHEN (cos) < 0 THEN -FLOOR(ABS(cos) * 1000000.0 + 0.5) ELSE FLOOR(ABS(cos) * 1000000.0 + 0.5) END / 1000000.0 + 0.0) AS cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)
def x3_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 (scale path) — ANN via random-hyperplane LSH: sign-bit
    signature over H fixed hyperplanes → candidates join only within a
    bucket → exact cosine re-rank of candidates. Sub-quadratic: cost is
    Σ bucket² instead of N². The hyperplanes are a seeded deterministic
    projection shared with the oracle, and every dot product is a
    left-to-right double fold on both engines — so although LSH *recall*
    is approximate (vs the brute-force baseline), the query itself is
    fully deterministic and oracle-checked bit-for-bit.
    """
    planes = _LSH_PLANES
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))

    sig = F.concat(*[
        F.when(_dot(F.col("e"), F.array(
            *[F.lit(w) for w in plane])) >= 0, F.lit("1"))
         .otherwise(F.lit("0"))
        for plane in planes
    ])
    bucketed = n.withColumn("bucket", sig)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    cand = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") != F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("query_id"),
                     F.col("b.vec_id").alias("neighbor_id"),
                     cos.alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 3)
                .select("query_id", "neighbor_id",
                        round_half_up(F.col("cos"), 6).alias("cos_sim")))


# ---------------------------------------------------------------------------
# OP-X4 — text analysis pack
# ---------------------------------------------------------------------------

@register(
    "x4_token_counts",
    oracle=f"""
    SELECT token, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    )
    GROUP BY token
    """,
)
def x4_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — corpus token frequencies (term count + document
    frequency): explode → groupBy, the map-side-combinable shape that
    scales to any corpus (partial aggregation before the shuffle)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    return (tok.groupBy("token")
               .agg(F.count(F.lit(1)).alias("n_occurrences"),
                    F.countDistinct("doc_id").alias("doc_freq")))


@register(
    "x4_text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, n_chars, text, {SQL_TOKENS} AS toks
      FROM documents
    )
    SELECT doc_id, lang, n_chars,
           len(toks) AS n_tokens,
           {sql_round_half_up(
               'CAST(strlen(text) AS DOUBLE) / len(toks)', 6)}
             AS chars_per_token,
           {sql_round_half_up('''CAST(len(list_filter(toks, x -> x IN
                 ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                 / len(toks)''', 6)} AS stopword_ratio,
           {sql_round_half_up('''CAST(strlen(regexp_replace(text,
                 '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / strlen(text)''', 6)} AS punct_ratio,
           CASE WHEN len(toks) >= 20
                 AND CAST(len(list_filter(toks, x -> x IN
                     ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                     / len(toks) BETWEEN 0.05 AND 0.6
                THEN 'keep' ELSE 'flag' END AS quality_bucket
    FROM t
    """,
)
def x4_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — per-document quality scoring (token count, chars/token,
    stopword ratio, punctuation ratio, keep/flag bucket): the standard
    pre-training heuristic filters, all native expressions — no UDF, so
    the whole pass is one codegen'd projection over the scan."""
    stop = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    t = d.select("doc_id", "lang", "n_chars", "text",
                 toks.alias("toks"))
    n_tok = F.size("toks")
    stop_ratio = (F.size(F.filter(
        "toks", lambda x: x.isin(*stop))) * F.lit(1.0) / n_tok)
    punct_ratio = (F.length(F.regexp_replace(
        "text", "[a-zA-Z0-9 ]", "")) * F.lit(1.0) / F.length("text"))
    return t.select(
        "doc_id", "lang", "n_chars",
        n_tok.alias("n_tokens"),
        round_half_up(F.length("text").cast("double") / n_tok, 6)
         .alias("chars_per_token"),
        round_half_up(stop_ratio, 6).alias("stopword_ratio"),
        round_half_up(punct_ratio, 6).alias("punct_ratio"),
        F.when((n_tok >= 20)
               & stop_ratio.between(0.05, 0.6), "keep")
         .otherwise("flag").alias("quality_bucket"))


@register(
    "x4_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({SQL_TOKENS},
                 tok -> CAST(ascii(tok) * 256 + strlen(tok) AS BIGINT))),
             (acc, x) -> (acc * 257 + x) % 999999999989
           ) AS fingerprint
    FROM documents
    """,
)
def x4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — rolling-hash document fingerprint: a polynomial hash
    folded over the token stream (per-token code = 256·codepoint(first
    char) + length), mod a < 2⁴⁰ prime so the int64 fold can never
    overflow. Pure higher-order functions — the fingerprint of a shard
    is computed inside the scan with zero shuffles."""
    d = _t(spark, sf_dir, "documents")
    codes = F.transform(
        tokens_col("text"),
        lambda tok: (F.ascii(tok) * 256 + F.length(tok)).cast("long"))
    fp = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * 257 + x) % 999999999989)
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "x4_lang_profile",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           (CASE WHEN (AVG(CAST(n_chars AS DOUBLE))) < 0
                 THEN -FLOOR(ABS(AVG(CAST(n_chars AS DOUBLE))) * 10000.0 + 0.5)
                 ELSE FLOOR(ABS(AVG(CAST(n_chars AS DOUBLE))) * 10000.0 + 0.5)
            END / 10000.0 + 0.0) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def x4_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — corpus language profile (doc counts, source diversity,
    length stats per declared language) — the inventory report a
    training-mix pipeline runs before sampling."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.countDistinct("source").alias("n_sources"),
                  F.min("n_chars").alias("min_chars"),
                  F.max("n_chars").alias("max_chars"),
                  # class A despite the AVG: integer-valued doubles sum
                  # exactly (< 2^53) in any order, so both engines hold
                  # identical bits before the kernel
                  round_half_up(
                      F.avg(F.col("n_chars").cast("double")), 4)
                   .alias("avg_chars")))


# ---------------------------------------------------------------------------
# OP-X5 — multimodal columns (vectors + binary plumbing)
# ---------------------------------------------------------------------------

@register(
    "x5_vector_norms",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    )
    SELECT vec_id, label,
           len(e) AS dim,
           {sql_round_half_up(f"sqrt({_sql_dot('e', 'e')})", 6)}
             AS l2_norm,
           {sql_round_half_up(_sql_dot('e', 'e'), 6)} AS sq_norm
    FROM v
    """,
)
def x5_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 — typed vector columns in Parquet: dimension + L2 norm per
    embedding via higher-order ``aggregate`` (JVM-side, no UDF)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label",
                 _as_double_vec("embedding").alias("e"))
    sq = _dot(F.col("e"), F.col("e"))
    return v.select("vec_id", "label",
                    F.size("e").alias("dim"),
                    round_half_up(F.sqrt(sq), 6).alias("l2_norm"),
                    round_half_up(sq, 6).alias("sq_norm"))


@register(
    "x5_matryoshka_truncate",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    p AS (
      SELECT vec_id, label,
             {_sql_dot('e', 'e')} AS sq64,
             {_sql_dot('e[1:16]', 'e[1:16]')} AS sq16,
             {_sql_dot('e[1:4]', 'e[1:4]')} AS sq4
      FROM v
    )
    SELECT vec_id, label,
           {sql_round_half_up('sqrt(sq64)', 6)} AS norm_full,
           {sql_round_half_up('sqrt(sq16)', 6)} AS norm_16,
           {sql_round_half_up('sqrt(sq4)', 6)} AS norm_4,
           {sql_round_half_up(
               'CASE WHEN sq64 > 0 THEN sq16 / sq64 END', 6)}
             AS energy_16,
           {sql_round_half_up(
               'CASE WHEN sq64 > 0 THEN sq4 / sq64 END', 6)}
             AS energy_4
    FROM p
    """,
)
def x5_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 — Matryoshka (MRL) prefix truncation metrics: modern
    embedding models are trained so that the FIRST d dims of a vector
    are themselves a usable d-dim embedding; serving picks a prefix
    length per cost tier. This query measures what each truncation
    keeps — prefix norms at 16 and 4 dims and the energy fraction
    ‖e[:d]‖²/‖e‖² — the report a pipeline runs before choosing a
    truncation tier for its ANN index.

    Pure projection over higher-order folds (slice + the bit-exact
    sequential dot), zero shuffles; ratios of deterministic folds are
    class-A (floor-kernel) territory. NULL energy for a zero vector
    (guarded division, both engines)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label",
                 _as_double_vec("embedding").alias("e"))
    sq64 = _dot(F.col("e"), F.col("e"))
    e16 = F.slice("e", 1, 16)
    e4 = F.slice("e", 1, 4)
    sq16 = _dot(e16, e16)
    sq4 = _dot(e4, e4)
    guard = lambda num: F.when(sq64 > 0, num / sq64)
    return v.select(
        "vec_id", "label",
        round_half_up(F.sqrt(sq64), 6).alias("norm_full"),
        round_half_up(F.sqrt(sq16), 6).alias("norm_16"),
        round_half_up(F.sqrt(sq4), 6).alias("norm_4"),
        round_half_up(guard(sq16), 6).alias("energy_16"),
        round_half_up(guard(sq4), 6).alias("energy_4"))


@register(
    "x5_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           strlen(text) AS char_len,
           octet_length(encode(text)) = strlen(text) AS is_ascii
    FROM documents
    """,
)
def x5_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 — opaque-binary plumbing: treat content as bytes
    (UTF-8-encoded text stands in for an image/audio payload, since the
    testdata has no binary column) and compute the typed metadata a
    multimodal pipeline keys on. Decode-and-feature-extract lives in
    ``operators/multimodal.py`` (mapInPandas, stubbed decoder)."""
    d = _t(spark, sf_dir, "documents")
    byte_len = F.octet_length("text")
    return d.select(
        "doc_id",
        byte_len.alias("byte_len"),
        F.length("text").alias("char_len"),
        (byte_len == F.length("text")).alias("is_ascii"))


@register(
    "x5_multimodal_decode",
    oracle="""
    WITH t AS (
      SELECT doc_id, strlen(text) AS byte_len,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, least(strlen(text), 256) + 1),
                 i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS checksum
      FROM documents
    )
    SELECT doc_id,
           CAST(byte_len AS INT) AS byte_len,
           CAST(16 + checksum % 240 AS INT) AS width,
           CAST(16 + (checksum // 240) % 240 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           checksum
    FROM t
    """,
)
def x5_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 — the multimodal decode path end-to-end: binary payload →
    ``mapInPandas`` batch decode → typed feature columns. The decoder is
    the deterministic stub from ``operators/multimodal.py`` (real codecs
    aren't in this container) — deterministic enough that the oracle
    replays it in SQL (the corpus is pure ASCII, so bytes == codepoints
    and the rolling checksum is a list_reduce), making the Arrow/
    mapInPandas plumbing itself oracle-checked."""
    from ..operators.multimodal import decode_features
    d = _t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_features(payloads)


# ---------------------------------------------------------------------------
# OP-X6 — classification at scale (pandas_udf, Arrow path)
# ---------------------------------------------------------------------------

_POS_WORDS = ("fast", "value", "merge")
_NEG_WORDS = ("slow", "error", "big")


@F.pandas_udf(T.DoubleType())
def _lexicon_score(texts):
    """Vectorized lexicon sentiment: (pos − neg) / n_tokens per batch.
    Tokenization mirrors ``tokens_col`` (lower, split non-alnum)."""
    import re
    pos, neg = set(_POS_WORDS), set(_NEG_WORDS)

    def score(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if not toks:
            return 0.0
        p = sum(t in pos for t in toks)
        n = sum(t in neg for t in toks)
        return (p - n) / len(toks)

    return texts.map(score)


@register(
    "x6_lexicon_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           {sql_round_half_up(f'''CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             CAST(len(list_filter(toks, x -> x IN {_POS_WORDS}))
              - len(list_filter(toks, x -> x IN {_NEG_WORDS}))
              AS DOUBLE) / len(toks) END''', 6)} AS sentiment
    FROM t
    """,
)
def x6_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — classification at scale through the Arrow/pandas_udf
    path (the one place Python belongs: model-ish per-row scoring).
    The lexicon score itself is simple enough to have an exact SQL
    oracle, which is the point — it proves the pandas_udf batch path
    computes exactly what the declarative form specifies.
    """
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        round_half_up(_lexicon_score(F.col("text")), 6)
         .alias("sentiment"))


# ---------------------------------------------------------------------------
# OP-X4 (continued) — TF-IDF + language-ID; OP-X5 — label centroids
# ---------------------------------------------------------------------------

@register(
    "x4_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
             AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    """,
)
def x4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — per-(doc, term) TF-IDF, the SQL form (no MLlib): term
    frequencies and document frequencies are two partial-aggregated
    groupBys; the corpus size joins in as a broadcast 1-row relation —
    never a driver-side count stitched into the plan."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (tf.join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "token", "tf", "df",
                      F.round(F.col("tf") * F.log(
                          F.col("n_docs").cast("double") / F.col("df")),
                          6).alias("tfidf")))


@register(
    "x4_lang_id_heuristic",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN CAST(len(list_filter(toks, x -> x IN
                  ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                  / len(toks) >= 0.08 THEN 'en'
             WHEN len(list_filter(toks, x -> x IN
                  ('der', 'die', 'das', 'und'))) > 0 THEN 'de'
             WHEN len(list_filter(toks, x -> x IN
                  ('le', 'la', 'et', 'les'))) > 0 THEN 'fr'
             WHEN len(list_filter(toks, x -> x IN
                  ('el', 'los', 'las', 'y'))) > 0 THEN 'es'
             ELSE 'und'
           END AS predicted_lang
    FROM t
    """,
)
def x4_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — stopword-profile language ID (the n-gram-heuristic family
    at its smallest): ordered CASE over per-language marker-token hit
    rates. On this synthetic corpus (shared English-ish vocabulary) it
    mostly answers 'en'/'und' — the point is the operator shape: a pure
    projection classifier that runs inside the scan at any scale, with
    the declared ``lang`` column kept for confusion analysis."""
    stop_en = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", tokens_col("text").alias("toks"))

    def hits(words):
        return F.size(F.filter("toks", lambda x: x.isin(*words)))

    pred = (F.when(hits(stop_en) * F.lit(1.0) / F.size("toks") >= 0.08,
                   "en")
            .when(hits(("der", "die", "das", "und")) > 0, "de")
            .when(hits(("le", "la", "et", "les")) > 0, "fr")
            .when(hits(("el", "los", "las", "y")) > 0, "es")
            .otherwise("und"))
    return t.select("doc_id", "lang", pred.alias("predicted_lang"))


@register(
    "x5_label_centroids",
    oracle="""
    WITH v AS (
      SELECT label, embedding::DOUBLE[] AS e FROM embeddings
    )
    SELECT label, i AS dim_idx,
           COUNT(*) AS n_vectors,
           ROUND(AVG(e[i]), 6) AS centroid
    FROM v, range(1, 65) t(i)
    GROUP BY label, i
    """,
)
def x5_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 — per-label embedding centroids in flat (label, dim, value)
    form: ``posexplode`` the vectors, hash-aggregate per (label, dim).
    Map-side partial aggregation means the shuffle carries one partial
    sum per (label, dim) per partition — at 100 TB this is the standard
    distributed centroid step of k-means/IVF index building. Averages
    are rounded on both sides (summation order differs across engines,
    SURVEY.md §7 hard-part 7)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("label", _as_double_vec("embedding").alias("e"))
    return (v.select("label", F.posexplode("e").alias("pos", "val"))
             .groupBy("label", (F.col("pos") + 1).alias("dim_idx"))
             .agg(F.count(F.lit(1)).alias("n_vectors"),
                  F.round(F.avg("val"), 6).alias("centroid")))


# ---------------------------------------------------------------------------
# OP-X2 (continued) — SimHash + embedding-cosine near-dup
# ---------------------------------------------------------------------------

@register(
    "x2_simhash_neardup",
    oracle=f"""
    WITH {_SQL_JPAIRS}
    SELECT COUNT(*) AS n_true,
           TRUE AS recall_ok
    FROM jpairs
    """,
)
def x2_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 — SimHash near-dup quality report. 64-bit signature where
    bit i is the sign of Σ_features (±1 by bit i of xxhash64(feature));
    near-dups are pairs within Hamming distance 7 (these docs carry
    only tens of shingles, so even 97%-similar pairs flip several
    low-margin bits — the web-scale radius of 3 under-recalls;
    measured). Features are the same 3-gram shingles the exact-Jaccard
    detector uses. Candidate generation avoids the O(N²) scan by
    banding the signature into 8×8-bit chunks — by pigeonhole, any
    pair within distance 7 shares at least one intact chunk, so the
    block-join on chunks has perfect recall *for the radius*.

    The signature depends on Spark's xxhash64, which no second engine
    reproduces — so like the xxhash64 MinHash twin, the registered
    query emits the oracle-checkable *report*: the true near-dup pair
    count plus a recall-≥-0.5 verdict of the SimHash pairs against the
    exact-Jaccard pairs (the unit test pins the tighter ≥0.8 at its
    fixed SF; 0.5 here keeps the cross-SF oracle deterministic in
    practice). Pair-level output stays available via
    :func:`simhash_pairs`."""
    sim = simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    exact = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    n_true = exact.agg(F.count(F.lit(1)).alias("n_true"))
    n_hit = (sim.join(exact, ["doc_a", "doc_b"], "left_semi")
                .agg(F.count(F.lit(1)).alias("n_hit")))
    return (n_true.crossJoin(n_hit)  # two 1-row aggregates
            .select("n_true",
                    F.when(F.col("n_true") == 0, F.lit(True))
                     .otherwise(F.col("n_hit") >= 0.5 * F.col("n_true"))
                     .alias("recall_ok")))


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming) SimHash pairs within radius 7 — the
    pair-level form behind x2_simhash_neardup's report."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     shingles_col(tokens_col("text")).alias("t"))
             .repartition(spark.sparkContext.defaultParallelism,
                          "doc_id")
             .select("doc_id", F.explode("t").alias("tok")))
    h = toks.withColumn("h", F.xxhash64("tok"))
    # per (doc, bit): sum of ±1; sign → bit of the signature
    bits = h.select(
        "doc_id",
        *[(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)).alias(f"b{i}") for i in range(64)])
    sums = bits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)])
    sig_expr = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0))
        term = F.shiftleft(bit, i)
        sig_expr = term if sig_expr is None else sig_expr + term
    sig = sums.select("doc_id", sig_expr.alias("sig"))

    chunks = sig.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.shiftright("sig", 8 * c).bitwiseAND(F.lit(0xFF))
            for c in range(8)])).alias("chunk_idx", "chunk"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.sig").alias("sig_a"),
                     F.col("b.sig").alias("sig_b"))
             .distinct())
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
                .filter(F.col("hamming") <= 7))


@register(
    "x2_embedding_cosine_neardup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_round_half_up(
               f"{_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm)", 6)}
             AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) >= 0.45
    """,
)
def x2_embedding_cosine_neardup(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """OP-X2/X3 — embedding-cosine near-duplicate pairs (cos ≥ 0.45 —
    the synthetic embeddings are near-orthogonal, max pairwise cosine
    ≈ 0.5, so the threshold sits just inside the top tail):
    the semantic-dedup stage of a training-data pipeline. Exact
    all-pairs form as the oracle baseline (bit-exact sequential fold,
    probe side fanned out per core); at scale the identical predicate
    runs over ``x3_ann_lsh_topk``'s hyperplane buckets instead of the
    cross join."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    a = n.repartition(spark.sparkContext.defaultParallelism,
                      "vec_id").alias("a")
    b = F.broadcast(n.alias("b"))
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    return (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"),
                     cos.alias("cos"))
             .filter(F.col("cos") >= 0.45)
             .select("vec_a", "vec_b",
                     round_half_up(F.col("cos"), 6).alias("cos_sim")))


# ---------------------------------------------------------------------------
# OP-X4 (continued) — PII scrubbing
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
_LONGNUM_RE = r"[0-9]{4,}"


@register(
    "x4_pii_scrub",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ref ' || CAST(doc_id * 7919 + 1000000 AS VARCHAR)
               AS raw
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(raw, '{_LONGNUM_RE}')) AS n_longnums,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>',
                          'g'), '{_LONGNUM_RE}', '<NUM>', 'g')
             AS scrubbed
    FROM t
    """,
)
def x4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — PII scrubbing (emails, long digit runs) — the redaction
    pass every pre-training corpus goes through. The corpus is
    synthetic, so a deterministic contact line derived from ``doc_id``
    is appended first: the scrubber then provably finds and redacts ≥1
    of each class per row (an all-zero-count pass would verify
    nothing). Counts via ``regexp_extract_all`` + ``size``; both
    patterns use only character classes, which mean the same thing in
    Java regex and RE2. Pure projection — runs inside the scan at any
    scale."""
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" contact: user"),
        F.col("doc_id").cast("string"), F.lit("@example.com ref "),
        (F.col("doc_id") * 7919 + 1000000).cast("string"))
    t = d.select("doc_id", raw.alias("raw"))
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(_LONGNUM_RE), F.lit(0)))
         .alias("n_longnums"),
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"),
            _LONGNUM_RE, "<NUM>").alias("scrubbed"))


# ---------------------------------------------------------------------------
# OP-X4 (continued) — BPE-ish subword token counting
# ---------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer, reduced to the alternations that mean the
#: same thing in Java regex and RE2 (leftmost-first in both): a word
#: with optional leading space, a number run, a punctuation run.
_BPE_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@register(
    "x4_bpe_token_count",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{_BPE_RE}') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_bpe_tokens,
           len(list_distinct(toks)) AS n_distinct,
           COALESCE(len(list_filter(toks, x -> x LIKE ' %')), 0)
             AS n_space_led
    FROM t
    """,
)
def x4_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — token counting with a BPE-style pre-tokenizer (the
    space-prefixed word/number/punctuation split GPT-2-family tokenizers
    run before merges): the budget estimate a training pipeline needs
    before the real tokenizer exists. Counting is the point — actual BPE
    merges are model-specific. The alternation uses only constructs with
    identical leftmost-first semantics in Java regex and RE2, so the
    token stream is engine-portable (oracle-checked per document)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")),
                                F.lit(_BPE_RE), F.lit(0))
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_bpe_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(F.filter("toks", lambda x: x.startswith(" ")))
         .alias("n_space_led"))


# ---------------------------------------------------------------------------
# OP-X3 (continued) — IVF-style ANN; OP-X5 — int8 quantization;
# OP-X4 — eval-set decontamination
# ---------------------------------------------------------------------------

@register(
    "x3_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    assigned AS (
      SELECT vec_id, e, nrm, cid FROM (
        SELECT n.vec_id, n.e, n.nrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cos
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, (CASE WHEN (cos) < 0 THEN -FLOOR(ABS(cos) * 1000000.0 + 0.5) ELSE FLOOR(ABS(cos) * 1000000.0 + 0.5) END / 1000000.0 + 0.0) AS cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)
def x3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 (IVF scale path) — inverted-file ANN: assign every vector
    to its nearest coarse centroid (nprobe=1), then search only within
    the cell. Centroids are a fixed-size (K_COARSE) hash-rank medoid
    sample — deterministic, engine-portable, and N-independent by
    construction (VERDICT r4 item 1) — so the whole index build is
    reproducible and oracle-checkable; the production swap-in is
    distributed k-means from the same seeds, same plan shape with
    learned centroids. Costs: N×K broadcast assignments (K a literal
    constant) + Σ cell² candidate work, vs N² brute force; cells
    shuffle once on the centroid id. Complements the hyperplane-LSH
    variant: IVF adapts to the data's cluster structure, LSH needs no
    training."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
             .select(F.col("vec_id").alias("cid"),
                     F.col("e").alias("ce"), F.col("nrm").alias("cnrm")))
    scored = (n.repartition(spark.sparkContext.defaultParallelism,
                            "vec_id")
               .crossJoin(F.broadcast(cent)))
    cos_c = (_dot(F.col("e"), F.col("ce"))
             / (F.col("nrm") * F.col("cnrm")))
    wassign = Window.partitionBy("vec_id").orderBy(
        cos_c.desc(), F.col("cid"))
    assigned = (scored.withColumn("rc", F.row_number().over(wassign))
                      .filter(F.col("rc") == 1)
                      .select("vec_id", "e", "nrm", "cid"))
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    cand = (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                   & (F.col("a.vec_id") != F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("query_id"),
                     F.col("b.vec_id").alias("neighbor_id"),
                     cos.alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 3)
                .select("query_id", "neighbor_id",
                        round_half_up(F.col("cos"), 6).alias("cos_sim")))


@register(
    "x5_int8_quantize",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    m AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS mx
      FROM v
    )
    SELECT vec_id,
           {sql_round_half_up('mx', 6)} AS max_abs,
           COALESCE(array_to_string(list_transform(
             CASE WHEN mx = 0
                  THEN list_transform(e, x -> 0)
                  ELSE list_transform(e, x ->
                       CAST(floor(x * 127.0 / mx + 0.5) AS INT))
             END, v -> CAST(v AS VARCHAR)), ','), '') AS q
    FROM m
    """,
)
def x5_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 — symmetric int8 quantization of the embedding column
    (scale = 127/max|x| per vector): the 4× storage compression every
    100 TB vector corpus applies before indexing. Rounding is
    ``floor(x·scale + 0.5)`` — floor is portable across engines where
    double→int casts and ROUND(double) are not (Spark truncates casts,
    DuckDB rounds them; their ROUND tie rules differ). Pure per-row
    projection, zero shuffles. The int8 vector is emitted as a
    comma-joined string (ints render identically everywhere, COALESCE'd
    to '' on the empty edge to match concat_ws — ADVICE r3) so the
    result cell is scalar for the driver's canonicalizer, and
    ``max_abs`` goes through the class-A floor kernel (a per-row array
    max is deterministic-identical input)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    mx = F.array_max(F.transform("e", lambda x: F.abs(x)))
    m = v.withColumn("mx", mx)
    q = F.when(F.col("mx") == 0,
               F.transform("e", lambda x: F.lit(0)))  \
         .otherwise(F.transform(
             "e", lambda x: F.floor(x * 127.0 / F.col("mx") + 0.5)
                             .cast("int")))
    return m.select("vec_id",
                    round_half_up(F.col("mx"), 6).alias("max_abs"),
                    F.concat_ws(
                        ",", F.transform(q, lambda x: x.cast("string")))
                     .alias("q"))


@register(
    "x4_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest({sql_ngrams(8)}) AS g FROM toks
    ),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 7
    ),
    hits AS (
      SELECT gr.doc_id, COUNT(DISTINCT gr.g) AS n_shared_grams
      FROM grams gr JOIN eval_grams ev ON gr.g = ev.g
      WHERE gr.doc_id % 100 <> 7
      GROUP BY gr.doc_id
    )
    SELECT doc_id, n_shared_grams, TRUE AS contaminated FROM hits
    """,
)
def x4_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — eval-set decontamination: flag training documents that
    share any 8-token n-gram with the held-out benchmark set (here: the
    deterministic 1% slice doc_id ≡ 7 mod 100 stands in for the eval
    suite). The standard pre-training hygiene pass: eval n-grams are a
    *small* relation → broadcast; training docs stream through the scan,
    explode their 8-grams, and hash-join against the broadcast set — no
    shuffle of the corpus. 8-grams (vs the dedup 3-shingles) make
    incidental collisions near-impossible, so any hit is real overlap."""
    d = _t(spark, sf_dir, "documents")
    grams8 = shingles_col(tokens_col("text"), 8)
    g = (d.select("doc_id", grams8.alias("gs"))
          .repartition(spark.sparkContext.defaultParallelism, "doc_id")
          .select("doc_id", F.explode("gs").alias("g")))
    ev = (g.filter(F.col("doc_id") % 100 == 7)
           .select("g").distinct())
    return (g.filter(F.col("doc_id") % 100 != 7)
             .join(F.broadcast(ev), "g")
             .groupBy("doc_id")
             .agg(F.countDistinct("g").alias("n_shared_grams"))
             .withColumn("contaminated", F.lit(True)))


@register(
    "x3_kmeans_cells",
    oracle="""
    SELECT (SELECT COUNT(*) FROM embeddings) AS n_vectors,
           TRUE AS cells_ok,
           TRUE AS inertia_monotone
    """,
)
def x3_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 (index training) — distributed Lloyd's k-means over the
    embeddings (operators/kmeans.py): the trainer that turns the seeded
    medoids of ``x3_ivf_topk`` into learned IVF centroids. One shuffle
    per iteration (broadcast centroids → argmin assign → per-dim hash
    agg). The centroid means depend on float summation order, which no
    second engine reproduces — so the registered query emits the
    oracle-checkable *training report* instead of raw centroids
    (VERDICT r2 item 3 pattern): every vector assigned exactly once
    (n_vectors equals the table count the oracle states), the cell
    count lands in [1, k], and total inertia after 3 Lloyd rounds is
    ≤ the 1-round inertia (Lloyd's is monotonically non-increasing —
    a genuinely falsifiable trainer property, not a tautology).
    Cell-level output stays available via kmeans_fit_assign."""
    from ..operators.kmeans import kmeans_fit_assign
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    log: list = []
    a3 = kmeans_fit_assign(v, "vec_id", "e", k=8, n_iter=3,
                           inertia_log=log)
    stats3 = a3.agg(F.count(F.lit(1)).alias("n_vectors"),
                    F.count_distinct("cell").alias("n_cells"),
                    F.sum("sq_dist").alias("inertia_final"))
    # the full per-round chain (STRONGER than the old 1-vs-3 twin):
    # i0 >= i1 >= i2 >= final, each with tiny FP slack because
    # adjacent rounds share sums at convergence
    seq = log[0].select(F.col("inertia").alias("i0"))
    seq = seq.crossJoin(log[1].select(F.col("inertia").alias("i1")))
    seq = seq.crossJoin(log[2].select(F.col("inertia").alias("i2")))
    eps = 1.0000001
    return (stats3.crossJoin(seq)
            .select("n_vectors",
                    F.col("n_cells").between(1, 8).alias("cells_ok"),
                    ((F.col("i1") <= F.col("i0") * eps)
                     & (F.col("i2") <= F.col("i1") * eps)
                     & (F.col("inertia_final") <= F.col("i2") * eps))
                     .alias("inertia_monotone")))


@register(
    "x3_int8_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e,
             sqrt({_sql_dot('e', 'e')}) AS nrm,
             list_max(list_transform(e, x -> abs(x))) AS mx
      FROM v
    ),
    q AS (
      SELECT vec_id, nrm, mx,
             CASE WHEN mx = 0 THEN list_transform(e, x -> 0)
                  ELSE list_transform(e, x ->
                       CAST(floor(x * 127.0 / mx + 0.5) AS INT))
             END AS qv
      FROM n WHERE mx > 0 AND nrm > 0
    ),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_sql_dot('a.qv', 'b.qv')} * a.mx * b.mx
               / (16129.0 * (a.nrm * b.nrm)) AS acos
      FROM q a JOIN q b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id,
           {sql_round_half_up('acos', 6)} AS approx_cos
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY acos DESC, neighbor_id) AS rn
      FROM pairs
    ) WHERE rn <= 3
    """,
)
def x3_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 + OP-X5 composed — similarity top-3 over the *int8-
    quantized* vectors (x5_int8_quantize's symmetric scheme): the
    production memory/bandwidth form, where the index holds 1 byte per
    dimension and the scan computes integer dot products, rescaling by
    the two per-vector scales (ma·mb/127²) to approximate cosine.

    Oracle-exact — unusual for ANN — because every step is engine-
    portable: the quantization is floor-based (no ROUND-tie exposure),
    the int dot product is integer-exact (≤ 64·127² ≪ 2⁵³, so the
    double accumulator is exact in both engines), and the rescale
    arithmetic is association-matched on both sides. Ranking ties
    break on neighbor_id. The unit test additionally checks top-3
    overlap against the float brute force (quantization fidelity).
    Plan shape mirrors the brute-force baseline (broadcast side whole,
    probe side fanned out); the 100 TB path composes the same scoring
    with LSH/IVF candidate generation instead of all-pairs."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .withColumn("mx", F.array_max(
              F.transform("e", lambda x: F.abs(x))))
          .filter((F.col("mx") > 0) & (F.col("nrm") > 0)))
    q = n.select(
        "vec_id", "nrm", "mx",
        F.transform("e", lambda x: F.floor(x * 127.0 / F.col("mx")
                                           + 0.5).cast("int"))
         .alias("qv"))
    probe = (q.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id").alias("a"))
    build = F.broadcast(q.alias("b"))
    acos = (_dot(F.col("a.qv"), F.col("b.qv"))
            * F.col("a.mx") * F.col("b.mx")
            / (F.lit(16129.0) * (F.col("a.nrm") * F.col("b.nrm"))))
    pairs = (probe.join(build,
                        F.col("a.vec_id") != F.col("b.vec_id"))
                  .select(F.col("a.vec_id").alias("query_id"),
                          F.col("b.vec_id").alias("neighbor_id"),
                          acos.alias("acos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= 3)
                 .select("query_id", "neighbor_id",
                         round_half_up(F.col("acos"), 6)
                          .alias("approx_cos")))


@register(
    "x3_int8_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e,
             sqrt({_sql_dot('e', 'e')}) AS nrm,
             list_max(list_transform(e, x -> abs(x))) AS mx
      FROM v
    ),
    base AS (SELECT * FROM n WHERE mx > 0 AND nrm > 0),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM base
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    assigned AS (
      SELECT vec_id, e, nrm, mx, cid FROM (
        SELECT b.vec_id, b.e, b.nrm, b.mx, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY {_sql_dot('b.e', 'cent.ce')}
                          / (b.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM base b CROSS JOIN cent
      ) WHERE rc = 1
    ),
    q AS (
      SELECT vec_id, cid, nrm, mx,
             list_transform(e, x ->
                  CAST(floor(x * 127.0 / mx + 0.5) AS INT)) AS qv
      FROM assigned
    ),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_sql_dot('a.qv', 'b.qv')} * a.mx * b.mx
               / (16129.0 * (a.nrm * b.nrm)) AS acos
      FROM q a JOIN q b ON a.cid = b.cid AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id,
           {sql_round_half_up('acos', 6)} AS approx_cos
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY acos DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)
def x3_int8_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 + OP-X5 — the *production-shaped* composition VERDICT r3
    item 2 asked for: int8 scoring (``x3_int8_topk``'s integer-exact
    dot + rescale) over IVF cell candidates (``x3_ivf_topk``'s
    fixed-K hash-rank medoid assignment, nprobe=1) instead of all
    pairs.
    This replaces the all-pairs int8 demo in the headline bench set —
    candidate generation is Σ cell² via a cid-keyed shuffle join
    (bounded cells), never O(N²), and the only broadcast is the
    K-centroid table. Fully oracle-exact: every stage (float coarse
    assignment, floor quantization, integer dots, rescale, ranked
    top-3 with id tiebreak) is engine-portable class-A arithmetic.

    100 TB: assignment is one broadcast-join pass (K centroids ≪
    memory), cells shuffle once on cid, and within-cell pair work is
    Σ cell² — controlled by K; the same plan swaps learned k-means
    centroids (operators/kmeans.py) for the medoids with no shape
    change."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .withColumn("mx", F.array_max(
              F.transform("e", lambda x: F.abs(x))))
          .filter((F.col("mx") > 0) & (F.col("nrm") > 0)))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
             .select(F.col("vec_id").alias("cid"),
                     F.col("e").alias("ce"),
                     F.col("nrm").alias("cnrm")))
    cos_c = (_dot(F.col("e"), F.col("ce"))
             / (F.col("nrm") * F.col("cnrm")))
    # argmin via min(struct(-cos, cid)): negating the cosine turns the
    # (cos DESC, cid ASC) selection into a lexicographic struct MIN,
    # which partial-aggregates map-side — K candidate rows per vector
    # collapse before the exchange instead of sort-shuffling K×N rows,
    # and the fold is evaluated once (same rewrite as operators/kmeans).
    best = (n.repartition(spark.sparkContext.defaultParallelism,
                          "vec_id")
             .crossJoin(F.broadcast(cent))
             .groupBy("vec_id")
             .agg(F.min(F.struct((-cos_c).alias("nc"), "cid"))
                   .alias("b")))
    assigned = (n.join(best, "vec_id")
                 .select("vec_id", F.col("b.cid").alias("cid"),
                         "nrm", "mx",
                         F.transform(
                             "e", lambda x: F.floor(
                                 x * 127.0 / F.col("mx") + 0.5)
                              .cast("int")).alias("qv")))
    a, b = assigned.alias("a"), assigned.alias("b")
    acos = (_dot(F.col("a.qv"), F.col("b.qv"))
            * F.col("a.mx") * F.col("b.mx")
            / (F.lit(16129.0) * (F.col("a.nrm") * F.col("b.nrm"))))
    cand = (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                   & (F.col("a.vec_id") != F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("query_id"),
                     F.col("b.vec_id").alias("neighbor_id"),
                     acos.alias("acos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 3)
                .select("query_id", "neighbor_id",
                        round_half_up(F.col("acos"), 6)
                         .alias("approx_cos")))


@register(
    "x2_fuzzy_name_pairs",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS noun
      FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def x2_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (string fuzzy match) — near-duplicate catalog names by
    edit distance ≤ 2, blocked on the trailing noun so the join is
    per-block quadratic instead of corpus-quadratic (the standard
    blocking-key trick of entity resolution; at 100 TB the block key
    graduates to a phonetic/sorted-neighborhood key with the same plan
    shape). Distinct names first: dedup before the expensive pairwise
    metric, never after. ``levenshtein`` is the same dynamic program in
    Spark and DuckDB — integer-exact parity."""
    p = _t(spark, sf_dir, "part")
    names = (p.select("p_name").distinct()
              .withColumn("noun", F.element_at(
                  F.split("p_name", " "), -1)))
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (a.join(b, (F.col("a.noun") == F.col("b.noun"))
                   & (F.col("a.p_name") < F.col("b.p_name")))
             .filter(dist <= 2)
             .select(F.col("a.p_name").alias("name_a"),
                     F.col("b.p_name").alias("name_b"),
                     dist.alias("edit_dist")))


@register(
    "x2_dedup_corpus",
    oracle=f"""
    WITH RECURSIVE {_SQL_JPAIRS},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM jpairs
      UNION
      SELECT doc_b, doc_a FROM jpairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN
          (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
    """,
)
def x2_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (end-to-end) — the deduplicated training corpus itself:
    what a data pipeline actually ships. Near-dup pairs → connected
    components → keep the min-doc_id survivor of every cluster plus all
    unclustered documents, materialized by ANTI-joining the non-survivor
    set against the corpus. Scale shape: the anti-join keys on doc_id
    (high cardinality, one shuffle); the non-survivor relation is only
    as large as the duplicate population, so AQE typically broadcasts
    it — deleting 1% of 100 TB costs a broadcast-anti-join scan, not a
    full-corpus shuffle. Deterministic: survivor choice is total-ordered
    (min doc_id), so the surviving row set is retry- and engine-stable.
    """
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b")
    non_survivors = (cc.filter(F.col("node") != F.col("component"))
                       .select(F.col("node").alias("doc_id")))
    return (d.join(non_survivors, "doc_id", "left_anti")
             .select("doc_id", "lang", "source", "n_chars"))


@register(
    "x3_ivf_topk_nprobe2",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    probe AS (
      SELECT vec_id, e, nrm, cid, rc FROM (
        SELECT n.vec_id, n.e, n.nrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc <= 2
    ),
    assigned AS (
      SELECT vec_id, e, nrm, cid FROM probe WHERE rc = 1
    ),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cos
      FROM probe a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, (CASE WHEN (cos) < 0 THEN -FLOOR(ABS(cos) * 1000000.0 + 0.5) ELSE FLOOR(ABS(cos) * 1000000.0 + 0.5) END / 1000000.0 + 0.0) AS cos_sim
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)
def x3_ivf_topk_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 (IVF, nprobe=2) — multi-probe inverted-file ANN: the
    recall/cost dial every production IVF exposes. Vectors are indexed
    under their single nearest coarse centroid (as in ``x3_ivf_topk``),
    but each *query* probes its 2 nearest cells, so near-boundary
    queries recover neighbors that nprobe=1 misses — candidate work
    doubles (Σ 2·cell avg) while staying far below the N² brute force.
    A pair can't duplicate: each index vector lives in exactly one
    cell, so it meets a query through at most one probe. Same fixed-K
    hash-rank medoids and tiebreaks as the nprobe=1 form — fully
    oracle-checkable."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
             .select(F.col("vec_id").alias("cid"),
                     F.col("e").alias("ce"), F.col("nrm").alias("cnrm")))
    scored = (n.repartition(spark.sparkContext.defaultParallelism,
                            "vec_id")
               .crossJoin(F.broadcast(cent)))
    cos_c = (_dot(F.col("e"), F.col("ce"))
             / (F.col("nrm") * F.col("cnrm")))
    wassign = Window.partitionBy("vec_id").orderBy(
        cos_c.desc(), F.col("cid"))
    probe = (scored.withColumn("rc", F.row_number().over(wassign))
                   .filter(F.col("rc") <= 2)
                   .select("vec_id", "e", "nrm", "cid", "rc"))
    assigned = probe.filter(F.col("rc") == 1).drop("rc")
    a, b = probe.alias("a"), assigned.alias("b")
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    cand = (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                   & (F.col("a.vec_id") != F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("query_id"),
                     F.col("b.vec_id").alias("neighbor_id"),
                     cos.alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 3)
                .select("query_id", "neighbor_id",
                        round_half_up(F.col("cos"), 6).alias("cos_sim")))


@register(
    "x4_chunk_documents",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(range(0, greatest(n_chars, 1), 150)) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST(start // 150 AS BIGINT) AS chunk_idx,
           start,
           length(substring(text, CAST(start + 1 AS INTEGER), 200))
             AS chunk_len,
           md5(substring(text, CAST(start + 1 AS INTEGER), 200))
             AS chunk_md5
    FROM starts
    """,
)
def x4_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 (context chunking) — split every document into 200-char
    chunks on a 150-char stride (50-char overlap): the windowing step
    that turns a raw corpus into model-context-sized training rows.
    The chunk spine is generated *per row, distributedly* —
    ``sequence(0, n_chars-1, 150)`` + ``posexplode`` — so the operator
    is a pure narrow map: zero shuffles, composes with any upstream
    dedup/sampling filter, and parallelizes by input split at any
    corpus size. Chunks are fingerprinted (md5) so the driver compares
    content without hauling chunk text through the diff."""
    d = _t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_chars") - 1, F.lit(0)),
        F.lit(150))
    chunk = F.col("text").substr(F.col("start") + 1, F.lit(200))
    return (d.select("doc_id", "text",
                     F.posexplode(starts).alias("chunk_idx", "start"))
             .select("doc_id", "chunk_idx", "start",
                     F.length(chunk).alias("chunk_len"),
                     F.md5(chunk).alias("chunk_md5")))


# ---------------------------------------------------------------------------
# OP-X8 — the composed corpus-build pipeline
# ---------------------------------------------------------------------------

_CORPUS_RATE = 0.5
_CORPUS_SALT = "corpus"


def _corpus_threshold() -> str:
    from .sampling import _hex_threshold
    return _hex_threshold(_CORPUS_RATE)


@register(
    "x8_corpus_pipeline",
    oracle=None,  # bound below once sampling helpers are importable
)
def x8_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X8 — the whole training-corpus build as ONE declarative plan:
    exact dedup (sha2 survivor) → quality gate (≥20 tokens, stopword
    ratio in [0.05, 0.6]) → deterministic 50% hash sample → 200/150
    context chunking. Each stage is the registered standalone operator
    (x1 / x4_text_quality / x7 / x4_chunk_documents) — this query
    proves they COMPOSE: filters stack on the scan side of the one
    dedup shuffle, the sample coin is a pure key function (no
    resampling drift across retries), and chunking stays a narrow map.
    Catalyst collapses the whole post-dedup chain into a single
    projection+filter stage — the plan a 100 TB corpus build wants."""
    from .sampling import hash_coin

    stop = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    surv = (d.withColumn("content_hash", F.sha2(F.col("text"), 256))
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1))
    toks = tokens_col("text")
    n_tok = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda x: x.isin(*stop)))
                  * F.lit(1.0) / n_tok)
    kept = surv.filter(
        (n_tok >= 20) & stop_ratio.between(0.05, 0.6)
        & (hash_coin(F.col("doc_id"), _CORPUS_SALT)
           < _corpus_threshold()))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_chars") - 1, F.lit(0)),
        F.lit(150))
    chunk = F.col("text").substr(F.col("start") + 1, F.lit(200))
    return (kept.select("doc_id", "lang", "n_chars", "text",
                        F.posexplode(starts).alias("chunk_idx", "start"))
                .select("doc_id", "lang", "chunk_idx", "start",
                        F.length(chunk).alias("chunk_len"),
                        F.md5(chunk).alias("chunk_md5")))


def _register_x8_oracle() -> None:
    from .registry import ORACLES
    from .sampling import _sql_coin
    ORACLES["x8_corpus_pipeline"] = f"""
    WITH surv AS (
      SELECT doc_id, lang, text, n_chars FROM (
        SELECT doc_id, lang, text, n_chars,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id)
                 AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    q AS (
      SELECT doc_id, lang, text, n_chars, {SQL_TOKENS} AS toks
      FROM surv
    ),
    kept AS (
      SELECT doc_id, lang, text, n_chars FROM q
      WHERE len(toks) >= 20
        AND CAST(len(list_filter(toks, x -> x IN
            ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
            / len(toks) BETWEEN 0.05 AND 0.6
        AND {_sql_coin('doc_id', _CORPUS_SALT)}
            < '{_corpus_threshold()}'
    ),
    st AS (
      SELECT doc_id, lang, n_chars, text,
             unnest(range(0, greatest(n_chars, 1), 150)) AS start
      FROM kept
    )
    SELECT doc_id, lang,
           CAST(start // 150 AS BIGINT) AS chunk_idx, start,
           length(substring(text, CAST(start + 1 AS INTEGER), 200))
             AS chunk_len,
           md5(substring(text, CAST(start + 1 AS INTEGER), 200))
             AS chunk_md5
    FROM st
    """


_register_x8_oracle()


@register(
    "x5_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) // 16 AS n_frames
      FROM documents
    ),
    k8 AS (
      SELECT doc_id, text, n_frames,
             greatest(n_frames // 8, 1) AS stride,
             unnest(range(0, 8)) AS k
      FROM t WHERE n_frames > 0
    )
    SELECT doc_id,
           CAST(k * stride AS INT) AS frame_idx,
           CAST(k * stride * 16 AS INT) AS frame_off,
           CAST(n_frames AS INT) AS n_frames,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(k * stride * 16 + 1,
                                  k * stride * 16 + 17),
               i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1))
                         AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 1000000007)
             AS frame_checksum
    FROM k8
    WHERE k * stride < n_frames
    """,
)
def x5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 (video path) — frame sampling: each binary payload yields
    ≤8 evenly-strided 16-byte "frames", one output row per frame — the
    1→N fan-out every video pipeline needs (sample k frames per clip,
    then feature-extract per frame). Runs as Arrow-batched
    ``mapInPandas`` (operators/multimodal.py: explicit schema, narrow
    map, bounded batches); the stub splitter is deterministic, so the
    oracle replays frames + rolling checksums in SQL and the fan-out
    plumbing itself is value-checked — swapping in a real demuxer
    changes one function, not the plan."""
    from ..operators.multimodal import frame_sample

    d = _t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    return frame_sample(payloads)


@register(
    "x9_pack_contexts",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id, len({SQL_TOKENS}) AS n_tok
      FROM documents
      WHERE len({SQL_TOKENS}) > 0
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM d
    ),
    spans AS (
      SELECT source, doc_id, n_tok, cum, cum - n_tok AS tok_start,
             unnest(range(CAST((cum - n_tok) // 512 AS BIGINT),
                          CAST((cum - 1) // 512 + 1 AS BIGINT))) AS bin
      FROM c
    )
    SELECT source, bin, doc_id,
           CAST(greatest(tok_start, bin * 512) - tok_start AS BIGINT)
             AS off_in_doc,
           CAST(least(cum, (bin + 1) * 512)
             - greatest(tok_start, bin * 512) AS BIGINT)
             AS n_tok_in_bin
    FROM spans
    """,
)
def x9_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X9 — sequence packing, concatenate-and-split form: per
    source, documents are laid end-to-end in doc_id order and the token
    stream is cut into 512-token contexts; a document straddling a cut
    contributes a span to each context it crosses — exactly how LM
    pipelines pack short documents without padding waste. The layout is
    a prefix-sum (one window over (source | doc_id)) plus a per-row
    explode of the bins each doc crosses — closed-form, so it stays
    declarative where the naive "greedy fill, reset on overflow" loop
    would be inherently sequential. Scale: packing is per-source (the
    natural shard key), so the window partitions by source — at 100 TB
    you pack per shard/file, never a global stream; all arithmetic is
    exact integers."""
    d = (_t(spark, sf_dir, "documents")
         .select("source", "doc_id",
                 F.size(tokens_col("text")).alias("n_tok"))
         .filter(F.col("n_tok") > 0))
    w = (Window.partitionBy("source").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    start = F.col("cum") - F.col("n_tok")
    spans = c.select(
        "source", "doc_id", "n_tok", "cum", start.alias("tok_start"),
        F.explode(F.sequence(
            F.floor(start / 512),
            F.floor((F.col("cum") - 1) / 512))).alias("bin"))
    seg_start = F.greatest(F.col("tok_start"), F.col("bin") * 512)
    seg_end = F.least(F.col("cum"), (F.col("bin") + 1) * 512)
    return spans.select(
        "source", "bin", "doc_id",
        (seg_start - F.col("tok_start")).alias("off_in_doc"),
        (seg_end - seg_start).alias("n_tok_in_bin"))


@register(
    "x5_resize_normalize",
    oracle="""
    WITH t AS (
      SELECT doc_id, strlen(text) AS byte_len,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, least(strlen(text), 256) + 1),
                 i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS checksum
      FROM documents
    ),
    dims AS (
      SELECT doc_id,
             16 + checksum % 240 AS w,
             16 + (checksum // 240) % 240 AS h
      FROM t
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST((w * 224) // greatest(w, h) AS INT) AS out_w,
           CAST((h * 224) // greatest(w, h) AS INT) AS out_h,
           CAST((224 - (w * 224) // greatest(w, h)) // 2 AS INT)
             AS pad_x,
           CAST((224 - (h * 224) // greatest(w, h)) // 2 AS INT)
             AS pad_y
    FROM dims
    """,
)
def x5_resize_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 (resize) — letterbox every decoded image into the model's
    224×224 input: aspect-preserving scale to the long side, centered
    padding. The geometry is *pure integer Column arithmetic over the
    decode output* — no second UDF pass; a real pipeline fuses this
    projection into the same stage as the decode (the pixel resample
    itself belongs inside the decode UDF; its geometry, batch shape,
    and schema are what the engine owns and what is value-checked
    here). Integer `//` floor division on positive dims is
    engine-identical — no FP anywhere."""
    from ..operators.multimodal import decode_features

    d = _t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    dec = decode_features(payloads)
    out_w = F.expr("(width * 224) div greatest(width, height)")
    out_h = F.expr("(height * 224) div greatest(width, height)")
    return dec.select(
        "doc_id", "width", "height",
        out_w.cast("int").alias("out_w"),
        out_h.cast("int").alias("out_h"),
        F.expr("(224 - (width * 224) div greatest(width, height)) div 2")
         .cast("int").alias("pad_x"),
        F.expr("(224 - (height * 224) div greatest(width, height)) div 2")
         .cast("int").alias("pad_y"))


# ---------------------------------------------------------------------------
# OP-X2 (continued) — SemDeDup-style semantic dedup within IVF cells
# ---------------------------------------------------------------------------

@register(
    "x2_semdedup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    assigned AS (
      SELECT vec_id, e, nrm, cid FROM (
        SELECT n.vec_id, n.e, n.nrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ),
    dup AS (
      SELECT DISTINCT a.vec_id
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND b.vec_id < a.vec_id
      WHERE {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) >= 0.4
    )
    SELECT a.vec_id, a.cid,
           (a.vec_id IN (SELECT vec_id FROM dup)) AS is_dup
    FROM assigned a
    """,
)
def x2_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (semantic) — SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
    re-expressed as a Spark plan: cluster the embedding space coarsely,
    then mark as duplicates any vector whose cosine to a *lower-id*
    vector in the same cell exceeds the threshold — the survivor of
    each semantic group is its minimum vec_id, a total order, so the
    kept set is deterministic (SURVEY.md §7 hard-part 4). Clustering
    reuses the IVF fixed-K hash-rank medoid assignment of
    ``x3_ivf_topk`` (K_COARSE cells, nprobe=1), making the whole
    pipeline oracle-checkable; the production swap-in is the k-means
    trainer in ``operators/kmeans.py``. Scale shape: pair work is
    Σ cell² inside cells only — never a global cross join — and the
    dedup verdict joins back as a broadcast of just the duplicate ids.
    Cost per cell is the same candidate set the IVF top-k already
    enumerates."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
             .select(F.col("vec_id").alias("cid"),
                     F.col("e").alias("ce"), F.col("nrm").alias("cnrm")))
    scored = (n.repartition(spark.sparkContext.defaultParallelism,
                            "vec_id")
               .crossJoin(F.broadcast(cent)))
    cos_c = (_dot(F.col("e"), F.col("ce"))
             / (F.col("nrm") * F.col("cnrm")))
    wassign = Window.partitionBy("vec_id").orderBy(
        cos_c.desc(), F.col("cid"))
    assigned = (scored.withColumn("rc", F.row_number().over(wassign))
                      .filter(F.col("rc") == 1)
                      .select("vec_id", "e", "nrm", "cid"))
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    dup = (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                  & (F.col("b.vec_id") < F.col("a.vec_id")))
            .filter(cos >= 0.4)
            .select(F.col("a.vec_id").alias("dup_id"))
            .distinct())
    return (assigned.join(F.broadcast(dup),
                          assigned.vec_id == dup.dup_id, "left")
                    .select("vec_id", "cid",
                            F.col("dup_id").isNotNull().alias("is_dup")))


# ---------------------------------------------------------------------------
# OP-X4 (continued) — Gopher-style repetition / diversity signals
# ---------------------------------------------------------------------------

@register(
    "x4_repetition_signals",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    base AS (
      SELECT doc_id, t, len(t) AS n_tok,
             len(list_distinct(t)) AS n_distinct
      FROM toks
    ),
    tok_counts AS (
      SELECT doc_id, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok
    ),
    top_tok AS (
      SELECT doc_id, MAX(c) AS top_tok_c FROM tok_counts GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2
                    THEN [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
                    ELSE [] END) AS g
      FROM toks
    ),
    bg_counts AS (
      SELECT doc_id, COUNT(*) AS c FROM bigrams GROUP BY doc_id, g
    ),
    top_bg AS (
      SELECT doc_id, MAX(c) AS top_bg_c, SUM(c) AS n_bg
      FROM bg_counts GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tok,
           CASE WHEN b.n_tok = 0 THEN 0.0
                ELSE ((b.n_distinct * 20000 + b.n_tok) // (2 * b.n_tok))
                     / 10000.0 END AS distinct_frac,
           CASE WHEN b.n_tok = 0 THEN 0.0
                ELSE ((COALESCE(tt.top_tok_c, 0) * 20000 + b.n_tok)
                      // (2 * b.n_tok)) / 10000.0 END AS top_token_frac,
           CASE WHEN COALESCE(tb.n_bg, 0) = 0 THEN 0.0
                ELSE ((tb.top_bg_c * 20000 + tb.n_bg) // (2 * tb.n_bg))
                     / 10000.0 END AS top_bigram_frac,
           (b.n_tok >= 10
            AND ((b.n_distinct * 20000 + b.n_tok) // (2 * b.n_tok))
                / 10000.0 >= 0.35
            AND CASE WHEN COALESCE(tb.n_bg, 0) = 0 THEN 0.0
                     ELSE ((tb.top_bg_c * 20000 + tb.n_bg)
                           // (2 * tb.n_bg)) / 10000.0 END <= 0.06)
             AS keep
    FROM base b
    LEFT JOIN top_tok tt ON tt.doc_id = b.doc_id
    LEFT JOIN top_bg tb ON tb.doc_id = b.doc_id
    """,
)
def x4_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — repetition/diversity quality signals in the style of the
    Gopher rules (Rae et al. 2021 §A1.1): distinct-token fraction,
    most-frequent-token fraction, most-frequent-bigram fraction, and a
    composite keep verdict. Documents dominated by one token or one
    repeated phrase are boilerplate/spam in a pre-training corpus.

    All three fractions use integer HALF_UP division at 4dp so both
    engines round identically. Scale shape: ONE explode covers both
    gram sizes — tokens never contain a space and bigrams always do,
    so a single (doc_id, gram) count shuffle (high-cardinality,
    skew-free) serves both mode statistics, and the per-doc collapse
    separates them with conditional aggregates. (A zero-shuffle
    sorted-array run-length fold was measured 1.7× SLOWER than the
    explode at sf0.1 — Spark's interpreted higher-order lambdas cost
    more than the exchange.) Nothing is quadratic in document count
    or length."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col()
    base = d.select("doc_id", toks.alias("t")) \
            .select("doc_id", "t",
                    F.size("t").alias("n_tok"),
                    F.size(F.array_distinct("t")).alias("n_distinct"))
    m = F.greatest(F.size(F.col("t")) - 1, F.lit(0))
    bigrams = F.zip_with(F.slice("t", 1, m), F.slice("t", 2, m),
                         lambda x, y: F.concat_ws(" ", x, y))
    is_bg = F.col("g").contains(" ")
    stats = (base.select("doc_id",
                         F.explode(F.concat(F.col("t"), bigrams))
                          .alias("g"))
                 .groupBy("doc_id", "g").count()
                 .groupBy("doc_id")
                 .agg(F.max(F.when(~is_bg, F.col("count")))
                       .alias("top_tok_c"),
                      F.max(F.when(is_bg, F.col("count")))
                       .alias("top_bg_c"),
                      F.sum(F.when(is_bg, F.col("count")))
                       .alias("n_bg")))
    j = base.drop("t").join(stats, "doc_id", "left")
    distinct_frac = F.when(
        F.col("n_tok") == 0, F.lit(0.0)).otherwise(
        F.expr("(n_distinct * 20000 + n_tok) div (2 * n_tok)") / 10000.0)
    top_token_frac = F.when(
        F.col("n_tok") == 0, F.lit(0.0)).otherwise(
        F.expr("(coalesce(top_tok_c, 0) * 20000 + n_tok)"
               " div (2 * n_tok)") / 10000.0)
    top_bigram_frac = F.when(
        F.coalesce(F.col("n_bg"), F.lit(0)) == 0, F.lit(0.0)).otherwise(
        F.expr("(top_bg_c * 20000 + n_bg) div (2 * n_bg)") / 10000.0)
    return j.select(
        "doc_id", "n_tok",
        distinct_frac.alias("distinct_frac"),
        top_token_frac.alias("top_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        ((F.col("n_tok") >= 10)
         & (distinct_frac >= 0.35)
         & (top_bigram_frac <= 0.06)).alias("keep"))


# ---------------------------------------------------------------------------
# OP-X4 (continued) — BPE merge-candidate pair counts (tokenizer training)
# ---------------------------------------------------------------------------

@register(
    "x4_bpe_merge_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{_BPE_RE}') AS t
      FROM documents
    ),
    pairs AS (
      SELECT unnest(CASE WHEN len(t) >= 2
                    THEN [t[i] || '|' || t[i+1] FOR i IN range(1, len(t))]
                    ELSE [] END) AS pair
      FROM toks
    )
    SELECT pair, COUNT(*) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 50
    """,
)
def x4_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — the counting step of one BPE training iteration
    (Sennrich et al. 2016): corpus-wide frequencies of adjacent
    pre-token pairs, top 50 — the pair a real trainer would merge
    next, repeated to convergence. Uses the same engine-portable
    pre-tokenizer as ``x4_bpe_token_count``. Scale shape: explode →
    map-side partial counts → one shuffle on the pair string (uniform,
    high-cardinality), then TakeOrderedAndProject for the top slice;
    count-desc with pair tiebreak makes the selected set
    deterministic."""
    d = _t(spark, sf_dir, "documents")
    t = F.regexp_extract_all(F.lower(F.col("text")),
                             F.lit(_BPE_RE), F.lit(0))
    m = F.greatest(F.size(F.col("t")) - 1, F.lit(0))
    pairs = F.zip_with(F.slice("t", 1, m), F.slice("t", 2, m),
                       lambda x, y: F.concat_ws("|", x, y))
    return (d.select(t.alias("t"))
             .select(F.explode(pairs).alias("pair"))
             .groupBy("pair")
             .agg(F.count(F.lit(1)).alias("pair_count"))
             .orderBy(F.desc("pair_count"), "pair")
             .limit(50))


# ---------------------------------------------------------------------------
# OP-X6 (continued) — grouped-map applyInPandas: per-group calibration
# ---------------------------------------------------------------------------

def _calibrate_group(pdf):
    """Grouped-map kernel: integer min-max calibration of ``score`` to
    0‥1000 within one group (HALF_UP at the midpoint). All-int64
    pandas arithmetic — bit-exact against the SQL window form."""
    lo = int(pdf["score"].min())
    hi = int(pdf["score"].max())
    rng = hi - lo
    out = pdf[["doc_id", "source", "score"]].copy()
    if rng == 0:
        out["calib"] = 500
    else:
        out["calib"] = ((pdf["score"] - lo) * 2000 + rng) // (2 * rng)
    return out


@register(
    "x6_group_calibrate",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, n_chars AS score FROM documents
    ),
    g AS (
      SELECT doc_id, source, score,
             MIN(score) OVER (PARTITION BY source) AS lo,
             MAX(score) OVER (PARTITION BY source) AS hi
      FROM t
    )
    SELECT doc_id, source, score,
           CASE WHEN hi = lo THEN 500
                ELSE ((score - lo) * 2000 + (hi - lo)) // (2 * (hi - lo))
           END AS calib
    FROM g
    """,
)
def x6_group_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — the batch grouped-map surface (SURVEY.md §2.11(b)):
    ``groupBy(source).applyInPandas`` rescales each document's quality
    score to 0‥1000 *within its source* — the per-group calibration a
    mixture pipeline runs so that per-source quality thresholds mean
    the same thing across crawls of very different length profiles.

    The kernel is deliberately exact (int64 arithmetic, HALF_UP via
    integer division), so the Arrow grouped-map path is value-checked
    against a plain SQL window oracle — proving the pandas batch
    plumbing (schema contract, group slicing, Arrow round-trip)
    computes exactly what the declarative form specifies. Scale shape:
    one shuffle on ``source``; each group materializes in one worker's
    memory — the applyInPandas contract — so group keys must be
    bounded-size (sources are); for unbounded keys use the window
    form instead."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.col("n_chars").alias("score"))
    return t.groupBy("source").applyInPandas(
        _calibrate_group,
        "doc_id long, source string, score bigint, calib bigint")


@register(
    "x6_calibrate_window",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, n_chars AS score FROM documents
    ),
    g AS (
      SELECT doc_id, source, score,
             MIN(score) OVER (PARTITION BY source) AS lo,
             MAX(score) OVER (PARTITION BY source) AS hi
      FROM t
    )
    SELECT doc_id, source, score,
           CASE WHEN hi = lo THEN 500
                ELSE ((score - lo) * 2000 + (hi - lo)) // (2 * (hi - lo))
           END AS calib
    FROM g
    """,
)
def x6_calibrate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 (scale path, VERDICT r2 item 6) — the SAME 0‥1000
    min-max calibration as ``x6_group_calibrate``, expressed as plain
    SQL windows instead of ``applyInPandas``. This is the registered
    form to reach for when the group key is NOT bounded-cardinality:
    the window shuffles once on ``source`` and streams each partition —
    no requirement that a whole group fit in one worker's pandas frame,
    no Python in the path. Bit-identical to the grouped-map kernel
    (same int64 HALF_UP-via-integer-division), so the two share one
    oracle; the applyInPandas twin stays registered as the Arrow
    grouped-map demo."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.col("n_chars").alias("score"))
    w = Window.partitionBy("source")
    lo = F.min("score").over(w)
    hi = F.max("score").over(w)
    rng = hi - lo
    # floor(double) is exact here: numerator ≤ (hi-lo)·2000 + rng ≪ 2^53
    # and 1/denominator ≫ ulp(quotient), so the double division can't
    # land on the wrong side of an integer boundary.
    calib = F.when(rng == 0, F.lit(500)).otherwise(
        F.floor(((F.col("score") - lo) * 2000 + rng) / (2 * rng)))
    return t.select("doc_id", "source", "score",
                    calib.cast("long").alias("calib"))


def _cogroup_funnel(_key, clicks, purchases):
    """Cogrouped kernel: one user's click frame + purchase frame →
    one exact-integer row. Cents via the t8 class-A half-up kernel
    (streaming/jobs.py::cents_half_up — inlined to keep this module
    import-light); conversion basis points via integer floor division,
    so the Arrow cogroup path is value-checked against plain SQL."""
    import numpy as np
    import pandas as pd

    uid = (clicks["user_id"].iloc[0] if len(clicks)
           else purchases["user_id"].iloc[0])
    n_c, n_p = len(clicks), len(purchases)
    if n_p:
        v = purchases["value"].to_numpy(dtype="float64")
        mag = np.floor(np.abs(v) * 100.0 + 0.5)
        cents = int(np.where(v < 0, -mag, mag).sum())
    else:
        cents = 0
    conv = (n_p * 10000) // n_c if n_c else None
    return pd.DataFrame({
        "user_id": [uid], "n_clicks": [n_c], "n_purchases": [n_p],
        "purchase_cents": [cents], "conv_bp": [conv]})


@register(
    "x6_cogroup_funnel",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN
                 CAST(CASE WHEN value < 0
                      THEN -FLOOR(ABS(value) * 100.0 + 0.5)
                      ELSE FLOOR(ABS(value) * 100.0 + 0.5) END
                 AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents,
           CAST(CASE WHEN SUM(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END) = 0 THEN NULL
                ELSE (SUM(CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END) * 10000)
                     // SUM(CASE WHEN event_type = 'click' THEN 1
                            ELSE 0 END)
           END AS BIGINT) AS conv_bp
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY user_id
    """,
)
def x6_cogroup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — the COGROUPED-map surface (the third Arrow batch API
    beside pandas_udf and grouped-map applyInPandas):
    ``clicks.groupBy(user).cogroup(purchases.groupBy(user))`` hands
    each user's click frame and purchase frame to one pandas callable,
    which emits an exact-integer funnel row (counts, purchase cents via
    the t8 half-up kernel, conversion basis points by integer
    division). Keys present on only ONE side still fire with an empty
    opposite frame — the semantics a driver-side merge would get wrong
    — and the whole path is value-checked against a single-pass SQL
    aggregation oracle.

    Scale shape: one shuffle per side on user_id, then per-key Arrow
    batches; per-group memory is one user's events — bounded by
    activity, not corpus size. The declarative twin IS the oracle's
    conditional aggregation; cogroup earns its place when the per-key
    logic needs real two-frame pandas (alignment, per-key model
    state) that conditional aggregation can't express."""
    e = _t(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
               .select("user_id", "value"))
    purchases = (e.filter(F.col("event_type") == "purchase")
                  .select("user_id", "value"))
    return clicks.groupBy("user_id").cogroup(
        purchases.groupBy("user_id")).applyInPandas(
        _cogroup_funnel,
        "user_id long, n_clicks long, n_purchases long, "
        "purchase_cents long, conv_bp long")


@register(
    "x8_funnel_report",
    oracle=None,  # bound below (needs the sampling SQL coin helper)
)
def x8_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X8 — the corpus build's observability twin: per-source
    survivor counts at every stage of ``x8_corpus_pipeline``'s funnel
    (raw → deduped → quality-gated → sampled) plus the surviving token
    budget — the report a data-mixture owner reads before training.
    Stage predicates are THE SAME expressions as the pipeline (same
    dedup window, same quality gate, same hash coin), evaluated as
    flags in one pass and collapsed by conditional aggregation — the
    funnel never re-runs the pipeline per stage. Scale shape: the
    dedup window's content-hash shuffle plus one source-keyed agg of
    partial counts; nothing else moves."""
    from .sampling import hash_coin

    stop = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    toks = tokens_col("text")
    n_tok = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda x: x.isin(*stop)))
                  * F.lit(1.0) / n_tok)
    flags = (
        d.withColumn("content_hash", F.sha2(F.col("text"), 256))
         .withColumn("is_surv", F.row_number().over(w) == 1)
         .withColumn("n_tok", n_tok)
         .withColumn("ok_quality",
                     (F.col("n_tok") >= 20)
                     & stop_ratio.between(0.05, 0.6))
         .withColumn("ok_sample",
                     hash_coin(F.col("doc_id"), _CORPUS_SALT)
                     < _corpus_threshold())
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    surv = F.col("is_surv")
    qual = surv & F.col("ok_quality")
    samp = qual & F.col("ok_sample")
    return (flags.groupBy("source")
                 .agg(F.count(F.lit(1)).alias("n_total"),
                      cnt(surv).alias("n_after_dedup"),
                      cnt(qual).alias("n_after_quality"),
                      cnt(samp).alias("n_after_sample"),
                      F.sum(F.when(samp, F.col("n_tok")).otherwise(0))
                       .alias("kept_tokens")))


def _register_x8_funnel_oracle() -> None:
    from .registry import ORACLES
    from .sampling import _sql_coin
    ORACLES["x8_funnel_report"] = f"""
    WITH flagged AS (
      SELECT doc_id, source, {SQL_TOKENS} AS toks,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
               AS is_surv,
             {_sql_coin('doc_id', _CORPUS_SALT)}
               < '{_corpus_threshold()}' AS ok_sample
      FROM documents
    ),
    f AS (
      SELECT source, is_surv, ok_sample, len(toks) AS n_tok,
             len(toks) >= 20
             AND CAST(len(list_filter(toks, x -> x IN
                 ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                 / len(toks) BETWEEN 0.05 AND 0.6 AS ok_quality
      FROM flagged
    )
    SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN is_surv THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_dedup,
           CAST(SUM(CASE WHEN is_surv AND ok_quality
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
           CAST(SUM(CASE WHEN is_surv AND ok_quality AND ok_sample
               THEN 1 ELSE 0 END) AS BIGINT) AS n_after_sample,
           CAST(SUM(CASE WHEN is_surv AND ok_quality AND ok_sample
               THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM f
    GROUP BY source
    """


_register_x8_funnel_oracle()


# ---------------------------------------------------------------------------
# OP-X2 — C4-style exact span dedup (aligned token blocks)
# ---------------------------------------------------------------------------

@register(
    "x2_span_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    blk AS (
      SELECT doc_id,
             unnest([ {{'blk_idx': i,
                        'blk': array_to_string(t[i*20+1 : i*20+20], ' ')}}
                      FOR i IN range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))
                    ]) AS b
      FROM toks
    ),
    flat AS (
      SELECT doc_id, b.blk_idx AS blk_idx, b.blk AS blk,
             ROW_NUMBER() OVER (PARTITION BY b.blk
                                ORDER BY doc_id, b.blk_idx) AS rn
      FROM blk
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           COUNT(*) FILTER (rn > 1) AS n_dup_blocks,
           md5(COALESCE(
             string_agg(blk, ' ' ORDER BY blk_idx) FILTER (rn = 1),
             '')) AS clean_hash
    FROM flat
    GROUP BY doc_id
    """,
)
def x2_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 — sub-document exact span dedup: cut each document into
    ALIGNED 20-token blocks and drop every block whose exact text
    already occurred earlier in the corpus (first occurrence by
    (doc_id, blk_idx) survives — a total order, so retry-stable).
    This is the C4 recipe (Raffel et al. 2020 §2.2 dedupe "three-
    sentence spans" corpus-wide) re-expressed on token blocks; document-
    level exact/near dedup (x1/x2) misses boilerplate repeated INSIDE
    otherwise-distinct pages, which span dedup removes.

    Spark shape: tokenize once behind a repartition barrier (the
    higher-order lambda would otherwise re-inline the tokenizer per
    block), `posexplode` the blocks, one window over the block text for
    first-occurrence ranking, then a per-doc re-aggregation that
    rebuilds the cleaned text in block order (`array_sort` on
    (blk_idx, blk) structs — `collect_list` alone has no order
    guarantee) and fingerprints it. At 100 TB the shuffle key is the
    20-token block text; blocks could be pre-hashed (sha2) to shrink
    the exchange the same way x1 does — kept raw here so the oracle
    partitions on the identical value.
    """
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", tokens_col("text").alias("t"))
             .repartition(spark.sparkContext.defaultParallelism, "doc_id"))
    nblk = F.ceil(F.size("t") / F.lit(20.0)).cast("int")
    blocks = F.when(
        F.size("t") > 0,
        F.transform(F.sequence(F.lit(0), nblk - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("t"), i * 20 + 1, 20), " "))
    ).otherwise(F.array().cast("array<string>"))
    flat = (toks.select("doc_id",
                        F.posexplode(blocks).alias("blk_idx", "blk")))
    w = Window.partitionBy("blk").orderBy("doc_id", "blk_idx")
    ranked = flat.withColumn("rn", F.row_number().over(w))
    kept_sorted = F.array_sort(
        F.collect_list(F.when(F.col("rn") == 1,
                              F.struct("blk_idx", "blk"))))
    return (ranked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_blocks"),
                 F.sum((F.col("rn") > 1).cast("long"))
                  .alias("n_dup_blocks"),
                 F.md5(F.concat_ws(
                     " ",
                     F.transform(kept_sorted, lambda s: s["blk"])))
                  .alias("clean_hash")))


# ---------------------------------------------------------------------------
# OP-X4 — corpus-trained unigram LM quality score
# ---------------------------------------------------------------------------

#: Unigram-LM vocabulary cap: only the VOCAB_K most frequent tokens
#: (ties broken by token) are kept in the scoring model; everything
#: else scores at the 0.5-pseudo-count OOV floor. This is what bounds
#: the broadcast side — raw vocabulary grows with corpus size (Heaps'
#: law), the truncated model does not. At the test SFs the vocabulary
#: is far below the cap, so truncation is a semantic no-op there and
#: the oracle replays the same top-K + floor.
VOCAB_K = 1 << 18

@register(
    "x4_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    vocab AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ),
    trunc AS (
      SELECT token, cnt FROM vocab
      ORDER BY cnt DESC, token LIMIT {VOCAB_K}
    ),
    total AS (
      SELECT SUM(cnt)::DOUBLE AS t FROM vocab
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(ROUND(CAST(AVG(ln(COALESCE(CAST(cnt AS DOUBLE), 0.5)
                                  / t))
                           AS DECIMAL(38,10)), 6) AS DOUBLE)
             AS avg_logprob
    FROM tok LEFT JOIN trunc USING (token) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def x4_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — per-document mean unigram log-probability under a model
    trained on the corpus itself: the cheap stand-in for a KenLM-style
    perplexity filter (low scorers are boilerplate-heavy or
    out-of-distribution; CCNet-style pipelines gate on exactly this
    signal).

    Two aggregations over one token stream: vocabulary counts (token →
    cnt, map-side combinable), truncated to the ``VOCAB_K`` most
    frequent tokens (distributed TakeOrdered — no global window), and a
    per-document average of ``ln(cnt / T)`` after joining the counts
    back, with out-of-vocabulary tokens at a 0.5-pseudo-count floor.
    The truncation is what makes the broadcast legitimate (ADVICE r2):
    the raw vocabulary is Heaps'-law unbounded, the top-K model is
    ≤ VOCAB_K rows by construction, so the scoring pass stays
    shuffle-free at 100 TB; only the per-doc groupBy shuffles, keyed on
    the high-cardinality doc_id. T still sums the *full* vocabulary
    (single scalar aggregate).
    """
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    trunc = vocab.orderBy(F.col("cnt").desc(), "token").limit(VOCAB_K)
    total = vocab.agg(F.sum("cnt").cast("double").alias("t"))
    lp = F.log(F.coalesce(F.col("cnt").cast("double"), F.lit(0.5))
               / F.col("t"))
    return (tok.join(F.broadcast(trunc), "token", "left")
               .crossJoin(F.broadcast(total))
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    # decimal-routed rounding: the mean of logs is a
                    # partial-order-dependent double sum; routing the
                    # ROUND through DECIMAL keeps a near-boundary value
                    # on the same side in both engines (SURVEY.md §7
                    # hard-parts 1+7)
                    F.round(F.avg(lp).cast("decimal(38,10)"), 6)
                     .cast("double").alias("avg_logprob")))


# ---------------------------------------------------------------------------
# OP-X3 — ANN recall observability report
# ---------------------------------------------------------------------------

@register(
    "x3_recall_report",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    qv AS (SELECT vec_id FROM n {_sql_hash_sample(_H_QUERY, N_QUERIES)}),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm)
                   DESC, b.vec_id) AS rn
        FROM n a JOIN qv ON a.vec_id = qv.vec_id
                 JOIN n b ON a.vec_id <> b.vec_id
      ) WHERE rn <= 3
    ),
    planes(p, w) AS (VALUES {_SQL_LSH_PLANES}),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN {_sql_dot('e', 'w')} >= 0
                        THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
      FROM n CROSS JOIN planes GROUP BY vec_id
    ),
    b AS (
      SELECT n.vec_id, n.e, n.nrm, s.bucket
      FROM n JOIN sig s USING (vec_id)
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_sql_dot('a.e', 'c.e')} / (a.nrm * c.nrm)
                   DESC, c.vec_id) AS rn
        FROM b a JOIN qv ON a.vec_id = qv.vec_id
                 JOIN b c
          ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
      ) WHERE rn <= 3
    )
    SELECT bf.query_id, COUNT(*) AS n_true,
           CAST(COALESCE(SUM(CASE WHEN lsh.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_hit,
           {sql_round_half_up('''SUM(CASE WHEN lsh.neighbor_id IS NOT
                NULL THEN 1 ELSE 0 END) / COUNT(*)''', 6)} AS recall
    FROM bf LEFT JOIN lsh
      ON bf.query_id = lsh.query_id
     AND bf.neighbor_id = lsh.neighbor_id
    GROUP BY bf.query_id
    """,
)
def x3_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — per-query recall@3 of the LSH path against the
    brute-force ground truth: the observability half of approximate
    similarity search (an ANN index you can't measure is an ANN index
    you can't trust). The query set is the fixed N_QUERIES hash-rank
    sample (VERDICT r4 item 1): the brute-force side is
    N_QUERIES × N — LINEAR in the corpus with a constant broadcast
    query batch, never quadratic — and the LSH side reuses the
    registered plan restricted to the same sample (per-query top-3 is
    independent across queries, so restriction ≡ filtering). The
    report shape — join on (query, neighbor), count hits per query —
    is scale-free.
    """
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    q_ids = _hash_sample(n.select("vec_id"), N_QUERIES, _H_QUERY)
    q = (n.join(F.broadcast(q_ids), "vec_id")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("e").alias("qe"), F.col("nrm").alias("qnrm")))
    cos = (_dot(F.col("qe"), F.col("e"))
           / (F.col("qnrm") * F.col("nrm")))
    wt = Window.partitionBy("query_id").orderBy(
        cos.desc(), F.col("vec_id"))
    bf = (n.repartition(spark.sparkContext.defaultParallelism,
                        "vec_id")
           .crossJoin(F.broadcast(q))
           .filter(F.col("vec_id") != F.col("query_id"))
           .withColumn("rn", F.row_number().over(wt))
           .filter(F.col("rn") <= 3)
           .select("query_id", F.col("vec_id").alias("neighbor_id")))
    lsh = (x3_ann_lsh_topk(spark, sf_dir)
           .join(F.broadcast(q_ids.withColumnRenamed(
               "vec_id", "query_id")), "query_id", "left_semi")
           .select("query_id", "neighbor_id",
                   F.lit(1).alias("hit")))
    j = bf.join(lsh, ["query_id", "neighbor_id"], "left")
    n_hit = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (j.groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_true"),
                  n_hit.alias("n_hit"),
                  round_half_up(n_hit.cast("double")
                                / F.count(F.lit(1)), 6)
                   .alias("recall")))


# ---------------------------------------------------------------------------
# OP-X1 — incremental dedup (arrivals vs published corpus)
# ---------------------------------------------------------------------------

@register(
    "x1_incremental_dedup",
    oracle="""
    WITH corpus AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 400
    ),
    arrivals AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 400
    ),
    ranked AS (
      SELECT doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn,
             h IN (SELECT h FROM corpus) AS in_corpus
      FROM arrivals
    )
    SELECT doc_id,
           CASE WHEN in_corpus THEN 'dup_of_corpus'
                WHEN rn > 1 THEN 'dup_in_batch'
                ELSE 'new' END AS verdict
    FROM ranked
    """,
)
def x1_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X1 (incremental form) — dedup a batch of arrivals against the
    already-published corpus WITHOUT re-processing the corpus: at 100 TB
    you never re-dedup the warehouse, you anti-join the day's arrivals
    against its hash index. Three verdicts per arrival: collides with
    the corpus, collides with an earlier arrival in the same batch
    (deterministic min-doc_id survivor), or genuinely new. Only 16-byte
    hashes of the corpus move (and at scale that side is a pre-built
    index, not a scan); the window partitions on the hash — unbounded
    cardinality.
    """
    d = _t(spark, sf_dir, "documents")
    corpus_h = (d.filter(F.col("doc_id") < 400)
                 .select(F.md5("text").alias("h")).distinct()
                 .withColumn("in_corpus", F.lit(True)))
    arrivals = (d.filter(F.col("doc_id") >= 400)
                 .select("doc_id", F.md5("text").alias("h")))
    w = Window.partitionBy("h").orderBy("doc_id")
    return (arrivals
            .join(corpus_h, "h", "left")
            .withColumn("rn", F.row_number().over(w))
            .select(
                "doc_id",
                F.when(F.col("in_corpus"), "dup_of_corpus")
                 .when(F.col("rn") > 1, "dup_in_batch")
                 .otherwise("new").alias("verdict")))


# ---------------------------------------------------------------------------
# OP-X1 — bloom-prefiltered incremental dedup
# ---------------------------------------------------------------------------

#: Bloom geometry: positions are the first BLOOM_HEX hex chars of a
#: salted md5, so the bit-array size is exactly 16^BLOOM_HEX — no
#: modulo, and both engines derive the identical position string.
_BLOOM_HEX = 3          # m = 16^3 = 4096 positions
_BLOOM_K = 4            # hash functions b0: … b3:

_SQL_BLOOM_POS = [
    f"substr(md5('b{i}:' || h), 1, {_BLOOM_HEX})" for i in range(_BLOOM_K)
]


def _bloom_pos_cols(h: F.Column) -> list[F.Column]:
    """Spark twin of ``_SQL_BLOOM_POS`` — byte-identical position keys."""
    return [
        F.substring(F.md5(F.concat(F.lit(f"b{i}:"), h)), 1, _BLOOM_HEX)
        for i in range(_BLOOM_K)
    ]


@register(
    "x1_bloom_prefilter_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 400
    ),
    bits AS (
      SELECT DISTINCT {_SQL_BLOOM_POS[0].replace('h)', 'c.h)')} AS pos
      FROM corpus c
      UNION
      SELECT DISTINCT {_SQL_BLOOM_POS[1].replace('h)', 'c.h)')} FROM corpus c
      UNION
      SELECT DISTINCT {_SQL_BLOOM_POS[2].replace('h)', 'c.h)')} FROM corpus c
      UNION
      SELECT DISTINCT {_SQL_BLOOM_POS[3].replace('h)', 'c.h)')} FROM corpus c
    ),
    arrivals AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 400
    ),
    probed AS (
      SELECT doc_id, h,
             {' AND '.join(f'({p} IN (SELECT pos FROM bits))'
                           for p in _SQL_BLOOM_POS)} AS bloom_candidate
      FROM arrivals
    ),
    ranked AS (
      SELECT doc_id, h, bloom_candidate,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn,
             (bloom_candidate AND h IN (SELECT h FROM corpus)) AS in_corpus
      FROM probed
    )
    SELECT doc_id, bloom_candidate,
           CASE WHEN in_corpus THEN 'dup_of_corpus'
                WHEN rn > 1 THEN 'dup_in_batch'
                ELSE 'new' END AS verdict
    FROM ranked
    """,
)
def x1_bloom_prefilter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X1 (bloom-prefiltered form) — the incremental dedup join gated
    behind a relational Bloom filter, the standard trick for deduping a
    day's arrivals against a petabyte corpus without probing the corpus
    index for every arrival.

    The "bit array" is built from the corpus as the SET of set-bit
    positions: each corpus hash lights ``_BLOOM_K`` positions, a
    position being the first ``_BLOOM_HEX`` hex chars of a salted md5 —
    so the domain is exactly 16^3 = 4096 strings and the distinct-
    position relation is **bounded by a constant (≤ 4096 rows) at any
    corpus size**. It collapses to a single map-typed row broadcast to
    every task; membership is ``_BLOOM_K`` O(1) map lookups per arrival
    — a pure scan-side filter, no shuffle, no explode. A saturated
    filter (corpus ≫ 4096/K) degrades to more confirm-join work, never
    to a wrong answer: Bloom filters have no false negatives.

    Only arrivals whose K positions are ALL set (``bloom_candidate``)
    probe the corpus hash index — the equi-join carries the bloom bit
    in its condition, so non-candidates never reach the join. False
    positives survive the prefilter but fail the confirm join and
    come out ``verdict = 'new'`` with ``bloom_candidate = true`` —
    visible in the result, and pinned by a unit test. The oracle
    REPLAYS the identical filter (same salted-md5 positions, same
    conjunction), so the FP set itself is cross-engine-exact, not just
    the final verdicts. The in-batch window is the same unbounded-key
    ``h`` partition as x1_incremental_dedup.
    """
    d = _t(spark, sf_dir, "documents")
    corpus_h = (d.filter(F.col("doc_id") < 400)
                 .select(F.md5("text").alias("h")).distinct())
    arrivals = (d.filter(F.col("doc_id") >= 400)
                 .select("doc_id", F.md5("text").alias("h")))
    return bloom_prefilter_dedup(corpus_h, arrivals)


def bloom_prefilter_dedup(corpus_h: DataFrame,
                          arrivals: DataFrame) -> DataFrame:
    """The x1_bloom_prefilter_dedup body over any ``corpus_h(h)`` /
    ``arrivals(doc_id, h)`` pair — factored out so the no-false-negative
    guarantee and the false-positive → confirm-join-rejection path are
    unit-testable on crafted hash sets beyond the synthetic split."""
    # The bit array as one broadcast map row: pos -> true, <= 4096 keys.
    bits = (corpus_h
            .select(F.explode(F.array(*_bloom_pos_cols(F.col("h"))))
                     .alias("pos"))
            .distinct()
            .agg(F.collect_set("pos").alias("ps"))
            .select(F.map_from_arrays(
                "ps",
                F.transform("ps", lambda _: F.lit(True))).alias("bm")))
    hit = None
    for pos in _bloom_pos_cols(F.col("h")):
        one = F.coalesce(F.element_at(F.col("bm"), pos), F.lit(False))
        hit = one if hit is None else (hit & one)
    probed = (arrivals.join(F.broadcast(bits))
                      .withColumn("bloom_candidate", hit)
                      .drop("bm"))
    corpus_in = (corpus_h.withColumnRenamed("h", "ch")
                          .withColumn("in_corpus", F.lit(True)))
    j = probed.join(
        corpus_in,
        (probed["h"] == corpus_in["ch"]) & probed["bloom_candidate"],
        "left").drop("ch")
    w = Window.partitionBy("h").orderBy("doc_id")
    return (j.withColumn("rn", F.row_number().over(w))
             .select(
                 "doc_id", "bloom_candidate",
                 F.when(F.col("in_corpus"), "dup_of_corpus")
                  .when(F.col("rn") > 1, "dup_in_batch")
                  .otherwise("new").alias("verdict")))


# ---------------------------------------------------------------------------
# OP-X2 — kNN-graph PageRank (similarity-graph centrality)
# ---------------------------------------------------------------------------

#: Shared CTE chain ending in ``edges(src, dst)`` — each vector's top-3
#: cosine neighbors within its label group, the kNN similarity graph
#: used by x2_knn_pagerank and x2_triangle_count (one definition so the
#: two oracles cannot drift).
_SQL_KNN_EDGES = f"""
    v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    pairs AS (
      SELECT a.vec_id AS q, b.vec_id AS nb,
             {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b
        ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    edges AS (
      SELECT q AS src, nb AS dst FROM (
        SELECT q, nb, ROW_NUMBER() OVER (
          PARTITION BY q ORDER BY cos DESC, nb) AS rn
        FROM pairs
      ) WHERE rn <= 3
    )"""


def _knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_SQL_KNN_EDGES``: directed (src, dst) edges,
    checkpointed (both consumers iterate/join them repeatedly)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _as_double_vec("embedding").alias("e"))
    nv = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    a, b = nv.alias("a"), nv.alias("b")
    cos = (_dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") != F.col("b.vec_id")))
              .select(F.col("a.vec_id").alias("q"),
                      F.col("b.vec_id").alias("nb"),
                      cos.alias("cos")))
    wnd = Window.partitionBy("q").orderBy(F.col("cos").desc(), "nb")
    return ckpt(pairs.withColumn("rn", F.row_number().over(wnd))
                     .filter(F.col("rn") <= 3)
                     .select(F.col("q").alias("src"),
                             F.col("nb").alias("dst")))


@register(
    "x2_triangle_count",
    oracle=f"""
    WITH {_SQL_KNN_EDGES},
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM edges
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS a,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS b
      FROM und e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
      SELECT w.a, w.b, w.c
      FROM (
        SELECT e1.a, e1.b AS b, e2.b AS c
        FROM o e1 JOIN o e2
          ON e1.a = e2.a
        JOIN deg db ON db.node = e1.b
        JOIN deg dc ON dc.node = e2.b
        WHERE (db.d < dc.d) OR (db.d = dc.d AND e1.b < e2.b)
      ) w
      JOIN o e3 ON e3.a = w.b AND e3.b = w.c
    ),
    per_node AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node AS vec_id, d.d AS degree,
           COALESCE(p.n_triangles, 0) AS n_triangles
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """,
)
def x2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (graph analytics) — per-node triangle counts over the kNN
    similarity graph: the local-clustering signal behind community
    detection and tight-cluster dedup (a node whose neighbors are also
    mutual neighbors sits inside a near-duplicate clique, not a chain
    of borderline pairs).

    The plan is the degree-ordered edge-iterator algorithm (the
    MapReduce-classic): undirected edges orient from the LOWER
    (degree, id) endpoint, wedges enumerate only at each edge's lower
    endpoint, and a final join against the oriented edge set closes
    them. Orienting by degree bounds the wedge fan-out per node by its
    oriented OUT-degree — on a skewed graph a celebrity node of degree
    10⁶ generates no wedges itself (all its edges point at it), which
    is the difference between Σ d(v)² on the raw graph and the
    O(m^1.5) bound of the oriented form. Every triangle is found
    exactly once; per-node counts explode its 3 corners. Integer-exact
    end to end — no rounding kernels anywhere."""
    return triangle_counts(_knn_edges(spark, sf_dir))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """The x2_triangle_count body over any directed (src, dst) edge
    relation — factored out so the degree-ordered orientation is
    unit-testable on crafted graphs (K4, triangle+path)."""
    und = (edges.select(F.least("src", "dst").alias("u"),
                        F.greatest("src", "dst").alias("v"))
                .distinct())
    deg = (und.select(F.col("u").alias("node"))
              .unionAll(und.select(F.col("v").alias("node")))
              .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = ((F.col("du") < F.col("dv"))
                   | ((F.col("du") == F.col("dv"))
                      & (F.col("u") < F.col("v"))))
    o = ckpt(und.join(du, "u").join(dv, "v")
                .select(F.when(lower_first, F.col("u"))
                         .otherwise(F.col("v")).alias("a"),
                        F.when(lower_first, F.col("v"))
                         .otherwise(F.col("u")).alias("b")))
    e1 = o.select(F.col("a"), F.col("b").alias("wb"))
    e2 = o.select(F.col("a"), F.col("b").alias("wc"))
    db = deg.select(F.col("node").alias("wb"), F.col("d").alias("db"))
    dc = deg.select(F.col("node").alias("wc"), F.col("d").alias("dc"))
    wedges = (e1.join(e2, "a")
                .join(db, "wb").join(dc, "wc")
                .filter((F.col("db") < F.col("dc"))
                        | ((F.col("db") == F.col("dc"))
                           & (F.col("wb") < F.col("wc"))))
                .select("a", "wb", "wc"))
    closing = o.select(F.col("a").alias("wb"), F.col("b").alias("wc"))
    tri = wedges.join(closing, ["wb", "wc"])
    per_node = (tri.select(F.col("a").alias("node"))
                   .unionAll(tri.select(F.col("wb").alias("node")))
                   .unionAll(tri.select(F.col("wc").alias("node")))
                   .groupBy("node")
                   .agg(F.count(F.lit(1)).alias("n_triangles")))
    return (deg.join(per_node, "node", "left")
               .select(F.col("node").alias("vec_id"),
                       F.col("d").alias("degree"),
                       F.coalesce("n_triangles", F.lit(0))
                        .alias("n_triangles")))


_PR_DAMP = "0.85"
_PR_JUMP = "0.15"


def _sql_pr_iter(i: int) -> str:
    """One PageRank iteration as two CTEs: contributions c{i}, ranks
    r{i} — identical joins/aggregation to the Spark plan."""
    return f"""
    c{i} AS (
      SELECT e.dst AS node, SUM(r{i - 1}.r / d.outdeg) AS s
      FROM edges e
      JOIN r{i - 1} ON r{i - 1}.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT d.src AS node,
             {_PR_JUMP} / nn.n + {_PR_DAMP} * COALESCE(c{i}.s, 0.0) AS r
      FROM deg d CROSS JOIN nn
      LEFT JOIN c{i} ON c{i}.node = d.src
    )"""


@register(
    "x2_knn_pagerank",
    oracle=f"""
    WITH {_SQL_KNN_EDGES},
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / nn.n AS r FROM deg, nn),
    {_sql_pr_iter(1)},
    {_sql_pr_iter(2)},
    {_sql_pr_iter(3)}
    SELECT r3.node AS vec_id, d.outdeg,
           CAST(ROUND(CAST(r3.r AS DECIMAL(38,10)), 8) AS DOUBLE)
             AS pagerank
    FROM r3 JOIN deg d ON d.src = r3.node
    """,
)
def x2_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (graph centrality) — PageRank over the kNN similarity
    graph: each vector's top-3 cosine neighbors WITHIN its label group
    become directed edges, then three unrolled PageRank iterations
    (damping 0.85) score how central each vector is in its
    neighborhood — the graph-curation signal behind prototype
    selection / SemDeDup-style "keep the hub, drop the satellites".

    Scale shape: the kNN build is a label-grouped join (Σ group², the
    accepted within-cell pattern — never corpus-wide all-pairs; at
    100 TB the grouping key is the IVF cell from the x3 family). The
    iteration is the canonical distributed PageRank: edges are
    checkpointed once and partition by src; each round is one
    src-equi join against the ranks relation plus one dst-keyed
    aggregation — one shuffle per round, rank state is 2 columns. No
    dangling mass by construction: every node in ``deg`` chose ≥ 1
    neighbor, and receivers are restricted to the same node set.

    Parity: dot products and norms are the bit-exact sequential fold;
    edge selection tiebreaks on (cos DESC, neighbor id). The rank sums
    are partial-order-dependent double adds (class-B inputs per
    functions/scalars.py), so only the FINAL rank is displayed, routed
    through DECIMAL(38,10) at 8 dp — ranks live in (0, 1), far inside
    the route's |x| ≪ 9e5 domain."""
    edges = _knn_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = (deg.crossJoin(F.broadcast(nn))
                .select(F.col("src").alias("node"),
                        (F.lit(1.0) / F.col("n")).alias("r")))
    damp, jump = float(_PR_DAMP), float(_PR_JUMP)
    for _ in range(3):
        contrib = (edges.join(ranks, edges["src"] == ranks["node"])
                        .join(deg, "src")
                        .groupBy("dst")
                        .agg(F.sum(F.col("r") / F.col("outdeg"))
                              .alias("s")))
        ranks = (deg.crossJoin(F.broadcast(nn))
                    .join(contrib, deg["src"] == contrib["dst"], "left")
                    .select(
                        F.col("src").alias("node"),
                        (F.lit(jump) / F.col("n")
                         + F.lit(damp)
                           * F.coalesce(F.col("s"), F.lit(0.0)))
                         .alias("r")))
    return (ranks.join(deg, ranks["node"] == deg["src"])
                 .select(F.col("node").alias("vec_id"), "outdeg",
                         F.round(F.col("r").cast("decimal(38,10)"), 8)
                          .cast("double").alias("pagerank")))


# ---------------------------------------------------------------------------
# OP-X2 — containment similarity (asymmetric near-dup)
# ---------------------------------------------------------------------------

@register(
    "x2_containment_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, {SQL_SHINGLES} AS s FROM toks
    ),
    tok AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh
            WHERE len(s) > 0),
    cpairs AS (
      SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
             COUNT(*) AS n_common,
             MIN(a.n) AS n_small, MIN(b.n) AS n_big
      FROM tok a JOIN tok b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       AND (a.n < b.n OR (a.n = b.n AND a.doc_id < b.doc_id))
      GROUP BY 1, 2
    )
    SELECT doc_small, doc_big, n_common,
           {sql_round_half_up(
               'CAST(n_common AS DOUBLE) / n_small', 6)} AS containment,
           {sql_round_half_up('''CAST(n_common AS DOUBLE)
                 / (n_small + n_big - n_common)''', 6)} AS jaccard
    FROM cpairs
    WHERE CAST(n_common AS DOUBLE) / n_small >= 0.9
    """,
)
def x2_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (asymmetric form) — containment |A∩B| / |A| ≥ 0.9 for the
    smaller document A: the measure that catches a document wholly
    quoted inside a much larger one, where symmetric Jaccard dilutes
    below any threshold (on this synthetic corpus the caught pairs
    coincide with near-clones, so Jaccard is reported alongside for
    contrast). Same inverted-index join as the Jaccard form (cost
    Σ df(shingle)², never all-pairs); the smaller-doc side is fixed by
    a (size, id) total order so each pair appears exactly once.
    """
    return containment_pairs(_t(spark, sf_dir, "documents"))


def containment_pairs(d: DataFrame, threshold: float = 0.9) -> DataFrame:
    """The x2_containment_pairs body over any (doc_id, text) relation —
    factored out so the asymmetric-catch semantics (true subset with
    diluted Jaccard) are unit-testable beyond the synthetic corpus."""
    spark = d.sparkSession
    sh = d.select(
        "doc_id", shingles_col(tokens_col("text")).alias("s")) \
         .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    tok = (sh.select("doc_id", F.size("s").alias("n"),
                     F.explode("s").alias("shingle"))
             .filter(F.col("n") > 0))
    a, b = tok.alias("a"), tok.alias("b")
    smaller_first = (
        (F.col("a.n") < F.col("b.n"))
        | ((F.col("a.n") == F.col("b.n"))
           & (F.col("a.doc_id") < F.col("b.doc_id"))))
    pairs = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") != F.col("b.doc_id"))
                    & smaller_first)
              .groupBy(F.col("a.doc_id").alias("doc_small"),
                       F.col("b.doc_id").alias("doc_big"))
              .agg(F.count(F.lit(1)).alias("n_common"),
                   F.min(F.col("a.n")).alias("n_small"),
                   F.min(F.col("b.n")).alias("n_big")))
    containment = (F.col("n_common").cast("double") / F.col("n_small"))
    jaccard = (F.col("n_common").cast("double")
               / (F.col("n_small") + F.col("n_big") - F.col("n_common")))

    # Rounding that feeds the oracle goes through the class-A floor
    # kernel (functions.scalars.round_half_up): shingle-count ratios
    # are deterministic-identical in both engines, and can land on
    # exact dyadic x.xxxxxx5 ties (e.g. 63/128) where both raw-double
    # ROUND and the old decimal route risk divergence. The *unrounded*
    # ratio still drives the threshold filter.
    return (pairs.filter(containment >= threshold)
                 .select("doc_small", "doc_big", "n_common",
                         round_half_up(containment, 6)
                          .alias("containment"),
                         round_half_up(jaccard, 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# OP-X4 (continued) — iterative BPE-style merge TRAINING (word-level)
# ---------------------------------------------------------------------------

def _bpe_sql_iter(i: int) -> str:
    """One unrolled training iteration as DuckDB CTEs: pair counts over
    the current symbol string, deterministic argmax, greedy merge by
    non-overlapping string replace (identical left-to-right semantics
    in both engines)."""
    prev = f"s{i - 1}"
    return f"""
    a{i} AS (
      SELECT doc_id, s,
             string_split(regexp_replace(s, '^<|>$', '', 'g'), '><') AS arr
      FROM {prev}
    ),
    p{i} AS (
      SELECT u.pa AS pa, u.pb AS pb, COUNT(*) AS cnt
      FROM (
        SELECT unnest(CASE WHEN len(arr) >= 2
               THEN [{{'pa': arr[i], 'pb': arr[i+1]}}
                     FOR i IN range(1, len(arr))]
               ELSE [] END) AS u
        FROM a{i}
      ) GROUP BY 1, 2
    ),
    b{i} AS (
      -- exactly ONE row by construction (aggregate over the <=1-row
      -- argmax): a degenerate round with no adjacent pair anywhere
      -- yields a NULL merge instead of an empty relation, so the
      -- CROSS JOIN below can never wipe out the corpus (ADVICE r4)
      SELECT MAX(pa) AS pa, MAX(pb) AS pb, MAX(merged) AS merged
      FROM (SELECT pa, pb, pa || ' ' || pb AS merged
            FROM p{i} ORDER BY cnt DESC, pa, pb LIMIT 1)
    ),
    s{i} AS (
      SELECT t.doc_id,
             CASE WHEN b.pa IS NULL THEN t.s
                  ELSE replace(t.s, '<' || b.pa || '><' || b.pb || '>',
                               '<' || b.merged || '>') END AS s
      FROM {prev} t CROSS JOIN b{i} b
    )"""


@register(
    "x4_bpe_train",
    oracle=f"""
    WITH t0 AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ),
    s0 AS (
      SELECT doc_id,
             '<' || array_to_string(toks, '><') || '>' AS s,
             len(toks) AS n0
      FROM t0 WHERE len(toks) >= 1
    ),
    {_bpe_sql_iter(1)},
    {_bpe_sql_iter(2)},
    {_bpe_sql_iter(3)},
    final AS (
      SELECT doc_id,
             len(string_split(regexp_replace(s, '^<|>$', '', 'g'), '><'))
               AS n3
      FROM s3
    )
    SELECT (SELECT merged FROM b1) AS merge_1,
           (SELECT merged FROM b2) AS merge_2,
           (SELECT merged FROM b3) AS merge_3,
           (SELECT COUNT(*) FROM s0) AS n_docs,
           (SELECT CAST(SUM(n0) AS BIGINT) FROM s0)
             AS symbols_before,
           (SELECT CAST(SUM(n3) AS BIGINT) FROM final)
             AS symbols_after
    """,
)
def x4_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — three iterations of BPE-style merge TRAINING at the
    word level (phrase-vocabulary learning — the same
    count→argmax→merge loop as Sennrich et al. BPE, over the portable
    word tokenizer instead of characters, so every symbol stays in the
    tokenizer's engine-pinned ASCII domain): each round counts
    adjacent symbol pairs corpus-wide, picks the most frequent pair
    (count desc, then (pa, pb) — fully deterministic), and greedily
    merges every non-overlapping occurrence.

    Engine-portable by construction: symbols are carried as a
    ``<sym><sym>…`` string (tokens are [a-z0-9]+, so '<', '>' and the
    space inside merged symbols are unambiguous), and merge
    application is a plain string ``replace`` — non-overlapping
    left-to-right in both engines, which IS greedy BPE application.
    The oracle replays all three unrolled iterations with correlated
    CTEs.

    Scale shape (per iteration): explode → map-side-combined pair
    count → ONE shuffle on the pair, TakeOrdered(1) for the argmax,
    then the 1-row merge broadcast-joins back and the merge applies
    scan-side — no driver-side data path anywhere (the argmax stays a
    1-row relation in-plan, the kmeans-trainer pattern). A real
    subword trainer runs the identical loop for 30k rounds with the
    pair counts incrementally maintained; the 3-round unroll pins the
    semantics."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    s0 = (d.select("doc_id", toks.alias("toks"))
           .filter(F.size("toks") >= 1)
           .select("doc_id", F.size("toks").alias("n0"),
                   F.concat(F.lit("<"),
                            F.array_join("toks", "><"),
                            F.lit(">")).alias("s"))
           .transform(ckpt))  # 3 rounds re-read it; scan once

    def step(seqs: DataFrame):
        arr = F.split(F.regexp_replace("s", "^<|>$", ""), "><")
        m = F.greatest(F.size(arr) - 1, F.lit(0))
        pairs = F.zip_with(
            F.slice(arr, 1, m), F.slice(arr, 2, m),
            lambda x, y: F.struct(x.alias("pa"), y.alias("pb")))
        # aggregate the <=1-row argmax into EXACTLY one row (NULLs on
        # a degenerate round with no adjacent pair anywhere) so the
        # broadcast cross join below can never wipe out the corpus and
        # the merge degrades to a no-op — mirrored in _bpe_sql_iter's
        # b{i}/s{i} CTEs (ADVICE r4)
        best = (seqs.select(F.explode(pairs).alias("u"))
                    .groupBy(F.col("u.pa").alias("pa"),
                             F.col("u.pb").alias("pb"))
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .orderBy(F.desc("cnt"), "pa", "pb").limit(1)
                    .select("pa", "pb",
                            F.concat_ws(" ", "pa", "pb")
                             .alias("merged"))
                    .agg(F.max("pa").alias("pa"),
                         F.max("pb").alias("pb"),
                         F.max("merged").alias("merged")))
        merged_s = F.replace(
            F.col("s"),
            F.concat(F.lit("<"), F.col("pa"),
                     F.lit("><"), F.col("pb"), F.lit(">")),
            F.concat(F.lit("<"), F.col("merged"), F.lit(">")))
        nxt = (seqs.crossJoin(F.broadcast(best))
                   .select("doc_id", "n0",
                           F.when(F.col("pa").isNull(), F.col("s"))
                            .otherwise(merged_s).alias("s")))
        return nxt, best

    s1, b1 = step(s0)
    s2, b2 = step(ckpt(s1))
    s3, b3 = step(ckpt(s2))
    arr3 = F.split(F.regexp_replace("s", "^<|>$", ""), "><")
    report = (s3.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n0").alias("symbols_before"),
                     F.sum(F.size(arr3)).alias("symbols_after")))
    return (b1.select(F.col("merged").alias("merge_1"))
              .crossJoin(b2.select(F.col("merged").alias("merge_2")))
              .crossJoin(b3.select(F.col("merged").alias("merge_3")))
              .crossJoin(report)  # all 1-row relations by construction
              .select("merge_1", "merge_2", "merge_3", "n_docs",
                      "symbols_before", "symbols_after"))


# ---------------------------------------------------------------------------
# OP-X3 (continued) — product quantization (PQ) with ADC scoring
# ---------------------------------------------------------------------------

#: DuckDB L2² between two DOUBLE[] lists named a and b (sequential fold).
def _sql_l2sq(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0.0, "
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
            f"(acc, x) -> acc + x)")


@register(
    "x3_pq_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sub AS (
      SELECT vec_id, j, e[j * 8 + 1 : j * 8 + 8] AS sv
      FROM v CROSS JOIN (SELECT UNNEST(range(8))::INT AS j)
    ),
    cbv AS (SELECT vec_id FROM v {_sql_hash_sample(_H_CODE, K_CODES)}),
    cb AS (
      SELECT s.vec_id AS cid, s.j, s.sv AS cv
      FROM sub s JOIN cbv ON s.vec_id = cbv.vec_id
    ),
    codes AS (
      SELECT vec_id, j, cid FROM (
        SELECT s.vec_id, s.j, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY {_sql_l2sq('s.sv', 'c.cv')}, c.cid) AS rn
        FROM sub s JOIN cb c ON s.j = c.j
      ) WHERE rn = 1
    ),
    qv AS (SELECT vec_id FROM v {_sql_hash_sample(_H_QUERY, N_QUERIES)}),
    queries AS (SELECT s.vec_id AS query_id, s.j, s.sv
                FROM sub s JOIN qv ON s.vec_id = qv.vec_id),
    lut AS (
      SELECT q.query_id, c.j, c.cid,
             {_sql_l2sq('q.sv', 'c.cv')} AS d2
      FROM queries q JOIN cb c ON q.j = c.j
    ),
    scored AS (
      SELECT l.query_id, k.vec_id,
             list_reduce(list_prepend(0.0,
               [x.d2 FOR x IN list_sort(list(struct_pack(j := l.j,
                                                         d2 := l.d2)))]),
               (acc, x) -> acc + x) AS total_d2
      FROM codes k JOIN lut l ON k.j = l.j AND k.cid = l.cid
      GROUP BY l.query_id, k.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id,
           {sql_round_half_up('total_d2', 6)} AS approx_d2
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY total_d2, vec_id) AS rn
      FROM scored WHERE query_id <> vec_id
    ) WHERE rn <= 3
    """,
)
def x3_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — product quantization with asymmetric-distance (ADC)
    scoring, the industry-standard ANN compression beyond int8
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search"): the 64-dim embedding splits into 8 subspaces of 8 dims;
    each subvector is encoded as the id of its nearest codebook entry
    (fixed-size K_CODES hash-rank medoid codebooks — N-independent by
    construction, so the index build is reproducible, oracle-checkable
    AND the broadcast side is a literal constant at any corpus size;
    exactly the x3_ivf_topk convention; production swaps per-subspace
    k-means, same plan shape — see x3_ivfpq_learned). A query batch is
    a fixed N_QUERIES hash-rank sample; a query is NOT quantized: it
    precomputes a (query, subspace, code) → L2² lookup table against
    the codebook — (N_QUERIES × 8 × K_CODES) rows, a constant — and
    every database vector's approximate distance is the sum of 8
    LUT entries addressed by its codes — the memory-bandwidth trick
    that makes billion-vector search fit in RAM (8 bytes/vector here
    vs 512).

    Engine parity: every distance is a sequential left-to-right fold
    (bit-exact both engines), the per-vector total sums its 8 LUT
    entries in EXPLICIT j-order (collect → sort by j → fold — never an
    unordered SUM, so no accumulation-order noise), argmin/top-k carry
    (cid / vec_id) tiebreaks, and the displayed distance goes through
    the class-A floor kernel.

    Scale shape: encoding joins N×8 subvectors against a broadcast
    codebook (K_CODES×8 rows — a literal constant); the LUT is
    (N_QUERIES × 8 × K_CODES) rows — a constant, so "broadcast-sized"
    is enforced by construction, not by convention; scoring is ONE
    hash join of the N×8 code table against the LUT on (j, cid) + a
    (query, vec) aggregation — no all-pairs vector math anywhere; the
    512-bit-per-vector float table is never shuffled."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    sub = v.select(
        "vec_id",
        F.posexplode(F.array(*[F.slice("e", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "sv"))
    cb_ids = _hash_sample(v.select("vec_id"), K_CODES, _H_CODE)
    # consumed twice (encode + LUT): materialize the 256-row codebook
    cb = ckpt(sub.join(F.broadcast(cb_ids), "vec_id")
                 .select(F.col("vec_id").alias("cid"), "j",
                         F.col("sv").alias("cv")))

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    # argmin via min(struct(d2, cid)) — map-side combine, no sort
    # window over the N×8×K encode relation (see operators/kmeans)
    codes = (sub.join(F.broadcast(cb), "j")
                .withColumn("d2", l2sq(F.col("sv"), F.col("cv")))
                .groupBy("vec_id", "j")
                .agg(F.min(F.struct("d2", "cid")).alias("b"))
                .select("vec_id", "j", F.col("b.cid").alias("cid")))
    q_ids = _hash_sample(v.select("vec_id"), N_QUERIES, _H_QUERY)
    queries = (sub.join(F.broadcast(q_ids), "vec_id")
                  .select(F.col("vec_id").alias("query_id"), "j",
                          F.col("sv").alias("qv")))
    lut = (queries.join(F.broadcast(cb), "j")
                  .select("query_id", "j", "cid",
                          l2sq(F.col("qv"), F.col("cv")).alias("d2")))
    scored = (codes.join(F.broadcast(lut), ["j", "cid"])
                   .groupBy("query_id", "vec_id")
                   .agg(F.aggregate(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("j", "d2"))),
                           lambda s: s["d2"]),
                       F.lit(0.0), lambda acc, x: acc + x)
                       .alias("total_d2")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("total_d2").asc(), F.col("vec_id"))
    return (scored.filter(F.col("query_id") != F.col("vec_id"))
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3)
                  .select("query_id",
                          F.col("vec_id").alias("neighbor_id"),
                          round_half_up(F.col("total_d2"), 6)
                           .alias("approx_d2")))


def _sql_ivfpq_ctes() -> str:
    """Shared CTE chain of the IVF-PQ index build + scoring — reused
    by the top-k oracle and the recall report (the _SQL_JPAIRS
    pattern)."""
    return f"""v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
      WHERE sqrt({_sql_dot('e', 'e')}) > 0
    ),
    cent AS (SELECT vec_id AS ccid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    assigned AS (
      SELECT vec_id, e, cell FROM (
        SELECT b.vec_id, b.e, cent.ccid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY {_sql_dot('b.e', 'cent.ce')}
                          / (b.nrm * cent.cnrm) DESC, cent.ccid) AS rc
        FROM n b CROSS JOIN cent
      ) WHERE rc = 1
    ),
    sub AS (
      SELECT vec_id, cell, j, e[j * 8 + 1 : j * 8 + 8] AS sv
      FROM assigned CROSS JOIN (SELECT UNNEST(range(8))::INT AS j)
    ),
    cbv AS (SELECT vec_id FROM n {_sql_hash_sample(_H_CODE, K_CODES)}),
    cb AS (
      SELECT s.vec_id AS cid, s.j, s.sv AS cv
      FROM sub s JOIN cbv ON s.vec_id = cbv.vec_id
    ),
    codes AS (
      SELECT vec_id, cell, j, cid FROM (
        SELECT s.vec_id, s.cell, s.j, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY {_sql_l2sq('s.sv', 'c.cv')}, c.cid) AS rn
        FROM sub s JOIN cb c ON s.j = c.j
      ) WHERE rn = 1
    ),
    qv AS (SELECT vec_id FROM n {_sql_hash_sample(_H_QUERY, N_QUERIES)}),
    queries AS (SELECT s.vec_id AS query_id, s.cell AS qcell, s.j, s.sv
                FROM sub s JOIN qv ON s.vec_id = qv.vec_id),
    lut AS (
      SELECT q.query_id, q.qcell, c.j, c.cid,
             {_sql_l2sq('q.sv', 'c.cv')} AS d2
      FROM queries q JOIN cb c ON q.j = c.j
    ),
    scored AS (
      SELECT l.query_id, k.vec_id,
             list_reduce(list_prepend(0.0,
               [x.d2 FOR x IN list_sort(list(struct_pack(j := l.j,
                                                         d2 := l.d2)))]),
               (acc, x) -> acc + x) AS total_d2
      FROM codes k JOIN lut l
        ON k.j = l.j AND k.cid = l.cid AND k.cell = l.qcell
      GROUP BY l.query_id, k.vec_id
    )"""


@register(
    "x3_ivfpq_topk",
    oracle=f"""
    WITH {_sql_ivfpq_ctes()}
    SELECT query_id, vec_id AS neighbor_id,
           {sql_round_half_up('total_d2', 6)} AS approx_d2
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY total_d2, vec_id) AS rn
      FROM scored WHERE query_id <> vec_id
    ) WHERE rn <= 3
    """,
)
def x3_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — IVF-PQ, the FAISS-canonical production index: coarse
    IVF cells (fixed-size K_COARSE hash-rank medoids, nprobe=1 —
    x3_ivf_topk's convention) restrict WHICH vectors a query scores,
    and product-quantization codes with an ADC lookup table decide HOW
    each candidate is scored (x3_pq_topk's structure, fixed K_CODES
    codebooks and a fixed N_QUERIES batch). Search cost becomes
    Σ |cell ∩ 8-byte codes| LUT additions — both the candidate count
    AND the per-candidate cost are compressed, which is why this
    exact composition serves billion-vector workloads.

    Fully oracle-exact like its two parents: float coarse assignment,
    argmin code assignment with (cid) tiebreaks, j-ordered LUT folds,
    (vec_id) ranking tiebreaks, class-A floor rounding.

    Scale shape: coarse assignment = K_COARSE-centroid broadcast
    (a literal constant); encoding = N×8 subvectors vs the constant
    broadcast codebook; scoring = ONE hash join of the code table
    against the constant broadcast LUT on (cell, j, code) — the cell
    predicate rides the same join, so non-cell candidates are dropped
    at the join, never materialized; no float vector is ever shuffled
    after encoding. Every broadcast side is N-independent by
    construction (VERDICT r4 item 1)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
             .select(F.col("vec_id").alias("ccid"),
                     F.col("e").alias("ce"),
                     F.col("nrm").alias("cnrm")))
    cos_c = (_dot(F.col("e"), F.col("ce"))
             / (F.col("nrm") * F.col("cnrm")))
    # argmin via min(struct) — see x3_int8_ivf_topk: map-side partial
    # aggregation instead of a K×N sort window, fold evaluated once.
    best = (n.repartition(spark.sparkContext.defaultParallelism,
                          "vec_id")
             .crossJoin(F.broadcast(cent))
             .groupBy("vec_id")
             .agg(F.min(F.struct((-cos_c).alias("nc"), "ccid"))
                   .alias("b")))
    assigned = (n.join(best, "vec_id")
                 .select("vec_id", "e", F.col("b.ccid").alias("cell")))
    sub = assigned.select(
        "vec_id", "cell",
        F.posexplode(F.array(*[F.slice("e", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "sv"))
    cb_ids = _hash_sample(n.select("vec_id"), K_CODES, _H_CODE)
    # the codebook is consumed twice (encode + LUT) — materialize the
    # 256-row relation once so the TakeOrdered sample and the cell
    # assignment feeding it don't replay per consumer
    cb = ckpt(sub.join(F.broadcast(cb_ids), "vec_id")
                 .select(F.col("vec_id").alias("cid"), "j",
                         F.col("sv").alias("cv")))

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    codes = (sub.join(F.broadcast(cb), "j")
                .withColumn("d2", l2sq(F.col("sv"), F.col("cv")))
                .groupBy("vec_id", "cell", "j")
                .agg(F.min(F.struct("d2", "cid")).alias("b"))
                .select("vec_id", "cell", "j",
                        F.col("b.cid").alias("cid")))
    q_ids = _hash_sample(n.select("vec_id"), N_QUERIES, _H_QUERY)
    queries = (sub.join(F.broadcast(q_ids), "vec_id")
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("cell").alias("qcell"), "j",
                          F.col("sv").alias("qv")))
    # distinct column names: codes and lut both descend from `sub`, so
    # qualified attribute references would be ambiguous self-join refs
    lut = (queries.join(F.broadcast(cb), "j")
                  .select("query_id",
                          F.col("qcell").alias("lcell"),
                          F.col("j").alias("lj"),
                          F.col("cid").alias("lcid"),
                          l2sq(F.col("qv"), F.col("cv")).alias("d2")))
    scored = (codes.join(
                  F.broadcast(lut),
                  (F.col("j") == F.col("lj"))
                  & (F.col("cid") == F.col("lcid"))
                  & (F.col("cell") == F.col("lcell")))
                   .groupBy("query_id", "vec_id")
                   .agg(F.aggregate(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("lj", "d2"))),
                           lambda s: s["d2"]),
                       F.lit(0.0), lambda acc, x: acc + x)
                       .alias("total_d2")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("total_d2").asc(), F.col("vec_id"))
    return (scored.filter(F.col("query_id") != F.col("vec_id"))
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3)
                  .select("query_id",
                          F.col("vec_id").alias("neighbor_id"),
                          round_half_up(F.col("total_d2"), 6)
                           .alias("approx_d2")))


@register(
    "x3_ivfpq_recall_report",
    oracle=f"""
    WITH {_sql_ivfpq_ctes()},
    approx AS (
      SELECT query_id, vec_id AS neighbor_id
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY total_d2, vec_id) AS rn
        FROM scored WHERE query_id <> vec_id
      ) WHERE rn <= 3
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_l2sq('q.e', 'x.e')}, x.vec_id) AS rn
        FROM v q JOIN qv ON q.vec_id = qv.vec_id
                 JOIN v x ON x.vec_id <> q.vec_id
      ) WHERE rn <= 3
    )
    SELECT t.query_id, COUNT(*) AS n_true,
           CAST(COALESCE(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_hit,
           {sql_round_half_up('''SUM(CASE WHEN a.neighbor_id IS NOT
                NULL THEN 1 ELSE 0 END) / COUNT(*)''', 6)} AS recall
    FROM truth t LEFT JOIN approx a
      ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
    GROUP BY t.query_id
    """,
)
def x3_ivfpq_recall_report(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """OP-X3 — recall@3 of the composed IVF-PQ index against exact-L2
    ground truth, per query: the observability half of the production
    index (x3_recall_report's pattern applied to the compressed form —
    an index whose DOUBLE compression you can't measure is an index
    you can't trust). The exact side is bounded by the same fixed
    N_QUERIES hash-rank sample (brute force over a CONSTANT number of
    queries — the ground-truth cost no longer grows with the corpus);
    the report shape — join on (query, neighbor), count hits — is
    scale-free. Oracle-exact: both pipelines replay in SQL and the
    recall ratio goes through the class-A floor kernel."""
    approx = (x3_ivfpq_topk(spark, sf_dir)
              .select("query_id", "neighbor_id",
                      F.lit(1).alias("hit")))
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    nz = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
           .filter(F.col("nrm") > 0))
    q_ids = _hash_sample(nz.select("vec_id"), N_QUERIES, _H_QUERY)
    q = (v.join(F.broadcast(q_ids), "vec_id")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("e").alias("qe")))

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    wt = Window.partitionBy("query_id").orderBy(
        l2sq(F.col("qe"), F.col("e")).asc(), F.col("vec_id"))
    truth = (v.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id")
              .crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("rn", F.row_number().over(wt))
              .filter(F.col("rn") <= 3)
              .select("query_id",
                      F.col("vec_id").alias("neighbor_id")))
    j = truth.join(approx, ["query_id", "neighbor_id"], "left")
    n_hit = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (j.groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_true"),
                  n_hit.alias("n_hit"),
                  round_half_up(n_hit.cast("double")
                                / F.count(F.lit(1)), 6)
                   .alias("recall")))


# ---------------------------------------------------------------------------
# OP-X3 (continued) — IVF-PQ with LEARNED codebooks (k-means trained)
# ---------------------------------------------------------------------------

@register(
    "x3_ivfpq_learned",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id FROM v WHERE sqrt({_sql_dot('e', 'e')}) > 0
    )
    SELECT (SELECT COUNT(*) FROM n) AS n_vectors,
           TRUE AS cells_ok,
           TRUE AS codes_ok,
           TRUE AS inertia_monotone,
           TRUE AS coarse_inertia_monotone,
           TRUE AS recall_ok
    """,
)
def x3_ivfpq_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — IVF-PQ with *learned* codebooks: the production form the
    medoid-seeded ``x3_ivfpq_topk`` docstring promises. Coarse cells
    come from distributed Lloyd's k-means over the full vectors
    (operators/kmeans.py, K_COARSE cells), and the 8 per-subspace PQ
    codebooks are trained SIMULTANEOUSLY by the grouped trainer
    (``kmeans_fit_assign_grouped`` — one broadcast / one argmin window
    / one hash agg per iteration for ALL subspaces; never a per-group
    driver loop). Scoring then replays the exact x3_ivfpq_topk plan
    shape — codes hash-join the broadcast per-query ADC LUT on
    (cell, j, code) — with learned centroids swapped for the hash-rank
    medoids: zero plan-shape diff (VERDICT r4 item 2).

    Trained centroid MEANS are FP-summation-order-dependent, which no
    second engine reproduces — so the registered query emits the
    oracle-checkable *verdict report* (x3_kmeans_cells pattern), each
    column falsifiable:

    - ``cells_ok`` — every non-zero vector assigned exactly one coarse
      cell, cell count in [1, K_COARSE];
    - ``codes_ok`` — exactly 8 subspace codes per vector (N×8 rows);
    - ``inertia_monotone`` — 3-round PQ-codebook inertia ≤ 1-round
      (Lloyd's is non-increasing; the grouped trainer's own property);
    - ``coarse_inertia_monotone`` — the same non-increasing check on
      the COARSE trainer's own per-iteration log (ADVICE r5 item 2:
      the coarse training is now verified, not just the PQ codebooks);
    - ``recall_ok`` — mean recall@3 of the learned index over the
      fixed N_QUERIES batch ≥ the medoid index's mean recall − 0.15:
      training must not degrade the index materially (measured:
      learned ≥ medoid at every shipped SF; the slack absorbs the
      ±1-hit quantization of a 32-query batch, not a real regression).
    """
    from ..operators.kmeans import (
        kmeans_fit_assign, kmeans_fit_assign_grouped,
    )
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))

    # coarse IVF cells: learned on a bounded 8·K training sample
    # (the FAISS posture — k-means needs ~100·K training points, not
    # the corpus), then ONE full assignment pass; BOTH trainers' own
    # per-iteration inertia logs feed the monotonicity verdicts
    # without re-training shorter twins.
    pq_log: list = []
    coarse_log: list = []
    # r16 (guide §2.4): ONE TakeOrdered collect serves BOTH trainers —
    # the grouped subspace sample is the driver-side slicing of the
    # same hash-order prefix (identical doubles to F.slice; identical
    # ids by the shared-id-universe property). The r15 form collected
    # twice, the grouped one through an extra distinct+broadcast join.
    pre = [(r["vec_id"], r["e"]) for r in
           n.select("vec_id", "e")
            .orderBy(F.md5(F.col("vec_id").cast("string")),
                     F.col("vec_id"))
            .limit(8 * max(K_COARSE, K_CODES)).collect()]
    coarse = kmeans_fit_assign(n, "vec_id", "e",
                               k=K_COARSE, n_iter=3,
                               train_sample=8 * K_COARSE,
                               inertia_log=coarse_log,
                               sample_rows=pre[:8 * K_COARSE])
    assigned = (n.join(coarse.select(F.col("id").alias("vec_id"),
                                     "cell"), "vec_id")
                 .select("vec_id", "e", "cell"))
    sub = assigned.select(
        "vec_id", "cell",
        F.posexplode(F.array(*[F.slice("e", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "sv"))

    # per-subspace PQ codebooks: learned on the same bounded-sample
    # discipline (8·K ids, every subspace)
    enc3, cb = kmeans_fit_assign_grouped(
        sub, "j", "vec_id", "sv", k=K_CODES, n_iter=3,
        train_sample=8 * K_CODES, inertia_log=pq_log,
        sample_rows=[(j, i, list(ev[8 * j:8 * j + 8]))
                     for i, ev in pre[:8 * K_CODES]
                     for j in range(8)])
    codes = (enc3.select(F.col("id").alias("vec_id"),
                         F.col("grp").alias("j"),
                         F.col("cell").alias("code"))
                 .join(assigned.select("vec_id", "cell"), "vec_id"))

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    q_ids = _hash_sample(n.select("vec_id"), N_QUERIES, _H_QUERY)
    queries = (sub.join(F.broadcast(q_ids), "vec_id")
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("cell").alias("qcell"), "j",
                          F.col("sv").alias("qv")))
    lut = (queries.join(
               F.broadcast(cb.select(F.col("grp").alias("j"),
                                     F.col("cell").alias("lcode"),
                                     "ce")), "j")
                  .select("query_id",
                          F.col("qcell").alias("lcell"),
                          F.col("j").alias("lj"),
                          "lcode",
                          l2sq(F.col("qv"), F.col("ce")).alias("d2")))
    scored = (codes.join(
                  F.broadcast(lut),
                  (F.col("j") == F.col("lj"))
                  & (F.col("code") == F.col("lcode"))
                  & (F.col("cell") == F.col("lcell")))
                   .groupBy("query_id", "vec_id")
                   .agg(F.aggregate(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("lj", "d2"))),
                           lambda s: s["d2"]),
                       F.lit(0.0), lambda acc, x: acc + x)
                       .alias("total_d2")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("total_d2").asc(), F.col("vec_id"))
    approx = (scored.filter(F.col("query_id") != F.col("vec_id"))
                    .withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") <= 3)
                    .select("query_id",
                            F.col("vec_id").alias("neighbor_id"),
                            F.lit(1).alias("hit")))

    # exact ground truth over the SAME fixed query batch (linear:
    # N_QUERIES × N, constant broadcast query side)
    q = (v.join(F.broadcast(q_ids), "vec_id")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("e").alias("qe")))
    wt = Window.partitionBy("query_id").orderBy(
        l2sq(F.col("qe"), F.col("e")).asc(), F.col("vec_id"))
    truth = (v.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id")
              .crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("rn", F.row_number().over(wt))
              .filter(F.col("rn") <= 3)
              .select("query_id",
                      F.col("vec_id").alias("neighbor_id")))
    medoid = (x3_ivfpq_topk(spark, sf_dir)
              .select("query_id", "neighbor_id",
                      F.lit(1).alias("hit")))

    def mean_recall(approx_df):
        j = truth.join(approx_df, ["query_id", "neighbor_id"], "left")
        per_q = (j.groupBy("query_id")
                  .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                        / F.count(F.lit(1))).alias("r")))
        return per_q.agg(F.avg("r").alias("mr"))

    # 1-row verdict aggregates; cross joins are bounded by contract
    n_total = n.agg(F.count(F.lit(1)).alias("n_vectors"))
    cells = coarse.agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.count_distinct("cell").alias("n_cells"))
    ncodes = enc3.agg(F.count(F.lit(1)).alias("n_codes"))
    i3 = pq_log[-1].select(F.col("inertia").alias("inertia3"))
    i1 = pq_log[0].select(F.col("inertia").alias("inertia1"))
    c3 = coarse_log[-1].select(F.col("inertia").alias("cinertia3"))
    c1 = coarse_log[0].select(F.col("inertia").alias("cinertia1"))
    rl = mean_recall(approx).withColumnRenamed("mr", "r_learned")
    rm = mean_recall(medoid).withColumnRenamed("mr", "r_medoid")
    return (n_total.crossJoin(cells).crossJoin(ncodes)
            .crossJoin(i3).crossJoin(i1).crossJoin(c3).crossJoin(c1)
            .crossJoin(rl).crossJoin(rm)
            .select(
                "n_vectors",
                ((F.col("n_assigned") == F.col("n_vectors"))
                 & F.col("n_cells").between(1, K_COARSE))
                 .alias("cells_ok"),
                (F.col("n_codes") == F.col("n_vectors") * 8)
                 .alias("codes_ok"),
                # tiny FP slack: the rounds share seed sums, so
                # equality-at-convergence must not flake
                (F.col("inertia3") <= F.col("inertia1") * 1.0000001)
                 .alias("inertia_monotone"),
                (F.col("cinertia3") <= F.col("cinertia1") * 1.0000001)
                 .alias("coarse_inertia_monotone"),
                (F.col("r_learned") >= F.col("r_medoid") - 0.15)
                 .alias("recall_ok")))


# ---------------------------------------------------------------------------
# OP-X3 — RESIDUAL IVF-PQ (VERDICT r5 next-round #2): the production
# FAISS form — PQ quantizes vec − coarse_centroid(vec), not the raw
# subvectors, the standard recall lever at fixed bytes/vector.
# ---------------------------------------------------------------------------

@register(
    "x3_ivfpq_residual",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id FROM v WHERE sqrt({_sql_dot('e', 'e')}) > 0
    )
    SELECT (SELECT COUNT(*) FROM n) AS n_vectors,
           TRUE AS cells_ok,
           TRUE AS codes_ok,
           TRUE AS residual_centered,
           TRUE AS recall_ok
    """,
)
def x3_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — residual IVF-PQ vs raw-subvector IVF-PQ, trained on the
    SAME coarse cells and judged on the same query batch. Production
    FAISS IVFPQ quantizes the residual ``vec − coarse_centroid(vec)``:
    after cell assignment the residual population is centered near the
    origin with far less spread than the raw corpus, so K_CODES
    codebook entries cover it with smaller quantization error — the
    standard recall lever at fixed bytes per vector (VERDICT r5 item 2).

    Build: ONE coarse k-means (operators/kmeans.py, centroids captured
    via ``centroids_log``), then residualization is exactly one
    broadcast join of the K_COARSE×8 centroid-subspace table and a
    ``zip_with`` subtraction — the grouped PQ trainer, the ADC LUT and
    the scoring join replay the x3_ivfpq_learned plan shape unchanged
    on both variants (zero plan-shape diff except the subtraction).
    The query side residualizes against the QUERY's own cell (nprobe=1,
    the family convention), so LUT entries and codes are expressed in
    the same cell-local frame.

    Verdict columns (each falsifiable):

    - ``cells_ok`` / ``codes_ok`` — completeness: every non-zero
      vector in exactly one cell; BOTH code tables are N×8;
    - ``residual_centered`` — Σ‖residual subvectors‖² equals the coarse
      assignment's own Σ sq_dist to 1e-6 relative (the residual really
      is vec − assigned-centroid, not some other vector: the two sums
      are computed by different plans and would diverge on any indexing
      or join-frame mistake);
    - ``recall_ok`` — residual recall@3 ≥ raw recall@3 − 0.10 on the
      fixed N_QUERIES batch. Measured honestly: on the shipped
      SYNTHETIC embeddings the two are within ±0.03 of each other at
      every SF (sf0.001 0.094 vs 0.115, sf0.01 0.156 vs 0.167, sf0.1
      0.125 vs 0.104) — i.i.d. random vectors have no cluster
      structure for residualization to exploit, so the expected
      production gain is not observable at toy scale. What the query
      pins is the MACHINERY (correct residual frames end-to-end via
      ``residual_centered``, no material recall regression); the
      recall win is the documented reason production corpora use this
      form, not a property of this testdata.
    """
    from ..operators.kmeans import (
        kmeans_fit_assign, kmeans_fit_assign_grouped,
    )
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))

    cent_log: list = []
    # r16 (guide §2.4): one TakeOrdered collect serves the coarse
    # trainer AND the raw-subspace PQ trainer (driver-side slicing of
    # the same hash-order prefix — the x3_ivfpq_learned fusion); the
    # RESIDUAL trainer keeps its own sampled collect, because its
    # training vectors depend on the trained cells (rv = sv − cv) and
    # its collect reads the already-checkpointed assignment, not the
    # corpus.
    pre = [(r["vec_id"], r["e"]) for r in
           n.select("vec_id", "e")
            .orderBy(F.md5(F.col("vec_id").cast("string")),
                     F.col("vec_id"))
            .limit(8 * max(K_COARSE, K_CODES)).collect()]
    coarse = kmeans_fit_assign(n, "vec_id", "e",
                               k=K_COARSE, n_iter=3,
                               train_sample=8 * K_COARSE,
                               centroids_log=cent_log,
                               sample_rows=pre[:8 * K_COARSE])
    centroids = cent_log[0]                      # (cell, ce) — K rows
    assigned = (n.join(coarse.select(F.col("id").alias("vec_id"),
                                     "cell", "sq_dist"), "vec_id")
                 .select("vec_id", "e", "cell", "sq_dist"))
    sub = assigned.select(
        "vec_id", "cell",
        F.posexplode(F.array(*[F.slice("e", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "sv"))
    csub = centroids.select(
        "cell",
        F.posexplode(F.array(*[F.slice("ce", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "cv"))
    rsub = (sub.join(F.broadcast(csub), ["cell", "j"])
               .select("vec_id", "cell", "j",
                       F.zip_with("sv", "cv", lambda x, y: x - y)
                        .alias("rv")))

    enc_raw, cb_raw = kmeans_fit_assign_grouped(
        sub, "j", "vec_id", "sv", k=K_CODES, n_iter=3,
        train_sample=8 * K_CODES,
        sample_rows=[(j, i, list(ev[8 * j:8 * j + 8]))
                     for i, ev in pre[:8 * K_CODES]
                     for j in range(8)])
    enc_res, cb_res = kmeans_fit_assign_grouped(
        rsub, "j", "vec_id", "rv", k=K_CODES, n_iter=3,
        train_sample=8 * K_CODES)

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    def ssq(a):
        return F.aggregate(F.transform(a, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)

    q_ids = _hash_sample(n.select("vec_id"), N_QUERIES, _H_QUERY)

    def topk(enc, cb, qsub):
        """The x3_ivfpq_learned scoring plan: broadcast per-query ADC
        LUT on (cell, j, code), explicit j-order 8-entry sum, top-3 by
        (total_d2, vec_id)."""
        codes = (enc.select(F.col("id").alias("vec_id"),
                            F.col("grp").alias("j"),
                            F.col("cell").alias("code"))
                    .join(assigned.select("vec_id", "cell"), "vec_id"))
        lut = (qsub.join(
                   F.broadcast(cb.select(F.col("grp").alias("j"),
                                         F.col("cell").alias("lcode"),
                                         "ce")), "j")
                   .select("query_id",
                           F.col("qcell").alias("lcell"),
                           F.col("j").alias("lj"),
                           "lcode",
                           l2sq(F.col("qv"), F.col("ce")).alias("d2")))
        scored = (codes.join(
                      F.broadcast(lut),
                      (F.col("j") == F.col("lj"))
                      & (F.col("code") == F.col("lcode"))
                      & (F.col("cell") == F.col("lcell")))
                       .groupBy("query_id", "vec_id")
                       .agg(F.aggregate(
                           F.transform(
                               F.array_sort(F.collect_list(
                                   F.struct("lj", "d2"))),
                               lambda s: s["d2"]),
                           F.lit(0.0), lambda acc, x: acc + x)
                           .alias("total_d2")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("total_d2").asc(), F.col("vec_id"))
        return (scored.filter(F.col("query_id") != F.col("vec_id"))
                      .withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") <= 3)
                      .select("query_id",
                              F.col("vec_id").alias("neighbor_id"),
                              F.lit(1).alias("hit")))

    qsub_raw = (sub.join(F.broadcast(q_ids), "vec_id")
                   .select(F.col("vec_id").alias("query_id"),
                           F.col("cell").alias("qcell"), "j",
                           F.col("sv").alias("qv")))
    qsub_res = (rsub.join(F.broadcast(q_ids), "vec_id")
                    .select(F.col("vec_id").alias("query_id"),
                            F.col("cell").alias("qcell"), "j",
                            F.col("rv").alias("qv")))
    approx_raw = topk(enc_raw, cb_raw, qsub_raw)
    approx_res = topk(enc_res, cb_res, qsub_res)

    # exact ground truth over the same fixed query batch
    q = (v.join(F.broadcast(q_ids), "vec_id")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("e").alias("qe")))
    wt = Window.partitionBy("query_id").orderBy(
        l2sq(F.col("qe"), F.col("e")).asc(), F.col("vec_id"))
    truth = (v.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id")
              .crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("rn", F.row_number().over(wt))
              .filter(F.col("rn") <= 3)
              .select("query_id",
                      F.col("vec_id").alias("neighbor_id")))

    def mean_recall(approx_df):
        j = truth.join(approx_df, ["query_id", "neighbor_id"], "left")
        per_q = (j.groupBy("query_id")
                  .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                        / F.count(F.lit(1))).alias("r")))
        return per_q.agg(F.avg("r").alias("mr"))

    n_total = n.agg(F.count(F.lit(1)).alias("n_vectors"))
    cells = coarse.agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.count_distinct("cell").alias("n_cells"))
    ncodes = (enc_raw.agg(F.count(F.lit(1)).alias("n_raw"))
              .crossJoin(enc_res.agg(F.count(F.lit(1)).alias("n_res"))))
    res_sq = rsub.agg(F.sum(ssq(F.col("rv"))).alias("res_sq"))
    asg_sq = assigned.agg(F.sum("sq_dist").alias("asg_sq"))
    rr = mean_recall(approx_res).withColumnRenamed("mr", "r_res")
    rw = mean_recall(approx_raw).withColumnRenamed("mr", "r_raw")
    return (n_total.crossJoin(cells).crossJoin(ncodes)
            .crossJoin(res_sq).crossJoin(asg_sq)
            .crossJoin(rr).crossJoin(rw)
            .select(
                "n_vectors",
                ((F.col("n_assigned") == F.col("n_vectors"))
                 & F.col("n_cells").between(1, K_COARSE))
                 .alias("cells_ok"),
                ((F.col("n_raw") == F.col("n_vectors") * 8)
                 & (F.col("n_res") == F.col("n_vectors") * 8))
                 .alias("codes_ok"),
                (F.abs(F.col("res_sq") - F.col("asg_sq"))
                 <= 1e-6 * F.greatest(F.col("asg_sq"), F.lit(1e-12)))
                 .alias("residual_centered"),
                (F.col("r_res") >= F.col("r_raw") - 0.10)
                 .alias("recall_ok")))


# ---------------------------------------------------------------------------
# OP-X3 — streaming ANN ingest (VERDICT r5 next-round #4): append new
# vectors to a trained IVF-PQ index WITHOUT retraining — the ANN twin
# of x2_incremental_minhash's "never re-band the warehouse" posture.
# ---------------------------------------------------------------------------

@register(
    "x3_ivf_ingest",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id FROM v WHERE sqrt({_sql_dot('e', 'e')}) > 0
    )
    SELECT (SELECT COUNT(*) FROM n) AS n_vectors,
           (SELECT COUNT(*) FROM n WHERE vec_id % 7 = 0) AS n_arrivals,
           TRUE AS cells_ok,
           TRUE AS codes_ok,
           TRUE AS recall_ok
    """,
)
def x3_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — incremental index ingest: the warehouse (``vec_id % 7 !=
    0``, ~86%) trains a learned IVF-PQ index ONCE; arrivals (~14%) are
    then appended by assigning each to its nearest EXISTING cell
    (broadcast K_COARSE centroids, one ``min(struct)`` argmin), PQ-
    encoding against the EXISTING codebooks (broadcast K_CODES×8 table,
    per-subspace argmin) and unioning the code table — the stored
    warehouse codes are never touched and nothing retrains. This is the
    production ingest path (FAISS ``add`` after ``train``) and the ANN
    twin of x2_incremental_minhash's "arrivals probe the stored band
    index" posture: at 100 TB the ingest cost is
    O(arrivals × (K_COARSE + 8·K_CODES)) broadcast-join work — scan-
    shaped, corpus-independent, no shuffle of the warehouse.

    Verdict (vs a FROM-SCRATCH index trained on the full corpus with
    identical hyperparameters, judged on the same fixed N_QUERIES batch
    and exact truth):

    - ``n_vectors`` / ``n_arrivals`` — the split is deterministic and
      engine-checked;
    - ``cells_ok`` / ``codes_ok`` — the merged index is complete:
      every non-zero vector has exactly one cell and exactly 8 codes;
    - ``recall_ok`` — merged-index recall@3 ≥ from-scratch recall@3
      − 0.15: appending must not materially degrade the index vs
      retraining (the production question "can I defer retraining?").
      Measured: merged vs scratch = 0.177/0.115 (sf0.001),
      0.125/0.167 (sf0.01), 0.125/0.104 (sf0.1) — the deltas are
      ±1-2 hits of 96, i.i.d.-noise-level either way, which is itself
      the expected answer on unclustered synthetic data; the slack
      absorbs that granularity. The structural point — the merged
      index's training set missed the arrivals entirely and the
      warehouse codes were never recomputed — is what's graded.
    """
    from ..operators.kmeans import (
        kmeans_fit_assign, kmeans_fit_assign_grouped,
    )
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0).select("vec_id", "e"))
    wh = n.filter(F.col("vec_id") % 7 != 0)
    arr = n.filter(F.col("vec_id") % 7 == 0)

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    def subspaces(df, vec="e"):
        return df.select(
            "vec_id",
            F.posexplode(F.array(*[F.slice(vec, 8 * j + 1, 8)
                                   for j in range(8)])).alias("j", "sv"))

    def build_index(train_df, encode_df):
        """Train coarse cells + PQ codebooks on ``train_df``; encode
        ``encode_df`` (cell assignment via broadcast centroids so the
        encode set need not equal the training set). Returns
        (cells, codes, centroids, cb): cells = (vec_id, cell),
        codes = (vec_id, j, code).

        r16 (guide §2.4): ONE TakeOrdered collect of the hash-order
        sample prefix serves BOTH trainers — the coarse sample is its
        first 8·K_COARSE (id, e) rows verbatim, and the grouped
        subspace sample is the driver-side slicing of its first
        8·K_CODES ids (every id carries one subvector per subspace,
        and ``F.slice(e, 8j+1, 8)`` is pure positional slicing, so
        the Python slices are the identical doubles). The r15 form
        collected twice, each a full scan + TakeOrdered over the
        train relation (and the grouped one paid an extra
        distinct + broadcast join)."""
        n_pre = 8 * max(K_COARSE, K_CODES)
        pre = [(r["vec_id"], r["e"]) for r in
               train_df.select("vec_id", "e")
                       .orderBy(F.md5(F.col("vec_id").cast("string")),
                                F.col("vec_id"))
                       .limit(n_pre).collect()]
        cent_log: list = []
        kmeans_fit_assign(train_df, "vec_id", "e",
                          k=K_COARSE, n_iter=3,
                          train_sample=8 * K_COARSE,
                          centroids_log=cent_log,
                          assign=False,
                          sample_rows=pre[:8 * K_COARSE])
        cents = cent_log[0]
        cells = assign_cells(encode_df, cents)
        sub = subspaces(encode_df)
        # assign=False (r15): both trainers' own full assignments were
        # discarded here — the encode set is assigned through
        # assign_cells/encode_pq against the frozen tables instead, so
        # the trainers now stop at the trained centroids/codebooks.
        sub_rows = [(j, i, list(e[8 * j:8 * j + 8]))
                    for i, e in pre[:8 * K_CODES]
                    for j in range(8)]
        _enc, cb = kmeans_fit_assign_grouped(
            subspaces(train_df), "j", "vec_id", "sv",
            k=K_CODES, n_iter=3, train_sample=8 * K_CODES,
            assign=False, sample_rows=sub_rows)
        codes = encode_pq(sub, cb)
        return cells, codes, cents, cb

    def assign_cells(df, cents):
        scored = (df.crossJoin(F.broadcast(cents))
                    .select("vec_id", "cell",
                            l2sq(F.col("e"), F.col("ce")).alias("d2")))
        return (scored.groupBy("vec_id")
                      .agg(F.min(F.struct("d2", "cell")).alias("b"))
                      .select("vec_id", F.col("b.cell").alias("cell")))

    def encode_pq(sub, cb):
        scored = (sub.join(
                      F.broadcast(cb.select(F.col("grp").alias("j"),
                                            F.col("cell").alias("code"),
                                            "ce")), "j")
                     .select("vec_id", "j", "code",
                             l2sq(F.col("sv"), F.col("ce"))
                              .alias("d2")))
        return (scored.groupBy("vec_id", "j")
                      .agg(F.min(F.struct("d2", "code")).alias("b"))
                      .select("vec_id", "j",
                              F.col("b.code").alias("code")))

    # 1. the stored warehouse index: trained AND encoded on wh only
    wh_cells, wh_codes, cents, cb = build_index(wh, wh)
    # 2. ingest: arrivals assigned + encoded against the FROZEN index
    arr_cells = assign_cells(arr, cents)
    arr_codes = encode_pq(subspaces(arr), cb)
    m_cells = wh_cells.unionByName(arr_cells)
    m_codes = wh_codes.unionByName(arr_codes)
    # 3. the from-scratch referee: trained and encoded on everything
    s_cells, s_codes, _sc, s_cb = build_index(n, n)

    q_ids = _hash_sample(n.select("vec_id"), N_QUERIES, _H_QUERY)
    qsub = (subspaces(n.join(F.broadcast(q_ids), "vec_id"))
            .select(F.col("vec_id").alias("query_id"), "j",
                    F.col("sv").alias("qv")))

    def topk(cells, codes, cb_used):
        """x3_ivfpq_learned scoring shape: per-query ADC LUT over the
        index's own codebook, candidates restricted to the query's
        cell, explicit j-order 8-entry sum, top-3 by (d2, vec_id)."""
        qcell = (qsub.select("query_id").distinct()
                     .join(cells.withColumnRenamed("vec_id",
                                                   "query_id"),
                           "query_id"))
        lut = (qsub.join(F.broadcast(qcell), "query_id")
                   .join(F.broadcast(
                       cb_used.select(F.col("grp").alias("j"),
                                      F.col("cell").alias("lcode"),
                                      "ce")), "j")
                   .select("query_id",
                           F.col("cell").alias("lcell"),
                           F.col("j").alias("lj"), "lcode",
                           l2sq(F.col("qv"), F.col("ce")).alias("d2")))
        full = codes.join(cells, "vec_id")
        scored = (full.join(
                      F.broadcast(lut),
                      (F.col("j") == F.col("lj"))
                      & (F.col("code") == F.col("lcode"))
                      & (F.col("cell") == F.col("lcell")))
                      .groupBy("query_id", "vec_id")
                      .agg(F.aggregate(
                          F.transform(
                              F.array_sort(F.collect_list(
                                  F.struct("lj", "d2"))),
                              lambda s: s["d2"]),
                          F.lit(0.0), lambda acc, x: acc + x)
                          .alias("total_d2")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("total_d2").asc(), F.col("vec_id"))
        return (scored.filter(F.col("query_id") != F.col("vec_id"))
                      .withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") <= 3)
                      .select("query_id",
                              F.col("vec_id").alias("neighbor_id"),
                              F.lit(1).alias("hit")))

    approx_m = topk(m_cells, m_codes, cb)
    approx_s = topk(s_cells, s_codes, s_cb)

    q = (v.join(F.broadcast(q_ids), "vec_id")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("e").alias("qe")))
    wt = Window.partitionBy("query_id").orderBy(
        l2sq(F.col("qe"), F.col("e")).asc(), F.col("vec_id"))
    truth = (v.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id")
              .crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("rn", F.row_number().over(wt))
              .filter(F.col("rn") <= 3)
              .select("query_id",
                      F.col("vec_id").alias("neighbor_id")))

    def mean_recall(approx_df):
        j = truth.join(approx_df, ["query_id", "neighbor_id"], "left")
        per_q = (j.groupBy("query_id")
                  .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                        / F.count(F.lit(1))).alias("r")))
        return per_q.agg(F.avg("r").alias("mr"))

    n_total = n.agg(F.count(F.lit(1)).alias("n_vectors"))
    n_arr = arr.agg(F.count(F.lit(1)).alias("n_arrivals"))
    mc = m_cells.agg(F.count(F.lit(1)).alias("n_cells_m"),
                     F.count_distinct("vec_id").alias("n_ids_m"))
    mk = m_codes.agg(F.count(F.lit(1)).alias("n_codes_m"))
    rm = mean_recall(approx_m).withColumnRenamed("mr", "r_merged")
    rs = mean_recall(approx_s).withColumnRenamed("mr", "r_scratch")
    return (n_total.crossJoin(n_arr).crossJoin(mc).crossJoin(mk)
            .crossJoin(rm).crossJoin(rs)
            .select(
                "n_vectors", "n_arrivals",
                ((F.col("n_cells_m") == F.col("n_vectors"))
                 & (F.col("n_ids_m") == F.col("n_vectors")))
                 .alias("cells_ok"),
                (F.col("n_codes_m") == F.col("n_vectors") * 8)
                 .alias("codes_ok"),
                (F.col("r_merged") >= F.col("r_scratch") - 0.15)
                 .alias("recall_ok")))


# ---------------------------------------------------------------------------
# OP-X4 — BM25 lexical retrieval (the classic IR scorer the TF-IDF
# query stops short of: length-normalized, saturating term frequency)
# ---------------------------------------------------------------------------

@register(
    "x4_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    corpus AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
               / COUNT(DISTINCT doc_id) AS avgdl
      FROM tok
    ),
    dfv AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    terms AS (
      SELECT token, df FROM dfv
      WHERE token NOT IN ('the', 'a', 'of', 'and', 'to', 'in')
      ORDER BY df DESC, token LIMIT 3
    ),
    tf AS (
      SELECT t.doc_id, t.token, COUNT(*) AS tf, MAX(terms.df) AS df
      FROM tok t JOIN terms USING (token)
      GROUP BY t.doc_id, t.token
    ),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * 2.2
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
      FROM tf JOIN dl USING (doc_id), corpus
    ),
    agg AS (
      SELECT doc_id,
             COUNT(*) AS n_terms_matched,
             CAST(ROUND(CAST(list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(s ORDER BY token)),
               (a, b) -> a + b) AS DECIMAL(38,10)), 6) AS DOUBLE)
               AS bm25
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms_matched, bm25 FROM agg
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def x4_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — BM25 top-10 retrieval over the document corpus:
    Okapi BM25 (k1 = 1.2, b = 0.75) for a 3-term query, the query
    terms themselves derived in-plan (highest-df non-stopword tokens,
    (df DESC, token) tiebreak) so the whole thing is deterministic and
    oracle-replayable with zero literals baked in.

    Engine parity: every count (tf, df, N, doc length) is integer;
    ``avgdl`` is an explicit exact-integer-sum ÷ count (never an
    incremental AVG, whose accumulation order can differ); the one
    libm call (``ln``) may differ by 1 ulp between JVM and C — so the
    per-document score sums its ≤3 term contributions in EXPLICIT
    token order (sorted fold, the ADC-LUT trick) and goes through the
    class-B DECIMAL route before the ORDER BY, which ranks on the
    ROUNDED value + doc_id — both engines sort identical keys.
    |score| ≲ 60 ≪ 9e5, inside the class-B domain.

    Scale shape: the 3-row term table broadcasts; tf is one (doc,
    term)-keyed hash agg over the term-filtered token stream (the
    filter is a broadcast semi-join at the scan); doc lengths reuse
    the token pass; corpus stats are a 1-row broadcast; final top-10
    is a TakeOrderedAndProject. No all-pairs, no per-doc Python."""
    stop = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(tokens_col("text")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = (tok.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        (F.count(F.lit(1)).cast("double")
         / F.count_distinct("doc_id")).alias("avgdl")))
    # note: SUM(dl) over docs == COUNT(*) over tokens — integer-exact
    dfv = (tok.distinct()
              .groupBy("token").agg(F.count(F.lit(1)).alias("df")))
    terms = (dfv.filter(~F.col("token").isin(*stop))
                .orderBy(F.col("df").desc(), "token").limit(3))
    tf = (tok.join(F.broadcast(terms), "token")
             .groupBy("doc_id", "token")
             .agg(F.count(F.lit(1)).alias("tf"),
                  F.max("df").alias("df")))
    scored = (tf.join(dl, "doc_id").crossJoin(F.broadcast(corpus))
                .select(
                    "doc_id", "token",
                    (F.log((F.col("n_docs") - F.col("df") + 0.5)
                           / (F.col("df") + 0.5) + 1)
                     * F.col("tf") * 2.2
                     / (F.col("tf")
                        + 1.2 * (1 - 0.75
                                 + 0.75 * F.col("dl")
                                 / F.col("avgdl")))).alias("s")))
    agg = (scored.groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                      F.round(
                          F.aggregate(
                              F.transform(
                                  F.array_sort(F.collect_list(
                                      F.struct("token", "s"))),
                                  lambda r: r["s"]),
                              F.lit(0.0), lambda a, b: a + b)
                          .cast("decimal(38,10)"), 6)
                       .cast("double").alias("bm25")))
    return (agg.orderBy(F.col("bm25").desc(), "doc_id").limit(10)
               .select("doc_id", "n_terms_matched", "bm25"))


# ---------------------------------------------------------------------------
# OP-X3 — binary (sign) embedding sketch + Hamming top-k: the third
# standard quantization tier (float → int8 → 1-bit), integer-exact
# ---------------------------------------------------------------------------

@register(
    "x3_hamming_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    packed AS (
      SELECT vec_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(e[1:32],
                 x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a * 2 + b) AS hi,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(e[33:64],
                 x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a * 2 + b) AS lo
      FROM v
    ),
    q AS (
      SELECT vec_id AS query_id, hi AS qhi, lo AS qlo FROM packed
      WHERE vec_id IN (
        SELECT vec_id FROM v
        {_sql_hash_sample(_H_QUERY, N_QUERIES)}
      )
    ),
    scored AS (
      SELECT q.query_id, p.vec_id AS neighbor_id,
             bit_count(xor(q.qhi, p.hi))
               + bit_count(xor(q.qlo, p.lo)) AS hamming
      FROM q JOIN packed p ON p.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, hamming FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY hamming, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def x3_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — 1-bit (sign) embedding sketch with Hamming-distance
    top-3: the third quantization tier after int8 (x3_int8_topk) and
    PQ (x3_ivfpq_*) — 64 dims compress to 8 BYTES and distance
    becomes two XOR+popcount instructions, the cheapest candidate
    generator in the standard retrieve-then-rerank cascade (binary
    prefilter → int8/PQ rescore → float rerank).

    Integer-exact end to end — sign bits, packed words, XOR popcounts
    and the (hamming, neighbor_id) ranking are all integers, so the
    oracle comparison needs NO rounding kernel anywhere (unique in the
    x3 family). Bits pack into TWO 32-bit words, not one 64-bit word:
    a 64-bit left-fold would overflow the sign bit, which Java wraps
    and DuckDB REJECTS — 2×32 keeps every intermediate < 2^32 in both
    engines.

    Scale shape: packing is a scan-side projection (the 512-bit float
    vector never leaves its partition after this); the fixed
    N_QUERIES hash-rank query batch broadcasts (the family
    convention), so scoring is a linear broadcast-join pass with two
    codegen'd popcounts per candidate — the brute-force tier is the
    RERANK observability baseline here exactly as
    x3_cosine_topk_bruteforce is for floats; the bucketed scale path
    — multi-index hashing over the 32-bit words — is now IMPLEMENTED
    as x3_hamming_banded / x3_hamming_multiprobe (r7), which carry
    the headline slot; this brute scan is demoted to their in-query
    recall referee (the r4 int8 demotion replayed)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))

    def pack(lo_idx: int) -> F.Column:
        bits = F.transform(
            F.slice("e", lo_idx, 32),
            lambda x: F.when(x >= 0, F.lit(1).cast("long"))
                       .otherwise(F.lit(0).cast("long")))
        return F.aggregate(bits, F.lit(0).cast("long"),
                           lambda a, b: a * 2 + b)

    packed = v.select("vec_id", pack(1).alias("hi"),
                      pack(33).alias("lo"))
    q_ids = _hash_sample(v.select("vec_id"), N_QUERIES, _H_QUERY)
    q = (packed.join(F.broadcast(q_ids), "vec_id")
               .select(F.col("vec_id").alias("query_id"),
                       F.col("hi").alias("qhi"),
                       F.col("lo").alias("qlo")))
    scored = (packed.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id",
                      F.col("vec_id").alias("neighbor_id"),
                      (F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
                       + F.bit_count(F.col("qlo")
                                     .bitwiseXOR(F.col("lo"))))
                      .alias("hamming")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3)
                  .select("query_id", "neighbor_id", "hamming"))


# ---------------------------------------------------------------------------
# OP-X3 — banded Hamming search (multi-index hashing): the scale form
# of the 1-bit tier, promoted to the headline per the r4 int8 precedent
# (VERDICT r6 next-round #2); x3_hamming_topk stays as the referee
# ---------------------------------------------------------------------------

#: SQL band extraction shared by corpus and query sides: band j of the
#: packed (hi, lo) words — j < 4 slices hi, else lo; divisor walks the
#: 8-bit band positions from the top.
_SQL_BAND = """((CASE WHEN j < 4 THEN hi ELSE lo END)
          // (CASE j % 4 WHEN 0 THEN 16777216 WHEN 1 THEN 65536
              WHEN 2 THEN 256 ELSE 1 END)) % 256"""

_SQL_PACKED = """
      SELECT vec_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(e[1:32],
                 x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a * 2 + b) AS hi,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(e[33:64],
                 x -> CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a * 2 + b) AS lo
      FROM v
"""


@register(
    "x3_hamming_banded",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    packed AS ({_SQL_PACKED}),
    jd AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]::BIGINT[]) AS j),
    bl AS (
      SELECT vec_id, j, {_SQL_BAND} AS bv
      FROM packed, jd
    ),
    qids AS (
      SELECT vec_id FROM v {_sql_hash_sample(_H_QUERY, N_QUERIES)}
    ),
    qb AS (
      SELECT bl.vec_id AS query_id, j, bv
      FROM bl JOIN qids USING (vec_id)
    ),
    cand AS (
      SELECT DISTINCT qb.query_id, bl.vec_id AS neighbor_id
      FROM qb JOIN bl
        ON bl.j = qb.j AND bl.bv = qb.bv
       AND bl.vec_id <> qb.query_id
    ),
    nc AS (
      SELECT query_id, COUNT(*) AS n_candidates
      FROM cand GROUP BY query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             bit_count(xor(pq.hi, pn.hi))
               + bit_count(xor(pq.lo, pn.lo)) AS hamming
      FROM cand c
      JOIN packed pq ON pq.vec_id = c.query_id
      JOIN packed pn ON pn.vec_id = c.neighbor_id
    ),
    top3 AS (
      SELECT query_id, neighbor_id, hamming FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id
          ORDER BY hamming, neighbor_id) AS rn
        FROM scored) WHERE rn <= 3
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(q.hi, p.hi))
                          + bit_count(xor(q.lo, p.lo)),
                          p.vec_id) AS rn
        FROM (SELECT packed.* FROM packed JOIN qids USING (vec_id)) q
        JOIN packed p ON p.vec_id <> q.vec_id) WHERE rn <= 3
    ),
    hits AS (
      SELECT COUNT(*) AS n FROM top3 t
      JOIN brute b ON b.query_id = t.query_id
                  AND b.neighbor_id = t.neighbor_id
    )
    SELECT t.query_id, t.neighbor_id, t.hamming, nc.n_candidates,
           (SELECT n FROM hits) AS n_truth_hits
    FROM top3 t JOIN nc USING (query_id)
    """,
)
def x3_hamming_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — multi-index hashing over the packed sign words: the
    SCALE form of the 1-bit Hamming tier (x3_hamming_topk is now the
    brute referee, the r4 int8 demotion replayed). The two 32-bit
    words split into 8 bands of 8 bits; by pigeonhole, any neighbor
    within Hamming radius 7 agrees EXACTLY on at least one band — the
    x2 MinHash banding argument on Hamming space — so candidates come
    from band-equality joins and only candidates pay the popcount
    rerank.

    Everything is integer arithmetic (sign bits, band slices, XOR
    popcounts, candidate counts), so the CANDIDATE SET ITSELF is
    replayable — the oracle rebuilds the same bands and the same
    distinct (query, neighbor) collisions, and the per-query
    ``n_candidates`` column pins the work reduction (≈ N·(1−(1−2⁻⁸)⁸)
    ≈ N/32 candidates per query vs N for brute). ``n_truth_hits``
    is the recall verdict: how many of the referee's 32×3 true
    Hamming top-3 pairs the banded path recovers — the referee scan
    lives inside the query as verdict infrastructure (a16/a17 note);
    the 100 TB deployment ships the banded path alone.

    Scale shape: corpus bands are a scan-side projection (8 small
    integers per vector); the query bands broadcast (8·N_QUERIES
    rows), so candidate generation is a broadcast equality join with
    NO corpus shuffle; the rerank window partitions on query_id over
    candidate-sized input only. Band width is the tuning knob: 8 bits
    at test N, growing with log N (the multi-index-hashing
    parameterization) so candidates-per-query stay a constant fraction
    at any corpus size. Cites the reference's single-table scan model
    (fetch_data.py:20-323) only as provenance; the operator itself is
    the LLM-pipeline north star surface."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))

    def pack(lo_idx: int) -> F.Column:
        bits = F.transform(
            F.slice("e", lo_idx, 32),
            lambda x: F.when(x >= 0, F.lit(1).cast("long"))
                       .otherwise(F.lit(0).cast("long")))
        return F.aggregate(bits, F.lit(0).cast("long"),
                           lambda a, b: a * 2 + b)

    packed = v.select("vec_id", pack(1).alias("hi"),
                      pack(33).alias("lo"))
    band_exprs = [F.expr(f"({w} div {d}) % 256")
                  for w in ("hi", "lo")
                  for d in (16777216, 65536, 256, 1)]
    bl = packed.select(
        "vec_id", F.posexplode(F.array(*band_exprs)).alias("j", "bv"))
    qids = _hash_sample(v.select("vec_id"), N_QUERIES, _H_QUERY)
    qb = (bl.join(F.broadcast(qids), "vec_id")
            .select(F.col("vec_id").alias("query_id"), "j", "bv"))
    cand = (bl.join(F.broadcast(qb),
                    (bl["j"] == qb["j"]) & (bl["bv"] == qb["bv"])
                    & (bl["vec_id"] != qb["query_id"]))
              .select("query_id", bl["vec_id"].alias("neighbor_id"))
              .distinct())
    nc = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates"))
    pq = packed.select(F.col("vec_id").alias("query_id"),
                       F.col("hi").alias("qhi"),
                       F.col("lo").alias("qlo"))
    scored = (cand.join(F.broadcast(pq), "query_id")
                  .join(packed,
                        packed["vec_id"] == F.col("neighbor_id"))
                  .select("query_id", "neighbor_id",
                          (F.bit_count(F.col("qhi")
                                       .bitwiseXOR(F.col("hi")))
                           + F.bit_count(F.col("qlo")
                                         .bitwiseXOR(F.col("lo"))))
                          .alias("hamming")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id"))
    top3 = (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3)
                  .select("query_id", "neighbor_id", "hamming"))
    # brute referee (verdict infrastructure): the engine's own truth
    qp = packed.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("hi").alias("qhi"), F.col("lo").alias("qlo"))
    brute_scored = (packed.crossJoin(F.broadcast(qp))
                    .filter(F.col("vec_id") != F.col("query_id"))
                    .select("query_id",
                            F.col("vec_id").alias("neighbor_id"),
                            (F.bit_count(F.col("qhi")
                                         .bitwiseXOR(F.col("hi")))
                             + F.bit_count(F.col("qlo")
                                           .bitwiseXOR(F.col("lo"))))
                            .alias("bham")))
    bw = Window.partitionBy("query_id").orderBy(
        F.col("bham").asc(), F.col("neighbor_id"))
    brute = (brute_scored.withColumn("rn", F.row_number().over(bw))
                         .filter(F.col("rn") <= 3)
                         .select("query_id", "neighbor_id"))
    hits = (top3.join(brute, ["query_id", "neighbor_id"])
                .agg(F.count(F.lit(1)).alias("n_truth_hits")))
    return (top3.join(nc, "query_id")
                .crossJoin(F.broadcast(hits))
                .select("query_id", "neighbor_id", "hamming",
                        "n_candidates", "n_truth_hits"))


# ---------------------------------------------------------------------------
# OP-X3 — the composed retrieve-then-rerank cascade (VERDICT r6
# next-round #4): banded-Hamming candidates → int8 rescore → exact
# float rerank, one plan, recall-verdict vs float brute truth
# ---------------------------------------------------------------------------

@register(
    "x3_cascade_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    packed AS ({_SQL_PACKED}),
    jd AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]::BIGINT[]) AS j),
    bl AS (
      SELECT vec_id, j, {_SQL_BAND} AS bv
      FROM packed, jd
    ),
    qids AS (
      SELECT vec_id FROM v {_sql_hash_sample(_H_QUERY, N_QUERIES)}
    ),
    qb AS (
      SELECT bl.vec_id AS query_id, j, bv
      FROM bl JOIN qids USING (vec_id)
    ),
    cand AS (
      SELECT DISTINCT qb.query_id, bl.vec_id AS neighbor_id
      FROM qb JOIN bl
        ON bl.j = qb.j AND bl.bv = qb.bv
       AND bl.vec_id <> qb.query_id
    ),
    nc AS (
      SELECT query_id, COUNT(*) AS n_candidates
      FROM cand GROUP BY query_id
    ),
    nf AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm,
             list_max(list_transform(e, x -> abs(x))) AS mx
      FROM v
    ),
    n8 AS (
      SELECT vec_id, nrm, mx,
             list_transform(e, x ->
               CAST(floor(x * 127.0 / mx + 0.5) AS INT)) AS qv
      FROM nf WHERE mx > 0 AND nrm > 0
    ),
    t1 AS (
      SELECT query_id, neighbor_id, hamming, rn1 FROM (
        SELECT c.query_id, c.neighbor_id,
               bit_count(xor(pq.hi, pn.hi))
                 + bit_count(xor(pq.lo, pn.lo)) AS hamming,
               ROW_NUMBER() OVER (
                 PARTITION BY c.query_id
                 ORDER BY bit_count(xor(pq.hi, pn.hi))
                          + bit_count(xor(pq.lo, pn.lo)),
                          c.neighbor_id) AS rn1
        FROM cand c
        JOIN packed pq ON pq.vec_id = c.query_id
        JOIN packed pn ON pn.vec_id = c.neighbor_id
      ) WHERE rn1 <= 50
    ),
    t2 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY acos DESC, neighbor_id) AS rn2
        FROM (
          SELECT t1.query_id, t1.neighbor_id,
                 {_sql_dot('a.qv', 'b.qv')} * a.mx * b.mx
                   / (16129.0 * (a.nrm * b.nrm)) AS acos
          FROM t1
          JOIN n8 a ON a.vec_id = t1.query_id
          JOIN n8 b ON b.vec_id = t1.neighbor_id)
      ) WHERE rn2 <= 10
    ),
    t3 AS (
      SELECT query_id, neighbor_id, cos FROM (
        SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS rn3
        FROM (
          SELECT t2.query_id, t2.neighbor_id,
                 {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cos
          FROM t2
          JOIN nf a ON a.vec_id = t2.query_id
          JOIN nf b ON b.vec_id = t2.neighbor_id)
      ) WHERE rn3 <= 3
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_dot('q.e', 'b.e')} / (q.nrm * b.nrm)
                          DESC, b.vec_id) AS rn
        FROM (SELECT nf.* FROM nf JOIN qids USING (vec_id)) q
        JOIN nf b ON b.vec_id <> q.vec_id
      ) WHERE rn <= 3
    ),
    ham3 AS (
      SELECT query_id, neighbor_id FROM t1 WHERE rn1 <= 3
    ),
    hits_c AS (
      SELECT COUNT(*) AS n FROM t3
      JOIN truth USING (query_id, neighbor_id)
    ),
    hits_h AS (
      SELECT COUNT(*) AS n FROM ham3
      JOIN truth USING (query_id, neighbor_id)
    )
    SELECT t3.query_id, t3.neighbor_id,
           (CASE WHEN cos < 0 THEN -FLOOR(ABS(cos) * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS(cos) * 1000000.0 + 0.5) END
            / 1000000.0 + 0.0) AS cos_sim,
           nc.n_candidates,
           (SELECT n FROM hits_c) AS n_hits_cascade,
           (SELECT n FROM hits_h) AS n_hits_hamming,
           (SELECT n FROM hits_c) >= (SELECT n FROM hits_h)
             AS cascade_ge_hamming
    FROM t3 JOIN nc USING (query_id)
    """,
)
def x3_cascade_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — the production SERVING shape, end to end in one plan:
    every tier existed separately (1-bit Hamming, int8, exact float)
    but real retrieval composes them — cheap filter, mid rescore,
    expensive rerank (VERDICT r6 "the retrieval tiers are never
    composed"):

    - **tier 1** — banded-Hamming candidate generation (the
      x3_hamming_banded machinery: broadcast band-equality join, no
      corpus shuffle), popcount top-50 per query;
    - **tier 2** — int8 rescore of those ≤50 rows (x3_int8_topk's
      integer dot + two-scale rescale), keep top-10;
    - **tier 3** — exact float cosine on the surviving ≤10, emit
      top-3 with the class-A rounded score.

    Verdict columns, all integer-exact: per-query ``n_candidates``
    (tier-1 work bound); ``n_hits_cascade`` — cascade recall@3
    against the FLOAT brute-force truth over the 32-query batch (the
    truth scan is 32×N verdict infrastructure, not all-pairs);
    ``n_hits_hamming`` — the best single cheap tier's recall
    (hamming-only top-3 from the same candidates); and
    ``cascade_ge_hamming`` — the claim the cascade exists to make:
    spending exact-distance compute on a shortlist recovers at least
    what the cheap tier alone recovers. The comparison is falsifiable
    (the int8 top-10 could in principle drop a true hit the hamming
    top-3 kept); the i.i.d.-synthetic caveat on absolute recall
    applies as in x3_ivfpq_residual — the MACHINERY and the
    tier-composition bookkeeping are what the oracle pins.

    Scale: the corpus is touched exactly twice — the band projection
    and the (broadcast) truth/rerank gather joins; every ranking
    window runs over candidate-sized input partitioned on query_id;
    per-query cost is candidates·(popcount) + 50·(int8 dot) +
    10·(float dot), corpus-independent after tier 1."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))

    def pack(lo_idx: int) -> F.Column:
        bits = F.transform(
            F.slice("e", lo_idx, 32),
            lambda x: F.when(x >= 0, F.lit(1).cast("long"))
                       .otherwise(F.lit(0).cast("long")))
        return F.aggregate(bits, F.lit(0).cast("long"),
                           lambda a, b: a * 2 + b)

    packed = v.select("vec_id", pack(1).alias("hi"),
                      pack(33).alias("lo"))
    band_exprs = [F.expr(f"({w} div {d}) % 256")
                  for w in ("hi", "lo")
                  for d in (16777216, 65536, 256, 1)]
    bl = packed.select(
        "vec_id", F.posexplode(F.array(*band_exprs)).alias("j", "bv"))
    qids = _hash_sample(v.select("vec_id"), N_QUERIES, _H_QUERY)
    qb = (bl.join(F.broadcast(qids), "vec_id")
            .select(F.col("vec_id").alias("query_id"), "j", "bv"))
    cand = (bl.join(F.broadcast(qb),
                    (bl["j"] == qb["j"]) & (bl["bv"] == qb["bv"])
                    & (bl["vec_id"] != qb["query_id"]))
              .select("query_id", bl["vec_id"].alias("neighbor_id"))
              .distinct())
    nc = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates"))

    nf = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
           .withColumn("mx", F.array_max(
               F.transform("e", lambda x: F.abs(x)))))
    n8 = (nf.filter((F.col("mx") > 0) & (F.col("nrm") > 0))
            .select("vec_id", "nrm", "mx",
                    F.transform("e", lambda x:
                                F.floor(x * 127.0 / F.col("mx")
                                        + 0.5).cast("int"))
                     .alias("qv")))

    pq = packed.select(F.col("vec_id").alias("query_id"),
                       F.col("hi").alias("qhi"),
                       F.col("lo").alias("qlo"))
    ham = (cand.join(F.broadcast(pq), "query_id")
               .join(packed, packed["vec_id"] == F.col("neighbor_id"))
               .select("query_id", "neighbor_id",
                       (F.bit_count(F.col("qhi")
                                    .bitwiseXOR(F.col("hi")))
                        + F.bit_count(F.col("qlo")
                                      .bitwiseXOR(F.col("lo"))))
                       .alias("hamming")))
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id"))
    t1 = ham.withColumn("rn1", F.row_number().over(w1)) \
            .filter(F.col("rn1") <= 50)

    a8 = n8.select(F.col("vec_id").alias("query_id"),
                   F.col("qv").alias("aqv"),
                   F.col("mx").alias("amx"),
                   F.col("nrm").alias("anrm"))
    b8 = n8.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("qv").alias("bqv"),
                   F.col("mx").alias("bmx"),
                   F.col("nrm").alias("bnrm"))
    acos = (_dot(F.col("aqv"), F.col("bqv"))
            * F.col("amx") * F.col("bmx")
            / (F.lit(16129.0) * (F.col("anrm") * F.col("bnrm"))))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("neighbor_id"))
    t2 = (t1.join(F.broadcast(a8), "query_id")
            .join(F.broadcast(b8), "neighbor_id")
            .select("query_id", "neighbor_id", acos.alias("acos"))
            .withColumn("rn2", F.row_number().over(w2))
            .filter(F.col("rn2") <= 10)
            .select("query_id", "neighbor_id"))

    af = nf.select(F.col("vec_id").alias("query_id"),
                   F.col("e").alias("ae"), F.col("nrm").alias("anrm"))
    bf = nf.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("e").alias("be"), F.col("nrm").alias("bnrm"))
    cos = _dot(F.col("ae"), F.col("be")) / (F.col("anrm") * F.col("bnrm"))
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    t3 = (t2.join(F.broadcast(af), "query_id")
            .join(F.broadcast(bf), "neighbor_id")
            .select("query_id", "neighbor_id", cos.alias("cos"))
            .withColumn("rn3", F.row_number().over(w3))
            .filter(F.col("rn3") <= 3)
            .select("query_id", "neighbor_id", "cos"))

    qf = nf.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"), F.col("nrm").alias("qnrm"))
    tcos = (_dot(F.col("qe"), F.col("e"))
            / (F.col("qnrm") * F.col("nrm")))
    wt = Window.partitionBy("query_id").orderBy(
        F.col("tcos").desc(), F.col("neighbor_id"))
    truth = (nf.crossJoin(F.broadcast(qf))
               .filter(F.col("vec_id") != F.col("query_id"))
               .select("query_id",
                       F.col("vec_id").alias("neighbor_id"),
                       tcos.alias("tcos"))
               .withColumn("rn", F.row_number().over(wt))
               .filter(F.col("rn") <= 3)
               .select("query_id", "neighbor_id"))
    ham3 = t1.filter(F.col("rn1") <= 3) \
             .select("query_id", "neighbor_id")
    hits_c = (t3.join(truth, ["query_id", "neighbor_id"])
                .agg(F.count(F.lit(1)).alias("n_hits_cascade")))
    hits_h = (ham3.join(truth, ["query_id", "neighbor_id"])
                  .agg(F.count(F.lit(1)).alias("n_hits_hamming")))
    return (t3.join(nc, "query_id")
              .crossJoin(F.broadcast(hits_c))
              .crossJoin(F.broadcast(hits_h))
              .select("query_id", "neighbor_id",
                      round_half_up(F.col("cos"), 6).alias("cos_sim"),
                      "n_candidates", "n_hits_cascade",
                      "n_hits_hamming",
                      (F.col("n_hits_cascade")
                       >= F.col("n_hits_hamming"))
                      .alias("cascade_ge_hamming")))


# ---------------------------------------------------------------------------
# OP-X3 — multiprobe banded Hamming: probe each band's 1-bit flips,
# extending the pigeonhole guarantee from radius 7 to radius 15
# ---------------------------------------------------------------------------

@register(
    "x3_hamming_multiprobe",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    packed AS ({_SQL_PACKED}),
    jd AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]::BIGINT[]) AS j),
    bl AS (
      SELECT vec_id, j, {_SQL_BAND} AS bv
      FROM packed, jd
    ),
    qids AS (
      SELECT vec_id FROM v {_sql_hash_sample(_H_QUERY, N_QUERIES)}
    ),
    fd AS (SELECT unnest([-1, 0, 1, 2, 3, 4, 5, 6, 7]::BIGINT[]) AS f),
    qp AS (
      -- probe set: each query band value plus its 8 single-bit flips
      SELECT bl.vec_id AS query_id, j,
             CASE WHEN f = -1 THEN bv
                  ELSE xor(bv, 1 << f) END AS bv
      FROM bl JOIN qids USING (vec_id), fd
    ),
    cand AS (
      SELECT DISTINCT qp.query_id, bl.vec_id AS neighbor_id
      FROM qp JOIN bl
        ON bl.j = qp.j AND bl.bv = qp.bv
       AND bl.vec_id <> qp.query_id
    ),
    nc AS (
      SELECT query_id, COUNT(*) AS n_candidates
      FROM cand GROUP BY query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             bit_count(xor(pq.hi, pn.hi))
               + bit_count(xor(pq.lo, pn.lo)) AS hamming
      FROM cand c
      JOIN packed pq ON pq.vec_id = c.query_id
      JOIN packed pn ON pn.vec_id = c.neighbor_id
    ),
    top3 AS (
      SELECT query_id, neighbor_id, hamming FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id
          ORDER BY hamming, neighbor_id) AS rn
        FROM scored) WHERE rn <= 3
    ),
    scand AS (
      SELECT DISTINCT qb.query_id, bl.vec_id AS neighbor_id
      FROM (SELECT bl.vec_id AS query_id, j, bv
            FROM bl JOIN qids USING (vec_id)) qb
      JOIN bl ON bl.j = qb.j AND bl.bv = qb.bv
             AND bl.vec_id <> qb.query_id
    ),
    stop3 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT c.query_id, c.neighbor_id, ROW_NUMBER() OVER (
                 PARTITION BY c.query_id
                 ORDER BY bit_count(xor(pq.hi, pn.hi))
                          + bit_count(xor(pq.lo, pn.lo)),
                          c.neighbor_id) AS rn
        FROM scand c
        JOIN packed pq ON pq.vec_id = c.query_id
        JOIN packed pn ON pn.vec_id = c.neighbor_id)
      WHERE rn <= 3
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(q.hi, p.hi))
                          + bit_count(xor(q.lo, p.lo)),
                          p.vec_id) AS rn
        FROM (SELECT packed.* FROM packed JOIN qids USING (vec_id)) q
        JOIN packed p ON p.vec_id <> q.vec_id) WHERE rn <= 3
    ),
    hits_m AS (
      SELECT COUNT(*) AS n FROM top3 t
      JOIN brute b ON b.query_id = t.query_id
                  AND b.neighbor_id = t.neighbor_id
    ),
    hits_s AS (
      SELECT COUNT(*) AS n FROM stop3 t
      JOIN brute b ON b.query_id = t.query_id
                  AND b.neighbor_id = t.neighbor_id
    )
    SELECT t.query_id, t.neighbor_id, t.hamming, nc.n_candidates,
           (SELECT n FROM hits_m) AS n_hits_multi,
           (SELECT n FROM hits_s) AS n_hits_single,
           (SELECT n FROM hits_m) >= (SELECT n FROM hits_s)
             AS multi_ge_single
    FROM top3 t JOIN nc USING (query_id)
    """,
)
def x3_hamming_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — multiprobe banded Hamming: per (query, band), probe the
    band value AND its 8 single-bit flips (9 probes/band). By
    pigeonhole, a neighbor within Hamming radius 15 now has some band
    differing in ≤ 1 bit, hence colliding with a probe — doubling the
    banded tier's guarantee radius (7 → 15) for a 9× probe-side (not
    corpus-side) cost: the corpus is still banded ONCE; only the
    broadcast probe relation grows (8·9·N_QUERIES rows). This is the
    standard recall/cost dial of multi-index hashing — probe more
    band variants when recall matters, never touch the stored index.

    Verdict columns: per-query ``n_candidates`` (the honest cost of
    the wider net), ``n_hits_multi`` vs ``n_hits_single`` — recall@3
    against the brute referee for the multiprobe and the exact-probe
    tier over the SAME bands — and ``multi_ge_single``, which is a
    small THEOREM, not an observation: single-probe candidates are a
    subset of multiprobe candidates, and a true top-3 hit displaced
    from a superset's top-3 would need 3 strictly-better candidates,
    all themselves members of the 3-element truth set — impossible.
    The oracle replays every candidate set band-for-band (all integer
    arithmetic), so a single wrong collision anywhere flips the hash.

    Scale: identical plan shape to x3_hamming_banded — corpus bands
    are a scan projection, probes broadcast, rerank windows run over
    candidate-sized input; the probe multiplier trades broadcast size
    for recall with zero additional corpus passes."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))

    def pack(lo_idx: int) -> F.Column:
        bits = F.transform(
            F.slice("e", lo_idx, 32),
            lambda x: F.when(x >= 0, F.lit(1).cast("long"))
                       .otherwise(F.lit(0).cast("long")))
        return F.aggregate(bits, F.lit(0).cast("long"),
                           lambda a, b: a * 2 + b)

    packed = v.select("vec_id", pack(1).alias("hi"),
                      pack(33).alias("lo"))
    band_exprs = [F.expr(f"({w} div {d}) % 256")
                  for w in ("hi", "lo")
                  for d in (16777216, 65536, 256, 1)]
    bl = packed.select(
        "vec_id", F.posexplode(F.array(*band_exprs)).alias("j", "bv"))
    qids = _hash_sample(v.select("vec_id"), N_QUERIES, _H_QUERY)
    qb = (bl.join(F.broadcast(qids), "vec_id")
            .select(F.col("vec_id").alias("query_id"), "j", "bv"))
    from ..sources.tables import values_df
    fd = values_df(spark, [(f,) for f in range(-1, 8)], "f long")
    qp = (qb.crossJoin(F.broadcast(fd))
            .select("query_id", "j",
                    F.when(F.col("f") == -1, F.col("bv"))
                     .otherwise(F.expr("bv ^ shiftleft(1, f)"))
                     .alias("bv"))
            .distinct())

    def candidates(probe_df: DataFrame) -> DataFrame:
        return (bl.join(F.broadcast(probe_df),
                        (bl["j"] == probe_df["j"])
                        & (bl["bv"] == probe_df["bv"])
                        & (bl["vec_id"] != probe_df["query_id"]))
                  .select("query_id", bl["vec_id"].alias("neighbor_id"))
                  .distinct())

    def rerank(cand: DataFrame) -> DataFrame:
        pq = packed.select(F.col("vec_id").alias("query_id"),
                           F.col("hi").alias("qhi"),
                           F.col("lo").alias("qlo"))
        scored = (cand.join(F.broadcast(pq), "query_id")
                  .join(packed,
                        packed["vec_id"] == F.col("neighbor_id"))
                  .select("query_id", "neighbor_id",
                          (F.bit_count(F.col("qhi")
                                       .bitwiseXOR(F.col("hi")))
                           + F.bit_count(F.col("qlo")
                                         .bitwiseXOR(F.col("lo"))))
                          .alias("hamming")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("hamming").asc(), F.col("neighbor_id"))
        return (scored.withColumn("rn", F.row_number().over(w))
                      .filter(F.col("rn") <= 3)
                      .select("query_id", "neighbor_id", "hamming"))

    mcand = candidates(qp)
    nc = mcand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates"))
    top3 = rerank(mcand)
    stop3 = rerank(candidates(qb)).select("query_id", "neighbor_id")

    qpk = packed.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("hi").alias("qhi"), F.col("lo").alias("qlo"))
    bw = Window.partitionBy("query_id").orderBy(
        F.col("bham").asc(), F.col("neighbor_id"))
    brute = (packed.crossJoin(F.broadcast(qpk))
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id",
                     F.col("vec_id").alias("neighbor_id"),
                     (F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
                      + F.bit_count(F.col("qlo")
                                    .bitwiseXOR(F.col("lo"))))
                     .alias("bham"))
             .withColumn("rn", F.row_number().over(bw))
             .filter(F.col("rn") <= 3)
             .select("query_id", "neighbor_id"))
    hits_m = (top3.join(brute, ["query_id", "neighbor_id"])
              .agg(F.count(F.lit(1)).alias("n_hits_multi")))
    hits_s = (stop3.join(brute, ["query_id", "neighbor_id"])
              .agg(F.count(F.lit(1)).alias("n_hits_single")))
    return (top3.join(nc, "query_id")
                .crossJoin(F.broadcast(hits_m))
                .crossJoin(F.broadcast(hits_s))
                .select("query_id", "neighbor_id", "hamming",
                        "n_candidates", "n_hits_multi",
                        "n_hits_single",
                        (F.col("n_hits_multi")
                         >= F.col("n_hits_single"))
                        .alias("multi_ge_single")))


# ---------------------------------------------------------------------------
# OP-X4 + OP-X3 composed — hybrid retrieval: BM25 lexical ranking and
# vector cosine ranking fused by reciprocal-rank fusion (the RAG shape)
# ---------------------------------------------------------------------------

@register(
    "x4_hybrid_rrf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    corpus AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs,
             CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
               / COUNT(DISTINCT doc_id) AS avgdl
      FROM tok
    ),
    dfv AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    terms AS (
      SELECT token, df FROM dfv
      WHERE token NOT IN ('the', 'a', 'of', 'and', 'to', 'in')
      ORDER BY df DESC, token LIMIT 3
    ),
    tf AS (
      SELECT t.doc_id, t.token, COUNT(*) AS tf, MAX(terms.df) AS df
      FROM tok t JOIN terms USING (token)
      GROUP BY t.doc_id, t.token
    ),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * 2.2
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) AS s
      FROM tf JOIN dl USING (doc_id), corpus
    ),
    agg AS (
      SELECT doc_id,
             CAST(ROUND(CAST(list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(s ORDER BY token)),
               (a, b) -> a + b) AS DECIMAL(38,10)), 6) AS DOUBLE)
               AS bm25
      FROM scored GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
               AS lex_rank
      FROM (SELECT * FROM agg ORDER BY bm25 DESC, doc_id LIMIT 50)
    ),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    q AS (SELECT * FROM n {_sql_hash_sample(_H_QUERY, 1)}),
    cosr AS (
      SELECT b.vec_id, {_sql_dot('q.e', 'b.e')} / (q.nrm * b.nrm)
               AS cos
      FROM n b, q WHERE b.vec_id <> q.vec_id
    ),
    vecr AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS vec_rank
      FROM (SELECT * FROM cosr ORDER BY cos DESC, vec_id LIMIT 50)
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
             l.lex_rank, r.vec_rank,
             COALESCE(1.0 / (60 + l.lex_rank), 0)
               + COALESCE(1.0 / (60 + r.vec_rank), 0) AS rrf
      FROM lex l FULL OUTER JOIN vecr r ON l.doc_id = r.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank,
           (CASE WHEN rrf < 0 THEN -FLOOR(ABS(rrf) * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS(rrf) * 1000000.0 + 0.5) END
            / 1000000.0 + 0.0) AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def x4_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 + OP-X3 composed — HYBRID retrieval, the production RAG
    serving shape: the x4_bm25 lexical ranking and a vector cosine
    ranking (query = the hash-rank-1 embedding, the family
    convention) fused by reciprocal-rank fusion,
    ``rrf = Σ 1/(60 + rank)`` — the standard score-free fusion that
    needs no calibration between BM25's unbounded scores and cosine's
    [−1, 1].

    Engine parity by construction: both per-side rankings reduce to
    INTEGER ranks before fusion (BM25 ranks on its class-B-rounded
    score as in x4_bm25; cosine on the association-matched raw fold),
    each side is a TakeOrdered top-50 then a 50-row rank window, and
    ``1.0/(60+rank)`` is one IEEE division of small integers —
    bit-identical in both engines — summed in fixed lexical-then-
    vector order. A doc missing from one side contributes 0 from it
    (the COALESCE outer-join form). Ties between single-side docs
    with equal reciprocal scores break on doc_id.

    Scale: each side is its own family's scale plan (bm25: broadcast
    term join + bounded aggs; cosine: broadcast 1-query scan — the
    banded/IVF tiers slot in unchanged as the candidate generator at
    corpus scale); the fusion itself joins two 50-row relations —
    free at any N. doc_id ≡ vec_id is the corpus contract (the
    embeddings table is the documents table's vector column at 100
    TB; here they are separate test tables sharing the id domain)."""
    stop = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(tokens_col("text")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = (tok.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        (F.count(F.lit(1)).cast("double")
         / F.count_distinct("doc_id")).alias("avgdl")))
    dfv = (tok.distinct()
              .groupBy("token").agg(F.count(F.lit(1)).alias("df")))
    terms = (dfv.filter(~F.col("token").isin(*stop))
                .orderBy(F.col("df").desc(), "token").limit(3))
    tf = (tok.join(F.broadcast(terms), "token")
             .groupBy("doc_id", "token")
             .agg(F.count(F.lit(1)).alias("tf"),
                  F.max("df").alias("df")))
    scored = (tf.join(dl, "doc_id").crossJoin(F.broadcast(corpus))
                .select(
                    "doc_id", "token",
                    (F.log((F.col("n_docs") - F.col("df") + 0.5)
                           / (F.col("df") + 0.5) + 1)
                     * F.col("tf") * 2.2
                     / (F.col("tf")
                        + 1.2 * (1 - 0.75
                                 + 0.75 * F.col("dl")
                                 / F.col("avgdl")))).alias("s")))
    agg = (scored.groupBy("doc_id")
                 .agg(F.round(
                     F.aggregate(
                         F.transform(
                             F.array_sort(F.collect_list(
                                 F.struct("token", "s"))),
                             lambda r: r["s"]),
                         F.lit(0.0), lambda a, b: a + b)
                     .cast("decimal(38,10)"), 6)
                  .cast("double").alias("bm25")))
    lex = (agg.orderBy(F.col("bm25").desc(), "doc_id").limit(50)
              .withColumn("lex_rank", F.row_number().over(
                  Window.orderBy(F.col("bm25").desc(), "doc_id")))
              .select("doc_id", "lex_rank"))

    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    q = (_hash_sample(n, 1, _H_QUERY)
         .select(F.col("vec_id").alias("qid"),
                 F.col("e").alias("qe"), F.col("nrm").alias("qnrm")))
    cosr = (n.crossJoin(F.broadcast(q))
             .filter(F.col("vec_id") != F.col("qid"))
             .select("vec_id",
                     (_dot(F.col("qe"), F.col("e"))
                      / (F.col("qnrm") * F.col("nrm"))).alias("cos")))
    vecr = (cosr.orderBy(F.col("cos").desc(), "vec_id").limit(50)
                .withColumn("vec_rank", F.row_number().over(
                    Window.orderBy(F.col("cos").desc(), "vec_id")))
                .select(F.col("vec_id").alias("doc_id"), "vec_rank"))

    fused = (lex.join(vecr, "doc_id", "full_outer")
             .select("doc_id", "lex_rank", "vec_rank",
                     (F.coalesce(1.0 / (60 + F.col("lex_rank")),
                                 F.lit(0.0))
                      + F.coalesce(1.0 / (60 + F.col("vec_rank")),
                                   F.lit(0.0))).alias("rrf")))
    return (fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)
                 .select("doc_id", "lex_rank", "vec_rank",
                         round_half_up(F.col("rrf"), 6)
                          .alias("rrf_score")))


# ---------------------------------------------------------------------------
# OP-X3 — metadata-filtered vector search: pre-filter vs post-filter
# ---------------------------------------------------------------------------

@register(
    "x3_filtered_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n0 AS (
      SELECT vec_id, label, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    n AS (SELECT * FROM n0 WHERE nrm > 0),
    q AS (SELECT vec_id AS query_id, label AS qlabel, e AS qe,
                 nrm AS qnrm FROM n
          {_sql_hash_sample(_H_QUERY, N_QUERIES)}),
    pre AS (
      SELECT q.query_id, q.qlabel, b.vec_id AS neighbor_id,
             {_sql_dot('b.e', 'q.qe')} / (b.nrm * q.qnrm) AS cos
      FROM n b JOIN q ON b.label = q.qlabel
                     AND b.vec_id <> q.query_id
    ),
    truth AS (
      SELECT query_id, qlabel, neighbor_id, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM pre
      ) WHERE rn <= 3
    ),
    truth_str AS (
      SELECT query_id,
             string_agg(CAST(neighbor_id AS VARCHAR), ','
                        ORDER BY rn) AS truth_ids
      FROM truth GROUP BY query_id
    ),
    allp AS (
      SELECT q.query_id, q.qlabel, b.vec_id AS neighbor_id,
             b.label AS nlabel,
             {_sql_dot('b.e', 'q.qe')} / (b.nrm * q.qnrm) AS cos
      FROM n b JOIN q ON b.vec_id <> q.query_id
    ),
    gtop AS (
      SELECT query_id, qlabel, neighbor_id, nlabel, rn_g FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn_g
        FROM allp
      ) WHERE rn_g <= 12
    ),
    post AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY rn_g) AS rp
        FROM gtop WHERE nlabel = qlabel
      ) WHERE rp <= 3
    ),
    postn AS (
      SELECT query_id, COUNT(*) AS n_post FROM post GROUP BY query_id
    ),
    ov AS (
      SELECT t.query_id, COUNT(*) AS n_overlap
      FROM truth t JOIN post p
        ON t.query_id = p.query_id AND t.neighbor_id = p.neighbor_id
      GROUP BY t.query_id
    )
    SELECT q.query_id, q.qlabel AS label, ts.truth_ids,
           COALESCE(pn.n_post, 0) AS n_post,
           COALESCE(ov.n_overlap, 0) AS n_overlap,
           (COALESCE(pn.n_post, 0) < 3) AS starved
    FROM q
    JOIN truth_str ts ON ts.query_id = q.query_id
    LEFT JOIN postn pn ON pn.query_id = q.query_id
    LEFT JOIN ov ON ov.query_id = q.query_id
    """,
)
def x3_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — metadata-filtered similarity search, the most common
    production ANN request after plain top-k ("nearest neighbors
    *within category X*"), demonstrated both ways the literature and
    every vector DB implement it:

    - **Pre-filter (the graded headline)**: candidates come from an
      equality join on the metadata key — the corpus behaves as a
      label-sharded index and a query touches only its shard (~N/L
      rows for L labels). At 100 TB the shard is itself IVF/banded-
      indexed (x3_ivf_topk / x3_hamming_banded compose unchanged
      inside the shard); recall vs the filtered truth is 1 by
      construction. The join shuffles nothing: the 32-query batch
      broadcasts, the corpus streams through map-side.
    - **Post-filter (the in-query referee)**: search the UNFILTERED
      index top-12 (4× oversampling), then apply the predicate — the
      cheap strategy every single-index deployment tries first. With
      10 labels the expected same-label survivors in 12 global hits is
      ~1.2, so most queries STARVE (fewer than k results) — ``starved``
      and ``n_overlap`` make that cost a falsifiable integer verdict
      instead of folklore, the documented reason filtered-ANN engines
      partition or use predicate-aware traversal.

    Everything the driver hashes is integer/string-exact: the top-3
    id list is rank-ordered into a comma string (collect then sort by
    rank — collect_list is order-unstable, the struct sort fixes it),
    and both engines rank on the identical left-to-right cosine fold.
    Zero-norm vectors are excluded on both sides (cosine undefined).
    """
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    q = (_hash_sample(n, N_QUERIES, _H_QUERY)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("qlabel"),
                 F.col("e").alias("qe"), F.col("nrm").alias("qnrm")))
    corpus = n.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id")
    cos = (_dot(F.col("e"), F.col("qe"))
           / (F.col("nrm") * F.col("qnrm")))

    pre = (corpus.join(F.broadcast(q),
                       (F.col("label") == F.col("qlabel"))
                       & (F.col("vec_id") != F.col("query_id")))
                 .select("query_id", "qlabel",
                         F.col("vec_id").alias("neighbor_id"),
                         cos.alias("cos")))
    wt = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    truth = (pre.withColumn("rn", F.row_number().over(wt))
                .filter(F.col("rn") <= 3)
                .select("query_id", "neighbor_id", "rn"))
    truth_str = (truth.groupBy("query_id")
                 .agg(F.array_join(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("rn", "neighbor_id"))),
                     lambda s: s["neighbor_id"].cast("string")), ",")
                     .alias("truth_ids")))

    allp = (corpus.join(F.broadcast(q),
                        F.col("vec_id") != F.col("query_id"))
                  .select("query_id", "qlabel",
                          F.col("vec_id").alias("neighbor_id"),
                          F.col("label").alias("nlabel"),
                          cos.alias("cos")))
    glob = (allp.withColumn("rn_g", F.row_number().over(wt))
                .filter(F.col("rn_g") <= 12))
    wp = Window.partitionBy("query_id").orderBy("rn_g")
    post = (glob.filter(F.col("nlabel") == F.col("qlabel"))
                .withColumn("rp", F.row_number().over(wp))
                .filter(F.col("rp") <= 3)
                .select("query_id", "neighbor_id"))
    postn = post.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_post"))
    ov = (truth.join(post, ["query_id", "neighbor_id"])
               .groupBy("query_id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))

    return (q.select("query_id", F.col("qlabel").alias("label"))
             .join(truth_str, "query_id")
             .join(postn, "query_id", "left")
             .join(ov, "query_id", "left")
             .select("query_id", "label", "truth_ids",
                     F.coalesce("n_post", F.lit(0)).cast("long")
                      .alias("n_post"),
                     F.coalesce("n_overlap", F.lit(0)).cast("long")
                      .alias("n_overlap"),
                     (F.coalesce("n_post", F.lit(0)) < 3)
                      .alias("starved")))


# ---------------------------------------------------------------------------
# OP-X3 — tombstone deletes from a frozen index (the lifecycle's third
# act: x3_ivf_topk trains, x3_ivf_ingest appends, this deletes)
# ---------------------------------------------------------------------------

@register(
    "x3_ivf_delete",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n0 AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    n AS (SELECT * FROM n0 WHERE nrm > 0),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    assigned AS (
      SELECT vec_id, e, nrm, cid,
             (vec_id % 11 = 3) AS is_tomb
      FROM (
        SELECT n.vec_id, n.e, n.nrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ),
    live AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 11 <> 3),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM live
          {_sql_hash_sample(_H_QUERY, N_QUERIES)}),
    qa AS (
      SELECT query_id, qe, qnrm, cid AS qcell FROM (
        SELECT q.query_id, q.qe, q.qnrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_dot('q.qe', 'cent.ce')}
                          / (q.qnrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM q CROSS JOIN cent
      ) WHERE rc = 1
    ),
    cand AS (
      SELECT qa.query_id, a.vec_id AS neighbor_id, a.is_tomb,
             {_sql_dot('a.e', 'qa.qe')} / (a.nrm * qa.qnrm) AS cos
      FROM assigned a JOIN qa
        ON a.cid = qa.qcell AND a.vec_id <> qa.query_id
    ),
    before_top AS (
      SELECT query_id, neighbor_id, is_tomb, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM cand
      ) WHERE rn <= 3
    ),
    after_top AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM cand WHERE NOT is_tomb
      ) WHERE rn <= 3
    ),
    bs AS (
      SELECT query_id,
             string_agg(CAST(neighbor_id AS VARCHAR), ','
                        ORDER BY rn) AS before_ids,
             COUNT(CASE WHEN is_tomb THEN 1 END) AS n_tomb_before
      FROM before_top GROUP BY query_id
    ),
    asx AS (
      SELECT query_id,
             string_agg(CAST(neighbor_id AS VARCHAR), ','
                        ORDER BY rn) AS after_ids
      FROM after_top GROUP BY query_id
    )
    SELECT bs.query_id, bs.before_ids, asx.after_ids, bs.n_tomb_before,
           (bs.before_ids <> asx.after_ids) AS changed,
           ((bs.before_ids <> asx.after_ids) = (bs.n_tomb_before > 0))
             AS changed_iff_hit
    FROM bs JOIN asx ON asx.query_id = bs.query_id
    """,
)
def x3_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — deletes against a FROZEN index, the third act of the
    index lifecycle (train: x3_ivf_topk / ingest: x3_ivf_ingest /
    delete: here) and the FAISS ``remove_ids`` / vector-DB tombstone
    path: ~9% of the corpus (``vec_id % 11 = 3``) is deleted by
    writing a TOMBSTONE relation — the stored postings, centroids and
    codes are never rewritten; search masks tombstones with an
    anti-join at candidate-gather time and a background vacuum
    rewrites postings only when the dead fraction crosses a threshold
    (the s20 retention posture applied to an index).

    Scale shape: candidates are CELL-pruned before the mask, so the
    anti-join touches (queries × cell size) candidate rows against the
    tombstone keys — at 100 TB the mask is a bloom prefilter + exact
    anti-join (x1_bloom posture), never a corpus rewrite. The verdict
    is a small theorem made falsifiable: masking can only remove
    candidates, so a query's top-3 changes IFF a tombstone sat in its
    pre-delete top-3 (``changed_iff_hit``, pinned per query), with the
    before/after id lists rank-ordered into strings (integer-exact
    hash) and ``n_tomb_before`` counting the evidence. Queries are
    sampled from the LIVE set (a deleted entity no longer queries);
    tombstoned vectors still ASSIGN to cells (they are in the stored
    postings — deletion is logical, which is the point).
    """
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
            .select(F.col("vec_id").alias("cid"),
                    F.col("e").alias("ce"), F.col("nrm").alias("cnrm")))

    def assign(df, idc, vec, nrmc):
        """Nearest-centroid argmax via min(struct) — single map-side
        partial agg, no per-vector sort window (CLAUDE.md argmin rule).
        """
        scored = (df.repartition(
                      spark.sparkContext.defaultParallelism, idc)
                    .crossJoin(F.broadcast(cent)))
        neg = -(_dot(F.col(vec), F.col("ce"))
                / (F.col(nrmc) * F.col("cnrm")))
        best = (scored.groupBy(idc)
                      .agg(F.min(F.struct(neg.alias("negcos"),
                                          F.col("cid"))).alias("b")))
        return best.select(idc, F.col("b.cid").alias("cell"))

    tomb = F.col("vec_id") % 11 == 3
    assigned = (n.join(assign(n, "vec_id", "e", "nrm"), "vec_id")
                 .withColumn("is_tomb", tomb))
    live = n.filter(~tomb)
    q = (_hash_sample(live, N_QUERIES, _H_QUERY)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("e").alias("qe"), F.col("nrm").alias("qnrm")))
    qa = (q.join(assign(q.select(F.col("query_id").alias("vec_id"),
                                 F.col("qe").alias("e"),
                                 F.col("qnrm").alias("nrm")),
                        "vec_id", "e", "nrm")
            .select(F.col("vec_id").alias("query_id"),
                    F.col("cell").alias("qcell")), "query_id"))

    # logical delete = anti-join against the tombstone RELATION (the
    # production shape: requests arrive as a table, not a predicate)
    tombstones = n.filter(tomb).select(
        F.col("vec_id").alias("tomb_id"))

    cand = (assigned.join(F.broadcast(qa),
                          (F.col("cell") == F.col("qcell"))
                          & (F.col("vec_id") != F.col("query_id")))
                    .select("query_id",
                            F.col("vec_id").alias("neighbor_id"),
                            "is_tomb",
                            (_dot(F.col("e"), F.col("qe"))
                             / (F.col("nrm") * F.col("qnrm")))
                            .alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    before = (cand.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3))
    masked = cand.join(tombstones,
                       cand.neighbor_id == tombstones.tomb_id,
                       "left_anti")
    after = (masked.withColumn("rn", F.row_number().over(w))
                   .filter(F.col("rn") <= 3))

    def ids_str(df):
        return F.array_join(F.transform(
            F.array_sort(F.collect_list(
                F.struct("rn", "neighbor_id"))),
            lambda s: s["neighbor_id"].cast("string")), ",")

    bs = (before.groupBy("query_id")
                .agg(ids_str(before).alias("before_ids"),
                     F.count(F.when(F.col("is_tomb"), F.lit(1)))
                      .alias("n_tomb_before")))
    asx = (after.groupBy("query_id")
                .agg(ids_str(after).alias("after_ids")))
    changed = F.col("before_ids") != F.col("after_ids")
    return (bs.join(asx, "query_id")
              .select("query_id", "before_ids", "after_ids",
                      "n_tomb_before", changed.alias("changed"),
                      (changed == (F.col("n_tomb_before") > 0))
                       .alias("changed_iff_hit")))


# ---------------------------------------------------------------------------
# OP-X3 — MMR diversified retrieval (the serving-side post-processor)
# ---------------------------------------------------------------------------

_MMR_POOL = 8     #: candidate pool size per query (C)
_MMR_LAM = 0.7    #: relevance weight; (1 - lambda) penalizes redundancy


def _sql_mmr_cos(ce: str, cn: str, se: str, sn: str) -> str:
    return f"{_sql_dot(ce, se)} / ({cn} * {sn})"


@register(
    "x3_mmr_diversify",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    q AS (
      SELECT vec_id AS qid, e AS qe, nrm AS qn FROM n
      {_sql_hash_sample(_H_QUERY, N_QUERIES)}
    ),
    pool AS (
      SELECT qid, cid, ce, cn, rel,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY rel DESC, cid) AS rn
      FROM (SELECT q.qid, n.vec_id AS cid, n.e AS ce, n.nrm AS cn,
                   {_sql_dot('q.qe', 'n.e')} / (q.qn * n.nrm) AS rel
            FROM q JOIN n ON n.vec_id <> q.qid)
    ),
    p8 AS (SELECT * FROM pool WHERE rn <= {_MMR_POOL}),
    s1 AS (SELECT qid, cid AS id1, ce AS e1, cn AS n1, rel AS score1
           FROM p8 WHERE rn = 1),
    c2 AS (
      SELECT p.qid, p.cid, p.ce, p.cn,
             {_MMR_LAM} * p.rel - {1 - _MMR_LAM} *
               ({_sql_mmr_cos('p.ce', 'p.cn', 's.e1', 's.n1')}) AS score
      FROM p8 p JOIN s1 s ON p.qid = s.qid AND p.cid <> s.id1
    ),
    s2 AS (
      SELECT qid, cid AS id2, ce AS e2, cn AS n2, score AS score2
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY score DESC, cid) AS rk FROM c2)
      WHERE rk = 1
    ),
    c3 AS (
      SELECT p.qid, p.cid,
             {_MMR_LAM} * p.rel - {1 - _MMR_LAM} * GREATEST(
               {_sql_mmr_cos('p.ce', 'p.cn', 'a.e1', 'a.n1')},
               {_sql_mmr_cos('p.ce', 'p.cn', 'b.e2', 'b.n2')}) AS score
      FROM p8 p
      JOIN s1 a ON p.qid = a.qid
      JOIN s2 b ON p.qid = b.qid
      WHERE p.cid <> a.id1 AND p.cid <> b.id2
    ),
    s3 AS (
      SELECT qid, cid AS id3, score AS score3
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY score DESC, cid) AS rk FROM c3)
      WHERE rk = 1
    )
    SELECT qid AS query_id, 1 AS sel_rank, id1 AS selected_id,
           {sql_round_half_up('score1', 6)} AS mmr_score
    FROM s1
    UNION ALL
    SELECT qid, 2, id2, {sql_round_half_up('score2', 6)} FROM s2
    UNION ALL
    SELECT qid, 3, id3, {sql_round_half_up('score3', 6)} FROM s3
    """,
)
def x3_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — Maximal Marginal Relevance (Carbonell & Goldstein '98):
    greedy diversified top-3, score = 0.7*rel - 0.3*max_sim_to_selected.
    The serving-side post-processor every RAG stack runs between
    retrieval and the prompt — near-duplicate hits waste context tokens
    (the x2 dedup program's point, applied at query time).

    Shape: relevance pool = top-C (C=8) per query — at 100 TB that pool
    comes from any ANN tier (x3_cascade_topk); here it's the exact scan
    so the oracle replays it. The MMR loop itself NEVER touches the
    corpus: it joins <=C-row relations per query, O(Q * C^2) with Q, C
    literal constants — driver-free sketch algebra like a21. Greedy
    steps unroll to k=3 dataframe stages (selection argmax = struct-min
    idiom on (-score, cid)); the pool is ckpt'd once, because 4
    downstream consumers would otherwise re-run the QxN scan per use
    (the r5 multi-consumed-relation rule). Scores are identical-bits
    class-A folds cross-engine (same literal 0.7/0.3, same fold order),
    so the greedy DECISIONS match bit-for-bit; displayed scores are
    6dp half-up."""
    lam, pen = _MMR_LAM, 1 - _MMR_LAM
    e = _t(spark, sf_dir, "embeddings")
    n = (e.select("vec_id", _as_double_vec("embedding").alias("e"))
          .withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e")))))
    q = (_hash_sample(n, N_QUERIES, _H_QUERY)
         .select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
                 F.col("nrm").alias("qn")))
    corpus = n.repartition(spark.sparkContext.defaultParallelism,
                           "vec_id")
    rel = _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))
    pairs = (corpus.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
                   .select("qid", F.col("vec_id").alias("cid"),
                           F.col("e").alias("ce"),
                           F.col("nrm").alias("cn"), rel.alias("rel")))
    w = Window.partitionBy("qid").orderBy(F.col("rel").desc(), "cid")
    p8 = ckpt(pairs.withColumn("rn", F.row_number().over(w))
                   .filter(F.col("rn") <= _MMR_POOL))
    s1 = (p8.filter(F.col("rn") == 1)
            .select("qid", F.col("cid").alias("id1"),
                    F.col("ce").alias("e1"), F.col("cn").alias("n1"),
                    F.col("rel").alias("score1")))

    def _cos(se: str, sn: str) -> F.Column:
        return (_dot(F.col("ce"), F.col(se))
                / (F.col("cn") * F.col(sn)))

    c2 = (p8.join(s1, "qid")
            .filter(F.col("cid") != F.col("id1"))
            .withColumn("score",
                        F.lit(lam) * F.col("rel")
                        - F.lit(pen) * _cos("e1", "n1")))
    s2 = (c2.groupBy("qid")
            .agg(F.min(F.struct((-F.col("score")).alias("neg"),
                                F.col("cid").alias("cid"),
                                F.col("ce").alias("ce"),
                                F.col("cn").alias("cn"))).alias("pk"))
            .select("qid", F.col("pk.cid").alias("id2"),
                    F.col("pk.ce").alias("e2"),
                    F.col("pk.cn").alias("n2"),
                    (-F.col("pk.neg")).alias("score2")))
    c3 = (p8.join(s1, "qid").join(s2, "qid")
            .filter((F.col("cid") != F.col("id1"))
                    & (F.col("cid") != F.col("id2")))
            .withColumn("score",
                        F.lit(lam) * F.col("rel")
                        - F.lit(pen) * F.greatest(_cos("e1", "n1"),
                                                  _cos("e2", "n2"))))
    s3 = (c3.groupBy("qid")
            .agg(F.min(F.struct((-F.col("score")).alias("neg"),
                                F.col("cid").alias("cid"))).alias("pk"))
            .select("qid", F.col("pk.cid").alias("id3"),
                    (-F.col("pk.neg")).alias("score3")))
    out1 = s1.select(F.col("qid").alias("query_id"),
                     F.lit(1).alias("sel_rank"),
                     F.col("id1").alias("selected_id"),
                     round_half_up(F.col("score1"), 6)
                      .alias("mmr_score"))
    out2 = s2.select(F.col("qid").alias("query_id"),
                     F.lit(2).alias("sel_rank"),
                     F.col("id2").alias("selected_id"),
                     round_half_up(F.col("score2"), 6)
                      .alias("mmr_score"))
    out3 = s3.select(F.col("qid").alias("query_id"),
                     F.lit(3).alias("sel_rank"),
                     F.col("id3").alias("selected_id"),
                     round_half_up(F.col("score3"), 6)
                      .alias("mmr_score"))
    return out1.unionByName(out2).unionByName(out3)


# ---------------------------------------------------------------------------
# OP-X9 — epoch-seeded global shuffle -> shard assignment
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 16
_SHUF_DENOM = 1152921504606846976  # 2^60 — the kmv 15-hex-digit domain


@register(
    "x9_epoch_shuffle",
    oracle=f"""
    WITH ep AS (SELECT UNNEST([1, 2]) AS epoch),
    h AS (
      SELECT ep.epoch, d.doc_id, d.n_chars,
             ('0x' || substr(md5('ep' || ep.epoch || ':'
                                 || CAST(d.doc_id AS VARCHAR)), 1, 15)
             )::BIGINT AS hk
      FROM documents d CROSS JOIN ep
    )
    SELECT epoch,
           CAST(hk % {_SHUF_SHARDS} AS INTEGER) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(hk % 1000000007) AS BIGINT) AS h_fold,
           MIN({{'h': hk, 'i': doc_id}}).i AS first_id,
           MAX({{'h': hk, 'i': doc_id}}).i AS last_id
    FROM h GROUP BY epoch, hk % {_SHUF_SHARDS}
    """,
)
def x9_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X9 — the training-loader's global shuffle: every epoch, each
    document gets a fresh deterministic pseudo-random key
    ``h = md5('ep<epoch>:' || doc_id)`` (60-bit, the a21 portable
    recipe); shard = h mod S, within-shard order = (h, doc_id). That is
    the standard seeded-reshuffle contract (same corpus, different
    epoch -> a different but replayable permutation) with no RNG state
    anywhere — resumable from any row because the key is a pure
    function of (epoch, doc_id).

    Scale shape: ONE scan, ONE hash agg — shard assignment is
    map-side arithmetic, never a global sort (the within-shard order is
    DEFINED by sorting on h at read time, so verifying the SET pins the
    permutation: set equality under a deterministic sort key implies
    order equality). Verdict columns per (epoch, shard): exact count,
    payload bytes, a modular fold of the keys (integer-exact), and the
    permutation's endpoints via the struct-argmin/argmax idiom. Epochs
    1 and 2 both emitted — the reshuffle is visibly different while
    both stay hash-exact."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ep = d.withColumn("epoch", F.explode(F.array(F.lit(1), F.lit(2))))
    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ep"), F.col("epoch").cast("string"),
                           F.lit(":"), F.col("doc_id").cast("string"))),
            1, 15), 16, 10).cast("long")
    h = ep.withColumn("hk", hk)
    return (h.groupBy("epoch",
                      (F.col("hk") % _SHUF_SHARDS).cast("int")
                       .alias("shard_id"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("n_chars"),
                  F.sum(F.col("hk") % 1000000007).alias("h_fold"),
                  F.min(F.struct(F.col("hk").alias("hk"),
                                 F.col("doc_id").alias("doc_id")))
                   .alias("fst"),
                  F.max(F.struct(F.col("hk").alias("hk"),
                                 F.col("doc_id").alias("doc_id")))
                   .alias("lst"))
             .select("epoch", "shard_id", "n_docs", "n_chars", "h_fold",
                     F.col("fst.doc_id").alias("first_id"),
                     F.col("lst.doc_id").alias("last_id")))


# ---------------------------------------------------------------------------
# OP-X4 — bigram language-model scoring (the conditional-prob step up
# from x4_unigram_logprob)
# ---------------------------------------------------------------------------

@register(
    "x4_bigram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS ts FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
                                   i -> ts[i] || ' ' || ts[i + 1]))
               AS bigram
      FROM toks WHERE len(ts) >= 2
    ),
    bcnt AS (
      SELECT bigram, COUNT(*) AS bc FROM bg GROUP BY bigram
      ORDER BY bc DESC, bigram LIMIT {VOCAB_K}
    ),
    ccnt AS (
      SELECT split_part(bigram, ' ', 1) AS w1, COUNT(*) AS cc
      FROM bg GROUP BY split_part(bigram, ' ', 1)
      ORDER BY cc DESC, w1 LIMIT {VOCAB_K}
    )
    SELECT g.doc_id, COUNT(*) AS n_bigrams,
           CAST(ROUND(CAST(AVG(ln(COALESCE(CAST(b.bc AS DOUBLE), 0.5)
                                  / COALESCE(CAST(c.cc AS DOUBLE), 0.5)))
                           AS DECIMAL(38,10)), 6) AS DOUBLE)
             AS avg_logprob
    FROM bg g
    LEFT JOIN bcnt b ON g.bigram = b.bigram
    LEFT JOIN ccnt c ON split_part(g.bigram, ' ', 1) = c.w1
    GROUP BY g.doc_id
    """,
)
def x4_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — per-document mean bigram CONDITIONAL log-probability
    ``ln(c(w1 w2) / c(w1·))`` under a corpus-trained model: the
    KenLM-order-2 quality signal (fluency, not just vocabulary — a doc
    of frequent words in implausible ORDER scores low here but fine
    under x4_unigram_logprob). Out-of-model bigrams and contexts floor
    at a 0.5 pseudo-count (an absent numerator with a present context
    is the true "never seen in this order" penalty; both absent is
    neutral by construction).

    Same scale contract as the unigram form: bigram expansion is an
    in-row array transform (no self-join of the token stream —
    position adjacency is resolved INSIDE the array before the
    explode); both model tables are Heaps'-unbounded raw but truncated
    to the VOCAB_K head by distributed TakeOrdered, so the scoring
    joins broadcast; the only shuffle keyed on doc_id. Mean-of-logs is
    decimal-routed 6dp (class B: libm ln + order-dependent sum)."""
    d = _t(spark, sf_dir, "documents")
    ts = tokens_col("text")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("ts") - 1),
        lambda i: F.concat(F.element_at(F.col("ts"), i), F.lit(" "),
                           F.element_at(F.col("ts"), i + 1)))
    bg = (d.select("doc_id", ts.alias("ts"))
           .filter(F.size("ts") >= 2)
           .select("doc_id", F.explode(bigrams).alias("bigram")))
    bcnt = (bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("bc"))
              .orderBy(F.col("bc").desc(), "bigram").limit(VOCAB_K))
    ccnt = (bg.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
              .agg(F.count(F.lit(1)).alias("cc"))
              .orderBy(F.col("cc").desc(), "w1").limit(VOCAB_K))
    lp = F.log(F.coalesce(F.col("bc").cast("double"), F.lit(0.5))
               / F.coalesce(F.col("cc").cast("double"), F.lit(0.5)))
    return (bg.join(F.broadcast(bcnt), "bigram", "left")
              .join(F.broadcast(ccnt),
                    F.substring_index("bigram", " ", 1) == F.col("w1"),
                    "left")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.round(F.avg(lp).cast("decimal(38,10)"), 6)
                    .cast("double").alias("avg_logprob")))


# ---------------------------------------------------------------------------
# OP-X3 — index compaction / vacuum: the fourth act of the lifecycle
# ---------------------------------------------------------------------------

@register(
    "x3_index_compaction",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n0 AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
    ),
    n AS (SELECT * FROM n0 WHERE nrm > 0),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             WHERE vec_id % 7 <> 2
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    posts AS (
      SELECT vec_id, e, nrm, cid, (vec_id % 11 = 3) AS is_tomb
      FROM (
        SELECT n.vec_id, n.e, n.nrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ),
    live AS (SELECT vec_id, e, nrm FROM n WHERE vec_id % 11 <> 3),
    q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM live
          {_sql_hash_sample(_H_QUERY, N_QUERIES)}),
    qa AS (
      SELECT query_id, qe, qnrm, cid AS qcell FROM (
        SELECT q.query_id, q.qe, q.qnrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_dot('q.qe', 'cent.ce')}
                          / (q.qnrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM q CROSS JOIN cent
      ) WHERE rc = 1
    ),
    top3 AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        FROM (
          SELECT qa.query_id, p.vec_id AS neighbor_id,
                 {_sql_dot('p.e', 'qa.qe')} / (p.nrm * qa.qnrm) AS cos
          FROM posts p JOIN qa
            ON p.cid = qa.qcell AND p.vec_id <> qa.query_id
          WHERE NOT p.is_tomb
        )
      ) WHERE rn <= 3
    ),
    stats AS (
      SELECT COUNT(CASE WHEN is_tomb THEN 1 END) AS n_dead,
             COUNT(*) AS n_postings
      FROM posts
    )
    SELECT t.query_id,
           string_agg(CAST(t.neighbor_id AS VARCHAR), ','
                      ORDER BY t.rn) AS composite_ids,
           string_agg(CAST(t.neighbor_id AS VARCHAR), ','
                      ORDER BY t.rn) AS compacted_ids,
           TRUE AS lists_equal,
           s.n_dead, s.n_postings,
           (s.n_dead * 10 >= s.n_postings) AS vacuum_due
    FROM top3 t CROSS JOIN stats s
    GROUP BY t.query_id, s.n_dead, s.n_postings
    """,
)
def x3_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — compaction/vacuum, the fourth act of the index
    lifecycle (train: x3_ivf_topk, ingest: x3_ivf_ingest, delete:
    x3_ivf_delete, compact: here — the FAISS rebuild-from-live /
    vector-DB segment-merge path). Two physically DIFFERENT serving
    plans are run side by side over a frozen-centroid IVF with ~9%
    tombstones: the COMPOSITE index masks tombstones with an anti-join
    at candidate-gather time (every query pays the mask), and the
    COMPACTED index materializes the postings rewrite once (ckpt — the
    staged-rewrite s11/s20 posture applied to an index) and serves
    mask-free. The verdict is the rewrite-correctness theorem made
    falsifiable per query: identical frozen centroids + identical live
    set imply identical candidate sets, so the rank-ordered top-3
    strings must be equal ROW FOR ROW (``lists_equal``, hash-pinned
    against the oracle's canonical computation), while ``vacuum_due``
    pins the integer trigger policy (dead fraction >= 10%) that decides
    WHEN the rewrite pays for itself. Centroids are trained on the
    base partition only (vec_id % 7 <> 2 — the x3_ivf_ingest split),
    so delta rows flow through ingest-assigned cells, never a retrain:
    compaction rewrites POSTINGS, not the model."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    base = n.filter(F.col("vec_id") % 7 != 2)
    cent = (_hash_sample(base, K_COARSE, _H_CENT)
            .select(F.col("vec_id").alias("cid"),
                    F.col("e").alias("ce"),
                    F.col("nrm").alias("cnrm")))

    def assign(df, idc):
        scored = (df.repartition(
                      spark.sparkContext.defaultParallelism, idc)
                    .crossJoin(F.broadcast(cent)))
        neg = -(_dot(F.col("e"), F.col("ce"))
                / (F.col("nrm") * F.col("cnrm")))
        return (scored.groupBy(idc)
                      .agg(F.min(F.struct(neg.alias("negcos"),
                                          F.col("cid"))).alias("b"))
                      .select(idc, F.col("b.cid").alias("cell")))

    tomb = F.col("vec_id") % 11 == 3
    postings = (n.join(assign(n, "vec_id"), "vec_id")
                 .withColumn("is_tomb", tomb))
    tombstones = (n.filter(tomb)
                   .select(F.col("vec_id").alias("tomb_id")))
    live = n.filter(~tomb)
    q = (_hash_sample(live, N_QUERIES, _H_QUERY)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("e").alias("qe"), F.col("nrm").alias("qnrm")))
    qa = (q.join(assign(q.select(F.col("query_id").alias("vec_id"),
                                 F.col("qe").alias("e"),
                                 F.col("qnrm").alias("nrm")), "vec_id")
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("cell").alias("qcell")), "query_id"))

    def gather(posts):
        return (posts.join(F.broadcast(qa),
                           (F.col("cell") == F.col("qcell"))
                           & (F.col("vec_id") != F.col("query_id")))
                     .select("query_id",
                             F.col("vec_id").alias("neighbor_id"),
                             (_dot(F.col("e"), F.col("qe"))
                              / (F.col("nrm") * F.col("qnrm")))
                             .alias("cos")))

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))

    def top3_ids(cand, out):
        t = cand.withColumn("rn", F.row_number().over(w)) \
                .filter(F.col("rn") <= 3)
        return (t.groupBy("query_id")
                 .agg(F.array_join(F.transform(
                          F.array_sort(F.collect_list(
                              F.struct("rn", "neighbor_id"))),
                          lambda s: s["neighbor_id"].cast("string")),
                      ",").alias(out)))

    # composite serving: mask at query time, after the cell gather
    composite_cand = gather(postings).join(
        tombstones, F.col("neighbor_id") == F.col("tomb_id"),
        "left_anti")
    # compacted serving: postings rewritten ONCE (materialized), no
    # query-time mask
    compacted_posts = ckpt(postings.join(
        tombstones, postings.vec_id == tombstones.tomb_id,
        "left_anti"))
    compacted_cand = gather(compacted_posts)

    stats = postings.agg(
        F.sum(F.when(F.col("is_tomb"), 1).otherwise(0)).alias("n_dead"),
        F.count(F.lit(1)).alias("n_postings"))
    out = (top3_ids(composite_cand, "composite_ids")
           .join(top3_ids(compacted_cand, "compacted_ids"), "query_id")
           .crossJoin(F.broadcast(stats)))
    return out.select(
        "query_id", "composite_ids", "compacted_ids",
        (F.col("composite_ids") == F.col("compacted_ids"))
         .alias("lists_equal"),
        "n_dead", "n_postings",
        (F.col("n_dead") * 10 >= F.col("n_postings"))
         .alias("vacuum_due"))


# ---------------------------------------------------------------------------
# OP-X4 — n-gram novelty: how much NEW text does each document add?
# ---------------------------------------------------------------------------

@register(
    "x4_ngram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest({SQL_SHINGLES}) AS gram FROM toks
    ),
    first_intro AS (
      SELECT gram, MIN(doc_id) AS intro_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           COUNT(CASE WHEN f.intro_doc = g.doc_id THEN 1 END)
             AS n_novel,
           (CASE WHEN (COUNT(CASE WHEN f.intro_doc = g.doc_id
                                  THEN 1 END) * 1.0 / COUNT(*)) < 0
                 THEN -FLOOR(ABS(COUNT(CASE WHEN f.intro_doc = g.doc_id
                                             THEN 1 END) * 1.0
                                 / COUNT(*)) * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS(COUNT(CASE WHEN f.intro_doc = g.doc_id
                                           THEN 1 END) * 1.0
                               / COUNT(*)) * 1000000.0 + 0.5)
            END / 1000000.0 + 0.0) AS novelty
    FROM grams g JOIN first_intro f ON g.gram = f.gram
    GROUP BY g.doc_id
    """,
)
def x4_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — per-document 3-gram NOVELTY against the corpus in
    ingestion order: the fraction of a doc's distinct 3-grams whose
    FIRST introduction (min doc_id) is the doc itself. The
    diversity-curation signal dedup doesn't give you — a doc can be
    non-duplicate yet contribute nothing new (novelty ~ 0: recombined
    boilerplate), and a training-mix curator caps exactly that tail
    (the "contributes new n-grams" criterion from deduplicating-
    training-data practice, applied corpus-wide).

    Shape: one shingle explode (distinct per doc, the x2 pipeline's
    shingle algebra), a gram->min(doc_id) hash agg (map-side
    combinable — the inverted index never materializes per-doc
    lists), and an equi-join back on the gram key; everything shuffles
    on gram / doc_id, both unbounded keys. The novelty ratio is an
    exact int ratio through the class-A floor kernel at 6dp."""
    d = _t(spark, sf_dir, "documents")
    grams = (d.select("doc_id",
                      F.explode(shingles_col(tokens_col("text")))
                       .alias("gram")))
    first_intro = (grams.groupBy("gram")
                        .agg(F.min("doc_id").alias("intro_doc")))
    return (grams.join(first_intro, "gram")
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_grams"),
                      F.count(F.when(F.col("intro_doc")
                                     == F.col("doc_id"), 1))
                       .alias("n_novel"))
                 .select("doc_id", "n_grams", "n_novel",
                         round_half_up(
                             F.col("n_novel") * 1.0 / F.col("n_grams"),
                             6).alias("novelty")))


# ---------------------------------------------------------------------------
# OP-X2 — MinHash estimator-quality report (est vs exact Jaccard)
# ---------------------------------------------------------------------------

@register(
    "x2_minhash_estimate_report",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    shingled AS (
      SELECT doc_id, s FROM (SELECT doc_id, {SQL_SHINGLES} AS s
                             FROM toks) WHERE len(s) > 0
    ),
    mh AS (
      SELECT t1.doc_id, t.i,
             min(md5(CAST(t.i AS VARCHAR) || ':' || t1.shingle)) AS mh
      FROM (SELECT doc_id, unnest(s) AS shingle FROM shingled) t1
      CROSS JOIN range(16) t(i)
      GROUP BY t1.doc_id, t.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
      FROM mh GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.doc_a, c.doc_b,
             COUNT(CASE WHEN ma.mh = mb.mh THEN 1 END) AS n_match
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.doc_a
      JOIN mh mb ON mb.doc_id = c.doc_b AND mb.i = ma.i
      GROUP BY c.doc_a, c.doc_b
    ),
    tok AS (SELECT doc_id, unnest(s) AS shingle FROM shingled),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN tok a ON a.doc_id = c.doc_a
      JOIN tok b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT e.doc_a, e.doc_b,
             e.n_match / 16.0 AS est_raw,
             CAST(m.n_common AS DOUBLE)
               / (sa.n + sb.n - m.n_common) AS exact_raw
      FROM est e
      JOIN common m ON m.doc_a = e.doc_a AND m.doc_b = e.doc_b
      JOIN sizes sa ON e.doc_a = sa.doc_id
      JOIN sizes sb ON e.doc_b = sb.doc_id
    ),
    tot AS (
      SELECT CAST(ROUND(SUM(CAST({sql_round_half_up(
                 'ABS(est_raw - exact_raw)', 6)} AS DECIMAL(38,10)))
               / COUNT(*), 6) AS DOUBLE) AS mae
      FROM pairs
    )
    SELECT doc_a, doc_b,
           {sql_round_half_up('est_raw', 6)} AS est_jac,
           {sql_round_half_up('exact_raw', 6)} AS exact_jac,
           {sql_round_half_up('ABS(est_raw - exact_raw)', 6)}
             AS abs_err,
           tot.mae
    FROM pairs CROSS JOIN tot
    """,
)
def x2_minhash_estimate_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """OP-X2 — estimator-quality report for the portable MinHash
    family: for every banded candidate pair, the 16-hash signature
    estimate (matching-minima fraction — the unbiased Pr[min match] =
    J estimator) NEXT TO the exact Jaccard, with per-pair absolute
    error and the corpus MAE. The x3_recall_report posture applied to
    the dedup sketches: a sketch you deploy at 100 TB needs its
    accuracy MEASURED on your corpus, not assumed from the theorem
    (16 hashes → std err ~ sqrt(J(1-J)/16) ~ 0.12 at J=0.5; the MAE
    column is the falsifiable form).

    Scale shape: candidates come from the SAME banding join the dedup
    pipeline already runs (pigeonhole, no all-pairs); the estimate is
    a zip_with equality fold over two 16-element arrays (constant per
    pair); exact Jaccard is computed ONLY for candidate pairs via the
    inverted-index join (Σdf² bounded). Ratios are exact int/16 and
    int ratios (class-A floor kernel); the MAE total rides a DECIMAL
    sum over 6dp-quantized terms — exact and order-free."""
    d = _t(spark, sf_dir, "documents")
    sig = ckpt(_portable_sig(d))
    bands = _portable_bands(d)
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    F.col("sig").alias("sig_b"))
    est = (cand.join(sa, "doc_a").join(sb, "doc_b")
               .withColumn(
                   "est_raw",
                   F.aggregate(
                       F.zip_with("sig_a", "sig_b",
                                  lambda x, y: (x == y).cast("int")),
                       F.lit(0),
                       lambda acc, x: acc + x) / F.lit(16.0)))
    sh = (d.select("doc_id",
                   shingles_col(tokens_col("text")).alias("s"))
           .filter(F.size("s") > 0))
    tok = sh.select("doc_id", F.explode("s").alias("shingle"))
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (cand
              .join(tok.select(F.col("doc_id").alias("doc_a"),
                               "shingle"), "doc_a")
              .join(tok.select(F.col("doc_id").alias("doc_b2"),
                               F.col("shingle").alias("shingle_b")),
                    (F.col("doc_b") == F.col("doc_b2"))
                    & (F.col("shingle_b") == F.col("shingle")))
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    pairs = (est.select("doc_a", "doc_b", "est_raw")
                .join(common, ["doc_a", "doc_b"])
                .join(sizes.select(F.col("doc_id").alias("doc_a"),
                                   F.col("n").alias("na")), "doc_a")
                .join(sizes.select(F.col("doc_id").alias("doc_b"),
                                   F.col("n").alias("nb")), "doc_b")
                .withColumn("exact_raw",
                            F.col("n_common").cast("double")
                            / (F.col("na") + F.col("nb")
                               - F.col("n_common"))))
    err6 = round_half_up(F.abs(F.col("est_raw") - F.col("exact_raw")),
                         6)
    # the corpus MAE is a 1-row aggregate broadcast back onto the pair
    # rows — never a global (single-partition) window over a relation
    # whose size scales with the corpus
    tot = pairs.agg(
        F.round(F.sum(err6.cast("decimal(38,10)"))
                / F.count(F.lit(1)), 6)
         .cast("double").alias("mae"))
    return (pairs.crossJoin(F.broadcast(tot))
                 .select(
        "doc_a", "doc_b",
        round_half_up(F.col("est_raw"), 6).alias("est_jac"),
        round_half_up(F.col("exact_raw"), 6).alias("exact_jac"),
        err6.alias("abs_err"),
        "mae"))


# ---------------------------------------------------------------------------
# OP-X6 — reliability diagram + expected calibration error
# ---------------------------------------------------------------------------

_ECE_STOPS = ("the", "of", "and", "to", "in", "is", "a")
_ECE_STOPS_SQL = "[" + ", ".join(f"'{w}'" for w in _ECE_STOPS) + "]"


@register(
    "x6_ece_report",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             LEAST(len(list_filter({SQL_TOKENS},
                       x -> list_contains({_ECE_STOPS_SQL}, x))) * 5.0
                   / GREATEST(len({SQL_TOKENS}), 1), 1.0) AS p
      FROM documents
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(p * 10) AS INTEGER), 9) AS bin_id, p, y
      FROM scored
    ),
    agg AS (
      SELECT bin_id, COUNT(*) AS n_docs,
             CAST(ROUND(CAST(AVG(p) AS DECIMAL(38,10)), 6) AS DOUBLE)
               AS mean_conf,
             {{obs}} AS obs_rate
      FROM binned GROUP BY bin_id
    ),
    gapped AS (
      SELECT *, ABS(mean_conf - obs_rate) AS gap,
             SUM(n_docs) OVER () AS n_total
      FROM agg
    )
    SELECT bin_id, n_docs, mean_conf, obs_rate,
           {{gap6}} AS gap,
           CAST(ROUND(SUM(CAST({{wterm}} AS DECIMAL(38,10)))
                      OVER (), 6) AS DOUBLE) AS ece
    FROM gapped
    """.format(
        obs=sql_round_half_up("SUM(y) * 1.0 / COUNT(*)", 6),
        gap6=sql_round_half_up("gap", 6),
        wterm=sql_round_half_up("gap * n_docs / n_total", 8),
    ),
)
def x6_ece_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — reliability diagram + Expected Calibration Error for a
    classifier score against ground truth: the standard trust audit
    for any model-scored pipeline stage (an LLM-judge or quality
    classifier whose confidences feed downstream thresholds MUST be
    calibration-checked, or its 0.9 doesn't mean 90%). The
    "classifier" here is the deterministic stopword-density English
    detector (score = capped 5x stopword ratio) judged against the
    lang label — a real (weak) predictor, so bins are populated at
    both ends and the gap columns measure genuine miscalibration.

    Shape: one scan computes (y, p) per doc in-row (array algebra, no
    model server in the loop), one 10-row hash agg; every window runs
    over the bounded bin table. Determinism: p is an exact int ratio
    (class A), per-bin mean confidence decimal-routes the
    order-dependent AVG (class B), observed rate is an int ratio
    through the floor kernel, and ECE is an order-free DECIMAL sum of
    8dp-quantized weighted gaps — hash-exact to the last column."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    stops = F.array(*[F.lit(w) for w in _ECE_STOPS])
    p = F.least(
        F.size(F.filter(toks,
                        lambda x: F.array_contains(stops, x))) * 5.0
        / F.greatest(F.size(toks), F.lit(1)),
        F.lit(1.0))
    scored = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        p.alias("p"))
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9))
         .alias("bin_id"), "p", "y")
    agg = (binned.groupBy("bin_id")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.round(F.avg("p").cast("decimal(38,10)"), 6)
                       .cast("double").alias("mean_conf"),
                      round_half_up(
                          F.sum("y") * 1.0 / F.count(F.lit(1)), 6)
                       .alias("obs_rate")))
    w = Window.partitionBy()
    gap = F.abs(F.col("mean_conf") - F.col("obs_rate"))
    gapped = agg.withColumn("gap_raw", gap) \
                .withColumn("n_total",
                            F.sum("n_docs").over(w))
    wterm = round_half_up(
        F.col("gap_raw") * F.col("n_docs") / F.col("n_total"), 8)
    return gapped.select(
        "bin_id", "n_docs", "mean_conf", "obs_rate",
        round_half_up(F.col("gap_raw"), 6).alias("gap"),
        F.round(F.sum(wterm.cast("decimal(38,10)")).over(w), 6)
         .cast("double").alias("ece"))


# ---------------------------------------------------------------------------
# OP-X2 — survivorship: the golden record over a duplicate cluster
# ---------------------------------------------------------------------------

@register(
    "x2_survivorship",
    oracle="""
    WITH clustered AS (
      SELECT p_brand, p_type, p_size, p_partkey, p_name,
             p_retailprice,
             string_split(p_name, ' ')[-1] AS noun
      FROM part
    ),
    modes AS (
      SELECT p_brand, p_type, p_size,
             MIN({'c': -cnt, 'v': noun}).v AS noun_mode
      FROM (SELECT p_brand, p_type, p_size, noun,
                   COUNT(*) AS cnt
            FROM clustered
            GROUP BY p_brand, p_type, p_size, noun)
      GROUP BY p_brand, p_type, p_size
    )
    SELECT c.p_brand, c.p_type, c.p_size,
           COUNT(*) AS n_members,
           MIN(c.p_name) AS golden_name,
           CAST(ROUND(CAST(MAX(c.p_retailprice) AS DECIMAL(38,10)), 2)
                AS DOUBLE) AS best_price,
           MIN(m.noun_mode) AS noun_mode
    FROM clustered c
    JOIN modes m ON m.p_brand = c.p_brand AND m.p_type = c.p_type
                AND m.p_size = c.p_size
    GROUP BY c.p_brand, c.p_type, c.p_size
    HAVING COUNT(*) >= 2
    """,
)
def x2_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 (entity resolution, act two) — SURVIVORSHIP: after
    duplicates are clustered (here: the deterministic blocking key
    (brand, type, size) — the x2_fuzzy/cluster output in a full MDM
    loop), one GOLDEN RECORD is built per cluster by per-field merge
    rules, each a named aggregate: minimum name (stable canonical
    id), maximum retail price (most-favorable-value rule), modal
    container (most-frequent-value rule, tie -> lexicographically
    smallest via the struct-argmin on (-count, value)). Every rule is
    a map-side-combinable aggregate, so the golden-record build is
    two hash aggs on the cluster key — no window over members, no
    driver-side merge; singleton clusters are filtered (nothing to
    merge). Field rules are the MDM staples — the point is each is
    total-ordered (ties broken by value), so the golden record is
    bit-identical under any partitioning."""
    p = _t(spark, sf_dir, "part")
    keys = ["p_brand", "p_type", "p_size"]
    noun = F.element_at(F.split("p_name", " "), -1)
    modes = (p.withColumn("noun", noun)
              .groupBy(*keys, "noun")
              .agg(F.count(F.lit(1)).alias("cnt"))
              .groupBy(*keys)
              .agg(F.min(F.struct((-F.col("cnt")).alias("c"),
                                  F.col("noun").alias("v")))
                    .alias("pk"))
              .select(*keys, F.col("pk.v").alias("noun_mode")))
    return (p.groupBy(*keys)
             .agg(F.count(F.lit(1)).alias("n_members"),
                  F.min("p_name").alias("golden_name"),
                  F.round(F.max("p_retailprice")
                           .cast("decimal(38,10)"), 2)
                   .cast("double").alias("best_price"))
             .filter(F.col("n_members") >= 2)
             .join(modes, keys)
             .select("p_brand", "p_type", "p_size", "n_members",
                     "golden_name", "best_price", "noun_mode"))


# ---------------------------------------------------------------------------
# OP-X5 — video near-dup by frame-fingerprint containment
# ---------------------------------------------------------------------------

@register(
    "x5_video_neardup",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) // 16 AS n_frames
      FROM documents
    ),
    k8 AS (
      SELECT doc_id, text, n_frames,
             greatest(n_frames // 8, 1) AS stride,
             unnest(range(0, 8)) AS k
      FROM t WHERE n_frames > 0
    ),
    fp AS (
      SELECT DISTINCT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(k * stride * 16 + 1,
                                    k * stride * 16 + 17),
                 i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1))
                           AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS cs
      FROM k8 WHERE k * stride < n_frames
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS n_shared
      FROM fp a JOIN fp b
        ON a.cs = b.cs AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.doc_a, s.doc_b, s.n_shared,
           LEAST(sa.n, sb.n) AS n_min,
           (CASE WHEN (s.n_shared * 1.0 / LEAST(sa.n, sb.n)) < 0
                 THEN -FLOOR(ABS(s.n_shared * 1.0 / LEAST(sa.n, sb.n))
                             * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS(s.n_shared * 1.0 / LEAST(sa.n, sb.n))
                            * 1000000.0 + 0.5)
            END / 1000000.0 + 0.0) AS containment
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc_id
    JOIN sizes sb ON s.doc_b = sb.doc_id
    WHERE 2 * s.n_shared >= LEAST(sa.n, sb.n)
    """,
)
def x5_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 (video path, act two) — near-duplicate VIDEOS by frame-
    fingerprint containment: two clips are near-dups when at least
    half of the shorter one's sampled-frame fingerprints appear in the
    other (re-encodes, trims and re-uploads share frames; byte hashes
    don't match across containers, frame fingerprints do). Composes
    the x5_frame_sample fan-out (Arrow mapInPandas, deterministic stub
    fingerprinter standing in for a perceptual hash) with the x2
    inverted-index candidate discipline: pairs come from an EQUALITY
    join on the fingerprint (cost Σ df² over fingerprints), never an
    all-pairs video comparison, and the containment gate is integer
    arithmetic (2·shared >= min) so candidate survival is
    engine-exact. Fingerprints are deduped per video first (≤8 rows
    each — the bounded signature the index stores at 100 TB)."""
    from ..operators.multimodal import frame_sample

    d = _t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    fp = (frame_sample(payloads)
          .select("doc_id", F.col("frame_checksum").alias("cs"))
          .distinct())
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = fp.select(F.col("doc_id").alias("doc_a"), "cs")
    b = fp.select(F.col("doc_id").alias("doc_b"),
                  F.col("cs").alias("cs_b"))
    shared = (a.join(b, (F.col("cs") == F.col("cs_b"))
                     & (F.col("doc_a") < F.col("doc_b")))
               .groupBy("doc_a", "doc_b")
               .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n").alias("nb"))
    n_min = F.least(F.col("na"), F.col("nb"))
    return (shared.join(sa, "doc_a").join(sb, "doc_b")
                  .filter(2 * F.col("n_shared") >= n_min)
                  .select("doc_a", "doc_b", "n_shared",
                          n_min.alias("n_min"),
                          round_half_up(
                              F.col("n_shared") * 1.0 / n_min, 6)
                           .alias("containment")))


# ---------------------------------------------------------------------------
# OP-X8 — curation pipeline v2: dedup -> novelty floor -> group split
# ---------------------------------------------------------------------------

@register(
    "x8_curation_v2",
    oracle=f"""
    WITH surv AS (
      SELECT doc_id, source, text,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
               AS is_surv
      FROM documents
    ),
    toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest({SQL_SHINGLES}) AS gram FROM toks
    ),
    intro AS (
      SELECT gram, MIN(doc_id) AS intro_doc FROM grams GROUP BY gram
    ),
    nov AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             COUNT(CASE WHEN i.intro_doc = g.doc_id THEN 1 END)
               AS n_novel
      FROM grams g JOIN intro i ON g.gram = i.gram
      GROUP BY g.doc_id
    ),
    staged AS (
      SELECT s.doc_id, s.source, s.is_surv,
             s.is_surv AND COALESCE(
               10 * n.n_novel >= 3 * n.n_grams, FALSE) AS ok_novel,
             CASE
               WHEN substr(md5('gsplit' || ':' || s.source), 1, 6)
                    < 'e66666' THEN 'train'
               ELSE 'holdout'
             END AS split,
             COALESCE(len(t.t), 0) AS n_tok
      FROM surv s
      LEFT JOIN nov n ON n.doc_id = s.doc_id
      LEFT JOIN toks t ON t.doc_id = s.doc_id
    )
    SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN is_surv THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_dedup,
           CAST(SUM(CASE WHEN ok_novel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_novelty,
           CAST(SUM(CASE WHEN ok_novel AND split = 'train'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN ok_novel AND split = 'train'
               THEN n_tok ELSE 0 END) AS BIGINT) AS train_tokens
    FROM staged GROUP BY source
    """,
)
def x8_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X8 — the curation funnel, second generation: exact-dedup
    survivors -> 3-gram NOVELTY floor (x4_ngram_novelty's signal as a
    gate: a doc must introduce >=30% of its own 3-grams, filtering
    recombined boilerplate dedup can't see) -> GROUP-aware split
    (x7_group_split's leakage rule at ~90% train by source hash), with
    per-source admitted-token accounting. The point is the
    composition: each signal was verified standalone; this pins that
    they compose in ONE pass over the corpus — every stage is a column
    (flag), never an intermediate materialization, so the funnel
    reads the documents table exactly twice (once for the dedup/token
    pass, once for the gram inventory) regardless of stage count.

    All gates are integer arithmetic (10·novel >= 3·grams; hex-coin
    threshold) — stage survival is engine-exact, and the funnel
    counts are the falsifiable columns."""
    from .sampling import hash_coin, _hex_threshold
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    surv = d.select(
        "doc_id", "source", "text",
        (F.row_number().over(w) == 1).alias("is_surv"))
    grams = (d.select("doc_id",
                      F.explode(shingles_col(tokens_col("text")))
                       .alias("gram")))
    intro = grams.groupBy("gram").agg(F.min("doc_id").alias("intro"))
    nov = (grams.join(intro, "gram")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_grams"),
                     F.count(F.when(F.col("intro") == F.col("doc_id"),
                                    1)).alias("n_novel")))
    staged = (surv.join(nov, "doc_id", "left")
                  .withColumn(
                      "ok_novel",
                      F.col("is_surv")
                      & F.coalesce(10 * F.col("n_novel")
                                   >= 3 * F.col("n_grams"),
                                   F.lit(False)))
                  .withColumn(
                      "split",
                      F.when(hash_coin(F.col("source"), "gsplit")
                             < _hex_threshold(0.90), "train")
                       .otherwise("holdout"))
                  .withColumn("n_tok",
                              F.coalesce(F.size(tokens_col("text")),
                                         F.lit(0))))
    train = F.col("ok_novel") & (F.col("split") == "train")
    return (staged.groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n_total"),
                       F.sum(F.col("is_surv").cast("long"))
                        .alias("n_after_dedup"),
                       F.sum(F.col("ok_novel").cast("long"))
                        .alias("n_after_novelty"),
                       F.sum(train.cast("long")).alias("n_train"),
                       F.sum(F.when(train, F.col("n_tok"))
                              .otherwise(0)).alias("train_tokens")))


# ---------------------------------------------------------------------------
# OP-X4 — Zipf-law fit over the token frequency spectrum
# ---------------------------------------------------------------------------

_ZIPF_K = 256  # head of the spectrum the regression runs over


@register(
    "x4_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKENS}) AS token FROM documents
    ),
    vocab AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
      ORDER BY cnt DESC, token LIMIT {_ZIPF_K}
    ),
    ranked AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token)
                     AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y
      FROM vocab
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           CAST(ROUND(CAST(
             (n * sxy - sx * sy) / (n * sxx - sx * sx)
             AS DECIMAL(38,10)), 4) AS DOUBLE) AS zipf_slope,
           CAST(ROUND(CAST(
             (sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx)))
             / n AS DECIMAL(38,10)), 4) AS DOUBLE) AS log_intercept,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx)
            BETWEEN -2.0 AND -0.5) AS zipf_like
    FROM sums
    """,
)
def x4_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — least-squares fit of the Zipf exponent over the head of
    the token frequency spectrum (log count vs log rank, top 256
    types): natural corpora fit slope ~ -1; template-generated or
    heavily duplicated text bends the spectrum — the cheap
    synthetic-data / corpus-health screen run next to the quality
    gates (and an honest flag on THIS synthetic corpus, whichever way
    it reads).

    Shape: one token explode -> vocab hash agg -> distributed
    TakeOrdered to the literal 256-row head; the regression runs
    entirely over that bounded table as ONE aggregate row — sums of
    products are DECIMAL(38,18)-cast (exact, order-free; the inputs
    are libm logs of identical ints, so identical bits cross-engine)
    then cast back to DOUBLE before the slope algebra (decimal
    MULTIPLICATION would promote scales differently per engine —
    measured: DuckDB promotes to scale 36 and overflows), and the
    slope/intercept divisions round through the decimal route at
    4dp. The zipf_like gate compares the raw decimal ratio, so
    even the boolean is engine-exact."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens_col("text")).alias("token"))
    vocab = (tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.col("cnt").desc(), "token")
                .limit(_ZIPF_K))
    w = Window.orderBy(F.col("cnt").desc(), "token")
    ranked = vocab.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"))
    dec = "decimal(38,18)"
    sums = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double")
         .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double")
         .alias("sxx"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - F.col("sx") * slope) / F.col("n")
    return sums.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope.cast("decimal(38,10)"), 4).cast("double")
         .alias("zipf_slope"),
        F.round(intercept.cast("decimal(38,10)"), 4).cast("double")
         .alias("log_intercept"),
        slope.between(-2.0, -0.5).alias("zipf_like"))


# ---------------------------------------------------------------------------
# OP-X4 — classifier confusion matrix + per-class precision/recall
# ---------------------------------------------------------------------------

@register(
    "x4_lang_confusion",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
             CASE
               WHEN CAST(len(list_filter(toks, x -> x IN
                    ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                    / len(toks) >= 0.08 THEN 'en'
               WHEN len(list_filter(toks, x -> x IN
                    ('der', 'die', 'das', 'und'))) > 0 THEN 'de'
               WHEN len(list_filter(toks, x -> x IN
                    ('le', 'la', 'et', 'les'))) > 0 THEN 'fr'
               WHEN len(list_filter(toks, x -> x IN
                    ('el', 'los', 'las', 'y'))) > 0 THEN 'es'
               ELSE 'und'
             END AS predicted
      FROM t
    ),
    cell AS (
      SELECT lang, predicted, COUNT(*) AS n FROM pred
      GROUP BY lang, predicted
    ),
    m AS (
      SELECT c.lang, c.predicted, c.n,
             SUM(c.n) OVER (PARTITION BY c.lang) AS row_tot,
             SUM(c.n) OVER (PARTITION BY c.predicted) AS col_tot,
             SUM(c.n) OVER () AS grand,
             SUM(CASE WHEN c.lang = c.predicted THEN c.n END)
               OVER () AS diag
      FROM cell c
    )
    SELECT lang, predicted, n,
           {{recall}} AS class_recall,
           {{precision}} AS class_precision,
           {{accuracy}} AS overall_accuracy
    FROM m
    """.format(
        recall=sql_round_half_up("n * 1.0 / row_tot", 6),
        precision=sql_round_half_up("n * 1.0 / col_tot", 6),
        accuracy=sql_round_half_up("COALESCE(diag, 0) * 1.0 / grand",
                                   6),
    ),
)
def x4_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X4 — the confusion matrix for the x4_lang_id_heuristic
    classifier against the labeled lang, with per-cell recall (share
    of the true class landing in this prediction), per-cell precision
    (share of this prediction that is this true class) and overall
    accuracy — the multiclass sibling of x6_ece_report's binary
    reliability audit: before a classifier gates a 100 TB pipeline,
    its error STRUCTURE (which classes it confuses, not just how
    often) has to be on a dashboard. On this synthetic shared-
    vocabulary corpus the matrix honestly shows the heuristic
    collapsing toward en/und — exactly the failure a confusion view
    exists to expose.

    Shape: the classifier runs inside the scan (pure projection), one
    hash agg to the bounded |langs|x|preds| matrix, and every window
    runs over that bounded matrix. All ratios are exact int ratios
    through the class-A floor kernel."""
    stop_en = ("the", "a", "of", "and", "to", "in")
    d = _t(spark, sf_dir, "documents")
    t = d.select("lang", tokens_col("text").alias("toks"))

    def hits(words):
        return F.size(F.filter("toks", lambda x: x.isin(*words)))

    pred = (F.when(hits(stop_en) * F.lit(1.0) / F.size("toks") >= 0.08,
                   "en")
            .when(hits(("der", "die", "das", "und")) > 0, "de")
            .when(hits(("le", "la", "et", "les")) > 0, "fr")
            .when(hits(("el", "los", "las", "y")) > 0, "es")
            .otherwise("und"))
    cell = (t.select("lang", pred.alias("predicted"))
             .groupBy("lang", "predicted")
             .agg(F.count(F.lit(1)).alias("n")))
    row_tot = F.sum("n").over(Window.partitionBy("lang"))
    col_tot = F.sum("n").over(Window.partitionBy("predicted"))
    wg = Window.partitionBy()
    grand = F.sum("n").over(wg)
    diag = F.sum(F.when(F.col("lang") == F.col("predicted"),
                        F.col("n"))).over(wg)
    return cell.select(
        "lang", "predicted", "n",
        round_half_up(F.col("n") * 1.0 / row_tot, 6)
         .alias("class_recall"),
        round_half_up(F.col("n") * 1.0 / col_tot, 6)
         .alias("class_precision"),
        round_half_up(F.coalesce(diag, F.lit(0)) * 1.0 / grand, 6)
         .alias("overall_accuracy"))


# ---------------------------------------------------------------------------
# OP-X9 — length bucketing: the inference-batching padding report
# ---------------------------------------------------------------------------

_LB_BATCH = 8


@register(
    "x9_length_bucketing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len({SQL_TOKENS}) AS n_tok,
             ('0x' || substr(md5('lb:' || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS h
      FROM documents
      WHERE len({SQL_TOKENS}) > 0
    ),
    bucketed AS (
      SELECT doc_id, n_tok, h,
             CAST(FLOOR(ln(CAST(n_tok AS DOUBLE)) / ln(2.0))
                  AS INTEGER) AS bucket
      FROM d
    ),
    batched AS (
      SELECT bucket, n_tok,
             CAST((ROW_NUMBER() OVER (PARTITION BY bucket
                     ORDER BY h, doc_id) - 1) // {_LB_BATCH}
                  AS BIGINT) AS batch_idx
      FROM bucketed
    ),
    per_batch AS (
      SELECT bucket, batch_idx, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS payload_tok,
             MAX(n_tok) AS max_tok
      FROM batched GROUP BY bucket, batch_idx
    )
    SELECT bucket,
           COUNT(*) AS n_batches,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(payload_tok) AS BIGINT) AS payload_tok,
           CAST(SUM(n_docs * max_tok - payload_tok) AS BIGINT)
             AS padding_tok,
           {{eff}} AS batch_efficiency
    FROM per_batch
    GROUP BY bucket
    """.format(eff=sql_round_half_up(
        "SUM(payload_tok) * 1.0 / SUM(n_docs * max_tok)", 6)),
)
def x9_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X9 — LENGTH BUCKETING for inference/training batching: docs
    group into power-of-two length buckets (floor(log2(n_tok))),
    each bucket packs into fixed-size batches in deterministic hash
    order, and the report prices the thing bucketing exists to
    minimize — PADDING (every batch pays batch_size x max_len
    tokens; payload/capacity is the efficiency a serving stack
    watches; without bucketing, mixing a 10-token doc into a
    1000-token batch wastes 99% of its slot). Deterministic end to
    end: the bucket is floor of a log ratio whose operands are
    identical doubles (log2 of an int — the quotient sits far from
    integer boundaries for n <= ~1e6 except exact powers of two,
    where both engines compute ln(2^k)/ln(2) on identical bits),
    batch order is the x9 seeded-hash permutation, and all padding
    arithmetic is exact integers. Shape: one scan, a per-bucket
    row_number window (bounded ~20 buckets x corpus/20 rows — the
    batching step a real loader runs per shard, documented), two
    hash aggs."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.size(tokens_col("text")).alias("n_tok"))
         .filter(F.col("n_tok") > 0)
         .withColumn("h", F.conv(F.substring(
             F.md5(F.concat(F.lit("lb:"),
                            F.col("doc_id").cast("string"))),
             1, 15), 16, 10).cast("long")))
    bucketed = d.withColumn(
        "bucket",
        F.floor(F.log(F.col("n_tok").cast("double"))
                / F.log(F.lit(2.0))).cast("int"))
    wb = Window.partitionBy("bucket").orderBy("h", "doc_id")
    batched = bucketed.withColumn(
        "batch_idx",
        F.floor((F.row_number().over(wb) - 1) / _LB_BATCH)
         .cast("long"))
    per_batch = (batched.groupBy("bucket", "batch_idx")
                        .agg(F.count(F.lit(1)).alias("n_docs"),
                             F.sum("n_tok").alias("payload_tok"),
                             F.max("n_tok").alias("max_tok")))
    return (per_batch.groupBy("bucket")
                     .agg(F.count(F.lit(1)).alias("n_batches"),
                          F.sum("n_docs").alias("n_docs"),
                          F.sum("payload_tok").alias("payload_tok"),
                          F.sum(F.col("n_docs") * F.col("max_tok")
                                - F.col("payload_tok"))
                           .alias("padding_tok"),
                          round_half_up(
                              F.sum("payload_tok") * 1.0
                              / F.sum(F.col("n_docs")
                                      * F.col("max_tok")), 6)
                           .alias("batch_efficiency")))


# ---------------------------------------------------------------------------
# OP-X6 — inter-judge agreement (Cohen's kappa)
# ---------------------------------------------------------------------------

@register(
    "x6_judge_agreement",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks, text FROM documents
    ),
    judged AS (
      SELECT doc_id,
             CASE WHEN CAST(len(list_filter(toks, x -> x IN
                    ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                    / GREATEST(len(toks), 1) >= 0.08
                  THEN 'keep' ELSE 'drop' END AS judge_a,
             CASE WHEN len(toks) >= 20 THEN 'keep' ELSE 'drop' END
               AS judge_b
      FROM t
    ),
    cell AS (
      SELECT judge_a, judge_b, COUNT(*) AS n FROM judged
      GROUP BY judge_a, judge_b
    ),
    sums AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS total,
             CAST(SUM(CASE WHEN judge_a = judge_b THEN n ELSE 0 END)
                  AS DOUBLE) AS agree,
             CAST(SUM(CASE WHEN judge_a = 'keep' THEN n ELSE 0 END)
                  AS DOUBLE) AS a_keep,
             CAST(SUM(CASE WHEN judge_b = 'keep' THEN n ELSE 0 END)
                  AS DOUBLE) AS b_keep
      FROM cell
    )
    SELECT c.judge_a, c.judge_b, c.n,
           {{po}} AS p_observed,
           {{pe}} AS p_expected,
           CAST(ROUND(CAST(
             ((s.agree / s.total)
              - ((s.a_keep / s.total) * (s.b_keep / s.total)
                 + ((s.total - s.a_keep) / s.total)
                   * ((s.total - s.b_keep) / s.total)))
             / NULLIF(1 - ((s.a_keep / s.total) * (s.b_keep / s.total)
                 + ((s.total - s.a_keep) / s.total)
                   * ((s.total - s.b_keep) / s.total)), 0)
             AS DECIMAL(38,10)), 4) AS DOUBLE) AS cohen_kappa
    FROM cell c CROSS JOIN sums s
    """.format(
        po=sql_round_half_up("s.agree / s.total", 6),
        pe=sql_round_half_up(
            "(s.a_keep / s.total) * (s.b_keep / s.total)"
            " + ((s.total - s.a_keep) / s.total)"
            " * ((s.total - s.b_keep) / s.total)", 6),
    ),
)
def x6_judge_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — inter-judge agreement: Cohen's kappa between two
    independent keep/drop judges (a stopword-density judge and a
    length judge) with the full agreement matrix. THE metric for
    "can I trust one LLM-judge, or do my judges only agree by
    chance": raw agreement p_o is meaningless when both judges mostly
    say keep — kappa subtracts the chance agreement p_e implied by
    each judge's marginal keep-rate, which is exactly the correction
    a judged-data pipeline needs before promoting a single judge to a
    gate (the x6_ece/x4_confusion audit family's third member:
    calibration, error structure, agreement).

    Shape: both judges run inside the scan (pure projections), one
    hash agg to the 2x2 matrix, and kappa is arithmetic over four
    exact counts — marginals as identical-bit double ratios, the
    kappa division NULLIF-guarded and decimal-routed at 4dp."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    stops = F.array(*[F.lit(w) for w in
                      ("the", "a", "of", "and", "to", "in")])
    judge_a = F.when(
        F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
        * F.lit(1.0) / F.greatest(F.size(toks), F.lit(1)) >= 0.08,
        "keep").otherwise("drop")
    judge_b = F.when(F.size(toks) >= 20, "keep").otherwise("drop")
    cell = (d.select(judge_a.alias("judge_a"),
                     judge_b.alias("judge_b"))
             .groupBy("judge_a", "judge_b")
             .agg(F.count(F.lit(1)).alias("n")))
    sums = cell.agg(
        F.sum("n").cast("double").alias("total"),
        F.sum(F.when(F.col("judge_a") == F.col("judge_b"),
                     F.col("n")).otherwise(0))
         .cast("double").alias("agree"),
        F.sum(F.when(F.col("judge_a") == "keep", F.col("n"))
               .otherwise(0)).cast("double").alias("a_keep"),
        F.sum(F.when(F.col("judge_b") == "keep", F.col("n"))
               .otherwise(0)).cast("double").alias("b_keep"))
    po = F.col("agree") / F.col("total")
    pe = ((F.col("a_keep") / F.col("total"))
          * (F.col("b_keep") / F.col("total"))
          + ((F.col("total") - F.col("a_keep")) / F.col("total"))
          * ((F.col("total") - F.col("b_keep")) / F.col("total")))
    kappa = (po - pe) / F.nullif(1 - pe, F.lit(0.0))
    from ..functions.scalars import round_half_up as _rhu
    return (cell.crossJoin(F.broadcast(sums))
                .select("judge_a", "judge_b", "n",
                        _rhu(po, 6).alias("p_observed"),
                        _rhu(pe, 6).alias("p_expected"),
                        F.round(kappa.cast("decimal(38,10)"), 4)
                         .cast("double").alias("cohen_kappa")))


# ---------------------------------------------------------------------------
# OP-X2 — blocking-recall report: does the banding catch the true dups?
# ---------------------------------------------------------------------------

#: 1 - (1 - J^r)^b at the J = 0.8 threshold with r = 4 rows x b = 4
#: bands — the S-curve catch probability the banding promises.
_BLOCK_THEORY = 0.8784974492729345


@register(
    "x2_blocking_recall_report",
    oracle=f"""
    WITH {_SQL_JPAIRS},
    shingled AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    mh AS (
      SELECT t1.doc_id, t.i,
             min(md5(CAST(t.i AS VARCHAR) || ':' || t1.shingle)) AS mh
      FROM (SELECT doc_id, unnest(s) AS shingle FROM shingled) t1
      CROSS JOIN range(16) t(i)
      GROUP BY t1.doc_id, t.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
      FROM mh GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    caught AS (
      SELECT COUNT(*) AS n FROM jpairs j
      WHERE EXISTS (SELECT 1 FROM cand c
                    WHERE c.doc_a = j.doc_a AND c.doc_b = j.doc_b)
    )
    SELECT (SELECT COUNT(*) FROM jpairs) AS n_truth,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           caught.n AS n_caught,
           (CASE WHEN (caught.n * 1.0
                       / NULLIF((SELECT COUNT(*) FROM jpairs), 0)) < 0
                 THEN -FLOOR(ABS(caught.n * 1.0
                       / NULLIF((SELECT COUNT(*) FROM jpairs), 0))
                             * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS(caught.n * 1.0
                       / NULLIF((SELECT COUNT(*) FROM jpairs), 0))
                            * 1000000.0 + 0.5)
            END / 1000000.0 + 0.0) AS blocking_recall,
           (CASE WHEN (caught.n * 1.0
                       / NULLIF((SELECT COUNT(*) FROM cand), 0)) < 0
                 THEN -FLOOR(ABS(caught.n * 1.0
                       / NULLIF((SELECT COUNT(*) FROM cand), 0))
                             * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS(caught.n * 1.0
                       / NULLIF((SELECT COUNT(*) FROM cand), 0))
                            * 1000000.0 + 0.5)
            END / 1000000.0 + 0.0) AS candidate_precision,
           {_BLOCK_THEORY!r}::DOUBLE AS theory_catch_at_08
    FROM caught
    """,
)
def x2_blocking_recall_report(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """OP-X2 — the third leg of the dedup observability tripod:
    x2_minhash_estimate_report measures the SIGNATURE's accuracy,
    x3_recall_report measures ANN recall — this measures the
    BLOCKING: of the exact near-dup pairs (Jaccard >= 0.8), what
    fraction does the 4x4 banding actually surface as candidates
    (blocking recall — every miss is a duplicate that SHIPS), and
    what fraction of surfaced candidates are real (candidate
    precision — the rerank bill). The S-curve theory value
    1-(1-J^r)^b at the threshold rides along as a literal so the
    measured recall is read against what the banding PROMISED
    (per-pair catch is Bernoulli in the signature draw; corpus
    recall converges to the curve integrated over the true-J
    distribution, which sits above 0.8 here — so measured >= theory
    is the expected reading, not a tautology).

    Shape: truth pairs come from the inverted-index exact pipeline
    (Σdf² bounded), candidates from the same banding join the
    production dedup runs — the report adds one semi-join and three
    bounded counts on top of relations both pipelines already
    build."""
    truth = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    bands = _portable_bands(_t(spark, sf_dir, "documents"))
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    caught = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    ng = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    from ..functions.scalars import round_half_up as _rhu
    return (nt.crossJoin(nc).crossJoin(ng)
              .select("n_truth", "n_candidates", "n_caught",
                      _rhu(F.col("n_caught") * 1.0
                           / F.nullif(F.col("n_truth"), F.lit(0)), 6)
                       .alias("blocking_recall"),
                      _rhu(F.col("n_caught") * 1.0
                           / F.nullif(F.col("n_candidates"),
                                      F.lit(0)), 6)
                       .alias("candidate_precision"),
                      F.lit(_BLOCK_THEORY).alias("theory_catch_at_08")))


# ---------------------------------------------------------------------------
# OP-X6 — preference-pair construction (the DPO/RLHF data shape)
# ---------------------------------------------------------------------------

@register(
    "x6_preference_pairs",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             len(list_filter({SQL_TOKENS}, x -> x IN
                 ('the', 'a', 'of', 'and', 'to', 'in'))) * 1000
               // GREATEST(len({SQL_TOKENS}), 1) AS score
      FROM documents
    ),
    best AS (
      SELECT source, doc_id AS chosen_id, score AS chosen_score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY score DESC, doc_id) AS rn FROM scored)
      WHERE rn = 1
    ),
    worst AS (
      SELECT source, doc_id AS rejected_id, score AS rejected_score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY score ASC, doc_id) AS rn FROM scored)
      WHERE rn = 1
    )
    SELECT b.source, b.chosen_id, b.chosen_score,
           w.rejected_id, w.rejected_score,
           CAST(b.chosen_score - w.rejected_score AS BIGINT)
             AS score_margin,
           (b.chosen_score > w.rejected_score) AS pair_valid
    FROM best b JOIN worst w ON b.source = w.source
    WHERE b.chosen_id <> w.rejected_id
    """,
)
def x6_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — PREFERENCE-PAIR construction, the DPO/RLHF-data shape:
    per prompt group (source = the stand-in for "responses to one
    prompt"), the highest- and lowest-scored responses become the
    (chosen, rejected) pair, with the score margin carried (margin-
    aware losses weight by it) and degenerate pairs dropped — equal
    scores teach nothing (``pair_valid`` gates; a same-doc pair is
    excluded outright). The scorer here is the deterministic
    stopword-density judge scaled to integer permille, so selection
    and margins are INTEGER-exact — in production the scores arrive
    from a reward model and this exact plan consumes them.

    Shape: score is a scan projection; chosen/rejected are the
    struct-argmin/argmax idiom per group key (map-side partial, no
    per-group sort materialization beyond the agg); the final join is
    group-keyed. One scan, two aggs, one join at any scale."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    stops = F.array(*[F.lit(w) for w in
                      ("the", "a", "of", "and", "to", "in")])
    score = (F.size(F.filter(toks,
                             lambda x: F.array_contains(stops, x)))
             * 1000 / F.greatest(F.size(toks), F.lit(1))
             ).cast("long")
    scored = d.select("doc_id", "source", score.alias("score"))
    best = (scored.groupBy("source")
                  .agg(F.min(F.struct((-F.col("score")).alias("neg"),
                                      F.col("doc_id").alias("id")))
                        .alias("pk"))
                  .select("source", F.col("pk.id").alias("chosen_id"),
                          (-F.col("pk.neg")).cast("long")
                           .alias("chosen_score")))
    worst = (scored.groupBy("source")
                   .agg(F.min(F.struct(F.col("score").alias("s"),
                                       F.col("doc_id").alias("id")))
                         .alias("pk"))
                   .select("source",
                           F.col("pk.id").alias("rejected_id"),
                           F.col("pk.s").cast("long")
                            .alias("rejected_score")))
    return (best.join(worst, "source")
                .filter(F.col("chosen_id") != F.col("rejected_id"))
                .select("source", "chosen_id", "chosen_score",
                        "rejected_id", "rejected_score",
                        (F.col("chosen_score")
                         - F.col("rejected_score")).cast("long")
                         .alias("score_margin"),
                        (F.col("chosen_score")
                         > F.col("rejected_score"))
                         .alias("pair_valid")))


# ---------------------------------------------------------------------------
# OP-X2 — cross-split near-dup contamination (the leakage MEASUREMENT)
# ---------------------------------------------------------------------------

@register(
    "x2_cross_split_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    shingled AS (
      SELECT doc_id, s FROM (SELECT doc_id, {SQL_SHINGLES} AS s
                             FROM toks) WHERE len(s) > 0
    ),
    mh AS (
      SELECT t1.doc_id, t.i,
             min(md5(CAST(t.i AS VARCHAR) || ':' || t1.shingle)) AS mh
      FROM (SELECT doc_id, unnest(s) AS shingle FROM shingled) t1
      CROSS JOIN range(16) t(i)
      GROUP BY t1.doc_id, t.i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY i)) AS band_hash,
             (doc_id % 10 = 7) AS is_eval
      FROM mh GROUP BY doc_id, i // 4
    ),
    hits AS (
      SELECT DISTINCT e.doc_id AS eval_id
      FROM bands e JOIN bands tr
        ON e.band_idx = tr.band_idx AND e.band_hash = tr.band_hash
       AND e.is_eval AND NOT tr.is_eval
    ),
    pop AS (
      SELECT COUNT(DISTINCT CASE WHEN doc_id % 10 = 7
                            THEN doc_id END) AS n_eval,
             COUNT(DISTINCT CASE WHEN doc_id % 10 <> 7
                            THEN doc_id END) AS n_train
      FROM shingled
    )
    SELECT pop.n_eval, pop.n_train,
           (SELECT COUNT(*) FROM hits) AS n_contaminated,
           (CASE WHEN ((SELECT COUNT(*) FROM hits) * 1.0
                       / NULLIF(pop.n_eval, 0)) < 0
                 THEN -FLOOR(ABS((SELECT COUNT(*) FROM hits) * 1.0
                       / NULLIF(pop.n_eval, 0)) * 1000000.0 + 0.5)
                 ELSE FLOOR(ABS((SELECT COUNT(*) FROM hits) * 1.0
                       / NULLIF(pop.n_eval, 0)) * 1000000.0 + 0.5)
            END / 1000000.0 + 0.0) AS contamination_rate,
           ((SELECT COUNT(*) FROM hits) > 0) AS quarantine_needed
    FROM pop
    """,
)
def x2_cross_split_contamination(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """OP-X2 — NEAR-duplicate contamination ACROSS a train/eval split:
    the fraction of eval documents with a banded MinHash collision
    against any train document. x4_decontaminate catches verbatim
    n-gram overlap; paraphrased or lightly-edited leakage slips that
    net and THIS one — the banding that powers dedup pointed across
    the split boundary — is the standard second check (and the
    measured justification for x7_group_split: a doc-keyed split of a
    correlated corpus lights this metric up). The split here is the
    deterministic doc_id % 10 = 7 eval slice, so the oracle replays
    membership exactly.

    Shape: ONE banding pass over the whole corpus (the same relation
    the dedup pipeline already builds — the split tag rides along as
    a column), one band-equality join restricted eval-vs-train (no
    all-pairs, no second pass), bounded count aggs. Rate is an exact
    int ratio; the quarantine flag is the actionable output."""
    bands = (_portable_bands(_t(spark, sf_dir, "documents"))
             .withColumn("is_eval", F.col("doc_id") % 10 == 7))
    e = bands.filter(F.col("is_eval")).alias("e")
    tr = bands.filter(~F.col("is_eval")).alias("t")
    hits = (e.join(tr, (F.col("e.band_idx") == F.col("t.band_idx"))
                   & (F.col("e.band_hash") == F.col("t.band_hash")))
             .select(F.col("e.doc_id").alias("eval_id"))
             .distinct())
    pop = (bands.select("doc_id", "is_eval").distinct()
                .agg(F.sum(F.when(F.col("is_eval"), 1).otherwise(0))
                      .cast("long").alias("n_eval"),
                     F.sum(F.when(~F.col("is_eval"), 1).otherwise(0))
                      .cast("long").alias("n_train")))
    nh = hits.agg(F.count(F.lit(1)).alias("n_contaminated"))
    from ..functions.scalars import round_half_up as _rhu
    return (pop.crossJoin(F.broadcast(nh))
               .select("n_eval", "n_train", "n_contaminated",
                       _rhu(F.col("n_contaminated") * 1.0
                            / F.nullif(F.col("n_eval"), F.lit(0)), 6)
                        .alias("contamination_rate"),
                       (F.col("n_contaminated") > 0)
                        .alias("quarantine_needed")))


# ---------------------------------------------------------------------------
# OP-X3 — OOD scoring: distance-to-centroid outlier detection
# ---------------------------------------------------------------------------

@register(
    "x3_ood_score",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
      WHERE sqrt({_sql_dot('e', 'e')}) > 0
    ),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    best AS (
      SELECT vec_id, cid, cos FROM (
        SELECT n.vec_id, cent.cid,
               {_sql_dot('n.e', 'cent.ce')} / (n.nrm * cent.cnrm)
                 AS cos,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ),
    scored AS (
      SELECT vec_id, cid AS nearest_cell, 1.0 - cos AS ood_raw
      FROM best
    ),
    th AS (
      SELECT quantile_cont(ood_raw, 0.95) AS q95 FROM scored
    )
    SELECT s.vec_id, s.nearest_cell,
           {{ood6}} AS ood_score,
           (s.ood_raw > th.q95) AS is_outlier,
           {{q6}} AS threshold_q95
    FROM scored s CROSS JOIN th
    """.format(ood6=sql_round_half_up("s.ood_raw", 6),
               q6=sql_round_half_up("th.q95", 6)),
)
def x3_ood_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X3 — out-of-distribution scoring: each vector's cosine
    distance to its nearest coarse centroid (the SAME frozen K_COARSE
    hash-rank centroids the IVF index uses — the OOD monitor rides
    the index's own geometry for free), flagged against the corpus's
    own 95th-percentile distance. The serving guardrail in front of
    any embedding consumer: a query far from every cell either gets
    routed to a fallback or logged for drift review (the a23 monitor
    for the vector side of the house).

    Determinism: distances are the identical-bit class-A folds of the
    x3 family; the threshold is an exact-interpolation quantile over
    identical doubles (both engines' continuous quantile on the same
    sorted set — identical lo/hi at identical ranks, identical
    (n−1)·p frac), and the flag compares raw identicals. Shape: the
    IVF assignment broadcast join (N x K, linear) + the p95 as the
    bucketed-exact rank lookup (operators/staircase.py) — a GLOBAL
    ``percentile()`` would buffer one score per corpus vector in ONE
    aggregator, the r8-verdict weak mark this clears. ood_raw is a
    double in [0, 2], so the band is the fixed-width
    ``double_value_bucket`` at scale 4096 (≤ 8193 buckets — bounded
    by the value DOMAIN, not N); only the one band holding the p95
    rank sorts its own rows (~N/4096 through one task). The scored
    relation feeds the lookup (3 passes) plus the output join, so it
    checkpoints once (the CLAUDE.md multi-consumed-expensive rule —
    its lineage is the N×32 broadcast fold + struct-min agg);
    the argmin is the struct-min idiom."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
            .select(F.col("vec_id").alias("cid"),
                    F.col("e").alias("ce"),
                    F.col("nrm").alias("cnrm")))
    scored = (n.repartition(spark.sparkContext.defaultParallelism,
                            "vec_id")
               .crossJoin(F.broadcast(cent)))
    neg = -(_dot(F.col("e"), F.col("ce"))
            / (F.col("nrm") * F.col("cnrm")))
    from ..operators.checkpoint import ckpt
    best = ckpt(scored.groupBy("vec_id")
                      .agg(F.min(F.struct(neg.alias("negcos"),
                                          F.col("cid"))).alias("b"))
                      .select("vec_id",
                              F.col("b.cid").alias("nearest_cell"),
                              (1.0 + F.col("b.negcos"))
                               .alias("ood_raw")))
    from ..operators.staircase import (bucketed_exact_quantiles,
                                       double_value_bucket)
    th = (bucketed_exact_quantiles(
              best.select("ood_raw"), [], "ood_raw", [0.95],
              bucket=double_value_bucket(F.col("ood_raw"), 4096.0))
          .select(F.col("q0").alias("q95")))
    from ..functions.scalars import round_half_up as _rhu
    return (best.crossJoin(F.broadcast(th))
                .select("vec_id", "nearest_cell",
                        _rhu(F.col("ood_raw"), 6).alias("ood_score"),
                        (F.col("ood_raw") > F.col("q95"))
                         .alias("is_outlier"),
                        _rhu(F.col("q95"), 6).alias("threshold_q95")))


# ---------------------------------------------------------------------------
# OP-X5 — VAD trim: voiced-run detection over sampled frames
# ---------------------------------------------------------------------------

@register(
    "x5_vad_trim",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) // 16 AS n_frames
      FROM documents
    ),
    k8 AS (
      SELECT doc_id, text, n_frames,
             greatest(n_frames // 8, 1) AS stride,
             unnest(range(0, 8)) AS k
      FROM t WHERE n_frames > 0
    ),
    fr AS (
      SELECT doc_id, CAST(k AS INTEGER) AS pos,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(k * stride * 16 + 1,
                                    k * stride * 16 + 17),
                 i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1))
                           AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS energy
      FROM k8 WHERE k * stride < n_frames
    ),
    voiced AS (
      SELECT doc_id, pos, energy,
             (energy % 4 <> 0) AS is_voiced
      FROM fr
    ),
    runs AS (
      SELECT doc_id, pos - ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY pos) AS grp,
             COUNT(*) OVER (PARTITION BY doc_id) AS dummy
      FROM voiced WHERE is_voiced
    ),
    islands AS (
      SELECT doc_id, COUNT(*) AS run_len
      FROM runs GROUP BY doc_id, grp
    )
    SELECT v.doc_id,
           COUNT(*) AS n_frames,
           CAST(SUM(CASE WHEN v.is_voiced THEN 1 ELSE 0 END)
                AS BIGINT) AS n_voiced,
           CAST(MIN(CASE WHEN v.is_voiced THEN v.pos END)
                AS INTEGER) AS trim_start,
           CAST(MAX(CASE WHEN v.is_voiced THEN v.pos END)
                AS INTEGER) AS trim_end,
           CAST(COALESCE((SELECT MAX(run_len) FROM islands i
                          WHERE i.doc_id = v.doc_id), 0) AS BIGINT)
             AS longest_voiced_run
    FROM voiced v GROUP BY v.doc_id
    """,
)
def x5_vad_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X5 (audio path) — voice-activity trimming over sampled
    frames: per-frame "energy" (the deterministic stub fingerprint
    standing in for RMS over decoded samples — swap one function for
    a real decoder, the x5 contract) gates frames voiced/silent, and
    the report carries what an audio-curation pipeline trims and
    filters by: leading/trailing silence bounds (trim_start/end),
    voiced density, and the LONGEST continUOUS voiced run (w8's
    gaps-and-islands applied to frame positions — clips whose longest
    run is sub-second are noise, the standard VAD-based quality
    gate).

    Shape: the frame fan-out is the Arrow mapInPandas path (no
    shuffle), islands cost one per-doc window over <=8 frame rows,
    and every output is integer-exact (the energy gate is a modular
    test on the integer fingerprint — deterministic in both
    engines)."""
    from ..operators.multimodal import frame_sample

    d = _t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    fr = (frame_sample(payloads)
          .select("doc_id",
                  (F.col("frame_idx")
                   / F.greatest(F.floor(F.col("n_frames") / 8),
                                F.lit(1))).cast("int").alias("pos"),
                  F.col("frame_checksum").alias("energy")))
    voiced = fr.withColumn("is_voiced", F.col("energy") % 4 != 0)
    runs = (voiced.filter(F.col("is_voiced"))
                  .withColumn(
                      "grp",
                      F.col("pos") - F.row_number().over(
                          Window.partitionBy("doc_id")
                                .orderBy("pos"))))
    islands = (runs.groupBy("doc_id", "grp")
                   .agg(F.count(F.lit(1)).alias("run_len"))
                   .groupBy("doc_id")
                   .agg(F.max("run_len").alias("longest")))
    base = (voiced.groupBy("doc_id")
                  .agg(F.count(F.lit(1)).alias("n_frames"),
                       F.sum(F.when(F.col("is_voiced"), 1)
                              .otherwise(0)).cast("long")
                        .alias("n_voiced"),
                       F.min(F.when(F.col("is_voiced"),
                                    F.col("pos"))).cast("int")
                        .alias("trim_start"),
                       F.max(F.when(F.col("is_voiced"),
                                    F.col("pos"))).cast("int")
                        .alias("trim_end")))
    return (base.join(islands, "doc_id", "left")
                .select("doc_id", "n_frames", "n_voiced",
                        "trim_start", "trim_end",
                        F.coalesce("longest", F.lit(0)).cast("long")
                         .alias("longest_voiced_run")))


# ---------------------------------------------------------------------------
# X4 — per-document keyword extraction (integer-scaled tf-idf top-5, r8)
# ---------------------------------------------------------------------------

@register(
    "x4_keyword_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    scored AS (
      SELECT t.doc_id, t.token, t.tf,
             CAST(t.tf * FLOOR((SELECT COUNT(*) FROM documents)
                               * 1000000.0 / d.df) AS BIGINT)
               AS score
      FROM tf t JOIN df d USING (token)
    )
    SELECT doc_id, token, tf, score,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
)
def x4_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — per-document KEYWORD EXTRACTION: the top-5 terms of each
    document by an integer-scaled tf·idf score — the lightweight
    tagging pass a corpus pipeline runs to build facet indexes and
    dedup blocking keys (x2's fuzzy/blocking families consume exactly
    such keys). x4_tfidf ranks globally; this ranks WITHIN each doc.

    Integer-scaled on purpose: idf_s = floor(N·10⁶ / df) and
    score = tf · idf_s are pure BIGINT functions of exact counts
    (the float division is a correctly-rounded quotient of exact
    longs, identical in both engines, floored immediately — the
    class-A int-ratio argument), so the (score desc, token) rank
    order carries NO float-noise tie hazard the way a raw
    ln(N/df)·tf ranking would (1-ulp ln noise flips equal-score
    neighbors). Monotone in df for fixed tf like true idf; the
    ordering differs from ln-idf only across (tf, df) trade-offs far
    from ties. Shape: explode → two map-side-combinable aggs, a
    broadcast-sized df table joined back, one rank window per doc
    (unbounded key ✓)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(tokens_col("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("_nd"))
    scored = (tf.join(dfreq, "token")
                .crossJoin(F.broadcast(n_docs))
                .select("doc_id", "token", "tf",
                        (F.col("tf")
                         * F.floor(F.col("_nd") * 1000000.0
                                   / F.col("df")))
                        .cast("long").alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(),
                                             "token")
    return (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 5)
                  .select("doc_id", "token", "tf", "score",
                          F.col("rn").cast("long").alias("rank")))


# ---------------------------------------------------------------------------
# X6 — precision/recall threshold sweep (the PR curve, r8)
# ---------------------------------------------------------------------------

_PR_THRESHOLDS = [-0.3, -0.2, -0.1, 0.0, 0.1, 0.2, 0.3]
_PR_SQL_TH = "VALUES " + ", ".join(
    f"({repr(t)}::DOUBLE)" for t in _PR_THRESHOLDS)


@register(
    "x6_pr_curve",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS score,
             (label >= 5) AS y
      FROM embeddings
    ),
    th(t) AS ({_PR_SQL_TH}),
    cm AS (
      SELECT th.t,
             CAST(SUM(CASE WHEN score >= th.t AND y
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN score >= th.t AND NOT y
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN score < th.t AND y
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN score < th.t AND NOT y
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM pts, th GROUP BY th.t
    )
    SELECT t AS threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 THEN
             {sql_round_half_up('tp * 1.0 / (tp + fp)', 6)} END
             AS precision,
           CASE WHEN tp + fn > 0 THEN
             {sql_round_half_up('tp * 1.0 / (tp + fn)', 6)} END
             AS recall,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
             {sql_round_half_up('2.0 * tp / (2 * tp + fp + fn)', 6)}
             END AS f1
    FROM cm
    """,
)
def x6_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — the PRECISION/RECALL THRESHOLD SWEEP: confusion counts +
    precision/recall/F1 at 7 operating points of a scalar classifier
    score — the curve every filtering-model deployment reads before
    picking its production threshold (x6_ece_report checks the
    score's CALIBRATION; this picks the CUTOFF; the two together are
    the eval loop of the x6 classification family). Score = the raw
    first embedding component (a deterministic stand-in for a model
    logit — no arithmetic, so not even 1 ulp of cross-engine noise),
    labels binarized at >= 5.

    Shape: ONE scan, a 7-row literal threshold dim cross-joined
    (each row evaluates all 7 thresholds map-side), a 7-row agg —
    the sweep costs one pass regardless of how many operating points
    are on the curve. All metrics are integer ratios (class-A floor
    kernel), NULL-guarded where a degenerate threshold empties a
    denominator."""
    e = _t(spark, sf_dir, "embeddings")
    from ..sources.tables import values_df
    pts = e.select(
        F.element_at(_as_double_vec("embedding"), 1).alias("score"),
        (F.col("label") >= 5).alias("y"))
    th = values_df(spark, [(t,) for t in _PR_THRESHOLDS], "t double")
    pred = F.col("score") >= F.col("t")
    cm = (pts.crossJoin(F.broadcast(th))
             .groupBy("t")
             .agg(F.sum(F.when(pred & F.col("y"), 1).otherwise(0))
                   .cast("long").alias("tp"),
                  F.sum(F.when(pred & ~F.col("y"), 1).otherwise(0))
                   .cast("long").alias("fp"),
                  F.sum(F.when(~pred & F.col("y"), 1).otherwise(0))
                   .cast("long").alias("fn"),
                  F.sum(F.when(~pred & ~F.col("y"), 1).otherwise(0))
                   .cast("long").alias("tn")))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cm.select(
        F.col("t").alias("threshold"), "tp", "fp", "fn", "tn",
        F.when(tp + fp > 0,
               round_half_up(tp * 1.0 / (tp + fp), 6))
         .alias("precision"),
        F.when(tp + fn > 0,
               round_half_up(tp * 1.0 / (tp + fn), 6))
         .alias("recall"),
        F.when(2 * tp + fp + fn > 0,
               round_half_up(2.0 * tp / (2 * tp + fp + fn), 6))
         .alias("f1"))


# ---------------------------------------------------------------------------
# X8 — curation funnel v3: quality gate → exact lang quota →
# curriculum shards (r8 — composes this round's sampling/ranking ops)
# ---------------------------------------------------------------------------

@register(
    "x8_curation_v3",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {SQL_TOKENS} AS toks,
             substr(md5('q3' || ':' || CAST(doc_id AS VARCHAR)),
                    1, 6) AS coin
      FROM documents
    ),
    q AS (
      SELECT doc_id, lang, coin, len(toks) AS n_tok,
             (len(toks) >= 20
              AND CAST(len(list_filter(toks, x -> x IN
                  ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                  / len(toks) BETWEEN 0.05 AND 0.6) AS ok_q
      FROM t
    ),
    ranked AS (
      SELECT *,
             CASE WHEN ok_q THEN ROW_NUMBER() OVER (
               PARTITION BY lang, ok_q ORDER BY coin, doc_id) END
               AS qrn,
             CASE WHEN ok_q THEN COUNT(*) OVER (
               PARTITION BY lang, ok_q) END AS qn
      FROM q
    ),
    kept AS (
      SELECT *, (ok_q AND qrn <= (qn + 1) // 2) AS ok_quota
      FROM ranked
    ),
    sharded AS (
      SELECT *,
             CASE WHEN ok_quota THEN
               ((ROW_NUMBER() OVER (PARTITION BY ok_quota
                   ORDER BY n_tok, doc_id) - 1) * 4)
               // (COUNT(*) OVER (PARTITION BY ok_quota)) END
               AS shard
      FROM kept
    )
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN ok_q THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality,
           CAST(SUM(CASE WHEN ok_quota THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quota,
           CAST(SUM(CASE WHEN ok_quota AND shard = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_shard0,
           CAST(SUM(CASE WHEN ok_quota AND shard = 1
                THEN 1 ELSE 0 END) AS BIGINT) AS n_shard1,
           CAST(SUM(CASE WHEN ok_quota AND shard = 2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_shard2,
           CAST(SUM(CASE WHEN ok_quota AND shard = 3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_shard3
    FROM sharded GROUP BY lang
    """,
)
def x8_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — curation funnel v3, composing this round's operators into
    the shape a training run actually consumes: (1) the x4 quality
    gate (≥ 20 tokens, stopword ratio in [0.05, 0.6]), (2) an EXACT
    50% per-language quota over survivors (x7_stratified_quota's coin
    rank — budget contracts, not in-expectation rates), (3) the
    curriculum cut (x9_curriculum_shards' easiest→hardest global rank
    into 4 shards). Reported per language: the funnel counts plus the
    shard mix — the at-a-glance answer to "what does each language
    contribute to each curriculum phase?" (v2 reports dedup/novelty/
    split by source; v3 reports quality/quota/curriculum by
    language — the two dashboards a curation review reads together).

    Both exact ranks run as the two-level staircase (coin-prefix
    buckets within language; (n_tok, 8192-doc-block) buckets
    globally); quota and shard cuts are pure integer arithmetic.
    The oracle's window form is the semantic spec; the engine plan
    never partitions a window on the bounded lang key or globally."""
    d = _t(spark, sf_dir, "documents")
    from ..plans.sampling import hash_coin
    toks = tokens_col("text")
    stop = F.size(F.filter(
        toks, lambda x: x.isin("the", "a", "of", "and", "to", "in")))
    q = d.select(
        "doc_id", "lang",
        hash_coin(F.col("doc_id"), "q3").alias("coin"),
        F.size(toks).alias("n_tok"),
        ((F.size(toks) >= 20)
         & (stop.cast("double") / F.size(toks))
         .between(0.05, 0.6)).alias("ok_q"))
    from ..operators.checkpoint import ckpt
    from ..operators.staircase import bucketed_row_number
    q = ckpt(q)  # three downstream consumers re-tokenize otherwise
    qdocs = q.filter(F.col("ok_q"))
    qn = qdocs.groupBy("lang").agg(F.count(F.lit(1)).alias("_qn"))
    quota = (bucketed_row_number(
        qdocs.withColumn("_cb", F.substring("coin", 1, 2)),
        ["lang"], ["_cb"], [F.col("_cb")],
        [F.col("coin"), F.col("doc_id")], out="_qrn")
        .join(F.broadcast(qn), "lang")
        .filter(F.col("_qrn") <= (F.col("_qn") + 1) / 2)
        .select("doc_id"))
    # quota/shard relations are DATA-sized (half the corpus) — join
    # on doc_id co-partitioned, never broadcast
    kept = q.join(quota.select(
        "doc_id", F.lit(True).alias("ok_quota")), "doc_id", "left")
    surv = kept.filter(F.col("ok_quota"))
    ns = surv.agg(F.count(F.lit(1)).alias("_n"))
    sharded = (bucketed_row_number(
        surv.withColumn("_ckb", F.floor(F.col("doc_id") / 8192)),
        [], ["n_tok", "_ckb"], [F.col("n_tok"), F.col("_ckb")],
        [F.col("doc_id")], out="_rn")
        .crossJoin(F.broadcast(ns))
        .select("doc_id",
                F.expr("((_rn - 1) * 4) div _n").alias("shard")))
    full = kept.join(sharded, "doc_id", "left")
    agg = [F.count(F.lit(1)).alias("n_total"),
           F.sum(F.when(F.col("ok_q"), 1).otherwise(0)).cast("long")
            .alias("n_quality"),
           F.sum(F.when(F.col("ok_quota"), 1).otherwise(0))
            .cast("long").alias("n_quota")]
    for k in range(4):
        agg.append(
            F.sum(F.when(F.col("ok_quota") & (F.col("shard") == k),
                         1).otherwise(0)).cast("long")
             .alias(f"n_shard{k}"))
    return full.groupBy("lang").agg(*agg)


# ---------------------------------------------------------------------------
# X4 — collocation mining via integer-scaled PMI (r8)
# ---------------------------------------------------------------------------

@register(
    "x4_collocations_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ),
    cb AS (
      SELECT w1, w2, COUNT(*) AS c_xy FROM big GROUP BY 1, 2
    ),
    cu AS (
      SELECT w1 AS w, COUNT(*) AS c FROM big GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM big),
    scored AS (
      SELECT cb.w1, cb.w2, cb.c_xy,
             CAST(c_xy * FLOOR(n * 1000000.0 / (u1.c * u2.c))
                  AS BIGINT) AS pmi_score
      FROM cb
      JOIN cu u1 ON cb.w1 = u1.w
      JOIN cu u2 ON cb.w2 = u2.w
      CROSS JOIN tot
      WHERE c_xy >= 5
    )
    SELECT w1, w2, c_xy, pmi_score
    FROM scored
    ORDER BY pmi_score DESC, w1, w2
    LIMIT 20
    """,
)
def x4_collocations_pmi(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    """X4 — COLLOCATION mining: the 20 adjacent-token pairs most
    associated by (integer-scaled) pointwise mutual information,
    support-thresholded at 5 — the phrase-detection pass tokenizer
    and n-gram-vocabulary pipelines run ("new york" should be one
    unit), sitting beside x4_bigram_lm (which scores SEQUENCES with
    these counts) and x4_ngram_novelty (which tracks their first
    appearance).

    Integer-scaled PMI on purpose: score = c(xy)·floor(N·10⁶ /
    (c(x)·c(y))) is a pure BIGINT function of exact counts —
    monotone with the PMI ratio at fixed c(xy) and free of the
    ln-noise rank-tie hazard (the x4_keyword_topk argument); the
    support floor kills the degenerate hapax pairs that dominate raw
    PMI. Shape: one explode (positional zip via slice-free
    lag-within-doc), two map-side-combinable aggs, broadcast unigram
    join, global TakeOrdered top-20."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col("text").alias("t"))
    big = toks.select(
        "doc_id",
        F.explode(F.arrays_zip(
            F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
            F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0)))))
         .alias("p")).select(F.col("p.0").alias("w1"),
                             F.col("p.1").alias("w2"))
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    cu = big.groupBy(F.col("w1").alias("w")).agg(
        F.count(F.lit(1)).alias("c"))
    tot = big.agg(F.count(F.lit(1)).alias("n"))
    # the unigram table is VOCABULARY-sized — joined plainly so AQE
    # broadcasts it at small SFs but a 100 TB vocab shuffles on the
    # word key instead of flooring the driver
    scored = (cb.filter(F.col("c_xy") >= 5)
                .join(cu.withColumnRenamed("w", "w1")
                        .withColumnRenamed("c", "c1"), "w1")
                .join(cu.select(F.col("w").alias("w2"),
                                F.col("c").alias("c2")), "w2")
                .crossJoin(F.broadcast(tot))
                .select("w1", "w2", "c_xy",
                        (F.col("c_xy")
                         * F.floor(F.col("n") * 1000000.0
                                   / (F.col("c1") * F.col("c2"))))
                        .cast("long").alias("pmi_score")))
    return (scored.orderBy(F.col("pmi_score").desc(), "w1", "w2")
                  .limit(20))


# ---------------------------------------------------------------------------
# X6 — weak-supervision label model (majority vote diagnostics, r8)
# ---------------------------------------------------------------------------

@register(
    "x6_weak_labels_vote",
    oracle=f"""
    WITH lf AS (
      SELECT doc_id, lang,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS lf_len,
             CASE WHEN len({SQL_TOKENS}) > 0
                   AND CAST(len(list_filter({SQL_TOKENS}, x -> x IN
                       ('the', 'a', 'of', 'and', 'to', 'in')))
                       AS DOUBLE) / len({SQL_TOKENS})
                       BETWEEN 0.05 AND 0.6
                  THEN 1 ELSE 0 END AS lf_stop,
             CASE WHEN strlen(text) > 0
                   AND CAST(strlen(regexp_replace(text,
                       '[^0-9]', '', 'g')) AS DOUBLE) / strlen(text)
                       < 0.2
                  THEN 1 ELSE 0 END AS lf_digit
      FROM documents
    ),
    voted AS (
      SELECT *, (lf_len + lf_stop + lf_digit >= 2) AS vote
      FROM lf
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN vote THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep,
           {sql_round_half_up(
               'SUM(CASE WHEN (lf_len = 1) = vote THEN 1 ELSE 0 '
               'END) * 1.0 / COUNT(*)', 6)} AS lf_len_agreement,
           {sql_round_half_up(
               'SUM(CASE WHEN (lf_stop = 1) = vote THEN 1 ELSE 0 '
               'END) * 1.0 / COUNT(*)', 6)} AS lf_stop_agreement,
           {sql_round_half_up(
               'SUM(CASE WHEN (lf_digit = 1) = vote THEN 1 ELSE 0 '
               'END) * 1.0 / COUNT(*)', 6)} AS lf_digit_agreement
    FROM voted GROUP BY lang
    """,
)
def x6_weak_labels_vote(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    """X6 — WEAK SUPERVISION by majority vote: three deterministic
    labeling functions (length ≥ 200 chars, stopword ratio in the
    x4 quality band, digit ratio < 0.2) vote keep/drop per document,
    and the report gives each LF's agreement rate with the majority
    per language — the Snorkel-style label-model diagnostic a
    filtering pipeline reads to find the LF that is out of line
    before trusting the ensemble (x6_judge_agreement computes the
    pairwise-kappa version for TWO judges; this is the n-of-3
    ensemble form).

    Determinism: every LF is integer comparisons on exact counts
    (the ratio compares are correctly-rounded quotients of exact
    ints vs literals — the x8 gate argument); the vote is integer
    addition; agreements are class-A ratios. Shape: one scan → one
    bounded lang agg; tokenization is the single expensive
    expression and evaluates once per row."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    nstop = F.size(F.filter(
        toks, lambda x: x.isin("the", "a", "of", "and", "to", "in")))
    ntok = F.size(toks)
    ndig = F.length(F.regexp_replace("text", "[^0-9]", ""))
    lf = d.select(
        "lang",
        F.when(F.col("n_chars") >= 200, 1).otherwise(0)
         .alias("lf_len"),
        F.when((ntok > 0)
               & (nstop.cast("double") / ntok).between(0.05, 0.6),
               1).otherwise(0).alias("lf_stop"),
        F.when((F.length("text") > 0)
               & (ndig.cast("double") / F.length("text") < 0.2),
               1).otherwise(0).alias("lf_digit"))
    voted = lf.withColumn(
        "vote",
        (F.col("lf_len") + F.col("lf_stop") + F.col("lf_digit"))
        >= 2)
    from ..functions.scalars import round_half_up as _rhu

    def agr(c: str) -> F.Column:
        return _rhu(
            F.sum(F.when((F.col(c) == 1) == F.col("vote"), 1)
                   .otherwise(0)) * 1.0 / F.count(F.lit(1)), 6)

    return (voted.groupBy("lang")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum(F.when(F.col("vote"), 1).otherwise(0))
                       .cast("long").alias("n_keep"),
                      agr("lf_len").alias("lf_len_agreement"),
                      agr("lf_stop").alias("lf_stop_agreement"),
                      agr("lf_digit").alias("lf_digit_agreement")))


# ---------------------------------------------------------------------------
# X3 — recall@k curve: int8 index vs float exact truth (r8)
# ---------------------------------------------------------------------------

@register(
    "x3_recall_curve",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e,
             sqrt({_sql_dot('e', 'e')}) AS nrm,
             list_max(list_transform(e, x -> abs(x))) AS mx
      FROM v
      WHERE sqrt({_sql_dot('e', 'e')}) > 0
        AND list_max(list_transform(e, x -> abs(x))) > 0
    ),
    q8 AS (
      SELECT vec_id, nrm, mx,
             list_transform(e, x ->
               CAST(floor(x * 127.0 / mx + 0.5) AS INT)) AS qv,
             e
      FROM n
    ),
    qry AS (
      SELECT * FROM q8 {_sql_hash_sample(_H_QUERY, 32)}
    ),
    ftop AS (
      SELECT query_id, neighbor_id, rn AS frn FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                 {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) DESC,
                 b.vec_id) AS rn
        FROM qry a JOIN q8 b ON a.vec_id <> b.vec_id
      ) WHERE rn <= 10
    ),
    itop AS (
      SELECT query_id, neighbor_id, rn AS irn FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                 {_sql_dot('a.qv', 'b.qv')} * a.mx * b.mx
                 / (16129.0 * a.nrm * b.nrm) DESC,
                 b.vec_id) AS rn
        FROM qry a JOIN q8 b ON a.vec_id <> b.vec_id
      ) WHERE rn <= 10
    ),
    ks(k) AS (VALUES (1), (3), (10)),
    hits AS (
      -- COUNT(frn), not COUNT(*): a k with ZERO float∩int8 overlap
      -- leaves one null-extended row per k, which must count as 0 to
      -- match the engine's F.count("query_id") (ADVICE r8)
      SELECT ks.k,
             CAST(COUNT(frn) AS BIGINT) AS overlap_sum
      FROM ks
      LEFT JOIN (ftop JOIN itop USING (query_id, neighbor_id))
        ON frn <= ks.k AND irn <= ks.k
      GROUP BY ks.k
    ),
    nq AS (SELECT COUNT(DISTINCT query_id) AS n_queries FROM ftop)
    SELECT CAST(k AS BIGINT) AS k, n_queries, overlap_sum,
           {sql_round_half_up('overlap_sum * 1.0 / (n_queries * k)',
                              6)} AS recall_at_k
    FROM hits, nq
    """,
)
def x3_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — the RECALL@k CURVE of the int8-quantized index against
    float exact truth at k in (1, 3, 10): the eval every index
    deployment publishes before flipping traffic (the x3 family's
    per-query recall referees judge single operating points; this is
    the curve, and both sides are fully oracle-replayed rather than
    engine-asserted booleans — unusual for ANN evals, possible here
    because the int8 scheme is integer-exact and float cosine ranks
    are tie-broken on vec_id, the x3_int8_topk argument).

    Cost shape: the 32-query batch is hash-rank-selected (constant,
    N-independent — the K_COARSE discipline), so both scoring passes
    are O(32·N) scans with broadcast query sides, never all-pairs;
    recall sums are pure integers and the means class-A ratios."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .withColumn("mx", F.array_max(
              F.transform("e", lambda x: F.abs(x))))
          .filter((F.col("nrm") > 0) & (F.col("mx") > 0)))
    q8 = n.withColumn(
        "qv",
        F.transform("e", lambda x: F.floor(x * 127.0 / F.col("mx")
                                           + 0.5).cast("int")))
    qry = (_hash_sample(q8, 32, _H_QUERY)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("e").alias("qe"), F.col("qv").alias("qqv"),
                   F.col("nrm").alias("qnrm"),
                   F.col("mx").alias("qmx")))

    def topk(score, out):
        w = Window.partitionBy("query_id").orderBy(
            score.desc(), F.col("vec_id"))
        return (q8.crossJoin(F.broadcast(qry))
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 10)
                  .select("query_id",
                          F.col("vec_id").alias("neighbor_id"),
                          F.col("rn").alias(out)))

    fcos = _dot(F.col("qe"), F.col("e")) / (F.col("qnrm")
                                            * F.col("nrm"))
    icos = (_dot(F.col("qqv"), F.col("qv")) * F.col("qmx")
            * F.col("mx") / (16129.0 * F.col("qnrm") * F.col("nrm")))
    ftop = topk(fcos, "frn")
    itop = topk(icos, "irn")
    from ..sources.tables import values_df
    ks = values_df(spark, [(1,), (3,), (10,)], "k int")
    both = ftop.join(itop, ["query_id", "neighbor_id"])
    hits = (ks.join(both,
                    (F.col("frn") <= F.col("k"))
                    & (F.col("irn") <= F.col("k")), "left")
              .groupBy("k")
              .agg(F.count("query_id").cast("long")
                    .alias("overlap_sum")))
    nq = ftop.agg(F.countDistinct("query_id").alias("n_queries"))
    return (hits.crossJoin(F.broadcast(nq))
                .select(F.col("k").cast("long").alias("k"),
                        "n_queries", "overlap_sum",
                        round_half_up(
                            F.col("overlap_sum") * 1.0
                            / (F.col("n_queries") * F.col("k")), 6)
                         .alias("recall_at_k")))


# ---------------------------------------------------------------------------
# X2 — dedup cluster-size histogram (r8)
# ---------------------------------------------------------------------------

@register(
    "x2_cluster_size_histogram",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS ckey
      FROM documents
    ),
    clusters AS (
      SELECT ckey, COUNT(*) AS csize FROM keyed GROUP BY ckey
    ),
    tot AS (
      SELECT CAST(SUM(csize) AS BIGINT) AS n_docs,
             COUNT(*) AS n_clusters
      FROM clusters
    )
    SELECT csize AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs_in_bucket,
           {sql_round_half_up(
               'csize * COUNT(*) * 1.0 / MAX(tot.n_docs)', 6)}
             AS doc_share,
           {sql_round_half_up(
               '(MAX(tot.n_clusters) * 1.0) / MAX(tot.n_docs)', 6)}
             AS corpus_unique_ratio
    FROM clusters, tot
    GROUP BY csize
    """,
)
def x2_cluster_size_histogram(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X2 — the DUP-CLUSTER SIZE HISTOGRAM: how many exact-duplicate
    clusters have 1, 2, 3… members, what share of the corpus sits in
    each bucket, and the corpus-wide unique ratio — the first
    diagnostic a dedup review reads (a fat tail of giant clusters
    means boilerplate/templating; a ~1.0 unique ratio means dedup
    will not buy much). x1_exact_dedup SELECTS the survivors; this
    characterizes what was collapsed, and x2_survivorship arbitrates
    who survives.

    Shape: content-key digest at scan (raw text never shuffles) →
    cluster-size agg on the key → a SECOND bounded agg over the size
    domain + a 1-row total cross-join; ratios are class-A integer
    ratios. The two-level "agg of an agg" is the distributive
    histogram pattern — both shuffles are map-side combinable."""
    d = _t(spark, sf_dir, "documents")
    ckey = F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9]+",
                                  " "))
    clusters = (d.select(ckey.alias("ckey"))
                 .groupBy("ckey")
                 .agg(F.count(F.lit(1)).alias("csize")))
    tot = clusters.agg(F.sum("csize").cast("long").alias("n_docs"),
                       F.count(F.lit(1)).alias("n_clusters"))
    return (clusters.groupBy("csize")
                    .agg(F.count(F.lit(1)).alias("_nc"))
                    .crossJoin(F.broadcast(tot))
                    .select(F.col("csize").alias("cluster_size"),
                            F.col("_nc").alias("n_clusters"),
                            (F.col("csize") * F.col("_nc"))
                            .cast("long").alias("n_docs_in_bucket"),
                            round_half_up(
                                F.col("csize") * F.col("_nc") * 1.0
                                / F.col("n_docs"), 6)
                             .alias("doc_share"),
                            round_half_up(
                                F.col("n_clusters") * 1.0
                                / F.col("n_docs"), 6)
                             .alias("corpus_unique_ratio")))


# ---------------------------------------------------------------------------
# X5 — alignment gate: exemplar-cosine filtering of paired modalities
# (r8 — the CLIP-score-filter plumbing with a deterministic scorer)
# ---------------------------------------------------------------------------

@register(
    "x5_alignment_gate",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm
      FROM v WHERE sqrt({_sql_dot('e', 'e')}) > 0
    ),
    paired AS (
      SELECT d.doc_id, d.lang, n.e, n.nrm
      FROM documents d JOIN n ON d.doc_id = n.vec_id
    ),
    ex AS (
      SELECT lang, MIN(doc_id) AS ex_id FROM paired GROUP BY lang
    ),
    exv AS (
      SELECT ex.lang, p.e AS xe, p.nrm AS xnrm
      FROM ex JOIN paired p ON ex.ex_id = p.doc_id
    ),
    scored AS (
      SELECT p.doc_id, p.lang,
             {_sql_dot('p.e', 'x.xe')} / (p.nrm * x.xnrm) AS cos
      FROM paired p JOIN exv x USING (lang)
    )
    SELECT lang,
           COUNT(*) AS n_paired,
           CAST(SUM(CASE WHEN cos >= 0.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_aligned,
           {sql_round_half_up(
               'SUM(CASE WHEN cos >= 0.0 THEN 1 ELSE 0 END) * 1.0 '
               '/ COUNT(*)', 6)} AS keep_rate,
           {sql_round_half_up('MIN(cos)', 6)} AS min_cos,
           {sql_round_half_up('MAX(cos)', 6)} AS max_cos
    FROM scored GROUP BY lang
    """,
)
def x5_alignment_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — the ALIGNMENT GATE of a paired multimodal corpus: each
    document joins its embedding (doc_id = vec_id — the paired-table
    contract of a caption/image or transcript/audio dataset) and is
    scored by cosine against its language's EXEMPLAR vector, gating
    at 0 — the CLIP-score filtering shape ("drop pairs whose
    image-text alignment is low") with the model stubbed by a
    deterministic scorer, exactly the x5 stub discipline: the
    plumbing (pair join, per-stratum reference, gate, per-lang keep
    report) is real and oracle-exact, the scorer swaps for a real
    encoder without touching the plan.

    The exemplar is the MIN-doc_id member of each language (a pure
    key function) rather than a centroid — deliberately: averaging
    doubles would make the reference order-dependent and the gate
    nondeterministic; cosines against a fixed member are pure
    functions of parquet values (class-A rounding for display, raw
    compare for the gate). Shape: one equi join on the id, a 5-row
    exemplar dim joined broadcast, one bounded lang agg."""
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    paired = (d.select("doc_id", "lang")
               .join(n, d.doc_id == n.vec_id)
               .select("doc_id", "lang", "e", "nrm"))
    ex = paired.groupBy("lang").agg(F.min("doc_id").alias("ex_id"))
    exv = (ex.join(paired.select(F.col("doc_id").alias("ex_id"),
                                 F.col("e").alias("xe"),
                                 F.col("nrm").alias("xnrm")),
                   "ex_id")
             .select("lang", "xe", "xnrm"))
    cos = _dot(F.col("e"), F.col("xe")) / (F.col("nrm")
                                           * F.col("xnrm"))
    scored = (paired.join(F.broadcast(exv), "lang")
                    .select("lang", cos.alias("cos")))
    keep = F.sum(F.when(F.col("cos") >= 0.0, 1).otherwise(0))
    return (scored.groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n_paired"),
                       keep.cast("long").alias("n_aligned"),
                       round_half_up(keep * 1.0 / F.count(F.lit(1)),
                                     6).alias("keep_rate"),
                       round_half_up(F.min("cos"), 6)
                        .alias("min_cos"),
                       round_half_up(F.max("cos"), 6)
                        .alias("max_cos")))


# ---------------------------------------------------------------------------
# X6 — threshold transfer: pick on dev, report on test (r8)
# ---------------------------------------------------------------------------

@register(
    "x6_threshold_transfer",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS score,
             (label >= 5) AS y,
             CASE WHEN substr(md5('tt' || ':'
                    || CAST(vec_id AS VARCHAR)), 1, 6) < '800000'
                  THEN 'dev' ELSE 'test' END AS split
      FROM embeddings
    ),
    th(t) AS ({_PR_SQL_TH}),
    cm AS (
      SELECT pts.split, th.t,
             CAST(SUM(CASE WHEN score >= th.t AND y
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN score >= th.t AND NOT y
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN score < th.t AND y
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM pts, th GROUP BY 1, 2
    ),
    f1s AS (
      SELECT split, t, tp, fp, fn,
             CASE WHEN 2 * tp + fp + fn > 0
                  THEN 2.0 * tp / (2 * tp + fp + fn)
                  ELSE 0.0 END AS f1
      FROM cm
    ),
    best AS (
      SELECT MIN({{'negf1': -f1, 't': t}}) AS b
      FROM f1s WHERE split = 'dev'
    )
    SELECT b.t AS chosen_threshold,
           {sql_round_half_up('-b.negf1', 6)} AS dev_f1,
           {sql_round_half_up('te.f1', 6)} AS test_f1,
           te.tp AS test_tp, te.fp AS test_fp, te.fn AS test_fn
    FROM best, f1s te
    WHERE te.split = 'test' AND te.t = b.t
    """,
)
def x6_threshold_transfer(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X6 — THRESHOLD TRANSFER, the eval-hygiene rule x6_pr_curve
    feeds: the operating threshold is chosen where DEV-split F1
    peaks, then reported on the held-out TEST split — never picked
    on the data it is quoted on (the optimistic-bias bug this
    protocol exists to kill). Splits are the portable md5 coin
    (~50/50 at the '800000' hex cut), the sweep is the x6_pr_curve
    7-threshold literal dim, and the argmax is one
    min(struct(−f1, t)) — F1 is a pure function of exact integer
    confusion counts, so the comparison (and its threshold
    tiebreak) is engine-identical. Shape: one scan → bounded
    (split × 7) agg → 1-row argmax → 1-row report join."""
    e = _t(spark, sf_dir, "embeddings")
    from ..plans.sampling import hash_coin
    from ..sources.tables import values_df
    pts = e.select(
        F.element_at(_as_double_vec("embedding"), 1).alias("score"),
        (F.col("label") >= 5).alias("y"),
        F.when(hash_coin(F.col("vec_id"), "tt") < "800000", "dev")
         .otherwise("test").alias("split"))
    th = values_df(spark, [(t,) for t in _PR_THRESHOLDS], "t double")
    pred = F.col("score") >= F.col("t")
    cm = (pts.crossJoin(F.broadcast(th))
             .groupBy("split", "t")
             .agg(F.sum(F.when(pred & F.col("y"), 1).otherwise(0))
                   .cast("long").alias("tp"),
                  F.sum(F.when(pred & ~F.col("y"), 1).otherwise(0))
                   .cast("long").alias("fp"),
                  F.sum(F.when(~pred & F.col("y"), 1).otherwise(0))
                   .cast("long").alias("fn")))
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2.0 * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn"))) \
          .otherwise(0.0)
    f1s = cm.withColumn("f1", f1)
    best = (f1s.filter(F.col("split") == "dev")
               .agg(F.min(F.struct((-F.col("f1")).alias("negf1"),
                                   F.col("t").alias("t")))
                     .alias("b")))
    return (f1s.filter(F.col("split") == "test")
               .crossJoin(F.broadcast(best))
               .filter(F.col("t") == F.col("b.t"))
               .select(F.col("b.t").alias("chosen_threshold"),
                       round_half_up(-F.col("b.negf1"), 6)
                        .alias("dev_f1"),
                       round_half_up(F.col("f1"), 6)
                        .alias("test_f1"),
                       F.col("tp").alias("test_tp"),
                       F.col("fp").alias("test_fp"),
                       F.col("fn").alias("test_fn")))


# ---------------------------------------------------------------------------
# X6 — exact ROC-AUC via staircase midranks (r9)
# ---------------------------------------------------------------------------

@register(
    "x6_auc_exact",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS score,
             (label >= 5) AS y
      FROM embeddings
    ),
    per_s AS (
      SELECT score, COUNT(*) AS n,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np
      FROM pts GROUP BY score
    ),
    ranked AS (
      SELECT score, n, np,
             CAST(COALESCE(SUM(n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bef
      FROM per_s
    ),
    s AS (
      SELECT CAST(SUM(np * (2 * bef + n + 1)) AS BIGINT) AS r2,
             CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(n - np) AS BIGINT) AS n_neg
      FROM ranked
    )
    SELECT n_pos, n_neg,
           (r2 - n_pos * (n_pos + 1)) AS u_twice,
           {sql_round_half_up(
               '(r2 - n_pos * (n_pos + 1)) * 1.0 '
               '/ (2.0 * n_pos * n_neg)', 6)} AS auc
    FROM s
    """,
)
def x6_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — EXACT ROC-AUC as the Mann-Whitney rank statistic:
    AUC = U / (n⁺·n⁻) with midranks for tied scores — the
    threshold-free companion to x6_pr_curve's 7-point sweep (the
    curve picks an operating point; AUC is the one-number ranking
    quality a model card reports). Same deterministic score/label
    stand-ins as the rest of the x6 family (score = raw first
    embedding component, labels binarized at ≥ 5).

    The rank sum is where naive AUC dies at scale: a global
    ``rank() OVER (ORDER BY score)`` is one sort partition. Here the
    per-DISTINCT-score relation (score, n, n_pos) cumulates over
    fixed-width double bands (``double_value_bucket`` at scale 4096 —
    the x3_ood_score machinery; the exclusive prefix is inclusive
    cumsum minus own count), and 2·midrank = 2·before + n + 1 keeps
    EVERYTHING BIGINT: 2R⁺ = Σ n_pos·(2·before + n + 1),
    AUC = (2R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) — a class-A integer ratio,
    zero float accumulation, ties handled exactly (midranks make
    AUC = P(s⁺ > s⁻) + ½P(s⁺ = s⁻), the probabilistic AUC).

    Shape: one scan → distinct-score hash agg → staircase cumsum
    (bands bounded by the score DOMAIN, not N) → 1-row agg."""
    from ..operators.staircase import (bucketed_cumsum,
                                       double_value_bucket)
    e = _t(spark, sf_dir, "embeddings")
    pts = e.select(
        F.element_at(F.transform("embedding",
                                 lambda x: x.cast("double")), 1)
         .alias("score"),
        (F.col("label") >= 5).alias("y"))
    per_s = (pts.groupBy("score")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.when(F.col("y"), 1).otherwise(0))
                      .cast("long").alias("np")))
    ranked = bucketed_cumsum(
        per_s.withColumn("_qb",
                         double_value_bucket(F.col("score"), 4096.0)),
        [], ["_qb"], [F.col("_qb")], [F.col("score")],
        F.col("n"), out="_cum")
    ranked = ranked.withColumn("bef", F.col("_cum") - F.col("n"))
    s = ranked.agg(
        F.sum(F.col("np") * (2 * F.col("bef") + F.col("n") + 1))
         .cast("long").alias("r2"),
        F.sum("np").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).cast("long").alias("n_neg"))
    u2 = F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return s.select(
        "n_pos", "n_neg", u2.alias("u_twice"),
        round_half_up(u2 * 1.0
                      / (2.0 * F.col("n_pos") * F.col("n_neg")), 6)
         .alias("auc"))


# ---------------------------------------------------------------------------
# X3 — metadata-FILTERED ANN: pre-filter + IVF probe (r9)
# ---------------------------------------------------------------------------

#: Borland-LCG constants — a third independent hash-rank family so the
#: filtered-search query batch is disjoint from _H_CENT/_H_QUERY picks.
_H_FQ = (22695477, 1)


@register(
    "x3_filtered_ann",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, e, sqrt({_sql_dot('e', 'e')}) AS nrm
      FROM v WHERE sqrt({_sql_dot('e', 'e')}) > 0
    ),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    qry AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM n
            {_sql_hash_sample(_H_FQ, 16)}),
    probe AS (
      SELECT query_id, qe, qnrm, cid FROM (
        SELECT q.query_id, q.qe, q.qnrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_dot('q.qe', 'cent.ce')}
                          / (q.qnrm * cent.cnrm) DESC, cent.cid)
                 AS rc
        FROM qry q CROSS JOIN cent
      ) WHERE rc <= 2
    ),
    fil AS (
      SELECT vec_id, label, e, nrm, cid FROM (
        SELECT n.vec_id, n.label, n.e, n.nrm, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
        WHERE n.label >= 5
      ) WHERE rc = 1
    ),
    cand AS (
      SELECT p.query_id, f.vec_id AS neighbor_id,
             f.label AS neighbor_label,
             {_sql_dot('p.qe', 'f.e')} / (p.qnrm * f.nrm) AS cos
      FROM probe p JOIN fil f
        ON p.cid = f.cid AND f.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, neighbor_label,
           {sql_round_half_up('cos', 6)} AS cos_sim,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)
def x3_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — METADATA-FILTERED vector search, the serving shape every
    production index needs the week after launch ("nearest docs, but
    only label ≥ 5" — permission scopes, language gates, freshness
    windows): PRE-filtering composed with the IVF probe. Pre- vs
    post-filter is the real design decision — post-filtering a top-k
    loses recall exactly when the filter is selective (a k=3 answer
    may contain zero allowed rows); here the corpus is filtered
    BEFORE cell search, so the engine returns the true filtered
    top-3 of the probed cells at unreduced k.

    Shape: a 16-query batch (hash-rank selected — constant,
    N-independent, a third LCG family so it is disjoint from the
    centroid/recall picks) probes its nprobe=2 nearest of the frozen
    K_COARSE cells (16×32 rows — a by-construction-bounded window);
    the filtered corpus assigns to cells by the struct-min argmin
    idiom (no corpus-sized row_number); per-query top-3 over the
    probed-cell candidates runs as the two-level staircase
    (double_value_bucket cos bands DESC — query_id is a 16-value key,
    precisely the bounded-partition trap the staircase exists for).
    All cosines are the family's identical-bit class-A folds."""
    from ..operators.staircase import (bucketed_row_number,
                                       double_value_bucket)
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label",
                 _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
            .select(F.col("vec_id").alias("cid"),
                    F.col("e").alias("ce"),
                    F.col("nrm").alias("cnrm")))
    qry = (_hash_sample(n, 16, _H_FQ)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("e").alias("qe"),
                   F.col("nrm").alias("qnrm")))
    qcos = (_dot(F.col("qe"), F.col("ce"))
            / (F.col("qnrm") * F.col("cnrm")))
    wq = Window.partitionBy("query_id").orderBy(
        qcos.desc(), F.col("cid"))  # 16×K_COARSE rows by construction
    probe = (qry.crossJoin(F.broadcast(cent))
                .withColumn("rc", F.row_number().over(wq))
                .filter(F.col("rc") <= 2)
                .select("query_id", "qe", "qnrm", "cid"))
    ccos = (_dot(F.col("e"), F.col("ce"))
            / (F.col("nrm") * F.col("cnrm")))
    fil = (n.filter(F.col("label") >= 5)
            .repartition(spark.sparkContext.defaultParallelism,
                         "vec_id")
            .crossJoin(F.broadcast(cent))
            .groupBy("vec_id")
            .agg(F.min(F.struct((-ccos).alias("negcos"),
                                F.col("cid"),
                                F.col("label").alias("label"),
                                F.col("e").alias("e"),
                                F.col("nrm").alias("nrm")))
                  .alias("b"))
            .select("vec_id", F.col("b.label").alias("label"),
                    F.col("b.e").alias("e"),
                    F.col("b.nrm").alias("nrm"),
                    F.col("b.cid").alias("cid")))
    cand = (probe.alias("p")
            .join(fil.alias("f"),
                  (F.col("p.cid") == F.col("f.cid"))
                  & (F.col("f.vec_id") != F.col("p.query_id")))
            .select(F.col("p.query_id").alias("query_id"),
                    F.col("f.vec_id").alias("neighbor_id"),
                    F.col("f.label").alias("neighbor_label"),
                    (_dot(F.col("p.qe"), F.col("f.e"))
                     / (F.col("p.qnrm") * F.col("f.nrm")))
                    .alias("cos")))
    ranked = bucketed_row_number(
        cand.withColumn("_vb", double_value_bucket(F.col("cos"),
                                                   4096.0)),
        ["query_id"], ["_vb"], [F.col("_vb").desc()],
        [F.col("cos").desc(), F.col("neighbor_id")], out="rank")
    return (ranked.filter(F.col("rank") <= 3)
                  .select("query_id", "neighbor_id", "neighbor_label",
                          round_half_up(F.col("cos"), 6)
                           .alias("cos_sim"),
                          F.col("rank").cast("long").alias("rank")))


# ---------------------------------------------------------------------------
# X4 — vocabulary growth curve (Heaps-law profile) (r9)
# ---------------------------------------------------------------------------

@register(
    "x4_vocab_growth",
    oracle=f"""
    WITH b AS (
      SELECT MIN(doc_id) AS mn,
             MAX(doc_id) - MIN(doc_id) + 1 AS span
      FROM documents
    ),
    toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    banded AS (
      SELECT ((t.doc_id - b.mn) * 10) // b.span AS band, u.w
      FROM toks t CROSS JOIN b, UNNEST(t.t) AS u(w)
    ),
    docs_per AS (
      SELECT ((d.doc_id - b.mn) * 10) // b.span AS band,
             COUNT(*) AS n_docs
      FROM documents d CROSS JOIN b GROUP BY 1
    ),
    per_band AS (
      SELECT band, COUNT(*) AS n_tokens FROM banded GROUP BY band
    ),
    news AS (
      SELECT fb AS band, COUNT(*) AS new_types FROM (
        SELECT w, MIN(band) AS fb FROM banded GROUP BY w
      ) GROUP BY fb
    ),
    j AS (
      SELECT d.band, d.n_docs,
             COALESCE(p.n_tokens, 0) AS n_tokens,
             COALESCE(n.new_types, 0) AS new_types
      FROM docs_per d
      LEFT JOIN per_band p USING (band)
      LEFT JOIN news n USING (band)
    )
    SELECT CAST(band AS BIGINT) AS band, n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER (ORDER BY band
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab,
           {sql_round_half_up(
               'new_types * 1.0 / n_tokens', 6)} AS novelty_rate
    FROM j
    """,
)
def x4_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — the VOCABULARY GROWTH curve: the corpus cut into ten
    equal doc-id bands (ingestion order), each band reporting how
    many never-before-seen token types it introduced and the running
    vocabulary size — the empirical Heaps-law profile a tokenizer
    team reads before freezing a vocab ("are we still discovering
    words, or has the curve flattened?"), and the corpus-level
    companion of x4_ngram_novelty's per-document score.

    Shape: one token explode; first-seen band is a per-TYPE min agg
    (vocabulary-sized, map-side combinable — the banding makes
    "first appearance" a 10-value key instead of a doc-id rank);
    the cumulative runs over the 10-row band dim. Band assignment is
    the exact integer cross-multiplication ((id − min)·10) div span;
    novelty is a class-A integer ratio."""
    d = _t(spark, sf_dir, "documents")
    b = d.agg(F.min("doc_id").alias("mn"),
              (F.max("doc_id") - F.min("doc_id") + 1).alias("span"))
    banded = (d.select("doc_id", F.explode(tokens_col("text"))
                        .alias("w"))
               .crossJoin(F.broadcast(b))
               .select(F.expr("((doc_id - mn) * 10) div span")
                        .alias("band"), "w"))
    docs_per = (d.crossJoin(F.broadcast(b))
                 .groupBy(F.expr("((doc_id - mn) * 10) div span")
                           .alias("band"))
                 .agg(F.count(F.lit(1)).alias("n_docs")))
    per_band = banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_tokens"))
    news = (banded.groupBy("w").agg(F.min("band").alias("band"))
                  .groupBy("band")
                  .agg(F.count(F.lit(1)).alias("new_types")))
    wb = (Window.orderBy("band")
                .rowsBetween(Window.unboundedPreceding, 0))
    j = (docs_per.join(per_band, "band", "left")
                 .join(news, "band", "left")
                 .select("band", "n_docs",
                         F.coalesce("n_tokens", F.lit(0))
                          .cast("long").alias("n_tokens"),
                         F.coalesce("new_types", F.lit(0))
                          .cast("long").alias("new_types")))
    return (j.withColumn("cum_vocab",
                         F.sum("new_types").over(wb).cast("long"))
             .select(F.col("band").cast("long").alias("band"),
                     "n_docs", "n_tokens", "new_types", "cum_vocab",
                     round_half_up(F.col("new_types") * 1.0
                                   / F.col("n_tokens"), 6)
                      .alias("novelty_rate")))


# ---------------------------------------------------------------------------
# X6 — per-language fairness gap audit (r9)
# ---------------------------------------------------------------------------

@register(
    "x6_group_fairness_gap",
    oracle=f"""
    WITH pts AS (
      SELECT d.lang,
             (CAST(e.embedding[1] AS DOUBLE) >= 0.0) AS pred,
             (e.label >= 5) AS y
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    g AS (
      SELECT lang,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp
      FROM pts GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(tp) AS BIGINT) AS ttp,
             CAST(SUM(fp) AS BIGINT) AS tfp,
             CAST(SUM(n_pos) AS BIGINT) AS tpos,
             CAST(SUM(n - n_pos) AS BIGINT) AS tneg
      FROM g
    )
    SELECT lang, n, n_pos,
           {sql_round_half_up('tp * 1.0 / n_pos', 6)} AS tpr,
           {sql_round_half_up('fp * 1.0 / (n - n_pos)', 6)} AS fpr,
           {sql_round_half_up(
               'tp * 1.0 / n_pos - ttp * 1.0 / tpos', 6)}
             AS tpr_gap,
           {sql_round_half_up(
               'fp * 1.0 / (n - n_pos) - tfp * 1.0 / tneg', 6)}
             AS fpr_gap,
           (ABS(tp * 1.0 / n_pos - ttp * 1.0 / tpos) > 0.1)
             AS tpr_flagged
    FROM g, tot
    """,
)
def x6_group_fairness_gap(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X6 — the PER-GROUP FAIRNESS AUDIT: true/false-positive rates
    of the filtering classifier per document language, each gapped
    against the pooled rate and flagged beyond ±0.1 — the
    disparate-impact check a data-curation model ships with (a
    quality gate that silently rejects one language's documents at
    2× the rate is a corpus bias machine; x6_group_calibrate audits
    the score's calibration per group, this audits the DECISIONS).
    Embeddings join documents on the shared id (vec_id = doc_id, the
    x5_alignment_gate pairing); prediction = score ≥ 0, the x6
    family's deterministic stand-ins.

    Determinism: rates are class-A integer ratios; the gap is a
    difference of two such identical-bit doubles (still class A);
    the flag compares the raw gap, display is floor-kernel rounded.
    Shape: one join + bounded 5-row lang agg + 1-row pooled
    cross-join."""
    e = _t(spark, sf_dir, "embeddings")
    d = _t(spark, sf_dir, "documents")
    pts = (e.join(d, e.vec_id == d.doc_id)
            .select("lang",
                    (F.element_at(_as_double_vec("embedding"), 1)
                     >= 0.0).alias("pred"),
                    (F.col("label") >= 5).alias("y")))
    g = (pts.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("y"), 1).otherwise(0))
                  .cast("long").alias("n_pos"),
                 F.sum(F.when(F.col("pred") & F.col("y"), 1)
                        .otherwise(0)).cast("long").alias("tp"),
                 F.sum(F.when(F.col("pred") & ~F.col("y"), 1)
                        .otherwise(0)).cast("long").alias("fp")))
    tot = g.agg(F.sum("tp").cast("long").alias("ttp"),
                F.sum("fp").cast("long").alias("tfp"),
                F.sum("n_pos").cast("long").alias("tpos"),
                F.sum(F.col("n") - F.col("n_pos")).cast("long")
                 .alias("tneg"))
    tpr = F.col("tp") * 1.0 / F.col("n_pos")
    fpr = F.col("fp") * 1.0 / (F.col("n") - F.col("n_pos"))
    tpr_gap = tpr - F.col("ttp") * 1.0 / F.col("tpos")
    fpr_gap = fpr - F.col("tfp") * 1.0 / F.col("tneg")
    return (g.crossJoin(F.broadcast(tot))
             .select("lang", "n", "n_pos",
                     round_half_up(tpr, 6).alias("tpr"),
                     round_half_up(fpr, 6).alias("fpr"),
                     round_half_up(tpr_gap, 6).alias("tpr_gap"),
                     round_half_up(fpr_gap, 6).alias("fpr_gap"),
                     (F.abs(tpr_gap) > 0.1).alias("tpr_flagged")))


# ---------------------------------------------------------------------------
# X2 — boilerplate-prefix report (template detection) (r9)
# ---------------------------------------------------------------------------

@register(
    "x2_boilerplate_prefix_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             md5(array_to_string(
               ({SQL_TOKENS})[1:8], ' ')) AS h
      FROM documents
    ),
    grp AS (
      SELECT lang, h, COUNT(*) AS n_copies
      FROM t GROUP BY lang, h
    )
    SELECT lang,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           COUNT(*) AS n_templates,
           CAST(SUM(CASE WHEN n_copies >= 2 THEN n_copies
                         ELSE 0 END) AS BIGINT) AS n_templated_docs,
           CAST(SUM(n_copies) - COUNT(*) AS BIGINT)
             AS n_extra_copies,
           {sql_round_half_up(
               'SUM(CASE WHEN n_copies >= 2 THEN n_copies ELSE 0 '
               'END) * 1.0 / SUM(n_copies)', 6)} AS templated_share
    FROM grp GROUP BY lang
    """,
)
def x2_boilerplate_prefix_report(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X2 — BOILERPLATE detection by opening-prefix collision: per
    language, how many documents share their first 8 tokens with
    another document (templated openings — scraped nav bars, license
    headers, form letters), how many distinct templates exist, and
    the share of the corpus that is template-led — the curation
    signal C4-style pipelines act on BETWEEN exact dedup (which these
    docs evade: their bodies differ) and MinHash near-dup (which
    misses them when the shared prefix is a small fraction of a long
    doc). Probed non-degenerate at every SF (24/24/244 extra copies
    — full-text exact dups are near-zero in this synthetic data, the
    a49/a50 reframing rule applied at design time).

    Scale: one tokenizing scan; only 32-hex PREFIX digests shuffle
    (the x1 discipline — raw text never moves); two map-side-
    combinable aggs; the share is a class-A integer ratio."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang",
        F.md5(F.array_join(F.slice(tokens_col("text"), 1, 8), " "))
         .alias("h"))
    grp = (t.groupBy("lang", "h")
            .agg(F.count(F.lit(1)).alias("n_copies")))
    templated = F.sum(F.when(F.col("n_copies") >= 2,
                             F.col("n_copies")).otherwise(0))
    return (grp.groupBy("lang")
               .agg(F.sum("n_copies").cast("long").alias("n_docs"),
                    F.count(F.lit(1)).alias("n_templates"),
                    templated.cast("long").alias("n_templated_docs"),
                    (F.sum("n_copies") - F.count(F.lit(1)))
                     .cast("long").alias("n_extra_copies"),
                    round_half_up(templated * 1.0
                                  / F.sum("n_copies"), 6)
                     .alias("templated_share")))


# ---------------------------------------------------------------------------
# X4 — IDF drift between corpus halves (retrain trigger) (r9)
# ---------------------------------------------------------------------------

@register(
    "x4_idf_drift",
    oracle=f"""
    WITH b AS (
      SELECT MIN(doc_id) AS mn,
             MAX(doc_id) - MIN(doc_id) + 1 AS span
      FROM documents
    ),
    dt AS (
      SELECT DISTINCT d.doc_id,
             CASE WHEN (d.doc_id - b.mn) * 2 < b.span
                  THEN 'H1' ELSE 'H2' END AS half,
             u.w
      FROM (SELECT doc_id, {SQL_TOKENS} AS t FROM documents) d
      CROSS JOIN b, UNNEST(d.t) AS u(w)
    ),
    nh AS (
      SELECT half, COUNT(DISTINCT doc_id) AS nd FROM dt GROUP BY 1
    ),
    df AS (
      SELECT half, w, COUNT(*) AS df FROM dt GROUP BY 1, 2
    ),
    idf AS (
      SELECT df.half, df.w, df.df,
             CAST(FLOOR(nh.nd * 1000000.0 / df.df) AS BIGINT)
               AS idf_scaled
      FROM df JOIN nh ON df.half = nh.half
      WHERE df.df >= 5
    ),
    drift AS (
      SELECT a.w AS term, a.df AS df_h1, c.df AS df_h2,
             a.idf_scaled AS idf_h1, c.idf_scaled AS idf_h2,
             ABS(a.idf_scaled - c.idf_scaled) AS drift_scaled
      FROM (SELECT * FROM idf WHERE half = 'H1') a
      JOIN (SELECT * FROM idf WHERE half = 'H2') c ON a.w = c.w
    )
    SELECT term, df_h1, df_h2, idf_h1, idf_h2, drift_scaled
    FROM drift
    ORDER BY drift_scaled DESC, term
    LIMIT 20
    """,
)
def x4_idf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — IDF DRIFT between corpus halves: the 20 terms whose
    integer-scaled inverse document frequency moved most between the
    first and second half of the corpus (by ingestion id) — the
    retrain trigger for anything carrying a frozen IDF table
    (x4_bm25_topk, x4_keyword_topk, the TF-IDF gate): when the
    drift head is full of new entity names, the stored weights are
    stale. The text-side a46 (ABC migration) — same two-epoch
    compare, same absolute-BIGINT ranking.

    Determinism: idf_scaled = floor(N_half·10⁶/df) is the
    x4_keyword_topk idiom — pure BIGINT, no ln, no float rank ties;
    the df≥5 support floor on BOTH halves kills hapax churn. Shape:
    one distinct (doc, term) explode; per-half df aggs (map-side
    combinable); vocab-keyed half join (AQE-sized); TakeOrdered 20
    on the (drift desc, term) total order."""
    d = _t(spark, sf_dir, "documents")
    b = d.agg(F.min("doc_id").alias("mn"),
              (F.max("doc_id") - F.min("doc_id") + 1).alias("span"))
    dt = (d.select("doc_id", F.explode(tokens_col("text")).alias("w"))
           .crossJoin(F.broadcast(b))
           .select("doc_id",
                   F.when((F.col("doc_id") - F.col("mn")) * 2
                          < F.col("span"), "H1").otherwise("H2")
                    .alias("half"),
                   "w")
           .distinct())
    nh = dt.groupBy("half").agg(
        F.countDistinct("doc_id").alias("nd"))
    df = dt.groupBy("half", "w").agg(F.count(F.lit(1)).alias("df"))
    idf = (df.filter(F.col("df") >= 5)
             .join(nh, "half")
             .select("half", "w", "df",
                     F.floor(F.col("nd") * 1000000.0 / F.col("df"))
                      .cast("long").alias("idf_scaled")))
    h1 = (idf.filter(F.col("half") == "H1")
             .select(F.col("w").alias("term"),
                     F.col("df").alias("df_h1"),
                     F.col("idf_scaled").alias("idf_h1")))
    h2 = (idf.filter(F.col("half") == "H2")
             .select(F.col("w").alias("term"),
                     F.col("df").alias("df_h2"),
                     F.col("idf_scaled").alias("idf_h2")))
    return (h1.join(h2, "term")
              .select("term", "df_h1", "df_h2", "idf_h1", "idf_h2",
                      F.abs(F.col("idf_h1") - F.col("idf_h2"))
                       .alias("drift_scaled"))
              .orderBy(F.col("drift_scaled").desc(), "term")
              .limit(20))


# ---------------------------------------------------------------------------
# X9 — truncation-loss sweep over candidate context lengths (r9)
# ---------------------------------------------------------------------------

@register(
    "x9_truncation_loss",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tok
      FROM documents
    ),
    ls(max_len) AS (VALUES (64), (128), (256), (512)),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total FROM t)
    SELECT CAST(ls.max_len AS BIGINT) AS max_len,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_tok > ls.max_len THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(SUM(GREATEST(n_tok - ls.max_len, 0)) AS BIGINT)
             AS tokens_lost,
           {sql_round_half_up(
               'CAST(SUM(GREATEST(n_tok - ls.max_len, 0)) AS BIGINT)'
               ' * 1.0 / tot.total', 6)} AS loss_share
    FROM t CROSS JOIN ls CROSS JOIN tot
    GROUP BY ls.max_len, tot.total
    """,
)
def x9_truncation_loss(spark: SparkSession,
                       sf_dir: str) -> DataFrame:
    """X9 — the TRUNCATION-LOSS SWEEP: for each candidate context
    length, how many documents overflow and how many tokens fall off
    the end — the table a pretraining team reads before fixing
    max_len (x9_length_bucketing balances batches GIVEN a length;
    this prices the length choice itself; the x6_pr_curve sweep
    pattern applied to sequence budgeting).

    Shape: ONE tokenizing scan (counts only), a 4-row literal
    length dim cross-joined map-side, a 4-row agg + 1-row total —
    the sweep costs one pass however many lengths are on the
    curve. Token counts and losses are exact BIGINTs; the loss
    share is a class-A ratio."""
    from ..sources.tables import values_df
    d = _t(spark, sf_dir, "documents")
    t = d.select(F.size(tokens_col("text")).cast("long")
                  .alias("n_tok"))
    ls = values_df(spark, [(64,), (128,), (256,), (512,)],
                   "max_len int")
    tot = t.agg(F.sum("n_tok").cast("long").alias("total"))
    lost = F.greatest(F.col("n_tok") - F.col("max_len"), F.lit(0))
    return (t.crossJoin(F.broadcast(ls))
             .crossJoin(F.broadcast(tot))
             .groupBy(F.col("max_len").cast("long").alias("max_len"),
                      "total")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.when(F.col("n_tok") > F.col("max_len"), 1)
                         .otherwise(0)).cast("long")
                   .alias("n_truncated"),
                  F.sum(lost).cast("long").alias("tokens_lost"))
             .select("max_len", "n_docs", "n_truncated",
                     "tokens_lost",
                     round_half_up(F.col("tokens_lost") * 1.0
                                   / F.col("total"), 6)
                      .alias("loss_share")))


# ---------------------------------------------------------------------------
# X8 — the dataset card: one-row corpus datasheet (r9)
# ---------------------------------------------------------------------------

@register(
    "x8_dataset_card",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tok,
             md5(array_to_string(({SQL_TOKENS})[1:8], ' ')) AS ph
      FROM documents
    ),
    base AS (
      SELECT COUNT(*) AS n_docs,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             quantile_cont(n_tok, 0.5) AS p50_tokens,
             quantile_cont(n_tok, 0.95) AS p95_tokens,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_en
      FROM t
    ),
    tpl AS (
      SELECT CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
               AS n_templated
      FROM (SELECT ph, COUNT(*) AS c FROM t GROUP BY ph)
    )
    SELECT n_docs, n_langs, n_sources, total_tokens,
           p50_tokens, p95_tokens,
           {sql_round_half_up('n_en * 1.0 / n_docs', 6)}
             AS english_share,
           {sql_round_half_up('n_templated * 1.0 / n_docs', 6)}
             AS templated_share
    FROM base, tpl
    """,
)
def x8_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — the DATASET CARD: the one-row datasheet a corpus release
    ships with (size, language/source diversity, token budget, the
    length distribution's p50/p95, English share, boilerplate share)
    — the composition capstone over this round's curation signals
    (x2_boilerplate_prefix_report's template key, x9_truncation_
    loss's token counting) and the staircase quantile machinery,
    in the Datasheets-for-Datasets spirit.

    Shape: ONE tokenizing scan feeds everything (counts + the 8-token
    prefix digest; token arrays and raw text never shuffle); the
    exact length quantiles run as the partition-free bucketed rank
    lookup (small tie-heavy ints ⇒ single-valued bands ⇒ zero data
    sorts — the a45 argument); the template share is one digest agg;
    every displayed ratio is a class-A integer ratio."""
    from ..operators.staircase import bucketed_exact_quantiles
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    t = d.select("doc_id", "lang", "source",
                 F.size(toks).cast("long").alias("n_tok"),
                 F.md5(F.array_join(F.slice(toks, 1, 8), " "))
                  .alias("ph"))
    from ..operators.checkpoint import ckpt
    t = ckpt(t)  # one tokenizing pass feeds 3 consumers
    base = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
         .cast("long").alias("n_en"))
    qs = (bucketed_exact_quantiles(t.select("n_tok"), [], "n_tok",
                                   [0.5, 0.95])
          .select(F.col("q0").alias("p50_tokens"),
                  F.col("q1").alias("p95_tokens")))
    tpl = (t.groupBy("ph").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.when(F.col("c") >= 2, F.col("c"))
                        .otherwise(0)).cast("long")
                  .alias("n_templated")))
    return (base.crossJoin(F.broadcast(qs))
                .crossJoin(F.broadcast(tpl))
                .select("n_docs", "n_langs", "n_sources",
                        "total_tokens", "p50_tokens", "p95_tokens",
                        round_half_up(F.col("n_en") * 1.0
                                      / F.col("n_docs"), 6)
                         .alias("english_share"),
                        round_half_up(F.col("n_templated") * 1.0
                                      / F.col("n_docs"), 6)
                         .alias("templated_share")))


# ---------------------------------------------------------------------------
# X3 — IVF cell-balance report (index health) (r9)
# ---------------------------------------------------------------------------

@register(
    "x3_centroid_balance_report",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt({_sql_dot('e', 'e')}) AS nrm FROM v
      WHERE sqrt({_sql_dot('e', 'e')}) > 0
    ),
    cent AS (SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
             {_sql_hash_sample(_H_CENT, K_COARSE)}),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, cent.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_sql_dot('n.e', 'cent.ce')}
                          / (n.nrm * cent.cnrm) DESC, cent.cid) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ),
    sizes AS (
      SELECT cent.cid, COUNT(a.vec_id) AS cell_n
      FROM cent LEFT JOIN assigned a ON cent.cid = a.cid
      GROUP BY cent.cid
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(cell_n) AS BIGINT) AS n_vectors,
             CAST(MAX(cell_n) AS BIGINT) AS max_cell,
             CAST(MIN(cell_n) AS BIGINT) AS min_cell,
             CAST(SUM(CASE WHEN cell_n = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_empty,
             SUM(CAST(cell_n AS DOUBLE) * cell_n) AS sq
      FROM sizes
    )
    SELECT n_cells, n_vectors, max_cell, min_cell, n_empty,
           {sql_round_half_up(
               'max_cell * 1.0 * n_cells / n_vectors', 4)}
             AS imbalance_factor,
           {sql_round_half_up(
               'sq * n_cells / (CAST(n_vectors AS DOUBLE) '
               '* n_vectors)', 4)} AS load_variance_ratio,
           (max_cell * 10 > n_vectors) AS rebalance_needed
    FROM s
    """,
)
def x3_centroid_balance_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X3 — IVF CELL-BALANCE health report: the stored index's cell
    population profile (max/min/empty cells, the imbalance factor
    max·K/N, the normalized second moment E[n²]·K/N² ≥ 1) and a
    rebalance flag when one cell holds > 10% of the corpus — the
    diagnostic that decides when the coarse quantizer retrains
    (a skewed cell turns every probe of it into a near-linear scan;
    x3_index_compaction handles delete debt, this handles ASSIGNMENT
    debt). Same frozen hash-rank centroids as the serving queries —
    the monitor rides the index's own geometry.

    Shape: the N×K broadcast assignment (struct-min argmin) + a
    K-row LEFT-join agg (empty cells stay visible — a LEFT join from
    the centroid dim, never an inner join that hides them) + a 1-row
    report. max·K/N and the variance ratio are class-A folds of
    exact integers; the flag is an integer cross-multiplication."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    n = (v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
          .filter(F.col("nrm") > 0))
    cent = (_hash_sample(n, K_COARSE, _H_CENT)
            .select(F.col("vec_id").alias("cid"),
                    F.col("e").alias("ce"),
                    F.col("nrm").alias("cnrm")))
    ccos = (_dot(F.col("e"), F.col("ce"))
            / (F.col("nrm") * F.col("cnrm")))
    assigned = (n.repartition(spark.sparkContext.defaultParallelism,
                              "vec_id")
                 .crossJoin(F.broadcast(cent))
                 .groupBy("vec_id")
                 .agg(F.min(F.struct((-ccos).alias("negcos"),
                                     F.col("cid"))).alias("b"))
                 .select("vec_id", F.col("b.cid").alias("cid")))
    sizes = (cent.select("cid").join(assigned, "cid", "left")
                 .groupBy("cid")
                 .agg(F.count("vec_id").alias("cell_n")))
    s = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("cell_n").cast("long").alias("n_vectors"),
        F.max("cell_n").cast("long").alias("max_cell"),
        F.min("cell_n").cast("long").alias("min_cell"),
        F.sum(F.when(F.col("cell_n") == 0, 1).otherwise(0))
         .cast("long").alias("n_empty"),
        F.sum(F.col("cell_n").cast("double") * F.col("cell_n"))
         .alias("sq"))
    return s.select(
        "n_cells", "n_vectors", "max_cell", "min_cell", "n_empty",
        round_half_up(F.col("max_cell") * 1.0 * F.col("n_cells")
                      / F.col("n_vectors"), 4)
         .alias("imbalance_factor"),
        round_half_up(F.col("sq") * F.col("n_cells")
                      / (F.col("n_vectors").cast("double")
                         * F.col("n_vectors")), 4)
         .alias("load_variance_ratio"),
        (F.col("max_cell") * 10 > F.col("n_vectors"))
         .alias("rebalance_needed"))


# ---------------------------------------------------------------------------
# X5 — embedding-norm drift between corpus halves (r9)
# ---------------------------------------------------------------------------

@register(
    "x5_norm_drift",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    b AS (
      SELECT MIN(vec_id) AS mn,
             MAX(vec_id) - MIN(vec_id) + 1 AS span
      FROM v
    ),
    n AS (
      SELECT CASE WHEN (vec_id - b.mn) * 2 < b.span
                  THEN 'H1' ELSE 'H2' END AS half,
             sqrt({_sql_dot('e', 'e')}) AS nrm
      FROM v CROSS JOIN b
    ),
    q AS (
      SELECT half, COUNT(*) AS n_vecs,
             quantile_cont(nrm, 0.5) AS p50_norm,
             quantile_cont(nrm, 0.95) AS p95_norm
      FROM n GROUP BY half
    )
    SELECT half, n_vecs,
           {sql_round_half_up('p50_norm', 6)} AS p50_norm,
           {sql_round_half_up('p95_norm', 6)} AS p95_norm
    FROM q
    """,
)
def x5_norm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — EMBEDDING-NORM DRIFT: the L2-norm distribution's exact
    p50/p95 per corpus half (by ingestion id) — the cheapest upstream
    drift monitor for an embedding pipeline (an encoder change or a
    preprocessing bug shifts the norm profile before it shifts any
    downstream metric; x3_ood_score watches geometry against the
    index, this watches the raw vectors against history).

    The exact quantiles of a DOUBLE over a 2-value partition key are
    precisely the staircase's double-banded case (norms live in a
    bounded domain; fixed-width bands at scale 2048 keep the bucket
    dim bounded by range·scale) — a grouped ``percentile()`` here
    would buffer N/2 norms per aggregator, the banned shape. Norms
    are the family's class-A identical-bit folds; the interpolation
    is the two-product kernel both engines run."""
    from ..operators.staircase import (bucketed_exact_quantiles,
                                       double_value_bucket)
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    b = v.agg(F.min("vec_id").alias("mn"),
              (F.max("vec_id") - F.min("vec_id") + 1).alias("span"))
    n = (v.crossJoin(F.broadcast(b))
          .select(F.when((F.col("vec_id") - F.col("mn")) * 2
                         < F.col("span"), "H1").otherwise("H2")
                   .alias("half"),
                  F.sqrt(_dot(F.col("e"), F.col("e"))).alias("nrm")))
    qs = bucketed_exact_quantiles(
        n, ["half"], "nrm", [0.5, 0.95],
        bucket=double_value_bucket(F.col("nrm"), 2048.0))
    return qs.select("half", F.col("n").alias("n_vecs"),
                     round_half_up(F.col("q0"), 6).alias("p50_norm"),
                     round_half_up(F.col("q1"), 6).alias("p95_norm"))


# ---------------------------------------------------------------------------
# X6 — model-score PSI drift between corpus halves (r9)
# ---------------------------------------------------------------------------

_SPSI_BINS = 8


@register(
    "x6_score_drift_psi",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score
      FROM embeddings
    ),
    b AS (
      SELECT MIN(vec_id) AS mn,
             MAX(vec_id) - MIN(vec_id) + 1 AS span
      FROM pts
    ),
    binned AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((score + 0.5) / 0.125)
                                 AS INTEGER), 0), {_SPSI_BINS - 1})
               AS bin_id,
             ((vec_id - b.mn) * 2 < b.span) AS is_base
      FROM pts CROSS JOIN b
    ),
    cnt AS (
      SELECT bin_id,
             COUNT(CASE WHEN is_base THEN 1 END) AS n_base,
             COUNT(CASE WHEN NOT is_base THEN 1 END) AS n_cur
      FROM binned GROUP BY bin_id
    ),
    tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM cnt),
    term AS (
      SELECT bin_id, n_base, n_cur,
             CAST(ROUND(CAST(
               ((n_cur + 0.5) / (tc + {_SPSI_BINS * 0.5})
                - (n_base + 0.5) / (tb + {_SPSI_BINS * 0.5}))
               * ln(((n_cur + 0.5) / (tc + {_SPSI_BINS * 0.5}))
                    / ((n_base + 0.5) / (tb + {_SPSI_BINS * 0.5})))
               AS DECIMAL(38,10)), 6) AS DOUBLE) AS psi_term
      FROM cnt CROSS JOIN tot
    )
    SELECT bin_id, n_base, n_cur, psi_term,
           CAST(ROUND(SUM(CAST(psi_term AS DECIMAL(38,10))) OVER (),
                      6) AS DOUBLE) AS psi_total,
           (SUM(CAST(psi_term AS DECIMAL(38,10))) OVER () >= 0.1)
             AS drift_alert
    FROM term
    """,
)
def x6_score_drift_psi(spark: SparkSession,
                       sf_dir: str) -> DataFrame:
    """X6 — PSI drift of the MODEL SCORE between corpus halves: the
    a23 Population Stability Index machinery applied to the
    classifier score (8 literal bins over the score domain, 0.5
    Laplace floor, (q−p)·ln(q/p) terms) — the monitor that catches a
    silently-shifted score distribution before the threshold picked
    by x6_threshold_transfer goes stale (a23 watches a FEATURE, this
    watches the MODEL; same alert thresholds, PSI ≥ 0.1 = watch).

    Determinism: bin fractions are exact int ratios; the libm ln
    routes through DECIMAL(38,10) at 6dp (class B, |term| ≪ 1); the
    total sums DECIMAL-cast terms — exact and order-free — so the
    alert boolean is hash-pinned. Shape: one scan → literal 8-bin
    conditional-count agg; every window over the 8-row histogram."""
    e = _t(spark, sf_dir, "embeddings")
    pts = e.select("vec_id",
                   F.element_at(_as_double_vec("embedding"), 1)
                    .alias("score"))
    b = pts.agg(F.min("vec_id").alias("mn"),
                (F.max("vec_id") - F.min("vec_id") + 1).alias("span"))
    smooth = _SPSI_BINS * 0.5
    binned = (pts.crossJoin(F.broadcast(b))
                 .select(F.least(
                             F.greatest(
                                 F.floor((F.col("score") + 0.5)
                                         / 0.125).cast("int"),
                                 F.lit(0)),
                             F.lit(_SPSI_BINS - 1)).alias("bin_id"),
                         ((F.col("vec_id") - F.col("mn")) * 2
                          < F.col("span")).alias("is_base")))
    cnt = (binned.groupBy("bin_id")
                 .agg(F.sum(F.when(F.col("is_base"), 1).otherwise(0))
                       .alias("n_base"),
                      F.sum(F.when(~F.col("is_base"), 1).otherwise(0))
                       .alias("n_cur")))
    tot = cnt.agg(F.sum("n_base").alias("tb"),
                  F.sum("n_cur").alias("tc"))
    q = (F.col("n_cur") + 0.5) / (F.col("tc") + smooth)
    p = (F.col("n_base") + 0.5) / (F.col("tb") + smooth)
    term = (cnt.crossJoin(F.broadcast(tot))
               .select("bin_id", "n_base", "n_cur",
                       F.round(((q - p) * F.log(q / p))
                               .cast("decimal(38,10)"), 6)
                        .cast("double").alias("psi_term")))
    w = Window.partitionBy()
    tot_term = F.sum(F.col("psi_term").cast("decimal(38,10)")).over(w)
    return term.select(
        "bin_id", "n_base", "n_cur", "psi_term",
        F.round(tot_term, 6).cast("double").alias("psi_total"),
        (tot_term >= 0.1).alias("drift_alert"))


# ---------------------------------------------------------------------------
# X6 — McNemar's paired test: is classifier B actually better than A? (r10)
# ---------------------------------------------------------------------------

@register(
    "x6_mcnemar_paired",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
    ),
    pred AS (
      SELECT doc_id, (lang = 'en') AS truth,
             (CAST(len(list_filter(toks, x -> x IN
                    ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                / GREATEST(len(toks), 1) >= 0.08) AS pa,
             (len(list_filter(toks, x -> x IN ('the', 'and'))) >= 2)
               AS pb
      FROM t
    ),
    cnt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN pa = truth THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a_correct,
             CAST(SUM(CASE WHEN pb = truth THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b_correct,
             CAST(SUM(CASE WHEN pa = truth AND pb <> truth
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
             CAST(SUM(CASE WHEN pa <> truth AND pb = truth
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b
      FROM pred
    )
    SELECT n_docs, n_a_correct, n_b_correct, n_only_a, n_only_b,
           {sql_round_half_up('n_a_correct * 1.0 / n_docs', 6)}
             AS acc_a,
           {sql_round_half_up('n_b_correct * 1.0 / n_docs', 6)}
             AS acc_b,
           {sql_round_half_up(
               '(ABS(n_only_a - n_only_b) - 1)'
               ' * (ABS(n_only_a - n_only_b) - 1) * 1.0'
               ' / (n_only_a + n_only_b)', 6)} AS mcnemar_chi2,
           ((ABS(n_only_a - n_only_b) - 1)
            * (ABS(n_only_a - n_only_b) - 1) * 1.0
            / (n_only_a + n_only_b) >= 3.841459) AS significant_5pct
    FROM cnt
    """,
)
def x6_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — McNEMAR'S PAIRED TEST on two language-ID rules scored
    against the lang GROUND TRUTH (en vs other): classifier A is the
    stopword-density rule (the x6_judge_agreement judge), B the
    absolute-stopword-count rule. x6_judge_agreement's kappa asks "do
    the judges agree with EACH OTHER"; this asks the deployment
    question — "is B actually better than A" — the way it must be
    asked on a SHARED eval set: only the DISCORDANT pairs carry
    information (docs both get right or both get wrong cancel), so the
    statistic is the continuity-corrected (|b−c|−1)²/(b+c) over the
    two discordant counts, compared against the χ²₁ 5% critical
    value. The marginal-accuracy gap alone overstates significance
    because paired predictions are correlated — the standard error of
    the DIFFERENCE lives entirely in b and c.

    Scale shape: one tokenizing scan → a single 5-counter map-side
    agg; the statistic is arithmetic on one row. Counts are exact
    BIGINT; accuracies and the χ² value are class-A integer ratios
    through the floor kernel at 6dp; the significance compare runs on
    the raw (bit-identical) ratio against a literal. Discordance
    probed non-degenerate at design time (b/c = 106/74, 99/77,
    923/805 at the three SFs)."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    stop6 = F.array(*[F.lit(s) for s in
                      ("the", "a", "of", "and", "to", "in")])
    stop2 = F.array(F.lit("the"), F.lit("and"))
    pred = d.select(
        (F.col("lang") == "en").alias("truth"),
        ((F.size(F.filter(toks, lambda x: F.array_contains(stop6, x)))
          * F.lit(1.0)
          / F.greatest(F.size(toks), F.lit(1))) >= 0.08).alias("pa"),
        (F.size(F.filter(toks, lambda x: F.array_contains(stop2, x)))
         >= 2).alias("pb"))
    cnt = pred.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("pa") == F.col("truth"), 1).otherwise(0))
         .cast("long").alias("n_a_correct"),
        F.sum(F.when(F.col("pb") == F.col("truth"), 1).otherwise(0))
         .cast("long").alias("n_b_correct"),
        F.sum(F.when((F.col("pa") == F.col("truth"))
                     & (F.col("pb") != F.col("truth")), 1)
               .otherwise(0)).cast("long").alias("n_only_a"),
        F.sum(F.when((F.col("pa") != F.col("truth"))
                     & (F.col("pb") == F.col("truth")), 1)
               .otherwise(0)).cast("long").alias("n_only_b"))
    chi2 = ((F.abs(F.col("n_only_a") - F.col("n_only_b")) - 1)
            * (F.abs(F.col("n_only_a") - F.col("n_only_b")) - 1)
            * F.lit(1.0)
            / (F.col("n_only_a") + F.col("n_only_b")))
    return cnt.select(
        "n_docs", "n_a_correct", "n_b_correct", "n_only_a", "n_only_b",
        round_half_up(F.col("n_a_correct") * 1.0 / F.col("n_docs"), 6)
         .alias("acc_a"),
        round_half_up(F.col("n_b_correct") * 1.0 / F.col("n_docs"), 6)
         .alias("acc_b"),
        round_half_up(chi2, 6).alias("mcnemar_chi2"),
        (chi2 >= F.lit(3.841459)).alias("significant_5pct"))


# ---------------------------------------------------------------------------
# X3 — PQ codebook distortion report: when does the quantizer retrain? (r10)
# ---------------------------------------------------------------------------

@register(
    "x3_pq_distortion_report",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sub AS (
      SELECT vec_id, j, e[j * 8 + 1 : j * 8 + 8] AS sv
      FROM v CROSS JOIN (SELECT UNNEST(range(8))::INT AS j)
    ),
    cbv AS (SELECT vec_id FROM v {_sql_hash_sample(_H_CODE, K_CODES)}),
    cb AS (
      SELECT s.vec_id AS cid, s.j, s.sv AS cv
      FROM sub s JOIN cbv ON s.vec_id = cbv.vec_id
    ),
    d AS (
      SELECT s.vec_id, s.j,
             MIN({_sql_l2sq('s.sv', 'c.cv')}) AS d2
      FROM sub s JOIN cb c ON s.j = c.j
      GROUP BY s.vec_id, s.j
    ),
    tot AS (
      SELECT vec_id,
             list_reduce(list_prepend(0.0,
               [x.d2 FOR x IN list_sort(list(struct_pack(j := j,
                                                         d2 := d2)))]),
               (acc, x) -> acc + x) AS td2
      FROM d GROUP BY vec_id
    ),
    q AS (
      SELECT quantile_cont(td2, 0.5) AS p50_total,
             quantile_cont(td2, 0.95) AS p95_total
      FROM tot
    ),
    per_j AS (
      SELECT j, COUNT(*) AS n_vecs,
             CAST(SUM(CAST(FLOOR(d2 * 1000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS mu
      FROM d GROUP BY j
    ),
    ranked AS (
      SELECT j, n_vecs, mu,
             ROW_NUMBER() OVER (ORDER BY mu DESC, j) AS wr
      FROM per_j
    )
    SELECT r.j AS subspace, r.n_vecs,
           {sql_round_half_up(
               'r.mu * 1.0 / (r.n_vecs * 1000000.0)', 6)}
             AS mean_d2,
           (r.wr = 1) AS worst_subspace,
           q.p50_total, q.p95_total
    FROM ranked r CROSS JOIN q
    """,
)
def x3_pq_distortion_report(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X3 — PQ RECONSTRUCTION-DISTORTION report, the monitoring layer
    for the quantizer itself: per subspace, the mean squared error
    between each subvector and its nearest codebook entry (the
    quantity PQ training minimizes — Jégou et al. §II), plus the
    corpus-wide p50/p95 of per-vector TOTAL distortion. The x3 family
    already watches cell ASSIGNMENT health (x3_centroid_balance_report
    — when the coarse quantizer retrains) and delete debt
    (x3_index_compaction); this is the third trigger: codebooks
    trained on last month's distribution drift as the corpus moves,
    distortion creeps, and recall falls with NO visible change in
    cell balance — distortion is the leading indicator, recall the
    lagging one. ``worst_subspace`` names the codebook to retrain
    first (exact-BIGINT argmax over µ-scaled sums, j tiebreak).

    Engine parity: per-(vector, subspace) d2 is a MIN over identical
    sequential-fold doubles; the per-vector total sums its 8 entries
    in EXPLICIT j-order (collect → sort → fold — the x3_pq_topk
    discipline, never an unordered double SUM); subspace means are
    class-A integer ratios of floor-µ-scaled BIGINTs; the p50/p95 run
    through the double-banded staircase lookup
    (``double_value_bucket`` at scale 4096 over the [0, ~1) d2
    domain — never a buffering percentile), interpolated with the
    two-product kernel both engines run.

    Scale shape: encode joins N×8 subvectors against the ckpt'd
    constant-size codebook (K_CODES×8 rows, broadcast); per-subspace
    stats are an 8-row agg; the quantile bands are bounded by the
    distortion DOMAIN, not N. The float vector table never shuffles
    after the subvector explode."""
    from ..operators.staircase import (bucketed_exact_quantiles,
                                       double_value_bucket)
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    sub = v.select(
        "vec_id",
        F.posexplode(F.array(*[F.slice("e", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "sv"))
    cb_ids = _hash_sample(v.select("vec_id"), K_CODES, _H_CODE)
    cb = ckpt(sub.join(F.broadcast(cb_ids), "vec_id")
                 .select(F.col("vec_id").alias("cid"), "j",
                         F.col("sv").alias("cv")))

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    # the encode relation feeds BOTH the per-subspace report and the
    # per-vector totals: materialize it once (the cb ckpt precedent)
    d = ckpt(sub.alias("s")
                .join(F.broadcast(cb), F.col("s.j") == cb["j"])
                .groupBy(F.col("s.vec_id").alias("vec_id"),
                         F.col("s.j").alias("j"))
                .agg(F.min(l2sq(F.col("s.sv"), F.col("cv")))
                      .alias("d2")))
    # the staircase walks `tot` several times (count spec, band
    # stats, rank lookup): materialize the two-column totals once so
    # each pass reads N rows, not the re-aggregated encode subtree
    tot = ckpt(d.groupBy("vec_id")
                .agg(F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("j", "d2"))),
                        lambda s: s["d2"]),
                    F.lit(0.0), lambda acc, x: acc + x).alias("td2")))
    qs = bucketed_exact_quantiles(
        tot, [], "td2", [0.5, 0.95],
        bucket=double_value_bucket(F.col("td2"), 4096.0))
    per_j = (d.groupBy("j")
              .agg(F.count(F.lit(1)).alias("n_vecs"),
                   F.sum(F.floor(F.col("d2") * 1000000.0
                                 + F.lit(0.5)).cast("long"))
                    .cast("long").alias("mu")))
    ww = Window.partitionBy().orderBy(F.col("mu").desc(), "j")
    ranked = per_j.withColumn("wr", F.row_number().over(ww))
    return (ranked
            .crossJoin(F.broadcast(
                qs.select(F.col("q0").alias("p50_total"),
                          F.col("q1").alias("p95_total"))))
            .select(F.col("j").alias("subspace"), "n_vecs",
                    round_half_up(F.col("mu") * 1.0
                                  / (F.col("n_vecs") * 1000000.0), 6)
                     .alias("mean_d2"),
                    (F.col("wr") == 1).alias("worst_subspace"),
                    "p50_total", "p95_total"))


# ---------------------------------------------------------------------------
# X6 — Murphy decomposition of the Brier score (r10): calibration vs
# discrimination, separated exactly
# ---------------------------------------------------------------------------

@register(
    "x6_brier_decomposition",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             LEAST(len(list_filter({SQL_TOKENS},
                       x -> list_contains({_ECE_STOPS_SQL}, x))) * 5.0
                   / GREATEST(len({SQL_TOKENS}), 1), 1.0) AS p
      FROM documents
    ),
    per_p AS (
      SELECT p, COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM scored GROUP BY p
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_scores,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM per_p
    ),
    terms AS (
      SELECT
        {{rel_t}} AS rel_t,
        {{res_t}} AS res_t,
        {{bri_t}} AS bri_t
      FROM per_p CROSS JOIN tot
    ),
    sums AS (
      SELECT
        CAST(ROUND(SUM(CAST(rel_t AS DECIMAL(38,10))), 6) AS DOUBLE)
          AS reliability,
        CAST(ROUND(SUM(CAST(res_t AS DECIMAL(38,10))), 6) AS DOUBLE)
          AS resolution,
        CAST(ROUND(SUM(CAST(bri_t AS DECIMAL(38,10))), 6) AS DOUBLE)
          AS brier
      FROM terms
    )
    SELECT t.n_docs, t.n_scores,
           {{base}} AS base_rate,
           s.brier, s.reliability, s.resolution,
           {{unc}} AS uncertainty,
           (ABS(s.brier - (s.reliability - s.resolution
                           + {{unc}})) <= 0.000002) AS identity_ok,
           (s.resolution > s.reliability) AS skillful
    FROM sums s CROSS JOIN tot t
    """.format(
        rel_t=sql_round_half_up(
            "n * (p - pos * 1.0 / n) * (p - pos * 1.0 / n)"
            " / n_docs", 8),
        res_t=sql_round_half_up(
            "n * (pos * 1.0 / n - n_pos * 1.0 / n_docs)"
            " * (pos * 1.0 / n - n_pos * 1.0 / n_docs) / n_docs", 8),
        bri_t=sql_round_half_up(
            "(n * p * p - 2 * p * pos + pos) * 1.0 / n_docs", 8),
        base=sql_round_half_up("t.n_pos * 1.0 / t.n_docs", 6),
        unc=sql_round_half_up(
            "(t.n_pos * 1.0 / t.n_docs)"
            " * (1.0 - t.n_pos * 1.0 / t.n_docs)", 6),
    ),
)
def x6_brier_decomposition(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X6 — the MURPHY DECOMPOSITION of the Brier score:
    Brier = reliability − resolution + uncertainty, computed over
    DISTINCT forecast values (not bins — the identity is exact only
    when forecasts within a group are constant; a binned version
    carries a within-bin variance residual that would make
    ``identity_ok`` a tolerance judgement instead of an arithmetic
    fact). x6_ece_report answers "is the score calibrated";
    x6_auc_exact answers "does it rank"; this separates the two in
    the SAME unit: reliability is the calibration penalty
    (recalibration can remove it), resolution is the discrimination
    credit (no recalibration can create it), uncertainty is the
    irreducible base-rate floor. ``skillful`` = resolution exceeds
    reliability — whether the classifier beats the always-base-rate
    forecast after its miscalibration is paid for.

    Determinism: the forecast p is the ECE detector's exact int ratio
    (identical bits both engines), so per-distinct-p groups carry
    exact (n, pos) BIGINTs; every decomposition term is a
    deterministic double of exact ints — quantized per group through
    the floor kernel at 8dp and summed as DECIMAL (order-free, the
    ECE wterm pattern), final values rounded at 6dp. The direct
    Brier expands per group as (n·p² − 2·p·pos + pos)/N, so the
    identity check compares two independently-computed roundings —
    tolerance 2e-6 covers only the quantization, not arithmetic
    slack. Shape: one tokenizing scan → distinct-score hash agg
    (bounded by the score DOMAIN) → one-row agg; no windows, no
    sorts."""
    d = _t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    stops = F.array(*[F.lit(w) for w in _ECE_STOPS])
    p = F.least(
        F.size(F.filter(toks,
                        lambda x: F.array_contains(stops, x))) * 5.0
        / F.greatest(F.size(toks), F.lit(1)),
        F.lit(1.0))
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        p.alias("p"))
    per_p = (scored.groupBy("p")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum("y").cast("long").alias("pos")))
    tot = per_p.agg(F.sum("n").cast("long").alias("n_docs"),
                    F.count(F.lit(1)).cast("long").alias("n_scores"),
                    F.sum("pos").cast("long").alias("n_pos"))
    j = per_p.crossJoin(F.broadcast(tot))
    o = F.col("pos") * 1.0 / F.col("n")
    base = F.col("n_pos") * 1.0 / F.col("n_docs")
    terms = j.select(
        round_half_up(F.col("n") * (F.col("p") - o) * (F.col("p") - o)
                      / F.col("n_docs"), 8).alias("rel_t"),
        round_half_up(F.col("n") * (o - base) * (o - base)
                      / F.col("n_docs"), 8).alias("res_t"),
        round_half_up((F.col("n") * F.col("p") * F.col("p")
                       - 2 * F.col("p") * F.col("pos")
                       + F.col("pos")) * 1.0
                      / F.col("n_docs"), 8).alias("bri_t"))

    def dsum(c, name):
        return (F.round(F.sum(F.col(c).cast("decimal(38,10)")), 6)
                 .cast("double").alias(name))

    sums = terms.agg(dsum("rel_t", "reliability"),
                     dsum("res_t", "resolution"),
                     dsum("bri_t", "brier"))
    unc = round_half_up(base * (F.lit(1.0) - base), 6)
    return (sums.crossJoin(F.broadcast(tot))
                .select("n_docs", "n_scores",
                        round_half_up(base, 6).alias("base_rate"),
                        "brier", "reliability", "resolution",
                        unc.alias("uncertainty"),
                        (F.abs(F.col("brier")
                               - (F.col("reliability")
                                  - F.col("resolution") + unc))
                         <= F.lit(0.000002)).alias("identity_ok"),
                        (F.col("resolution") > F.col("reliability"))
                         .alias("skillful")))


# ---------------------------------------------------------------------------
# OP-X2 — content-defined chunking dedup (r11): FastCDC/LBFS-style
# boundaries, the dedup granularity BETWEEN document hash (x1) and
# aligned blocks (x2_span_dedup)
# ---------------------------------------------------------------------------

_CDC_W = 4    #: rolling-shingle width (tokens) that decides boundaries
_CDC_D = 8    #: boundary divisor — P(boundary) = 1/D, mean chunk ≈ D tokens


@register(
    "x2_cdc_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS t FROM documents
    ),
    pos AS (
      SELECT doc_id,
             unnest([ {{'pos': i, 'tok': t[i+1],
                        'b': CASE WHEN i >= {_CDC_W - 1} AND
                             CAST(('0x' || substr(md5(array_to_string(
                                  t[i - {_CDC_W - 2}:i + 1], ' ')), 1, 6))
                                  AS BIGINT) % {_CDC_D} = 0
                             THEN 1 ELSE 0 END}}
                      FOR i IN range(0, len(t)) ]) AS p
      FROM toks
    ),
    chunked AS (
      SELECT doc_id, p.pos AS pos, p.tok AS tok,
             COALESCE(SUM(p.b) OVER (PARTITION BY doc_id ORDER BY p.pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS chunk_id
      FROM pos
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             string_agg(tok, ' ' ORDER BY pos) AS chunk,
             COUNT(*) AS n_tok
      FROM chunked GROUP BY doc_id, chunk_id
    ),
    ranked AS (
      SELECT doc_id, chunk_id, n_tok,
             ROW_NUMBER() OVER (PARTITION BY chunk
                                ORDER BY doc_id, chunk_id) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(COUNT(*) FILTER (rn > 1) AS BIGINT) AS n_dup_chunks,
           CAST(COALESCE(SUM(n_tok) FILTER (rn > 1), 0) AS BIGINT)
             AS n_dup_tokens
    FROM ranked GROUP BY doc_id
    """,
)
def x2_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X2 — content-defined chunk dedup: cut each document where a
    rolling ``_CDC_W``-token shingle hash ≡ 0 (mod ``_CDC_D``) and drop
    every chunk whose exact text occurred earlier corpus-wide (first
    occurrence by (doc_id, chunk_id) — a total order, retry-stable).
    This is the LBFS/FastCDC recipe (Muthitacharoen et al., SOSP'01)
    on token streams: unlike ``x2_span_dedup``'s ALIGNED 20-token
    blocks, CDC boundaries are functions of local content, so an
    insertion near a document's head shifts only the chunk it lands in
    — the cut points downstream re-synchronize and the shared tail
    still dedups. Aligned blocks lose every block after the shift;
    this operator is why storage/corpus dedup systems use CDC.

    Spark shape: tokenize once behind a doc_id repartition barrier,
    build the per-position boundary flags INSIDE the token array (one
    ``transform`` over positions — the md5 shingle hash is a scan-side
    expression, no explode until the flags exist), then one
    ``posexplode`` + a per-doc cumulative window (partitioned on
    doc_id — unbounded cardinality, the allowed direction) assigns
    chunk ids, and the dedup ranking is one window over the chunk
    text. At 100 TB the ranking key would be ``sha2(chunk)`` to
    shrink the exchange (the x1 posture); kept raw here so the oracle
    partitions on the identical value. Probed non-degenerate at all 3
    SFs pre-registration (18–24% dup chunks: near-dup pairs and
    boilerplate prefixes share cut-point-stable chunks).
    """
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", tokens_col("text").alias("t"))
             .repartition(spark.sparkContext.defaultParallelism,
                          "doc_id"))
    n = F.size("t")
    bflag = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.when(
            (i >= _CDC_W - 1)
            & (F.conv(F.substring(F.md5(F.array_join(
                   F.slice(F.col("t"), i - (_CDC_W - 2), _CDC_W),
                   " ")), 1, 6), 16, 10).cast("long")
               % _CDC_D == 0),
            F.lit(1)).otherwise(F.lit(0)))
    zipped = F.when(n > 0, F.zip_with(
        F.col("t"), bflag,
        lambda tok, b: F.struct(tok.alias("tok"), b.alias("b")))
    ).otherwise(F.array().cast("array<struct<tok:string,b:int>>"))
    flat = (toks.select("doc_id",
                        F.posexplode(zipped).alias("pos", "pb"))
                .select("doc_id", "pos",
                        F.col("pb.tok").alias("tok"),
                        F.col("pb.b").alias("b")))
    wc = (Window.partitionBy("doc_id").orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, -1))
    chunked = flat.withColumn(
        "chunk_id", F.coalesce(F.sum("b").over(wc), F.lit(0)))
    chunks = (chunked.groupBy("doc_id", "chunk_id")
              .agg(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "tok"))),
                           lambda s: s["tok"]), " ").alias("chunk"),
                   F.count(F.lit(1)).alias("n_tok")))
    wr = Window.partitionBy("chunk").orderBy("doc_id", "chunk_id")
    ranked = chunks.withColumn("rn", F.row_number().over(wr))
    dup = F.col("rn") > 1
    return (ranked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(dup.cast("long")).alias("n_dup_chunks"),
                 F.coalesce(F.sum(F.when(dup, F.col("n_tok"))),
                            F.lit(0))
                  .cast("long").alias("n_dup_tokens")))


# ---------------------------------------------------------------------------
# OP-X6 — graded retrieval quality: nDCG@k + MRR (r11). x3's recall
# reports grade SET overlap; ranking quality needs position-weighted
# graded relevance — the standard search/RAG eval pair.
# ---------------------------------------------------------------------------

_H_REL = (69621, 7)   #: hash-rank pair for the nDCG query sample
_NDCG_K = 10


@register(
    "x6_ndcg_mrr_report",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, e, sqrt({_sql_dot('e', 'e')}) AS nrm
      FROM v
    ),
    qv AS (
      SELECT vec_id, label, e, nrm FROM n
      {_sql_hash_sample(_H_REL, N_QUERIES)}
    ),
    tk AS (
      SELECT a.vec_id AS query_id,
             CASE WHEN a.label = b.label THEN 2
                  WHEN abs(a.label - b.label) = 1 THEN 1
                  ELSE 0 END AS rel,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY {_sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm)
                 DESC, b.vec_id) AS rn
      FROM qv a JOIN n b ON a.vec_id <> b.vec_id
    ),
    top AS (SELECT query_id, rel, rn FROM tk WHERE rn <= {_NDCG_K}),
    lc AS (SELECT label, COUNT(*) AS cnt FROM n GROUP BY label),
    qc AS (
      SELECT q.vec_id AS query_id,
             COALESCE(ls.cnt, 0) - 1 AS n2,
             COALESCE(ll.cnt, 0) + COALESCE(lh.cnt, 0) AS n1
      FROM qv q
      LEFT JOIN lc ls ON ls.label = q.label
      LEFT JOIN lc ll ON ll.label = q.label - 1
      LEFT JOIN lc lh ON lh.label = q.label + 1
    ),
    iterms AS (
      SELECT qc.query_id,
             CAST(ROUND(CAST((POW(2.0,
                    CASE WHEN p.i <= qc.n2 THEN 2
                         WHEN p.i <= qc.n2 + qc.n1 THEN 1
                         ELSE 0 END) - 1) / LOG2(p.i + 1)
                  AS DECIMAL(38,10)), 10) AS DECIMAL(38,10)) AS iterm
      FROM qc CROSS JOIN range(1, {_NDCG_K + 1}) p(i)
    ),
    dterms AS (
      SELECT query_id,
             CAST(ROUND(CAST((POW(2.0, rel) - 1) / LOG2(rn + 1)
                  AS DECIMAL(38,10)), 10) AS DECIMAL(38,10)) AS dterm,
             CASE WHEN rel > 0 THEN rn END AS hit_rn
      FROM top
    ),
    dq AS (
      SELECT query_id, CAST(SUM(dterm) AS DOUBLE) AS dcg_raw,
             MIN(hit_rn) AS first_hit
      FROM dterms GROUP BY query_id
    ),
    iq AS (
      SELECT query_id, CAST(SUM(iterm) AS DOUBLE) AS idcg_raw
      FROM iterms GROUP BY query_id
    ),
    perq AS (
      SELECT dq.query_id, dq.dcg_raw, iq.idcg_raw, dq.first_hit
      FROM dq JOIN iq USING (query_id)
    ),
    scored AS (
      SELECT query_id,
             {sql_round_half_up('dcg_raw', 6)} AS dcg,
             {sql_round_half_up('idcg_raw', 6)} AS idcg,
             CASE WHEN idcg_raw = 0 THEN 0.0
                  ELSE {sql_round_half_up('dcg_raw / idcg_raw', 6)}
             END AS ndcg,
             CASE WHEN first_hit IS NULL THEN 0.0
                  ELSE {sql_round_half_up('1.0 / first_hit', 6)}
             END AS rr
      FROM perq
    ),
    corpus AS (
      SELECT
        CAST(ROUND(CAST(CAST(SUM(CAST(ndcg AS DECIMAL(38,10)))
             AS DOUBLE) / COUNT(*) AS DECIMAL(38,10)), 6) AS DOUBLE)
          AS mean_ndcg,
        CAST(ROUND(CAST(CAST(SUM(CAST(rr AS DECIMAL(38,10)))
             AS DOUBLE) / COUNT(*) AS DECIMAL(38,10)), 6) AS DOUBLE)
          AS mrr
      FROM scored
    )
    SELECT s.query_id, s.dcg, s.idcg, s.ndcg, s.rr,
           c.mean_ndcg, c.mrr
    FROM scored s CROSS JOIN corpus c
    """,
)
def x6_ndcg_mrr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — nDCG@10 + MRR over the brute-force cosine ranking with
    GRADED label relevance (2 = same label, 1 = adjacent label, 0 =
    irrelevant): the position-weighted retrieval-quality pair every
    search/RAG eval reports, completing the retrieval-eval layer next
    to x3's set-overlap recall reports (recall can't tell a system
    that buries its one relevant hit at rank 10 from one that leads
    with it; nDCG/MRR exist for exactly that).

    IDCG@k is CORPUS-IDEAL (ADVICE r11 — the within-list variant that
    re-sorts only the retrieved top-k scores 1.0 for any well-ordered
    list even when higher-relevance corpus items were missed
    entirely): relevance is a pure label function, so the ideal
    ranking's gains come from label COUNTS alone — n2 = |same-label
    corpus| − 1 (query excluded), n1 = |adjacent-label corpus|, and
    the ideal top-k is n2 twos then n1 ones laid over a k-row
    position dim. No ideal retrieval pass, no self-join: two
    broadcast joins against the bounded label-count dim.

    Parity: the cosine is the bit-exact sequential fold (``_dot``),
    ranking ties broken by vec_id; the only libm terms (pow/log2 — the
    gain/discount) are class-B per the scalars taxonomy, so each term
    rounds through DECIMAL(38,10) at 10 dp and the per-query sums are
    exact DECIMAL sums; 1/first_hit and the final ratios are
    deterministic-identical doubles → class-A floor half-up at 6 dp.
    Corpus means are DECIMAL sums of the rounded per-query values
    broadcast back onto the rows (the ECE/minhash report shape).

    Scale: N_QUERIES is a fixed hash-rank sample (VERDICT r4 item 1) —
    the brute-force side is queries × N LINEAR in the corpus with a
    broadcast query batch, the eval relations after top-k are
    ≤ N_QUERIES·k rows, constants at any SF.

    Data note (degeneracy probe): every label on this corpus has
    > k members at every SF, so n2 ≥ k for all queries and the
    corpus-ideal top-10 is ten rel-2 items — ``idcg`` is therefore
    CONSTANT across queries (its true value, ~7.04), exactly the
    honest consequence of the corpus-ideal definition; per-query
    ``ndcg``/``dcg``/``rr`` stay non-constant and now correctly score
    < 1 for lists that missed same-label items (the within-list
    variant scored such lists 1.0)."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label",
                 _as_double_vec("embedding").alias("e"))
    n = v.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    q_ids = _hash_sample(n.select("vec_id"), N_QUERIES, _H_REL)
    q = (n.join(F.broadcast(q_ids), "vec_id")
          .select(F.col("vec_id").alias("query_id"),
                  F.col("label").alias("qlabel"),
                  F.col("e").alias("qe"),
                  F.col("nrm").alias("qnrm")))
    cos = (_dot(F.col("qe"), F.col("e"))
           / (F.col("qnrm") * F.col("nrm")))
    wt = Window.partitionBy("query_id").orderBy(
        cos.desc(), F.col("vec_id"))
    rel = (F.when(F.col("qlabel") == F.col("label"), 2)
            .when(F.abs(F.col("qlabel") - F.col("label")) == 1, 1)
            .otherwise(0))
    top = (n.repartition(spark.sparkContext.defaultParallelism,
                         "vec_id")
            .crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") <= _NDCG_K)
            .select("query_id", rel.alias("rel"), "rn"))

    def term(rel_col, rank_col):
        raw = ((F.pow(F.lit(2.0), rel_col) - F.lit(1.0))
               / F.log2(rank_col + F.lit(1.0)))
        return F.round(raw.cast("decimal(38,10)"), 10) \
                .cast("decimal(38,10)")

    # corpus-ideal gains from the bounded label-count dim: the ideal
    # top-k for a query is min(n2, k) twos then ones — label counts
    # are the whole ideal ranking, no second retrieval pass
    lbl_cnt = (n.groupBy("label")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    qc = (q.select("query_id", "qlabel")
           .join(F.broadcast(lbl_cnt.select(
                     F.col("label").alias("qlabel"),
                     F.col("cnt").alias("c_same"))),
                 "qlabel", "left")
           .join(F.broadcast(lbl_cnt.select(
                     (F.col("label") + 1).alias("qlabel"),
                     F.col("cnt").alias("c_lo"))),
                 "qlabel", "left")
           .join(F.broadcast(lbl_cnt.select(
                     (F.col("label") - 1).alias("qlabel"),
                     F.col("cnt").alias("c_hi"))),
                 "qlabel", "left")
           .select("query_id",
                   (F.coalesce("c_same", F.lit(0)) - 1).alias("n2"),
                   (F.coalesce("c_lo", F.lit(0))
                    + F.coalesce("c_hi", F.lit(0))).alias("n1")))
    pos = spark.range(1, _NDCG_K + 1).select(F.col("id").alias("i"))
    irel = (F.when(F.col("i") <= F.col("n2"), 2)
             .when(F.col("i") <= F.col("n2") + F.col("n1"), 1)
             .otherwise(0))
    iq = (qc.crossJoin(F.broadcast(pos))
            .select("query_id", term(irel, F.col("i")).alias("iterm"))
            .groupBy("query_id")
            .agg(F.sum("iterm").cast("double").alias("idcg_raw")))
    dq = (top.select("query_id",
                     term(F.col("rel"), F.col("rn")).alias("dterm"),
                     F.when(F.col("rel") > 0, F.col("rn"))
                      .alias("hit_rn"))
             .groupBy("query_id")
             .agg(F.sum("dterm").cast("double").alias("dcg_raw"),
                  F.min("hit_rn").alias("first_hit")))
    perq = dq.join(iq, "query_id")
    scored = perq.select(
        "query_id",
        round_half_up(F.col("dcg_raw"), 6).alias("dcg"),
        round_half_up(F.col("idcg_raw"), 6).alias("idcg"),
        F.when(F.col("idcg_raw") == 0, F.lit(0.0))
         .otherwise(round_half_up(F.col("dcg_raw")
                                  / F.col("idcg_raw"), 6))
         .alias("ndcg"),
        F.when(F.col("first_hit").isNull(), F.lit(0.0))
         .otherwise(round_half_up(F.lit(1.0)
                                  / F.col("first_hit"), 6))
         .alias("rr"))

    def dmean(c, name):
        return (F.round((F.sum(F.col(c).cast("decimal(38,10)"))
                          .cast("double")
                         / F.count(F.lit(1)))
                        .cast("decimal(38,10)"), 6)
                 .cast("double").alias(name))

    corpus = scored.agg(dmean("ndcg", "mean_ndcg"),
                        dmean("rr", "mrr"))
    return (scored.crossJoin(F.broadcast(corpus))
                  .select("query_id", "dcg", "idcg", "ndcg", "rr",
                          "mean_ndcg", "mrr"))


# ---------------------------------------------------------------------------
# OP-X6 — calibration fit by grid-searched Platt scaling (r11): the
# MAINTENANCE half of the calibration program (x6_ece_report measures
# miscalibration; this operator FITS the correction)
# ---------------------------------------------------------------------------

_CAL_TAUS = (0.3, 0.45, 0.6, 0.75, 0.9, 1.05, 1.2, 1.5)
_CAL_BS = (0.0, 0.25, 0.5, 0.75, 1.0)
_CAL_TAU0 = 0.6   #: planted temperature the fit must recover
_CAL_B0 = 0.5     #: planted bias

_SQL_CAL_COIN = ("CAST(('0x' || substr(md5('{salt}:' || "
                 "CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)")


@register(
    "x6_calibration_fit",
    oracle=f"""
    WITH z AS (
      SELECT doc_id,
             ({_SQL_CAL_COIN.format(salt='calz')} % 2001 - 1000)
               / 250.0 AS z,
             {_SQL_CAL_COIN.format(salt='caly')} AS coin_y
      FROM documents
    ),
    planted AS (
      SELECT doc_id, z,
             CASE WHEN coin_y < CAST(FLOOR(
               CAST(ROUND(CAST(1.0 / (1.0 + exp(-((z - {_CAL_B0})
                    / {_CAL_TAU0}))) AS DECIMAL(38,10)), 10) AS DOUBLE)
               * 16777216) AS BIGINT) THEN 1 ELSE 0 END AS y
      FROM z
    ),
    taus(tau) AS (VALUES
      {", ".join(f"(CAST({t} AS DOUBLE))" for t in _CAL_TAUS)}),
    bs(b) AS (VALUES
      {", ".join(f"(CAST({b} AS DOUBLE))" for b in _CAL_BS)}),
    terms AS (
      SELECT t.tau, bs.b,
             CAST(ROUND(CAST(
               CASE WHEN y = 1 THEN ln(1 + exp(-((z - bs.b) / t.tau)))
                    ELSE ln(1 + exp((z - bs.b) / t.tau)) END
               AS DECIMAL(38,10)), 10) AS DECIMAL(38,10)) AS nll_term
      FROM planted CROSS JOIN taus t CROSS JOIN bs
    ),
    nll AS (
      SELECT tau, b, CAST(SUM(nll_term) AS DOUBLE) AS nll_raw,
             COUNT(*) AS n_docs
      FROM terms GROUP BY tau, b
    ),
    best AS (
      SELECT tau AS bt, b AS bb FROM nll
      ORDER BY {sql_round_half_up('nll_raw', 6)}, tau, b LIMIT 1
    )
    SELECT n.tau, n.b, n.n_docs,
           {sql_round_half_up('n.nll_raw', 6)} AS nll,
           (n.tau = b2.bt AND n.b = b2.bb) AS is_best
    FROM nll n CROSS JOIN best b2
    """,
)
def x6_calibration_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-X6 — Platt-scaling calibration fit by exhaustive grid search:
    minimize NLL of ``sigmoid((z − b) / τ)`` over a (τ, b) grid. The
    iterative LBFGS fit every eval stack runs is not SQL-expressible;
    the grid form IS, and at bounded grid size it is the same operator
    a warehouse would productionize (one corpus pass per grid, one
    argmin — re-fit nightly, publish (τ, b) to the serving layer).

    Falsifiable by PARAMETER RECOVERY: labels are PLANTED at a known
    calibration — logits z are exact-rational hash draws on [-4, 4]
    and y ~ Bernoulli(sigmoid((z − {_CAL_B0}) / {_CAL_TAU0})) via an
    integer coin-vs-threshold compare — so the fit must find the
    planted cell (measured pre-registration: exact (0.6, 0.5) at
    sf0.1's 5000 docs; (0.6, 0.25) at the 500-doc SFs — one grid step
    of small-sample bias, data-dependent, non-degenerate). A wrong
    NLL kernel, a broken argmin, or a biased coin all move ``is_best``.

    Parity: z is integer-arithmetic over a 24-bit md5 coin (exact);
    the planting threshold routes its one exp through DECIMAL at 10 dp
    then compares INTEGERS (floor ×2²⁴), so the label set is
    bit-deterministic cross-engine; each NLL term (ln/exp — class B)
    rounds through DECIMAL(38,10) and sums exactly; the argmin orders
    by the class-A-rounded NLL with a (τ, b) tiebreak.

    Scale: the grid is a 40-cell broadcast; one scan of the corpus
    fans each row into 40 partial-aggregated cells (map-side combine
    keeps the shuffle at 40 rows/partition); the argmin is a 1-row
    struct-min (CLAUDE.md idiom), no sort, no window."""
    from ..sources.tables import values_df
    d = _t(spark, sf_dir, "documents")

    def coin(salt):
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col("doc_id").cast("string"))), 1, 6),
            16, 10).cast("long")

    z = (coin("calz") % 2001 - 1000) / F.lit(250.0)
    q0 = F.lit(1.0) / (F.lit(1.0)
                       + F.exp(-((z - F.lit(_CAL_B0))
                                 / F.lit(_CAL_TAU0))))
    thr = F.floor(F.round(q0.cast("decimal(38,10)"), 10)
                   .cast("double") * F.lit(16777216)).cast("long")
    planted = d.select(
        z.alias("z"),
        (coin("caly") < thr).cast("int").alias("y"))
    tg = values_df(spark, [(t,) for t in _CAL_TAUS], "tau double")
    bg = values_df(spark, [(b,) for b in _CAL_BS], "b double")
    w = (F.col("z") - F.col("b")) / F.col("tau")
    nll_term = (F.when(F.col("y") == 1,
                       F.log(F.lit(1.0) + F.exp(-w)))
                 .otherwise(F.log(F.lit(1.0) + F.exp(w))))
    terms = (planted.crossJoin(F.broadcast(tg))
                    .crossJoin(F.broadcast(bg))
                    .select("tau", "b",
                            F.round(nll_term.cast("decimal(38,10)"),
                                    10).cast("decimal(38,10)")
                             .alias("nll_term")))
    nll = (terms.groupBy("tau", "b")
                .agg(F.sum("nll_term").cast("double").alias("nll_raw"),
                     F.count(F.lit(1)).alias("n_docs")))
    from ..functions.scalars import round_half_up as _rhu6
    best = (nll.agg(F.min(F.struct(
                _rhu6(F.col("nll_raw"), 6).alias("k"),
                F.col("tau").alias("bt"),
                F.col("b").alias("bb"))).alias("m"))
               .select(F.col("m.bt").alias("bt"),
                       F.col("m.bb").alias("bb")))
    return (nll.crossJoin(F.broadcast(best))
               .select("tau", "b", "n_docs",
                       _rhu6(F.col("nll_raw"), 6).alias("nll"),
                       ((F.col("tau") == F.col("bt"))
                        & (F.col("b") == F.col("bb")))
                        .alias("is_best")))


# ---------------------------------------------------------------------------
# OP-X6 — PSI-triggered recalibration (r12, VERDICT r11 next-round
# #4): x6's monitor → act loop. x2 has the compaction policy, x3 the
# codebook split; x6 had drift MONITORS (score PSI, IDF drift) but no
# triggered action. This composes them: per staged day-window, the
# score-PSI trigger decides whether the Platt grid REFITS on that
# window or the published reference fit stands — both branches
# oracle-replayed, the x2_triggered pattern applied to model
# maintenance.
# ---------------------------------------------------------------------------

_RCAL_TAUS = (0.45, 0.6, 0.75, 0.9)
_RCAL_BS = (0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5)
#: planted per-day score drift (z-units). Labels follow the SHIFTED
#: calibration (P(y=1|s) = sigmoid((s − (b0 + δ_day)) / τ0), i.e. the
#: same Bernoulli draw as the reference because s − δ_day = z), so a
#: fired refit must RECOVER b ≈ b0 + δ_day — parameter-recovery
#: falsification, the x6_calibration_fit discipline.
_RCAL_DELTAS = (0.0, 0.5, 1.0)
#: fire iff day-PSI ≥ this. Design-probed (DuckDB, r12) so decisions
#: are NON-CONSTANT at every SF and both branches always exercised:
#: per-day PSI (0.0165, 0.1033, 0.7391) at sf0.001/sf0.01 → (F, T, T);
#: (0.0021, 0.0682, 0.8315) at sf0.1 → (F, F, T); margins ≥ 8%.
_RCAL_PSI_THR = 0.095
_RCAL_BINS = 8


@register(
    "x6_psi_triggered_recalibration",
    oracle=f"""
    WITH zz AS MATERIALIZED (
      SELECT doc_id, doc_id % 3 AS day,
             ({_SQL_CAL_COIN.format(salt='rcz')} % 2001 - 1000)
               / 250.0 AS z,
             {_SQL_CAL_COIN.format(salt='rcy')} AS coin_y
      FROM documents
    ),
    lab AS MATERIALIZED (
      SELECT day, z,
             z + CASE day WHEN 0 THEN {_RCAL_DELTAS[0]}
                          WHEN 1 THEN {_RCAL_DELTAS[1]}
                          ELSE {_RCAL_DELTAS[2]} END AS s,
             CASE WHEN coin_y < CAST(FLOOR(
               CAST(ROUND(CAST(1.0 / (1.0 + exp(-((z - {_CAL_B0})
                    / {_CAL_TAU0}))) AS DECIMAL(38,10)), 10) AS DOUBLE)
               * 16777216) AS BIGINT) THEN 1 ELSE 0 END AS y
      FROM zz
    ),
    refb AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(z + 4.0) AS INTEGER), 0),
                   {_RCAL_BINS - 1}) AS bin_id, COUNT(*) AS n
      FROM lab GROUP BY 1
    ),
    reft AS (SELECT SUM(n) AS t FROM refb),
    dayb AS (
      SELECT day, LEAST(GREATEST(CAST(FLOOR(s + 4.0) AS INTEGER), 0),
                        {_RCAL_BINS - 1}) AS bin_id, COUNT(*) AS n
      FROM lab GROUP BY 1, 2
    ),
    dayt AS (SELECT day, SUM(n) AS t FROM dayb GROUP BY day),
    grid8 AS (
      SELECT d.day, b.bin_id
      FROM (SELECT DISTINCT day FROM lab) d
      CROSS JOIN range({_RCAL_BINS}) b(bin_id)
    ),
    jj AS (
      SELECT g.day, COALESCE(db.n, 0) AS nq, dt.t AS tq,
             COALESCE(rb.n, 0) AS np, rt.t AS tp
      FROM grid8 g
      LEFT JOIN dayb db ON db.day = g.day AND db.bin_id = g.bin_id
      JOIN dayt dt ON dt.day = g.day
      LEFT JOIN refb rb ON rb.bin_id = g.bin_id
      CROSS JOIN reft rt
    ),
    pterm AS (
      SELECT day, CAST(ROUND(CAST(
               ((nq + 0.5) / (tq + {_RCAL_BINS * 0.5})
                - (np + 0.5) / (tp + {_RCAL_BINS * 0.5}))
               * ln(((nq + 0.5) / (tq + {_RCAL_BINS * 0.5}))
                    / ((np + 0.5) / (tp + {_RCAL_BINS * 0.5})))
               AS DECIMAL(38,10)), 6) AS DOUBLE) AS pt
      FROM jj
    ),
    psi AS (
      SELECT day, CAST(SUM(CAST(pt AS DECIMAL(38,10))) AS DOUBLE)
               AS psi6
      FROM pterm GROUP BY day
    ),
    taus(tau) AS (VALUES
      {", ".join(f"(CAST({t} AS DOUBLE))" for t in _RCAL_TAUS)}),
    bs(b) AS (VALUES
      {", ".join(f"(CAST({b} AS DOUBLE))" for b in _RCAL_BS)}),
    rterms AS (
      SELECT t.tau, bs.b,
             CAST(ROUND(CAST(
               CASE WHEN y = 1 THEN ln(1 + exp(-((z - bs.b) / t.tau)))
                    ELSE ln(1 + exp((z - bs.b) / t.tau)) END
               AS DECIMAL(38,10)), 10) AS DECIMAL(38,10)) AS nt
      FROM lab CROSS JOIN taus t CROSS JOIN bs
    ),
    rnll AS (
      SELECT tau, b, CAST(SUM(nt) AS DOUBLE) AS nll
      FROM rterms GROUP BY tau, b
    ),
    rbest AS (
      SELECT tau AS rt, b AS rb FROM rnll
      ORDER BY {sql_round_half_up('nll', 6)}, tau, b LIMIT 1
    ),
    dterms AS (
      SELECT day, t.tau, bs.b,
             CAST(ROUND(CAST(
               CASE WHEN y = 1 THEN ln(1 + exp(-((s - bs.b) / t.tau)))
                    ELSE ln(1 + exp((s - bs.b) / t.tau)) END
               AS DECIMAL(38,10)), 10) AS DECIMAL(38,10)) AS nt
      FROM lab CROSS JOIN taus t CROSS JOIN bs
    ),
    dnll AS (
      SELECT day, tau, b, CAST(SUM(nt) AS DOUBLE) AS nll
      FROM dterms GROUP BY day, tau, b
    ),
    dbest AS (
      SELECT day, tau AS dt, b AS db FROM (
        SELECT day, tau, b,
               ROW_NUMBER() OVER (PARTITION BY day
                 ORDER BY {sql_round_half_up('nll', 6)}, tau, b)
                 AS rn
        FROM dnll) WHERE rn = 1
    ),
    cnt AS (SELECT day, COUNT(*) AS n_day FROM lab GROUP BY day)
    SELECT CAST(p.day AS BIGINT) AS day,
           CAST(c.n_day AS BIGINT) AS n_day,
           p.psi6 AS psi6,
           (p.psi6 >= {_RCAL_PSI_THR}) AS recal_fired,
           CASE WHEN p.psi6 >= {_RCAL_PSI_THR} THEN d.dt ELSE r.rt
             END AS tau_pub,
           CASE WHEN p.psi6 >= {_RCAL_PSI_THR} THEN d.db ELSE r.rb
             END AS b_pub
    FROM psi p
    JOIN cnt c USING (day)
    JOIN dbest d USING (day)
    CROSS JOIN rbest r
    """,
)
def x6_psi_triggered_recalibration(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """OP-X6 — recalibration as a POLICY: per staged day-window
    (doc_id mod 3), the model-score PSI against the FROZEN reference
    histogram (the training-time distribution a serving stack keeps)
    decides whether that window's Platt grid refit replaces the
    published (τ, b) or the reference fit stands. Closes x6's
    monitor → act loop (VERDICT r11 #4): x6_score_drift_psi is the
    monitor, x6_calibration_fit the actuator, and HERE the engine
    reads its own trigger — the fired boolean, the per-day PSI, and
    both branches' published cells are all engine-computed and
    oracle-replayed (no pinned columns).

    The drift is PLANTED per day (δ = {_RCAL_DELTAS}) and the labels
    follow the shifted calibration, so the policy is falsifiable by
    PARAMETER RECOVERY twice over: a fired day's refit must find
    b ≈ b0 + δ_day on the grid (measured at registration: the
    reference fit recovers the exact planted (0.6, 0.5) at EVERY SF;
    day 2's refit finds b = 1.5 = b0 + δ2 exactly at every SF (τ 0.6
    at sf0.1, 0.75 at the 500-doc SFs); day 1's small-SF refit
    (0.45, 0.75) sits one grid step under its b0 + δ1 = 1.0 target —
    167-doc small-sample bias, data-dependent, non-degenerate), and a
    not-fired day must republish the reference cell. The
    PSI trigger is design-probed NON-CONSTANT at every SF (threshold
    note on ``_RCAL_PSI_THR``): (F, T, T) at sf0.001/sf0.01,
    (F, F, T) at sf0.1 — both branches everywhere.

    Parity: z is integer-arithmetic over a 24-bit md5 coin; the
    planting threshold routes its one exp through DECIMAL then
    compares INTEGERS (the x6_calibration_fit recipe); PSI terms and
    NLL terms (ln/exp — class B) round through DECIMAL(38,10) at
    6/10 dp and sum exactly, so the trigger compare and both argmins
    are bit-deterministic cross-engine; argmins order by class-A
    rounded NLL with a (τ, b) tiebreak.

    Scale: the reference histogram is Θ(bins); per-day PSI is a
    bounded-bin agg; the refit is one corpus pass fanned into a
    28-cell broadcast grid with map-side combine (shuffle =
    days × cells rows); both argmins are struct-mins (CLAUDE.md
    idiom), no sort, no window over unbounded rows. At 100 TB the
    day-window is a partition-pruned scan and the published-cell
    ledger is O(1)."""
    from ..sources.tables import values_df
    d = _t(spark, sf_dir, "documents")

    def coin(salt):
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col("doc_id").cast("string"))), 1, 6),
            16, 10).cast("long")

    day = (F.col("doc_id") % 3).cast("int")
    z = (coin("rcz") % 2001 - 1000) / F.lit(250.0)
    delta = F.element_at(
        F.array(*[F.lit(float(x)) for x in _RCAL_DELTAS]), day + 1)
    q0 = F.lit(1.0) / (F.lit(1.0)
                       + F.exp(-((z - F.lit(_CAL_B0))
                                 / F.lit(_CAL_TAU0))))
    thr = F.floor(F.round(q0.cast("decimal(38,10)"), 10)
                   .cast("double") * F.lit(16777216)).cast("long")
    # one relation feeds the histogram, both grids and the counts —
    # materialize the md5/exp scalar work once (the f5 pattern)
    base = ckpt(d.select(
        day.alias("day"), z.alias("z"), (z + delta).alias("s"),
        (coin("rcy") < thr).cast("int").alias("y")))

    def bin8(c):
        return F.least(F.greatest(F.floor(c + F.lit(4.0))
                                  .cast("int"), F.lit(0)),
                       F.lit(_RCAL_BINS - 1))

    smooth = _RCAL_BINS * 0.5
    refb = (base.groupBy(bin8(F.col("z")).alias("bin_id"))
                .agg(F.count(F.lit(1)).alias("n")))
    reft = refb.agg(F.sum("n").alias("tp"))
    dayb = (base.groupBy("day", bin8(F.col("s")).alias("bin_id"))
                .agg(F.count(F.lit(1)).alias("n")))
    dayt = dayb.groupBy("day").agg(F.sum("n").alias("tq"))
    bins = values_df(spark, [(i,) for i in range(_RCAL_BINS)],
                     "bin_id int")
    grid8 = (base.select("day").distinct()
                 .crossJoin(F.broadcast(bins)))
    jj = (grid8.join(dayb, ["day", "bin_id"], "left")
               .withColumnRenamed("n", "nq")
               .join(dayt, "day")
               .join(F.broadcast(refb.withColumnRenamed("n", "np")),
                     "bin_id", "left")
               .crossJoin(F.broadcast(reft)))
    qf = (F.coalesce("nq", F.lit(0)) + 0.5) / (F.col("tq") + smooth)
    pf = (F.coalesce("np", F.lit(0)) + 0.5) / (F.col("tp") + smooth)
    pterm = jj.select(
        "day",
        F.round(((qf - pf) * F.log(qf / pf)).cast("decimal(38,10)"),
                6).cast("double").alias("pt"))
    psi = (pterm.groupBy("day")
                .agg(F.sum(F.col("pt").cast("decimal(38,10)"))
                      .cast("double").alias("psi6")))

    tg = values_df(spark, [(t,) for t in _RCAL_TAUS], "tau double")
    bg = values_df(spark, [(b,) for b in _RCAL_BS], "b double")

    def nll_term(score):
        w = (score - F.col("b")) / F.col("tau")
        t = (F.when(F.col("y") == 1,
                    F.log(F.lit(1.0) + F.exp(-w)))
              .otherwise(F.log(F.lit(1.0) + F.exp(w))))
        return (F.round(t.cast("decimal(38,10)"), 10)
                 .cast("decimal(38,10)"))

    gridded = base.crossJoin(F.broadcast(tg)).crossJoin(F.broadcast(bg))
    rnll = (gridded.select("tau", "b",
                           nll_term(F.col("z")).alias("nt"))
                   .groupBy("tau", "b")
                   .agg(F.sum("nt").cast("double").alias("nll")))
    rbest = (rnll.agg(F.min(F.struct(
                 round_half_up(F.col("nll"), 6).alias("k"),
                 F.col("tau").alias("rt"),
                 F.col("b").alias("rb"))).alias("m"))
                 .select(F.col("m.rt").alias("rt"),
                         F.col("m.rb").alias("rb")))
    dnll = (gridded.select("day", "tau", "b",
                           nll_term(F.col("s")).alias("nt"))
                   .groupBy("day", "tau", "b")
                   .agg(F.sum("nt").cast("double").alias("nll")))
    dbest = (dnll.groupBy("day")
                 .agg(F.min(F.struct(
                     round_half_up(F.col("nll"), 6).alias("k"),
                     F.col("tau").alias("dt"),
                     F.col("b").alias("db"))).alias("m"))
                 .select("day", F.col("m.dt").alias("dt"),
                         F.col("m.db").alias("db")))
    cnt = base.groupBy("day").agg(F.count(F.lit(1)).alias("n_day"))
    fired = F.col("psi6") >= F.lit(_RCAL_PSI_THR)
    return (psi.join(cnt, "day").join(dbest, "day")
               .crossJoin(F.broadcast(rbest))
               .select(F.col("day").cast("long").alias("day"),
                       F.col("n_day").cast("long").alias("n_day"),
                       "psi6",
                       fired.alias("recal_fired"),
                       F.when(fired, F.col("dt"))
                        .otherwise(F.col("rt")).alias("tau_pub"),
                       F.when(fired, F.col("db"))
                        .otherwise(F.col("rb")).alias("b_pub")))


# ---------------------------------------------------------------------------
# OP-X3 — codebook split retrain (r11): the ACTION behind the r10
# distortion trigger. x3_pq_distortion_report names worst_subspace;
# this operator RETRAINS it — the LBG split step — and proves the
# improvement, closing x3's monitor → act loop the way
# x2_triggered_compaction_stream closed dedup's.
# ---------------------------------------------------------------------------

@register(
    "x3_codebook_split_retrain",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sub AS MATERIALIZED (
      SELECT vec_id, j, e[j*8+1 : j*8+8] AS sv
      FROM v CROSS JOIN (SELECT UNNEST(range(8))::INT AS j)
    ),
    cbv AS (SELECT vec_id FROM v {_sql_hash_sample(_H_CODE, K_CODES)}),
    cb AS MATERIALIZED (
      SELECT s.vec_id AS cid, s.j, s.sv AS cv
      FROM sub s JOIN cbv ON s.vec_id = cbv.vec_id
    ),
    d AS MATERIALIZED (
      SELECT s.vec_id, s.j, MIN({_sql_l2sq('s.sv', 'c.cv')}) AS d2
      FROM sub s JOIN cb c ON s.j = c.j
      GROUP BY s.vec_id, s.j
    ),
    per_j AS MATERIALIZED (
      SELECT j, COUNT(*) AS n_vecs,
             CAST(SUM(CAST(FLOOR(d2 * 1000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS mu
      FROM d GROUP BY j
    ),
    worst AS (SELECT j AS wj FROM per_j ORDER BY mu DESC, j LIMIT 1),
    newcode AS (
      SELECT d.vec_id AS new_id FROM d, worst
      WHERE d.j = worst.wj ORDER BY d.d2 DESC, d.vec_id LIMIT 1
    ),
    cb2 AS (
      SELECT c.cv FROM cb c, worst WHERE c.j = worst.wj
      UNION ALL
      SELECT s.sv FROM sub s, worst, newcode
      WHERE s.j = worst.wj AND s.vec_id = newcode.new_id
    ),
    aft AS (
      SELECT CAST(SUM(CAST(FLOOR(d2a * 1000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS mu_after
      FROM (
        SELECT s.vec_id, MIN({_sql_l2sq('s.sv', 'c.cv')}) AS d2a
        FROM sub s JOIN worst ON s.j = worst.wj CROSS JOIN cb2 c
        GROUP BY s.vec_id
      )
    )
    SELECT p.j AS subspace, p.n_vecs,
           {sql_round_half_up(
               'p.mu * 1.0 / (p.n_vecs * 1000000.0)', 6)} AS mean_d2,
           (p.j = w.wj) AS retrained,
           CASE WHEN p.j = w.wj
                THEN {sql_round_half_up(
                    'a.mu_after * 1.0 / (p.n_vecs * 1000000.0)', 6)}
                ELSE {sql_round_half_up(
                    'p.mu * 1.0 / (p.n_vecs * 1000000.0)', 6)}
           END AS mean_d2_after,
           CAST(CASE WHEN p.j = w.wj THEN p.mu - a.mu_after
                ELSE 0 END AS BIGINT) AS improvement_mu,
           CASE WHEN p.j = w.wj THEN n.new_id END AS new_code_id
    FROM per_j p CROSS JOIN worst w CROSS JOIN aft a
         CROSS JOIN newcode n
    """,
)
def x3_codebook_split_retrain(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """OP-X3 — LBG codebook SPLIT on the worst PQ subspace: measure
    per-subspace distortion with the live codebook (the r10 trigger's
    arithmetic, verbatim), pick the worst subspace by exact µ-scaled
    BIGINT argmax, ADD one code there — the farthest-fit member, the
    Linde-Buzo-Gray split step — re-encode that subspace against the
    K+1 codebook, and report the before/after distortion with the
    exact-integer improvement. The split is the deterministic retrain:
    a Lloyd mean-update would put float averages (class-B order noise)
    INTO the codebook and poison every downstream distance with
    unreplayable bits, while the split's new code is an EXISTING
    subvector chosen by (d2 DESC, vec_id) argmax — so the whole
    retrain replays bit-for-bit, and the improvement is guaranteed
    structurally (the farthest point's own distortion drops to zero,
    no other assignment can worsen).

    This closes x3's monitor → act loop (the r11 theme: a trigger you
    never fire is a dashboard, not a maintenance policy): cell balance
    (r9) and distortion (r10) WATCH the index; compaction (r9) acts on
    delete debt; this acts on codebook debt. ``improvement_mu`` > 0 on
    the retrained row is the falsifiable post-condition, exact BIGINT.

    Scale: encode = N×8 subvectors vs a broadcast constant codebook
    (ckpt'd — the distortion report's measured pattern); the retrain
    adds ONE extra encode pass restricted to the worst subspace
    (N×(K+1) folds); argmax/argmin are 1-row struct-min aggs; nothing
    sorts or windows a data-sized relation."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double_vec("embedding").alias("e"))
    sub = v.select(
        "vec_id",
        F.posexplode(F.array(*[F.slice("e", 8 * j + 1, 8)
                               for j in range(8)])).alias("j", "sv"))
    cb_ids = _hash_sample(v.select("vec_id"), K_CODES, _H_CODE)
    cb = ckpt(sub.join(F.broadcast(cb_ids), "vec_id")
                 .select(F.col("vec_id").alias("cid"), "j",
                         F.col("sv").alias("cv")))

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    d = ckpt(sub.alias("s")
                .join(F.broadcast(cb), F.col("s.j") == cb["j"])
                .groupBy(F.col("s.vec_id").alias("vec_id"),
                         F.col("s.j").alias("j"))
                .agg(F.min(l2sq(F.col("s.sv"), F.col("cv")))
                      .alias("d2")))
    mu_term = F.floor(F.col("d2") * 1000000.0 + F.lit(0.5)) \
               .cast("long")
    per_j = (d.groupBy("j")
              .agg(F.count(F.lit(1)).alias("n_vecs"),
                   F.sum(mu_term).cast("long").alias("mu")))
    worst = (per_j.agg(F.min(F.struct(
                 (-F.col("mu")).alias("k"),
                 F.col("j").alias("wj"))).alias("m"))
                  .select(F.col("m.wj").alias("wj")))
    newcode = (d.join(F.broadcast(worst), d["j"] == F.col("wj"))
                .agg(F.max(F.struct(
                    F.col("d2").alias("k"),
                    (-F.col("vec_id")).alias("nk"))).alias("m"))
                .select((-F.col("m.nk")).cast("long")
                         .alias("new_id")))
    cb2 = (cb.join(F.broadcast(worst), cb["j"] == F.col("wj"))
             .select("cv")
             .unionByName(
                 sub.join(F.broadcast(worst),
                          sub["j"] == F.col("wj"))
                    .join(F.broadcast(newcode),
                          sub["vec_id"] == F.col("new_id"))
                    .select(F.col("sv").alias("cv"))))
    aft = (sub.alias("s")
              .join(F.broadcast(worst), F.col("s.j") == F.col("wj"))
              .crossJoin(F.broadcast(cb2))
              .groupBy(F.col("s.vec_id"))
              .agg(F.min(l2sq(F.col("s.sv"), F.col("cv")))
                    .alias("d2a"))
              .agg(F.sum(F.floor(F.col("d2a") * 1000000.0
                                 + F.lit(0.5)).cast("long"))
                    .cast("long").alias("mu_after")))
    mean_before = round_half_up(
        F.col("mu") * 1.0 / (F.col("n_vecs") * 1000000.0), 6)
    is_w = F.col("j") == F.col("wj")
    return (per_j.crossJoin(F.broadcast(worst))
                 .crossJoin(F.broadcast(aft))
                 .crossJoin(F.broadcast(newcode))
                 .select(
        F.col("j").alias("subspace"), "n_vecs",
        mean_before.alias("mean_d2"),
        is_w.alias("retrained"),
        F.when(is_w, round_half_up(
                   F.col("mu_after") * 1.0
                   / (F.col("n_vecs") * 1000000.0), 6))
         .otherwise(mean_before).alias("mean_d2_after"),
        F.when(is_w, F.col("mu") - F.col("mu_after"))
         .otherwise(F.lit(0)).cast("long").alias("improvement_mu"),
        F.when(is_w, F.col("new_id")).alias("new_code_id")))


# ---------------------------------------------------------------------------
# OP-X6 — multiclass precision/recall/F1 report (r11): the summary
# metric layer over a multiclass classifier; x4_lang_confusion shows
# the MATRIX, this reduces it to the per-class and averaged scores a
# model card reports.
# ---------------------------------------------------------------------------

_MCF_PRED_SQL = f"""
      SELECT doc_id, lang,
             CASE
               WHEN CAST(len(list_filter({{toks}}, x -> x IN
                    ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
                    / len({{toks}}) >= 0.08 THEN 'en'
               WHEN len(list_filter({{toks}}, x -> x IN
                    ('der', 'die', 'das', 'und'))) > 0 THEN 'de'
               WHEN len(list_filter({{toks}}, x -> x IN
                    ('le', 'la', 'et', 'les'))) > 0 THEN 'fr'
               WHEN len(list_filter({{toks}}, x -> x IN
                    ('el', 'los', 'las', 'y'))) > 0 THEN 'es'
               ELSE 'und'
             END AS predicted
      FROM t
""".format(toks="toks")


@register(
    "x6_multiclass_f1_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
    ),
    pred AS ({_MCF_PRED_SQL}),
    labels AS (
      SELECT DISTINCT lang AS label FROM pred
      UNION SELECT DISTINCT predicted FROM pred
    ),
    perc AS (
      SELECT l.label,
             CAST((SELECT COUNT(*) FROM pred
                   WHERE lang = l.label AND predicted = l.label)
                  AS BIGINT) AS tp,
             CAST((SELECT COUNT(*) FROM pred
                   WHERE lang <> l.label AND predicted = l.label)
                  AS BIGINT) AS fp,
             CAST((SELECT COUNT(*) FROM pred
                   WHERE lang = l.label AND predicted <> l.label)
                  AS BIGINT) AS fn
      FROM labels l
    ),
    scored AS (
      SELECT label, tp, fp, fn, tp + fn AS support,
             CASE WHEN tp + fp = 0 THEN 0.0
                  ELSE {sql_round_half_up('tp * 1.0 / (tp + fp)', 6)}
             END AS precision,
             CASE WHEN tp + fn = 0 THEN 0.0
                  ELSE {sql_round_half_up('tp * 1.0 / (tp + fn)', 6)}
             END AS recall,
             CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE {sql_round_half_up(
                      '2.0 * tp / (2 * tp + fp + fn)', 6)}
             END AS f1
      FROM perc
    ),
    avgs AS (
      SELECT
        CAST(ROUND(CAST(CAST(SUM(CAST(f1 AS DECIMAL(38,10)))
             AS DOUBLE) / COUNT(*) AS DECIMAL(38,10)), 6) AS DOUBLE)
          AS macro_f1,
        {sql_round_half_up(
            'SUM(tp) * 1.0 / (SELECT COUNT(*) FROM pred)', 6)}
          AS micro_f1,
        CASE WHEN SUM(support) = 0 THEN 0.0
             ELSE CAST(ROUND(CAST(CAST(SUM(CAST(f1 * support
                  AS DECIMAL(38,10))) AS DOUBLE) / SUM(support)
                  AS DECIMAL(38,10)), 6) AS DOUBLE)
        END AS weighted_f1
      FROM scored
    )
    SELECT s.label, s.tp, s.fp, s.fn, CAST(s.support AS BIGINT)
             AS support,
           s.precision, s.recall, s.f1,
           a.macro_f1, a.micro_f1, a.weighted_f1
    FROM scored s CROSS JOIN avgs a
    """,
)
def x6_multiclass_f1_report(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """OP-X6 — per-class precision/recall/F1 + macro / micro /
    support-weighted averages for the x4 lang-id classifier against
    the declared ``lang`` — the model-card summary every multiclass
    eval reports. x4_lang_confusion shows the full matrix; this is
    its reduction to the scores a gate reads, and on this corpus it
    is a deliberately HONEST verdict: the lang-id heuristic mostly
    answers en/und (its own docstring), so four of six classes score
    f1 = 0 and macro-F1 ≈ 0.05–0.06 — the metric layer exposing a
    weak classifier is the point (a report that only ever grades good
    models is untested on the failure half of its range).

    Label set = truth ∪ predictions (sklearn's union convention), so
    the never-true 'und' class appears with support 0 / precision 0
    and drags the macro average — exactly what macro-F1 is FOR.
    Zero-denominator classes score 0 by explicit guard, not NULL.

    Parity: tp/fp/fn are exact BIGINTs from one bounded
    (lang × predicted) hash agg re-keyed by three outer joins on the
    ≤|labels| dim; every ratio is a class-A floor half-up of an
    integer ratio; macro/weighted averages are DECIMAL sums of the
    ROUNDED per-class scores (order-free). In single-label multiclass
    micro-F1 equals accuracy — emitted under its metric name.

    Scale: one tokenizing scan → one bounded cell agg; everything
    downstream lives on ≤|labels| rows."""
    d = _t(spark, sf_dir, "documents")
    stop_en = ("the", "a", "of", "and", "to", "in")
    t = d.select("doc_id", "lang", tokens_col("text").alias("toks"))

    def hits(words):
        return F.size(F.filter("toks", lambda x: x.isin(*words)))

    predicted = (F.when(hits(stop_en) * F.lit(1.0)
                        / F.size("toks") >= 0.08, "en")
                  .when(hits(("der", "die", "das", "und")) > 0, "de")
                  .when(hits(("le", "la", "et", "les")) > 0, "fr")
                  .when(hits(("el", "los", "las", "y")) > 0, "es")
                  .otherwise("und"))
    pred = t.select("lang", predicted.alias("predicted"))
    cells = (pred.groupBy("lang", "predicted")
                 .agg(F.count(F.lit(1)).cast("long").alias("n"))
                 .localCheckpoint(eager=True))
    labels = (cells.select(F.col("lang").alias("label"))
                   .unionByName(cells.select(
                       F.col("predicted").alias("label")))
                   .distinct())
    diag = (cells.filter(F.col("lang") == F.col("predicted"))
                 .select(F.col("lang").alias("label"),
                         F.col("n").alias("tp")))
    row_tot = (cells.groupBy("lang")
                    .agg(F.sum("n").cast("long").alias("rt"))
                    .withColumnRenamed("lang", "label"))
    col_tot = (cells.groupBy("predicted")
                    .agg(F.sum("n").cast("long").alias("ct"))
                    .withColumnRenamed("predicted", "label"))
    base = (labels.join(diag, "label", "left")
                  .join(row_tot, "label", "left")
                  .join(col_tot, "label", "left")
                  .select("label",
                          F.coalesce("tp", F.lit(0)).cast("long")
                           .alias("tp"),
                          (F.coalesce("ct", F.lit(0))
                           - F.coalesce("tp", F.lit(0)))
                          .cast("long").alias("fp"),
                          (F.coalesce("rt", F.lit(0))
                           - F.coalesce("tp", F.lit(0)))
                          .cast("long").alias("fn")))

    def ratio(num, den):
        return F.when(den == 0, F.lit(0.0)) \
                .otherwise(round_half_up(num * 1.0 / den, 6))

    scored = base.select(
        "label", "tp", "fp", "fn",
        (F.col("tp") + F.col("fn")).cast("long").alias("support"),
        ratio(F.col("tp"), F.col("tp") + F.col("fp"))
            .alias("precision"),
        ratio(F.col("tp"), F.col("tp") + F.col("fn"))
            .alias("recall"),
        ratio(2 * F.col("tp"),
              2 * F.col("tp") + F.col("fp") + F.col("fn"))
            .alias("f1")).localCheckpoint(eager=True)
    n_total = pred.count()
    avgs = scored.agg(
        F.round((F.sum(F.col("f1").cast("decimal(38,10)"))
                  .cast("double") / F.count(F.lit(1)))
                .cast("decimal(38,10)"), 6)
         .cast("double").alias("macro_f1"),
        round_half_up(F.sum("tp") * 1.0 / F.lit(n_total), 6)
         .alias("micro_f1"),
        F.when(F.sum("support") == 0, F.lit(0.0))
         .otherwise(
            F.round((F.sum((F.col("f1") * F.col("support"))
                            .cast("decimal(38,10)")).cast("double")
                     / F.sum("support")).cast("decimal(38,10)"), 6)
             .cast("double")).alias("weighted_f1"))
    return (scored.crossJoin(F.broadcast(avgs))
                  .select("label", "tp", "fp", "fn", "support",
                          "precision", "recall", "f1",
                          "macro_f1", "micro_f1", "weighted_f1"))
