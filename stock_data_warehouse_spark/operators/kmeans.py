"""Distributed Lloyd's k-means over an embedding column — the trainer
behind a production IVF index (plans/extensions.x3_ivf_topk uses seeded
medoids precisely so its query stays oracle-checkable; this operator is
the path that replaces those medoids with learned centroids).

Scale posture (100 TB):

- Each iteration is ONE shuffle: assign every vector to its nearest
  centroid (broadcast K×dim centroids — a few MB for any sane K), then
  partial-aggregate per-dimension sums map-side and reduce to K rows.
- Centroids live in the driver only as a K×dim literal (bounded);
  vectors never leave the executors.
- ``ckpt`` per iteration truncates lineage (same discipline
  as operators/graph.py).
- Seeding is the K vectors with the smallest ``md5(id)`` — a
  deterministic pseudo-random spread that plans as a distributed
  partial top-K (``TakeOrderedAndProject``: each partition keeps K
  candidates, the driver merges K×partitions rows). No global sort, no
  single-partition window, no extra count job.
- Determinism: no rand() anywhere, and assignment ties break toward
  the lower centroid id. Across engines the *means* are still
  FP-order-dependent, so k-means results are rows-only territory by
  design — the properties that matter (assignment completeness,
  inertia monotonicity) are tested instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import ckpt


def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _hash_order(id_col: str = "id"):
    """The deterministic pseudo-random total order used for BOTH seeds
    and training samples: (md5(id), id). Seeds are the first K rows of
    it, the training sample the first S — so seeds ⊆ sample for any
    S ≥ K and both plan as distributed partial top-k."""
    return [F.md5(F.col(id_col).cast("string")), F.col(id_col)]


def _argmin_assign(v: DataFrame, centroids: DataFrame,
                   keys: list[str]) -> DataFrame:
    """Nearest-centroid assignment via ``min(struct(d2, cell))``:
    lexicographic struct order IS the (d2 ASC, cell ASC) tiebreak, and
    the aggregation combines map-side — K candidate rows per vector
    collapse before the exchange, where a sort-window would shuffle and
    sort all K×N rows. d2 is computed ONCE per candidate (a window form
    evaluates the fold twice: ordering + projection)."""
    join_keys = [k for k in keys if k != "id"]
    scored = (v.join(F.broadcast(centroids), join_keys)
              if join_keys else v.crossJoin(F.broadcast(centroids)))
    scored = scored.withColumn("d2", _sq_dist(F.col("e"), F.col("ce")))
    best = (scored.groupBy(*keys)
                  .agg(F.min(F.struct("d2", "cell")).alias("b")))
    return (v.join(best, keys)
             .select(*keys, "e", F.col("b.cell").alias("cell"),
                     F.col("b.d2").alias("sq_dist")))


def kmeans_fit_assign(vectors: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "e", k: int = 8,
                      n_iter: int = 5,
                      train_sample: int | None = None,
                      inertia_log: list | None = None,
                      centroids_log: list | None = None) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from hash-min medoid seeds and
    return ``(id, cell, sq_dist)`` — every vector with its cluster
    under the final trained centroids and squared distance to it.

    ``train_sample=S`` is the FAISS-style scale posture: the iteration
    loop sees only the first S vectors of the deterministic hash order
    (a bounded TakeOrdered sample — k-means needs ~100·K training
    points, not the corpus), and the full relation is assigned ONCE
    against the trained centroids. Training cost becomes
    O(n_iter · S · K) + one full assignment pass instead of
    O(n_iter · N · K) — at 100 TB that is the difference between a
    constant-size training job and n_iter full-corpus passes.
    ``train_sample=None`` trains on everything (the exhaustive form).

    ``inertia_log``, if a list, receives one 1-row DataFrame
    ``(it, inertia)`` per iteration — total squared distance of the
    TRAINING set to the centroids the iteration started from. Lloyd's
    guarantees the sequence non-increasing; callers use it for the
    monotonicity verdict without re-training a shorter twin.

    ``centroids_log``, if a list, receives the final trained
    ``(cell, ce)`` centroid relation (K rows, already checkpointed) —
    callers that need the centroids themselves (residual PQ encodes
    ``vec − centroid(cell)``, streaming ingest assigns arrivals against
    a frozen index) read them from here instead of re-deriving.

    The per-iteration plan: broadcast the K centroids as a literal
    relation (K is bounded), map-side argmin via ``min(struct)``, then
    ``posexplode`` the vectors and hash-aggregate per (cell, dim) to
    rebuild centroids — partial aggregation keeps the shuffle at
    K×dim×partitions rows.
    """
    v = ckpt(vectors.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("e")))
    vt = (ckpt(v.orderBy(*_hash_order()).limit(train_sample))
          if train_sample is not None else v)
    # Seeds: the k vectors with the smallest md5(id) — the hash-order
    # prefix, so they are inside any training sample with S ≥ k.
    seeds = vt.orderBy(*_hash_order()).limit(k)
    centroids = ckpt(seeds
                     .agg(F.array_sort(
                         F.collect_list(F.struct("id", "e")))
                          .alias("se"))
                     .select(F.posexplode(
                         F.transform("se", lambda s: s["e"]))
                         .alias("cell", "ce")))

    for it in range(n_iter):
        assigned = _argmin_assign(vt, centroids, ["id"])
        if inertia_log is not None:
            assigned = ckpt(assigned)
            inertia_log.append(assigned.agg(
                F.lit(it).alias("it"),
                F.sum("sq_dist").alias("inertia")))
        # rebuild: per-(cell, dim) mean via posexplode + hash agg
        dims = assigned.select(
            "cell", F.posexplode("e").alias("dim", "val"))
        means = (dims.groupBy("cell", "dim")
                     .agg(F.avg("val").alias("m"))
                     .groupBy("cell")
                     .agg(F.array_sort(
                         F.collect_list(F.struct("dim", "m")))
                         .alias("dm"))
                     .select("cell",
                             F.transform("dm", lambda s: s["m"])
                             .alias("ce")))
        centroids = ckpt(means)
    if centroids_log is not None:
        centroids_log.append(centroids)
    # ONE full-relation assignment against the trained centroids; the
    # result is consumed several times downstream (completeness,
    # inertia, code joins) — truncate its lineage once.
    final = _argmin_assign(v, centroids, ["id"])
    return ckpt(final.select("id", "cell", "sq_dist"))


def kmeans_fit_assign_grouped(vectors: DataFrame, group_col: str = "j",
                              id_col: str = "vec_id",
                              vec_col: str = "sv", k: int = 8,
                              n_iter: int = 3,
                              train_sample: int | None = None,
                              inertia_log: list | None = None,
                              ) -> tuple[DataFrame, DataFrame]:
    """Train an INDEPENDENT k-means codebook per group — all groups in
    the same jobs — and return ``(assigned, centroids)``:
    ``assigned = (grp, id, cell, sq_dist)`` and
    ``centroids = (grp, cell, ce)``.

    This is the per-subspace trainer of a product-quantization index
    (plans/extensions.x3_ivfpq_learned): with ``group_col`` = the PQ
    subspace ordinal, one invocation learns all 8 codebooks
    simultaneously — per iteration ONE broadcast of the groups×k
    centroid table (bounded: e.g. 8×32 rows), ONE map-side argmin
    (min(struct), same shape as :func:`kmeans_fit_assign`), and ONE
    per-(grp, cell, dim) hash aggregation. Never a per-group driver
    loop: 8 sequential trainers would multiply job count by the group
    cardinality for zero extra parallelism.

    ``train_sample=S`` samples IDS (the same S hash-min ids for every
    group — each vector contributes one subvector per subspace, so the
    per-group training sets stay aligned) and assigns the full
    relation once at the end; ``inertia_log`` receives per-iteration
    1-row (it, inertia) totals over the training set, exactly like the
    ungrouped trainer.

    Seeding exploits the PQ structure — every group carries the same
    id universe — so the per-group seeds are the SAME k hash-min ids,
    selected once via a distributed partial top-k over distinct ids
    and broadcast back; cell ordinals 0..k-1 come from the sorted
    k-row seed list (bounded collect_list, never the full data).
    Determinism matches :func:`kmeans_fit_assign`: md5 seeding,
    (cell) argmin tiebreak.
    """
    v = ckpt(vectors.select(F.col(group_col).alias("grp"),
                            F.col(id_col).alias("id"),
                            F.col(vec_col).alias("e")))
    ids = v.select("id").distinct()
    if train_sample is not None:
        train_ids = ckpt(ids.orderBy(*_hash_order())
                            .limit(train_sample))
        vt = ckpt(v.join(F.broadcast(train_ids), "id"))
        seed_pool = train_ids
    else:
        vt = v
        seed_pool = ids
    seed_ids = seed_pool.orderBy(*_hash_order()).limit(k)
    seed_cells = (seed_ids
                  .agg(F.array_sort(F.collect_list("id")).alias("a"))
                  .select(F.posexplode("a").alias("cell", "sid")))
    centroids = ckpt(vt.join(F.broadcast(seed_cells),
                             vt.id == seed_cells.sid)
                       .select("grp", "cell", F.col("e").alias("ce")))

    for it in range(n_iter):
        assigned = _argmin_assign(vt, centroids, ["grp", "id"])
        if inertia_log is not None:
            assigned = ckpt(assigned)
            inertia_log.append(assigned.agg(
                F.lit(it).alias("it"),
                F.sum("sq_dist").alias("inertia")))
        dims = assigned.select(
            "grp", "cell", F.posexplode("e").alias("dim", "val"))
        means = (dims.groupBy("grp", "cell", "dim")
                     .agg(F.avg("val").alias("m"))
                     .groupBy("grp", "cell")
                     .agg(F.array_sort(
                         F.collect_list(F.struct("dim", "m")))
                         .alias("dm"))
                     .select("grp", "cell",
                             F.transform("dm", lambda s: s["m"])
                             .alias("ce")))
        centroids = ckpt(means)
    final = _argmin_assign(v, centroids, ["grp", "id"])
    return (ckpt(final.select("grp", "id", "cell", "sq_dist")),
            centroids)
