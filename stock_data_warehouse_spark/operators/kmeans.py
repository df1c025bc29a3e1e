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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .checkpoint import ckpt


def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def kmeans_fit_assign(vectors: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "e", k: int = 8,
                      n_iter: int = 5) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from hash-min medoid seeds and
    return ``(id, cell, sq_dist)`` — each vector with its final cluster
    and squared distance to that centroid.

    The per-iteration plan: broadcast the K centroids as a literal
    relation, cross-join (K is bounded), window-argmin per vector, then
    ``posexplode`` the vectors and hash-aggregate per (cell, dim) to
    rebuild centroids — partial aggregation keeps the shuffle at
    K×dim×partitions rows.
    """
    v = ckpt(vectors.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("e")))
    # Seeds: the k vectors with the smallest md5(id). orderBy+limit is
    # a distributed partial top-k; cell ids 0..k-1 come from a k-row
    # collect_list+posexplode (bounded — never touches the full data).
    seeds = (v.orderBy(F.md5(F.col("id").cast("string")), "id")
              .limit(k))
    centroids = ckpt(seeds
                     .agg(F.array_sort(
                         F.collect_list(F.struct("id", "e")))
                          .alias("se"))
                     .select(F.posexplode(
                         F.transform("se", lambda s: s["e"]))
                         .alias("cell", "ce")))

    assigned = None
    for _ in range(n_iter):
        scored = v.crossJoin(F.broadcast(centroids))
        w = Window.partitionBy("id").orderBy(
            _sq_dist(F.col("e"), F.col("ce")).asc(), F.col("cell"))
        assigned = (scored.withColumn("rk", F.row_number().over(w))
                          .filter(F.col("rk") == 1)
                          .select("id", "e", "cell",
                                  _sq_dist(F.col("e"), F.col("ce"))
                                  .alias("sq_dist")))
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
    return assigned.select("id", "cell", "sq_dist")


def kmeans_fit_assign_grouped(vectors: DataFrame, group_col: str = "j",
                              id_col: str = "vec_id",
                              vec_col: str = "sv", k: int = 8,
                              n_iter: int = 3
                              ) -> tuple[DataFrame, DataFrame]:
    """Train an INDEPENDENT k-means codebook per group — all groups in
    the same jobs — and return ``(assigned, centroids)``:
    ``assigned = (grp, id, cell, sq_dist)`` and
    ``centroids = (grp, cell, ce)``.

    This is the per-subspace trainer of a product-quantization index
    (plans/extensions.x3_ivfpq_learned): with ``group_col`` = the PQ
    subspace ordinal, one invocation learns all 8 codebooks
    simultaneously — per iteration ONE broadcast of the groups×k
    centroid table (bounded: e.g. 8×32 rows), ONE argmin window keyed
    (grp, id), and ONE per-(grp, cell, dim) hash aggregation. Never a
    per-group driver loop: 8 sequential trainers would multiply job
    count by the group cardinality for zero extra parallelism.

    Seeding exploits the PQ structure — every group carries the same
    id universe (each vector contributes one subvector per subspace) —
    so the per-group seeds are the SAME k hash-min ids, selected once
    via a distributed partial top-k over distinct ids and broadcast
    back; cell ordinals 0..k-1 come from the sorted k-row seed list
    (bounded collect_list, never the full data). Determinism matches
    :func:`kmeans_fit_assign`: md5 seeding, (cell) argmin tiebreak.
    """
    v = ckpt(vectors.select(F.col(group_col).alias("grp"),
                            F.col(id_col).alias("id"),
                            F.col(vec_col).alias("e")))
    ids = v.select("id").distinct()
    seed_ids = (ids.orderBy(F.md5(F.col("id").cast("string")), "id")
                   .limit(k))
    seed_cells = (seed_ids
                  .agg(F.array_sort(F.collect_list("id")).alias("a"))
                  .select(F.posexplode("a").alias("cell", "sid")))
    centroids = ckpt(v.join(F.broadcast(seed_cells),
                            v.id == seed_cells.sid)
                      .select("grp", "cell", F.col("e").alias("ce")))

    assigned = None
    for _ in range(n_iter):
        scored = v.join(F.broadcast(centroids), "grp")
        w = Window.partitionBy("grp", "id").orderBy(
            _sq_dist(F.col("e"), F.col("ce")).asc(), F.col("cell"))
        assigned = (scored.withColumn("rk", F.row_number().over(w))
                          .filter(F.col("rk") == 1)
                          .select("grp", "id", "e", "cell",
                                  _sq_dist(F.col("e"), F.col("ce"))
                                  .alias("sq_dist")))
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
    return (assigned.select("grp", "id", "cell", "sq_dist"),
            centroids)
