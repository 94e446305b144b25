"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline
  (DuckDB-oracle-checkable). One pass over the table, no shuffle until
  the final top-k (TakeOrderedAndProject keeps k rows per task).
- ``lsh_topk``: random-hyperplane LSH — the scale path. Buckets come
  from sign bits of projections onto seeded deterministic hyperplanes;
  only the query's bucket (plus optional multi-probe neighbors) is
  scanned. At 100 TB the bucket column is a write-time partition/sort
  key, so a query prunes to a handful of files via the IceTable
  manifest — the same min/max trick the reference uses for key ranges.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_core_spark.functions.dedup import cosine, fround


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Rounded to 4
    decimals with id tiebreak so ranking is engine-deterministic."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = fround(cosine(_as_double(vec_col), q), 4)
    return (
        df.select(id_col, *extra_cols, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
) -> DataFrame:
    """Batch exact top-k: many query vectors at once. The query set is
    broadcast (it is small by definition), so the corpus streams through
    ONE scan with zero shuffle until the per-query top-k window — the
    shape that scales to a 100 TB corpus × thousands of queries.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__dv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        fround(cosine(F.col("__dv"), F.col("__qv")), 4).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "sim", "rn")
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into cells; only the ``n_probe`` cells whose
    centroids are nearest the query are scanned, then exact cosine
    reranks. The other standard ANN scale path beside random-hyperplane
    LSH (lsh_topk).

    One-shot convenience: fits the quantizer per call, so use it for
    ad-hoc exploration and as the semantics twin of ``IvfIndex`` — the
    build-once/query-many form below is the scale path (sample-fit,
    cell-partitioned IceTable, manifest pruning); candidate fraction ≈
    n_probe / n_cells either way.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__arr"),
    ).withColumn("__vec", array_to_vector("__arr"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__vec",
                predictionCol="__cell")
    model = km.fit(feat)
    assigned = model.transform(feat)

    qv = np.asarray(query_vec, dtype=float)
    centers = model.clusterCenters()
    order = np.argsort([float(np.linalg.norm(np.asarray(c) - qv))
                        for c in centers])
    probe_cells = [int(c) for c in order[:n_probe]]

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = fround(cosine(F.col("__arr"), q), 4)
    return (
        assigned.filter(F.col("__cell").isin(probe_cells))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


class IvfIndex:
    """Build-once / query-many IVF index — the scale form of ``ivf_topk``
    (which re-fits k-means per call and exists as the one-shot twin).

    ``build`` fits the coarse quantizer on a SAMPLE of the corpus
    (centroids converge on a fraction of 100 TB), assigns every vector a
    cell id, and persists the assignment as an IceTable PARTITIONED BY
    cell — so a query's n_probe cells prune to a handful of files via
    the manifest before any data is read. Centroids live in a small JSON
    doc beside the table. ``topk`` loads centroids (driver-side, tiny),
    picks the nearest cells with numpy, and scans only those partitions
    with an exact-cosine rerank.
    """

    CENTROIDS_FILE = "_ivf_centroids.json"

    def __init__(self, spark, root: str):
        import json
        import os

        from iceberg_core_spark.table import IceTable

        self.spark = spark
        self.root = root
        self.table = IceTable(spark, root)
        with open(os.path.join(root, self.CENTROIDS_FILE)) as f:
            meta = json.load(f)
        self.centroids = np.asarray(meta["centroids"], dtype=float)
        self.vec_col = meta["vec_col"]
        self.id_col = meta["id_col"]

    @classmethod
    def build(
        cls,
        spark,
        df: DataFrame,
        root: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        n_cells: int = 16,
        seed: int = 42,
        sample_fraction: float | None = None,
        max_rows_per_file: int = 1_000_000,
    ) -> "IvfIndex":
        import json
        import os

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from iceberg_core_spark.table import IceTable

        feat = df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__arr"),
        ).withColumn("__vec", array_to_vector("__arr"))
        train = (
            feat.sample(fraction=sample_fraction, seed=seed)
            if sample_fraction is not None else feat
        )
        model = KMeans(k=n_cells, seed=seed, featuresCol="__vec",
                       predictionCol="__cell").fit(train)
        assigned = model.transform(feat).select(
            F.col(id_col),
            F.col("__arr").alias(vec_col),
            F.col("__cell").cast("int").alias("cell"),
        )
        IceTable.create(spark, root, assigned, partition_col="cell",
                        key_col=id_col, max_rows_per_file=max_rows_per_file)
        meta = {
            "centroids": [[float(x) for x in c] for c in model.clusterCenters()],
            "vec_col": vec_col,
            "id_col": id_col,
        }
        tmp = os.path.join(root, cls.CENTROIDS_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(root, cls.CENTROIDS_FILE))
        return cls(spark, root)

    def topk(self, query_vec: list[float], k: int = 10,
             n_probe: int = 4) -> DataFrame:
        from functools import reduce

        qv = np.asarray(query_vec, dtype=float)
        order = np.argsort(
            [float(np.linalg.norm(c - qv)) for c in self.centroids]
        )
        cells = [int(c) for c in order[:n_probe]]
        probed = reduce(
            lambda a, b: a.unionByName(b),
            [self.table.query(partition=c) for c in cells],
        )
        q = F.array(*[F.lit(float(v)) for v in query_vec])
        sim = fround(cosine(F.col(self.vec_col).cast("array<double>"), q), 4)
        return (
            probed.select(self.id_col, sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(self.id_col))
            .limit(k)
        )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (public LSH construction)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col, planes: np.ndarray):
    """LSH bucket id = integer of sign bits of ⟨plane_i, v⟩."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(_as_double(vec_col), p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows whose LSH bucket is within
    ``multiprobe_hamming`` bits of the query's bucket, then exact
    cosine rerank. Candidate fraction ≈ sum_{h<=H} C(n_planes,h)/2^p."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(plane @ qv) > 0:
            qbucket |= 1 << i
    bucketed = df.withColumn("__bucket", bucket_expr(vec_col, planes))
    probe = F.bit_count(
        F.col("__bucket").bitwiseXOR(F.lit(qbucket).cast("long"))
    ) <= multiprobe_hamming
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = fround(cosine(_as_double(vec_col), q), 4)
    return (
        bucketed.filter(probe)
        .select(id_col, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
