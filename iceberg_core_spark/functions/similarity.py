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
import pandas as pd
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
    ONE scan; the rank window's ``rn <= k`` filter plans as a native
    ``WindowGroupLimit`` whose partial pass bounds the window's shuffle
    to ~k × partitions × |queries| skinny rows — without that bound the
    window would shuffle EVERY scored (corpus × queries) row, which at
    100 TB × thousands of queries is the plan's whole cost. NULL sims
    (null embeddings) rank LAST (window DESC-NULLS-LAST).
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
    # the rank-<=-k filter triggers Spark's native WindowGroupLimit
    # (3.5+): each task forwards at most k rows per query before the
    # exchange — the Arrow local_group_topk pre-pass this path used is
    # the same selection done in Python, so it was dropped (r15
    # optimization; see search._rank_topk). Shuffle stays bounded at
    # ~k × partitions × |queries| skinny rows; NULL sims still rank
    # last (window DESC-NULLS-LAST is now the only ordering rule).
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


def _write_centroid_doc(root: str, model, train_df, vec_col: str,
                        id_col: str) -> dict:
    """Atomically (re)write the index's centroid doc, recording the
    fit-time mean squared distance to the nearest centroid (KMeans
    trainingCost / n over the training sample) — the baseline
    :meth:`IvfIndex.staleness` compares against."""
    import json
    import os

    n_train = train_df.count()
    mean_sq = (float(model.summary.trainingCost) / n_train
               if n_train else 0.0)
    meta = {
        "centroids": [[float(x) for x in c]
                      for c in model.clusterCenters()],
        "vec_col": vec_col,
        "id_col": id_col,
        "fit_mean_sq_dist": mean_sq,
    }
    tmp = os.path.join(root, IvfIndex.CENTROIDS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, IvfIndex.CENTROIDS_FILE))
    return meta


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

    STALENESS: the quantizer is fit ONCE — as the corpus drifts
    (appends from a shifted distribution), the centroids stop modeling
    the data and probing n_probe cells misses a growing share of true
    neighbors (recall decays; results silently degrade, queries do not
    fail). Two sampled monitors, each one narrow scan + an
    Arrow-batched numpy pass, no shuffle:

    - :meth:`staleness` — quantization-error ratio: sampled mean
      squared distance to the nearest centroid ÷ the same quantity
      recorded at fit time. ≈1.0 on a fresh index; rises as the
      distribution drifts away from the centroids (catches drift even
      when every stored cell is still consistent). Rebuild around
      ≥1.5–2.
    - :meth:`assignment_drift` — sampled fraction of vectors whose
      stored cell is NOT their nearest current centroid (~0 when
      healthy). Catches assignments out of sync with the centroid doc
      (bulk loads that skipped assignment, manual centroid edits).

    Operational discipline for a 100 TB deployment: check both after
    bulk ingests from a new source and on a maintenance cadence;
    :meth:`rebuild` costs one k-means sample fit + one full
    reassignment rewrite — an offline maintenance job, never a
    query-path cost; readers keep the old snapshot until the new
    commit lands (snapshot isolation). Scale n_cells with corpus
    growth (rows/cell roughly constant keeps probe cost flat).
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
        # fit-time mean squared distance to nearest centroid — the
        # baseline for the staleness() ratio (absent on pre-r5 indexes)
        self.fit_mean_sq_dist = meta.get("fit_mean_sq_dist")

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
        _write_centroid_doc(root, model, train, vec_col, id_col)
        return cls(spark, root)

    def _sampled_nearest(self, sample_fraction: float, seed: int):
        """Sampled (nearest-cell, squared-distance, stored-cell) frame:
        one narrow scan + an Arrow-batched numpy pass against the
        (tiny, closure-shipped) centroid matrix; no shuffle."""
        from pyspark.sql.functions import pandas_udf

        cents = self.centroids  # (k, d)

        @pandas_udf("nearest int, d2 double")
        def near(vs: pd.Series) -> pd.DataFrame:
            m = np.vstack(vs.values)  # (batch, d)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return pd.DataFrame({
                "nearest": d2.argmin(axis=1).astype("int32"),
                "d2": d2.min(axis=1),
            })

        sample = self.table.scan().select(
            F.col(self.vec_col).cast("array<double>").alias("__v"),
            F.col("cell"))
        if sample_fraction < 1.0:
            sample = sample.sample(fraction=sample_fraction, seed=seed)
        return sample.select(near(F.col("__v")).alias("n"), "cell") \
            .select("n.nearest", "n.d2", "cell")

    def assignment_drift(self, sample_fraction: float = 0.1,
                         seed: int = 7) -> float:
        """Sampled fraction of vectors whose stored cell is NOT their
        nearest current centroid (see class docstring: catches
        assignments out of sync with the centroid doc). ~0 when
        healthy."""
        row = self._sampled_nearest(sample_fraction, seed).select(
            (F.col("nearest") != F.col("cell")).cast("int").alias("moved")
        ).agg(F.avg("moved").alias("rate")).first()
        return float(row.rate) if row.rate is not None else 0.0

    def staleness(self, sample_fraction: float = 0.1,
                  seed: int = 7) -> float:
        """Quantization-error ratio: sampled mean squared distance to
        the nearest centroid ÷ the fit-time baseline. ≈1.0 fresh;
        rises as the corpus drifts away from the centroids (see class
        docstring — rebuild around ≥1.5–2). Raises on indexes built
        before the baseline was recorded (rebuild once to record it)."""
        if self.fit_mean_sq_dist is None:
            raise ValueError(
                "index has no fit-time quantization-error baseline "
                "(built by an older version) — rebuild() records one")
        row = self._sampled_nearest(sample_fraction, seed) \
            .agg(F.avg("d2").alias("msd")).first()
        if row.msd is None:
            return 1.0
        return float(row.msd) / float(self.fit_mean_sq_dist)

    def rebuild(
        self,
        df: DataFrame | None = None,
        n_cells: int | None = None,
        seed: int = 42,
        sample_fraction: float | None = None,
        max_rows_per_file: int = 1_000_000,
    ) -> "IvfIndex":
        """Refit the coarse quantizer and reassign every vector — the
        maintenance step for a drifted index (see class docstring).
        ``df`` defaults to the index's own stored vectors (pass the
        current corpus frame to also pick up rows added outside the
        index); ``n_cells`` defaults to the existing cell count.
        The reassignment lands as ONE overwrite commit on the
        assignment table (readers keep the previous snapshot until it
        lands) and the centroid doc is replaced atomically."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        source = (df if df is not None
                  else self.table.scan().select(self.id_col, self.vec_col))
        k = n_cells if n_cells is not None else len(self.centroids)
        feat = source.select(
            F.col(self.id_col),
            F.col(self.vec_col).cast("array<double>").alias("__arr"),
        ).withColumn("__vec", array_to_vector("__arr"))
        train = (
            feat.sample(fraction=sample_fraction, seed=seed)
            if sample_fraction is not None else feat
        )
        model = KMeans(k=k, seed=seed, featuresCol="__vec",
                       predictionCol="__cell").fit(train)
        assigned = model.transform(feat).select(
            F.col(self.id_col),
            F.col("__arr").alias(self.vec_col),
            F.col("__cell").cast("int").alias("cell"),
        )
        self.table.overwrite(assigned,
                             max_rows_per_file=max_rows_per_file)
        meta = _write_centroid_doc(self.root, model, train,
                                   self.vec_col, self.id_col)
        self.centroids = np.asarray(meta["centroids"], dtype=float)
        self.fit_mean_sq_dist = meta["fit_mean_sq_dist"]
        return self

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
