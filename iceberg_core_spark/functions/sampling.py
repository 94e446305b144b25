"""Sampling and splitting operators for training-data pipelines.

The split a data pipeline actually ships is HASH-BUCKET, not random:
``bucket = md5(id || salt) mod 100`` assigns every document a stable
bucket, so train/test membership is (a) reproducible across runs and
engines, (b) stable under re-ingestion — a re-processed doc lands in
the same split, never leaking test docs into train — and (c) pure
map-side (no shuffle, no state). Random sampling (seeded Bernoulli /
stratified) is provided for downsampling, where cross-run stability is
not a contract.

All hash-split expressions use md5 (not xxhash64) precisely because it
is engine-portable: the DuckDB oracle evaluates the identical bucket.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table


def hash_bucket(id_col, salt: str = "", n_buckets: int = 100) -> F.Column:
    """Stable bucket in [0, n_buckets) from md5 of the id (+ salt):
    the first 8 hex chars as an integer, mod n. Engine-portable —
    DuckDB twin: ``('0x' || substr(md5(id || salt), 1, 8))::BIGINT %
    n``."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt)) \
        if salt else F.col(id_col).cast("string")
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n_buckets


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    test_pct: int = 10,
    val_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column (train/val/test) by hash bucket. Changing
    ``salt`` re-deals the split; changing percentages keeps assignments
    NESTED (test buckets are a prefix), so growing the test set never
    moves a train doc into test."""
    b = hash_bucket(id_col, salt)
    split = (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli row sample — map-side, no shuffle. Deterministic
    for a fixed (seed, partitioning) but NOT engine-portable; use
    split_assign when membership is a contract."""
    return df.sample(fraction=fraction, seed=seed)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum DETERMINISTIC sample: e.g. downsample the dominant
    language while keeping the tail — the standard corpus rebalancing
    move. Same hash-bucket membership rule as ``split_assign``
    (keep iff ``md5-bucket(id||salt) < fraction·N``), so the sample is
    reproducible across runs/engines and stable under re-ingestion —
    properties Bernoulli ``sampleBy`` cannot give. Map-side; no
    shuffle; no driver-side stratum discovery."""
    n = 10_000
    b = hash_bucket(id_col, salt, n)
    thresh = F.lit(0)
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum,
                        F.lit(int(round(frac * n)))).otherwise(thresh)
    return df.filter(b < thresh)


def sample_stratified_random(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``) for when independent
    randomness per run is wanted rather than stable membership."""
    return df.sampleBy(strata_col, fractions, seed)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

def split_train_test(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-bucket split counts per (lang, split) — fully oracle-able
    because the bucket expression evaluates identically in DuckDB."""
    d = split_assign(load_table(spark, sf, "documents"),
                     test_pct=10, val_pct=5)
    return (
        d.groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("min_doc"))
    )


SPLIT_TRAIN_TEST_SQL = """
WITH b AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 10 THEN 'test'
            WHEN bucket < 15 THEN 'val'
            ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc
FROM b
GROUP BY 1, 2
"""


STRATA_FRACTIONS = {"de": 0.1, "en": 0.5, "es": 0.1, "fr": 0.5, "zh": 0.1}


def sample_stratified_q(spark: SparkSession, sf: str) -> DataFrame:
    """Fully oracle-checkable: deterministic hash-bucket stratified
    downsample (downsample three languages to 10%, keep en/fr at 50%),
    then per-lang counts + extremal ids. Membership is the identical
    md5 expression in DuckDB — exact value match, not a rate check."""
    s = sample_stratified(load_table(spark, sf, "documents"),
                          "lang", STRATA_FRACTIONS)
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SAMPLE_STRATIFIED_SQL = """
WITH b AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 8))::BIGINT
           % 10000 AS bucket
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM b
WHERE bucket < CASE lang WHEN 'de' THEN 1000 WHEN 'en' THEN 5000
                         WHEN 'es' THEN 1000 WHEN 'fr' THEN 5000
                         WHEN 'zh' THEN 1000 ELSE 0 END
GROUP BY lang
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "split_train_test": (split_train_test, SPLIT_TRAIN_TEST_SQL),
    "sample_stratified": (sample_stratified_q, SAMPLE_STRATIFIED_SQL),
}
