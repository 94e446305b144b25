"""Engine-portable MinHash-LSH — the SAME banding algorithm as
``dedup.minhash_lsh_pairs`` — 3-token shingles, min-hash signatures,
banded candidate join, exact-Jaccard verify — but built on md5 instead
of xxhash64, so
the ENTIRE pipeline (signatures → bands → candidate join → exact
verify) evaluates identically in DuckDB and is fully value-hash
oracle-checked. The production twin keeps xxhash64 (JVM-native,
faster); this variant exists to prove the algorithm itself
cross-engine — upgrading the hash-family op from the driver's
rows-only check to a full hash match.

Scale shape is identical to the production twin: signatures are pure
Column expressions over the token array (map-side), the one shuffle
carries skinny (band_idx, band_hash, doc_id) triples, candidates
dedupe before the exact-Jaccard verify re-joins token arrays by id.

Parameters are fixed module constants so the Spark plan and the
generated oracle SQL are built from the same numbers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.functions.dedup import (
    _spread_verify,
    fround,
    fround_sql,
    jaccard,
    shingles,
)
from iceberg_core_spark.session import load_table

N_HASHES = 16
N_BANDS = 4          # 4 rows per band
ROWS_PER_BAND = N_HASHES // N_BANDS
THRESHOLD = 0.5


def _hash_fn(seed: str):
    """Single-arg lambda factory: F.transform passes (element, index)
    to TWO-arg lambdas, so the seed must close over a one-arg one."""
    def f(t):
        return F.conv(
            F.substring(F.md5(F.concat(t, F.lit(seed))), 1, 8), 16, 10
        ).cast("long")
    return f


def _minhash_sig(toks) -> list:
    """One min-hash per seed: min over tokens of the first 8 md5 hex
    chars of (token || seed), as int64 — the ('0x' || substr(md5(..),
    1, 8))::BIGINT expression DuckDB evaluates identically."""
    return [
        F.array_min(F.transform(toks, _hash_fn(f"s{i}"))).alias(f"sig{i}")
        for i in range(N_HASHES)
    ]


def _band_hash(b: int):
    cols = [
        F.col(f"sig{b * ROWS_PER_BAND + r}").cast("string")
        for r in range(ROWS_PER_BAND)
    ]
    return F.md5(F.concat_ws(",", *cols))


def minhash_portable_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = THRESHOLD,
) -> DataFrame:
    """(doc_a, doc_b, jacc): pairs sharing at least one LSH band whose
    exact shingle Jaccard clears ``threshold``."""
    sigs = df.select(
        F.col(id_col), shingles(F.col(text_col)).alias("__t")
    ).select(id_col, "__t", *_minhash_sig(F.col("__t")))
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"),
                         _band_hash(b).alias("band_hash"))
                for b in range(N_BANDS)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = bands.select(F.col(id_col).alias("doc_a"), "band_idx", "band_hash")
    b = bands.select(F.col(id_col).alias("doc_b"), "band_idx", "band_hash")
    cand = _spread_verify(
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )
    toks = df.select(F.col(id_col),
                     shingles(F.col(text_col)).alias("t"))
    jc = fround(jaccard(F.col("ta"), F.col("tb")), 4)
    return (
        cand.join(toks.select(F.col(id_col).alias("doc_a"),
                              F.col("t").alias("ta")), "doc_a")
        .join(toks.select(F.col(id_col).alias("doc_b"),
                          F.col("t").alias("tb")), "doc_b")
        .select("doc_a", "doc_b", jc.alias("jacc"))
        .filter(F.col("jacc") >= threshold)
    )


def dedup_minhash_portable(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: the fully oracle-checked MinHash-LSH."""
    return minhash_portable_pairs(load_table(spark, sf, "documents"))


def _sig_sql(i: int) -> str:
    return (
        "list_aggregate(list_transform(t, x -> "
        f"('0x' || substr(md5(x || 's{i}'), 1, 8))::BIGINT), 'min')"
    )


def _band_sql(b: int) -> str:
    parts = " || ',' || ".join(
        f"CAST(sig{b * ROWS_PER_BAND + r} AS VARCHAR)"
        for r in range(ROWS_PER_BAND)
    )
    return f"md5({parts})"


_JACC_RAW = (
    "len(list_intersect(ta, tb))"
    " / (len(ta) + len(tb) - len(list_intersect(ta, tb)))"
)

DEDUP_MINHASH_PORTABLE_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
  FROM documents
), toks AS (
  -- 3-token shingles, mirroring dedup.shingles: sequence over
  -- greatest(len-2, 1) with clamped slices for short docs
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 1) + 1),
           i -> array_to_string(w[i:i+2], ' '))) AS t
  FROM words
), sig AS (
  SELECT doc_id, t,
         {', '.join(f'{_sig_sql(i)} AS sig{i}' for i in range(N_HASHES))}
  FROM toks
), bands AS (
  {' UNION ALL '.join(
      f"SELECT doc_id, {b} AS band_idx, {_band_sql(b)} AS band_hash FROM sig"
      for b in range(N_BANDS))}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), pairs AS (
  SELECT doc_a, doc_b, ta.t AS ta, tb.t AS tb
  FROM cand
  JOIN toks ta ON ta.doc_id = doc_a
  JOIN toks tb ON tb.doc_id = doc_b
)
SELECT doc_a, doc_b, {fround_sql(_JACC_RAW, 4)} AS jacc
FROM pairs
WHERE {fround_sql(_JACC_RAW, 4)} >= {THRESHOLD}
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "dedup_minhash_portable": (dedup_minhash_portable,
                               DEDUP_MINHASH_PORTABLE_SQL),
}
