"""Corpus assembly: source-mixture planning and the deterministic
global shuffle that turns a cleaned corpus into training shards.

``mixture_plan`` — the "data mixing" step of a pretraining pipeline:
given per-source token masses, compute each source's actual share and
the capped sampling rate that would equalize shares (rate = 1 for
under-represented sources — mixing never upsamples here, it
downsamples the dominant ones). One hash aggregation over the corpus;
the share/rate arithmetic runs on the few-row per-source rollup (a
window over #sources rows — negligible at any corpus size, since
sources number in the hundreds, not billions).

``shuffle_assign`` — training dataloaders need a reproducible global
shuffle + shard assignment. Ordering by a cryptographic hash of the
doc id IS a uniform random permutation, and it is engine-portable
(md5 evaluates identically everywhere, unlike xxhash64/rand(seed)).
Shard = high bits of the hash mod n_shards, position = rank of the
hash within the shard. ONE shuffle (the window partition on shard);
each shard sorts independently — at 100 TB, n_shards scales with the
cluster and no global sort ever happens.

Reference analog: none — its output ordering is explicitly
nondeterministic (completion-order fan-in, SURVEY.md R13); these ops
exist precisely to pin an ordering contract.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.functions import text as T
from iceberg_core_spark.functions.dedup import fround, fround_sql
from iceberg_core_spark.session import load_table

N_SHARDS = 8


def mixture_plan(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source (n_docs, n_tokens, share, rate): ``share`` is the
    source's fraction of corpus tokens; ``rate`` the keep-probability
    that levels every source to the equal-share token budget
    (``min(1, budget/n_tokens)``). Feed rates into
    ``sampling.sample_stratified`` to materialize the mix."""
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col(text_col)).cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    budget = total / F.count(F.lit(1)).over(w)
    return per.select(
        F.col(source_col),
        "n_docs",
        "n_tokens",
        fround(F.col("n_tokens") / total, 6).alias("share"),
        fround(F.least(F.lit(1.0), budget / F.col("n_tokens")), 6).alias(
            "rate"
        ),
    )


def mixture_plan_temperature(
    df: DataFrame, temperature: float = 2.0,
    source_col: str = "source", text_col: str = "text",
) -> DataFrame:
    """Temperature-reweighted downsample-only mixture — the standard
    multilingual/pretraining mix: target share_i ∝ mass_i^(1/T)
    (T=1 keeps proportions, T→∞ → equal-share), realized with the
    LARGEST total mass that upsamples nothing, so at least one source
    (every minimizer of mass/weight — ties possible) keeps rate 1 and
    the rest downsample toward the tempered shares.
    Returns (source, n_docs, n_tokens, rate); feed the rates into
    ``sampling.sample_stratified`` like ``mixture_plan``'s.

    Determinism: with w_i = mass_i^(1/T), the normalizing Σw cancels
    out of ``rate_i = min_j(mass_j/w_j) · w_i / mass_i`` — no sum of
    doubles ever folds, and MIN is order-free. At T=2 the weights are
    ``sqrt`` of exact integers (IEEE-correctly-rounded on every
    engine); other temperatures go through ``pow``, which libms only
    promise to ~1 ulp — fine for planning, but pin T=2 where the plan
    must be value-reproducible cross-engine. Zero-token sources get
    rate 0 (nothing to keep) and never poison the min."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col(text_col)).cast("long"))
        .alias("n_tokens"),
    )
    mass = F.col("n_tokens").cast("double")
    if temperature == 2.0:
        wgt = F.sqrt(mass)
    else:
        wgt = F.pow(mass, 1.0 / temperature)
    w = Window.partitionBy()
    scale = F.min(F.when(F.col("n_tokens") > 0, mass / wgt)).over(w)
    return per.select(
        F.col(source_col),
        "n_docs",
        "n_tokens",
        F.when(F.col("n_tokens") > 0,
               fround(F.least(F.lit(1.0), scale * wgt / mass), 6))
        .otherwise(F.lit(0.0)).alias("rate"),
    )


def corpus_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: equal-share mixture plan over document sources."""
    return mixture_plan(load_table(spark, sf, "documents"))


def corpus_mix_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: temperature-2 mixture plan (the
    value-reproducible sqrt path) over document sources."""
    return mixture_plan_temperature(load_table(spark, sf, "documents"),
                                    temperature=2.0)


CORPUS_MIX_TEMPERATURE_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_extract_all(lower(text), '{T.TOKEN_RE}')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), scaled AS (
  SELECT source, n_docs, n_tokens,
         MIN(CASE WHEN n_tokens > 0 THEN
               CAST(n_tokens AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE))
             END) OVER () AS scale
  FROM per
)
SELECT source, n_docs, n_tokens,
       CASE WHEN n_tokens > 0 THEN
         {fround_sql(
             'least(1.0, (scale * sqrt(CAST(n_tokens AS DOUBLE)))'
             ' / CAST(n_tokens AS DOUBLE))', 6)}
       ELSE 0.0 END AS rate
FROM scaled
"""


CORPUS_MIX_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_extract_all(lower(text), '{T.TOKEN_RE}')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT source, n_docs, n_tokens,
         SUM(n_tokens) OVER () AS total,
         COUNT(*) OVER () AS n_src
  FROM per
)
SELECT source, n_docs, n_tokens,
       {fround_sql('n_tokens / CAST(total AS DOUBLE)', 6)} AS share,
       {fround_sql(
           'least(1.0, (total / CAST(n_src AS DOUBLE)) / n_tokens)', 6
       )} AS rate
FROM tot
"""


def _with_shard_pos(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Shared shuffle rule (the single source of the determinism
    contract — shuffle_assign and write_shards MUST agree byte for
    byte): hash = md5(id || 'shuf'), shard = first 8 hex chars mod
    n_shards, pos = 1-based rank of (hash, id) within the shard.
    Returns ``df`` + (shard, pos), ``__h`` dropped."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("shuf")))
    d = df.withColumn("__h", h).withColumn(
        "shard",
        F.conv(F.substring("__h", 1, 8), 16, 10).cast("long") % n_shards,
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return d.withColumn("pos", F.row_number().over(w)).drop("__h")


def shuffle_assign(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = N_SHARDS
) -> DataFrame:
    """(id, shard, pos): reproducible uniform shuffle. ``shard`` comes
    from the first 8 hash hex chars mod n_shards; ``pos`` is the 1-based
    rank of the full hash within the shard (doc id tiebreak — md5
    collisions are negligible but determinism must not rest on that)."""
    return _with_shard_pos(
        df.select(id_col), id_col, n_shards
    ).select(id_col, "shard", "pos")


def corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: 8-shard deterministic shuffle of documents."""
    return shuffle_assign(load_table(spark, sf, "documents"))


def write_shards(
    df: DataFrame,
    root: str,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS,
) -> None:
    """Materialize the deterministic shuffle: full rows land under
    ``root/shard=N/`` in ``pos`` order — the on-disk layout a training
    dataloader consumes sequentially per shard.

    ONE exchange total: the window's hash partition on the shard
    already co-locates rows, its (shard, hash, id) sort IS pos order,
    and the partitioned write reuses both — no second shuffle, no
    global sort. ``pos`` is written so a reader can verify/seek.
    Shares ``_with_shard_pos`` with ``shuffle_assign``, so written
    shards are exactly that permutation by construction."""
    (_with_shard_pos(df, id_col, n_shards)
     .write.mode("overwrite").partitionBy("shard").parquet(root))


# one materialized shard layout per sf — staging discipline shared
# with the avro/jsonl sources
_SHARD_CACHE: dict[str, str] = {}


def write_shards_q(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: materialize the deterministic shuffle as
    ``shard=N`` parquet dirs via :func:`write_shards`, then read the
    layout BACK — (doc_id, shard, pos) from disk must equal the
    declared permutation (oracle = CORPUS_SHUFFLE_SQL), proving the
    written shards ARE the shuffle, not merely derived alongside it."""
    root = _SHARD_CACHE.get(sf)
    if root is None or not os.path.exists(root):
        root = tempfile.mkdtemp(prefix="ice_shards_")
        write_shards(load_table(spark, sf, "documents"), root)
        _SHARD_CACHE[sf] = root
    return spark.read.parquet(root).select(
        "doc_id", F.col("shard").cast("long").alias("shard"), "pos"
    )


CORPUS_SHUFFLE_SQL = f"""
WITH h AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || 'shuf') AS hh
  FROM documents
), s AS (
  SELECT doc_id, hh,
         ('0x' || substr(hh, 1, 8))::BIGINT % {N_SHARDS} AS shard
  FROM h
)
SELECT doc_id, shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS pos
FROM s
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_mix": (corpus_mix, CORPUS_MIX_SQL),
    "corpus_shuffle": (corpus_shuffle, CORPUS_SHUFFLE_SQL),
    "write_shards": (write_shards_q, CORPUS_SHUFFLE_SQL),
    # registered r10 (staged r9, oracle-green at sf0.001 + sf0.01)
    "corpus_mix_temperature": (corpus_mix_temperature,
                               CORPUS_MIX_TEMPERATURE_SQL),
}
