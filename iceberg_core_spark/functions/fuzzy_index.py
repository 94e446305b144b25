"""Incremental fuzzy (edit-distance) admission — judge an INCOMING
BATCH against an EXISTING CORPUS by near-identity of their strings,
without recomputing any corpus-wide state per batch. This is
``fuzzy_join``'s continuous-ingest shape, exactly as
:class:`AdmissionIndex` is ``dedup_batch``'s: the corpus is
append-only and already curated; each new delivery is checked for
typo/near-variant collisions before admission (r9 verdict task 3 —
the 100 TB gap in the fuzzy family).

Why a PERSISTED index is trivially sound here: segment-pigeonhole
blocking (fuzzy.py module doc — PassJoin) derives each document's
d+1 segment pieces and its probe substrings from THAT DOCUMENT
ALONE. There is no corpus-wide statistic anywhere (the earlier
q-gram design ranked prefixes by corpus document frequency — a
vocabulary-sized aggregate recomputed per run), so an increment's
index rows are byte-identical whether the document arrived first or
last, and old documents never need revisiting as the corpus grows.

Three probe directions, mirroring ``fuzzy_join`` with batch=left and
corpus=right:

- batch probe substrings → equi-join the corpus SEGMENTS (d+1 skinny
  rows per corpus doc — covers every guarantee-class corpus doc);
- batch guarantee-class segments → equi-join the persisted probe
  substrings of SHORT corpus docs (covers guaranteed batch × short
  corpus);
- short × short → the bucketized length-band ``range_join``
  composition over the persisted corpus short-class lengths.

Every direction is an equi-join on (partner length, segment index,
piece); candidates are verified with the thresholded JVM
``levenshtein(…, d+1)``. Per-batch cost: the corpus side contributes
only skinny scans (segments (la, seg, piece, id), short-class probe
pieces, short lengths) that AQE broadcasts the batch side against —
never a corpus text pass, never a corpus-wide aggregate, never
corpus × corpus.

Persistence/sync/compaction discipline is the shared
:class:`SnapshotSyncedStore` (same crash-safe generation flip, same
append-only snapshot walk as :class:`AdmissionIndex`); every kind is
a plain concatenation of per-snapshot increments (nothing to fold at
compaction). Reference lineage: R16's content-identity admission
(block.go:60-115) extended from exact identity to near-identity.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.functions.fuzzy import (
    MAX_DIST,
    Q,
    _NORM_PREFIX_CTE,
    _band_pairs,
    _check_params,
    _prefix_frame,
    _prep,
    _probes,
    _segments,
)
from iceberg_core_spark.functions.index_store import (
    SnapshotSyncedStore,
    _push_batch_keys_multi,
)
from iceberg_core_spark.session import load_table


def _corpus_frames(prep: DataFrame, max_dist: int,
                   min_len: int) -> dict[str, DataFrame]:
    """The corpus-side frames the judge needs — shared by the
    on-the-fly path (:func:`fuzzy_batch`) and the index sync
    (:class:`FuzzyIndex`), so the two cannot drift. All are pure
    per-document functions (module doc), so per-snapshot increments
    concatenate into exactly the from-scratch frames."""
    guaranteed = prep.filter(F.col("__len") >= min_len)
    short = prep.filter(F.col("__len") < min_len)

    def _as_c(frame: DataFrame) -> DataFrame:
        return frame.withColumnRenamed("__id", "__cid")

    return {
        "segs": _as_c(_segments(guaranteed, max_dist)),
        "sprobe": _as_c(_probes(short, max_dist, min_len)
                        .withColumnRenamed("__len", "__clen")),
        "short": short.select(F.col("__id").alias("__cid"),
                              F.col("__len").alias("__clen")),
        "strings": prep.select(F.col("__id").alias("__cid"),
                               F.col("__s").alias("__cs")),
    }


def _fuzzy_judge(
    batch: DataFrame,
    csegs: DataFrame,
    csprobe: DataFrame,
    cshort: DataFrame,
    cstrings: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
    q: int,
    piece_pushdown: int = 0,
) -> DataFrame:
    """Shared verdict pipeline over corpus-SIDE frames — fed either by
    on-the-fly derivation (:func:`fuzzy_batch`) or by the persisted
    index (:class:`FuzzyIndex.judge`). Returns one row per batch doc:
    (id, verdict 'fuzzy_dup'|'unique', match_id, dist) where match_id
    is the best corpus match (smallest distance, then smallest id).

    ``piece_pushdown`` > 0 enables the scan-pruning fast path: the
    batch's distinct probe/segment pieces (bounded by the knob, with
    a count-guarded collect) become an ``isin`` filter on the
    corpus-side frames — a NECESSARY condition of the equi-join, so
    output is unchanged, but against the PERSISTED index the filter
    pushes into the parquet scan (``PushedFilters: [In(__piece, …)]``)
    and the piece-clustered files compaction writes let row groups
    skip wholesale: per-batch I/O tracks the batch, not the corpus."""
    from iceberg_core_spark.functions.fuzzy import (
        _JOIN_KEYS,
        _verify_pairs,
    )

    min_len = _check_params(max_dist, q)
    b = _prep(batch, id_col, text_col)
    short_b = b.filter(F.col("__len") < min_len)
    keys = _JOIN_KEYS

    probes_b = (_probes(b, max_dist, min_len)
                .select(F.col("__id").alias("__bid"), *keys))
    segs_b = (_segments(b.filter(F.col("__len") >= min_len), max_dist)
              .select(F.col("__id").alias("__bid"), *keys))
    if piece_pushdown:
        # both pushdown families in one fused count job + one fused
        # collect job (r16, guide §6: the per-family count+collect
        # pairs were 4 of the judge's ~15 driver round-trips)
        (probes_b, csegs), (segs_b, csprobe) = _push_batch_keys_multi(
            [(probes_b, "__piece", csegs),
             (segs_b, "__piece", csprobe)], piece_pushdown)

    # direction A: batch probes × corpus segments (covers every
    # guarantee-class corpus doc, whatever the batch doc's class)
    cand_a = (
        probes_b
        .join(csegs.select("__cid", *keys), keys)
        .select("__bid", "__cid")
    )
    # direction B: guaranteed batch segments × short-corpus probes
    cand_b = (
        csprobe.select("__cid", *keys)
        .join(segs_b, keys)
        .select("__bid", "__cid")
    )
    # direction C: short × short via the bucketized length band
    cshort_prep = cshort.select(F.col("__cid").alias("__id"),
                                F.col("__clen").alias("__len"))
    cand_c = (_band_pairs(short_b, cshort_prep, max_dist)
              .select(F.col("__lid").alias("__bid"),
                      F.col("__rid").alias("__cid")))

    cands = (cand_a.unionByName(cand_b).unionByName(cand_c).distinct()
             .select(F.col("__bid").alias("__lid"),
                     F.col("__cid").alias("__rid")))
    cs = cstrings.select(F.col("__cid").alias("__id"),
                         F.col("__cs").alias("__s"))
    pairs = _verify_pairs(cands, b, cs, max_dist, "__bid", "__cid")

    w = Window.partitionBy("__bid").orderBy("dist", "__cid")
    best = (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__bid", "__cid", "dist"))
    # verdict rows come from the RAW batch, not the NULL-filtered
    # _prep frame: a NULL-text doc can never match (fuzzy.py: NULL
    # texts never pair) but it still gets its 'unique' row — same
    # one-row-per-batch-doc contract as the MinHash _judge, so the
    # streaming admission path neither admits-silently nor loses it
    return (
        batch.select(F.col(id_col))
        .join(best, F.col(id_col) == F.col("__bid"), "left")
        .select(
            F.col(id_col),
            F.when(F.col("__cid").isNotNull(), F.lit("fuzzy_dup"))
            .otherwise(F.lit("unique")).alias("verdict"),
            F.col("__cid").alias("match_id"),
            F.col("dist"),
        )
    )


def fuzzy_batch(corpus: DataFrame, batch: DataFrame,
                id_col: str, text_col: str,
                max_dist: int, q: int = Q) -> DataFrame:
    """Per-batch-document fuzzy-admission verdict against ``corpus``:
    (id, verdict 'fuzzy_dup'|'unique', match_id, dist). Matches are
    exactly ``fuzzy_join(batch, corpus, …)``'s pairs (property-tested)
    rolled up to the best match per batch doc. Derives the corpus-side
    frames on the fly — one corpus (id, text) pass per call;
    :class:`FuzzyIndex` is the persisted variant that amortizes it.
    Batch-internal near-duplicates are out of scope by design (run
    ``fuzzy_self_match`` over the batch alone for that)."""
    min_len = _check_params(max_dist, q)
    c = _prep(corpus, id_col, text_col)
    frames = _corpus_frames(c, max_dist, min_len)
    return _fuzzy_judge(
        batch, frames["segs"], frames["sprobe"], frames["short"],
        frames["strings"], text_col, id_col, max_dist, q,
    )


class FuzzyIndex(SnapshotSyncedStore):
    """Persisted fuzzy-admission index over an append-only
    :class:`IceTable` — the production variant of :func:`fuzzy_batch`
    (module doc has the completeness argument and the probe shapes).
    Four kinds: ``segs`` (guarantee-class docs' d+1 segment pieces),
    ``sprobe`` (short docs' probe substrings), ``short`` (short-class
    ids + lengths), ``strings`` (verification text). Every kind is a
    pure per-document function, so increments are self-contained —
    sync never reads, re-ranks, or rewrites existing rows.
    """

    _KIND_COLS = {
        "segs": ["__cid", "__la", "__seg", "__piece"],
        "sprobe": ["__cid", "__clen", "__la", "__seg", "__piece"],
        "short": ["__cid", "__clen"],
        "strings": ["__cid", "__cs"],
    }
    _COUNT_KIND = "strings"

    def __init__(self, spark: SparkSession, root: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 max_dist: int = MAX_DIST, q: int = Q,
                 pushdown_max_keys: int = 100_000,
                 pushdown_min_store_bytes: int = 1 << 30):
        super().__init__(spark, root, text_col, id_col,
                         pushdown_max_keys=pushdown_max_keys,
                         pushdown_min_store_bytes=(
                             pushdown_min_store_bytes))
        self.max_dist = max_dist
        self.q = q
        self._min_len = _check_params(max_dist, q)

    def _index_params(self) -> dict:
        # the persisted (la, seg, piece) rows are only joinable by a
        # probe side cut with the SAME geometry — stamped at first
        # write, re-checked on every sync/compact/judge (base class)
        return {"max_dist": self.max_dist, "q": self.q}

    def _frames(self, rows: DataFrame) -> dict[str, DataFrame]:
        prep = _prep(rows.select(self.id_col, self.text_col),
                     self.id_col, self.text_col)
        return _corpus_frames(prep, self.max_dist, self._min_len)

    def _cluster_for_write(self, kind: str, frame: DataFrame,
                           parts: int) -> DataFrame:
        # compaction lays the piece-keyed kinds out range-clustered
        # and sorted by piece, so the judge's pushed-down In filter
        # skips whole files/row groups by min-max stats and
        # dictionary pages — per-batch I/O then tracks the batch
        if kind in ("segs", "sprobe"):
            return frame.repartitionByRange(
                parts, "__piece").sortWithinPartitions("__piece")
        return super()._cluster_for_write(kind, frame, parts)

    def judge(self, batch: DataFrame) -> DataFrame:
        """Fuzzy-admission verdicts for ``batch`` against the indexed
        corpus — same output contract as :func:`fuzzy_batch` (the two
        share ``_fuzzy_judge``, so drift is structurally impossible)."""
        self._ensure_readable()
        # the filters prune BOTH piece-keyed kinds — gate on whichever
        # is larger (a short-key corpus can be sprobe-dominated)
        pushdown = self._pushdown_limit("segs", "sprobe")
        return _fuzzy_judge(
            batch,
            self._read("segs"),
            self._read("sprobe"),
            self._read("short"),
            self._read("strings"),
            self.text_col, self.id_col, self.max_dist, self.q,
            piece_pushdown=pushdown,
        )


# ---------------------------------------------------------------------------
# registry query: the production admission path end-to-end — corpus
# prefixes committed to an append-only IceTable in two commits, a
# FuzzyIndex synced from it (so the driver row proves the incremental
# sync), each batch doc judged for near-identical openings.

_IDX_CACHE: dict[str, str] = {}


def _fuzzy_index_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) the persisted index: the 90% corpus
    (doc_id % 10 != 0, MIN_PREFIX_LEN-floored normalized openings)
    committed in two IceTable commits, then synced."""
    from iceberg_core_spark.functions.index_store import (
        split_corpus_index_root,
    )

    return split_corpus_index_root(
        spark, lambda: _prefix_frame(spark, sf), _IDX_CACHE, sf,
        "ice_fuzzyidx_",
        lambda root: FuzzyIndex(spark, root, text_col="prefix"))


def corpus_fuzzy_admission(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: documents split by id into a 90% corpus
    and a 10% incoming batch; every batch doc whose normalized opening
    carries signal (the MIN_PREFIX_LEN floor) gets a fuzzy-admission
    verdict from the PERSISTED index. The oracle is INDEPENDENT brute
    force (batch × corpus levenshtein), so every driver round re-proves
    the incremental blocking complete on real data."""
    base = _fuzzy_index_root(spark, sf)
    idx = FuzzyIndex(spark, os.path.join(base, "idx"),
                     text_col="prefix")
    batch = _prefix_frame(spark, sf).filter("doc_id % 10 = 0")
    return idx.judge(batch)


CORPUS_FUZZY_ADMISSION_SQL = f"""
WITH {_NORM_PREFIX_CTE},
c AS (SELECT id, s FROM s WHERE id % 10 <> 0),
b AS (SELECT id, s FROM s WHERE id % 10 = 0),
pairs AS (
  SELECT b.id AS bid, c.id AS cid, levenshtein(b.s, c.s) AS dist
  FROM b, c WHERE levenshtein(b.s, c.s) <= {MAX_DIST}
),
best AS (
  SELECT bid, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY bid
                            ORDER BY dist, cid) AS rn
  FROM pairs
)
SELECT b.id AS doc_id,
       CASE WHEN bst.cid IS NOT NULL THEN 'fuzzy_dup'
            ELSE 'unique' END AS verdict,
       bst.cid AS match_id,
       CAST(bst.dist AS BIGINT) AS dist
FROM b
LEFT JOIN best bst ON bst.bid = b.id AND bst.rn = 1
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

# staged in r10 (that window was full), registered in r11
# (registry.py imports QUERIES; STAGED_QUERIES stays as an alias for
# the tests/tools that referenced the staging name)
QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_fuzzy_admission": (corpus_fuzzy_admission,
                               CORPUS_FUZZY_ADMISSION_SQL),
}
STAGED_QUERIES = QUERIES
