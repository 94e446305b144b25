"""Incremental fuzzy (edit-distance) admission — judge an INCOMING
BATCH against an EXISTING CORPUS by near-identity of their strings,
without recomputing any corpus-wide aggregate per batch. This is
``fuzzy_join``'s continuous-ingest shape, exactly as
:class:`AdmissionIndex` is ``dedup_batch``'s: the corpus is
append-only and already curated; each new delivery is checked for
typo/near-variant collisions before admission (r9 verdict task 3 —
the 100 TB gap in the fuzzy family: ``fuzzy_self_match`` re-ran the
full-corpus gram document-frequency aggregate and per-doc rarest
prefixes on every call).

Why a PERSISTED prefix index is sound — the theorem that carries the
whole module: the q-gram prefix-filter guarantee (fuzzy.py module
doc) holds for ANY fixed choice of q·d+1 distinct grams per string —
each edit destroys at most q positional grams, so at most q·d of a
string's distinct grams can be absent from a string within distance
d, and any q·d+1 of them therefore intersect it. The ascending-
document-frequency order is purely a PERFORMANCE heuristic (rare join
keys don't fan out). Hence corpus-side kept prefixes chosen under the
df counts at index time remain complete forever, no matter how the
corpus vocabulary drifts — an incremental index never has to revisit
old documents.

Three probe directions, mirroring ``fuzzy_join`` with batch=left:

- guaranteed batch doc  → its q·d+1 kept grams (ranked by CORPUS df;
  unseen grams rank df=0 — they cannot fan out at all) equi-join the
  corpus gram POSTINGS;
- short batch doc (< q·d+1 distinct grams) → its FULL gram set
  equi-joins the corpus KEPT prefixes (covers guaranteed corpus
  docs);
- short × short → the bucketized length-band ``range_join``
  composition over the persisted corpus short-class lengths.

Every direction is an equi-join; candidates are verified with the
thresholded JVM ``levenshtein(…, d+1)``. Per-batch cost: the corpus
side contributes only skinny scans (postings (gram,id,len), kept
prefixes, short lengths) that AQE broadcasts the batch side against —
never a corpus text pass, never a corpus-wide aggregate, never
corpus × corpus. The (gram, df) counts are persisted as ADDITIVE
per-snapshot partials; ranking a batch sums the vocabulary-sized
partials table, not the postings.

Persistence/sync/compaction discipline is the shared
:class:`SnapshotSyncedStore` (same crash-safe generation flip, same
append-only snapshot walk as :class:`AdmissionIndex`). Reference
lineage: R16's content-identity admission (block.go:60-115) extended
from exact identity to near-identity.
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
    _kept_prefix,
    _prep,
    _prefix_frame,
    _verify_pairs,
)
from iceberg_core_spark.functions.index_store import SnapshotSyncedStore
from iceberg_core_spark.session import load_table


def _explode_grams(prep: DataFrame) -> DataFrame:
    """(__id, __len, __gram) rows of a _prep frame."""
    return prep.select("__id", "__len",
                       F.explode("__grams").alias("__gram"))


def _corpus_frames(prep: DataFrame,
                   rank_df: DataFrame | None = None,
                   keep: int = Q * MAX_DIST + 1) -> dict[str, DataFrame]:
    """The four corpus-side frames the judge needs, plus the additive
    (gram, df) counts of THIS frame — shared by the on-the-fly path
    (:func:`fuzzy_batch`) and the index sync (:class:`FuzzyIndex`),
    so the two cannot drift. ``rank_df``: the df counts to rank kept
    prefixes by (defaults to this frame's own counts — the self-
    contained case); ANY ranking yields a complete prefix (module
    doc), so an increment ranked against accumulated counts and a
    from-scratch corpus ranked against its own agree on verdicts."""
    grams = _explode_grams(prep)
    inc_df = grams.groupBy("__gram").agg(
        F.count(F.lit(1)).alias("__df"))
    kept = _kept_prefix(grams, rank_df if rank_df is not None
                        else inc_df, keep)

    def _as_c(frame: DataFrame) -> DataFrame:
        return frame.select(F.col("__id").alias("__cid"),
                            F.col("__len").alias("__clen"), "__gram")

    return {
        "grams": _as_c(grams),
        "kept": _as_c(kept),
        "short": (prep.filter(F.size("__grams") < keep)
                  .select(F.col("__id").alias("__cid"),
                          F.col("__len").alias("__clen"))),
        "strings": prep.select(F.col("__id").alias("__cid"),
                               F.col("__s").alias("__cs")),
        "df": inc_df,
    }


def _fuzzy_judge(
    batch: DataFrame,
    cgrams: DataFrame,
    ckept: DataFrame,
    cshort: DataFrame,
    cstrings: DataFrame,
    cdf_partials: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
    q: int,
) -> DataFrame:
    """Shared verdict pipeline over corpus-SIDE frames — fed either by
    on-the-fly derivation (:func:`fuzzy_batch`) or by the persisted
    index (:class:`FuzzyIndex.judge`). Returns one row per batch doc:
    (id, verdict 'fuzzy_dup'|'unique', match_id, dist) where match_id
    is the best corpus match (smallest distance, then smallest id)."""
    keep = _check_params(max_dist, q)
    b = _prep(batch, id_col, text_col, q)
    bgrams = _explode_grams(b)
    short_b = b.filter(F.size("__grams") < keep)

    # batch prefixes ranked by corpus-global df (sum of the additive
    # partials — a vocabulary-sized aggregate, not a postings pass);
    # grams the corpus has never seen rank rarest (df 0) and generate
    # zero candidates in the probe join — free blocking power
    df_tot = cdf_partials.groupBy("__gram").agg(
        F.sum("__df").alias("__df"))
    kept_b = _kept_prefix(bgrams, df_tot, keep, unseen_df=0)

    def _as_b(frame: DataFrame) -> DataFrame:
        return frame.select(F.col("__id").alias("__bid"),
                            F.col("__len").alias("__blen"), "__gram")

    # direction A: guaranteed batch docs probe the corpus postings
    cand_a = _as_b(kept_b).join(cgrams, "__gram")
    # direction B: short batch docs' FULL grams probe the corpus kept
    # prefixes (covers every guaranteed corpus doc)
    cand_b = _as_b(_explode_grams(short_b)).join(ckept, "__gram")
    cand_probe = (
        cand_a.unionByName(cand_b)
        .filter(F.abs(F.col("__blen") - F.col("__clen"))
                <= F.lit(max_dist))
        .select("__bid", "__cid")
    )

    # direction C: short × short via the bucketized length band
    cshort_prep = cshort.select(F.col("__cid").alias("__id"),
                                F.col("__clen").alias("__len"))
    cand_c = (_band_pairs(short_b, cshort_prep, max_dist)
              .select(F.col("__lid").alias("__bid"),
                      F.col("__rid").alias("__cid")))

    cands = (cand_probe.unionByName(cand_c).distinct()
             .select(F.col("__bid").alias("__lid"),
                     F.col("__cid").alias("__rid")))
    cs = cstrings.select(F.col("__cid").alias("__id"),
                         F.col("__cs").alias("__s"))
    pairs = _verify_pairs(cands, b, cs, max_dist, "__bid", "__cid")

    w = Window.partitionBy("__bid").orderBy("dist", "__cid")
    best = (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__bid", "__cid", "dist"))
    return (
        b.select(F.col("__id").alias(id_col))
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
    keep = _check_params(max_dist, q)
    c = _prep(corpus, id_col, text_col, q)
    frames = _corpus_frames(c, keep=keep)
    return _fuzzy_judge(
        batch, frames["grams"], frames["kept"], frames["short"],
        frames["strings"], frames["df"], text_col, id_col, max_dist, q,
    )


class FuzzyIndex(SnapshotSyncedStore):
    """Persisted fuzzy-admission index over an append-only
    :class:`IceTable` — the production variant of :func:`fuzzy_batch`
    (module doc has the completeness argument and the probe shapes).
    Five kinds: ``grams`` (postings: id, len, gram), ``kept`` (each
    doc's q·d+1 prefix grams, chosen at sync time), ``short``
    (short-class ids + lengths), ``strings`` (verification text),
    ``df`` (ADDITIVE per-snapshot (gram, count) partials — judge and
    sync sum them; compaction folds them).

    Sync ranks an increment's kept prefixes against the accumulated
    counts (persisted partials + the increment's own) — the best
    rarity estimate available at that moment; older documents' stale
    prefixes stay complete by the any-prefix theorem, so no rewrite.
    """

    _KIND_COLS = {
        "grams": ["__cid", "__clen", "__gram"],
        "kept": ["__cid", "__clen", "__gram"],
        "short": ["__cid", "__clen"],
        "strings": ["__cid", "__cs"],
        "df": ["__gram", "__df"],
    }
    _COUNT_KIND = "strings"

    def __init__(self, spark: SparkSession, root: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 max_dist: int = MAX_DIST, q: int = Q):
        super().__init__(spark, root, text_col, id_col)
        self.max_dist = max_dist
        self.q = q
        self._keep = _check_params(max_dist, q)

    def _frames(self, rows: DataFrame) -> dict[str, DataFrame]:
        prep = _prep(rows.select(self.id_col, self.text_col),
                     self.id_col, self.text_col, self.q)
        rank_df = None
        if os.path.isdir(self._kind_dir("df")):
            # accumulated counts = persisted partials + this increment
            # (summed inside _kept_prefix's join via a pre-aggregate)
            inc = _explode_grams(prep).groupBy("__gram").agg(
                F.count(F.lit(1)).alias("__df"))
            rank_df = (self._read("df").unionByName(inc)
                       .groupBy("__gram").agg(
                           F.sum("__df").alias("__df")))
        return _corpus_frames(prep, rank_df=rank_df, keep=self._keep)

    def _fold_for_compact(
            self, frames: dict[str, DataFrame]) -> dict[str, DataFrame]:
        # the df partials are additive states — fold them so a long
        # sync history compacts to one row per gram
        return {**frames,
                "df": frames["df"].groupBy("__gram").agg(
                    F.sum("__df").alias("__df"))}

    def judge(self, batch: DataFrame) -> DataFrame:
        """Fuzzy-admission verdicts for ``batch`` against the indexed
        corpus — same output contract as :func:`fuzzy_batch` (the two
        share ``_fuzzy_judge``, so drift is structurally impossible)."""
        return _fuzzy_judge(
            batch,
            self._read("grams"),
            self._read("kept"),
            self._read("short"),
            self._read("strings"),
            self._read("df"),
            self.text_col, self.id_col, self.max_dist, self.q,
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
    import tempfile

    root = _IDX_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    pref = _prefix_frame(spark, sf)
    base = tempfile.mkdtemp(prefix="ice_fuzzyidx_")
    troot = os.path.join(base, "corpus")
    t = IceTable.create(
        spark, troot,
        pref.filter("doc_id % 10 <> 0 AND doc_id % 3 <> 0"),
        partition_col=None, key_col="doc_id")
    t.append(pref.filter("doc_id % 10 <> 0 AND doc_id % 3 = 0"))
    idx = FuzzyIndex(spark, os.path.join(base, "idx"),
                     text_col="prefix")
    idx.sync(t)
    _IDX_CACHE[sf] = base
    return base


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

# staged for r11 registration (the r10 window is full) — merge into
# the registered surface at registration time
STAGED_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_fuzzy_admission": (corpus_fuzzy_admission,
                               CORPUS_FUZZY_ADMISSION_SQL),
}
