"""Fuzzy (edit-distance) self-match — the string-similarity join every
entity-resolution / title-dedup pipeline needs: all pairs of strings
within Levenshtein distance ``d``, without the O(n²) cross product.

Blocking (q-gram prefix filtering, after Gravano et al. / ED-Join):

- each edit operation destroys at most ``q`` positional q-grams of a
  string, so two strings within distance d share all but ≤ q·d of
  either side's positional grams — in particular, at most q·d of a
  string's DISTINCT grams can be entirely absent from the other.
- therefore if a string has ≥ q·d+1 distinct grams, its q·d+1
  globally-RAREST grams (order: ascending document frequency, gram)
  must intersect the other string's full gram set. Candidates come
  from the equi-join ``kept(probe) ⋈ all(other)`` — the join keys are
  only RARE grams, so frequent grams ("the", "ing") never fan out.
- strings with ≤ q·d distinct grams (too short, or long but
  single-character runs) get no such guarantee: they pair through a
  bucketized LENGTH-band join instead (each replicates to the
  ⌈(2d+1)/(d+1)⌉+1 buckets its [len−d, len+d] window overlaps — the
  range_join composition), which is complete because |len(a)−len(b)|
  ≤ d is necessary for ed ≤ d. This class is tiny in real corpora;
  its join is still an equi-join, never a cross product.
- every candidate pair is verified with the exact thresholded
  Levenshtein (JVM builtin, early-exit at d+1); the length filter
  |len(a)−len(b)| ≤ d prunes before verification.

Completeness is property-tested against a brute-force model over
adversarial small alphabets (tests/test_fuzzy.py); cross-engine value
equality is oracle-checked with a DuckDB twin that mirrors the same
blocking and the same (df, gram) global order.

At 100 TB: gram exploding is map-side; the candidate join shuffles on
gram (AQE/skew rules apply, and the prefix filter keeps join keys
rare by construction); verification is bounded to candidates. No
stage ever materializes the cross product.

Registered r10 (staged r9): the query fns and oracles below follow
the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.operators.rangejoin import range_join
from iceberg_core_spark.session import load_table

Q = 3  # q-gram width


def _grams(col, q: int):
    """Distinct q-grams of ``col`` as an array (empty below q chars).
    NB: Spark's sequence(1, 0) DESCENDS — guard short strings with an
    explicit empty array instead of a clamped upper bound."""
    return F.when(
        F.length(col) >= q,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.length(col) - (q - 1)),
            lambda i: F.substring(col, i, F.lit(q)))),
    ).otherwise(F.array().cast("array<string>"))


def _check_params(max_dist: int, q: int) -> int:
    """Shared validation; returns the prefix length q·d+1."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (unigrams make every pair "
                         "share a gram — no blocking power)")
    return q * max_dist + 1


def _prep(frame: DataFrame, id_col: str, text_col: str,
          q: int) -> DataFrame:
    """(__id, __s, __len, __grams) projection; NULL texts dropped."""
    return frame.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        F.length(text_col).alias("__len"),
        _grams(F.col(text_col), q).alias("__grams"),
    ).filter(F.col("__s").isNotNull())


def _kept_prefix(grams: DataFrame, gram_df: DataFrame,
                 keep: int, unseen_df: int | None = None) -> DataFrame:
    """Each string's ``keep`` globally-rarest grams under the shared
    (df, gram) total order — the probe side of the prefix filter.

    ``unseen_df``: when set, grams ABSENT from ``gram_df`` are ranked
    with that frequency instead of being dropped (left join) — the
    batch side of an incremental probe, where new-vocabulary grams are
    the rarest of all (df 0: they can't fan out in the candidate join
    at all). The self-match path keeps the inner join: there every
    gram is in its own corpus-wide aggregate by construction."""
    from pyspark.sql import Window
    rk = F.row_number().over(
        Window.partitionBy("__id").orderBy("__df", "__gram"))
    if unseen_df is None:
        joined = grams.join(gram_df, "__gram")
    else:
        joined = (grams.join(gram_df, "__gram", "left")
                  .fillna({"__df": unseen_df}))
    return (joined
            .withColumn("__rk", rk)
            .filter(F.col("__rk") <= keep)
            .drop("__rk", "__df"))


def _band_pairs(intervals_side: DataFrame, points_side: DataFrame,
                max_dist: int) -> DataFrame:
    """(__lid, __rid) candidates with |len diff| <= max_dist between
    two _prep frames — the short-class length band as the plan-gated
    bucketized range_join composition (points = lengths, intervals =
    [len-d, len+d])."""
    pts = points_side.select(F.col("__id").alias("__rid"),
                             F.col("__len").alias("__rlen"))
    ivals = intervals_side.select(
        F.col("__id").alias("__lid"),
        (F.col("__len") - max_dist).alias("__lo"),
        (F.col("__len") + max_dist).alias("__hi"))
    return range_join(pts, ivals, "__rlen", "__lo", "__hi",
                      bucket_width=max_dist + 1).select("__lid", "__rid")


def _verify_pairs(cands: DataFrame, sl: DataFrame, sr: DataFrame,
                  max_dist: int, a_name: str, b_name: str) -> DataFrame:
    """Thresholded-Levenshtein verification of (__lid, __rid)
    candidates against two _prep frames — the ONE predicate both
    variants (and the DuckDB oracle text) must agree on."""
    a = sl.select(F.col("__id").alias("__lid"),
                  F.col("__s").alias("__sa"))
    b = sr.select(F.col("__id").alias("__rid"),
                  F.col("__s").alias("__sb"))
    return (
        cands.join(a, "__lid").join(b, "__rid")
        .withColumn("dist", F.levenshtein("__sa", "__sb",
                                          max_dist + 1))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select(F.col("__lid").alias(a_name),
                F.col("__rid").alias(b_name),
                F.col("dist").cast("long").alias("dist"))
    )


def fuzzy_self_match(strings: DataFrame, id_col: str, text_col: str,
                     max_dist: int, q: int = Q) -> DataFrame:
    """All unordered pairs of ``strings`` rows whose ``text_col``
    values are within Levenshtein distance ``max_dist`` (NULL texts
    never match; exact duplicates match at distance 0). Returns
    (id_a, id_b, dist) with id_a < id_b.

    ``id_col`` must be unique per row; ``q``/``max_dist`` trade
    blocking selectivity (prefix keeps q·d+1 rare grams) against the
    size of the unguaranteed short class (≤ q·d distinct grams)."""
    keep = _check_params(max_dist, q)
    s = _prep(strings, id_col, text_col, q)

    grams = s.select("__id", "__len",
                     F.explode("__grams").alias("__gram"))
    # global rarity order: ascending (df, gram) — exact integers, so
    # the order (and therefore the kept prefix) is engine-portable
    gram_df = grams.groupBy("__gram").agg(
        F.count(F.lit(1)).alias("__df"))
    kept = (_kept_prefix(grams, gram_df, keep)
            .select(F.col("__id").alias("__lid"),
                    F.col("__len").alias("__llen"),
                    "__gram"))

    short = s.filter(F.size("__grams") < keep)

    # (1) probe join: a pair within distance d with at least one
    # guaranteed side ALWAYS surfaces here — that side's kept grams
    # intersect the other side's full gram set (see module doc)
    all_side = grams.select(F.col("__id").alias("__rid"),
                            F.col("__len").alias("__rlen"), "__gram")
    cand_probe = (
        kept.join(all_side, "__gram")
        .filter(F.col("__lid") != F.col("__rid"))
        .filter(F.abs(F.col("__llen") - F.col("__rlen"))
                <= F.lit(max_dist))
    )

    # (2) short class (no prefix guarantee on EITHER side): complete
    # via the shared length-band range_join composition
    cand_short = _band_pairs(short, short, max_dist).filter(
        F.col("__lid") != F.col("__rid"))

    # normalize to unordered pairs, then verify once
    cands = (
        cand_probe.select("__lid", "__rid")
        .unionByName(cand_short)
        .select(F.least("__lid", "__rid").alias("__lid"),
                F.greatest("__lid", "__rid").alias("__rid"))
        .distinct()
    )
    return _verify_pairs(cands, s, s, max_dist, "id_a", "id_b")


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_id: str, left_text: str,
               right_id: str, right_text: str,
               max_dist: int, q: int = Q) -> DataFrame:
    """Cross-corpus fuzzy join: every (left, right) pair whose texts
    are within Levenshtein distance ``max_dist`` — the two-sided
    variant of ``fuzzy_self_match`` (fuzzy eval-set decontamination,
    catalog reconciliation). Returns (left_id, right_id, dist); ids
    must be unique within each side (candidate pairs dedupe on the id
    pair), and the same id value on both sides means two DIFFERENT
    entities — unlike the self-match, such pairs are kept.

    Blocking mirrors the self-match with BOTH probe directions: the
    shared (df, gram) total order comes from the UNION of both
    corpora's grams, `kept(left) ⋈ all(right)` catches every pair
    whose left side is prefix-guaranteed, and `kept(right) ⋈
    grams(SHORT left)` the pairs whose left is short but right is
    guaranteed — the second probe only needs the short-left grams,
    because left-guaranteed pairs already surfaced in direction one
    (restricting it halves the second join's input and stops
    both-guaranteed pairs from being produced twice). Pairs where
    NEITHER side has q·d+1 distinct grams go through the bucketized
    length-band range_join. Same completeness theorem per direction;
    property-tested against brute force."""
    keep = _check_params(max_dist, q)
    sl = _prep(left, left_id, left_text, q)
    sr = _prep(right, right_id, right_text, q)
    short_l = sl.filter(F.size("__grams") < keep)
    short_r = sr.filter(F.size("__grams") < keep)
    gl = sl.select("__id", "__len", F.explode("__grams").alias("__gram"))
    gr = sr.select("__id", "__len", F.explode("__grams").alias("__gram"))
    gl_short = short_l.select("__id", "__len",
                              F.explode("__grams").alias("__gram"))
    # ONE total order shared by both prefixes (any fixed order makes
    # the guarantee hold; sharing it keeps the blocking symmetric)
    gram_df = (gl.select("__gram").unionAll(gr.select("__gram"))
               .groupBy("__gram").agg(F.count(F.lit(1)).alias("__df")))

    def _as(frame, side):
        return frame.select(F.col("__id").alias(f"__{side}id"),
                            F.col("__len").alias(f"__{side}len"),
                            "__gram")

    kept_l = _as(_kept_prefix(gl, gram_df, keep), "l")
    kept_r = _as(_kept_prefix(gr, gram_df, keep), "r")
    cand_probe = (
        kept_l.join(_as(gr, "r"), "__gram")
        .unionByName(_as(gl_short, "l").join(kept_r, "__gram"))
        .filter(F.abs(F.col("__llen") - F.col("__rlen"))
                <= F.lit(max_dist))
        .select("__lid", "__rid")
    )

    cand_short = _band_pairs(short_l, short_r, max_dist)
    cands = cand_probe.unionByName(cand_short).distinct()
    return _verify_pairs(cands, sl, sr, max_dist, "left_id", "right_id")


# ---------------------------------------------------------------------------
# registry query: near-identical document openings — pairs of docs
# whose normalized 40-char prefix is within edit distance 2

PREFIX_LEN = 40
MAX_DIST = 2
# Minimum normalized-prefix length to participate in matching: q·(d+1)
# is the first length at which a string CAN carry the q·d+1 positional
# grams the prefix-filter guarantee needs. Below it the opening holds
# no usable identity signal — and, decisively, a non-Latin-script
# corpus normalizes to EMPTY/near-empty ASCII prefixes that would all
# fall into the short class's same length bucket (an n² candidate
# blow-up with every empty pair "matching" at distance 0). Such
# documents are EXCLUDED from the prefix signal entirely (r9 ADVICE);
# a script-aware normalization is the right tool for them, not a
# degenerate ASCII prefix.
MIN_PREFIX_LEN = Q * (MAX_DIST + 1)


def norm_ascii_prefix(col):
    """ASCII-safe normalized prefix: lowercase, printable-ASCII only,
    whitespace runs collapsed to single spaces, first 40 chars. The
    non-ASCII strip pins Levenshtein to one code-unit-per-char on both
    engines; the whitespace collapse keeps formatting-only reflows
    from counting as edits."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^\\x20-\\x7e]", "")
    c = F.regexp_replace(c, "[ ]+", " ")
    return F.substring(F.trim(c), 1, PREFIX_LEN)


def _prefix_frame(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, prefix) for every document whose normalized opening is
    long enough to matter (>= MIN_PREFIX_LEN) — the ONE input frame all
    three corpus_fuzzy_* queries share, mirrored by _NORM_PREFIX_CTE."""
    docs = load_table(spark, sf, "documents")
    return (docs.select(F.col("doc_id"),
                        norm_ascii_prefix(F.col("text")).alias("prefix"))
            .filter(F.length("prefix") >= MIN_PREFIX_LEN))


def corpus_fuzzy_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: document pairs whose normalized 40-char
    openings are within Levenshtein distance 2 — the cheap first-pass
    signal for boilerplate families and near-identical variants.
    Openings shorter than MIN_PREFIX_LEN normalized ASCII chars are
    out of scope (see the constant's rationale)."""
    pref = _prefix_frame(spark, sf)
    return fuzzy_self_match(pref, "doc_id", "prefix", MAX_DIST, q=Q)


# The DuckDB twin mirrors the SAME blocking (grams, (df, gram) global
# order, q·d+1 prefix, short class via the length band — which the
# band bucketization makes a plain |len diff| <= d here) and the same
# thresholded verify, so every value the engine emits is value-hash
# checked; blocking COMPLETENESS is proven separately by the
# property test against brute force. The CTE body is SHARED between
# the pairs query and the clusters query (the portable-clusters
# precedent: the oracle builds its transitive closure over the SAME
# pairs text, so the two can never drift).
# ONE normalization text shared by every oracle in this module (the
# pairs/clusters mirrored twins AND the decontaminate brute force) —
# a tweak that edits one copy cannot silently leave another testing a
# different prefix.
_NORM_PREFIX_CTE = f"""s AS (
  SELECT id, s FROM (
    SELECT doc_id AS id,
           substr(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\\x20-\\x7e]', '', 'g'), '[ ]+', ' ', 'g')),
                  1, {PREFIX_LEN}) AS s
    FROM documents
    WHERE text IS NOT NULL
  ) WHERE length(s) >= {MIN_PREFIX_LEN}
)"""

_FUZZY_PAIRS_CTES = f"""{_NORM_PREFIX_CTE},
st AS (
  SELECT id, s, length(s) AS len,
         list_distinct([substr(s, i, {Q})
                        FOR i IN range(1, greatest(length(s) - {Q - 1},
                                                   0) + 1)]) AS grams
  FROM s
),
grams AS (SELECT id, len, unnest(grams) AS gram FROM st),
gram_df AS (SELECT gram, COUNT(*) AS df FROM grams GROUP BY 1),
kept AS (
  SELECT id AS lid, len AS llen, gram FROM (
    SELECT g.id, g.len, g.gram,
           row_number() OVER (PARTITION BY g.id
                              ORDER BY d.df, g.gram) AS rk
    FROM grams g JOIN gram_df d USING (gram)
  ) WHERE rk <= {Q * MAX_DIST + 1}
),
cand_probe AS (
  SELECT least(k.lid, g.id) AS id_a, greatest(k.lid, g.id) AS id_b
  FROM kept k JOIN grams g USING (gram)
  WHERE k.lid <> g.id AND abs(k.llen - g.len) <= {MAX_DIST}
),
short AS (SELECT id, len FROM st
          WHERE len(grams) < {Q * MAX_DIST + 1}),
cand_short AS (
  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
  FROM short a JOIN short b
    ON abs(a.len - b.len) <= {MAX_DIST} AND a.id <> b.id
),
cands AS (
  SELECT DISTINCT id_a, id_b FROM
  (SELECT * FROM cand_probe UNION ALL SELECT * FROM cand_short)
),
fpairs AS (
  SELECT c.id_a, c.id_b,
         CAST(levenshtein(sa.s, sb.s) AS BIGINT) AS dist
  FROM cands c
  JOIN s sa ON sa.id = c.id_a
  JOIN s sb ON sb.id = c.id_b
  WHERE levenshtein(sa.s, sb.s) <= {MAX_DIST}
)"""

CORPUS_FUZZY_PREFIX_SQL = f"""
WITH {_FUZZY_PAIRS_CTES}
SELECT id_a, id_b, dist FROM fpairs
"""


def corpus_fuzzy_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: the fuzzy family end-to-end — prefix
    edit-distance pairs fold into connected components and a
    per-document canonical verdict (doc_id, canon_id, keep,
    cluster_size), the entity-resolution analog of dedup_clusters.
    Reuses the proven alternating-star CC machinery; the oracle is
    DuckDB's recursive transitive closure over the SAME pairs CTE
    text the pairs query runs."""
    from iceberg_core_spark.functions.dedup import dedup_cluster_assign

    pref = _prefix_frame(spark, sf)
    pairs = fuzzy_self_match(pref, "doc_id", "prefix", MAX_DIST, q=Q)
    return dedup_cluster_assign(pref, pairs, id_col="doc_id",
                                a_col="id_a", b_col="id_b")


CORPUS_FUZZY_CLUSTERS_SQL = f"""
WITH RECURSIVE {_FUZZY_PAIRS_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM fpairs
  UNION ALL
  SELECT id_b, id_a FROM fpairs
),
reach(id, label) AS (
  SELECT id, id FROM s
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
),
cc AS (SELECT id AS doc_id, MIN(label) AS canon_id FROM reach GROUP BY id)
SELECT doc_id, canon_id, doc_id = canon_id AS keep,
       COUNT(*) OVER (PARTITION BY canon_id) AS cluster_size
FROM cc
"""

def corpus_fuzzy_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: FUZZY eval-set decontamination — train
    docs whose normalized opening is within edit distance 2 of any
    pseudo-benchmark doc (a ``doc_id % 11`` split — wider than
    decontam.py's % 53 so the fuzzy check has cross-split signal at
    driver scale),
    reported as (doc_id, n_eval_matches, min_dist). The edit-distance
    complement to decontaminate()'s Jaccard and n-gram-collision
    checks: it catches light paraphrase/typo-level leakage that
    token-set overlap scores below threshold.

    The % 11 split makes the eval side ~9% of the corpus — sized so
    the fuzzy check has cross-split signal at DRIVER scale, not the
    production shape. In production the eval side is benchmark-sized
    (thousands of docs, like decontam.py's % 53 split), exactly the
    asymmetry fuzzy_join's blocking exploits (kept_r is tiny; the
    train side never shuffles more than its rare-gram prefix rows)."""
    pref = _prefix_frame(spark, sf)
    train = pref.filter("doc_id % 11 <> 0")
    evald = pref.filter("doc_id % 11 = 0")
    pairs = fuzzy_join(train, evald, "doc_id", "prefix",
                       "doc_id", "prefix", MAX_DIST, q=Q)
    return (pairs.groupBy(F.col("left_id").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_eval_matches"),
                 F.min("dist").alias("min_dist")))


# The oracle is INDEPENDENT brute force (train × eval levenshtein —
# ~0.09·n² calls at the % 11 split, cheap at oracle scales) — unlike the
# mirrored-blocking twins above, this one re-proves the cross-corpus
# blocking COMPLETE on real data every driver round, not just on the
# property-test corpora.
CORPUS_FUZZY_DECONTAMINATE_SQL = f"""
WITH {_NORM_PREFIX_CTE},
t AS (SELECT id, s FROM s WHERE id % 11 <> 0),
e AS (SELECT id, s FROM s WHERE id % 11 = 0),
pairs AS (
  SELECT t.id AS doc_id, levenshtein(t.s, e.s) AS dist
  FROM t, e
  WHERE levenshtein(t.s, e.s) <= {MAX_DIST}
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
       CAST(MIN(dist) AS BIGINT) AS min_dist
FROM pairs GROUP BY 1
"""

# registered r10 (staged r9, oracle-green at sf0.001 + sf0.01; the
# decontaminate oracle is INDEPENDENT brute force)
QUERIES = {
    "corpus_fuzzy_prefix": (corpus_fuzzy_prefix, CORPUS_FUZZY_PREFIX_SQL),
    "corpus_fuzzy_clusters": (corpus_fuzzy_clusters,
                              CORPUS_FUZZY_CLUSTERS_SQL),
    "corpus_fuzzy_decontaminate": (corpus_fuzzy_decontaminate,
                                   CORPUS_FUZZY_DECONTAMINATE_SQL),
}
