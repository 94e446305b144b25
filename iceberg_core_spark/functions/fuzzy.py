"""Fuzzy (edit-distance) self-match — the string-similarity join every
entity-resolution / title-dedup pipeline needs: all pairs of strings
within Levenshtein distance ``d``, without the O(n²) cross product.

Blocking (segment pigeonhole, after PassJoin — Li, Deng & Feng,
PVLDB 2011; replaced the q-gram prefix filter in r10):

- split every string into k = d+1 contiguous SEGMENTS (even
  partition). An edit script of ≤ d operations can touch at most d of
  them, so at least one segment of A survives INTACT as an exact
  substring of any B within distance d.
- the intact segment's start position in B shifts by δ = (net
  insertions−deletions before it), and the edits after it account for
  the rest of the length change Δ = len(B)−len(A); since each edit
  contributes to exactly one side, |δ| + |Δ−δ| ≤ d. Candidates are
  therefore the EQUI-join ``probes(B) ⋈ segments(A)`` on
  (partner length, segment index, piece text), where B enumerates its
  substrings at exactly the (length, index, shift) combinations that
  bound allows — ≤ (2d+1)·(d+1) pieces per string, a constant.
- why not the classic rarest-q-gram prefix filter: its join keys are
  only as selective as the corpus' GRAM VOCABULARY is wide. On a
  template-heavy corpus (measured on this repo's synthetic documents:
  375 distinct 3-grams across 5000 prefixes) even the rarest grams
  have huge document frequency and the candidate set degenerates
  toward n² (5.03M candidate pairs for 256 true pairs at sf0.1).
  Segment pieces are length ⌊len/(d+1)⌋ ≥ q — long enough to be
  near-unique — and the SAME data yields 7.5k candidates: 665× fewer,
  and the gap widens with corpus size.
- strings shorter than q·(d+1) chars make every segment shorter than
  q — too unselective to index. They pair through a bucketized
  LENGTH-band join instead (each replicates to the buckets its
  [len−d, len+d] window overlaps — the range_join composition),
  complete because |len(a)−len(b)| ≤ d is necessary for ed ≤ d. This
  class is tiny (sub-9-char strings at the defaults) and its join is
  still an equi-join, never a cross product.
- every candidate pair is verified with the exact thresholded
  Levenshtein (JVM builtin, early-exit at d+1).

Completeness is property-tested against a brute-force model over
adversarial small alphabets (tests/test_fuzzy.py); cross-engine value
equality is oracle-checked with a DuckDB twin that mirrors the same
segmentation, probe enumeration, and shift bound.

At 100 TB: segmenting is map-side and emits d+1 rows per string
(probe enumeration ≤ (2d+1)(d+1), both constants); the candidate
join shuffles on (length, segment, piece) — long near-unique keys,
so no hot key fans out (AQE skew rules cover residual template
collisions); verification is bounded to candidates. No stage ever
materializes the cross product, and no corpus-wide frequency
aggregate exists anywhere (the q-gram design needed one per run —
segments are a per-string pure function, which is what makes the
persisted FuzzyIndex increment-only).

Registered r10 (staged r9): the query fns and oracles below follow
the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.operators.rangejoin import range_join
from iceberg_core_spark.session import load_table

Q = 3  # minimum segment width; guarantee class needs len >= q*(d+1)


def _check_params(max_dist: int, q: int) -> int:
    """Shared validation; returns the guarantee-class length floor
    q·(d+1) — the shortest length at which every one of the d+1
    segments is at least q chars wide (selective enough to index)."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (1-char segment pieces make "
                         "every pair collide — no blocking power)")
    return q * (max_dist + 1)


def _prep(frame: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id, __s, __len) projection; NULL texts dropped."""
    return frame.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        F.length(text_col).alias("__len"),
    ).filter(F.col("__s").isNotNull())


def _seg_geometry(la, seg, k: int):
    """(start, length) of segment ``seg`` (1-based) in the even
    partition of a string of length ``la`` into ``k`` pieces: the
    first k−(la mod k) segments get ⌊la/k⌋ chars, the rest one more.
    Pure integer Column arithmetic — identical in the DuckDB oracle
    text, so the two engines cannot disagree on a boundary."""
    base = (la / k).cast("int")          # la ≥ 0: trunc == floor
    rem = la % k
    start = F.lit(1) + (seg - 1) * base + F.greatest(
        F.lit(0), seg - 1 - (F.lit(k) - rem))
    slen = base + F.when(seg > F.lit(k) - rem, 1).otherwise(0)
    return start, slen


def _segments(prep: DataFrame, max_dist: int) -> DataFrame:
    """The indexed side: every string's d+1 segment pieces —
    (__id, __la, __seg, __piece), where __la is the string's own
    length (the probe side joins on it as the partner length)."""
    k = max_dist + 1
    out = prep.select(
        "__id", "__s", F.col("__len").alias("__la"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("__seg"))
    start, slen = _seg_geometry(F.col("__la"), F.col("__seg"), k)
    return out.select(
        "__id", "__la", "__seg",
        F.col("__s").substr(start, slen).alias("__piece"))


def _probes(prep: DataFrame, max_dist: int, min_len: int) -> DataFrame:
    """The probing side: every substring of each string that could be
    an intact segment of a guarantee-class partner —
    (__id, __len, __la, __seg, __piece) for partner lengths
    __la ∈ [len−d, len+d] ∩ [min_len, ∞), with the start shift δ
    bounded by |δ| + |Δ−δ| ≤ d (Δ = len−__la): δ covers the net
    length drift of the edits BEFORE the intact segment and Δ−δ the
    edits after, and the script has only d in total. ≤ (2d+1)(d+1)
    rows per string before the bound prunes."""
    k = max_dist + 1
    d = max_dist
    s, ln = F.col("__s"), F.col("__len")

    def piece_struct(la, seg, sh):
        start, slen = _seg_geometry(la, seg, k)
        bstart = start + sh
        keep = (
            (la >= min_len)
            & (F.abs(sh) + F.abs(ln - la - sh) <= d)
            & (bstart >= 1) & (bstart + slen - 1 <= ln)
        )
        return F.when(keep, F.struct(
            la.alias("__la"), seg.alias("__seg"),
            s.substr(bstart, slen).alias("__piece")))

    # the full (la, seg, sh) combo space — ≤ (2d+1)(d+1)(2d+1) entries
    # — is enumerated, pruned, and DEDUPED inside one array expression
    # (map-side, no exchange), then exploded once; the dedupe keeps a
    # repetitive string ("aaaa…": every shift yields the same piece)
    # from fanning the candidate join out
    combos = F.array_distinct(F.filter(
        F.flatten(F.flatten(F.transform(
            F.sequence(ln - d, ln + d), lambda la:
            F.transform(F.sequence(F.lit(1), F.lit(k)), lambda seg:
                        F.transform(F.sequence(F.lit(-d), F.lit(d)),
                                    lambda sh:
                                    piece_struct(la, seg, sh)))))),
        lambda x: x.isNotNull()))
    return (prep.select("__id", "__len",
                        F.explode(combos).alias("__p"))
            .select("__id", "__len", "__p.__la", "__p.__seg",
                    "__p.__piece"))


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


def _as_seg_side(segs: DataFrame) -> DataFrame:
    return segs.select(F.col("__id").alias("__rid"),
                       "__la", "__seg", "__piece")


def _as_probe_side(probes: DataFrame) -> DataFrame:
    return probes.select(F.col("__id").alias("__lid"),
                         "__la", "__seg", "__piece")


_JOIN_KEYS = ["__la", "__seg", "__piece"]


def fuzzy_self_match(strings: DataFrame, id_col: str, text_col: str,
                     max_dist: int, q: int = Q) -> DataFrame:
    """All unordered pairs of ``strings`` rows whose ``text_col``
    values are within Levenshtein distance ``max_dist`` (NULL texts
    never match; exact duplicates match at distance 0). Returns
    (id_a, id_b, dist) with id_a < id_b.

    ``id_col`` must be unique per row; ``q``/``max_dist`` set the
    guarantee-class floor q·(d+1) — every segment piece of an indexed
    string is at least q chars wide; shorter strings pair through the
    length-band join (module doc)."""
    min_len = _check_params(max_dist, q)
    s = _prep(strings, id_col, text_col)

    # (1) segment pigeonhole: a pair within distance d whose indexed
    # member is guarantee-class ALWAYS surfaces here — one of its d+1
    # segments survives intact in the other string, which enumerates
    # exactly the substrings the shift bound allows (module doc).
    # Probes come from EVERY string, so guaranteed × short pairs are
    # covered by the guaranteed member's segments.
    segs = _as_seg_side(_segments(s.filter(F.col("__len") >= min_len),
                                  max_dist))
    cand_probe = (
        _as_probe_side(_probes(s, max_dist, min_len))
        .join(segs, _JOIN_KEYS)
        .filter(F.col("__lid") != F.col("__rid"))
    )

    # (2) short class (both sides below the floor): complete via the
    # shared length-band range_join composition
    short = s.filter(F.col("__len") < min_len)
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

    Put the BIG corpus on the RIGHT: the right side contributes d+1
    segment rows per document, the left side the (2d+1)(d+1)-bounded
    probe substrings — the asymmetric shape batch-vs-corpus callers
    (decontamination, admission) want.

    Blocking mirrors the self-match with BOTH directions:
    `probes(left) ⋈ segments(right)` catches every pair whose RIGHT
    side is guarantee-class (one of its segments survives intact in
    the left string), and `probes(SHORT right) ⋈ segments(left)` the
    pairs whose right is short but left is guaranteed — the second
    join only needs the short-right probes, because guaranteed-right
    pairs already surfaced in direction one (restricting it keeps
    both-guaranteed pairs from being produced twice). Pairs where
    NEITHER side reaches the q·(d+1) floor go through the bucketized
    length-band range_join. Same completeness theorem per direction;
    property-tested against brute force."""
    min_len = _check_params(max_dist, q)
    sl = _prep(left, left_id, left_text)
    sr = _prep(right, right_id, right_text)
    short_l = sl.filter(F.col("__len") < min_len)
    short_r = sr.filter(F.col("__len") < min_len)

    segs_r = _as_seg_side(
        _segments(sr.filter(F.col("__len") >= min_len), max_dist))
    segs_l = _as_seg_side(
        _segments(sl.filter(F.col("__len") >= min_len), max_dist))
    # direction 2's probe side is the RIGHT corpus, so its join output
    # has probe ids in __lid and left ids in __rid — swap back
    cand_probe = (
        _as_probe_side(_probes(sl, max_dist, min_len)).join(
            segs_r, _JOIN_KEYS)
        .select("__lid", "__rid")
        .unionByName(
            _as_probe_side(_probes(short_r, max_dist, min_len)).join(
                segs_l, _JOIN_KEYS)
            .select(F.col("__rid").alias("__lid"),
                    F.col("__lid").alias("__rid")))
    )

    cand_short = _band_pairs(short_l, short_r, max_dist)
    cands = cand_probe.unionByName(cand_short).distinct()
    return _verify_pairs(cands, sl, sr, max_dist, "left_id", "right_id")


# ---------------------------------------------------------------------------
# registry query: near-identical document openings — pairs of docs
# whose normalized 40-char prefix is within edit distance 2

PREFIX_LEN = 40
MAX_DIST = 2
# Minimum normalized-prefix length to participate in matching: the
# guarantee-class floor q·(d+1) — the shortest length at which every
# one of the d+1 segments is ≥ q chars (selective enough to index).
# Below it the opening holds no usable identity signal — and,
# decisively, a non-Latin-script corpus normalizes to EMPTY/
# near-empty ASCII prefixes that would all fall into the short
# class's same length bucket (an n² candidate blow-up with every
# empty pair "matching" at distance 0). Such documents are EXCLUDED
# from the prefix signal entirely (r9 ADVICE); a script-aware
# normalization is the right tool for them, not a degenerate ASCII
# prefix.
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
    three corpus_fuzzy_* queries share, mirrored by _NORM_PREFIX_CTE.

    Persisted (MEMORY_AND_DISK): the self-match evaluates its input
    frame in four plan branches (segments, probes, short band, verify
    re-join), so the two corpus-wide regexp_replace passes would
    otherwise run 4-6x per query — measured 1.2-1.6x end-to-end at
    sf0.1. The frame is skinny (id + a <=40-char prefix, never the
    document text) and keeps lineage (persist, not checkpoint);
    owner-side lifecycle via ``caching.persist_site`` (one live
    entry per site, ``release_caches()`` frees it — r12 ADVICE)."""
    from iceberg_core_spark.caching import persist_site

    docs = load_table(spark, sf, "documents")
    return persist_site(
        "fuzzy.prefix_frame",
        docs.select(F.col("doc_id"),
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


# The DuckDB twin mirrors the SAME blocking (segment geometry, probe
# enumeration under the |δ|+|Δ−δ| ≤ d shift bound, q·(d+1) class
# floor, short class via the length band — which the band
# bucketization makes a plain |len diff| <= d here) and the same
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

# Mirror of the Spark blocking: the same even-partition segment
# geometry, the same probe (partner length, segment, shift)
# enumeration with the |δ| + |Δ−δ| ≤ d bound, the same q·(d+1)
# guarantee-class floor and length-band short class, the same
# thresholded verify. _D/_K/_MINLEN are spelled once here so the SQL
# text cannot drift from the constants the engine uses.
_D, _K, _MINLEN = MAX_DIST, MAX_DIST + 1, Q * (MAX_DIST + 1)

_FUZZY_PAIRS_CTES = f"""{_NORM_PREFIX_CTE},
st AS (SELECT id, s, length(s) AS len FROM s),
segs AS (
  SELECT id AS rid, len AS la, seg,
         substr(s, 1 + (seg-1)*(len//{_K})
                     + greatest(0, seg-1-({_K}-(len%{_K}))),
                (len//{_K})
                 + CASE WHEN seg > {_K}-(len%{_K}) THEN 1 ELSE 0 END)
           AS piece
  FROM (SELECT id, s, len, unnest(range(1, {_K}+1)) AS seg
        FROM st WHERE len >= {_MINLEN})
),
probes AS (
  SELECT DISTINCT id AS lid, la, seg,
         substr(s, bstart, slen) AS piece
  FROM (
    SELECT id, s, len, la, seg,
           1 + (seg-1)*(la//{_K}) + greatest(0, seg-1-({_K}-(la%{_K})))
             + sh AS bstart,
           (la//{_K})
             + CASE WHEN seg > {_K}-(la%{_K}) THEN 1 ELSE 0 END AS slen
    FROM (SELECT id, s, len, len + dl AS la, dl, seg, sh
          FROM st,
               (SELECT unnest(range(-{_D}, {_D}+1)) AS dl),
               (SELECT unnest(range(1, {_K}+1)) AS seg),
               (SELECT unnest(range(-{_D}, {_D}+1)) AS sh))
    WHERE la >= {_MINLEN}
      AND abs(sh) + abs((len - la) - sh) <= {_D}
  ) WHERE bstart >= 1 AND bstart + slen - 1 <= len
),
cand_probe AS (
  SELECT least(p.lid, g.rid) AS id_a, greatest(p.lid, g.rid) AS id_b
  FROM probes p JOIN segs g
    ON g.la = p.la AND g.seg = p.seg AND g.piece = p.piece
  WHERE p.lid <> g.rid
),
short AS (SELECT id, len FROM st WHERE len < {_MINLEN}),
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
    asymmetry fuzzy_join's blocking exploits: the eval side goes LEFT
    (probe substrings enumerated from the small corpus), the train
    side RIGHT (d+1 segment rows per doc — the big corpus never
    contributes more than that per document)."""
    pref = _prefix_frame(spark, sf)
    train = pref.filter("doc_id % 11 <> 0")
    evald = pref.filter("doc_id % 11 = 0")
    pairs = fuzzy_join(evald, train, "doc_id", "prefix",
                       "doc_id", "prefix", MAX_DIST, q=Q)
    return (pairs.groupBy(F.col("right_id").alias("doc_id"))
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
