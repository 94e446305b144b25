"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the whole point of these at 100 TB):
- exact dedup: one hash-aggregate shuffle on the text (or its md5) —
  map-side partial aggregation collapses most duplicates before shuffle.
- near-dup: NEVER all-pairs. Candidates come from an equi-join on a
  blocking key (LSH band hash / SimHash chunk / length+lang bucket), so
  the join is a plain hash join on a short key; the exact similarity is
  only computed on candidates. All-pairs variants here exist solely as
  sf-scale oracles.
- everything is built-in expressions (xxhash64, array_*, transform) —
  no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

def fround(col, n: int) -> F.Column:
    """Cross-engine-deterministic rounding: floor(x*10^n + 0.5)/10^n in
    pure double arithmetic. Engine-native round() diverges on doubles
    (Spark rounds the shortest decimal repr HALF_UP; DuckDB rounds the
    binary value), so oracle outputs use this instead — both engines
    evaluate the identical IEEE expression."""
    scale = float(10 ** n)
    return F.floor(col * scale + 0.5) / scale


def fround_sql(expr: str, n: int) -> str:
    scale = float(10 ** n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Group identical texts; keep the smallest id as canonical.
    Returns (keep_id, n_copies, text_md5) per distinct content.

    Groups by md5(text), NOT the text itself: the aggregation key
    crossing the shuffle is 32 hex chars instead of the document body,
    so per-doc shuffle bytes stay ~constant at 100 TB (map-side
    partial agg collapses within-partition copies either way, but
    every DISTINCT text would otherwise ship whole). An md5 collision
    would merge two distinct texts — the identical contract the output
    already exposes, since text_md5 IS the content identity handed to
    consumers (and the same digest-as-identity stance the table
    layer's content_hash dedupe takes)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies", "text_md5")
    )


# ---------------------------------------------------------------------------
# token shingles + exact Jaccard (verification primitive)
# ---------------------------------------------------------------------------

def _distinct_tokens(text_col) -> F.Column:
    return F.array_distinct(F.split(F.lower(text_col), r"[ \t\n\x0B\f\r]+"))


def shingles(text_col, n: int = 3) -> F.Column:
    """n-token shingles as strings (contiguous, overlapping)."""
    toks = F.split(F.lower(text_col), r"[ \t\n\x0B\f\r]+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def jaccard(a, b) -> F.Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def _spread_verify(cand: DataFrame,
                   cols: tuple[str, str] = ("doc_a", "doc_b")) -> DataFrame:
    """Give the VERIFY stage compute-proportional parallelism. The
    candidate frame is skinny (two id columns — a few bytes/row), so
    AQE's bytes-based coalescing collapses it to ~1 partition; the
    per-candidate exact verification (O(|tokens|) set intersection,
    or an interpreted-HOF cosine over embedding arrays) then runs
    serially — measured 2.5 s of dedup_clusters' 3.3 s at sf0.1 on
    one core. Hash-repartitioning the id pairs to cluster width costs
    ~nothing (skinny rows) and spreads verification across every
    core; at real scale, where the candidate set is already wide, it
    pins the stage at cluster width instead of letting coalescing
    undershoot compute-heavy work."""
    spark = cand.sparkSession
    return cand.repartition(
        spark.sparkContext.defaultParallelism, *cols)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    length_col: str = "n_chars",
    length_tol: int = 20,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by token-set Jaccard, candidates blocked on
    (block_cols, LENGTH BAND). The length band is part of the EQUI join
    key, not a residual: docs band into floor(len/tol) buckets and the
    right side explodes each doc into its band ± 1 (multiprobe — the
    same neighbor-expansion trick embedding_dup_pairs_lsh uses), which
    covers every pair with |len diff| <= tol exactly once. Without the
    band in the key, the join is equi on block_cols alone — few distinct
    languages ⇒ near-quadratic within a language at scale; with it, the
    shuffle key has ~(langs × len/tol) distinct values and candidate
    count is linear in real near-dup density."""
    band = F.floor(F.col(length_col) / length_tol).cast("long")
    # Candidate generation on SKINNY rows only (id, block cols, len,
    # band) — token arrays must not ride through the candidate join:
    # (a) the shuffle/broadcast payload stays a few bytes per row, and
    # (b) the O(|toks|²) Jaccard can't get folded into the join residual
    # where it would run on every (band, block)-matching probe BEFORE
    # the cheap id-order/length conditions (measured: minutes vs
    # seconds at sf0.1). Same shape as minhash_lsh_pairs: skinny
    # equi-join → candidate ids → re-join payloads by id → verify.
    a = df.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
        F.col(length_col).alias("a_len"),
        band.alias("a_band"),
    )
    b = df.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
        F.col(length_col).alias("b_len"),
        F.explode(F.array(band - 1, band, band + 1)).alias("b_band"),
    )
    eq = F.col("a_band") == F.col("b_band")
    for c in block_cols:
        eq = eq & (F.col(f"a_{c}") == F.col(f"b_{c}"))
    cand = _spread_verify(
        a.join(b, eq)
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("a_len") - F.col("b_len")) <= length_tol)
        )
        .select("doc_a", "doc_b")
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        _distinct_tokens(F.col(text_col)).alias("toks"),
    )
    pairs = (
        cand.join(toks.select(F.col("id").alias("doc_a"),
                              F.col("toks").alias("a_toks")), "doc_a")
        .join(toks.select(F.col("id").alias("doc_b"),
                          F.col("toks").alias("b_toks")), "doc_b")
    )
    jc = jaccard(F.col("a_toks"), F.col("b_toks"))
    return (
        pairs.select("doc_a", "doc_b", fround(jc, 4).alias("jacc"))
        .filter(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(shingle_col, num_perm: int = 16) -> list[F.Column]:
    """num_perm minhash columns: mh[p] = min over shingles of
    xxhash64(shingle, p). Deliberately UNROLLED into separate column
    expressions: each is referenced exactly once downstream, so Catalyst
    inlines it into a single evaluation. (A nested
    transform(sequence(...)) form is 12x slower — higher-order-function
    lambdas are interpreted, and the shared signature subexpression gets
    re-evaluated per band because interpreted mode has no CSE.)"""
    return [
        F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(p)))
        ).alias(f"mh{p}")
        for p in range(num_perm)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup detection:

    shingle → signature array → band hashes (xxhash64 over signature
    slices) → equi-join on (band index, band hash) → exact Jaccard
    verification on candidates.

    Scale shape: the band join shuffles ONLY (band_idx, band_hash, id)
    — shingle arrays never enter the exploded shuffle; verification
    re-joins them by id afterwards. Candidates are tiny vs n².
    Collision probability for a pair with Jaccard s: 1-(1-s^r)^b,
    r = num_perm/bands.

    The SIGNATURE frame persists (MEMORY_AND_DISK): the self-join's
    two sides would otherwise each recompute the whole shingle +
    minhash pipeline — measured 1.3-1.6× on the end-to-end query. The
    cached frame is skinny (id + num_perm longs, ~150 B/doc — never
    the shingle arrays, which stay recompute-on-use so nothing
    corpus-scale is pinned) and keeps its lineage for fault tolerance
    (unlike a localCheckpoint). Lifecycle is owner-side via
    ``caching.persist_site``: one live entry per site, released when
    the input changes or by ``release_caches()`` (r12 ADVICE).
    """
    from iceberg_core_spark.caching import persist_site
    from iceberg_core_spark.session import spread

    rows_per_band = num_perm // bands
    shingled = spread(df).select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    sig = persist_site("dedup.minhash_sig", shingled.select(
        "id", *minhash_signature(F.col("sh"), num_perm)
    ))

    def band_hash(b: int):
        return F.xxhash64(
            *[F.col(f"mh{p}")
              for p in range(b * rows_per_band, (b + 1) * rows_per_band)]
        )

    exploded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), band_hash(b).alias("band_hash"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band_idx", "bk.band_hash")

    cand = _spread_verify(
        exploded.alias("l")
        .join(exploded.alias("r"), ["band_idx", "band_hash"])
        .select(F.col("l.id").alias("doc_a"), F.col("r.id").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_only = shingled
    pairs = (
        cand.join(sh_only.select(F.col("id").alias("doc_a"),
                                 F.col("sh").alias("a_sh")), "doc_a")
        .join(sh_only.select(F.col("id").alias("doc_b"),
                             F.col("sh").alias("b_sh")), "doc_b")
    )
    jc = jaccard(F.col("a_sh"), F.col("b_sh"))
    return (
        pairs.select("doc_a", "doc_b", fround(jc, 4).alias("jacc"))
        .filter(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _signed_mask(bit: int) -> int:
    """Single-bit mask as a signed 64-bit value (bit 63 → sign bit)."""
    return 1 << bit if bit < 63 else -(1 << 63)


def simhash64(text_col) -> F.Column:
    """64-bit SimHash from token xxhashes, entirely with built-ins:
    for each bit, sum +1/-1 over tokens by that bit of xxhash64(token);
    bit set iff the sum is positive. No UDF — 64 Python-unrolled array
    folds (bit positions are compile-time constants, so the whole
    expression stays in codegen). Summing disjoint signed masks
    reconstructs the word (two's complement handles bit 63)."""
    toks = F.array_distinct(F.split(F.lower(text_col), r"[ \t\n\x0B\f\r]+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote_fn(mask: int):
        def merge(acc, h):
            return acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

        return merge

    out = F.lit(0).cast("long")
    for bit in range(64):
        mask = _signed_mask(bit)
        vote = F.aggregate(hashes, F.lit(0), vote_fn(mask))
        out = out + F.when(vote > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    n_chunks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidates blocked
    by pigeonhole over signature chunks. Output is blocking-invariant:
    every pair within ``max_hamming`` bits, exactly. ``n_chunks``
    defaults to ``max_hamming + 2`` (chunk-pair blocking at any
    radius); before r14 a caller-raised ``max_hamming`` beyond
    ``n_chunks - 1`` silently LOST recall (a pair can differ in every
    chunk) — that is now a ValueError.

    Blocking (the 100 TB term): with ``n_chunks >= max_hamming + 2``
    (default 9 for hamming 7), a qualifying pair has at least TWO
    equal chunks, so candidates join on chunk-PAIR keys — C(9,2)=36
    combination indexes × ~14 bits of key (Manku et al., WWW'07
    multi-block probing). Single-chunk blocking (still taken when
    ``n_chunks == max_hamming + 1``) keys on 64/8 = 8 bits — 256
    buckets per chunk index — so its BACKGROUND candidate volume is
    8·n²/2⁹ pairs regardless of near-dup structure; pair keys cut
    that constant ~16× (36·n²/2¹⁵) for a 36-vs-8-row skinny explode.
    Both terms stay quadratic — that is inherent to pigeonhole
    blocking at hamming 7 on a 64-bit signature — so the mode choice
    moves the constant, not the exponent. Measured honestly (r14,
    25k docs): signature compute dominates at test scale and the
    modes land within ±15% of each other (pair faster on
    unique-text corpora, slower when dense replica clusters collide
    in all 36 combos); the default buys the 16× background constant
    for the billion-doc regime where background dwarfs true
    collisions. For tighter radii (hamming <= 3) pass n_chunks=4:
    16-bit single chunks beat both.

    The signature frame persists (id + one long/doc): the chunk
    self-join's two sides would otherwise each re-evaluate the 64
    per-bit array folds over every document — measured ~1.6× on the
    end-to-end query. Lineage kept; owner-side lifecycle via
    ``caching.persist_site`` (one live entry, ``release_caches()``)."""
    from iceberg_core_spark.caching import persist_site
    from iceberg_core_spark.session import spread

    if n_chunks is None:
        n_chunks = max_hamming + 2
    if n_chunks < max_hamming + 1:
        raise ValueError(
            f"n_chunks={n_chunks} cannot guarantee recall for "
            f"hamming <= {max_hamming} (need >= {max_hamming + 1})")
    if n_chunks > 64:
        raise ValueError("n_chunks > 64: chunks would be empty")
    sh = persist_site("dedup.simhash_sig", spread(df).select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh")
    ))
    # n disjoint chunks covering all 64 bits (last chunk takes the
    # remainder, so uneven widths are fine for pigeonhole)
    w = 64 // n_chunks

    def chunk(c: int):
        bits = (64 - c * w) if c == n_chunks - 1 else w
        return (F.shiftrightunsigned("sh", c * w)
                .bitwiseAND(F.lit((1 << bits) - 1)))

    pair_mode = n_chunks >= max_hamming + 2
    if pair_mode:
        combos = [(i, j) for i in range(n_chunks)
                  for j in range(i + 1, n_chunks)]
        keys = F.array(*[
            F.struct(F.lit(i * n_chunks + j).alias("combo"),
                     chunk(i).alias("ca"), chunk(j).alias("cb"))
            for i, j in combos
        ])
        join_on = ["combo", "ca", "cb"]
        chunks = sh.select(
            "id", "sh", F.explode(keys).alias("ck")
        ).select("id", "sh", "ck.combo", "ck.ca", "ck.cb")
    else:
        keys = F.array(*[
            F.struct(F.lit(c).alias("chunk_idx"),
                     chunk(c).alias("chunk"))
            for c in range(n_chunks)
        ])
        join_on = ["chunk_idx", "chunk"]
        chunks = sh.select(
            "id", "sh", F.explode(keys).alias("ck")
        ).select("id", "sh", "ck.chunk_idx", "ck.chunk")
    l = chunks.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"),
                      *join_on)
    r = chunks.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"),
                      *join_on)
    cand = (
        l.join(r, join_on)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# dedup clustering: pairs → connected components → canonical doc
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "doc_id",
    max_iter: int = 30,
    work_dir: str | None = None,
    driver_threshold_edges: int = 1_000_000,
    memory_threshold_edges: int = 4_000_000,
) -> DataFrame:
    """Near-dup PAIRS → GROUPS: assign every id the MIN id reachable
    through the pair graph (connected components), the step that turns
    pairwise dedup output into "keep one canonical doc per duplicate
    cluster". Returns (id_col, canon_id).

    Scale algorithm: alternating LARGE-STAR / SMALL-STAR edge rewriting
    (the published MapReduce-era CC construction — Kiveris et al.,
    "Connected Components in MapReduce and Beyond"), re-expressed as
    DataFrame aggregations. Each round rewires every edge toward the
    minimum id seen in its neighborhood; the edge set collapses into
    per-component STARS centered on the component minimum in O(log²)
    rounds REGARDLESS of id placement. (Plain min-label propagation —
    the obvious alternative — is Θ(diameter) rounds when ids are
    shuffled along chains, and template-generated near-dup corpora
    produce exactly such chains: measured 15 rounds vs 5 on the sf0.1
    documents pair graph.)

    ADAPTIVE execution (round 3), decided by the measured deduped edge
    count — the result is bit-identical on every path:

    - ``<= driver_threshold_edges``: the graph is solved EXACTLY with
      one union-find over the collected (u, v) pairs — a 1M-edge graph
      is 16 MB and milliseconds of path-compressed find/union, versus
      ~10 distributed shuffle rounds of pure scheduling overhead. This
      is the common case after LSH banding (edges ≪ corpus) and the
      same small-graph cutoff production graph systems apply.
    - ``<= memory_threshold_edges``: star iteration with edge sets as
      eager localCheckpoints (in-memory RDD blocks, lineage truncated;
      per-round cost is scheduling, not I/O).
    - larger: star iteration with Parquet slots in ``work_dir`` —
      fault-tolerant storage-backed lineage truncation whose row counts
      come free from file FOOTERS (metadata-only). A 100 TB pair graph
      iterates storage-backed exactly as before.

    Iteration must materialize the edge set each half-round: genuinely-
    iterative DataFrame jobs need lineage truncation, and each half-
    round's output is consumed MORE THAN ONCE by the next (as
    neighborhood, as min-aggregate input), so without materialization
    the star subtrees would re-execute per reference.
    ``ids`` supplies the full node set — docs in no pair become
    singleton clusters (canon = self).
    """
    import os
    import shutil
    import tempfile

    spark = pairs.sparkSession
    owned = work_dir is None
    wd = work_dir or tempfile.mkdtemp(prefix="cc_work_")
    slot = [0]
    last_n = [None]  # edge count of the latest materialized slot
    mats: dict[int, DataFrame] = {}
    # executor-storage bookkeeping: localCheckpoint blocks are NOT in the
    # CacheManager (df.unpersist() can't free them), so each slot's RDD
    # ids are captured by diffing JavaSparkContext.getPersistentRDDs
    # around the checkpoint, and released explicitly — a long-lived
    # session iterating many huge graphs must not accumulate storage
    # waiting on driver GC
    slot_rdds: dict[int, set] = {}

    def _persistent_ids() -> set:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    def _release_slot(s: int) -> None:
        mats.pop(s, None)
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in slot_rdds.pop(s, ()):  # noqa: B905
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)

    def materialize(df: DataFrame) -> tuple[DataFrame, int]:
        """Materialize one half-round's edges, adaptively: memory
        (eager localCheckpoint + count job over cached blocks) at or
        below the threshold, Parquet slot (count from footers, no job)
        above it. A memory slot that measures huge re-lands as a
        Parquet slot (written from the cached blocks, not recomputed),
        so mid-iteration growth degrades gracefully. Only the last
        three slots stay materialized (the fixpoint probe reads
        slot-2); older memory slots' checkpoint blocks are unpersisted
        eagerly."""
        import pyarrow.parquet as pq

        slot[0] += 1
        if last_n[0] is None or last_n[0] <= memory_threshold_edges:
            before = _persistent_ids()
            out = df.localCheckpoint(eager=True)
            n = out.count()
            slot_rdds[slot[0]] = _persistent_ids() - before
            if n > memory_threshold_edges:
                # measured huge: move to a fault-tolerant parquet slot
                # (written from the cached blocks, not recomputed)
                path = f"{wd}/edges_{slot[0]}"
                out.write.mode("overwrite").parquet(path)
                out = spark.read.parquet(path)
                _release_slot(slot[0])  # blocks copied to parquet
        else:
            path = f"{wd}/edges_{slot[0]}"
            df.write.mode("overwrite").parquet(path)
            n = sum(
                pq.read_metadata(os.path.join(dp, f)).num_rows
                for dp, _d, fs in os.walk(path)
                for f in fs if f.endswith(".parquet")
            )
            out = spark.read.parquet(path)
        mats[slot[0]] = out
        last_n[0] = n
        _release_slot(slot[0] - 3)  # probe never reads past slot-2
        return out, n

    from pyspark.sql import Window

    try:
        # Raw undirected edge set, self-loops dropped, NOT deduped yet:
        # union-find is duplicate-insensitive and the star path dedups
        # in its own materialization — skipping distinct() here saves a
        # full shuffle on the common (small-graph) path. The raw count
        # only gates the path choice, so overcounting duplicates merely
        # errs toward the distributed path — the safe direction. The
        # probe uses a RELEASABLE cache (persist, not localCheckpoint):
        # the pair pipeline computes once, and the blocks are freed
        # before returning instead of pinning executor storage for the
        # session's lifetime.
        from pyspark import StorageLevel

        raw = (
            pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_edges = raw.count()

        if n_edges <= driver_threshold_edges:
            # small-graph fast path: exact union-find over the collected
            # edges (bounded by the threshold — 1M edges ≈ 16 MB, Arrow
            # transfer), same result as the star iteration, none of its
            # per-round jobs
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            pdf = raw.toPandas()
            raw.unpersist()
            for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by MIN so roots are component minima
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
            labels = [(x, find(x)) for x in list(parent)]
            id_type = ids.schema[id_col].dataType
            lab_schema = StructType([
                StructField("id", id_type), StructField("canon", id_type),
            ])
            star = F.broadcast(spark.createDataFrame(labels, lab_schema))
            return (
                ids.select(F.col(id_col).alias("id"))
                .join(star, "id", "left")
                .select(
                    F.col("id").alias(id_col),
                    F.coalesce("canon", "id").alias("canon_id"),
                )
            )

        # distributed star iteration: dedupe the edge set once (first
        # real slot), release the probe cache, then alternate
        # large/small-star to fixpoint
        last_n[0] = n_edges
        edges, n_edges = materialize(raw.distinct())
        raw.unpersist()

        # min(Γ(u) ∪ {u}) per neighborhood as a WINDOW aggregate: one
        # partitionBy(u) shuffle replaces the groupBy+re-join pair (two
        # shuffles) of the textbook formulation — same result, and the
        # hub-node skew is identical to what the join-on-u had.
        w_u = Window.partitionBy("u")
        m = F.least(F.min("v").over(w_u), F.col("u"))

        for _ in range(max_iter):
            n_before = n_edges
            # large-star: every neighbor v > u re-links to min(Γ(u)∪{u});
            # no distinct here — duplicate edges don't change the next
            # half-round's mins and the fixpoint count only reads the
            # deduped small-star output
            nbr = edges.union(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            edges, _n = materialize(
                nbr.withColumn("m", m)
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
            )
            # small-star: neighbors v < u re-link to the min, and every
            # node keeps an edge to its min — both emitted in ONE pass
            # over the windowed frame (explode), deduped at the write
            nbr = edges.union(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            pair_uv = F.struct(F.col("u"), F.col("m").alias("v"))
            pair_vm = F.struct(F.col("v").alias("u"), F.col("m").alias("v"))
            small = (
                nbr.withColumn("m", m)
                .select(
                    F.explode(
                        F.when(F.col("v") < F.col("u"),
                               F.array(pair_vm, pair_uv))
                        .otherwise(F.array(pair_uv))
                    ).alias("e")
                )
                .select("e.u", "e.v")
            )
            edges, n_edges = materialize(
                small.filter(F.col("u") != F.col("v")).distinct()
            )
            # Converged when the edge set is a fixed point (stars). Edge
            # counts shrink until then for this rewriting; the free
            # footer-count equality is the fixpoint probe, then one
            # anti-join confirms set equality exactly.
            if n_edges == n_before:
                prev = mats[slot[0] - 2]
                if edges.exceptAll(prev).limit(1).count() == 0:
                    break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds — pathological graph; raise max_iter"
            )

        # stars: edges (v=center, u=member) after small-star point
        # members at centers via (u=member? ) — final edges are (u, v)
        # with v = component min for every non-min u
        star = edges.select(F.col("u").alias("id"),
                            F.col("v").alias("canon"))
        out = (
            ids.select(F.col(id_col).alias("id"))
            .join(star, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.coalesce("canon", "id").alias("canon_id"),
            )
        )
        # materialize the RESULT (one shallow checkpoint, no chain)
        # before the owned temp dir disappears
        out_path = f"{wd}/labels_out"
        out.write.mode("overwrite").parquet(out_path)
        result = spark.read.parquet(out_path)
        if owned:
            result = result.localCheckpoint(eager=True)
        return result
    finally:
        # free EVERY remaining slot's checkpoint blocks — the result is
        # parquet-backed (or its own fresh checkpoint), so no registered
        # query holds a reference into the iteration's storage
        for s in list(slot_rdds):
            _release_slot(s)
        if owned:
            shutil.rmtree(wd, ignore_errors=True)


def dedup_cluster_assign(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Full clustering verdict per document: (doc_id, canon_id, keep,
    cluster_size). ``keep`` marks the canonical (min-id) member — the
    row a training pipeline retains; duplicates carry their canon for
    lineage."""
    from pyspark.sql import Window

    cc = connected_components(pairs, df.select(id_col), a_col, b_col, id_col)
    size = F.count(F.lit(1)).over(Window.partitionBy("canon_id"))
    return cc.select(
        id_col,
        "canon_id",
        (F.col(id_col) == F.col("canon_id")).alias("keep"),
        size.alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine(a, b) -> F.Column:
    """Cosine similarity of two array<double> columns — built-in fold,
    JVM-side, deterministic left-to-right accumulation."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                            lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0),
                            lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_dup_pairs_lsh(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Bucketed embedding near-dup — the 100 TB twin of
    ``embedding_dup_pairs`` (which is all-pairs and exists only as this
    function's oracle, the same relationship minhash_lsh_pairs has to
    ngram_jaccard_pairs).

    Shape: each vector gets a random-hyperplane LSH bucket (sign bits of
    seeded projections, similarity.bucket_expr). Candidates come from an
    equi-join on the bucket key; to also catch pairs whose buckets differ
    by up to ``multiprobe_hamming`` bits (near-identical vectors can
    straddle one hyperplane), the right side explodes each bucket into
    itself plus its 1-bit-flip neighbors, so the join stays EQUI. Only
    (bucket, id) crosses the candidate shuffle — vectors are re-joined by
    id for the exact-cosine verification, and only candidate pairs pay
    it. Approximate by construction (recall < 1 when a pair differs in
    >multiprobe_hamming sign bits), hence registered rows-only; the
    planted-pair recall test bounds it empirically.
    """
    from iceberg_core_spark.functions.similarity import bucket_expr, hyperplanes
    from iceberg_core_spark.session import spread

    if multiprobe_hamming not in (0, 1):
        raise ValueError("multiprobe_hamming must be 0 or 1")
    from iceberg_core_spark.caching import persist_site

    planes = hyperplanes(dim, n_planes, seed)
    vecs = spread(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # skinny (id, bucket) persists: the bucket self-join's two sides
    # would otherwise each recompute the n_planes projections per
    # vector; the VECTORS stay recompute-on-use (corpus-scale — the
    # verify re-joins them by id). Lineage kept; owner-side lifecycle
    # via persist_site (one live entry, release_caches() frees it).
    bucketed = persist_site("dedup.embedding_buckets", vecs.select(
        "id", bucket_expr(F.col("v"), planes).alias("b")
    ))
    left = bucketed.select("id", F.col("b").alias("bk"))
    probes = [F.col("b")]
    if multiprobe_hamming == 1:
        probes += [
            F.col("b").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(n_planes)
        ]
    right = bucketed.select("id", F.explode(F.array(*probes)).alias("bk"))
    cand = _spread_verify(
        left.alias("l")
        .join(right.alias("r"), "bk")
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"]),
        cols=("id_a", "id_b"),
    )
    pairs = (
        cand.join(vecs.select(F.col("id").alias("id_a"),
                              F.col("v").alias("va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"),
                          F.col("v").alias("vb")), "id_b")
    )
    sim = fround(cosine(F.col("va"), F.col("vb")), 4)
    return pairs.select("id_a", "id_b", sim.alias("sim")).filter(
        F.col("sim") >= threshold
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
) -> DataFrame:
    """All-pairs cosine near-dup (oracle-checkable at sf scale). The
    100 TB path is the LSH-bucketed variant in similarity.py — this
    exact form exists to verify it. BOTH sides spread(): whichever
    side the nested-loop join broadcasts, the streamed side then has
    cluster-width partitions instead of a single-file scan's one —
    the O(n²) cosine work is the cost center and must parallelize."""
    from iceberg_core_spark.session import spread

    wide = spread(df)
    a = wide.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).cast("array<double>").alias("va"))
    b = wide.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).cast("array<double>").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = fround(cosine(F.col("va"), F.col("vb")), 4)
    return pairs.select("id_a", "id_b", sim.alias("sim")).filter(
        F.col("sim") >= threshold
    )
