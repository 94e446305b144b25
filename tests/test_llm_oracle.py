"""LLM-data ops: oracle parity for the deterministic ops, plus semantic
unit tests for the hash-family ops (MinHash-LSH, SimHash) on synthetic
near-duplicates the testdata may not contain."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.functions import dedup as D
from iceberg_core_spark.functions import similarity as S
from iceberg_core_spark.functions.decontam import QUERIES as DECONTAM
from iceberg_core_spark.functions.dedup_incremental import (
    QUERIES as INCREMENTAL,
)
from iceberg_core_spark.functions.dedup_portable import QUERIES as PORTABLE
from iceberg_core_spark.functions.packing import QUERIES as PACKING
from iceberg_core_spark.functions.llm_queries import QUERIES as _LLM
from tests.oracle import compare, duck_connection

QUERIES = {**_LLM, **DECONTAM, **PACKING, **PORTABLE, **INCREMENTAL}

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql]
ROWS_ONLY_CASES = [(n, fn) for n, (fn, sql) in QUERIES.items() if not sql]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES,
                         ids=[c[0] for c in ORACLE_CASES])
def test_llm_oracle_match(spark, con, name, fn, sql):
    compare(fn(spark, SF_DIR), con, sql, name)


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES,
                         ids=[c[0] for c in ROWS_ONLY_CASES])
def test_llm_rows_only_runs(spark, name, fn):
    df = fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0


# ---------------------------------------------------------------------------
# semantic tests on synthetic near-duplicates
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # 1-token change
    far = "completely different content about spark distributed query engines"
    rows = [
        (1, base, "en", len(base)),
        (2, near, "en", len(near)),
        (3, base, "en", len(base)),      # exact dup of 1
        (4, far, "en", len(far)),
        (5, "unrelated short text", "en", 20),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])


def test_dedup_exact_finds_duplicate(spark, docs):
    out = D.dedup_exact(docs).collect()
    dup = [r for r in out if r.n_copies == 2]
    assert len(dup) == 1 and dup[0].keep_id == 1


def test_minhash_lsh_finds_near_dup_not_far(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in
             D.minhash_lsh_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_simhash_near_dup_small_hamming(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             D.simhash_pairs(docs, max_hamming=12).collect()}
    assert pairs.get((1, 3)) == 0  # identical text → identical simhash
    assert (1, 2) in pairs  # near dup within hamming budget


def test_jaccard_pairs_values(spark, docs):
    got = {(r.doc_a, r.doc_b): r.jacc for r in
           D.ngram_jaccard_pairs(docs, length_tol=100, threshold=0.5).collect()}
    assert got[(1, 3)] == 1.0
    assert 0.8 < got[(1, 2)] < 1.0


def test_connected_components_chain_and_singleton(spark):
    """A pair CHAIN (1-2, 2-3) must collapse to one cluster labeled by
    its min id (transitivity — exactly what pairwise output lacks);
    untouched docs stay singletons with keep=True."""
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    got = {r.doc_id: r for r in
           D.dedup_cluster_assign(ids, pairs).collect()}
    assert [got[i].canon_id for i in (1, 2, 3)] == [1, 1, 1]
    assert got[1].keep and not got[2].keep and not got[3].keep
    assert got[1].cluster_size == 3
    assert got[4].canon_id == 4 and got[4].keep and got[4].cluster_size == 1
    assert got[7].canon_id == 7


@pytest.mark.parametrize("driver_threshold", [1_000_000, 0])
def test_connected_components_shuffled_chain(spark, driver_threshold):
    """Ids SHUFFLED along a long chain — the adversarial layout where
    plain min-label propagation needs Θ(length) rounds; the star
    rewriting must still converge (and to the right min). Run on BOTH
    adaptive paths: driver union-find and distributed star iteration
    (forced via driver_threshold_edges=0)."""
    import random

    rng = random.Random(5)
    perm = list(range(120))
    rng.shuffle(perm)
    pairs = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(119)], ["doc_a", "doc_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(120)], ["doc_id"])
    cc = {r.doc_id: r.canon_id
          for r in D.connected_components(
              pairs, ids, driver_threshold_edges=driver_threshold).collect()}
    assert set(cc.values()) == {0}


def test_connected_components_releases_executor_storage(spark):
    """The distributed star path materializes each half-round as an
    eager localCheckpoint; those blocks are NOT CacheManager-managed, so
    connected_components must unpersist them itself — a long-lived
    session iterating many graphs would otherwise accumulate executor
    storage until driver GC. After the call, at most ONE persistent RDD
    beyond the baseline may remain (the returned result's own shallow
    checkpoint)."""

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], ["doc_a", "doc_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    before = n_persistent()
    out = D.connected_components(pairs, ids, driver_threshold_edges=0)
    assert {r.canon_id for r in out.collect()} == {0}
    # ~10 half-round checkpoints ran; all but the result must be freed
    assert n_persistent() - before <= 1


def test_ivf_topk_finds_planted_neighbors(spark):
    """IVF with enough probes must recover planted near-duplicates of
    the query (they land in the query's nearest cells)."""
    import numpy as np

    rng = np.random.default_rng(11)
    q = rng.standard_normal(32)
    rows = [(i, [float(x) for x in (q + 0.05 * rng.standard_normal(32))])
            for i in range(5)]
    rows += [(i, [float(x) for x in rng.standard_normal(32)])
             for i in range(5, 200)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qv = [float(x) for x in q]
    approx = [r.vec_id for r in
              S.ivf_topk(emb, qv, k=5, n_cells=8, n_probe=3).collect()]
    assert len(set(approx) & set(range(5))) >= 4


def test_ivf_index_build_once_query_many(spark, tmp_path):
    """The persisted IVF index must (a) answer from the prebuilt
    cell-partitioned table without re-fitting — a reload from disk alone
    serves queries — (b) prune the probed scan to a subset of files, and
    (c) recover planted near-duplicates like the one-shot twin."""
    import numpy as np

    rng = np.random.default_rng(11)
    q = rng.standard_normal(32)
    rows = [(i, [float(x) for x in (q + 0.05 * rng.standard_normal(32))])
            for i in range(5)]
    rows += [(i, [float(x) for x in rng.standard_normal(32)])
             for i in range(5, 200)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    root = str(tmp_path / "ivf")
    S.IvfIndex.build(spark, emb, root, n_cells=8, sample_fraction=0.8)

    idx = S.IvfIndex(spark, root)  # reload: no DataFrame, no re-fit
    qv = [float(x) for x in q]
    got = [r.vec_id for r in idx.topk(qv, k=5, n_probe=3).collect()]
    assert len(set(got) & set(range(5))) >= 4
    # probing 3 of 8 cells must not read every file of the table
    probed = idx.topk(qv, k=5, n_probe=3)
    assert len(probed.inputFiles()) < idx.table.file_count()


def test_ivf_staleness_monitors_and_rebuild(spark, tmp_path):
    """The build-once quantizer's two staleness monitors are
    complementary and rebuild() resets both: (a) drifted appends that
    WERE assigned to their nearest (stale) centroid raise the
    quantization-error ratio while assignment_drift stays ~0;
    (b) misassigned rows raise assignment_drift; (c) rebuild refits +
    reassigns in one overwrite commit and both monitors return to
    fresh values with the shifted region queryable."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(17)
    base = [(i, [float(x) for x in rng.standard_normal(16)])
            for i in range(300)]
    emb = spark.createDataFrame(base, ["vec_id", "embedding"])
    root = str(tmp_path / "ivf")
    idx = S.IvfIndex.build(spark, emb, root, n_cells=8)
    assert 0.5 < idx.staleness(sample_fraction=1.0) < 1.5
    assert idx.assignment_drift(sample_fraction=1.0) < 0.05

    def assigned_df(rows):
        return spark.createDataFrame(
            rows, ["vec_id", "embedding", "cell"]
        ).select("vec_id", "embedding", F.col("cell").cast("int"))

    # (a) new source at +6 offset, assigned via the stale centroids
    # (the documented streaming-append path): error ratio explodes,
    # assignment consistency does not
    cents = idx.centroids
    shifted = []
    for i in range(150):
        v = rng.standard_normal(16) + 6.0
        cell = int(((cents - v) ** 2).sum(axis=1).argmin())
        shifted.append((1000 + i, [float(x) for x in v], cell))
    idx.table.append(assigned_df(shifted), dedupe_identical_files=False)
    assert idx.staleness(sample_fraction=1.0) > 2.0
    assert idx.assignment_drift(sample_fraction=1.0) < 0.05

    # (b) rows bulk-loaded with WRONG cells: drift monitor fires
    wrong = [(2000 + i, v, (c + 1) % 8)
             for i, (_vid, v, c) in enumerate(shifted[:50])]
    idx.table.append(assigned_df(wrong), dedupe_identical_files=False)
    assert idx.assignment_drift(sample_fraction=1.0) > 0.05

    # (c) rebuild: refit on the stored corpus, one overwrite commit
    idx.rebuild()
    assert idx.table.scan().count() == 500
    assert 0.5 < idx.staleness(sample_fraction=1.0) < 1.5
    assert idx.assignment_drift(sample_fraction=1.0) < 0.05
    ops = [s.operation
           for s in idx.table.manifest.snapshots(load_files=False)]
    assert ops == ["create", "append", "append", "overwrite"]
    # the shifted region is now modeled: its vectors come back from a
    # pruned probe (query = a shifted vector; itself must rank first)
    qv = shifted[3][1]
    probed = idx.topk(qv, k=5, n_probe=2)
    got = [r.vec_id for r in probed.collect()]
    assert got[0] == shifted[3][0]
    assert len(probed.inputFiles()) < idx.table.file_count() or \
        idx.table.file_count() <= 2


def test_embedding_dedup_lsh_finds_planted_pairs(spark):
    """The bucketed near-dup twin must recover planted high-cosine pairs
    (cos ≈ 0.995+: per-plane sign-flip prob ≈ 0.03, so 1-bit multiprobe
    recall ≈ 0.98 per pair) and agree with the all-pairs oracle twin on
    the pairs it does emit."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows = []
    for i in range(5):  # 5 planted pairs: (i, i+100) near-identical
        v = rng.standard_normal(32)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 100, [float(x) for x in v + 0.03 * rng.standard_normal(32)]))
    for i in range(10, 80):  # noise
        rows.append((i, [float(x) for x in rng.standard_normal(32)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {(r.id_a, r.id_b): r.sim for r in
             D.embedding_dup_pairs(emb, threshold=0.97).collect()}
    lsh = {(r.id_a, r.id_b): r.sim for r in
           D.embedding_dup_pairs_lsh(emb, dim=32, threshold=0.97).collect()}
    planted = {(i, i + 100) for i in range(5)}
    assert planted <= set(exact)                      # oracle finds all
    assert len(planted & set(lsh)) >= 4               # LSH recovers ≥4/5
    assert all(lsh[p] == exact[p] for p in lsh)       # candidate sims exact


def test_lsh_topk_finds_planted_neighbors(spark):
    """LSH recall is only meaningful with actual near neighbors; uniform
    random vectors have no structure to find. Plant 5 high-cosine
    variants of the query among 200 random vectors."""
    import numpy as np

    rng = np.random.default_rng(7)
    q = rng.standard_normal(32)
    rows = []
    for i in range(5):  # planted: tiny perturbations, cosine ≈ 0.995+
        v = q + 0.05 * rng.standard_normal(32)
        rows.append((i, [float(x) for x in v]))
    for i in range(5, 200):  # noise
        rows.append((i, [float(x) for x in rng.standard_normal(32)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    qv = [float(x) for x in q]
    exact = [r.vec_id for r in S.cosine_topk(emb, qv, k=5).collect()]
    approx = [r.vec_id for r in
              S.lsh_topk(emb, qv, k=5, multiprobe_hamming=1).collect()]
    assert set(exact) == set(range(5))  # brute force finds all planted
    assert len(set(approx) & set(range(5))) >= 4  # LSH recovers ≥4/5


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized cross-check: the large/small-star DataFrame CC must
    match a driver-side union-find oracle on random graphs spanning
    cliques, chains, sparse forests, and isolated nodes."""
    import random

    def union_find_labels(n, edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # canonical label = min id reachable
        labels = {}
        for x in range(n):
            root = find(x)
            labels.setdefault(root, []).append(x)
        return {x: min(m) for _root, m in labels.items() for x in m}

    for seed, n, n_edges in [(11, 60, 40), (12, 80, 200), (13, 50, 10)]:
        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(n_edges)]
        want = union_find_labels(n, edges)
        pairs = spark.createDataFrame(
            edges or [(0, 0)], ["doc_a", "doc_b"])
        ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        # both adaptive paths must agree with the oracle: the driver
        # union-find fast path AND the distributed star iteration
        for thresh in (1_000_000, 0):
            got = {r.doc_id: r.canon_id
                   for r in D.connected_components(
                       pairs, ids,
                       driver_threshold_edges=thresh).collect()}
            assert got == want, (
                f"seed {seed} thresh {thresh}: CC disagrees with union-find"
            )


def test_dedup_clusters_minhash_invariants(spark, sf_dir):
    """The scale-path clustering (MinHash pairs → CC) must produce a
    valid clustering: one row per doc, exactly one keep per cluster,
    canon = min member, sizes consistent."""
    from iceberg_core_spark.functions.llm_queries import dedup_clusters_minhash

    rows = dedup_clusters_minhash(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canon_id, []).append(r)
    for canon, members in by_canon.items():
        ids = sorted(m.doc_id for m in members)
        assert canon == ids[0]  # canonical is the min member
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1 and keeps[0].doc_id == canon
        assert all(m.cluster_size == len(members) for m in members)


def test_kmv_estimate_accuracy(spark):
    """The portable KMV sketch is cross-engine verified by the oracle
    parametrization above; this bounds its ERROR — the estimate must
    sit within the expected ~1/sqrt(K) band of the exact distinct
    count (and be exact for groups with < K distinct users)."""
    import pyspark.sql.functions as F

    from iceberg_core_spark.functions.dedup_portable import (
        KMV_K, agg_approx_distinct_portable)
    from iceberg_core_spark.session import load_table

    est = {r.event_type: r.approx_users
           for r in agg_approx_distinct_portable(spark, SF_DIR).collect()}
    exact = {r[0]: r[1]
             for r in load_table(spark, SF_DIR, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id")).collect()}
    assert est.keys() == exact.keys()
    for et, e in exact.items():
        if e < KMV_K:
            assert est[et] == e, f"{et}: sub-K group must be exact"
        else:
            assert abs(est[et] - e) / e < 4 / (KMV_K ** 0.5), (et, est[et], e)


def test_dedup_incremental_verdict_tiers(spark):
    """Planted batch-vs-corpus admission outcomes: byte-identical text
    and a case/whitespace variant are exact_dup (normalized
    fingerprint, min corpus id on corpus-internal duplicates), a
    one-word edit of a long doc is near_dup with its best match, and
    unrelated text is unique (nulled match columns)."""
    from iceberg_core_spark.functions.dedup_incremental import dedup_batch

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "completely different text about engines and tables"),
         (3, base)],  # corpus-internal duplicate: min id must win
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, base),                              # exact
         (101, "  ALPHA beta   gamma delta epsilon zeta eta theta iota "
               "kappa lam mu nu xi omicron pi rho sigma tau upsilon phi "
               "chi "),                            # exact via normalization
         (102, base + " omega"),                   # near (one appended word)
         (103, "unrelated content counting rows in a parquet footer")],
        "doc_id long, text string")
    out = {r.doc_id: (r.verdict, r.match_id, r.jacc)
           for r in dedup_batch(corpus, batch).collect()}
    assert out[100] == ("exact_dup", 1, None)
    assert out[101] == ("exact_dup", 1, None)
    assert out[102][0] == "near_dup" and out[102][1] in (1, 3)
    assert out[102][2] is not None and out[102][2] >= 0.5
    assert out[103] == ("unique", None, None)


def test_admission_index_matches_scan_derived(spark, tmp_path):
    """The persisted AdmissionIndex must produce byte-identical
    verdicts to the on-the-fly dedup_batch (same _judge pipeline, two
    feeds), stay idempotent across re-syncs, skip rewrite-only
    snapshots, and refuse row-removing tables."""
    import pytest as _pytest

    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
        dedup_batch,
    )
    from iceberg_core_spark.table import IceTable

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    cdf = spark.createDataFrame(
        [(1, base), (2, "corpus text about parquet row groups"),
         (3, base)],
        "doc_id long, text string")
    t = IceTable.create(spark, str(tmp_path / "t"), cdf.filter("doc_id<3"),
                        partition_col=None, key_col="doc_id")
    t.append(cdf.filter("doc_id=3"))

    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    assert idx.sync(t) == 2  # create + append
    assert idx.sync(t) == 0  # idempotent

    batch = spark.createDataFrame(
        [(100, base), (101, base + " omega"), (102, "nothing alike here")],
        "doc_id long, text string")
    want = sorted(map(tuple, dedup_batch(cdf, batch).collect()))
    got = sorted(map(tuple, idx.judge(batch).collect()))
    assert got == want

    # a compact rewrites files but adds no rows: synced as a no-op,
    # verdicts unchanged (no duplicate index rows inflating matches)
    t.append(cdf.filter("doc_id=2"))  # fragment so compact has victims
    assert idx.sync(t) == 1
    t.compact(min_files=2)
    assert idx.sync(t) == 0
    got2 = sorted(map(tuple, idx.judge(batch).collect()))
    # doc 2 now appears twice in the corpus (appended again) — verdicts
    # for the batch are unaffected (its matches are docs 1/3)
    assert got2 == want

    # row-removing ops poison an admission corpus: sync must refuse
    t.delete_where("doc_id = 2")
    with _pytest.raises(ValueError, match="append-only"):
        idx.sync(t)


def test_admission_index_key_pushdown(spark, tmp_path):
    """The judge's batch fingerprint / band-hash In filters must reach
    the persisted parquet scans (PushedFilters), and toggling the
    pushdown off must not change a single verdict — necessary
    conditions of the equi-joins, a plan change only."""
    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    cdf = spark.createDataFrame(
        [(1, base), (2, "corpus text about parquet row groups"),
         (3, "a third corpus document about manifests")],
        "doc_id long, text string")
    t = IceTable.create(spark, str(tmp_path / "t"), cdf.filter("doc_id<3"),
                        partition_col=None, key_col="doc_id")
    t.append(cdf.filter("doc_id=3"))
    deflt = AdmissionIndex(spark, str(tmp_path / "idx"))
    deflt.sync(t)
    deflt.compact()  # fp/bands range-clustered by their keys from here

    batch = spark.createDataFrame(
        [(100, base), (101, base + " omega"), (102, None)],
        "doc_id long, text string")
    # KB-sized store: the default auto-gate (GB threshold) keeps the
    # pushdown off — its planning overhead would exceed the scan
    deflt_plan = deflt.judge(batch)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "In(fp" not in deflt_plan and "In(band_hash" not in deflt_plan
    idx = AdmissionIndex(spark, str(tmp_path / "idx"),
                         pushdown_min_store_bytes=0)
    plan = idx.judge(batch)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "In(fp" in plan, plan[:2000]
    assert "In(band_hash" in plan, plan[:2000]
    off = AdmissionIndex(spark, str(tmp_path / "idx"),
                         pushdown_max_keys=0)
    off_plan = off.judge(batch)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "In(fp" not in off_plan and "In(band_hash" not in off_plan
    assert (sorted(map(tuple, idx.judge(batch).collect()))
            == sorted(map(tuple, off.judge(batch).collect())))


def test_admission_index_compaction(spark, tmp_path):
    """compact() consolidates the per-snapshot sync dirs into one
    generation dir with byte-identical verdicts; sync continues into
    the new generation; a partial next-generation dir left by a crash
    is overwritten, never read."""
    import os as _os

    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    cdf = spark.createDataFrame(
        [(1, base), (2, "unrelated corpus text"), (3, base + " extra")],
        "doc_id long, text string")
    t = IceTable.create(spark, str(tmp_path / "t"),
                        cdf.filter("doc_id = 1"),
                        partition_col=None, key_col="doc_id")
    t.append(cdf.filter("doc_id = 2"))
    t.append(cdf.filter("doc_id = 3"))

    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    idx.sync(t)
    batch = spark.createDataFrame(
        [(100, base), (101, "nothing alike at all")],
        "doc_id long, text string")
    before = sorted(map(tuple, idx.judge(batch).collect()))
    gen_dir = idx._kind_dir("fp")
    assert len([d for d in _os.listdir(gen_dir)
                if d.startswith("snap=")]) == 3

    # a crashed earlier compact left partial garbage in gen=1: it must
    # be overwritten, not trusted
    poison = _os.path.join(str(tmp_path / "idx"), "fp", "gen=1", "snap=0")
    _os.makedirs(poison)
    spark.createDataFrame([("junk", 999)], "fp string, __cid long") \
        .write.mode("overwrite").parquet(poison)

    assert idx.compact() == 1
    assert idx.generation() == 1
    after = sorted(map(tuple, idx.judge(batch).collect()))
    assert after == before
    # one consolidated snap dir; old generation swept
    new_dir = idx._kind_dir("fp")
    assert len([d for d in _os.listdir(new_dir)
                if d.startswith("snap=")]) == 1
    assert not _os.path.isdir(gen_dir)
    # nothing to compact -> no generation churn
    assert idx.compact() == 1

    # sync continues into the compacted generation
    t.append(spark.createDataFrame([(4, "fresh doc after compact")],
                                   "doc_id long, text string"))
    assert idx.sync(t) == 1
    ids = sorted(r["__cid"] for r in
                 idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2, 3, 4]


def test_admission_index_gap_and_rollback_rebuild(spark, tmp_path):
    """The two recovery paths that must NOT silently skip documents:
    (a) the synced snapshot expired out of the chain → full rebuild
    (a skip would permanently miss the expired increments' docs and
    admit their duplicates); (b) a rollback → full rebuild (restored
    or un-appended rows aren't derivable from the chain); and the
    metadata-only publish is skipped, not poisonous."""
    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    def doc(i):
        return (i, f"document number {i} with its own words")

    t = IceTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([doc(1)], "doc_id long, text string"),
        partition_col=None, key_col="doc_id")
    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    assert idx.sync(t) == 1

    # (a) watermark gap: two appends, then expire the synced snapshot
    t.append(spark.createDataFrame([doc(2)], "doc_id long, text string"))
    t.append(spark.createDataFrame([doc(3)], "doc_id long, text string"))
    expired = t.expire_snapshots(keep_last=1)
    assert idx.synced_snapshot() in expired
    assert idx.sync(t) == 1          # rebuild, one pass
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2, 3]          # nothing missed
    assert idx.sync(t) == 0          # incremental again

    # (b) WAP: the staged append syncs EMPTY (files hidden); the
    # publish indexes exactly the revealed rows
    t.append(spark.createDataFrame([doc(4)], "doc_id long, text string"),
             branch="audit")
    assert idx.sync(t) == 1          # staged append → empty increment
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2, 3]          # doc 4 not visible yet
    t.publish_branch("audit")
    assert idx.sync(t) == 1          # the publish reveals doc 4
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2, 3, 4]

    # (c) rollback to before doc 4: rebuild drops it from the index
    snaps = t.manifest.snapshots(load_files=False)
    target = [s.snapshot_id for s in snaps if s.operation == "append"][1]
    t.rollback(target)
    idx.sync(t)
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2, 3]
    assert idx.sync(t) == 0


def test_drop_branch_skips_without_rebuild(spark, tmp_path):
    """r11 review: drop-branch removes only files its staged appends
    HID from the main view (the index synced them as empty
    increments), so sync treats it like a metadata commit — watermark
    advance, NO corpus-pass rebuild (generation unchanged)."""
    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    def doc(i):
        return (i, f"document number {i} with its own words")

    t = IceTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([doc(1), doc(2)],
                              "doc_id long, text string"),
        partition_col=None, key_col="doc_id")
    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    assert idx.sync(t) == 1
    gen_before = idx.generation()
    t.append(spark.createDataFrame([doc(3)], "doc_id long, text string"),
             branch="audit")
    assert idx.sync(t) == 1          # staged append → empty increment
    t.drop_branch("audit")
    assert idx.sync(t) == 0          # metadata skip, not a rebuild
    assert idx.generation() == gen_before  # no generation flip
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2]             # visible set never changed


def test_recovery_rebuild_still_raises_on_contract_violation(
        spark, tmp_path):
    """r11 review: a rollback-triggered rebuild must NOT paper over a
    later upsert — the append-only raise is path-independent."""
    import pytest

    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    def doc(i):
        return (i, f"document number {i} with its own words")

    t = IceTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([doc(1)], "doc_id long, text string"),
        partition_col=None, key_col="doc_id")
    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    assert idx.sync(t) == 1
    t.append(spark.createDataFrame([doc(2)], "doc_id long, text string"))
    appends = [s.snapshot_id for s in
               t.manifest.snapshots(load_files=False)
               if s.operation in ("create", "append")]
    t.rollback(appends[0])
    t.upsert(spark.createDataFrame([(1, "edited text body")],
                                   "doc_id long, text string"),
             key_cols=["doc_id"])
    with pytest.raises(ValueError, match="append-only"):
        idx.sync(t)


def test_corrupt_meta_self_heals_on_sync(spark, tmp_path):
    """r11 review: a truncated/corrupt _meta.json (power loss) heals
    like a missing one — the next sync re-walks the chain
    idempotently instead of raising JSONDecodeError forever."""
    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    def doc(i):
        return (i, f"document number {i} with its own words")

    t = IceTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([doc(1)], "doc_id long, text string"),
        partition_col=None, key_col="doc_id")
    t.append(spark.createDataFrame([doc(2)], "doc_id long, text string"))
    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    assert idx.sync(t) == 2
    with open(idx._meta_path(), "w") as f:
        f.write("")                  # zero-length: the fsync-gap shape
    assert idx.synced_snapshot() is None  # treated as missing
    assert idx.sync(t) == 2         # full idempotent re-walk
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2]


def test_publish_sync_survives_maptype_columns(spark, tmp_path):
    """r11 review: scan_changes refuses MapType columns, but the index
    only needs (id, text) — the publish sync falls back to a skinny
    anti-join on ids and still indexes exactly the revealed rows."""
    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    from iceberg_core_spark.table import IceTable

    def doc(i):
        return (i, f"document number {i} with its own words",
                {"source": f"s{i}"})

    schema = "doc_id long, text string, meta map<string,string>"
    t = IceTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([doc(1), doc(2)], schema),
        partition_col=None, key_col="doc_id")
    idx = AdmissionIndex(spark, str(tmp_path / "idx"))
    assert idx.sync(t) == 1
    t.append(spark.createDataFrame([doc(3)], schema), branch="audit")
    assert idx.sync(t) == 1          # staged → empty increment
    t.publish_branch("audit")
    assert idx.sync(t) == 1          # fallback path reveals doc 3
    ids = sorted(r["__cid"] for r in idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 2, 3]


def test_batch_topk_null_embeddings_rank_last(spark):
    """The Arrow pre-top-k must agree with the window's
    DESC-NULLS-LAST order: NULL-embedding rows (NULL sim) may only
    reach the top-k as tail padding when a query has fewer than k
    real matches — never by evicting a scored row from its batch
    (r12 review). Reference = the window-only formulation over the
    same scored frame."""
    from pyspark.sql import Row, Window

    from iceberg_core_spark.functions.dedup import cosine, fround

    rows = [Row(vec_id=i,
                embedding=None if i % 2 else [float(i), 1.0])
            for i in range(1, 21)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [Row(qid=1, embedding=[1.0, 0.0])],
        "qid long, embedding array<double>")
    got = S.cosine_topk_batch(corpus, queries, k=15,
                              query_id_col="qid").collect()
    # window-only reference (no pre-top-k) over the identical scoring
    q = queries.select("qid", F.col("embedding").cast("array<double>")
                       .alias("__qv"))
    c = corpus.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("__dv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "vec_id",
        fround(cosine(F.col("__dv"), F.col("__qv")), 4).alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                          F.col("vec_id"))
    want = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 15)
            .select("qid", "vec_id", "sim", "rn").collect())
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # 10 real matches, then NULL padding ordered by id
    nulls = [r for r in got if r.sim is None]
    assert len(nulls) == 5 and all(r.rn > 10 for r in nulls)


def test_simhash_blocking_modes_identical_output(spark, docs):
    """r14: chunk-pair blocking (default) and single-chunk blocking
    must emit the IDENTICAL pair set — blocking affects candidates,
    never results — and an unsatisfiable radius must raise instead of
    silently losing recall (pre-r14, max_hamming > n_chunks - 1
    dropped pairs that differ in every chunk)."""
    import pytest

    pair = {(r.doc_a, r.doc_b, r.hamming)
            for r in D.simhash_pairs(docs).collect()}
    single = {(r.doc_a, r.doc_b, r.hamming)
              for r in D.simhash_pairs(docs, n_chunks=8).collect()}
    assert pair == single
    with pytest.raises(ValueError, match="cannot guarantee recall"):
        D.simhash_pairs(docs, max_hamming=9, n_chunks=8)
