"""Fuzzy (edit-distance) self-match: hand-checked pairs, blocking
COMPLETENESS against a brute-force model (exhaustive short-class
corpus + a seeded mixed corpus with planted near-duplicates), the
cross-engine oracle, and the no-cross-product plan gate."""

import itertools
import random

import pytest

from iceberg_core_spark.functions.fuzzy import (
    QUERIES,
    fuzzy_self_match,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        if a is None or b is None:
            continue
        dist = _lev(a, b)
        if dist <= d:
            out.add((min(i, j), max(i, j), dist))
    return out


def _run(spark, rows, d, q=3):
    df = spark.createDataFrame(rows, "id long, s string")
    got = fuzzy_self_match(df, "id", "s", d, q=q).collect()
    return {(r["id_a"], r["id_b"], r["dist"]) for r in got}


def test_fuzzy_hand_examples(spark):
    rows = [(1, "hello world"), (2, "hello world!"), (3, "hello w0rld"),
            (4, "completely different"), (5, None), (6, "hello world")]
    got = _run(spark, rows, 2)
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 2), (1, 6, 0),
                   (2, 6, 1), (3, 6, 1)}


def test_fuzzy_short_class_exhaustive(spark):
    """Every string over {a,b} up to length 4 — all of them fall in
    the no-prefix-guarantee short class (≤ 2 distinct 3-grams), the
    adversarial regime for gram blocking. Must equal brute force
    exactly at d=1 and d=2."""
    strings = [""]
    for n in range(1, 5):
        strings += ["".join(p) for p in itertools.product("ab", repeat=n)]
    rows = list(enumerate(strings))
    for d in (1, 2):
        assert _run(spark, rows, d) == _brute(rows, d), f"d={d}"


def test_fuzzy_mixed_corpus_matches_brute_force(spark):
    """Seeded corpus mixing regimes: long strings over a 4-letter
    alphabet (prefix-guaranteed probes), their planted ≤2-edit
    mutations (true positives), repetitive single-run strings (long
    but short-CLASS — few distinct grams), and tiny strings."""
    rng = random.Random(20260815)
    alpha = "abcd"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(10, 16)))
            for _ in range(25)]

    def mutate(s, edits):
        s = list(s)
        for _ in range(edits):
            op = rng.choice("ids")
            p = rng.randrange(len(s) + (op == "i"))
            if op == "i":
                s.insert(p, rng.choice(alpha))
            elif op == "d" and s:
                s.pop(min(p, len(s) - 1))
            else:
                s[min(p, len(s) - 1)] = rng.choice(alpha)
        return "".join(s)

    strings = list(base)
    strings += [mutate(s, rng.randint(1, 2)) for s in base[:15]]
    strings += ["a" * n for n in (3, 9, 10, 11, 30)]
    strings += ["ab", "ba", "", "abc", "abd"]
    rows = list(enumerate(strings))
    for d in (1, 2):
        got, want = _run(spark, rows, d), _brute(rows, d)
        assert got == want, (f"d={d}: missed {sorted(want - got)[:5]}, "
                             f"extra {sorted(got - want)[:5]}")


def _brute_cross(lrows, rrows, d):
    out = set()
    for i, a in lrows:
        for j, b in rrows:
            if a is None or b is None:
                continue
            dist = _lev(a, b)
            if dist <= d:
                out.add((i, j, dist))
    return out


def test_fuzzy_join_cross_corpus_matches_brute_force(spark):
    """Two corpora with planted cross-mutations, both-short pairs,
    and COLLIDING id values (left 0 and right 0 are distinct
    entities — a cross join must not suppress them)."""
    from iceberg_core_spark.functions.fuzzy import fuzzy_join

    rng = random.Random(424242)
    alpha = "abcd"
    lbase = ["".join(rng.choice(alpha)
                     for _ in range(rng.randint(10, 15)))
             for _ in range(15)]

    def mutate(s, edits):
        s = list(s)
        for _ in range(edits):
            op = rng.choice("ids")
            p = rng.randrange(len(s) + (op == "i"))
            if op == "i":
                s.insert(p, rng.choice(alpha))
            elif op == "d" and s:
                s.pop(min(p, len(s) - 1))
            else:
                s[min(p, len(s) - 1)] = rng.choice(alpha)
        return "".join(s)

    lrows = list(enumerate(lbase + ["ab", "", "aaa", None]))
    rstrings = [mutate(s, rng.randint(0, 2)) for s in lbase[:10]]
    rstrings += ["ba", "a", "aaaa", "zzzzzzzzzzzz"]
    rrows = list(enumerate(rstrings))
    ldf = spark.createDataFrame(lrows, "lid long, ls string")
    rdf = spark.createDataFrame(rrows, "rid long, rs string")
    for d in (1, 2):
        got = {(r["left_id"], r["right_id"], r["dist"])
               for r in fuzzy_join(ldf, rdf, "lid", "ls", "rid", "rs",
                                   d).collect()}
        want = _brute_cross(lrows, rrows, d)
        assert got == want, (f"d={d}: missed {sorted(want - got)[:5]}, "
                             f"extra {sorted(got - want)[:5]}")


def test_fuzzy_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, s string")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_self_match(df, "id", "s", -1)
    with pytest.raises(ValueError, match="q must be"):
        fuzzy_self_match(df, "id", "s", 1, q=1)


def test_fuzzy_plan_no_cross_product(spark):
    """Candidates come from equi-joins only — no CartesianProduct /
    BroadcastNestedLoopJoin anywhere, at any corpus size."""
    fn, _sql = QUERIES["corpus_fuzzy_prefix"]
    plan = fn(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_fuzzy_oracle_match(spark, name):
    fn, sql = QUERIES[name]
    con = duck_connection(SF_DIR)
    compare(fn(spark, SF_DIR), con, sql, name)


def test_fuzzy_prefix_excludes_degenerate_non_ascii(spark, tmp_path):
    """r9 ADVICE regression: non-Latin-script documents normalize to
    empty/near-empty ASCII prefixes — before the MIN_PREFIX_LEN floor
    they all landed in one short-class length bucket (n² candidates,
    every empty pair 'matching' at distance 0). They must now be
    excluded from the prefix signal on BOTH engines."""
    import duckdb

    from iceberg_core_spark.functions.fuzzy import MIN_PREFIX_LEN

    rows = [
        (1, "这是一个完全非拉丁文的文档开头，没有任何ASCII字符可言"),
        (2, "这是另一个完全非拉丁文的文档，同样没有ASCII"),
        (3, "hi"),                                   # short ASCII
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "the quick brown fox jumps over the lazy hog"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    fn, sql = QUERIES["corpus_fuzzy_prefix"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'")
    result = fn(spark, str(tmp_path)).collect()
    compare(fn(spark, str(tmp_path)), con, sql, "fuzzy_non_ascii")

    pairs = {(r["id_a"], r["id_b"]) for r in result}
    assert pairs == {(4, 5)}, pairs  # degenerate docs never pair
    # and the floor is the documented guarantee threshold q*(d+1)
    assert MIN_PREFIX_LEN == 9
