"""Owner-side lifecycle for the library's internal ``persist()`` sites.

The dedup/fuzzy operators persist skinny intermediate frames (signature
arrays, LSH buckets, normalized prefixes) because their self-joins would
otherwise recompute a corpus-wide pipeline once per plan branch. Those
frames are cheap individually, but a library that persists and never
unpersists leaks cache entries in a long-lived session: every call over
a DIFFERENT input adds one, and the only documented escape hatch used to
be ``spark.catalog.clearCache()`` — global, so it also nukes caches the
caller owns (r12 ADVICE).

``persist_site`` bounds that growth to AT MOST ONE live entry per call
site:

- a re-invocation over the SAME input (semantically equal analyzed
  plan, the same test Spark's CacheManager uses for cache lookup)
  returns the already-live frame — same behavior as before, where the
  CacheManager deduped the second ``persist()`` anyway;
- a different input releases the site's previous entry FIRST, then
  persists the new frame — repeated calls over rotating corpora hold
  one entry, not N;
- ``release_caches()`` frees everything the library persisted without
  touching caller-owned caches.

Interleaving two corpora A,B,A,B through one site re-persists each time
(a recompute, never a correctness issue); callers with that access
pattern should persist their inputs themselves — the site cache then
rebuilds from the caller's cached frame.

The iterative connected-components checkpointer (dedup.py `_release_slot`)
and the persisted index classes (FuzzyIndex, AdmissionIndex) keep their
own explicit slot/snapshot lifecycles and do not route through here.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """True when the two frames' analyzed plans are semantically equal
    (Catalyst ``QueryPlan.sameResult`` — the CacheManager's own lookup
    test). Any py4j failure (stopped session, API drift) reports False,
    which degrades to release-and-repersist, never to a stale hit."""
    try:
        return bool(
            a._jdf.queryExecution().analyzed().sameResult(
                b._jdf.queryExecution().analyzed()
            )
        )
    except Exception:
        return False


def _still_persisted(df: DataFrame) -> bool:
    """True while ``df`` still holds a cache entry. External eviction
    (``spark.catalog.clearCache()``, a manual ``unpersist()``) drops the
    storage level to NONE; returning such a frame from the site would
    silently lose the optimization forever on same-input calls. Py4j
    failures report False — degrade to re-persist, never a stale hit."""
    try:
        lvl = df.storageLevel
        return bool(lvl.useMemory or lvl.useDisk)
    except Exception:
        return False


def persist_site(site: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) under a named call site, holding
    at most one live cache entry per site (see module docstring)."""
    with _LOCK:
        prev = _LIVE.get(site)
        if prev is not None:
            if _same_plan(prev, df) and _still_persisted(prev):
                return prev
            # different input, or the caller evicted the entry behind
            # our back (spark.catalog.clearCache(), manual unpersist —
            # r13 ADVICE): release and fall through to re-persist, so
            # the site never hands out a permanently-uncached frame
            try:
                prev.unpersist()
            except Exception:
                pass  # stopped session: the entry died with the JVM
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _LIVE[site] = out
        return out


def release_caches() -> int:
    """Unpersist every frame the library persisted via ``persist_site``
    — selective, unlike ``spark.catalog.clearCache()``: caller-owned
    caches survive. Returns the number of sites released."""
    with _LOCK:
        n = 0
        for df in _LIVE.values():
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
        _LIVE.clear()
        return n
