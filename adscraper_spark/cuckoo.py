"""Partitioned cuckoo-filter URL-seen segments — the deletable
alternative to :mod:`adscraper_spark.bloom`.

Same role and store layout as the bloom segments (SURVEY.md §7.3: one
segment per host-hash partition, persisted per checkpoint wave, strictly
a PRE-filter in front of the exact anti-join), built as a partial-key
cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014; standard public
construction): 4-slot buckets of 16-bit fingerprints, alternate bucket
``i2 = i1 XOR hash(fp)``, bounded eviction chain.

Why offer it at all when bloom is smaller per key? **Deletion.** A bloom
segment can only grow; recrawl policies (expire a URL's seen-entry after
its revisit interval) and retracting rolled-back admissions need
``delete``. The cuckoo filter supports exact-occurrence delete natively.

Soundness contract (same as bloom, SURVEY §4.2): the engine treats a
filter MISS as "definitely new" and skips the exact anti-join, so the
filter must never produce a false negative for an inserted key. Two
guards keep that true under load:

- an insert whose eviction chain fails lands in a bounded stash that
  ``might_contain`` always consults;
- a full stash flips the segment to ``saturated`` — every probe then
  answers "maybe seen", degrading to pure anti-join cost, never to a
  dropped-or-duplicated URL.

``delete`` is only sound for keys actually inserted (deleting a
never-inserted key could strip another key's identical fingerprint —
the documented cuckoo-filter caveat); the engine only deletes
previously-admitted URLs, which satisfies that.

Reference analog: the same in-memory ``Set<string>`` as bloom.py
(crawler/src/pages/find-page.ts:12-16,48,77) — the reference never
deletes either; deletion is the scale feature the 10^10-URL frontier
needs for recrawl/expiry that a Set gets for free.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from .bloom import _hash_pair, durable_replace
from .hashing import stable_hash64

SLOTS_PER_BUCKET = 4
MAX_KICKS = 500
STASH_MAX = 64
#: buckets sized for ~80% load — conservative vs the paper's 95% so the
#: eviction chain (and therefore the stash) is rarely exercised.
KEYS_PER_BUCKET_TARGET = 3.2


def _fingerprint(h1: int) -> int:
    """16-bit nonzero fingerprint from the url hash (0 = empty slot)."""
    return (h1 >> 48) % 65535 + 1


@lru_cache(maxsize=65536)  # fp space is 16-bit — the cache covers it fully
def _fp_hash(fp: int) -> int:
    return stable_hash64("cuckoofp|%d" % fp)


def _alt_bucket(bucket: int, fp: int, mask: int) -> int:
    # partial-key displacement: i2 = i1 xor H(fp); xor keeps the pair
    # involutive so either copy can recover the other without the key.
    return (bucket ^ _fp_hash(fp)) & mask


class CuckooSegment:
    """One partition's cuckoo filter. ~16.8 bits/key at the 80% target
    load vs bloom's 10 — the price of deletability and a ~1e-5 FPR."""

    def __init__(self, nbuckets: int, table: np.ndarray | None = None,
                 stash: list[tuple[int, int]] | None = None,
                 saturated: bool = False):
        assert nbuckets >= 2 and nbuckets & (nbuckets - 1) == 0
        self.nbuckets = nbuckets
        self.table = table if table is not None else np.zeros(
            (nbuckets, SLOTS_PER_BUCKET), dtype=np.uint16)
        self.stash: list[tuple[int, int]] = list(stash or [])
        self.saturated = bool(saturated)

    @classmethod
    def sized_for(cls, expected_keys: int) -> "CuckooSegment":
        need = max(64, int(expected_keys / KEYS_PER_BUCKET_TARGET) + 1)
        return cls(nbuckets=1 << (need - 1).bit_length())

    # -- core ops ------------------------------------------------------------
    def _fp_and_buckets(self, url: str) -> tuple[int, int, int]:
        h1, _h2 = _hash_pair(url)
        fp = _fingerprint(h1)
        mask = self.nbuckets - 1
        b1 = h1 & mask
        return fp, b1, _alt_bucket(b1, fp, mask)

    def add(self, url: str) -> None:
        if self.saturated:
            return
        fp, b1, b2 = self._fp_and_buckets(url)
        for b in (b1, b2):
            row = self.table[b]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = fp
                return
        # evict: deterministic chain (seed-stable engine requirement) —
        # start bucket and victim slot derive from the fingerprint+kick.
        mask = self.nbuckets - 1
        b = b1 if fp & 1 else b2
        cur = fp
        for kick in range(MAX_KICKS):
            slot = (cur + kick) % SLOTS_PER_BUCKET
            victim = int(self.table[b, slot])
            self.table[b, slot] = cur
            cur = victim
            b = _alt_bucket(b, cur, mask)
            row = self.table[b]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = cur
                return
        # chain exhausted: stash the orphan so no inserted key can ever
        # read as a miss; a full stash saturates the whole segment.
        self.stash.append((cur, b))
        if len(self.stash) > STASH_MAX:
            self.saturated = True
            self.stash.clear()

    def might_contain(self, url: str) -> bool:
        if self.saturated:
            return True
        fp, b1, b2 = self._fp_and_buckets(url)
        if (self.table[b1] == fp).any() or (self.table[b2] == fp).any():
            return True
        # stash entries record (fp, bucket-at-eviction); any bucket on
        # fp's displacement orbit matches either endpoint of the pair.
        return any(s_fp == fp and s_b in (b1, b2) for s_fp, s_b in self.stash)

    def delete(self, url: str) -> bool:
        """Remove ONE occurrence of ``url``'s fingerprint. Only sound
        for previously-inserted keys (module docstring). Returns whether
        a copy was found; on a saturated segment deletion is a no-op
        (membership is already all-maybe)."""
        if self.saturated:
            return False
        fp, b1, b2 = self._fp_and_buckets(url)
        for b in (b1, b2):
            row = self.table[b]
            hit = np.flatnonzero(row == fp)
            if hit.size:
                row[hit[0]] = 0
                return True
        for i, (s_fp, s_b) in enumerate(self.stash):
            if s_fp == fp and s_b in (b1, b2):
                del self.stash[i]
                return True
        return False

    def add_many(self, urls) -> None:
        for u in urls:
            self.add(u)

    def might_contain_many(self, urls) -> list[bool]:
        return [self.might_contain(u) for u in urls]

    def delete_many(self, urls) -> int:
        return sum(1 for u in urls if self.delete(u))

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        tmp = os.path.join(os.path.dirname(path),
                           ".tmp-" + os.path.basename(path))
        stash_fp = np.array([s[0] for s in self.stash], dtype=np.uint16)
        stash_b = np.array([s[1] for s in self.stash], dtype=np.int64)
        with open(tmp, "wb") as f:
            np.savez(f, table=self.table, stash_fp=stash_fp,
                     stash_b=stash_b,
                     saturated=np.array([self.saturated]))
        durable_replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "CuckooSegment":
        with np.load(path, allow_pickle=False) as z:
            table = z["table"]
            stash = list(zip(z["stash_fp"].tolist(), z["stash_b"].tolist()))
            saturated = bool(z["saturated"][0])
        return cls(nbuckets=table.shape[0], table=table, stash=stash,
                   saturated=saturated)


class CuckooStore:
    """Directory of per-partition cuckoo segments, versioned by wave —
    same layout contract as BloomStore (``{root}/p{P}/wave-{W}.npz``,
    live wave chosen by the engine manifest) so the engine swaps stores
    without touching checkpoint logic."""

    SEGMENT_EXT = ".npz"

    def __init__(self, root: str, num_partitions: int,
                 expected_keys_per_partition: int = 100_000):
        self.root = root
        self.num_partitions = num_partitions
        self.expected = expected_keys_per_partition

    def segment_path(self, partition: int, wave: int) -> str:
        return os.path.join(self.root, f"p{partition}",
                            f"wave-{wave}{self.SEGMENT_EXT}")

    def load_segment(self, partition: int, wave: int) -> CuckooSegment:
        d = os.path.join(self.root, f"p{partition}")
        if os.path.isdir(d):
            best = -1
            for name in os.listdir(d):
                if name.startswith("wave-") and name.endswith(
                        self.SEGMENT_EXT):
                    try:
                        w = int(name[5:-len(self.SEGMENT_EXT)])
                    except ValueError:
                        continue
                    if w <= wave and w > best:
                        best = w
            if best >= 0:
                return CuckooSegment.load(self.segment_path(partition, best))
        return CuckooSegment.sized_for(self.expected)

    def _locked_rmw(self, partition: int, wave: int, fn) -> None:
        # same flock rationale as BloomStore.update_segment: concurrent
        # jobs sharing a filesystem must serialize the read-modify-write
        # or the first writer's entries are lost (a lost insert is a
        # false NEGATIVE here — the one unsound direction).
        import fcntl

        d = os.path.join(self.root, f"p{partition}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, ".lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            seg = self.load_segment(partition, wave)
            fn(seg)
            seg.save(self.segment_path(partition, wave))

    def update_segment(self, partition: int, wave: int, urls) -> None:
        self._locked_rmw(partition, wave, lambda seg: seg.add_many(urls))

    def delete_segment_urls(self, partition: int, wave: int, urls) -> None:
        """Retract previously-inserted URLs (recrawl expiry / rollback
        cleanup) — the operation bloom structurally cannot do."""
        self._locked_rmw(partition, wave, lambda seg: seg.delete_many(urls))


def make_seen_store(kind: str, root: str, num_partitions: int,
                    expected_keys_per_partition: int = 100_000):
    """Factory for the engine's seen-filter store (CrawlConfig.seen_filter)."""
    if kind == "cuckoo":
        return CuckooStore(root, num_partitions, expected_keys_per_partition)
    if kind == "bloom":
        from .bloom import BloomStore
        return BloomStore(root, num_partitions, expected_keys_per_partition)
    raise ValueError(f"unknown seen_filter {kind!r} (bloom|cuckoo)")
