"""Deterministic, environment-pinned hashing.

The reference uses ``Math.random()`` for link picks
(/root/reference/crawler/src/pages/find-page.ts:72,140-144) which is not
reproducible; per SURVEY.md §2.6 L1 we replace every random choice with a
seeded hash of stable inputs so the Spark engine and the sequential
simulator cannot diverge. md5 is used (not Python's ``hash``, which is
salted per process; not Spark's xxhash64, which we cannot evaluate from
pure Python on the oracle side).
"""

from __future__ import annotations

import hashlib
import struct

_U64 = (1 << 64) - 1


def stable_hash64(value: str, seed: int = 0) -> int:
    """64-bit deterministic hash of a string (uniform, seedable)."""
    h = hashlib.md5(struct.pack("<q", seed) + value.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & _U64


def stable_hash_bytes(value: bytes, seed: int = 0) -> int:
    h = hashlib.md5(struct.pack("<q", seed) + value).digest()
    return int.from_bytes(h[:8], "big") & _U64


def stable_unit(value: str, seed: int = 0) -> float:
    """Deterministic float in [0, 1) derived from ``value``."""
    return stable_hash64(value, seed) / float(1 << 64)


def ad_id_for(page_url: str, ad_index: int) -> int:
    """Deterministic ad id (the adscraper.sql ad-table serial analog):
    derived from (page, ad_index) so the engine's ads table and a
    landing page's referrer_ad lineage (J4, adscraper.sql:152) agree
    without any driver-side id assignment. Kept positive and below
    2^62 so it survives every long column."""
    return stable_hash64(f"ad_id|{page_url}|{ad_index}") % (1 << 62)


def stable_pick(items: list, seed: int, round_no: int) -> int:
    """Deterministic index pick — replaces the reference's
    ``getRandomInt(0, links.length)`` (find-page.ts:140-144)."""
    if not items:
        raise ValueError("empty pick")
    key = f"{round_no}|{len(items)}"
    return stable_hash64(key, seed) % len(items)
