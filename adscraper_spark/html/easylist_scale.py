"""Full-EasyList-scale selector lists (deterministic synthetic).

The reference ships its EasyList snapshots as data files — 13,967 ad
selectors (crawler/src/ads/easylist_ad_selectors.json, consumed at
crawler/src/ads/ad-detection.ts:14-21) and 17,280 cookie-hide selectors
(crawler/src/pages/easylist_cookie_general_hide.json, consumed at
crawler/src/pages/cookie-banner-remover.ts:5-25). This runtime has no
network to fetch the public lists and the reference snapshot bytes are
not copied, so full-list SCALE is exercised with deterministically
generated lists of the same size and shape distribution (~97% bare
``#id``/``.class``, the rest compound/attr forms — the measured shape of
the real lists, html/selectors.py module doc). The SelectorIndex cost
model depends only on list size and shape, never on the specific tokens,
so these lists prove the O(features-on-page) property at true scale.
Swapping in a real EasyList snapshot stays a data-file change via
ADSCRAPER_SPARK_AD_SELECTORS_JSON / ..._COOKIE_SELECTORS_JSON
(html/easylist.py:load_extra_selectors).

Every synthetic token carries the ``zz`` prefix, which no corpus markup
or vendored selector uses — the scale lists change behavior of NOTHING
(verified by test_selector_scale.py byte-identity) while multiplying the
index population ~175×.
"""

from __future__ import annotations

import json
import os

from ..hashing import stable_hash64
from .easylist import AD_SELECTORS, COOKIE_SELECTORS

REFERENCE_AD_LIST_SIZE = 13_967      # easylist_ad_selectors.json entries
REFERENCE_COOKIE_LIST_SIZE = 17_280  # easylist_cookie_general_hide.json

_TOKENS = (
    "ad ads banner sponsor promo widget box slot unit zone frame block "
    "badge side top footer head mid sky rect wide leader board tile card "
    "strip panel inline float anchor pop layer region module island"
).split()


def synthetic_selectors(n: int, seed_key: str) -> list[str]:
    """n selectors with the EasyList shape mix: 55% .class, 42% #id,
    ~3% compound/attr/combinator forms."""
    out = []
    for i in range(n):
        r = stable_hash64(f"{seed_key}|{i}")
        w1 = _TOKENS[r % len(_TOKENS)]
        w2 = _TOKENS[(r >> 8) % len(_TOKENS)]
        name = f"zz{w1}-{w2}-{i}"
        kind = r % 100
        if kind < 55:
            out.append(f".{name}")
        elif kind < 97:
            out.append(f"#{name}")
        elif kind < 98:
            out.append(f"div.{name}")
        elif kind < 99:
            out.append(f"div[data-{w1}{i}]")
        else:
            out.append(f"div.zz{w1}-wrap-{i} > a.zz{w2}-link-{i}")
    return out


def full_scale_ad_selectors() -> list[str]:
    return AD_SELECTORS + synthetic_selectors(
        REFERENCE_AD_LIST_SIZE - len(AD_SELECTORS), "easylist-ad")


def full_scale_cookie_selectors() -> list[str]:
    return COOKIE_SELECTORS + synthetic_selectors(
        REFERENCE_COOKIE_LIST_SIZE - len(COOKIE_SELECTORS),
        "easylist-cookie")


def write_scale_lists(out_dir: str) -> tuple[str, str]:
    """Materialize the full-scale lists as the JSON data files the
    env-var hatch consumes."""
    os.makedirs(out_dir, exist_ok=True)
    ad_path = os.path.join(out_dir, "ad_selectors_full.json")
    cookie_path = os.path.join(out_dir, "cookie_selectors_full.json")
    with open(ad_path, "w") as f:
        json.dump(synthetic_selectors(
            REFERENCE_AD_LIST_SIZE - len(AD_SELECTORS), "easylist-ad"), f)
    with open(cookie_path, "w") as f:
        json.dump(synthetic_selectors(
            REFERENCE_COOKIE_LIST_SIZE - len(COOKIE_SELECTORS),
            "easylist-cookie"), f)
    return ad_path, cookie_path
