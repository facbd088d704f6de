"""Vendored element-hiding selector subsets + chumbox definitions.

The reference ships full EasyList snapshots (13,967 ad selectors in
crawler/src/ads/easylist_ad_selectors.json; 17,280 cookie selectors in
crawler/src/pages/easylist_cookie_general_hide.json), refreshed by
crawler/updateEasylistSelectors.js. We vendor a pinned representative
subset with the same shape distribution (~mostly bare #id/.class, some
compound/attr forms) — the synthetic corpus generator emits markup
matching these, and the byte-identity invariant is engine-vs-oracle over
this pinned list, exactly as the reference's behavior is defined by its
checked-in snapshot. Swapping in a full EasyList snapshot is a data-file
change, not a code change (`load_extra_selectors`).

The REAL EasyList snapshots are vendored too (data/, see
data/PROVENANCE.md — public EasyList-derived data, 13,967 ad + 17,280
cookie selectors, the same lists whose counts define the reference's
detection behavior at ad-detection.ts:14-21). They are the DEFAULT
detection surface: every index build unions the pinned subset with the
bundled snapshots unless ``ADSCRAPER_SPARK_PINNED_SUBSET=1`` (or
``disable_full_lists()`` / the CLI ``--pinned-subset`` flag) opts into
the subset-only fast tier. Defaulting ON (instead of an opt-in env
var) is what makes the full lists reach Spark extraction WORKERS
unconditionally — worker processes rebuild the index from the module
defaults, with no env propagation required. The opt-OUT env var has
the usual caveat: set it before the SparkSession is built or workers
keep the full-list default.

Selector strings below are generic EasyList-style community patterns
(public list conventions), not copied file content.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from .selectors import SelectorIndex

AD_SELECTORS: list[str] = [
    # id-anchored (EasyList's dominant shape)
    "#AdBanner", "#AdContainer", "#AdHeader", "#AdSense1", "#AdTop",
    "#ad-banner", "#ad-box", "#ad-container", "#ad-footer", "#ad-header",
    "#ad-leaderboard", "#ad-left", "#ad-right", "#ad-slot", "#ad-top",
    "#adBlock", "#adFrame", "#adLeaderboard", "#adSidebar", "#adSkyscraper",
    "#ad_banner", "#ad_bottom", "#ad_box", "#ad_frame", "#ad_top",
    "#ads-left", "#ads-right", "#adsense", "#adspace", "#adunit",
    "#banner-ad", "#banner_ad", "#sidebar-ad", "#sponsored-links",
    "#topAdBanner",
    # class-anchored
    ".ad-banner", ".ad-box", ".ad-container", ".ad-footer", ".ad-header",
    ".ad-leaderboard", ".ad-placeholder", ".ad-sidebar", ".ad-slot",
    ".ad-unit", ".ad-wrapper", ".adBanner", ".adBox", ".adFrame",
    ".ad_block", ".ad_box", ".ad_container", ".ad_frame", ".ad_wrapper",
    ".adsbygoogle", ".advert", ".advertisement", ".advertising",
    ".banner-ad", ".banner_ad", ".display-ad", ".google-ad",
    ".sidebar-ad", ".sponsored", ".sponsored-content", ".sponsored-links",
    ".textad", ".top-ad",
    # chumbox container classes (chumbox-handler.ts:17-26 platforms)
    ".adblade-dyna", ".ac_container_wrap", ".my6_widget", ".mgbox",
    ".ob-widget", ".rc-widget", ".trc_related_container", ".zergnet-widget",
    # compound / attribute / combinator shapes
    "div.ad.visible", "a[href^=\"https://ads.\"]",
    "div[data-ad-slot]", "iframe[src*=\"doubleclick\"]",
    "div.ad-row > div.ad-cell",
]

COOKIE_SELECTORS: list[str] = [
    "#AcceptCookie", "#AcceptCookies", "#CookieBanner", "#CookieConsent",
    "#CybotCookiebotDialog", "#cookie-bar", "#cookie-banner",
    "#cookie-consent", "#cookie-law-info-bar", "#cookie-notice",
    "#cookie-policy", "#cookie-popup", "#cookieAccept", "#cookieBar",
    "#cookieConsent", "#cookieNotice", "#cookie_banner", "#cookie_consent",
    "#cookies-banner", "#gdpr-banner", "#gdpr-consent-notice",
    "#onetrust-banner-sdk", "#privacy-banner",
    ".cc-banner", ".cc-window", ".cookie-bar", ".cookie-banner",
    ".cookie-consent", ".cookie-disclaimer", ".cookie-info",
    ".cookie-message", ".cookie-notice", ".cookie-popup", ".cookie-warning",
    ".cookiebar", ".cookieconsent", ".cookies-banner", ".gdpr-banner",
    ".gdpr-notice", ".js-cookie-banner", ".privacy-notice",
    "div[data-cookie-banner]", "div.cookie.overlay",
]

# (platform, per-sub-ad link selector, screenshotParentDepth) — semantics of
# crawler/src/ads/chumbox-handler.ts:16-26.
CHUMBOX_DEFINITIONS: list[tuple[str, str, int]] = [
    ("adblade", ".adblade-dyna a.description", 2),
    ("contentad", ".ac_container", 0),
    ("feednetwork", ".my6_item", 0),
    ("mgid", ".mgline", 0),
    ("outbrain", ".ob-dynamic-rec-container.ob-p", 0),
    ("revcontent", ".rc-item", 0),
    ("taboola", ".trc_spotlight_item.syndicatedItem", 0),
    ("zergnet", ".zergentity", 0),
]

_EXTRA_ADS_ENV = "ADSCRAPER_SPARK_AD_SELECTORS_JSON"
_EXTRA_COOKIES_ENV = "ADSCRAPER_SPARK_COOKIE_SELECTORS_JSON"


#: env value selecting the vendored snapshots (read zip-safely through
#: importlib.resources, so it also works on executors importing the
#: package from a --py-files archive where a file path would not open)
BUNDLED = "bundled"

_BUNDLED_FILES = {
    _EXTRA_ADS_ENV: "easylist_ad_selectors.json",
    _EXTRA_COOKIES_ENV: "easylist_cookie_general_hide.json",
}


def _read_bundled(name: str) -> list[str]:
    from importlib import resources

    ref = resources.files("adscraper_spark.html").joinpath(f"data/{name}")
    return list(json.loads(ref.read_text()))


def load_extra_selectors(env_var: str) -> list[str]:
    path = os.environ.get(env_var)
    if not path:
        return []
    if path == BUNDLED:
        return _read_bundled(_BUNDLED_FILES[env_var])
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return list(json.load(f))


def bundled_full_lists() -> tuple[list[str], list[str]]:
    """The vendored real EasyList snapshots (data/PROVENANCE.md)."""
    return (_read_bundled(_BUNDLED_FILES[_EXTRA_ADS_ENV]),
            _read_bundled(_BUNDLED_FILES[_EXTRA_COOKIES_ENV]))


_SUBSET_ONLY_ENV = "ADSCRAPER_SPARK_PINNED_SUBSET"


def full_lists_enabled() -> bool:
    """True (the default) = the vendored real EasyList snapshots are
    the detection surface, matching the reference loading its full
    checked-in lists (ad-detection.ts:14-21). The 81-selector pinned
    subset remains as an opt-in fast tier for micro-tests.
    '0'/'false'/'no'/'' read as NOT opting into the subset — an
    operator exporting PINNED_SUBSET=0 conventionally means 'full
    lists', and raw truthiness would silently flip the detection
    surface the other way."""
    v = os.environ.get(_SUBSET_ONLY_ENV, "").strip().lower()
    return v in ("", "0", "false", "no")


def enable_full_lists() -> None:
    """Restore the default (real EasyList snapshots) and drop the
    cached indexes so the next build sees them. Process-wide (the
    indexes are process-level caches by design — the reference
    likewise loads its lists once per crawler process)."""
    os.environ.pop(_SUBSET_ONLY_ENV, None)
    ad_selector_index.cache_clear()
    cookie_selector_index.cache_clear()


def disable_full_lists() -> None:
    """Opt into the pinned-subset fast tier (tests/micro-benches).

    Spark caveat: extraction workers rebuild the index in their own
    processes, which inherit the env the JVM was LAUNCHED with — call
    this BEFORE building the SparkSession or the workers keep the
    full-list default."""
    os.environ[_SUBSET_ONLY_ENV] = "1"
    ad_selector_index.cache_clear()
    cookie_selector_index.cache_clear()


@lru_cache(maxsize=1)
def ad_selector_index() -> SelectorIndex:
    extra = load_extra_selectors(_EXTRA_ADS_ENV)
    if full_lists_enabled():
        extra = _read_bundled(_BUNDLED_FILES[_EXTRA_ADS_ENV]) + extra
    return SelectorIndex(AD_SELECTORS + extra)


@lru_cache(maxsize=1)
def cookie_selector_index() -> SelectorIndex:
    extra = load_extra_selectors(_EXTRA_COOKIES_ENV)
    if full_lists_enabled():
        extra = _read_bundled(_BUNDLED_FILES[_EXTRA_COOKIES_ENV]) + extra
    return SelectorIndex(COOKIE_SELECTORS + extra)
