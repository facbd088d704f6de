"""SelectorIndex at true EasyList scale (13,967 ad + 17,280 cookie
selectors): full-list compile, byte-identity of extraction under the
full lists, and the O(features-on-page) cost property."""

import os
import time

from adscraper_spark.corpus import CorpusSpec, gen_html
from adscraper_spark.extraction.core import extract_page
from adscraper_spark.html import easylist
from adscraper_spark.html.easylist_scale import (
    REFERENCE_AD_LIST_SIZE, REFERENCE_COOKIE_LIST_SIZE,
    full_scale_ad_selectors, full_scale_cookie_selectors,
    write_scale_lists,
)
from adscraper_spark.html.parser import parse_html
from adscraper_spark.html.selectors import SelectorIndex

SPEC = CorpusSpec(n_pages=120, n_hosts=8, seed=42)
SAMPLE = [(h, j) for h, j in SPEC.iter_pages()][:40]


def test_full_scale_lists_compile():
    ad = full_scale_ad_selectors()
    ck = full_scale_cookie_selectors()
    assert len(ad) == REFERENCE_AD_LIST_SIZE
    assert len(ck) == REFERENCE_COOKIE_LIST_SIZE
    SelectorIndex(ad)   # grammar covers every generated shape
    SelectorIndex(ck)


def test_extraction_byte_identical_under_full_lists(tmp_path):
    """Loading the full-scale lists through the env-var hatch must not
    change a single extracted byte (synthetic tokens match nothing; the
    vendored detections stay first-selector-wins identical)."""
    base = {}
    for h, j in SAMPLE:
        url = SPEC.page_url(h, j)
        base[url] = extract_page(url, gen_html(SPEC, h, j))
    ad_path, cookie_path = write_scale_lists(str(tmp_path))
    os.environ["ADSCRAPER_SPARK_AD_SELECTORS_JSON"] = ad_path
    os.environ["ADSCRAPER_SPARK_COOKIE_SELECTORS_JSON"] = cookie_path
    easylist.ad_selector_index.cache_clear()
    easylist.cookie_selector_index.cache_clear()
    try:
        assert len(easylist.ad_selector_index().rest) < 500  # indexed,
        # not linear: nearly all 13k selectors live in the id/class maps
        for h, j in SAMPLE:
            url = SPEC.page_url(h, j)
            got = extract_page(url, gen_html(SPEC, h, j))
            want = base[url]
            assert got.text == want.text, url
            assert [a.html for a in got.ads] == [a.html for a in want.ads]
            assert [a.selector for a in got.ads] == \
                [a.selector for a in want.ads]
            assert got.links == want.links
            assert got.readability_score == want.readability_score
    finally:
        del os.environ["ADSCRAPER_SPARK_AD_SELECTORS_JSON"]
        del os.environ["ADSCRAPER_SPARK_COOKIE_SELECTORS_JSON"]
        easylist.ad_selector_index.cache_clear()
        easylist.cookie_selector_index.cache_clear()


def test_selector_index_cost_is_feature_bound():
    """Matching cost must scale with features on the page, not with the
    selector-list size: 175× more selectors may not cost anywhere near
    175× the time (generous 12× CI bound; bench.py records the real
    ratio)."""
    docs = [parse_html(gen_html(SPEC, h, j)) for h, j in SAMPLE]
    small = SelectorIndex(easylist.AD_SELECTORS)
    big = SelectorIndex(full_scale_ad_selectors())

    def run(index):
        t0 = time.perf_counter()
        for d in docs:
            index.match_all(d)
        return time.perf_counter() - t0

    run(small), run(big)  # warm
    t_small = min(run(small) for _ in range(3))
    t_big = min(run(big) for _ in range(3))
    # identical matches either way
    assert [[(id(n), s) for n, s in small.match_all(d)] for d in docs] \
        == [[(id(n), s) for n, s in big.match_all(d)] for d in docs]
    assert t_big < 12 * t_small, (t_small, t_big)
