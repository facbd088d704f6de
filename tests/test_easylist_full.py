"""The vendored REAL EasyList snapshots (html/data/PROVENANCE.md) — the
reference's checked-in behavior spec (ad-detection.ts:14-21,
cookie-banner-remover.ts). Detection parity here is backed by the real
lists, not the pinned subset: selectors that exist ONLY in the full
lists must start (and stop) matching as the lists are enabled
(disabled)."""

import json

import pytest

from adscraper_spark.html import easylist
from adscraper_spark.html.parser import parse_html
from adscraper_spark.html.selectors import SelectorIndex


@pytest.fixture
def full_lists():
    # full lists are the DEFAULT now; the fixture just guarantees a
    # clean default state on both sides of the test
    easylist.enable_full_lists()
    yield
    easylist.enable_full_lists()


def test_bundled_snapshot_counts_match_reference():
    ads, cookies = easylist.bundled_full_lists()
    # the counts the reference's behavior is defined by (VERDICT r03 §4)
    assert len(ads) == 13967
    assert len(cookies) == 17280
    assert all(isinstance(s, str) and s for s in ads)


def test_full_list_only_ad_selector_detected(full_lists):
    # '#AC_ad' is in the real EasyList snapshot but not the pinned subset
    from adscraper_spark.extraction.core import detect_ads

    assert "#AC_ad" not in easylist.AD_SELECTORS
    doc = parse_html(
        '<html><body><div id="AC_ad"><a href="https://x.test/l">z</a>'
        "</div><p>content</p></body></html>")
    ads = detect_ads(doc)
    assert [sel for _, sel in ads] == ["#AC_ad"]


def test_full_list_only_cookie_selector_removed(full_lists):
    from adscraper_spark.extraction.core import remove_cookie_banners

    assert "#ACCETTA_COOKIES" not in easylist.COOKIE_SELECTORS
    doc = parse_html(
        '<html><body><div id="ACCETTA_COOKIES">accept</div>'
        "<p>keep me</p></body></html>")
    assert remove_cookie_banners(doc) == 1
    assert "accept" not in doc.root.text_content()
    assert "keep me" in doc.root.text_content()


def test_disable_restores_pinned_subset():
    from adscraper_spark.extraction.core import detect_ads

    easylist.disable_full_lists()
    try:
        doc = parse_html(
            '<html><body><div id="AC_ad">x</div></body></html>')
        assert detect_ads(doc) == []
    finally:
        easylist.enable_full_lists()  # restore the process default


def test_extraction_identical_when_full_only_selectors_absent(full_lists):
    """Pages whose markup touches only pinned-subset selectors extract
    byte-identically under either list — the full lists are a
    superset, never a behavior change for subset-only markup. Pages
    carrying the corpus's full-list-only divs MUST differ (the default
    detection surface is load-bearing, not vacuous)."""
    from adscraper_spark.corpus import CorpusSpec, gen_html
    from adscraper_spark.extraction.core import extract_page

    spec = CorpusSpec(n_pages=60, n_hosts=6, seed=7)
    pages = [(spec.page_url(h, j), gen_html(spec, h, j))
             for h, j in list(spec.iter_pages())[:25]]
    with_full = [extract_page(u, h) for u, h in pages]
    easylist.disable_full_lists()
    with_subset = [extract_page(u, h) for u, h in pages]
    easylist.enable_full_lists()  # fixture teardown expects enabled state
    n_diff = 0
    for (u, html), a, b in zip(pages, with_full, with_subset):
        if b"AC_ad" in html or b"ACCETTA_COOKIES" in html:
            n_diff += a != b
        else:
            assert a == b, u
    assert n_diff > 0  # full-only markup present AND detected


def test_selector_index_builds_at_real_scale(full_lists):
    ads, cookies = easylist.bundled_full_lists()
    ix = SelectorIndex(easylist.AD_SELECTORS + ads)
    doc = parse_html('<html><body><div id="AC_ad">x</div>'
                     '<div class="plain">y</div></body></html>')
    matched = ix.match_all(doc)
    assert any(sel == "#AC_ad" for _, sel in matched)
    cx = SelectorIndex(easylist.COOKIE_SELECTORS + cookies)
    assert cx.match_all(doc) == []


def test_every_real_selector_compiles():
    """Parse coverage of the real lists is 100% — the grammar was sized
    by measurement (selectors.py docstring). A refresh that introduces
    new CSS features fails HERE, not silently at match time."""
    from adscraper_spark.html.selectors import compile_selector

    ads, cookies = easylist.bundled_full_lists()
    for s in ads + cookies:
        compile_selector(s)


def test_nonstrict_index_counts_skips():
    ix = SelectorIndex(["#ok", ":has(div)"], strict=False)
    assert ix.skipped == [":has(div)"]
    doc = parse_html('<html><body><div id="ok">x</div></body></html>')
    assert len(ix.match_all(doc)) == 1


def test_extended_grammar_semantics():
    """The constructs the real lists add over the pinned subset:
    :not / :empty / sibling combinators / escapes / i-flag."""
    from adscraper_spark.html.selectors import query_all

    doc = parse_html(
        "<html><body>"
        '<div id="adframe">x</div>'
        '<div class="ad-box" id="other"><span>y</span></div>'
        '<div class="ad-box" id="ad-banner">z</div>'
        '<div class="wrap"><div class="hdr">h</div><p>m</p>'
        '<div class="tail">t</div></div>'
        '<div id="_CookieText">c</div>'
        '<a data-u="http://X.test/q">l</a><span class="author">a</span>'
        "</body></html>")

    def hits(q):
        return [(n.tag, n.id or n.classes) for n in query_all(doc, q)]

    assert hits("#adframe:not(frameset)") == [("div", "adframe")]
    assert hits(".ad-box:not(#ad-banner):not(:empty)") == [("div", "other")]
    assert hits(".wrap > .hdr ~ .tail") == [("div", ["tail"])]
    assert hits("#\\5f CookieText") == [("div", "_CookieText")]
    assert hits('a[data-u^="http://x.test" i] + .author') \
        == [("span", ["author"])]
    assert hits('a[data-u^="http://x.test"]') == []  # ci only with flag


def test_escaped_identifier_roundtrip_property():
    """CSS-escape an arbitrary identifier, compile '#<escaped>', and
    match a node carrying that literal id — the escape/unescape path
    must round-trip for every char class the real lists use (hex
    escapes consume one following space; char escapes don't)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adscraper_spark.html.selectors import compile_selector

    # printable ASCII minus quote/angle/& (HTML attr limits) and minus
    # combinator chars only when UNescaped — we escape everything
    # non-alphanumeric, so the full set is fair game for the selector
    alphabet = st.sampled_from(
        [c for c in (chr(i) for i in range(33, 127))
         if c not in '"\'<>&'] + ["é", "·", "ß"])

    def css_escape(ident: str) -> str:
        out = []
        for ch in ident:
            if ch.isalnum() or ch in "-_" or ord(ch) > 127:
                out.append(ch)
            elif ch in ".#:[]()+~\\ !,*^$|=":
                out.append("\\" + ch)
            else:
                out.append(f"\\{ord(ch):x} ")
        return "".join(out)

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=1, max_size=12))
    def check(ident):
        sel = compile_selector("#" + css_escape(ident))
        subject = sel.compounds[-1]
        assert subject.id == ident, (ident, css_escape(ident))

    check()


def test_bundled_env_hook_round_trip(tmp_path):
    """An arbitrary file path still works through the same hook the
    BUNDLED sentinel uses."""
    p = tmp_path / "extra.json"
    p.write_text(json.dumps(["#my-extra-ad"]))
    import os

    os.environ[easylist._EXTRA_ADS_ENV] = str(p)
    easylist.ad_selector_index.cache_clear()
    try:
        from adscraper_spark.extraction.core import detect_ads

        doc = parse_html(
            '<html><body><div id="my-extra-ad">x</div></body></html>')
        assert [s for _, s in detect_ads(doc)] == ["#my-extra-ad"]
    finally:
        os.environ.pop(easylist._EXTRA_ADS_ENV, None)
        easylist.ad_selector_index.cache_clear()
