"""Property-based hardening (hypothesis): the pinned parser must never
crash and must be deterministic on arbitrary bytes; URL normalization
must be idempotent; extraction must be a pure function."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from adscraper_spark.extraction.core import extract_page
from adscraper_spark.html.parser import parse_html
from adscraper_spark.urlnorm import normalize_url

html_fragments = st.lists(
    st.one_of(
        st.text(alphabet=string.printable, max_size=30),
        st.sampled_from([
            "<div>", "</div>", "<p class='a b'>", "</p>", "<br>",
            "<script>", "</script>", "<!-- c -->", "<a href='/x'>",
            "<iframe src='y'>", "</iframe>", "&amp;", "&#65;", "&nbsp;",
            "<div id=\"AdBanner\">", "<", ">", "<<>>", "</",
            "<p", "='unclosed", "\xef\xbb\xbf",
        ]),
    ), max_size=25).map("".join)


@given(html_fragments)
@settings(max_examples=150, deadline=None)
def test_parser_total_and_deterministic(frag):
    data = frag.encode("utf-8", errors="replace")
    d1 = parse_html(data)
    d2 = parse_html(data)
    assert d1.body.text_content() == d2.body.text_content()


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_parser_never_crashes_on_bytes(data):
    parse_html(data)  # total function over arbitrary bytes


@given(html_fragments)
@settings(max_examples=60, deadline=None)
def test_extraction_pure(frag):
    data = frag.encode()
    a = extract_page("https://h.test/p", data)
    b = extract_page("https://h.test/p", data)
    assert a.text == b.text and a.links == b.links
    assert [x.html for x in a.ads] == [x.html for x in b.ads]


@given(st.text(alphabet=string.printable, max_size=60))
@settings(max_examples=150, deadline=None)
def test_normalize_idempotent(u):
    n = normalize_url(u)
    if n is not None:
        assert normalize_url(n) == n