"""Parser/selector units — the pinned DOM spec (SURVEY.md §7.3)."""

from adscraper_spark.html.parser import decode_entities, parse_html
from adscraper_spark.html.selectors import (
    SelectorError, compile_selector, query_all,
)


def test_basic_tree_and_text():
    doc = parse_html(b"<html><body><p>hello <b>world</b></p></body></html>")
    p = doc.find_first("p")
    assert p.text_content() == "hello world"
    assert doc.body.text_content() == "hello world"


def test_entities_and_bom():
    doc = parse_html("\xef\xbb\xbf<p>caf&eacute; &amp; t&#233;a&nbsp;x</p>"
                     .encode("latin-1"))
    # &eacute; is NOT in the pinned entity set → passes through verbatim
    assert doc.find_first("p").text_content() == "caf&eacute; & t\xe9a\xa0x"


def test_decode_numeric_entities():
    assert decode_entities("&#65;&#x42;&amp;&bogus;") == "AB&&bogus;"


def test_ncr_error_handling_matches_browser_dom():
    # HTML-spec numeric-reference error handling: NUL, surrogates, and
    # out-of-range map to U+FFFD; C1 remaps through windows-1252 (a
    # browser DOM shows '€' for &#128;, never U+0080); untabled C1
    # code points (0x81, 0x8D, 0x8F, 0x90, 0x9D) pass through.
    assert decode_entities("&#0;") == "�"
    assert decode_entities("&#x0;") == "�"
    assert decode_entities("&#xD800;&#1114112;") == "��"
    assert decode_entities("&#128;&#x99;&#8364;") == "€™€"
    assert decode_entities("&#129;&#x9D;") == "\x81\x9d"


def test_void_and_rawtext():
    doc = parse_html(b"<div><br><img src=x><script>if (a<b) {}</script>"
                     b"<p>t</p></div>")
    div = doc.find_first("div")
    tags = [c.tag for c in div.element_children()]
    assert tags == ["br", "img", "script", "p"]
    # script content excluded from text, raw '<' kept inside script node
    assert div.text_content() == "t"
    assert doc.find_first("script").children == ["if (a<b) {}"]


def test_mismatched_close_tags():
    doc = parse_html(b"<div><p>a</div><p>b</p>")
    ps = query_all(doc, "p")
    assert [p.text_content() for p in ps] == ["a", "b"]


def test_outer_html_slice():
    src = b'<body><div id="x"><span>s</span></div>tail</body>'
    doc = parse_html(src)
    div = query_all(doc, "#x")[0]
    assert doc.outer_html(div) == '<div id="x"><span>s</span></div>'


def test_selector_compound_attr_combinators():
    doc = parse_html(
        b'<div class="a b"><ul><li><p class="c">x</p></li></ul>'
        b'<section><p data-k="v1">y</p></section></div>')
    assert len(query_all(doc, "div.a.b")) == 1
    assert len(query_all(doc, "li p")) == 1
    assert len(query_all(doc, "ul > li")) == 1
    assert len(query_all(doc, "div > p")) == 0
    assert len(query_all(doc, '[data-k="v1"]')) == 1
    assert len(query_all(doc, '[data-k^="v"]')) == 1
    assert len(query_all(doc, '[data-k$="1"]')) == 1
    assert len(query_all(doc, '[data-k*="1"]')) == 1
    assert len(query_all(doc, '[data-k="nope"]')) == 0


def test_unsupported_selector_raises():
    import pytest

    with pytest.raises(SelectorError):
        compile_selector("p:first-child")


def test_nested_same_tag():
    doc = parse_html(b"<div id='o'><div id='i'>x</div></div>")
    inner = query_all(doc, "#i")[0]
    assert inner.parent.id == "o"
