"""Pure-Python extraction core — ONE function shared by the vectorized
pandas UDF and the pytest oracle (SURVEY.md §5.2.1): byte-identity between
the two then verifies the Arrow path, not two implementations.

Pipeline per document (reference semantics, re-specified for static HTML):

U1  cookie-banner prune      cookie-banner-remover.ts:5-25
U2  ad detect + top-most     ad-detection.ts:10-57
U3  ad outerHTML             ad-scraper.ts:279
U4  chumbox split            chumbox-handler.ts:16-78
U5  iframe tree scrape       iframe-scraper.ts:23-78 (inline <iframe> docs)
U6  ad external URLs         ad-external-urls.ts:13-37
U7  link harvest             find-page.ts:35-45 (same-host filter applied
                             at admission, not here)
U8  readability score        find-page.ts:165-264 (exact port)
U9  RSS discovery            get-rss-article.ts:20-34 + guess paths
U10 page text                U1-pruned DOM → body textContent →
                             whitespace-normalized (SURVEY §2.10)
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from ..html.easylist import (
    CHUMBOX_DEFINITIONS, ad_selector_index, cookie_selector_index,
)
from ..html.parser import Document, Node, collect_elements, parse_html
from ..html.selectors import compile_selector
from ..urlnorm import resolve

# exact regexes from the readability gate the reference injects
# (find-page.ts:189-194) — originally Arc90/Mozilla readability, public.
UNLIKELY_CANDIDATES_RE = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|"
    r"agegate|pagination|pager|popup|yom-remote", re.IGNORECASE)
OK_MAYBE_CANDIDATE_RE = re.compile(
    r"and|article|body|column|content|main|shadow", re.IGNORECASE)

# 46 health keywords, find-page.ts:266-312 (plain dictionary words)
HEALTH_KEYWORDS = (
    "health wellness medicine medical dental doctor dentist hospital clinic "
    "nurse pharmacy pharmaceutical prescription vaccine vaccination treatment "
    "covid coronavirus virus disease sick illn infect contagious stroke "
    "cancer dementia alzheimer diabetes tumor tumour leukemia lymphoma aids "
    "cirrhosis std wart herpes psoriasis eczema bowel syndrome ischemic "
    "arthritis hypertension").split()

_RSS_LINK_SEL = compile_selector('link[rel="alternate"][type="application/rss+xml"]')
_LI_P_SEL = compile_selector("li p")  # hot-path: compiled once, not per doc
_CHUMBOX_SELECTORS = [
    (platform, compile_selector(sel), depth)
    for platform, sel, depth in CHUMBOX_DEFINITIONS
]


@dataclass
class AdExtract:
    html: str
    selector: str
    platform: str | None = None           # chumbox platform, if split
    chumbox_parts: list[str] = field(default_factory=list)
    anchor_hrefs: list[str] = field(default_factory=list)
    iframe_srcs: list[str] = field(default_factory=list)
    script_srcs: list[str] = field(default_factory=list)
    img_srcs: list[str] = field(default_factory=list)


@dataclass
class IFrameExtract:
    ad_index: int            # which ad this tree hangs off (-1 = page level)
    parent_index: int        # index into the iframes list, -1 = top of tree
    url: str                 # src attribute (may be "")
    html: str                # inline body outerHTML ("" if none)
    textcontent: str


@dataclass
class PageExtract:
    text: str
    links: list[str]
    ads: list[AdExtract]
    iframes: list[IFrameExtract]
    readerable: bool
    readability_score: float
    rss_urls: list[str]
    health_related: bool


def normalize_text(raw: str) -> str:
    """Pinned whitespace normalization: any run of Unicode whitespace
    (incl. NBSP) → one space; leading/trailing stripped."""
    return " ".join(raw.split())


def _visible(node: Node) -> bool:
    """isNodeVisible port (find-page.ts:185-189): display:none style,
    hidden attr, aria-hidden=true."""
    style = node.get("style", "")
    if "display:none" in style.replace(" ", ""):
        return False
    if "hidden" in node.attrs:
        return False
    if node.get("aria-hidden") == "true":
        return False
    return True


def readability_probe(doc: Document,
                      elements: list[Node] | None = None
                      ) -> tuple[bool, float]:
    """Exact port of the injected isProbablyReaderable
    (find-page.ts:195-264): nodes = p, pre, plus parents of div>br;
    per-node gates then score += sqrt(len-140), readerable when score>20.
    """
    if elements is None:
        elements = collect_elements(doc.root)
    nodes: list[Node] = []
    seen: set[int] = set()
    for el in elements:
        if el.tag in ("p", "pre") and id(el) not in seen:
            nodes.append(el)
            seen.add(id(el))
    # div > br → add the div (preserving the reference's set-append order:
    # p/pre first, then br-parents not already present)
    for el in elements:
        if el.tag == "br" and el.parent is not None and el.parent.tag == "div":
            if id(el.parent) not in seen:
                nodes.append(el.parent)
                seen.add(id(el.parent))
    li_p = _LI_P_SEL
    score = 0.0
    for node in nodes:
        if not _visible(node):
            continue
        match_string = node.class_name + " " + node.id
        if (UNLIKELY_CANDIDATES_RE.search(match_string)
                and not OK_MAYBE_CANDIDATE_RE.search(match_string)):
            continue
        if li_p.matches(node):
            continue
        text_len = len(node.text_content().strip())
        if text_len < 140:
            continue
        score += math.sqrt(text_len - 140)
        if score > 20:
            return True, score
    return False, score


def detect_ads(doc: Document,
               elements: list[Node] | None = None
               ) -> list[tuple[Node, str]]:
    """U2: selector-union match, then drop any match with a matched
    ancestor (top-most wins; ad-detection.ts:25-43). Document order."""
    matches = ad_selector_index().match_all(doc, elements)
    matched_nodes = {id(node) for node, _ in matches}
    out = []
    for node, sel in matches:
        if any(id(a) in matched_nodes for a in node.ancestors()):
            continue
        out.append((node, sel))
    return out


def remove_cookie_banners(doc: Document) -> int:
    """U1: delete all cookie-selector matches (cookie-banner-remover.ts).
    Own walk — it mutates the tree, so the shared element list is built
    after it."""
    matches = cookie_selector_index().match_all(
        doc, collect_elements(doc.root))
    for node, _ in matches:
        node.detach()
    return len(matches)


def _subtree_urls(base_url: str, root: Node, tag: str, attr: str) -> list[str]:
    """U6 helper: resolved attribute URLs in document order. The reference
    reads DOM url properties (a.href, img.src, ...) which are absolute;
    we resolve against the page URL. Empty/invalid → skipped."""
    out = []
    for el in root.iter_elements():
        if el.tag == tag:
            u = resolve(base_url, el.get(attr))
            if u is not None:
                out.append(u)
    return out


def _split_chumbox(doc: Document, ad: Node) -> tuple[str | None, list[str]]:
    """U4: first platform whose link selector matches inside the ad wins
    (chumbox-handler.ts:28-37); parts = screenshot-target outerHTML,
    i.e. the match's parentDepth-th ancestor (splitFirstPartyAd)."""
    for platform, sel, depth in _CHUMBOX_SELECTORS:
        parts: list[str] = []
        for el in ad.iter_elements():
            if sel.matches(el):
                target = el
                for _ in range(depth):
                    if target.parent is not None and target.parent.tag != "#root":
                        target = target.parent
                parts.append(doc.outer_html(target))
        if parts:
            return platform, parts
    return None, []


def _iframe_tree(doc: Document, root: Node, ad_index: int,
                 out: list[IFrameExtract], parent_index: int) -> None:
    """U5: recursive iframe scrape (iframe-scraper.ts:23-78). Static-HTML
    model: an <iframe> with inline children is its own document; nested
    iframes recurse with parent pointers (adscraper.sql:159-168)."""
    for child in root.element_children():
        if child.tag == "iframe":
            inner = child.element_children()
            html = doc.outer_html(inner[0]) if inner else ""
            rec = IFrameExtract(
                ad_index=ad_index, parent_index=parent_index,
                url=child.get("src", ""), html=html,
                textcontent=normalize_text(child.text_content()))
            out.append(rec)
            _iframe_tree(doc, child, ad_index, out, len(out) - 1)
        else:
            _iframe_tree(doc, child, ad_index, out, parent_index)


def extract_rss(doc: Document, base_url: str,
                elements: list[Node] | None = None) -> list[str]:
    """U9: header <link rel=alternate type=rss> minus 'comments', plus
    anchors whose href contains 'rss' (get-rss-article.ts:22-34)."""
    if elements is None:
        elements = collect_elements(doc.root)
    out: list[str] = []
    for el in elements:
        if el.tag == "link" and _RSS_LINK_SEL.matches(el):
            u = resolve(base_url, el.get("href"))
            if u is not None and "comments" not in u:
                out.append(u)
    for el in elements:
        if el.tag == "a":
            u = resolve(base_url, el.get("href"))
            if u is not None and "rss" in u:
                out.append(u)
    return out


def url_is_health_related(url: str) -> bool:
    """F6 predicate (find-page.ts:151-153)."""
    low = url.lower()
    return any(k in low for k in HEALTH_KEYWORDS)


def extract_page(url: str, html: bytes | str) -> PageExtract:
    """THE extraction function — oracle == UDF body. Deterministic:
    no wall clock, no randomness, pinned parser/selectors."""
    doc = parse_html(html)
    remove_cookie_banners(doc)                                   # U1
    # ONE post-prune walk shared by every remaining stage (ad match,
    # link harvest, readability, rss) — the tree is static from here
    elements = collect_elements(doc.root)
    ad_matches = detect_ads(doc, elements)                       # U2
    ads: list[AdExtract] = []
    iframes: list[IFrameExtract] = []
    for node, sel in ad_matches:
        platform, parts = _split_chumbox(doc, node)              # U4
        ads.append(AdExtract(
            html=doc.outer_html(node),                           # U3
            selector=sel,
            platform=platform,
            chumbox_parts=parts,
            anchor_hrefs=_subtree_urls(url, node, "a", "href"),  # U6
            iframe_srcs=_subtree_urls(url, node, "iframe", "src"),
            script_srcs=_subtree_urls(url, node, "script", "src"),
            img_srcs=_subtree_urls(url, node, "img", "src"),
        ))
        _iframe_tree(doc, node, len(ads) - 1, iframes, -1)       # U5
    links = []
    for el in elements:                                          # U7
        if el.tag == "a":
            u = resolve(url, el.get("href"))
            if u is not None:
                links.append(u)
    readerable, score = readability_probe(doc, elements)         # U8
    rss = extract_rss(doc, url, elements)                        # U9
    text = normalize_text(doc.body.text_content())               # U10
    return PageExtract(
        text=text, links=links, ads=ads, iframes=iframes,
        readerable=readerable, readability_score=score,
        rss_urls=rss, health_related=url_is_health_related(url))
