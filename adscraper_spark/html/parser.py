"""Minimal, deterministic HTML parser — the PINNED extraction parser.

SURVEY.md §7.3 requires one vendored parser so extracted text is
byte-identical across environments (no lxml/bs4 in the runtime, and a
library default would not be a spec). This parser defines the DOM
semantics our engine and oracle share; its behavior IS the extraction
spec:

- input bytes are decoded as UTF-8 (BOM stripped, errors='replace');
- comments and doctype are dropped;
- ``script``/``style``/``textarea``/``title`` bodies are raw text (no tag
  parsing inside);
- void elements (area base br col embed hr img input link meta source
  track wbr) never take children;
- an unmatched close tag pops open elements up to the nearest matching
  open tag, else is ignored;
- attribute names are lower-cased; values may be double-, single- or
  un-quoted; entity decoding applies a fixed set: the five XML entities +
  ``&nbsp;`` + numeric (``&#dd;`` / ``&#xhh;``) — unknown entities pass
  through verbatim;
- ``textContent`` = concatenated entity-decoded text of the subtree,
  excluding ``script``/``style``/``noscript``/``template`` subtrees
  (pinned deviation from browser textContent, documented in SURVEY §7.3);
- outerHTML of a node = the byte slice of the decoded source document
  covering the element (closest analog of the reference's
  ``element.outerHTML`` capture, crawler/src/ads/ad-scraper.ts:279).

Reference behavior being modeled: the Chromium DOM that adscraper walks
via Puppeteer ``page.evaluate`` (crawler/src/ads/ad-detection.ts:10-57,
crawler/src/pages/cookie-banner-remover.ts:5-25).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)
RAWTEXT_ELEMENTS = frozenset("script style textarea title".split())
TEXT_SKIP_ELEMENTS = frozenset("script style noscript template".split())

_TOKEN_RE = re.compile(
    r"<!--.*?-->"                        # comment
    r"|<!\[CDATA\[.*?\]\]>"              # cdata
    r"|<![^>]*>"                         # doctype / other declarations
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)\s*>",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+))?"
)
_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'", "nbsp": " ",
}
_ENTITY_RE = re.compile(r"&(#[xX][0-9a-fA-F]+|#[0-9]+|[a-zA-Z][a-zA-Z0-9]*);")

_RAWTEXT_CLOSE_RES: dict[str, re.Pattern] = {}


def _rawtext_close_re(tag: str) -> re.Pattern:
    pat = _RAWTEXT_CLOSE_RES.get(tag)
    if pat is None:
        pat = re.compile(rf"<\s*/\s*{re.escape(tag)}\s*>", re.IGNORECASE)
        _RAWTEXT_CLOSE_RES[tag] = pat
    return pat


_C1_WINDOWS_1252 = {
    # HTML spec numeric-reference C1 remap (the windows-1252 table
    # browsers apply): &#128; is '€', not U+0080, in a real DOM.
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def _ncr(cp: int) -> str:
    """Numeric character reference → str per the HTML spec's error
    handling: NUL, surrogate code points, and anything past U+10FFFF
    map to U+FFFD; the C1 range remaps through windows-1252 like a
    browser DOM. chr(0xD800) would otherwise produce a lone surrogate
    that pyarrow cannot UTF-8-encode — one adversarial page used to
    kill the whole Arrow extraction batch."""
    if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF or cp < 0:
        return "�"
    return chr(_C1_WINDOWS_1252.get(cp, cp))


def decode_entities(s: str) -> str:
    if "&" not in s:  # hot path: most text runs carry no entities
        return s

    def repl(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith(("#x", "#X")):
            try:
                return _ncr(int(body[2:], 16))
            except (ValueError, OverflowError):
                return m.group(0)
        if body.startswith("#"):
            try:
                return _ncr(int(body[1:]))
            except (ValueError, OverflowError):
                return m.group(0)
        return _NAMED_ENTITIES.get(body, m.group(0))

    return _ENTITY_RE.sub(repl, s)


@dataclass
class Node:
    """One DOM element. ``children`` holds Node or str (text)."""

    tag: str
    attrs: dict[str, str] = field(default_factory=dict)
    children: list = field(default_factory=list)
    parent: "Node | None" = None
    start: int = 0          # offset of '<' in decoded source
    end: int = 0            # offset one past the closing '>' in source

    # -- DOM-ish accessors -------------------------------------------------
    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    @property
    def class_name(self) -> str:
        return self.attrs.get("class", "")

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def get(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def iter_elements(self):
        """Pre-order (document order) walk of element descendants, self
        excluded. For repeated walks over the same tree prefer
        ``collect_elements`` (one iterative pass, no generator
        recursion)."""
        for child in self.children:
            if isinstance(child, Node):
                yield child
                yield from child.iter_elements()

    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    def text_content(self) -> str:
        """Pinned textContent (see module docstring)."""
        out: list[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: list[str]) -> None:
        if self.tag in TEXT_SKIP_ELEMENTS:
            return
        for child in self.children:
            if isinstance(child, Node):
                child._collect_text(out)
            else:
                out.append(child)

    def ancestors(self):
        cur = self.parent
        while cur is not None:
            yield cur
            cur = cur.parent

    def detach(self) -> None:
        """Remove this node from its parent (``element.remove()`` analog,
        cookie-banner-remover.ts:19-21)."""
        if self.parent is not None:
            self.parent.children = [
                c for c in self.parent.children if c is not self
            ]
            self.parent = None


@dataclass
class Document:
    root: Node            # synthetic element wrapping everything
    source: str           # decoded source text (for outerHTML slices)

    def iter_elements(self):
        return self.root.iter_elements()

    def outer_html(self, node: Node) -> str:
        return self.source[node.start:node.end]

    def find_first(self, tag: str) -> Node | None:
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    @property
    def body(self) -> Node:
        return self.find_first("body") or self.root


def collect_elements(root: Node) -> list[Node]:
    """Document-order element list (identical order to iter_elements)
    in one iterative pass — the extraction core materializes this ONCE
    per document and every stage (ad match, links, readability, rss)
    iterates the list instead of re-walking the tree."""
    out: list[Node] = []
    stack: list[Node] = [root]
    while stack:
        node = stack.pop()
        if node is not root:
            out.append(node)
        children = node.children
        for i in range(len(children) - 1, -1, -1):
            child = children[i]
            if isinstance(child, Node):
                stack.append(child)
    return out


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = ""
        elif val[:1] in ("'", '"'):
            val = val[1:-1]
        if name not in attrs:
            attrs[name] = decode_entities(val)
    return attrs


def decode_html_bytes(data: bytes) -> str:
    if data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    return data.decode("utf-8", errors="replace")


def parse_html(data: bytes | str) -> Document:
    source = decode_html_bytes(data) if isinstance(data, bytes) else data
    root = Node(tag="#root", start=0, end=len(source))
    stack: list[Node] = [root]
    pos = 0
    n = len(source)
    while pos < n:
        m = _TOKEN_RE.search(source, pos)
        if m is None:
            text = source[pos:]
            if text:
                stack[-1].children.append(decode_entities(text))
            break
        if m.start() > pos:
            stack[-1].children.append(decode_entities(source[pos:m.start()]))
        pos = m.end()
        if m.group(2) is None:  # comment / doctype / cdata
            continue
        closing, tag, raw_attrs, self_close = (
            m.group(1), m.group(2).lower(), m.group(3), m.group(4))
        if closing:
            # pop to nearest matching open tag, else ignore
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    for node in stack[i:]:
                        node.end = pos
                    del stack[i:]
                    break
            continue
        node = Node(tag=tag, attrs=_parse_attrs(raw_attrs),
                    parent=stack[-1], start=m.start(), end=pos)
        stack[-1].children.append(node)
        if tag in RAWTEXT_ELEMENTS and not self_close:
            close_m = _rawtext_close_re(tag).search(source, pos)
            if close_m:
                raw = source[pos:close_m.start()]
                if raw:
                    node.children.append(raw)  # raw text: no entity decode
                pos = close_m.end()
                node.end = pos
            else:
                raw = source[pos:]
                if raw:
                    node.children.append(raw)
                pos = n
                node.end = n
            continue
        if self_close or tag in VOID_ELEMENTS:
            continue
        stack.append(node)
    for node in stack[1:]:
        node.end = n
    return Document(root=root, source=source)
