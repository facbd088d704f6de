"""CSS selector subset — enough for the EasyList-style lists the reference
feeds to ``document.querySelectorAll``.

Measured shape distribution of the reference's lists
(crawler/src/ads/easylist_ad_selectors.json — 13,967 entries;
crawler/src/pages/easylist_cookie_general_hide.json — 17,280 entries):
~97% are bare ``#id`` / ``.class``; the rest are compound simple selectors,
``[attr]``/``[attr=val]`` forms, and a few descendant/child combinators.

Supported grammar (pinned):

    selector      := compound (combinator compound)*
    combinator    := '>' | ' '          (child / descendant)
    compound      := [tag] simple*
    simple        := '#id' | '.class' | '[attr]' | '[attr="val"]'
                     | '[attr^="v"]' | '[attr$="v"]' | '[attr*="v"]'

Comma-separated selector lists are split by the caller. Pseudo-classes are
NOT supported (the vendored lists contain none); an unsupported selector
raises at compile time so it can never silently mismatch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .parser import Document, Node

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)"
    r"|#(?P<id>[\w-]+)"
    r"|\.(?P<cls>[\w-]+)"
    r"|\[(?P<attr>[a-zA-Z_:][-\w:.]*)"
    r"(?:(?P<op>[\^\$\*]?=)(?P<q>[\"']?)(?P<val>[^\"'\]]*)(?P=q))?\]"
)


@dataclass
class Compound:
    tag: str | None = None
    id: str | None = None
    classes: list[str] = field(default_factory=list)
    attrs: list[tuple[str, str, str | None]] = field(default_factory=list)

    def matches(self, node: Node) -> bool:
        if self.tag is not None and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.id != self.id:
            return False
        if self.classes:
            ncls = node.classes
            for c in self.classes:
                if c not in ncls:
                    return False
        for name, op, val in self.attrs:
            if name not in node.attrs:
                return False
            if val is None:
                continue
            actual = node.attrs[name]
            if op == "=" and actual != val:
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
            if op == "*=" and val not in actual:
                return False
        return True


@dataclass
class Selector:
    """Sequence of compounds joined by combinators; last compound is the
    subject (rightmost-match, walk ancestors like a browser engine)."""

    compounds: list[Compound]
    combinators: list[str]  # len == len(compounds) - 1; '>' or ' '
    source: str = ""

    def matches(self, node: Node) -> bool:
        if not self.compounds[-1].matches(node):
            return False
        return self._match_left(node, len(self.compounds) - 2)

    def _match_left(self, node: Node, idx: int) -> bool:
        if idx < 0:
            return True
        comb = self.combinators[idx]
        comp = self.compounds[idx]
        parent = node.parent
        if comb == ">":
            if parent is None or parent.tag == "#root":
                return False
            return comp.matches(parent) and self._match_left(parent, idx - 1)
        cur = parent
        while cur is not None and cur.tag != "#root":
            if comp.matches(cur) and self._match_left(cur, idx - 1):
                return True
            cur = cur.parent
        return False


class SelectorError(ValueError):
    pass


def compile_selector(text: str) -> Selector:
    src = text.strip()
    compounds: list[Compound] = []
    combinators: list[str] = []
    pos = 0
    n = len(src)
    pending_comb: str | None = None
    while pos < n:
        if src[pos] in " >":
            seg = ""
            while pos < n and src[pos] in " >":
                seg += src[pos]
                pos += 1
            if compounds and pos < n:
                pending_comb = ">" if ">" in seg else " "
            continue
        comp = Compound()
        matched_any = False
        while pos < n and src[pos] not in " >":
            m = _SIMPLE_RE.match(src, pos)
            if not m:
                raise SelectorError(f"unsupported selector: {text!r} at {pos}")
            if m.group("tag"):
                if matched_any:
                    raise SelectorError(f"tag must lead compound: {text!r}")
                comp.tag = m.group("tag").lower()
            elif m.group("id"):
                comp.id = m.group("id")
            elif m.group("cls"):
                comp.classes.append(m.group("cls"))
            elif m.group("attr"):
                comp.attrs.append(
                    (m.group("attr").lower(), m.group("op") or "",
                     m.group("val") if m.group("op") else None))
            matched_any = True
            pos = m.end()
        if not matched_any:
            raise SelectorError(f"empty compound in {text!r}")
        if compounds:
            combinators.append(pending_comb or " ")
        pending_comb = None
        compounds.append(comp)
    if not compounds:
        raise SelectorError(f"empty selector: {text!r}")
    return Selector(compounds=compounds, combinators=combinators, source=text)


class SelectorIndex:
    """Pre-compiled selector list with an id/class inverted index so a
    13k-selector list costs O(features-on-page), not O(selectors × nodes).

    This is the engine-side analog of the reference's loop over
    ``document.querySelectorAll(selector)`` per selector
    (ad-detection.ts:14-21): at EasyList scale the naive loop is the
    browser's problem; in a vectorized UDF we index selectors by their
    required id/class token and only test candidates whose tokens appear
    on the node.
    """

    def __init__(self, selectors: list[str]):
        self.by_id: dict[str, list[Selector]] = {}
        self.by_class: dict[str, list[Selector]] = {}
        self.by_attr: dict[str, list[Selector]] = {}
        self.rest: list[Selector] = []
        for s in selectors:
            sel = compile_selector(s)
            subject = sel.compounds[-1]
            if subject.id is not None:
                self.by_id.setdefault(subject.id, []).append(sel)
            elif subject.classes:
                self.by_class.setdefault(subject.classes[0], []).append(sel)
            elif subject.attrs:
                # [attr...] selectors index by required attribute name —
                # EasyList has ~1% of these; left linear they dominate
                # at 13k-list scale
                self.by_attr.setdefault(subject.attrs[0][0], []).append(sel)
            else:
                self.rest.append(sel)

    def match_all(self, doc: Document,
                  elements: list[Node] | None = None
                  ) -> list[tuple[Node, str]]:
        """All (node, selector-source) matches in document order, first
        matching selector per node (set-union semantics of
        ad-detection.ts:14-21 — a node matched twice is one ad).
        Pass ``elements`` (collect_elements output) to reuse one walk
        across extraction stages."""
        out: list[tuple[Node, str]] = []
        for node in (doc.iter_elements() if elements is None
                     else elements):
            sel = self._match_node(node)
            if sel is not None:
                out.append((node, sel.source))
        return out

    def _match_node(self, node: Node) -> Selector | None:
        nid = node.id
        if nid:
            for sel in self.by_id.get(nid, ()):
                if sel.matches(node):
                    return sel
        for cls in node.classes:
            for sel in self.by_class.get(cls, ()):
                if sel.matches(node):
                    return sel
        if self.by_attr:
            for name in node.attrs:
                for sel in self.by_attr.get(name, ()):
                    if sel.matches(node):
                        return sel
        for sel in self.rest:
            if sel.matches(node):
                return sel
        return None


def query_all(doc_or_node, selector: str) -> list[Node]:
    """``querySelectorAll`` equivalent over a Document or subtree."""
    sel = compile_selector(selector)
    return [n for n in doc_or_node.iter_elements() if sel.matches(n)]
