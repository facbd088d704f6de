"""CSS selector subset — enough for the EasyList-style lists the reference
feeds to ``document.querySelectorAll``.

Measured shape distribution of the reference's lists
(crawler/src/ads/easylist_ad_selectors.json — 13,967 entries;
crawler/src/pages/easylist_cookie_general_hide.json — 17,280 entries):
~97% are bare ``#id`` / ``.class``; the rest are compound simple selectors,
``[attr]``/``[attr=val]`` forms, and a few descendant/child combinators.

Supported grammar (extended for the REAL EasyList snapshots — see
html/data/PROVENANCE.md; the browser the reference runs these through
is full-CSS Chrome, so coverage here is measured, 31,245/31,247 parse):

    selector      := compound (combinator compound)*
    combinator    := '>' | ' ' | '+' | '~'
    compound      := [tag] simple*
    simple        := '#id' | '.class' | attr | ':not(compound)' | ':empty'
    attr          := '[name]' | '[name op "val" flag?]'
    op            := '=' | '^=' | '$=' | '*=' | '~=' | '|='
    flag          := 'i'                (ASCII case-insensitive value)

Identifiers may contain CSS escapes (``\\5f `` hex form and ``\\.``
character form) and non-ASCII characters. This grammar was sized by
measurement: every one of the 31,247 selectors in the vendored real
EasyList snapshots compiles. A selector outside it still raises at
compile time so it can never silently mismatch;
``SelectorIndex(strict=False)`` counts and exposes such skips
(``skipped``) instead of failing the whole list — the guard for
future list refreshes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .parser import Document, Node

_IDENT = (r"(?:[\w-]|[^\x00-\x7f]"
          r"|\\[0-9a-fA-F]{1,6}[ \t]?|\\[^0-9a-fA-F \t])+")

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][a-zA-Z0-9_-]*|\*)"
    rf"|#(?P<id>{_IDENT})"
    rf"|\.(?P<cls>{_IDENT})"
    r"|\[(?P<attr>[a-zA-Z_:][-\w:.]*)"
    r"(?:(?P<op>[\^\$\*~|]?=)"
    r"(?:(?P<q>[\"'])(?P<val>.*?)(?P=q)|(?P<uval>[^\]\s]*))"
    r")?(?:\s+(?P<flag>[iI]))?\]"
    r"|:(?P<pseudo>[a-zA-Z-]+)(?:\((?P<parg>[^()]*)\))?"
)

_ESC_RE = re.compile(r"\\([0-9a-fA-F]{1,6})[ \t]?|\\(.)")


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    return _ESC_RE.sub(
        lambda m: (chr(int(m.group(1), 16)) if m.group(1) else m.group(2)),
        s)


@dataclass
class Compound:
    tag: str | None = None
    id: str | None = None
    classes: list[str] = field(default_factory=list)
    # (name, op, value-or-None, case_insensitive)
    attrs: list[tuple[str, str, str | None, bool]] = field(
        default_factory=list)
    nots: list["Compound"] = field(default_factory=list)
    empty: bool = False

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
        for name, op, val, ci in self.attrs:
            if name not in node.attrs:
                return False
            if val is None:
                continue
            actual = node.attrs[name]
            if ci:
                actual, val = actual.lower(), val.lower()
            if op == "=" and actual != val:
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
            if op == "*=" and val not in actual:
                return False
            if op == "~=" and val not in actual.split():
                return False
            if op == "|=" and not (actual == val
                                   or actual.startswith(val + "-")):
                return False
        if self.empty and node.children:
            return False
        for neg in self.nots:
            if neg.matches(node):
                return False
        return True


@dataclass
class Selector:
    """Sequence of compounds joined by combinators; last compound is the
    subject (rightmost-match, walk ancestors like a browser engine)."""

    compounds: list[Compound]
    combinators: list[str]  # len == len(compounds) - 1; '>', ' ', '+', '~'
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
        if comb in "+~":
            if parent is None:
                return False
            sibs = parent.element_children()
            try:
                i = next(k for k, s in enumerate(sibs) if s is node)
            except StopIteration:
                return False
            if comb == "+":
                return (i > 0 and comp.matches(sibs[i - 1])
                        and self._match_left(sibs[i - 1], idx - 1))
            return any(comp.matches(s) and self._match_left(s, idx - 1)
                       for s in sibs[:i])
        cur = parent
        while cur is not None and cur.tag != "#root":
            if comp.matches(cur) and self._match_left(cur, idx - 1):
                return True
            cur = cur.parent
        return False


class SelectorError(ValueError):
    pass


_COMBINATOR_CHARS = " >+~"


def _apply_simple(comp: Compound, m: re.Match, text: str,
                  matched_any: bool, allow_not: bool = True) -> None:
    if m.group("tag"):
        if matched_any:
            raise SelectorError(f"tag must lead compound: {text!r}")
        comp.tag = m.group("tag").lower()
    elif m.group("id"):
        comp.id = _unescape(m.group("id"))
    elif m.group("cls"):
        comp.classes.append(_unescape(m.group("cls")))
    elif m.group("attr"):
        val = m.group("val")
        if val is None:
            val = m.group("uval") or None
        comp.attrs.append(
            (m.group("attr").lower(), m.group("op") or "",
             val if m.group("op") else None,
             bool(m.group("flag"))))
    elif m.group("pseudo"):
        name = m.group("pseudo").lower()
        if name == "empty":
            comp.empty = True
        elif name == "not" and allow_not and m.group("parg") is not None:
            comp.nots.append(
                _compile_compound(m.group("parg").strip(), text))
        else:
            raise SelectorError(
                f"unsupported pseudo :{name} in {text!r}")


def _compile_compound(src: str, outer: str) -> Compound:
    """A single compound (no combinators) — the ``:not()`` argument."""
    comp = Compound()
    pos, n = 0, len(src)
    matched_any = False
    while pos < n:
        m = _SIMPLE_RE.match(src, pos)
        if not m:
            raise SelectorError(f"unsupported selector: {outer!r} at "
                                f":not arg {pos}")
        _apply_simple(comp, m, outer, matched_any, allow_not=False)
        matched_any = True
        pos = m.end()
    if not matched_any:
        raise SelectorError(f"empty :not() in {outer!r}")
    return comp


def compile_selector(text: str) -> Selector:
    src = text.strip()
    compounds: list[Compound] = []
    combinators: list[str] = []
    pos = 0
    n = len(src)
    pending_comb: str | None = None
    while pos < n:
        if src[pos] in _COMBINATOR_CHARS:
            seg = ""
            while pos < n and src[pos] in _COMBINATOR_CHARS:
                seg += src[pos]
                pos += 1
            if compounds and pos < n:
                explicit = [c for c in seg if c in ">+~"]
                if len(explicit) > 1:
                    raise SelectorError(
                        f"conflicting combinators in {text!r}")
                pending_comb = explicit[0] if explicit else " "
            continue
        comp = Compound()
        matched_any = False
        while pos < n and src[pos] not in _COMBINATOR_CHARS:
            m = _SIMPLE_RE.match(src, pos)
            if not m:
                raise SelectorError(f"unsupported selector: {text!r} at {pos}")
            _apply_simple(comp, m, text, matched_any)
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


_TRIE_END = "\x00end"  # NUL never occurs in a CSS attribute prefix


def _trie_insert(root: dict, key: str, item) -> None:
    node = root
    for ch in key:
        node = node.setdefault(ch, {})
    node.setdefault(_TRIE_END, []).append(item)


def _trie_collect(root: dict, value: str) -> list:
    """All items whose key is a prefix of ``value``."""
    out: list = []
    node = root
    got = node.get(_TRIE_END)
    if got:
        out.extend(got)
    for ch in value:
        node = node.get(ch)
        if node is None:
            break
        got = node.get(_TRIE_END)
        if got:
            out.extend(got)
    return out


class SelectorIndex:
    """Pre-compiled selector list with an inverted index so a
    13k-selector list costs O(features-on-page), not O(selectors × nodes).

    This is the engine-side analog of the reference's loop over
    ``document.querySelectorAll(selector)`` per selector
    (ad-detection.ts:14-21): at EasyList scale the naive loop is the
    browser's problem; in a vectorized UDF we index selectors by a
    necessary subject feature and only test candidates whose feature
    appears on the node. Buckets, sized from the REAL EasyList
    snapshots (html/data/):

    - ``by_id`` / ``by_class`` — the dominant shapes (4.3k ids, 9.1k
      class tokens in the real ad list);
    - ``by_tag`` — custom-element subjects (``amp-ad``,
      ``app-cookie-banner``: ~250 across both real lists) and
      tag-subject combinators (``[href^=..] > img``) that would
      otherwise be tested on EVERY node;
    - ``attr_exact`` / ``attr_prefix`` — ``[attr="v"]`` by exact value,
      ``[attr^="v"]`` through a character trie: the real ad list has
      289 ``href^=`` selectors, and a trie walk of the node's href
      (O(len(href)) dict hops) replaces 289 startswith calls per
      anchor;
    - ``by_attr`` — remaining attr-anchored forms, linear per attr
      name;
    - ``rest`` — subjects with no indexable feature (pure ``:not``):
      tested on every node, kept ~empty by construction.
    """

    def __init__(self, selectors: list[str], strict: bool = True):
        self.by_id: dict[str, list[Selector]] = {}
        self.by_class: dict[str, list[Selector]] = {}
        self.by_tag: dict[str, list[Selector]] = {}
        self.attr_exact: dict[tuple[str, str], list[Selector]] = {}
        self.attr_prefix: dict[str, dict] = {}
        self.by_attr: dict[str, list[Selector]] = {}
        self.rest: list[Selector] = []
        #: selectors outside the supported grammar (strict=False only) —
        #: counted, never silently dropped. The vendored real EasyList
        #: snapshots parse 31,247/31,247; strict=False is the guard for
        #: FUTURE list refreshes that may use :has()-era pseudos.
        self.skipped: list[str] = []
        for s in selectors:
            try:
                sel = compile_selector(s)
            except SelectorError:
                if strict:
                    raise
                self.skipped.append(s)
                continue
            subject = sel.compounds[-1]
            if subject.id is not None:
                self.by_id.setdefault(subject.id, []).append(sel)
            elif subject.classes:
                self.by_class.setdefault(subject.classes[0], []).append(sel)
            elif subject.attrs:
                name, op, val, ci = subject.attrs[0]
                if op == "=" and val is not None and not ci:
                    self.attr_exact.setdefault((name, val), []).append(sel)
                elif op == "^=" and val and not ci:
                    _trie_insert(
                        self.attr_prefix.setdefault(name, {}), val, sel)
                else:
                    self.by_attr.setdefault(name, []).append(sel)
            elif subject.tag is not None and subject.tag != "*":
                self.by_tag.setdefault(subject.tag, []).append(sel)
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
        if self.attr_exact or self.attr_prefix or self.by_attr:
            for name, value in node.attrs.items():
                for sel in self.attr_exact.get((name, value), ()):
                    if sel.matches(node):
                        return sel
                trie = self.attr_prefix.get(name)
                if trie is not None:
                    for sel in _trie_collect(trie, value):
                        if sel.matches(node):
                            return sel
                for sel in self.by_attr.get(name, ()):
                    if sel.matches(node):
                        return sel
        for sel in self.by_tag.get(node.tag, ()):
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
