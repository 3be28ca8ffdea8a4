"""Minimal lenient HTML tokenizer + mutable DOM + serializer.

This is the in-UDF document representation for the extraction engine.
It is written from scratch for vectorized batch execution: one plain-Python
tree per document, built inside an Arrow batch loop, never visible to Spark.

The node model deliberately mirrors the shape the reference rule semantics
assume (reference: rmuit/HtmlCleanup, soupcleanup.py:70 `Tag, NavigableString`;
cleanup_msfp.py:88 `BeautifulSoup(html)`): a ``Tag`` has an ordered attribute
list, an ordered ``contents`` list, and a parent pointer; text/comments are
leaves whose *adjacency* matters.  Serialization follows the conventions the
reference's output contract depends on (attribute order preserved, void tags
as ``<br />`` with the final sink rewriting ``<br />`` -> ``<br>``,
cleanup_msfp.py:300-302).

Parsing leniency: the reference relies on pre-parse string repair
(cleanup_msfp.py:47-84) to remove the constructs that confuse tree builders,
so this parser only needs mainstream leniency: ignore unmatched end tags,
implicitly close ``p``/``li``/``td``/``tr`` on a new sibling, close open tags
at EOF.  Entities are NOT decoded (``&nbsp;`` stays literal text — the
whitespace algebra depends on that, soupcleanup.py:31-45).
"""

from __future__ import annotations

import re

# Tags serialized self-closing and never pushed on the open stack.
# (Superset of BeautifulSoup v3's SELF_CLOSING_TAGS.)
VOID_TAGS = frozenset(
    "br hr input img meta spacer link frame base area col embed param "
    "source track wbr basefont isindex".split()
)

# Implicit-close rules: a new start tag of <key> closes the nearest open tag
# in <closes>, unless a <boundary> tag sits in between on the open stack.
_IMPLICIT_CLOSE = {
    "p": (frozenset({"p"}), frozenset({"td", "th", "li", "caption", "body", "html", "table", "ul", "ol"})),
    "li": (frozenset({"li", "p"}), frozenset({"ul", "ol", "body", "html"})),
    "tr": (frozenset({"tr", "td", "th"}), frozenset({"table", "body", "html"})),
    "td": (frozenset({"td", "th"}), frozenset({"tr", "table", "body", "html"})),
    "th": (frozenset({"td", "th"}), frozenset({"tr", "table", "body", "html"})),
    "option": (frozenset({"option"}), frozenset({"select", "body", "html"})),
}

_RAWTEXT_TAGS = frozenset({"script", "style", "textarea"})

_RX_TAG_NAME = re.compile(r"[a-zA-Z][^\s>/]*")
_RX_ATTR = re.compile(
    r"""\s*([^\s=/>]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)


class Node:
    """Base node: parent pointer + O(1) doubly-linked sibling pointers.

    Sibling pointers are maintained by Tag.insert / Node.extract so the
    cascade's heavy sibling walks don't pay an O(children) index scan per
    step (they did in the first version; profiling on wide bodies showed it).
    """

    __slots__ = ("parent", "previous_sibling", "next_sibling", "_idx_hint")

    def __init__(self):
        self.parent = None
        self.previous_sibling = None
        self.next_sibling = None
        self._idx_hint = 0

    # -- tree navigation ---------------------------------------------------
    def index_in_parent(self) -> int:
        """Index of this node in parent.contents (identity match).

        Same identity semantics as the reference's scan
        (soupcleanup.py:192-208), accelerated by a self-repairing index hint:
        exact hits are O(1); after sibling inserts/removals the position has
        only drifted, so an outward scan from the hint finds it in O(drift).
        """
        c = self.parent.contents
        n = len(c)
        h = self._idx_hint
        if 0 <= h < n and c[h] is self:
            return h
        lo, hi = min(h - 1, n - 1), max(h + 1, 0)
        while lo >= 0 or hi < n:
            if lo >= 0 and c[lo] is self:
                self._idx_hint = lo
                return lo
            if hi < n and c[hi] is self:
                self._idx_hint = hi
                return hi
            lo -= 1
            hi += 1
        raise ValueError("node not found in its own parent")

    def extract(self):
        """Detach this node from its parent (keeps subtree intact)."""
        if self.parent is not None:
            self.parent.contents.remove(self)
            self.parent = None
            if self.previous_sibling is not None:
                self.previous_sibling.next_sibling = self.next_sibling
            if self.next_sibling is not None:
                self.next_sibling.previous_sibling = self.previous_sibling
            self.previous_sibling = None
            self.next_sibling = None
        return self


class Text(Node):
    """Text leaf. Entities are kept literal (``&nbsp;`` is 6 chars).

    Unlike BeautifulSoup's immutable NavigableString, replace_with mutates in
    place — identity is preserved, which all in-pass sibling walks rely on.
    """

    __slots__ = ("value",)

    is_text = True

    def __init__(self, value: str):
        super().__init__()
        self.value = value

    def replace_with(self, value: str):
        self.value = value
        return self

    def find(self, sub: str) -> int:
        return self.value.find(sub)

    def __str__(self):
        return self.value


class Comment(Node):
    __slots__ = ("value",)
    is_text = False

    def __init__(self, value: str):
        super().__init__()
        self.value = value

    def __str__(self):
        return "<!--%s-->" % self.value


class Declaration(Node):
    """Doctype / processing instruction, kept verbatim (value includes <...>)."""

    __slots__ = ("value",)
    is_text = False

    def __init__(self, value: str):
        super().__init__()
        self.value = value

    def __str__(self):
        return self.value


class Tag(Node):
    """Element node: ordered attrs (list of [name, value]) + ordered contents."""

    __slots__ = ("name", "attrs", "contents")

    is_text = False

    def __init__(self, name: str, attrs=None):
        super().__init__()
        self.name = name
        self.attrs = [list(a) for a in attrs] if attrs else []
        self.contents = []

    # -- attribute access (dict-ish over an ordered pair list) -------------
    def get(self, name, default=None):
        for k, v in self.attrs:
            if k == name:
                return v
        return default

    def __getitem__(self, name):
        v = self.get(name)
        if v is None:
            raise KeyError(name)
        return v

    def __setitem__(self, name, value):
        """Replace the first occurrence in place (position kept), else append."""
        for pair in self.attrs:
            if pair[0] == name:
                pair[1] = value
                return
        self.attrs.append([name, value])

    def __delitem__(self, name):
        """Delete all attributes with this name; no error if absent.

        (The cascade deletes unconditionally, e.g. set_alignment's
        ``del tag['align']`` — soupcleanup.py:321.)
        """
        self.attrs = [pair for pair in self.attrs if pair[0] != name]

    # -- children -----------------------------------------------------------
    def insert(self, index: int, node: Node):
        """Insert node at index; implicitly detaches it from any old parent."""
        if node.parent is not None:
            node.extract()
        c = self.contents
        if index < 0:
            index = max(len(c) + index, 0)
        elif index > len(c):
            index = len(c)
        prev = c[index - 1] if index > 0 else None
        nxt = c[index] if index < len(c) else None
        c.insert(index, node)
        node.parent = self
        node._idx_hint = index
        node.previous_sibling = prev
        node.next_sibling = nxt
        if prev is not None:
            prev.next_sibling = node
        if nxt is not None:
            nxt.previous_sibling = node

    def append(self, node: Node):
        self.insert(len(self.contents), node)

    def find_all(self, name=None, attrs=None, text_pred=None, recursive=True):
        """Pre-order snapshot search (like the reference's findAll usage).

        - name: tag name to match (ignored when text_pred given)
        - attrs: dict of attr-name -> exact value
        - text_pred: predicate over Text nodes; returns Text nodes instead
        - recursive: False = direct children only
        """
        out = []
        if not recursive and text_pred is None and attrs is None:
            return [
                c for c in self.contents
                if isinstance(c, Tag) and (name is None or c.name == name)
            ]
        if recursive and text_pred is None and attrs is None:
            # hot path: iterative preorder, name-only match
            stack = list(reversed(self.contents))
            while stack:
                node = stack.pop()
                if isinstance(node, Tag):
                    if name is None or node.name == name:
                        out.append(node)
                    if node.contents:
                        stack.extend(reversed(node.contents))
            return out

        def match_tag(node):
            if not isinstance(node, Tag):
                return False
            if name is not None and node.name != name:
                return False
            if attrs:
                for k, v in attrs.items():
                    if node.get(k) != v:
                        return False
            return True

        def walk(parent):
            # No defensive copy: the walk finishes before callers mutate;
            # the returned list is the snapshot.
            for child in parent.contents:
                if text_pred is not None:
                    if isinstance(child, Text) and text_pred(child.value):
                        out.append(child)
                elif match_tag(child):
                    out.append(child)
                if recursive and isinstance(child, Tag):
                    walk(child)

        walk(self)
        return out

    def find_all_multi(self, names) -> dict:
        """One preorder traversal bucketing tags by name: {name: [tags]}.

        Equivalent to one find_all per name ONLY when processing tags of one
        name neither creates nor extracts tags of another name in the set —
        the cascade groups passes under that invariant (see run()).
        """
        buckets = {n: [] for n in names}
        stack = list(reversed(self.contents))
        while stack:
            node = stack.pop()
            if isinstance(node, Tag):
                b = buckets.get(node.name)
                if b is not None:
                    b.append(node)
                if node.contents:
                    stack.extend(reversed(node.contents))
        return buckets

    def find(self, name=None, **kw):
        r = self.find_all(name, **kw)
        return r[0] if r else None

    def __str__(self):
        return serialize(self)


class Document(Tag):
    """Root node; serializes as the concatenation of its children."""

    __slots__ = ()

    def __init__(self):
        super().__init__("[document]")

    @property
    def body(self):
        return self.find("body")

    def __str__(self):
        return "".join(serialize(c) for c in self.contents)


# ---------------------------------------------------------------------------
# Serializer
# ---------------------------------------------------------------------------

def _serialize_into(node, out: list):
    if isinstance(node, Text):
        out.append(node.value)
    elif isinstance(node, Comment):
        out.append("<!--")
        out.append(node.value)
        out.append("-->")
    elif isinstance(node, Declaration):
        out.append(node.value)
    elif isinstance(node, Document):
        for c in node.contents:
            _serialize_into(c, out)
    elif isinstance(node, Tag):
        out.append("<")
        out.append(node.name)
        for k, v in node.attrs:
            # Double quotes by default; flip to single if the value contains
            # a double quote (BS3 convention).
            if v is None:
                v = k
            if '"' in v:
                out.append(" %s='%s'" % (k, v))
            else:
                out.append(' %s="%s"' % (k, v))
        if node.name in VOID_TAGS and not node.contents:
            out.append(" />")
        else:
            out.append(">")
            for c in node.contents:
                _serialize_into(c, out)
            out.append("</%s>" % node.name)
    else:  # pragma: no cover
        raise TypeError(type(node))


def serialize(node) -> str:
    out = []
    _serialize_into(node, out)
    return "".join(out)


# ---------------------------------------------------------------------------
# Tokenizer + tree builder
# ---------------------------------------------------------------------------

def _parse_attrs(s: str):
    attrs = []
    pos = 0
    n = len(s)
    while pos < n:
        m = _RX_ATTR.match(s, pos)
        if not m or m.end() == pos:
            break
        name = m.group(1).lower()
        raw = m.group(2)
        if raw is None:
            value = name  # minimized attribute: value = name (HTML rule)
        elif raw[:1] in "\"'":
            value = raw[1:-1]
        else:
            value = raw
        attrs.append([name, value])
        pos = m.end()
    return attrs


def parse(html: str) -> Document:
    """Parse an HTML string into a Document tree.

    Lenient: stray ``<`` becomes text, unmatched end tags are dropped,
    open tags are closed at EOF, p/li/td/tr are implicitly closed.
    """
    doc = Document()
    stack = [doc]  # open-tag stack; stack[-1] is the insertion point
    pos = 0
    n = len(html)

    def open_names():
        return [t.name for t in stack[1:]]

    def close_to(name):
        """Pop stack down to and including the nearest open <name>."""
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].name == name:
                del stack[i:]
                return True
        return False

    def implicit_close(new_name):
        rule = _IMPLICIT_CLOSE.get(new_name)
        if not rule:
            return
        closes, boundary = rule
        for i in range(len(stack) - 1, 0, -1):
            nm = stack[i].name
            if nm in boundary:
                return
            if nm in closes:
                del stack[i:]
                return

    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            stack[-1].append(Text(html[pos:]))
            break
        if lt > pos:
            stack[-1].append(Text(html[pos:lt]))
        rest = html[lt + 1 : lt + 2]
        if rest == "!":
            if html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                if end == -1:
                    stack[-1].append(Comment(html[lt + 4 :]))
                    break
                stack[-1].append(Comment(html[lt + 4 : end]))
                pos = end + 3
            else:
                end = html.find(">", lt)
                if end == -1:
                    stack[-1].append(Text(html[lt:]))
                    break
                stack[-1].append(Declaration(html[lt : end + 1]))
                pos = end + 1
        elif rest == "?":
            end = html.find(">", lt)
            if end == -1:
                stack[-1].append(Text(html[lt:]))
                break
            stack[-1].append(Declaration(html[lt : end + 1]))
            pos = end + 1
        elif rest == "/":
            end = html.find(">", lt)
            if end == -1:
                stack[-1].append(Text(html[lt:]))
                break
            name = html[lt + 2 : end].strip().lower()
            close_to(name)  # unmatched end tag: silently dropped
            pos = end + 1
        else:
            m = _RX_TAG_NAME.match(html, lt + 1)
            if not m:
                # '<' not starting a tag: literal text
                stack[-1].append(Text("<"))
                pos = lt + 1
                continue
            name = m.group(0).lower()
            end = html.find(">", m.end())
            if end == -1:
                stack[-1].append(Text(html[lt:]))
                break
            inner = html[m.end() : end]
            self_closing = inner.rstrip().endswith("/")
            if self_closing:
                inner = inner.rstrip()[:-1]
            attrs = _parse_attrs(inner)
            implicit_close(name)
            tag = Tag(name, attrs)
            stack[-1].append(tag)
            pos = end + 1
            if name in _RAWTEXT_TAGS and not self_closing:
                # Raw-text element: contents are literal until the matching
                # end tag (scripts may contain '<'; the cascade deletes the
                # whole subtree anyway, cleanup_msfp.py:100-101).
                close_rx = re.compile(r"</%s\s*>" % re.escape(name), re.I)
                mm = close_rx.search(html, pos)
                if mm:
                    if mm.start() > pos:
                        tag.append(Text(html[pos : mm.start()]))
                    pos = mm.end()
                else:
                    tag.append(Text(html[pos:]))
                    pos = n
            elif name not in VOID_TAGS and not self_closing:
                stack.append(tag)

    return doc
