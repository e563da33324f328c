"""Minimal HTML DOM with the BeautifulSoup semantics the reference relies on.

The reference parses pages with ``BeautifulSoup(text, 'html.parser')``
(reference ``crawler/article.py:277``).  bs4 is not available in this
environment, so this module provides a small DOM built on the stdlib
``html.parser.HTMLParser`` (the same tokenizer bs4's html.parser backend
wraps, with ``convert_charrefs=True``) exposing exactly the behaviors the
reference code uses:

- ``find(id=...)``, ``find(tag, class_)``, ``find_all(tag, class_)``
- ``select('tag.class')`` (descendant search by tag + class token)
- ``find_children(tag, recursive=False)`` (bs4 ``findChildren``)
- ``find_text(pattern)`` (bs4 ``find(text=re.compile(...))``)
- ``node.string`` / ``node.strings`` / ``node.stripped_strings``
- ``node.extract()`` (detach from tree)
- ``node['class']`` as a token list

Class matching follows bs4: a single-token query matches any element whose
class list contains the token; a multi-token query (e.g. the reference's
``find("div", "r-list-container action-bar-margin bbs-screen")``) matches
the exact, space-joined class attribute value.

Only the well-formed-HTML subset the synthetic corpus emits is supported;
void elements (br, img, hr, input, meta, link) never push the stack.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag=None, attrs=None, parent=None, text=None):
        self.tag = tag            # None ⇒ text node
        self.attrs = attrs or {}
        self.children = []
        self.parent = parent
        self.text = text

    # --- tree ops -----------------------------------------------------------
    def extract(self):
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self

    def __getitem__(self, key):
        val = self.attrs[key]
        if key == "class":
            return val.split()
        return val

    @property
    def classes(self):
        return self.attrs.get("class", "").split()

    # --- traversal ----------------------------------------------------------
    def iter_nodes(self):
        """All descendant nodes (elements and text), document order, self excluded."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if node.tag is not None:
                stack.extend(reversed(node.children))

    def _class_matches(self, want: str) -> bool:
        if " " in want:
            return self.attrs.get("class", "") == want
        return want in self.classes

    def find(self, tag=None, class_=None, id=None):
        for node in self.iter_nodes():
            if node.tag is None:
                continue
            if tag is not None and node.tag != tag:
                continue
            if class_ is not None and not node._class_matches(class_):
                continue
            if id is not None and node.attrs.get("id") != id:
                continue
            return node
        return None

    def find_all(self, tag=None, class_=None):
        out = []
        for node in self.iter_nodes():
            if node.tag is None:
                continue
            if tag is not None and node.tag != tag:
                continue
            if class_ is not None and not node._class_matches(class_):
                continue
            out.append(node)
        return out

    def select(self, selector: str):
        """'tag.class' or '.class' or 'tag' — descendant search, doc order."""
        tag, _, cls = selector.partition(".")
        return self.find_all(tag or None, cls or None)

    def find_children(self, tag=None):
        return [c for c in self.children if c.tag is not None and (tag is None or c.tag == tag)]

    def find_text(self, pattern):
        """First descendant text node whose content matches re ``pattern`` (search)."""
        for node in self.iter_nodes():
            if node.tag is None and pattern.search(node.text):
                return node.text
        return None

    # --- string accessors (bs4 semantics) ------------------------------------
    @property
    def string(self):
        if self.tag is None:
            return self.text
        if len(self.children) == 1:
            return self.children[0].string
        return None

    @property
    def strings(self):
        for node in self.iter_nodes():
            if node.tag is None:
                yield node.text

    @property
    def stripped_strings(self):
        for s in self.strings:
            s = s.strip()
            if s:
                yield s


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="[document]")
        self.stack = [self.root]
        self._textbuf = []

    def _flush_text(self):
        if self._textbuf:
            parent = self.stack[-1]
            node = Node(parent=parent, text="".join(self._textbuf))
            parent.children.append(node)
            self._textbuf = []

    def handle_starttag(self, tag, attrs):
        self._flush_text()
        parent = self.stack[-1]
        node = Node(tag=tag, attrs=dict(attrs), parent=parent)
        parent.children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._flush_text()
        parent = self.stack[-1]
        parent.children.append(Node(tag=tag, attrs=dict(attrs), parent=parent))

    def handle_endtag(self, tag):
        self._flush_text()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self._textbuf.append(data)

    def finish(self) -> Node:
        self._flush_text()
        return self.root


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text)
    return b.finish()
