"""API-faithful TEST DOUBLE for ``bs4`` — NOT the real library. Implements
the slice of BeautifulSoup that ``make_html_strip_udf`` uses:
``BeautifulSoup(t, features=...)``, calling the soup with a tag list
(→ find_all), ``el.extract()``, and ``get_text()``. Backed by the stdlib
``html.parser`` building a minimal node tree."""

from html.parser import HTMLParser

_VOID = {"img", "br", "hr", "meta", "link", "input"}


class _Node:
    def __init__(self, name, parent=None):
        self.name = name
        self.parent = parent
        self.children = []  # _Node or str

    def extract(self):
        if self.parent is not None:
            self.parent.children = [
                c for c in self.parent.children if c is not self
            ]
            self.parent = None
        return self

    def _walk(self, out):
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                c._walk(out)

    def get_text(self, separator=""):
        out = []
        self._walk(out)
        return separator.join(out)

    def find_all(self, names):
        if isinstance(names, str):
            names = [names]
        hits = []

        def rec(n):
            for c in n.children:
                if isinstance(c, _Node):
                    if c.name in names:
                        hits.append(c)
                    rec(c)

        rec(self)
        return hits


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].children.append(data)


class BeautifulSoup(_Node):
    def __init__(self, markup, features="html.parser", **kw):
        b = _TreeBuilder()
        b.feed(markup or "")
        b.close()
        super().__init__("[document]")
        self.children = b.root.children
        for c in self.children:
            if isinstance(c, _Node):
                c.parent = self

    def __call__(self, names):
        return self.find_all(names)
