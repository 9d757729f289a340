"""minijs DOM: HTML parser, element tree, CSS selector subset, events.

Implements the browser surface the frontend touches: innerHTML (real
HTML parsing so querySelector works over generated markup), textContent,
value/checked/disabled/files for form controls, classList, dataset,
style, on* property handlers + addEventListener with bubbling, and the
selector grammar the app uses (#id, .class, tag, [attr], [attr="v"],
compounds, descendant combinators, comma lists)."""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

from scripts.minijs.interp import (
    UNDEF, JSArray, JSObject, NativeFunction, _Throw, js_str, js_truthy,
)

VOID_ELEMENTS = {"area", "base", "br", "col", "embed", "hr", "img",
                 "input", "link", "meta", "param", "source", "track",
                 "wbr"}

_ON_PROP = re.compile(r"^on[a-z]+$")


class Node(JSObject):
    pass


class TextNode(Node):
    def __init__(self, text):
        super().__init__()
        self.text = text
        self.parent = None

    def js_get(self, interp, prop):
        if prop == "textContent":
            return self.text
        if prop == "nodeType":
            return 3.0
        return NotImplemented

    def js_set(self, interp, prop, value):
        return False


class ClassList(JSObject):
    def __init__(self, el):
        super().__init__()
        self.el = el

    def _classes(self):
        return [c for c in self.el.attrs.get("class", "").split() if c]

    def js_get(self, interp, prop):
        cl = self

        def nat(fn, name):
            return NativeFunction(
                lambda i, t, a: fn([js_str(x) for x in a]), name)
        if prop == "add":
            def add(names):
                cs = cl._classes()
                for n in names:
                    if n not in cs:
                        cs.append(n)
                cl.el.attrs["class"] = " ".join(cs)
                return UNDEF
            return nat(add, "add")
        if prop == "remove":
            def rem(names):
                cs = [c for c in cl._classes() if c not in names]
                cl.el.attrs["class"] = " ".join(cs)
                return UNDEF
            return nat(rem, "remove")
        if prop == "toggle":
            def tog(names):
                cs = cl._classes()
                n = names[0]
                if n in cs:
                    cs.remove(n)
                    out = False
                else:
                    cs.append(n)
                    out = True
                cl.el.attrs["class"] = " ".join(cs)
                return out
            return nat(tog, "toggle")
        if prop == "contains":
            return nat(lambda names: names[0] in cl._classes(), "contains")
        return NotImplemented

    def js_set(self, interp, prop, value):
        return False


class StyleObject(JSObject):
    def js_get(self, interp, prop):
        return self.props.get(prop, "")

    def js_set(self, interp, prop, value):
        self.props[prop] = js_str(value)
        return True


class Dataset(JSObject):
    def __init__(self, el):
        super().__init__()
        self.el = el

    @staticmethod
    def _attr(prop):
        return "data-" + re.sub(r"([A-Z])", r"-\1", prop).lower()

    def js_get(self, interp, prop):
        attr = self._attr(prop)
        if attr in self.el.attrs:
            return self.el.attrs[attr]
        return UNDEF

    def js_set(self, interp, prop, value):
        self.el.attrs[self._attr(prop)] = js_str(value)
        return True


class Element(Node):
    def __init__(self, tag, doc=None):
        super().__init__()
        self.tag = tag.lower()
        self.attrs = {}
        self.children = []      # Element | TextNode
        self.parent = None
        self.doc = doc
        self.listeners = {}     # type -> [fn]
        self._value = None      # form control value override
        self._checked = False
        self._files = JSArray([])
        self.classList = ClassList(self)
        self.style = StyleObject()
        self.dataset = Dataset(self)

    # ---- tree ----------------------------------------------------------
    def append_child(self, node):
        if node.parent is not None:
            node.parent.children.remove(node)
        node.parent = self
        if isinstance(node, Element):
            node.doc = self.doc
            for d in node.iter():
                d.doc = self.doc
        self.children.append(node)

    def remove_self(self):
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def iter(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter()

    def ancestors(self):
        node = self
        while node is not None:
            yield node
            node = node.parent

    # ---- text / html ------------------------------------------------------
    def get_text(self):
        out = []
        for c in self.children:
            if isinstance(c, TextNode):
                out.append(c.text)
            else:
                out.append(c.get_text())
        return "".join(out)

    def set_text(self, text):
        self.children = []
        if text:
            self.append_child(TextNode(text))

    def inner_html(self):
        return "".join(_serialize(c) for c in self.children)

    def set_inner_html(self, html):
        self.children = []
        for node in parse_html_fragment(html, self.doc):
            self.append_child(node)

    # ---- selectors ----------------------------------------------------------
    def query_all(self, selector):
        groups = _parse_selector(selector)
        out = []
        for el in self.iter():
            if _matches_groups(el, groups, scope=self):
                out.append(el)
        return out

    def query(self, selector):
        found = self.query_all(selector)
        return found[0] if found else None

    def closest(self, selector):
        groups = _parse_selector(selector)
        for el in self.ancestors():
            if isinstance(el, Element) and \
                    _matches_groups(el, groups, scope=None):
                return el
        return None

    # ---- events ------------------------------------------------------------
    def add_listener(self, etype, fn):
        self.listeners.setdefault(etype, []).append(fn)

    def remove_listener(self, etype, fn):
        if etype in self.listeners and fn in self.listeners[etype]:
            self.listeners[etype].remove(fn)

    # ---- JS surface -----------------------------------------------------------
    def js_get(self, interp, prop):
        el = self
        if prop == "tagName":
            return el.tag.upper()
        if prop == "id":
            return el.attrs.get("id", "")
        if prop == "className":
            return el.attrs.get("class", "")
        if prop == "classList":
            return el.classList
        if prop == "style":
            # seed the style object from the inline style attribute once
            # (browsers expose style="display:none" via el.style.display)
            if not el.style.props and el.attrs.get("style"):
                for part in el.attrs["style"].split(";"):
                    if ":" in part:
                        k, v = part.split(":", 1)
                        k = re.sub(r"-([a-z])",
                                   lambda m: m.group(1).upper(), k.strip())
                        el.style.props[k] = v.strip()
            return el.style
        if prop == "dataset":
            return el.dataset
        if prop == "innerHTML":
            return el.inner_html()
        if prop == "outerHTML":
            return _serialize(el)
        if prop == "textContent":
            return el.get_text()
        if prop == "value":
            if el._value is not None:
                return el._value
            if el.tag == "select":
                opts = [c for c in el.iter() if c.tag == "option"]
                for o in opts:
                    if "selected" in o.attrs:
                        return o.attrs.get("value", o.get_text())
                return (opts[0].attrs.get("value", opts[0].get_text())
                        if opts else "")
            if el.tag == "textarea":
                return el.get_text()
            return el.attrs.get("value", "")
        if prop == "checked":
            return el._checked or "checked" in el.attrs and \
                el._checked is not False
        if prop == "disabled":
            return js_truthy(el.props.get("__disabled__",
                                          "disabled" in el.attrs))
        if prop == "files":
            return el._files
        if prop == "options":
            return JSArray([c for c in el.iter() if c.tag == "option"])
        if prop == "selectedIndex":
            opts = [c for c in el.iter() if c.tag == "option"]
            val = el._value
            for i, o in enumerate(opts):
                if o.attrs.get("value", o.get_text()) == val:
                    return float(i)
            return 0.0 if opts else -1.0
        if prop == "parentNode" or prop == "parentElement":
            return el.parent if el.parent is not None else None
        if prop == "children":
            return JSArray([c for c in el.children
                            if isinstance(c, Element)])
        if prop == "firstChild":
            return el.children[0] if el.children else None
        if prop == "nextElementSibling":
            if el.parent is None:
                return None
            sibs = [c for c in el.parent.children
                    if isinstance(c, Element)]
            i = sibs.index(el)
            return sibs[i + 1] if i + 1 < len(sibs) else None
        if prop == "nodeType":
            return 1.0
        if prop in ("offsetTop", "scrollTop", "scrollHeight",
                    "offsetHeight", "clientHeight"):
            return el.props.get(prop, 0.0)

        def nat(fn, name=prop):
            return NativeFunction(fn, name)
        if prop == "querySelector":
            return nat(lambda i, t, a:
                       el.query(js_str(a[0])) or None)
        if prop == "querySelectorAll":
            return nat(lambda i, t, a: JSArray(el.query_all(js_str(a[0]))))
        if prop == "closest":
            return nat(lambda i, t, a: el.closest(js_str(a[0])) or None)
        if prop == "appendChild":
            return nat(lambda i, t, a: (el.append_child(a[0]), a[0])[1])
        if prop == "append":
            def _append(i, t, a):
                for x in a:
                    el.append_child(x if isinstance(x, Node)
                                    else TextNode(js_str(x)))
                return UNDEF
            return nat(_append)
        if prop == "insertBefore":
            def _ib(i, t, a):
                new, ref = a[0], a[1] if len(a) > 1 else None
                if ref is None or ref is UNDEF:
                    el.append_child(new)
                else:
                    el.append_child(new)
                    el.children.remove(new)
                    el.children.insert(el.children.index(ref), new)
                return new
            return nat(_ib)
        if prop == "removeChild":
            return nat(lambda i, t, a: (a[0].remove_self(), a[0])[1])
        if prop == "remove":
            return nat(lambda i, t, a: (el.remove_self(), UNDEF)[1])
        if prop == "replaceChildren":
            def _rc(i, t, a):
                el.children = []
                for x in a:
                    el.append_child(x)
                return UNDEF
            return nat(_rc)
        if prop == "getAttribute":
            return nat(lambda i, t, a: el.attrs.get(js_str(a[0]), None))
        if prop == "setAttribute":
            return nat(lambda i, t, a: (el.attrs.__setitem__(
                js_str(a[0]), js_str(a[1])), UNDEF)[1])
        if prop == "removeAttribute":
            return nat(lambda i, t, a: (el.attrs.pop(js_str(a[0]), None),
                                        UNDEF)[1])
        if prop == "hasAttribute":
            return nat(lambda i, t, a: js_str(a[0]) in el.attrs)
        if prop == "addEventListener":
            return nat(lambda i, t, a: (el.add_listener(js_str(a[0]),
                                                        a[1]), UNDEF)[1])
        if prop == "removeEventListener":
            return nat(lambda i, t, a: (el.remove_listener(js_str(a[0]),
                                                           a[1]), UNDEF)[1])
        if prop == "dispatchEvent":
            return nat(lambda i, t, a: (dispatch_event(
                i, el, js_str(get_member_safe(a[0], "type")), a[0]),
                True)[1])
        if prop == "click":
            return nat(lambda i, t, a: (dispatch_event(i, el, "click"),
                                        UNDEF)[1])
        if prop == "focus" or prop == "blur" or prop == "select":
            return nat(lambda i, t, a: UNDEF)
        if prop == "scrollIntoView":
            return nat(lambda i, t, a: UNDEF)
        if prop == "getBoundingClientRect":
            return nat(lambda i, t, a: JSObject(
                {"top": 0.0, "left": 0.0, "bottom": 10.0, "right": 10.0,
                 "width": 10.0, "height": 10.0}))
        if prop == "contains":
            return nat(lambda i, t, a: isinstance(a[0], Element)
                       and el in list(a[0].ancestors()))
        return NotImplemented

    def js_set(self, interp, prop, value):
        if prop == "innerHTML":
            self.set_inner_html(js_str(value))
            return True
        if prop == "textContent":
            self.set_text(js_str(value) if value is not UNDEF
                          and value is not None else "")
            return True
        if prop == "value":
            self._value = js_str(value)
            return True
        if prop == "checked":
            self._checked = js_truthy(value)
            return True
        if prop == "disabled":
            self.props["__disabled__"] = js_truthy(value)
            return True
        if prop == "id":
            self.attrs["id"] = js_str(value)
            return True
        if prop == "className":
            self.attrs["class"] = js_str(value)
            return True
        if prop in ("scrollTop", "scrollLeft"):
            self.props[prop] = value
            return True
        if _ON_PROP.match(prop):
            self.props[prop] = value
            return True
        return False


def get_member_safe(obj, prop):
    if isinstance(obj, JSObject):
        return obj.props.get(prop, UNDEF)
    return UNDEF


def _serialize(node):
    if isinstance(node, TextNode):
        return escape(node.text, quote=False)
    attrs = "".join(
        f' {k}' if v == "" and k in ("selected", "checked", "disabled",
                                     "multiple", "required")
        else f' {k}="{escape(str(v))}"'
        for k, v in node.attrs.items())
    if node.tag in VOID_ELEMENTS:
        return f"<{node.tag}{attrs}>"
    return f"<{node.tag}{attrs}>{node.inner_html()}</{node.tag}>"


# ---------------------------------------------------------------------------
# HTML parsing
# ---------------------------------------------------------------------------

class _FragmentParser(HTMLParser):
    def __init__(self, doc):
        super().__init__(convert_charrefs=True)
        self.doc = doc
        self.root = Element("#fragment", doc)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, self.doc)
        for k, v in attrs:
            el.attrs[k] = v if v is not None else ""
        self.stack[-1].append_child(el)
        if tag.lower() not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, self.doc)
        for k, v in attrs:
            el.attrs[k] = v if v is not None else ""
        self.stack[-1].append_child(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag.lower():
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].append_child(TextNode(data))


def parse_html_fragment(html, doc):
    p = _FragmentParser(doc)
    p.feed(html or "")
    p.close()
    children = list(p.root.children)
    for c in children:
        c.parent = None
    return children


# ---------------------------------------------------------------------------
# selectors: "#id", ".cls", "tag", "[attr]", '[attr="v"]', compounds,
# descendant combinator, comma groups
# ---------------------------------------------------------------------------

_SEL_PART = re.compile(
    r"([a-zA-Z][\w-]*)?((?:[#.][\w-]+|\[[^\]]+\])*)$")
_SEL_TOKEN = re.compile(r"[#.][\w-]+|\[[^\]]+\]")


def _parse_compound(part):
    m = _SEL_PART.match(part)
    if not m:
        raise _Throw(f"SyntaxError: unsupported selector '{part}'")
    tag = (m.group(1) or "").lower() or None
    conds = []
    for tok in _SEL_TOKEN.findall(m.group(2) or ""):
        if tok.startswith("#"):
            conds.append(("id", tok[1:]))
        elif tok.startswith("."):
            conds.append(("class", tok[1:]))
        else:
            inner = tok[1:-1]
            if "=" in inner:
                k, v = inner.split("=", 1)
                conds.append(("attr_eq", k.strip(),
                              v.strip().strip("'\"")))
            else:
                conds.append(("attr", inner.strip()))
    return (tag, conds)


def _parse_selector(selector):
    groups = []
    for group in selector.split(","):
        chain = [_parse_compound(p) for p in group.split() if p]
        if chain:
            groups.append(chain)
    if not groups:
        raise _Throw(f"SyntaxError: empty selector '{selector}'")
    return groups


def _match_compound(el, compound):
    tag, conds = compound
    if tag is not None and el.tag != tag:
        return False
    for cond in conds:
        if cond[0] == "id":
            if el.attrs.get("id") != cond[1]:
                return False
        elif cond[0] == "class":
            if cond[1] not in el.attrs.get("class", "").split():
                return False
        elif cond[0] == "attr":
            if cond[1] not in el.attrs:
                return False
        elif cond[0] == "attr_eq":
            if el.attrs.get(cond[1]) != cond[2]:
                return False
    return True


def _matches_groups(el, groups, scope=None):
    for chain in groups:
        if _match_chain(el, chain, scope):
            return True
    return False


def _match_chain(el, chain, scope):
    if not _match_compound(el, chain[-1]):
        return False
    rest = chain[:-1]
    node = el.parent
    for compound in reversed(rest):
        found = False
        while node is not None and node is not scope:
            if isinstance(node, Element) and _match_compound(node,
                                                             compound):
                found = True
                node = node.parent
                break
            node = node.parent
        if not found:
            return False
    return True


# ---------------------------------------------------------------------------
# events
# ---------------------------------------------------------------------------

def make_event(interp, etype, target, extra=None):
    ev = JSObject({
        "type": etype,
        "target": target,
        "currentTarget": target,
        "defaultPrevented": False,
        "key": "",
        "bubbles": True,
    })
    ev.props["preventDefault"] = NativeFunction(
        lambda i, t, a: (ev.props.__setitem__("defaultPrevented", True),
                         UNDEF)[1], "preventDefault")
    stopped = {"v": False}
    ev.props["stopPropagation"] = NativeFunction(
        lambda i, t, a: (stopped.__setitem__("v", True), UNDEF)[1],
        "stopPropagation")
    ev._stopped = stopped
    for k, v in (extra or {}).items():
        ev.props[k] = v
    return ev


def dispatch_event(interp, target, etype, event=None, extra=None):
    ev = event if isinstance(event, JSObject) and hasattr(event, "_stopped") \
        else make_event(interp, etype, target, extra)
    ev.props["target"] = target
    path = list(target.ancestors()) if isinstance(target, Element) else \
        [target]
    doc = getattr(target, "doc", None)
    if doc is not None and doc not in path:
        path.append(doc)
    win = getattr(doc, "window", None) if doc is not None else None
    if win is not None:
        path.append(win)
    for node in path:
        if ev._stopped["v"]:
            break
        ev.props["currentTarget"] = node
        handler = None
        if isinstance(node, JSObject):
            handler = node.props.get("on" + etype)
        if handler is not None and handler is not UNDEF:
            interp.call_function(handler, [ev], node)
        if ev._stopped["v"]:
            break
        listeners = getattr(node, "listeners", None)
        if listeners:
            for fn in list(listeners.get(etype, [])):
                interp.call_function(fn, [ev], node)
                if ev._stopped["v"]:
                    break
    return ev


class Document(Element):
    def __init__(self):
        super().__init__("#document")
        self.doc = self
        self.window = None
        self.body = Element("body", self)
        self.head = Element("head", self)
        html = Element("html", self)
        html.append_child(self.head)
        html.append_child(self.body)
        self.append_child(html)

    def js_get(self, interp, prop):
        if prop == "body":
            return self.body
        if prop == "head":
            return self.head
        if prop == "documentElement":
            return self.children[0]
        if prop == "title":
            return self.props.get("title", "")
        if prop == "getElementById":
            return NativeFunction(
                lambda i, t, a: next(
                    (el for el in self.iter()
                     if el.attrs.get("id") == js_str(a[0])), None),
                "getElementById")
        if prop == "createElement":
            return NativeFunction(
                lambda i, t, a: Element(js_str(a[0]), self),
                "createElement")
        if prop == "createTextNode":
            return NativeFunction(
                lambda i, t, a: TextNode(js_str(a[0])), "createTextNode")
        out = super().js_get(interp, prop)
        return out

    def js_set(self, interp, prop, value):
        if prop == "title":
            self.props["title"] = js_str(value)
            return True
        return super().js_set(interp, prop, value)
