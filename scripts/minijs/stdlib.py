"""minijs stdlib: member dispatch per value type + global builtins.

Covers the String/Array/Object/Math/JSON/Date/Map/Set/RegExp/Promise
surface the frontend uses; DOM/browser globals live in dom.py and
harness.py."""

from __future__ import annotations

import json as _json
import math
import time as _time
import urllib.parse

from scripts.minijs.interp import (
    UNDEF, BoundMethod, JSArray, JSFunction, JSObject, JSPromise,
    JSRegExp, NativeFunction, _Throw, from_js, js_num, js_str, js_truthy,
    strict_eq, to_js,
)


class JSMap:
    def __init__(self, pairs=None):
        self._d = {}
        for k, v in (pairs or []):
            self._d[_map_key(k)] = (k, v)

    def entries(self):
        return [(k, v) for k, v in self._d.values()]


class JSSet:
    def __init__(self, items=None):
        self._d = {}
        for it in (items or []):
            self._d[_map_key(it)] = it

    def items(self):
        return list(self._d.values())


class JSDate:
    def __init__(self, ms):
        self.ms = ms


def _map_key(k):
    if isinstance(k, float) and k == int(k):
        return ("n", int(k))
    if isinstance(k, (str, bool, float, int)) or k is None or k is UNDEF:
        return ("p", k)
    return ("o", id(k))


def _nat(name):
    def deco(fn):
        return NativeFunction(fn, name)
    return deco


def _method(fn, receiver, name):
    return BoundMethod(fn, receiver, name)


def _arg(args, i, default=UNDEF):
    return args[i] if i < len(args) else default


# ---------------------------------------------------------------------------
# string methods
# ---------------------------------------------------------------------------

def _str_replace(interp, s, args):
    pat, repl = _arg(args, 0), _arg(args, 1)

    def do_repl(match):
        if isinstance(repl, (JSFunction, NativeFunction)):
            call_args = [match.group(0)]
            call_args += [g if g is not None else UNDEF
                          for g in match.groups()]
            call_args.append(float(match.start()))
            call_args.append(s)
            return js_str(interp.call_function(repl, call_args))
        text = js_str(repl)
        out = []
        i = 0
        while i < len(text):
            if text[i] == "$" and i + 1 < len(text):
                nxt = text[i + 1]
                if nxt == "$":
                    out.append("$")
                    i += 2
                    continue
                if nxt == "&":
                    out.append(match.group(0))
                    i += 2
                    continue
                if nxt.isdigit():
                    j = i + 1
                    if j + 1 < len(text) and text[j + 1].isdigit() and \
                            int(text[i + 1:i + 3]) <= len(match.groups()):
                        j += 1
                    idx = int(text[i + 1:j + 1])
                    if 1 <= idx <= len(match.groups()):
                        out.append(match.group(idx) or "")
                        i = j + 1
                        continue
            out.append(text[i])
            i += 1
        return "".join(out)

    if isinstance(pat, JSRegExp):
        count = 0 if pat.global_ else 1
        return pat.re.sub(do_repl, s, count=count)
    needle = js_str(pat)
    if isinstance(repl, (JSFunction, NativeFunction)):
        idx = s.find(needle)
        if idx < 0:
            return s
        rep = js_str(interp.call_function(
            repl, [needle, float(idx), s]))
        return s[:idx] + rep + s[idx + len(needle):]
    return s.replace(needle, js_str(repl).replace("$&", needle), 1)


def _str_match(interp, s, args):
    pat = _arg(args, 0)
    if not isinstance(pat, JSRegExp):
        pat = JSRegExp(js_str(pat), "")
    if pat.global_:
        found = pat.re.findall(s)
        if not found:
            return None
        return JSArray([f if isinstance(f, str) else f[0] for f in found])
    m = pat.re.search(s)
    if not m:
        return None
    arr = JSArray([m.group(0)] + [g if g is not None else UNDEF
                                  for g in m.groups()])
    return arr


def _str_split(interp, s, args):
    sep = _arg(args, 0)
    if sep is UNDEF:
        return JSArray([s])
    if isinstance(sep, JSRegExp):
        return JSArray(sep.re.split(s))
    sep = js_str(sep)
    if sep == "":
        return JSArray(list(s))
    return JSArray(s.split(sep))


_STRING_METHODS = {
    "includes": lambda i, s, a: js_str(_arg(a, 0)) in s,
    "startsWith": lambda i, s, a: s.startswith(js_str(_arg(a, 0))),
    "endsWith": lambda i, s, a: s.endswith(js_str(_arg(a, 0))),
    "indexOf": lambda i, s, a: float(s.find(js_str(_arg(a, 0)))),
    "lastIndexOf": lambda i, s, a: float(s.rfind(js_str(_arg(a, 0)))),
    "slice": lambda i, s, a: _slice(s, a),
    "substring": lambda i, s, a: _substring(s, a),
    "toLowerCase": lambda i, s, a: s.lower(),
    "toUpperCase": lambda i, s, a: s.upper(),
    "trim": lambda i, s, a: s.strip(),
    "trimStart": lambda i, s, a: s.lstrip(),
    "trimEnd": lambda i, s, a: s.rstrip(),
    "split": _str_split,
    "replace": _str_replace,
    "replaceAll": lambda i, s, a: s.replace(js_str(_arg(a, 0)),
                                            js_str(_arg(a, 1))),
    "match": _str_match,
    "padStart": lambda i, s, a: s.rjust(int(js_num(_arg(a, 0))),
                                        js_str(_arg(a, 1, " "))[:1] or " "),
    "padEnd": lambda i, s, a: s.ljust(int(js_num(_arg(a, 0))),
                                      js_str(_arg(a, 1, " "))[:1] or " "),
    "repeat": lambda i, s, a: s * int(js_num(_arg(a, 0))),
    "charAt": lambda i, s, a: s[int(js_num(_arg(a, 0, 0.0)))]
    if 0 <= int(js_num(_arg(a, 0, 0.0))) < len(s) else "",
    "charCodeAt": lambda i, s, a: float(ord(s[int(js_num(_arg(a, 0, 0.0)))]))
    if 0 <= int(js_num(_arg(a, 0, 0.0))) < len(s) else float("nan"),
    "concat": lambda i, s, a: s + "".join(js_str(x) for x in a),
    "localeCompare": lambda i, s, a: float(
        (s > js_str(_arg(a, 0))) - (s < js_str(_arg(a, 0)))),
    "toString": lambda i, s, a: s,
}


def _slice(seq, args):
    n = len(seq)
    start = _arg(args, 0, 0.0)
    start = 0 if start is UNDEF else int(js_num(start))
    end = _arg(args, 1)
    end = n if end is UNDEF else int(js_num(end))
    if start < 0:
        start = max(0, n + start)
    if end < 0:
        end = max(0, n + end)
    out = seq[start:end]
    return out if isinstance(seq, str) else JSArray(list(out))


def _substring(s, args):
    a = int(js_num(_arg(args, 0, 0.0)))
    b = _arg(args, 1)
    b = len(s) if b is UNDEF else int(js_num(b))
    a, b = max(0, min(a, len(s))), max(0, min(b, len(s)))
    if a > b:
        a, b = b, a
    return s[a:b]


# ---------------------------------------------------------------------------
# array methods
# ---------------------------------------------------------------------------

def _arr_sort(interp, arr, args):
    cmp = _arg(args, 0)
    if cmp is UNDEF:
        arr.items.sort(key=js_str)
    else:
        import functools

        def pycmp(a, b):
            r = js_num(interp.call_function(cmp, [a, b]))
            return -1 if r < 0 else (1 if r > 0 else 0)
        arr.items.sort(key=functools.cmp_to_key(pycmp))
    return arr


def _arr_splice(interp, arr, args):
    start = int(js_num(_arg(args, 0, 0.0)))
    if start < 0:
        start = max(0, len(arr.items) + start)
    count = _arg(args, 1)
    count = len(arr.items) - start if count is UNDEF else int(js_num(count))
    removed = arr.items[start:start + count]
    arr.items[start:start + count] = list(args[2:])
    return JSArray(removed)


def _arr_reduce(interp, arr, args):
    fn = _arg(args, 0)
    items = list(arr.items)
    if len(args) >= 2:
        acc = args[1]
        start = 0
    else:
        if not items:
            raise _Throw("TypeError: reduce of empty array")
        acc = items[0]
        start = 1
    for i in range(start, len(items)):
        acc = interp.call_function(fn, [acc, items[i], float(i), arr])
    return acc


_ARRAY_METHODS = {
    "push": lambda i, r, a: (r.items.extend(a),
                             float(len(r.items)))[1],
    "pop": lambda i, r, a: r.items.pop() if r.items else UNDEF,
    "shift": lambda i, r, a: r.items.pop(0) if r.items else UNDEF,
    "unshift": lambda i, r, a: (r.items.__setitem__(
        slice(0, 0), list(a)), float(len(r.items)))[1],
    "map": lambda i, r, a: JSArray([
        i.call_function(a[0], [x, float(k), r])
        for k, x in enumerate(list(r.items))]),
    "filter": lambda i, r, a: JSArray([
        x for k, x in enumerate(list(r.items))
        if js_truthy(i.call_function(a[0], [x, float(k), r]))]),
    "forEach": lambda i, r, a: ([
        i.call_function(a[0], [x, float(k), r])
        for k, x in enumerate(list(r.items))], UNDEF)[1],
    "find": lambda i, r, a: next(
        (x for k, x in enumerate(list(r.items))
         if js_truthy(i.call_function(a[0], [x, float(k), r]))), UNDEF),
    "findIndex": lambda i, r, a: float(next(
        (k for k, x in enumerate(list(r.items))
         if js_truthy(i.call_function(a[0], [x, float(k), r]))), -1)),
    "some": lambda i, r, a: any(
        js_truthy(i.call_function(a[0], [x, float(k), r]))
        for k, x in enumerate(list(r.items))),
    "every": lambda i, r, a: all(
        js_truthy(i.call_function(a[0], [x, float(k), r]))
        for k, x in enumerate(list(r.items))),
    "includes": lambda i, r, a: any(
        strict_eq(x, _arg(a, 0)) for x in r.items),
    "indexOf": lambda i, r, a: float(next(
        (k for k, x in enumerate(r.items)
         if strict_eq(x, _arg(a, 0))), -1)),
    "join": lambda i, r, a: js_str(_arg(a, 0, ",")).join(
        "" if x is UNDEF or x is None else js_str(x) for x in r.items),
    "slice": lambda i, r, a: _slice(r.items, a),
    "splice": _arr_splice,
    "concat": lambda i, r, a: JSArray(
        list(r.items) + [y for x in a for y in
                         (x.items if isinstance(x, JSArray) else [x])]),
    "reverse": lambda i, r, a: (r.items.reverse(), r)[1],
    "sort": _arr_sort,
    "reduce": _arr_reduce,
    "flat": lambda i, r, a: JSArray(
        [y for x in r.items for y in
         (x.items if isinstance(x, JSArray) else [x])]),
    "keys": lambda i, r, a: JSArray(
        [float(k) for k in range(len(r.items))]),
    "fill": lambda i, r, a: (r.items.__setitem__(
        slice(None), [_arg(a, 0)] * len(r.items)), r)[1],
}


# ---------------------------------------------------------------------------
# member dispatch
# ---------------------------------------------------------------------------

def get_member(interp, obj, prop):
    if obj is UNDEF or obj is None:
        raise _Throw(
            f"TypeError: cannot read properties of {js_str(obj)} "
            f"(reading '{prop}')")
    if isinstance(obj, str):
        if prop == "length":
            return float(len(obj))
        if prop.lstrip("-").isdigit():
            i = int(prop)
            return obj[i] if 0 <= i < len(obj) else UNDEF
        fn = _STRING_METHODS.get(prop)
        if fn:
            return _method(fn, obj, prop)
        return UNDEF
    if isinstance(obj, (int, float, bool)):
        if prop == "toFixed":
            return _method(
                lambda i, r, a: f"{float(r):.{int(js_num(_arg(a, 0, 0.0)))}f}",
                obj, prop)
        if prop == "toString":
            return _method(lambda i, r, a: js_str(r), obj, prop)
        if prop == "toLocaleString":
            return _method(lambda i, r, a: f"{float(r):,.0f}", obj, prop)
        return UNDEF
    if isinstance(obj, JSArray):
        if prop == "length":
            return float(len(obj.items))
        if prop.lstrip("-").isdigit():
            i = int(prop)
            return obj.items[i] if 0 <= i < len(obj.items) else UNDEF
        fn = _ARRAY_METHODS.get(prop)
        if fn:
            return _method(fn, obj, prop)
        return UNDEF
    if isinstance(obj, JSMap):
        return _map_member(obj, prop)
    if isinstance(obj, JSSet):
        return _set_member(obj, prop)
    if isinstance(obj, JSRegExp):
        if prop == "test":
            return _method(
                lambda i, r, a: r.re.search(js_str(_arg(a, 0))) is not None,
                obj, prop)
        if prop == "exec":
            return _method(_regex_exec, obj, prop)
        if prop == "source":
            return obj.source
        return UNDEF
    if isinstance(obj, JSPromise):
        if prop == "then":
            return _method(_promise_then, obj, prop)
        if prop == "catch":
            return _method(
                lambda i, r, a: _promise_then(i, r, [UNDEF, _arg(a, 0)]),
                obj, prop)
        if prop == "finally":
            return _method(_promise_finally, obj, prop)
        return UNDEF
    if isinstance(obj, JSDate):
        return _date_member(obj, prop)
    if isinstance(obj, (JSFunction, NativeFunction)):
        if prop == "call":
            return _method(
                lambda i, r, a: i.call_function(r, a[1:], _arg(a, 0)),
                obj, prop)
        if prop == "apply":
            return _method(
                lambda i, r, a: i.call_function(
                    r, list(_arg(a, 1, JSArray()).items), _arg(a, 0)),
                obj, prop)
        if prop == "bind":
            def _bind(i, r, a):
                bound_this = _arg(a, 0)
                pre = a[1:]
                return NativeFunction(
                    lambda i2, t2, a2: i2.call_function(
                        r, pre + a2, bound_this),
                    f"bound {getattr(r, 'name', '')}")
            return _method(_bind, obj, prop)
        if prop == "name":
            return getattr(obj, "name", "") or ""
        return obj.props.get(prop, UNDEF)
    if isinstance(obj, JSObject):
        # host objects (DOM nodes etc.) override js_get
        getter = getattr(obj, "js_get", None)
        if getter is not None:
            out = getter(interp, prop)
            if out is not NotImplemented:
                return out
        if prop == "hasOwnProperty":
            return _method(
                lambda i, r, a: js_str(_arg(a, 0)) in r.props, obj, prop)
        if prop == "toString":
            return _method(lambda i, r, a: js_str(r), obj, prop)
        return obj.props.get(prop, UNDEF)
    raise _Throw(f"TypeError: cannot read '{prop}' of {obj!r}")


def set_member(interp, obj, prop, value):
    if isinstance(obj, JSArray):
        if prop == "length":
            n = int(js_num(value))
            del obj.items[n:]
            while len(obj.items) < n:
                obj.items.append(UNDEF)
            return
        if prop.lstrip("-").isdigit():
            i = int(prop)
            while len(obj.items) <= i:
                obj.items.append(UNDEF)
            obj.items[i] = value
            return
        return
    if isinstance(obj, JSObject):
        setter = getattr(obj, "js_set", None)
        if setter is not None and setter(interp, prop, value):
            return
        obj.props[prop] = value
        return
    if isinstance(obj, (JSFunction, NativeFunction)):
        obj.props[prop] = value
        return
    if isinstance(obj, JSRegExp):
        if prop == "lastIndex":
            obj.last_index = int(js_num(value))
        return
    raise _Throw(f"TypeError: cannot set '{prop}' on {js_str(obj)[:30]}")


def _regex_exec(interp, rx, args):
    s = js_str(_arg(args, 0))
    pos = rx.last_index if rx.global_ else 0
    m = rx.re.search(s, pos)
    if not m:
        rx.last_index = 0
        return None
    if rx.global_:
        rx.last_index = m.end()
    return JSArray([m.group(0)] + [g if g is not None else UNDEF
                                   for g in m.groups()])


def _promise_then(interp, promise, args):
    on_ok_fn, on_err_fn = _arg(args, 0), _arg(args, 1)

    def wrap(fn):
        if fn is UNDEF or fn is None:
            return None
        return lambda v: interp.call_function(fn, [v])
    return promise.then_native(wrap(on_ok_fn), wrap(on_err_fn))


def _promise_finally(interp, promise, args):
    fn = _arg(args, 0)

    def on_ok(v):
        interp.call_function(fn, [])
        return v

    def on_err(e):
        interp.call_function(fn, [])
        raise _Throw(e)
    return promise.then_native(on_ok, on_err)


def _map_member(m, prop):
    if prop == "size":
        return float(len(m._d))
    table = {
        "get": lambda i, r, a: r._d.get(_map_key(_arg(a, 0)),
                                        (None, UNDEF))[1],
        "set": lambda i, r, a: (r._d.__setitem__(
            _map_key(_arg(a, 0)), (_arg(a, 0), _arg(a, 1))), r)[1],
        "has": lambda i, r, a: _map_key(_arg(a, 0)) in r._d,
        "delete": lambda i, r, a: r._d.pop(_map_key(_arg(a, 0)),
                                           None) is not None,
        "clear": lambda i, r, a: (r._d.clear(), UNDEF)[1],
        "forEach": lambda i, r, a: ([i.call_function(a[0], [v, k, r])
                                     for k, v in r.entries()], UNDEF)[1],
        "keys": lambda i, r, a: JSArray([k for k, _ in r.entries()]),
        "values": lambda i, r, a: JSArray([v for _, v in r.entries()]),
        "entries": lambda i, r, a: JSArray(
            [JSArray([k, v]) for k, v in r.entries()]),
    }
    fn = table.get(prop)
    return _method(fn, m, prop) if fn else UNDEF


def _set_member(s, prop):
    if prop == "size":
        return float(len(s._d))
    table = {
        "add": lambda i, r, a: (r._d.__setitem__(
            _map_key(_arg(a, 0)), _arg(a, 0)), r)[1],
        "has": lambda i, r, a: _map_key(_arg(a, 0)) in r._d,
        "delete": lambda i, r, a: r._d.pop(_map_key(_arg(a, 0)),
                                           None) is not None,
        "clear": lambda i, r, a: (r._d.clear(), UNDEF)[1],
        "forEach": lambda i, r, a: ([i.call_function(a[0], [v, v, r])
                                     for v in r.items()], UNDEF)[1],
    }
    fn = table.get(prop)
    return _method(fn, s, prop) if fn else UNDEF


def _date_member(d, prop):
    table = {
        "getTime": lambda i, r, a: r.ms,
        "toISOString": lambda i, r, a: _time.strftime(
            "%Y-%m-%dT%H:%M:%S", _time.gmtime(r.ms / 1000.0))
        + f".{int(r.ms % 1000):03d}Z",
        "toLocaleString": lambda i, r, a: _time.strftime(
            "%Y-%m-%d %H:%M:%S", _time.localtime(r.ms / 1000.0)),
        "toLocaleDateString": lambda i, r, a: _time.strftime(
            "%Y-%m-%d", _time.localtime(r.ms / 1000.0)),
        "toLocaleTimeString": lambda i, r, a: _time.strftime(
            "%H:%M:%S", _time.localtime(r.ms / 1000.0)),
        "getFullYear": lambda i, r, a: float(
            _time.localtime(r.ms / 1000.0).tm_year),
    }
    fn = table.get(prop)
    return _method(fn, d, prop) if fn else UNDEF


# ---------------------------------------------------------------------------
# constructors (new X(...))
# ---------------------------------------------------------------------------

def construct(interp, ctor, args):
    if isinstance(ctor, NativeFunction):
        maker = ctor.props.get("__construct__")
        if maker is not None:
            return maker(interp, args)
        return ctor.fn(interp, UNDEF, args)
    if isinstance(ctor, JSFunction):
        this = JSObject()
        out = interp.call_function(ctor, args, this)
        return out if isinstance(out, JSObject) else this
    raise _Throw(f"TypeError: {js_str(ctor)} is not a constructor")


def instance_of(value, ctor):
    name = getattr(ctor, "name", "")
    if name == "Error":
        return isinstance(value, JSObject) and "message" in value.props \
            and "stack" in value.props
    if name == "Array":
        return isinstance(value, JSArray)
    if name == "Promise":
        return isinstance(value, JSPromise)
    if name == "Map":
        return isinstance(value, JSMap)
    if name == "Set":
        return isinstance(value, JSSet)
    if name == "Date":
        return isinstance(value, JSDate)
    return False


def make_error(message, name="Error"):
    return JSObject({"name": name, "message": message,
                     "stack": f"{name}: {message}"})


# ---------------------------------------------------------------------------
# globals
# ---------------------------------------------------------------------------

def _json_stringify(interp, this, args):
    value = from_js(_arg(args, 0))
    indent = _arg(args, 2)
    kw = {}
    if indent is not UNDEF and indent is not None:
        kw["indent"] = int(js_num(indent))
    try:
        return _json.dumps(value, ensure_ascii=False, **kw)
    except (TypeError, ValueError):
        return UNDEF


def _json_parse(interp, this, args):
    try:
        return to_js(_json.loads(js_str(_arg(args, 0))), interp)
    except (ValueError, TypeError) as e:
        raise _Throw(make_error(f"JSON parse error: {e}", "SyntaxError"))


def install(interp):
    g = interp.global_env

    def nat(name, fn):
        g.declare(name, NativeFunction(fn, name))

    # ---- primitives ----------------------------------------------------
    nat("parseInt", lambda i, t, a: _parse_int(a))
    nat("parseFloat", lambda i, t, a: _parse_float(a))
    nat("isNaN", lambda i, t, a: math.isnan(js_num(_arg(a, 0))))
    nat("isFinite", lambda i, t, a: math.isfinite(js_num(_arg(a, 0))))
    nat("encodeURIComponent", lambda i, t, a: urllib.parse.quote(
        js_str(_arg(a, 0)), safe="!'()*-._~"))
    nat("decodeURIComponent", lambda i, t, a: urllib.parse.unquote(
        js_str(_arg(a, 0))))
    nat("String", lambda i, t, a: js_str(_arg(a, 0, "")))
    nat("Number", lambda i, t, a: js_num(_arg(a, 0, 0.0)))
    nat("Boolean", lambda i, t, a: js_truthy(_arg(a, 0)))
    g.declare("NaN", float("nan"))
    g.declare("Infinity", float("inf"))
    g.declare("undefined", UNDEF)

    # ---- Object / Array -------------------------------------------------
    obj_ns = NativeFunction(lambda i, t, a: JSObject(), "Object")
    obj_ns.props.update({
        "keys": NativeFunction(lambda i, t, a: JSArray(
            list(_arg(a, 0).props.keys())
            if isinstance(_arg(a, 0), JSObject) else []), "keys"),
        "values": NativeFunction(lambda i, t, a: JSArray(
            list(_arg(a, 0).props.values())
            if isinstance(_arg(a, 0), JSObject) else []), "values"),
        "entries": NativeFunction(lambda i, t, a: JSArray(
            [JSArray([k, v]) for k, v in _arg(a, 0).props.items()]
            if isinstance(_arg(a, 0), JSObject) else []), "entries"),
        "assign": NativeFunction(_object_assign, "assign"),
        "fromEntries": NativeFunction(lambda i, t, a: JSObject({
            js_str(p.items[0]): p.items[1]
            for p in _arg(a, 0, JSArray()).items}), "fromEntries"),
    })
    g.declare("Object", obj_ns)

    arr_ns = NativeFunction(
        lambda i, t, a: JSArray([UNDEF] * int(js_num(a[0])))
        if len(a) == 1 and isinstance(a[0], float) else JSArray(a),
        "Array")
    def _proto_slice(i, this, a):
        # Array.prototype.slice.call(arrayLike) — the classic NodeList
        # -> Array idiom the docs pages' inline scripts use
        if isinstance(this, JSArray):
            seq = this.items
        elif isinstance(this, str):
            seq = list(this)
        else:
            seq = list(getattr(this, "items", []) or [])
        return _slice(list(seq), a)

    arr_ns.props.update({
        "isArray": NativeFunction(
            lambda i, t, a: isinstance(_arg(a, 0), JSArray), "isArray"),
        "from": NativeFunction(_array_from, "from"),
        "prototype": JSObject({
            "slice": NativeFunction(_proto_slice, "slice"),
        }),
    })
    g.declare("Array", arr_ns)

    # ---- Math / JSON / Date ---------------------------------------------
    math_obj = JSObject({
        "min": NativeFunction(lambda i, t, a: min(
            (js_num(x) for x in a), default=float("inf")), "min"),
        "max": NativeFunction(lambda i, t, a: max(
            (js_num(x) for x in a), default=float("-inf")), "max"),
        "round": NativeFunction(lambda i, t, a: float(
            math.floor(js_num(_arg(a, 0)) + 0.5)), "round"),
        "floor": NativeFunction(lambda i, t, a: float(
            math.floor(js_num(_arg(a, 0)))), "floor"),
        "ceil": NativeFunction(lambda i, t, a: float(
            math.ceil(js_num(_arg(a, 0)))), "ceil"),
        "abs": NativeFunction(lambda i, t, a: abs(js_num(_arg(a, 0))),
                              "abs"),
        "random": NativeFunction(lambda i, t, a: _next_random(i),
                                 "random"),
        "pow": NativeFunction(lambda i, t, a: js_num(
            _arg(a, 0)) ** js_num(_arg(a, 1)), "pow"),
        "sqrt": NativeFunction(lambda i, t, a: math.sqrt(
            js_num(_arg(a, 0))), "sqrt"),
        # trig + constants (used by the mermaid SVG renderer's pie arcs)
        "PI": math.pi,
        "sin": NativeFunction(lambda i, t, a: math.sin(
            js_num(_arg(a, 0))), "sin"),
        "cos": NativeFunction(lambda i, t, a: math.cos(
            js_num(_arg(a, 0))), "cos"),
        "tan": NativeFunction(lambda i, t, a: math.tan(
            js_num(_arg(a, 0))), "tan"),
        "atan2": NativeFunction(lambda i, t, a: math.atan2(
            js_num(_arg(a, 0)), js_num(_arg(a, 1))), "atan2"),
        "sign": NativeFunction(lambda i, t, a: float(
            (js_num(_arg(a, 0)) > 0) - (js_num(_arg(a, 0)) < 0)), "sign"),
        "trunc": NativeFunction(lambda i, t, a: float(math.trunc(
            js_num(_arg(a, 0)))), "trunc"),
        "log": NativeFunction(lambda i, t, a: math.log(
            js_num(_arg(a, 0))), "log"),
        "exp": NativeFunction(lambda i, t, a: math.exp(
            js_num(_arg(a, 0))), "exp"),
    })
    g.declare("Math", math_obj)

    json_obj = JSObject({
        "stringify": NativeFunction(_json_stringify, "stringify"),
        "parse": NativeFunction(_json_parse, "parse"),
    })
    g.declare("JSON", json_obj)

    def _date_construct(i, a):
        if a:
            arg0 = a[0]
            if isinstance(arg0, str):
                ms = _parse_date_ms(arg0)
            else:
                ms = js_num(arg0)
            return JSDate(ms)
        return JSDate(i.clock_ms + 1787000000000.0)
    date_ns = NativeFunction(lambda i, t, a: js_str(JSDate(i.clock_ms)),
                             "Date")
    date_ns.props["now"] = NativeFunction(
        lambda i, t, a: i.clock_ms + 1787000000000.0, "now")
    date_ns.props["__construct__"] = _date_construct
    g.declare("Date", date_ns)

    # ---- Error / Promise / Map / Set / RegExp -----------------------------
    err_ns = NativeFunction(
        lambda i, t, a: make_error(js_str(_arg(a, 0, ""))), "Error")
    err_ns.props["__construct__"] = \
        lambda i, a: make_error(js_str(_arg(a, 0, "")))
    g.declare("Error", err_ns)
    g.declare("TypeError", err_ns)

    prom_ns = NativeFunction(lambda i, t, a: UNDEF, "Promise")
    prom_ns.props["__construct__"] = _promise_construct
    prom_ns.props["resolve"] = NativeFunction(
        lambda i, t, a: _resolved(i, _arg(a, 0)), "resolve")
    prom_ns.props["reject"] = NativeFunction(
        lambda i, t, a: _rejected(i, _arg(a, 0)), "reject")
    prom_ns.props["all"] = NativeFunction(_promise_all, "all")
    g.declare("Promise", prom_ns)

    map_ns = NativeFunction(lambda i, t, a: JSMap(), "Map")
    map_ns.props["__construct__"] = lambda i, a: JSMap(
        [(p.items[0], p.items[1]) for p in _arg(a, 0, JSArray()).items]
        if a and isinstance(a[0], JSArray) else [])
    g.declare("Map", map_ns)

    set_ns = NativeFunction(lambda i, t, a: JSSet(), "Set")
    set_ns.props["__construct__"] = lambda i, a: JSSet(
        i._iterate(a[0]) if a and a[0] is not UNDEF and a[0] is not None
        else [])
    g.declare("Set", set_ns)

    regex_ns = NativeFunction(
        lambda i, t, a: JSRegExp(js_str(_arg(a, 0)),
                                 js_str(_arg(a, 1, ""))), "RegExp")
    regex_ns.props["__construct__"] = lambda i, a: JSRegExp(
        js_str(_arg(a, 0)), js_str(_arg(a, 1, "")))
    g.declare("RegExp", regex_ns)

    # ---- console / timers -------------------------------------------------
    logs = []
    interp.console_logs = logs

    def _log(level):
        def fn(i, t, a):
            logs.append((level, " ".join(js_str(x) for x in a)))
            return UNDEF
        return fn
    console = JSObject({
        "log": NativeFunction(_log("log"), "log"),
        "warn": NativeFunction(_log("warn"), "warn"),
        "error": NativeFunction(_log("error"), "error"),
        "info": NativeFunction(_log("info"), "info"),
        "debug": NativeFunction(_log("debug"), "debug"),
    })
    g.declare("console", console)

    nat("setTimeout", lambda i, t, a: i.set_timer(
        lambda fn=_arg(a, 0), extra=a[2:]:
        i.call_function(fn, list(extra)),
        js_num(_arg(a, 1, 0.0))))
    nat("setInterval", lambda i, t, a: i.set_timer(
        lambda fn=_arg(a, 0): i.call_function(fn, []),
        js_num(_arg(a, 1, 0.0)), interval=js_num(_arg(a, 1, 0.0))))
    nat("clearTimeout", lambda i, t, a: (
        i.clear_timer(js_num(_arg(a, 0, -1.0)))
        if _arg(a, 0) is not UNDEF else None, UNDEF)[1])
    nat("clearInterval", lambda i, t, a: (
        i.clear_timer(js_num(_arg(a, 0, -1.0)))
        if _arg(a, 0) is not UNDEF else None, UNDEF)[1])
    nat("requestAnimationFrame", lambda i, t, a: i.set_timer(
        lambda fn=_arg(a, 0): i.call_function(fn, [i.clock_ms]), 16.0))

    interp._rand_state = 0x2545F491


def _next_random(interp):
    # deterministic xorshift so harness runs are reproducible
    x = interp._rand_state
    x ^= (x << 13) & 0xFFFFFFFF
    x ^= x >> 17
    x ^= (x << 5) & 0xFFFFFFFF
    interp._rand_state = x
    return (x & 0xFFFFFF) / float(0x1000000)


def _parse_int(args):
    s = js_str(_arg(args, 0)).strip()
    base = _arg(args, 1)
    base = 10 if base is UNDEF else int(js_num(base))
    m = []
    neg = False
    i = 0
    if i < len(s) and s[i] in "+-":
        neg = s[i] == "-"
        i += 1
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
    while i < len(s) and s[i].lower() in digits:
        m.append(s[i])
        i += 1
    if not m:
        return float("nan")
    return float(int("".join(m), base)) * (-1 if neg else 1)


def _parse_float(args):
    s = js_str(_arg(args, 0)).strip()
    import re as _re
    m = _re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    return float(m.group(0)) if m else float("nan")


def _parse_date_ms(s):
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return _time.mktime(_time.strptime(s[:19], fmt)) * 1000.0
        except ValueError:
            continue
    return float("nan")


def _object_assign(interp, this, args):
    target = _arg(args, 0)
    if not isinstance(target, JSObject):
        target = JSObject()
    for src in args[1:]:
        if isinstance(src, JSObject):
            target.props.update(src.props)
    return target


def _array_from(interp, this, args):
    src = _arg(args, 0)
    mapper = _arg(args, 1)
    if isinstance(src, JSObject) and "length" in src.props:
        items = [src.props.get(str(k), UNDEF)
                 for k in range(int(js_num(src.props["length"])))]
    else:
        items = interp._iterate(src)
    if mapper is not UNDEF:
        items = [interp.call_function(mapper, [x, float(k)])
                 for k, x in enumerate(items)]
    return JSArray(items)


def _promise_construct(interp, args):
    executor = _arg(args, 0)
    p = JSPromise(interp)
    resolve = NativeFunction(
        lambda i, t, a: (p.resolve(_arg(a, 0)), UNDEF)[1], "resolve")
    reject = NativeFunction(
        lambda i, t, a: (p.reject(_arg(a, 0)), UNDEF)[1], "reject")
    try:
        interp.call_function(executor, [resolve, reject])
    except _Throw as t:
        p.reject(t.value)
    return p


def _resolved(interp, value):
    p = JSPromise(interp)
    p.resolve(value)
    return p


def _rejected(interp, value):
    p = JSPromise(interp)
    p.reject(value)
    return p


def _promise_all(interp, this, args):
    promises = _arg(args, 0, JSArray()).items
    out = JSPromise(interp)
    results = [UNDEF] * len(promises)
    remaining = [len(promises)]
    if not promises:
        out.resolve(JSArray([]))
        return out
    for idx, p in enumerate(promises):
        if not isinstance(p, JSPromise):
            results[idx] = p
            remaining[0] -= 1
            continue

        def on_ok(v, idx=idx):
            results[idx] = v
            remaining[0] -= 1
            if remaining[0] == 0:
                out.resolve(JSArray(results))

        p.then_native(on_ok, lambda e: out.reject(e))
    if remaining[0] == 0:
        out.resolve(JSArray(results))
    return out
