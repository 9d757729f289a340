"""minijs interpreter: tree-walking evaluator over parser.py ASTs.

Semantics choices (scoped to what the frontend exercises):
- numbers are Python floats (rendered int-like without the .0);
- `undefined` is the UNDEF sentinel, `null` is Python None;
- async functions execute synchronously; `await p` drains the event
  loop (microtasks + virtual-clock timers) until `p` settles. The app's
  promise graphs all terminate through fetch/timers, so this preserves
  observable ordering without real concurrency;
- setTimeout/setInterval run on a virtual clock: no wall-clock waits in
  CI, and `await new Promise(r => setTimeout(r, 5000))` is instant.
"""

from __future__ import annotations

import json as _json
import math
import re
import time as _time
from typing import Optional

from scripts.minijs.parser import parse


class Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = Undefined()


class JSError(Exception):
    """A JS exception escaping to Python (uncaught throw / native)."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_str(value))


class _Throw(Exception):
    def __init__(self, value):
        # interpreter-internal errors are raised as plain strings; wrap
        # them into Error-shaped objects so `catch (e) { e.message }`
        # works. (The frontend never throws bare strings itself.)
        if isinstance(value, str):
            value = JSObject({"name": "Error", "message": value,
                              "stack": value})
        self.value = value


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


# ---------------------------------------------------------------------------
# values
# ---------------------------------------------------------------------------

class JSObject:
    def __init__(self, props=None):
        self.props = dict(props or {})

    def get(self, key):
        return self.props.get(key, UNDEF)

    def set(self, key, value):
        self.props[key] = value

    def keys(self):
        return list(self.props.keys())


class JSArray:
    def __init__(self, items=None):
        self.items = list(items or [])


class JSFunction:
    def __init__(self, node, env, interp, this=UNDEF):
        (_, self.name, self.params, self.body,
         self.is_async, self.is_arrow) = node
        self.env = env
        self.interp = interp
        self.this = this      # captured lexical this for arrows
        self.props = {}

    def __repr__(self):
        return f"<function {self.name or 'anonymous'}>"


class NativeFunction:
    def __init__(self, fn, name=""):
        self.fn = fn            # fn(interp, this, args) -> value
        self.name = name
        self.props = {}

    def __repr__(self):
        return f"<native {self.name}>"


class BoundMethod:
    """A native method bound to a receiver (string/array/object)."""

    def __init__(self, fn, receiver, name=""):
        self.fn = fn
        self.receiver = receiver
        self.name = name


class JSRegExp:
    def __init__(self, source, flags):
        self.source = source
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= re.IGNORECASE
        if "m" in flags:
            py_flags |= re.MULTILINE
        if "s" in flags:
            py_flags |= re.DOTALL
        self.re = re.compile(_js_regex_to_py(source), py_flags)
        self.global_ = "g" in flags
        self.last_index = 0


def _js_regex_to_py(source: str) -> str:
    # JS and Python regex syntax mostly agree for the app's patterns.
    # Translate the few divergences the code uses.
    return source.replace("(?<", "(?P<") \
        .replace("(?P<=", "(?<=").replace("(?P<!", "(?<!") \
        .replace("\\/", "/")


class JSPromise:
    PENDING, FULFILLED, REJECTED = 0, 1, 2

    def __init__(self, interp):
        self.interp = interp
        self.state = self.PENDING
        self.value = UNDEF
        self.callbacks = []     # (on_ok, on_err, derived)

    def _settle(self, state, value):
        if self.state != self.PENDING:
            return
        if state == self.FULFILLED and isinstance(value, JSPromise):
            value.then_native(
                lambda v: self._settle(self.FULFILLED, v),
                lambda e: self._settle(self.REJECTED, e))
            return
        self.state = state
        self.value = value
        for cb in self.callbacks:
            self.interp.microtasks.append(lambda cb=cb: self._run_cb(cb))
        self.callbacks = []

    def resolve(self, value=UNDEF):
        self._settle(self.FULFILLED, value)

    def reject(self, value=UNDEF):
        self._settle(self.REJECTED, value)

    def _run_cb(self, cb):
        on_ok, on_err, derived = cb
        handler = on_ok if self.state == self.FULFILLED else on_err
        if handler is None:
            derived._settle(self.state, self.value)
            return
        try:
            out = handler(self.value)
            derived._settle(self.FULFILLED, out)
        except _Throw as t:
            derived._settle(self.REJECTED, t.value)

    def then_native(self, on_ok, on_err=None):
        derived = JSPromise(self.interp)
        cb = (on_ok, on_err, derived)
        if self.state == self.PENDING:
            self.callbacks.append(cb)
        else:
            self.interp.microtasks.append(lambda: self._run_cb(cb))
        return derived


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def js_truthy(v) -> bool:
    if v is UNDEF or v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return not (v == 0 or math.isnan(v))
    if isinstance(v, int):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if v is UNDEF:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(int(s, 16)) if s[:2].lower() == "0x" else float(s)
        except ValueError:
            return float("nan")
    if isinstance(v, JSArray):
        if not v.items:
            return 0.0
        if len(v.items) == 1:
            return js_num(v.items[0])
    return float("nan")


def _num_str(f: float) -> str:
    if math.isnan(f):
        return "NaN"
    if f == float("inf"):
        return "Infinity"
    if f == float("-inf"):
        return "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


def js_str(v) -> str:
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _num_str(float(v))
    if isinstance(v, str):
        return v
    if isinstance(v, JSArray):
        return ",".join("" if x is UNDEF or x is None else js_str(x)
                        for x in v.items)
    if isinstance(v, (JSFunction, NativeFunction)):
        return f"function {getattr(v, 'name', '') or ''}() {{ ... }}"
    if isinstance(v, JSObject):
        if "message" in v.props and "stack" in v.props:
            return f"Error: {js_str(v.props['message'])}"
        return "[object Object]"
    return str(v)


def strict_eq(a, b) -> bool:
    if a is UNDEF and b is UNDEF:
        return True
    if a is None and b is None:
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        return not (math.isnan(fa) or math.isnan(fb)) and fa == fb
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def loose_eq(a, b) -> bool:
    if (a is UNDEF or a is None) and (b is UNDEF or b is None):
        return True
    if (a is UNDEF or a is None) != (b is UNDEF or b is None):
        return False
    if isinstance(a, str) and isinstance(b, (int, float)) or \
            isinstance(b, str) and isinstance(a, (int, float)):
        return js_num(a) == js_num(b)
    if isinstance(a, bool) or isinstance(b, bool):
        return js_num(a) == js_num(b)
    return strict_eq(a, b)


def to_js(v, interp):
    """Python value -> JS value (for fetch/JSON bridges)."""
    if v is None or v is UNDEF or isinstance(v, (bool, str, JSObject,
                                                 JSArray)):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return JSArray([to_js(x, interp) for x in v])
    if isinstance(v, dict):
        return JSObject({str(k): to_js(x, interp) for k, x in v.items()})
    return v


def from_js(v):
    """JS value -> plain Python (for JSON.stringify / bridges)."""
    if v is UNDEF:
        return None
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return int(v)
    if isinstance(v, JSArray):
        return [from_js(x) for x in v.items]
    if isinstance(v, JSObject):
        return {k: from_js(x) for k, x in v.props.items()
                if x is not UNDEF and not isinstance(
                    x, (JSFunction, NativeFunction))}
    if isinstance(v, (JSFunction, NativeFunction, BoundMethod)):
        return None
    return v


# ---------------------------------------------------------------------------
# environment
# ---------------------------------------------------------------------------

class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        raise _Throw(f"ReferenceError: {name} is not defined")

    def has(self, name):
        env = self
        while env is not None:
            if name in env.vars:
                return True
            env = env.parent
        return False

    def assign(self, name, value):
        env = self
        while env is not None:
            if name in env.vars:
                env.vars[name] = value
                return
            env = env.parent
        raise _Throw(f"ReferenceError: {name} is not defined")

    def declare(self, name, value):
        self.vars[name] = value


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------

class Interpreter:
    MAX_LOOP_TURNS = 2_000_000
    MAX_EVENT_TURNS = 100_000

    def __init__(self, global_vars: Optional[dict] = None):
        self.global_env = Env()
        self.microtasks = []
        self.timers = []          # list of [fire_at, seq, fn, interval_ms]
        self._timer_seq = 0
        self.clock_ms = 0.0
        from scripts.minijs import stdlib
        stdlib.install(self)
        for k, v in (global_vars or {}).items():
            self.global_env.declare(k, v)

    # ---- entry points -------------------------------------------------
    def run(self, src: str, name: str = "<js>"):
        ast = parse(src, name)
        try:
            return self.exec_block(ast[1], self.global_env, UNDEF)
        except _Throw as t:
            raise JSError(t.value) from None

    def call(self, fn, args, this=UNDEF):
        try:
            return self.call_function(fn, args, this)
        except _Throw as t:
            raise JSError(t.value) from None

    # ---- event loop ----------------------------------------------------
    def set_timer(self, fn, delay_ms, interval=None):
        self._timer_seq += 1
        self.timers.append([self.clock_ms + max(0.0, delay_ms),
                            self._timer_seq, fn, interval])
        return float(self._timer_seq)

    def clear_timer(self, timer_id):
        self.timers = [t for t in self.timers if t[1] != int(timer_id)]

    def drain_microtasks(self):
        turns = 0
        while self.microtasks:
            task = self.microtasks.pop(0)
            task()
            turns += 1
            if turns > self.MAX_EVENT_TURNS:
                raise JSError("event loop runaway: microtasks never drain")

    def turn_once(self) -> bool:
        """Run one event-loop turn. Returns False when nothing is left."""
        self.drain_microtasks()
        if not self.timers:
            return False
        self.timers.sort(key=lambda t: (t[0], t[1]))
        fire_at, seq, fn, interval = self.timers.pop(0)
        self.clock_ms = max(self.clock_ms, fire_at)
        if interval is not None:
            self._timer_seq += 1
            self.timers.append([self.clock_ms + interval, seq, fn,
                                interval])
        fn()
        self.drain_microtasks()
        return True

    def run_until_settled(self, promise: JSPromise):
        turns = 0
        while promise.state == JSPromise.PENDING:
            if not self.turn_once():
                raise JSError(
                    "await deadlock: promise never settles and the event "
                    "loop is empty")
            turns += 1
            if turns > self.MAX_EVENT_TURNS:
                raise JSError("await runaway: promise never settles")

    def run_all_tasks(self, max_virtual_ms=120000.0):
        """Drain microtasks and due timers up to a virtual-time horizon
        (used by the harness to let watchdog/poll intervals fire)."""
        horizon = self.clock_ms + max_virtual_ms
        while True:
            self.drain_microtasks()
            pending = [t for t in self.timers if t[0] <= horizon]
            if not pending:
                return
            if not self.turn_once():
                return

    # ---- function calls --------------------------------------------------
    def call_function(self, fn, args, this=UNDEF):
        if isinstance(fn, NativeFunction):
            return fn.fn(self, this, list(args))
        if isinstance(fn, BoundMethod):
            return fn.fn(self, fn.receiver, list(args))
        if not isinstance(fn, JSFunction):
            raise _Throw(f"TypeError: {js_str(fn)} is not a function")
        env = Env(fn.env)
        use_this = fn.this if fn.is_arrow else this
        env.declare("this", use_this)
        if not fn.is_arrow:
            env.declare("arguments", JSArray(list(args)))
        i = 0
        for param in fn.params:
            if param[0] == "rest":
                env.declare(param[1], JSArray(list(args[i:])))
                i = len(args)
                continue
            _, target, default = param
            value = args[i] if i < len(args) else UNDEF
            if value is UNDEF and default is not None:
                value = self.eval(default, env)
            self.bind_pattern(target, value, env, declare=True)
            i += 1

        def _run_body():
            try:
                if fn.body[0] == "return":
                    return self.eval(fn.body[1], env)
                self.exec_block(fn.body[1], env, use_this)
                return UNDEF
            except _Return as r:
                return r.value

        if fn.is_async:
            promise = JSPromise(self)
            try:
                promise.resolve(_run_body())
            except _Throw as t:
                promise.reject(t.value)
            return promise
        return _run_body()

    # ---- statements --------------------------------------------------------
    def exec_block(self, stmts, env, this):
        # hoist function declarations
        for s in stmts:
            if s[0] == "fn_decl":
                env.declare(s[1], JSFunction(s[2], env, self, this))
        for s in stmts:
            self.exec_stmt(s, env, this)
        return UNDEF

    def exec_stmt(self, node, env, this):
        kind = node[0]
        if kind == "expr":
            self.eval(node[1], env)
        elif kind == "decl":
            for target, init in node[2]:
                value = self.eval(init, env) if init is not None else UNDEF
                self.bind_pattern(target, value, env, declare=True)
        elif kind == "block":
            self.exec_block(node[1], Env(env), this)
        elif kind == "if":
            if js_truthy(self.eval(node[1], env)):
                self.exec_stmt(node[2], env, this)
            elif node[3] is not None:
                self.exec_stmt(node[3], env, this)
        elif kind == "for":
            loop_env = Env(env)
            if node[1] is not None:
                self.exec_stmt(node[1], loop_env, this)
            turns = 0
            while node[2] is None or js_truthy(self.eval(node[2],
                                                         loop_env)):
                try:
                    self.exec_stmt(node[4], Env(loop_env), this)
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    self.eval(node[3], loop_env)
                turns += 1
                if turns > self.MAX_LOOP_TURNS:
                    raise _Throw("RangeError: loop runaway")
        elif kind in ("forof", "forin"):
            _, decl_kind, target, iterable_node, body = node
            iterable = self.eval(iterable_node, env)
            values = self._iterate(iterable, keys=(kind == "forin"))
            for value in values:
                it_env = Env(env)
                self.bind_pattern(target, value, it_env, declare=True)
                try:
                    self.exec_stmt(body, it_env, this)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "while":
            turns = 0
            while js_truthy(self.eval(node[1], env)):
                try:
                    self.exec_stmt(node[2], Env(env), this)
                except _Break:
                    break
                except _Continue:
                    pass
                turns += 1
                if turns > self.MAX_LOOP_TURNS:
                    raise _Throw("RangeError: loop runaway")
        elif kind == "dowhile":
            turns = 0
            while True:
                try:
                    self.exec_stmt(node[2], Env(env), this)
                except _Break:
                    break
                except _Continue:
                    pass
                if not js_truthy(self.eval(node[1], env)):
                    break
                turns += 1
                if turns > self.MAX_LOOP_TURNS:
                    raise _Throw("RangeError: loop runaway")
        elif kind == "return":
            raise _Return(self.eval(node[1], env)
                          if node[1] is not None else UNDEF)
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "throw":
            raise _Throw(self.eval(node[1], env))
        elif kind == "try":
            _, block, param, catch, final = node
            try:
                self.exec_stmt(block, env, this)
            except _Throw as t:
                if catch is not None:
                    c_env = Env(env)
                    if param is not None:
                        self.bind_pattern(param, t.value, c_env,
                                          declare=True)
                    self.exec_stmt(catch, c_env, this)
                elif final is None:
                    raise
            finally:
                if final is not None:
                    self.exec_stmt(final, env, this)
        elif kind == "switch":
            disc = self.eval(node[1], env)
            matched = False
            try:
                for test, stmts in node[2]:
                    if not matched and test is not None and \
                            strict_eq(disc, self.eval(test, env)):
                        matched = True
                    if matched:
                        for s in stmts:
                            self.exec_stmt(s, env, this)
                if not matched:
                    hit_default = False
                    for test, stmts in node[2]:
                        if test is None:
                            hit_default = True
                        if hit_default:
                            for s in stmts:
                                self.exec_stmt(s, env, this)
            except _Break:
                pass
        elif kind in ("fn_decl", "empty"):
            pass
        else:
            raise _Throw(f"minijs: unsupported statement {kind}")

    def _iterate(self, value, keys=False):
        if isinstance(value, JSArray):
            return list(value.items)
        if isinstance(value, str):
            return list(value)
        from scripts.minijs import stdlib
        if isinstance(value, stdlib.JSMap):
            return [JSArray([k, v]) for k, v in value.entries()]
        if isinstance(value, stdlib.JSSet):
            return list(value.items())
        if isinstance(value, JSObject):
            if keys:
                return list(value.props.keys())
            # for-of over plain objects is a TypeError in JS
            raise _Throw("TypeError: object is not iterable")
        raise _Throw(f"TypeError: {js_str(value)} is not iterable")

    # ---- patterns ------------------------------------------------------
    def bind_pattern(self, target, value, env, declare):
        kind = target[0]
        if kind == "id":
            if declare:
                env.declare(target[1], value)
            else:
                env.assign(target[1], value)
        elif kind == "objpat":
            _, props, rest = target
            used = set()
            for name, sub, default in props:
                sub_val = self.get_member(value, name)
                used.add(name)
                if sub_val is UNDEF and default is not None:
                    sub_val = self.eval(default, env)
                self.bind_pattern(sub, sub_val, env, declare)
            if rest is not None:
                remaining = JSObject({
                    k: v for k, v in getattr(value, "props", {}).items()
                    if k not in used})
                self.bind_pattern(("id", rest), remaining, env, declare)
        elif kind == "arrpat":
            _, elems, rest = target
            items = self._iterate(value)
            for i, el in enumerate(elems):
                if el is None:
                    continue
                sub, default = el
                sub_val = items[i] if i < len(items) else UNDEF
                if sub_val is UNDEF and default is not None:
                    sub_val = self.eval(default, env)
                self.bind_pattern(sub, sub_val, env, declare)
            if rest is not None:
                self.bind_pattern(("id", rest),
                                  JSArray(items[len(elems):]), env, declare)
        elif kind == "member":
            obj = self.eval(target[1], env)
            prop = js_str(self.eval(target[2], env))
            self.set_member(obj, prop, value)
        else:
            raise _Throw(f"minijs: unsupported pattern {kind}")

    # ---- expressions -----------------------------------------------------
    def eval(self, node, env):
        kind = node[0]
        if kind == "num":
            return float(node[1])
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "null":
            return None
        if kind == "undef":
            return UNDEF
        if kind == "id":
            return env.lookup(node[1])
        if kind == "this":
            return env.lookup("this") if env.has("this") else UNDEF
        if kind == "tpl":
            strings, exprs = node[1], node[2]
            out = [strings[0]]
            for i, e in enumerate(exprs):
                out.append(js_str(self.eval(e, env)))
                out.append(strings[i + 1] if i + 1 < len(strings) else "")
            return "".join(out)
        if kind == "regex":
            return JSRegExp(node[1], node[2])
        if kind == "arr":
            items = []
            for el in node[1]:
                if el is None:
                    items.append(UNDEF)
                elif el[0] == "spread":
                    items.extend(self._iterate(self.eval(el[1], env)))
                else:
                    items.append(self.eval(el, env))
            return JSArray(items)
        if kind == "obj":
            obj = JSObject()
            for prop in node[1]:
                if prop[0] == "spread":
                    src = self.eval(prop[1], env)
                    if isinstance(src, JSObject):
                        obj.props.update(src.props)
                    continue
                _, key_node, val_node, computed = prop
                key = js_str(self.eval(key_node, env))
                obj.props[key] = self.eval(val_node, env)
            return obj
        if kind == "fn":
            this = env.lookup("this") if env.has("this") else UNDEF
            return JSFunction(node, env, self, this)
        if kind == "seq":
            out = UNDEF
            for e in node[1]:
                out = self.eval(e, env)
            return out
        if kind == "cond":
            return (self.eval(node[2], env)
                    if js_truthy(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if kind == "logical":
            left = self.eval(node[2], env)
            if node[1] == "&&":
                return self.eval(node[3], env) if js_truthy(left) else left
            return left if js_truthy(left) else self.eval(node[3], env)
        if kind == "binop":
            return self.binop(node[1], self.eval(node[2], env),
                              self.eval(node[3], env))
        if kind == "unary":
            op = node[1]
            if op == "typeof":
                operand = node[2]
                if operand[0] == "id" and not env.has(operand[1]):
                    return "undefined"
                return self.typeof(self.eval(operand, env))
            if op == "delete":
                operand = node[2]
                if operand[0] == "member":
                    obj = self.eval(operand[1], env)
                    prop = js_str(self.eval(operand[2], env))
                    if isinstance(obj, JSObject):
                        obj.props.pop(prop, None)
                return True
            val = self.eval(node[2], env)
            if op == "!":
                return not js_truthy(val)
            if op == "-":
                return -js_num(val)
            if op == "+":
                return js_num(val)
            if op == "~":
                return float(~_to_int32(js_num(val)))
            if op == "void":
                return UNDEF
        if kind == "update":
            _, op, target, prefix = node
            old = js_num(self._read_target(target, env))
            new = old + (1 if op == "++" else -1)
            self._write_target(target, new, env)
            return new if prefix else old
        if kind == "assign":
            _, op, target, value_node = node
            if op == "=":
                value = self.eval(value_node, env)
                self.bind_pattern(target, value, env, declare=False)
                return value
            old = self._read_target(target, env)
            if op == "&&=":
                if not js_truthy(old):
                    return old
                value = self.eval(value_node, env)
            elif op == "||=":
                if js_truthy(old):
                    return old
                value = self.eval(value_node, env)
            else:
                value = self.binop(op[:-1], old, self.eval(value_node, env))
            self._write_target(target, value, env)
            return value
        if kind == "member":
            obj = self.eval(node[1], env)
            prop = js_str(self.eval(node[2], env))
            return self.get_member(obj, prop)
        if kind == "call":
            callee = node[1]
            if callee[0] == "member":
                this = self.eval(callee[1], env)
                prop = js_str(self.eval(callee[2], env))
                fn = self.get_member(this, prop)
                if fn is UNDEF:
                    raise _Throw(
                        f"TypeError: {js_str(this)[:40]}.{prop} "
                        f"is not a function")
                return self.call_function(fn, self._args(node[2], env),
                                          this)
            fn = self.eval(callee, env)
            return self.call_function(fn, self._args(node[2], env))
        if kind == "new":
            ctor = self.eval(node[1], env)
            args = self._args(node[2], env)
            from scripts.minijs import stdlib
            return stdlib.construct(self, ctor, args)
        if kind == "await":
            value = self.eval(node[1], env)
            if isinstance(value, JSPromise):
                self.drain_microtasks()
                if value.state == JSPromise.PENDING:
                    self.run_until_settled(value)
                if value.state == JSPromise.REJECTED:
                    raise _Throw(value.value)
                return value.value
            return value
        raise _Throw(f"minijs: unsupported expression {kind}")

    def _args(self, arg_nodes, env):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(self._iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args

    def _read_target(self, target, env):
        if target[0] == "id":
            return env.lookup(target[1])
        if target[0] == "member":
            obj = self.eval(target[1], env)
            return self.get_member(obj, js_str(self.eval(target[2], env)))
        raise _Throw("minijs: bad compound-assignment target")

    def _write_target(self, target, value, env):
        self.bind_pattern(target, value, env, declare=False)

    def typeof(self, v) -> str:
        if v is UNDEF:
            return "undefined"
        if v is None:
            return "object"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, (int, float)):
            return "number"
        if isinstance(v, str):
            return "string"
        if isinstance(v, (JSFunction, NativeFunction, BoundMethod)):
            return "function"
        return "object"

    def binop(self, op, left, right):
        if op == "+":
            if isinstance(left, str) or isinstance(right, str) or \
                    isinstance(left, (JSArray, JSObject)) or \
                    isinstance(right, (JSArray, JSObject)):
                return js_str(left) + js_str(right)
            return js_num(left) + js_num(right)
        if op == "-":
            return js_num(left) - js_num(right)
        if op == "*":
            return js_num(left) * js_num(right)
        if op == "/":
            r = js_num(right)
            l = js_num(left)
            if r == 0:
                if l == 0 or math.isnan(l):
                    return float("nan")
                return math.copysign(float("inf"), l) * math.copysign(1, r)
            return l / r
        if op == "%":
            r = js_num(right)
            l = js_num(left)
            if r == 0 or math.isnan(l) or math.isnan(r):
                return float("nan")
            return math.fmod(l, r)
        if op == "**":
            return js_num(left) ** js_num(right)
        if op == "===":
            return strict_eq(left, right)
        if op == "!==":
            return not strict_eq(left, right)
        if op == "==":
            return loose_eq(left, right)
        if op == "!=":
            return not loose_eq(left, right)
        if op in ("<", ">", "<=", ">="):
            if isinstance(left, str) and isinstance(right, str):
                la, ra = left, right
            else:
                la, ra = js_num(left), js_num(right)
                if math.isnan(la) or math.isnan(ra):
                    return False
            return {"<": la < ra, ">": la > ra,
                    "<=": la <= ra, ">=": la >= ra}[op]
        if op == "&":
            return float(_to_int32(js_num(left)) & _to_int32(js_num(right)))
        if op == "|":
            return float(_to_int32(js_num(left)) | _to_int32(js_num(right)))
        if op == "^":
            return float(_to_int32(js_num(left)) ^ _to_int32(js_num(right)))
        if op == "<<":
            return float(_to_int32(
                _to_int32(js_num(left)) << (_to_int32(js_num(right)) & 31)))
        if op == ">>":
            return float(_to_int32(js_num(left))
                         >> (_to_int32(js_num(right)) & 31))
        if op == "in":
            if isinstance(right, JSObject):
                return js_str(left) in right.props
            if isinstance(right, JSArray):
                return 0 <= int(js_num(left)) < len(right.items)
            raise _Throw("TypeError: 'in' on non-object")
        if op == "instanceof":
            from scripts.minijs import stdlib
            return stdlib.instance_of(left, right)
        raise _Throw(f"minijs: unsupported operator {op}")

    # ---- member access (delegates per-type to stdlib) -------------------
    def get_member(self, obj, prop):
        from scripts.minijs import stdlib
        return stdlib.get_member(self, obj, prop)

    def set_member(self, obj, prop, value):
        from scripts.minijs import stdlib
        stdlib.set_member(self, obj, prop, value)


def _to_int32(f: float) -> int:
    if math.isnan(f) or math.isinf(f):
        return 0
    n = int(f) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def now_ms() -> float:
    return _time.time() * 1000.0


JSON = _json
