"""Language-semantics tests for the minijs interpreter
(scripts/minijs) — the JS runtime that executes the frontend in CI.
Pins the semantics the app relies on: scoping/closures, coercion,
destructuring/spread, template literals, regex, promises with the
synchronous-await model, virtual-clock timers, DOM selectors, events,
and the HTML parser round-trip."""

import pytest

from scripts.minijs.dom import Document, dispatch_event
from scripts.minijs.interp import (
    UNDEF, Interpreter, JSArray, JSError, JSObject, js_str,
)


def run(src, var="out"):
    it = Interpreter()
    it.run(src)
    it.run_all_tasks()
    try:
        return it, it.global_env.lookup(var)
    except JSError:
        return it, None


def val(src, var="out"):
    _, v = run(src, var)
    return v


def text(src, var="out"):
    return js_str(val(src, var))


# ---------------------------------------------------------------------------
# expressions + coercion
# ---------------------------------------------------------------------------

def test_arithmetic_and_string_coercion():
    assert text('const out = 1 + 2 * 3') == "7"
    assert text('const out = "a" + 1 + 2') == "a12"
    assert text('const out = "5" * "4"') == "20"
    assert text('const out = 7 % 3') == "1"
    assert text('const out = 2 ** 10') == "1024"
    assert text('const out = 0.1 + 0.2 === 0.3') == "false"


def test_equality_semantics():
    assert val('const out = null == undefined') is True
    assert val('const out = null === undefined') is False
    assert val('const out = "1" == 1') is True
    assert val('const out = "1" === 1') is False
    assert val('const out = NaN === NaN') is False
    assert val('const out = [1] == "1"') is False  # no object coercion


def test_truthiness():
    assert text('const out = ["", 0, null, undefined, NaN, [], {}]'
                '.map((x) => x ? 1 : 0).join("")') == "0000011"


def test_typeof_and_ternary():
    assert text('const out = typeof undefinedThing') == "undefined"
    assert text('const out = typeof "s"') == "string"
    assert text('const out = typeof (() => 1)') == "function"
    assert text('const out = 5 > 3 ? "yes" : "no"') == "yes"


def test_template_literals_nested():
    src = 'const n = 3; const out = `a${n + 1}b${`in${n}`}c`'
    assert text(src) == "a4bin3c"


# ---------------------------------------------------------------------------
# bindings / functions / closures
# ---------------------------------------------------------------------------

def test_closures_capture_environment():
    src = '''
    function counter() { let n = 0; return () => ++n; }
    const c = counter(); c(); c();
    const out = c();
    '''
    assert text(src) == "3"


def test_default_and_rest_params():
    src = '''
    function f(a, b = a * 2, ...rest) { return [a, b, rest.length]; }
    const out = f(3).concat(f(1, 2, 9, 9, 9));
    '''
    assert text(src) == "3,6,0,1,2,3"


def test_destructuring_and_spread():
    src = '''
    const { a, b: bee = 5, ...rest } = { a: 1, c: 3, d: 4 };
    const [x, , z = 9] = [10, 20];
    const merged = { ...{ p: 1 }, q: 2 };
    const arr = [...[1, 2], 3];
    const out = [a, bee, Object.keys(rest).length, x, z,
                 merged.p + merged.q, arr.join("")];
    '''
    assert text(src) == "1,5,2,10,9,3,123"


def test_arrow_this_is_lexical():
    src = '''
    const obj = {
      n: 41,
      get() { const f = () => this.n + 1; return f(); },
    };
    const out = obj.get();
    '''
    assert text(src) == "42"


def test_function_hoisting_in_block():
    src = 'const out = later(); function later() { return "hoisted"; }'
    assert text(src) == "hoisted"


# ---------------------------------------------------------------------------
# control flow
# ---------------------------------------------------------------------------

def test_loops_break_continue():
    src = '''
    let s = "";
    for (let i = 0; i < 6; i++) {
      if (i === 1) continue;
      if (i === 4) break;
      s += i;
    }
    for (const [k, v] of [["a", 1], ["b", 2]]) s += k + v;
    let j = 0;
    while (j < 2) { s += "w"; j++; }
    const out = s;
    '''
    assert text(src) == "023a1b2ww"


def test_switch_fallthrough_and_default():
    src = '''
    function f(x) {
      let s = "";
      switch (x) {
        case 1: s += "one";
        case 2: s += "two"; break;
        case 3: s += "three"; break;
        default: s += "other";
      }
      return s;
    }
    const out = [f(1), f(2), f(3), f(9)].join("|");
    '''
    assert text(src) == "onetwo|two|three|other"


def test_try_catch_finally_order():
    src = '''
    const trail = [];
    function risky() {
      try { throw new Error("boom"); }
      catch (e) { trail.push("caught:" + e.message); return "c"; }
      finally { trail.push("finally"); }
    }
    trail.push(risky());
    const out = trail.join(",");
    '''
    assert text(src) == "caught:boom,finally,c"


# ---------------------------------------------------------------------------
# stdlib
# ---------------------------------------------------------------------------

def test_array_methods_chain():
    src = '''
    const out = [5, 3, 8, 1]
      .sort((a, b) => a - b)
      .filter((x) => x > 1)
      .map((x) => x * 10)
      .reduce((acc, x) => acc + x, 0);
    '''
    assert text(src) == "160"


def test_string_methods():
    src = '''
    const s = "  DeepVision TPU  ";
    const out = [s.trim().toLowerCase(), s.includes("TPU"),
                 "a-b-c".split("-").join("."),
                 "7".padStart(3, "0"), "abc".slice(-2)];
    '''
    assert text(src) == "deepvision tpu,true,a.b.c,007,bc"


def test_regex_replace_with_groups_and_fn():
    src = r'''
    const out = [
      "Q1 and Q23".replace(/Q(\d+)/g, "[$1]"),
      "a1b2".replace(/\d/g, (m) => String(Number(m) * 2)),
      /^dv-\d{8}/.test("dv-20260820-x"),
    ];
    '''
    assert text(src) == "[1] and [23],a2b4,true"


def test_json_round_trip():
    src = '''
    const obj = { a: [1, 2], b: { c: "中文" }, d: null };
    const out = JSON.parse(JSON.stringify(obj)).b.c;
    '''
    assert text(src) == "中文"


def test_map_set_semantics():
    src = '''
    const m = new Map([["k", 1]]);
    m.set("k", m.get("k") + 1);
    const s = new Set([1, 1, 2]);
    s.add(2); s.delete(1);
    const out = [m.get("k"), m.size, s.size, s.has(2)];
    '''
    assert text(src) == "2,1,1,true"


# ---------------------------------------------------------------------------
# async: synchronous-await model + virtual clock
# ---------------------------------------------------------------------------

def test_await_resolves_through_timers_instantly():
    src = '''
    const trail = [];
    async function go() {
      trail.push("start");
      await new Promise((r) => setTimeout(r, 60000));
      trail.push("after-timer");
      return 42;
    }
    go().then((v) => trail.push("then:" + v));
    trail.push("sync-end");
    var out = trail;
    '''
    it, v = run(src)
    assert js_str(v) == "start,after-timer,sync-end,then:42"
    # the 60s timer consumed VIRTUAL time only
    assert it.clock_ms >= 60000


def test_promise_all_and_rejection():
    src = '''
    const out = [];
    Promise.all([Promise.resolve(1), 2, Promise.resolve(3)])
      .then((xs) => out.push(xs.join("")));
    Promise.reject(new Error("nope")).catch((e) => out.push(e.message));
    '''
    _, v = run(src)
    assert sorted(js_str(x) for x in v.items) == ["123", "nope"]


def test_set_interval_and_clear():
    src = '''
    let n = 0;
    const id = setInterval(() => {
      n++;
      if (n >= 3) clearInterval(id);
    }, 1000);
    var out = null;
    setTimeout(() => { out = n; }, 10000);
    '''
    assert text(src) == "3"


def test_uncaught_throw_escapes_as_jserror():
    it = Interpreter()
    with pytest.raises(JSError) as err:
        it.run('throw new Error("explode")')
    assert "explode" in str(err.value)


def test_loop_runaway_guard():
    it = Interpreter()
    it.MAX_LOOP_TURNS = 1000
    with pytest.raises(JSError):
        it.run("while (true) {}")


# ---------------------------------------------------------------------------
# DOM: parsing, selectors, events
# ---------------------------------------------------------------------------

def _doc(html):
    doc = Document()
    doc.body.set_inner_html(html)
    return doc


def test_html_parse_and_selectors():
    doc = _doc('''
      <div id="wrap" class="outer">
        <nav class="tabs"><button data-view="a">A</button>
          <button data-view="b" class="active">B</button></nav>
        <ul><li class="item">1</li><li class="item sel">2</li></ul>
      </div>''')
    assert len(doc.query_all("button")) == 2
    assert doc.query('[data-view="b"]').get_text() == "B"
    assert len(doc.query_all("nav.tabs button")) == 2
    assert doc.query("#wrap .item.sel").get_text() == "2"
    assert [e.get_text() for e in doc.query_all(".item, button")] == \
        ["A", "B", "1", "2"]


def test_inner_html_round_trip_and_text():
    doc = _doc("<p>你好 <b>世界</b> &amp; more</p>")
    p = doc.query("p")
    assert p.get_text() == "你好 世界 & more"
    assert "<b>世界</b>" in p.inner_html()


def test_closest_and_event_bubbling_with_stop():
    doc = _doc('<div id="outer"><div id="inner">'
               '<button id="btn">x</button></div></div>')
    it = Interpreter()
    doc_order = []
    from scripts.minijs.interp import NativeFunction
    btn = doc.query("#btn")
    assert btn.closest("#outer").attrs["id"] == "outer"

    def handler(tag, stop=False):
        def fn(i, t, a):
            doc_order.append(tag)
            if stop:
                i.call_function(a[0].props["stopPropagation"], [])
            return UNDEF
        return NativeFunction(fn, tag)
    btn.add_listener("click", handler("btn"))
    doc.query("#inner").add_listener("click", handler("inner", stop=True))
    doc.query("#outer").add_listener("click", handler("outer"))
    dispatch_event(it, btn, "click")
    assert doc_order == ["btn", "inner"]   # stopped before outer


def test_event_target_vs_current_target_delegation():
    doc = _doc('<div id="list"><span class="row" data-id="7">r</span></div>')
    it = Interpreter()
    seen = {}
    from scripts.minijs.interp import NativeFunction

    def fn(i, t, a):
        ev = a[0]
        target = ev.props["target"]
        seen["target_id"] = target.dataset.js_get(i, "id")
        seen["current"] = ev.props["currentTarget"].attrs.get("id")
        return UNDEF
    doc.query("#list").add_listener("click", NativeFunction(fn, "h"))
    dispatch_event(it, doc.query(".row"), "click")
    assert js_str(seen["target_id"]) == "7"
    assert seen["current"] == "list"


def test_form_control_values_and_classlist():
    doc = _doc('<select id="s"><option value="a">A</option>'
               '<option value="b" selected>B</option></select>'
               '<input id="i" value="init">'
               '<div id="d" class="x y"></div>')
    it = Interpreter()
    sel = doc.query("#s")
    assert sel.js_get(it, "value") == "b"
    inp = doc.query("#i")
    assert inp.js_get(it, "value") == "init"
    inp.js_set(it, "value", "typed")
    assert inp.js_get(it, "value") == "typed"
    d = doc.query("#d")
    assert d.classList._classes() == ["x", "y"]


def test_style_attribute_seeds_style_object():
    doc = _doc('<div id="hidden" style="display:none;color:red"></div>')
    it = Interpreter()
    style = doc.query("#hidden").js_get(it, "style")
    assert style.js_get(it, "display") == "none"
    assert style.js_get(it, "color") == "red"


def test_dataset_camel_case_mapping():
    doc = _doc('<a id="x" data-report-name="r.md"></a>')
    it = Interpreter()
    a = doc.query("#x")
    assert a.dataset.js_get(it, "reportName") == "r.md"
    a.dataset.js_set(it, "actKind", "share")
    assert a.attrs["data-act-kind"] == "share"


def test_array_prototype_slice_call_arraylike():
    """The NodeList->Array idiom the docs pages' inline scripts use
    (round 5: inline <script> bodies execute; Array.prototype.slice
    gained .call support)."""
    src = """
      var arr = Array.prototype.slice.call([1, 2, 3, 4], 1, 3);
      var s = Array.prototype.slice.call("abc");
      const out = arr.length + ":" + arr[0] + arr[1] + ":" + s.length;
    """
    assert text(src) == "2:23:3"


def test_array_prototype_slice_negative_and_copy():
    src = """
      var base = [1, 2, 3];
      var copy = Array.prototype.slice.call(base);
      copy.push(4);
      const out = base.length + ":" + copy.length + ":" +
          Array.prototype.slice.call([5, 6, 7], -2).join(",");
    """
    assert text(src) == "3:4:6,7"


def test_iife_chain_like_docs_pages():
    """Two IIFEs sharing document-level state — the docs pages' inline
    module pattern (theme toggle + scroll spy in separate closures)."""
    src = """
      var shared = {n: 0};
      (function () { shared.n += 1; })();
      (function () { shared.n += 10; })();
      const out = shared.n;
    """
    assert text(src) == "11"
