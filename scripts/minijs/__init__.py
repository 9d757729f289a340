"""minijs — a from-scratch JavaScript interpreter in Python.

The deploy image has no node/browser, yet the frontend
(deepvision_tpu/web/static/js/*.js, ~2.9k LoC vanilla ES2017) must be
EXECUTED in CI, not just served (the reference runs Playwright UI smoke:
/root/reference/scripts/agent_browser_smoke_runner.mjs:1,
.github/workflows/browser-smoke.yml). minijs covers exactly the language
subset the frontend uses — const/let/var, functions + arrows + defaults
+ rest, template literals, object/array destructuring + spread,
for/for-of/while, try/catch/finally/throw, async/await with
synchronous-resolution promise semantics, regex literals — plus the
browser globals the app touches (document/DOM + selector engine, fetch
bridged into the in-process WSGI TestClient, timers on a virtual clock,
localStorage, location/history).

Packages:
  lexer.py   tokens (regex-literal and template-literal aware)
  parser.py  Pratt expression parser + statement parser -> AST tuples
  interp.py  tree-walking evaluator + JS stdlib
  dom.py     HTML parser, DOM nodes, CSS selector subset, events
  harness.py browser-page harness wiring a minijs window to the app
"""

from scripts.minijs.interp import Interpreter, JSError  # noqa: F401
