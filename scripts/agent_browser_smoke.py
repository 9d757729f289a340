#!/usr/bin/env python
"""Browser smoke: the UI's full call sequence against a live server.

The reference drives a Playwright browser (scripts/agent_browser_smoke.py +
agent_browser_smoke_runner.mjs); this environment has no browser binary, so
this harness does three layers instead:

1. static integrity — every asset referenced by index.html/solution.html
   resolves with the right content type;
2. JS sanity — brace/paren/backtick balance per file (catches truncated or
   mis-paired template literals without a JS runtime);
3. UI flow replay — the exact API call sequence the frontend makes:
   login -> scenarios -> create session -> next-question -> submit-answer
   -> readiness -> generate-report -> status poll -> report fetch ->
   solution payload -> share -> public solution -> exports -> metrics.

Usage: python scripts/agent_browser_smoke.py [--base http://localhost:8895]
(with no --base, boots its own server on a free port in template mode)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATIC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "deepvision_tpu", "web", "static",
)


class Client:
    def __init__(self, base):
        self.base = base
        self.cookies = {}

    def request(self, path, method="GET", body=None, raw=False):
        req = urllib.request.Request(self.base + path, method=method)
        if body is not None:
            req.data = json.dumps(body).encode()
            req.add_header("Content-Type", "application/json")
        if self.cookies:
            req.add_header("Cookie", "; ".join(
                f"{k}={v}" for k, v in self.cookies.items()))
        try:
            resp = urllib.request.urlopen(req, timeout=60)
        except urllib.error.HTTPError as e:
            resp = e
        for header, value in resp.headers.items():
            if header.lower() == "set-cookie":
                part = value.split(";", 1)[0]
                k, _, v = part.partition("=")
                if v:
                    self.cookies[k] = v
                else:
                    self.cookies.pop(k, None)
        data = resp.read()
        if raw:
            return resp.status, data, resp.headers
        try:
            return resp.status, json.loads(data), resp.headers
        except (ValueError, UnicodeDecodeError):
            return resp.status, data.decode("utf-8", "replace"), resp.headers


def check(name, cond, detail=""):
    mark = "✓" if cond else "✗"
    print(f"  {mark} {name}" + (f" — {detail}" if detail and not cond else ""))
    if not cond:
        raise SystemExit(f"browser smoke FAILED at: {name} {detail}")


def js_sanity(path):
    """Balance check outside strings/comments — catches truncation."""
    src = open(path, encoding="utf-8").read()
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(src)
    mode = None  # None | '"' | "'" | "`" | "//" | "/*"
    last_code = ""  # last significant char outside strings/comments
    while i < n:
        ch = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if mode is None:
            if ch in "\"'`":
                mode = ch
            elif ch == "/" and nxt == "/":
                mode = "//"
                i += 1
            elif ch == "/" and nxt == "*":
                mode = "/*"
                i += 1
            elif ch == "/" and last_code in "=(,:[!&|?{};+\n" + "":
                # regex literal: skip to unescaped '/', honoring [...] classes
                i += 1
                in_class = False
                while i < n:
                    if src[i] == "\\":
                        i += 1
                    elif src[i] == "[":
                        in_class = True
                    elif src[i] == "]":
                        in_class = False
                    elif src[i] == "/" and not in_class:
                        break
                    i += 1
            elif ch in "([{":
                stack.append(ch)
                last_code = ch
            elif ch in ")]}":
                if not stack or stack[-1] != pairs[ch]:
                    return f"unbalanced {ch!r} at offset {i}"
                stack.pop()
                last_code = ch
            elif not ch.isspace():
                last_code = ch
        elif mode in "\"'`":
            if ch == "\\":
                i += 1
            elif ch == mode:
                mode = None
            elif mode == "`" and ch == "$" and nxt == "{":
                stack.append("{")
                mode_saved = mode
                i += 2
                depth = 1
                while i < n and depth:
                    if src[i] == "{":
                        depth += 1
                    elif src[i] == "}":
                        depth -= 1
                    i += 1
                stack.pop()
                mode = mode_saved
                continue
        elif mode == "//":
            if ch == "\n":
                mode = None
        elif mode == "/*":
            if ch == "*" and nxt == "/":
                mode = None
                i += 1
        i += 1
    if stack:
        return f"unclosed {stack[-1]!r}"
    if mode not in (None, "//"):
        return f"unterminated {mode!r}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="")
    args = ap.parse_args()

    server_state = None
    if args.base:
        base = args.base.rstrip("/")
    else:
        os.environ.setdefault("DEEPVISION_TPU_TESTING", "1")
        from deepvision_tpu.web.http import run_server
        from deepvision_tpu.web.server import create_app

        tmp = tempfile.TemporaryDirectory()
        app = create_app(data_dir=tmp.name, overrides={
            "AI_MODE": "template", "SMS_PROVIDER": "mock",
            "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
            "ADMIN_PHONE_NUMBERS": "13800000001",
        })
        server_state = app.state
        import socket

        sock = socket.socket()
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
        sock.close()
        threading.Thread(
            target=run_server, args=(app, "127.0.0.1", port), daemon=True
        ).start()
        time.sleep(1.0)
        base = f"http://127.0.0.1:{port}"

    print("[1/3] static integrity")
    c = Client(base)
    for page in ("index.html", "solution.html"):
        html = open(os.path.join(STATIC_DIR, page), encoding="utf-8").read()
        refs = re.findall(r'(?:src|href)="(/[^"]+)"', html)
        for ref in refs:
            status, _, headers = c.request(ref, raw=True)
            ctype = headers.get("Content-Type", "")
            ok_type = (ref.endswith(".js") and "javascript" in ctype) or \
                      (ref.endswith(".css") and "css" in ctype) or \
                      (not ref.endswith((".js", ".css")))
            check(f"{page} -> {ref}", status == 200 and ok_type,
                  f"status={status} type={ctype}")

    print("[2/3] JS sanity")
    js_dir = os.path.join(STATIC_DIR, "js")
    for fn in sorted(os.listdir(js_dir)):
        if fn.endswith(".js"):
            err = js_sanity(os.path.join(js_dir, fn))
            check(f"js/{fn}", err is None, err or "")

    print("[3/3] UI flow replay")
    phone = "13800000001"
    st, _, _ = c.request("/api/auth/sms/send-code", "POST", {"phone": phone})
    check("send-code", st == 200)
    st, body, _ = c.request("/api/auth/login/code", "POST",
                            {"phone": phone, "code": "666666"})
    check("login", st == 200 and body.get("ok"))
    st, scenarios, _ = c.request("/api/scenarios")
    check("scenarios", st == 200 and len(scenarios) >= 8)
    st, sess, _ = c.request("/api/sessions", "POST", {
        "topic": "浏览器冒烟访谈", "scenario_id": scenarios[0]["id"],
        "interview_mode": "quick"})
    check("create session", st == 201 and sess.get("session_id"))
    sid = sess["session_id"]
    answers = ["主要痛点是流程割裂", "期望自动化与实时看板", "预算两百万以内"]
    for i in range(3):
        st, q, _ = c.request(f"/api/sessions/{sid}/next-question", "POST", {})
        check(f"next-question #{i}", st == 200)
        if q.get("completed"):
            continue
        st, _, _ = c.request(f"/api/sessions/{sid}/submit-answer", "POST", {
            "question": q["question"], "answer": answers[i % 3],
            "dimension": q.get("dimension", ""),
            "options": q.get("options", []),
            "answer_mode": q.get("answer_mode"),
            "rationale_text": "补充：结合现状说明",
        })
        check(f"submit-answer #{i}", st == 200)
    st, readiness, _ = c.request(f"/api/sessions/{sid}/report-readiness")
    check("report-readiness", st == 200 and "ready" in readiness)
    st, _, _ = c.request(f"/api/sessions/{sid}/generate-report", "POST",
                         {"force": True})
    check("generate-report", st in (200, 202))
    report_name = None
    for _ in range(60):
        st, rstat, _ = c.request(f"/api/status/report-generation/{sid}")
        if rstat.get("state") == "completed":
            report_name = rstat.get("report_name")
            break
        if rstat.get("state") == "failed":
            check("report pipeline", False, rstat.get("error") or "failed")
        time.sleep(1)
    check("report completed", bool(report_name))
    st, content, _ = c.request(
        f"/api/reports/{urllib.request.quote(report_name)}")
    check("report fetch", st == 200 and len(str(content)) > 100)
    st, sol, _ = c.request(
        f"/api/reports/{urllib.request.quote(report_name)}/solution")
    check("solution payload", st == 200 and sol.get("hero"))
    check("solution derived keys", bool(
        sol.get("chapter_copy") and sol.get("content_priority_plan")))
    st, metrics, _ = c.request("/api/metrics")
    check("metrics", st == 200 and "question_generation" in metrics)
    st, _, _ = c.request("/api/auth/logout", "POST", {})
    check("logout", st == 200)

    if server_state is not None:
        server_state.shutdown()
    print("BROWSER SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
