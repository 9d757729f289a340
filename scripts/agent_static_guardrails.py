#!/usr/bin/env python
"""Static dependency-direction + security guardrails (reference
scripts/agent_static_guardrails.py, 806 LoC): enforce the layer rules from
ARCHITECTURE.md and the route-auth invariants at source level.

Rules:
  1. engine/ must not import web/ (the engine is app-agnostic).
  2. web/ modules must not import scripts/ (business code never depends on
     ops tooling; reference ARCHITECTURE.md:189).
  3. engine/kernels/ must not import torch (TPU compute path is JAX-only).
  4. web/runtime must not construct LLMEngine directly — model access goes
     through the gateway (single seam for tests + metrics).
  5. every @app.route handler must authenticate (require_user /
     require_admin / current_user / share-token resolution) unless its
     path is on the explicit PUBLIC_ROUTES list — the static version of
     the reference's protected-route matcher (web/server.py:12841).
  6. no eval()/exec()/pickle in the package (payloads come from users).
  7. tests/conftest.py must force the CPU platform (the tunneled TPU
     tolerates ONE process; a stray pytest run must never grab it).
"""

from __future__ import annotations

import ast
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "deepvision_tpu")

# Routes that are public by design (match by prefix).
PUBLIC_ROUTES = (
    "/",
    "/site-config.js",
    "/<static:filename>",
    "/api/status",
    "/api/auth/sms/send-code",
    "/api/auth/login/code",
    "/api/auth/wechat/login-url",
    "/api/auth/wechat/callback",
    "/api/auth/logout",
    "/api/auth/me",            # returns anonymous marker when logged out
    "/api/auth/recover/send-code",
    "/api/auth/recover/login",
    "/api/auth/register",      # legacy password auth (pre-SMS clients)
    "/api/auth/login",
    "/api/auth/wechat/start",  # begins the OAuth dance
    "/api/public/",            # share-token namespace (token IS the auth)
)

AUTH_TOKENS = re.compile(
    r"require_user\(|require_admin\(|current_user\(|resolve_share\("
)


def iter_py(subdir):
    for dirpath, _dirs, files in os.walk(os.path.join(PKG, subdir)):
        for name in files:
            if name.endswith(".py"):
                yield os.path.join(dirpath, name)


def check_imports(violations):
    for path in iter_py("engine"):
        src = open(path, encoding="utf-8").read()
        if re.search(r"^\s*(from|import)\s+deepvision_tpu\.web", src, re.M):
            violations.append(f"{path}: engine imports web layer")

    for path in iter_py("web"):
        src = open(path, encoding="utf-8").read()
        if re.search(r"^\s*(from|import)\s+scripts\b", src, re.M):
            violations.append(f"{path}: web imports scripts/")

    for path in iter_py(os.path.join("engine", "kernels")):
        src = open(path, encoding="utf-8").read()
        if re.search(r"^\s*(from|import)\s+torch\b", src, re.M):
            violations.append(f"{path}: kernel imports torch")

    for path in iter_py(os.path.join("web", "runtime")):
        src = open(path, encoding="utf-8").read()
        if "LLMEngine(" in src:
            violations.append(
                f"{path}: runtime constructs LLMEngine directly "
                "(use the gateway)"
            )


def _route_paths(decorator) -> list:
    """Extract route path strings from an @app.route(...) decorator."""
    if not (isinstance(decorator, ast.Call)
            and isinstance(decorator.func, ast.Attribute)
            and decorator.func.attr == "route"):
        return []
    return [a.value for a in decorator.args
            if isinstance(a, ast.Constant) and isinstance(a.value, str)]


def check_route_auth(violations):
    """Rule 5: unauthenticated handlers must be explicitly public."""
    for path in iter_py(os.path.join("web", "routes")):
        src = open(path, encoding="utf-8").read()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            routes = []
            for dec in node.decorator_list:
                routes.extend(_route_paths(dec))
            if not routes:
                continue
            body_src = ast.get_source_segment(src, node) or ""
            authed = bool(AUTH_TOKENS.search(body_src))
            public = all(
                any(r == pub
                    or (len(pub) > 1 and pub.endswith("/")
                        and r.startswith(pub))
                    for pub in PUBLIC_ROUTES)
                for r in routes
            )
            if not authed and not public:
                violations.append(
                    f"{path}: handler {node.name} for {routes} has no "
                    "auth call and is not on PUBLIC_ROUTES"
                )


def check_dangerous_calls(violations):
    for path in iter_py(""):
        src = open(path, encoding="utf-8").read()
        for pattern, what in (
            (r"(?<![\w.])eval\(", "eval()"),
            (r"(?<![\w.])exec\(", "exec()"),
            (r"^\s*(from|import)\s+pickle\b", "pickle import"),
        ):
            if re.search(pattern, src, re.M):
                violations.append(f"{path}: {what} in package code")


def check_conftest_cpu(violations):
    path = os.path.join(ROOT, "tests", "conftest.py")
    src = open(path, encoding="utf-8").read()
    if 'jax_platforms"' not in src and "jax_platforms'" not in src:
        violations.append(
            f"{path}: does not force the CPU platform "
            "(one-TPU-process rule)"
        )


def main():
    violations = []
    check_imports(violations)
    check_route_auth(violations)
    check_dangerous_calls(violations)
    check_conftest_cpu(violations)

    if violations:
        print(f"{len(violations)} guardrail violations:")
        for v in violations:
            print(" -", os.path.relpath(v, ROOT))
        return 1
    print("static guardrails OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
