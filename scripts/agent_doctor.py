#!/usr/bin/env python
"""Environment doctor (reference agent harness doctor step): verify the
runtime prerequisites before running suites."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    checks = []

    def check(name, fn):
        try:
            detail = fn()
            checks.append((name, True, detail))
        except Exception as e:  # noqa: BLE001
            checks.append((name, False, f"{type(e).__name__}: {e}"))

    check("python", lambda: sys.version.split()[0])
    check("jax import", lambda: __import__("jax").__version__)
    check("numpy import", lambda: __import__("numpy").__version__)
    check("package import",
          lambda: __import__("deepvision_tpu").__version__)
    check("builtin scenarios", lambda: str(len(__import__(
        "deepvision_tpu.web.scenarios", fromlist=["ScenarioLoader"]
    ).ScenarioLoader.__init__.__defaults__ or [])) and "present")

    def scenarios_count():
        from deepvision_tpu.web.meta_index import MetaIndex
        from deepvision_tpu.web.scenarios import ScenarioLoader
        import tempfile

        with tempfile.TemporaryDirectory() as t:
            meta = MetaIndex(os.path.join(t, "m.sqlite3"))
            n = len(ScenarioLoader(meta).builtins())
            assert n == 8, f"expected 8 builtin scenarios, found {n}"
            return f"{n} builtin"

    check("scenario resources", scenarios_count)

    def native():
        from deepvision_tpu.native import native_available

        return "built" if native_available() else "fallback (g++ missing?)"

    check("native lib", native)

    ok = all(passed for _, passed, _ in checks)
    for name, passed, detail in checks:
        print(f"{'✅' if passed else '❌'} {name}: {detail}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
