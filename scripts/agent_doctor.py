#!/usr/bin/env python
"""Environment doctor (reference scripts/agent_doctor.py, harness doctor
step): diagnose runtime prerequisites and deployment health before
running suites or serving traffic.

Check groups:
  runtime    python/jax/numpy versions, JAX backend + device inventory
  package    import health, native lib, builtin scenario resources
  model      flagship tokenizer/checkpoint presence, vocab <= preset,
             constrained-decoding DFA disk cache, XLA compile cache
  data       data-dir writability, meta-index schema, session file <->
             index row consistency, disk headroom
  security   production-config refusals (placeholder SECRET_KEY, mock SMS
             with debug off, SMS_TEST_CODE in prod)
  serving    --deep only: one interpret-mode token through the full
             engine stack (tokenizer -> scheduler -> paged decode)

Exit 0 only when every selected check passes.  --json for machine use.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _runtime_checks(check):
    check("python", lambda: sys.version.split()[0])
    check("jax import", lambda: __import__("jax").__version__)
    check("numpy import", lambda: __import__("numpy").__version__)

    def backend():
        import jax

        devs = jax.devices()
        return f"{jax.default_backend()} x{len(devs)} ({devs[0].platform})"

    check("jax backend", backend)


def _package_checks(check):
    check("package import",
          lambda: __import__("deepvision_tpu").__version__)

    def scenarios_count():
        import tempfile

        from deepvision_tpu.web.meta_index import MetaIndex
        from deepvision_tpu.web.scenarios import ScenarioLoader

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


def _resolve_flagship() -> str:
    """Resolve 'auto' the same way the server's gateway does: the best
    in-repo trained checkpoint."""
    from deepvision_tpu.web import config as cfg

    name = cfg.QUESTION_MODEL_NAME
    if name in ("", "auto"):
        for m in ("dv-fast", "dv-base", "dv-mini"):
            if os.path.isfile(os.path.join(
                    ROOT, "resources", "checkpoints", f"{m}.npz")):
                return m
        return "dv-1b"
    return name


_TOKENIZER_BY_MODEL = {
    "dv-fast": "dv_bpe_16k.json",
    "dv-base": "dv_bpe_16k.json",
    "dv-mini": "dv_bpe_8k.json",
}


def _model_checks(check):
    def flagship():
        from deepvision_tpu.engine.config import get_model_config

        name = _resolve_flagship()
        get_model_config(name)  # raises on unknown preset
        return name

    check("flagship preset", flagship)

    def tokenizer():
        from deepvision_tpu.web import config as cfg

        name = _resolve_flagship()
        if cfg.ENGINE_TOKENIZER not in ("auto", "byte", ""):
            path = cfg.ENGINE_TOKENIZER
        else:
            fn = _TOKENIZER_BY_MODEL.get(name)
            path = (os.path.join(ROOT, "resources", "tokenizer", fn)
                    if fn else None)
        if path is None:
            return "byte tokenizer (no BPE pairing)"
        assert os.path.isfile(path), f"missing tokenizer {path}"
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(path)
        from deepvision_tpu.engine.config import get_model_config

        preset = get_model_config(name)
        assert tok.get_vocab_size() <= preset.vocab_size, (
            f"tokenizer vocab {tok.get_vocab_size()} exceeds preset "
            f"{preset.vocab_size}")
        return (f"{os.path.basename(path)} vocab={tok.get_vocab_size()} "
                f"<= {preset.vocab_size}")

    check("tokenizer/preset fit", tokenizer)

    def checkpoint():
        ck = os.path.join(ROOT, "resources", "checkpoints")
        files = [f for f in os.listdir(ck) if f.endswith(".npz")] \
            if os.path.isdir(ck) else []
        assert files, "no checkpoint under resources/checkpoints"
        sizes = {f: round(os.path.getsize(os.path.join(ck, f)) / 1e6)
                 for f in files}
        return ", ".join(f"{f} ({s}MB)" for f, s in sorted(sizes.items()))

    check("checkpoints", checkpoint)

    def compile_cache():
        path = os.path.expanduser("~/.cache/deepvision_tpu/jax_cache")
        if not os.path.isdir(path):
            return "absent (first TPU run will compile cold)"
        n = sum(len(fs) for _, _, fs in os.walk(path))
        return f"{n} entries"

    check("xla compile cache", compile_cache)


def _data_checks(check, data_dir):
    def writable():
        os.makedirs(data_dir, exist_ok=True)
        probe = os.path.join(data_dir, ".doctor_probe")
        with open(probe, "w") as fh:
            fh.write("ok")
        os.remove(probe)
        return data_dir

    check("data dir writable", writable)

    def schema():
        from deepvision_tpu.web.meta_index import MetaIndex

        meta = MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
        rows = meta.query(
            "SELECT name FROM sqlite_master WHERE type='table'")
        tables = {r["name"] for r in rows}
        need = {"session_index", "report_index", "site_config_store",
                "runtime_metrics_store", "summary_cache_store"}
        missing = need - tables
        assert not missing, f"missing tables: {sorted(missing)}"
        return f"{len(tables)} tables"

    check("meta-index schema", schema)

    def consistency():
        from deepvision_tpu.web.meta_index import MetaIndex

        meta = MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
        n_rows = meta.query_one(
            "SELECT COUNT(*) AS n FROM session_index")["n"]
        sess_dir = os.path.join(data_dir, "sessions")
        n_files = len([f for f in os.listdir(sess_dir)
                       if f.endswith(".json")]) \
            if os.path.isdir(sess_dir) else 0
        drift = abs(n_rows - n_files)
        assert drift == 0, (
            f"index/file drift: {n_rows} rows vs {n_files} files "
            f"(run session_manager.py repair)")
        return f"{n_files} sessions, index consistent"

    check("session index consistency", consistency)

    def disk():
        usage = shutil.disk_usage(os.path.abspath(data_dir if os.path.isdir(
            data_dir) else "."))
        free_gb = usage.free / 1e9
        assert free_gb > 1.0, f"only {free_gb:.1f}GB free"
        return f"{free_gb:.0f}GB free"

    check("disk headroom", disk)


def _security_checks(check):
    def prod_config():
        from deepvision_tpu.web import config as cfg

        problems = []
        debug = os.environ.get("DEBUG_MODE", str(cfg.DEBUG_MODE)).lower() \
            in ("1", "true", "yes")
        secret = os.environ.get("SECRET_KEY", cfg.SECRET_KEY)
        sms = os.environ.get("SMS_PROVIDER", cfg.SMS_PROVIDER)
        test_code = os.environ.get("SMS_TEST_CODE", cfg.SMS_TEST_CODE)
        if not debug:
            if secret == "dev-secret-change-me":
                problems.append("placeholder SECRET_KEY in production")
            if sms == "mock":
                problems.append("mock SMS provider in production")
            if test_code:
                problems.append("SMS_TEST_CODE set in production")
        assert not problems, "; ".join(problems)
        return "debug mode (dev defaults allowed)" if debug else "prod clean"

    check("security config", prod_config)


def _serving_check(check):
    def one_token():
        from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

        eng = LLMEngine(EngineConfig(
            model="dv-tiny-test", tokenizer="byte", max_slots=1,
            num_pages=32, page_size=16, max_pages_per_seq=4,
            interpret=True, seed=0))
        try:
            text, meta = eng.generate_text(
                "诊断", max_tokens=2, temperature=0.0, timeout=120)
            assert meta["completion_tokens"] >= 1
            return f"{meta['completion_tokens']} tokens decoded"
        finally:
            eng.shutdown()

    check("engine smoke (interpret)", one_token)


def main():
    p = argparse.ArgumentParser(description="environment doctor")
    p.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    p.add_argument("--deep", action="store_true",
                   help="also run the interpret-mode engine smoke")
    p.add_argument("--tpu", action="store_true",
                   help="probe the real accelerator backend (default: CPU "
                        "— the tunneled chip tolerates ONE process at a "
                        "time, and a doctor run must never corrupt a "
                        "training/serving process that holds it)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    checks = []

    def check(name, fn):
        try:
            detail = fn()
            checks.append((name, True, str(detail)))
        except Exception as e:  # noqa: BLE001
            checks.append((name, False, f"{type(e).__name__}: {e}"))

    _runtime_checks(check)
    _package_checks(check)
    _model_checks(check)
    _data_checks(check, args.data_dir)
    _security_checks(check)
    if args.deep:
        _serving_check(check)

    ok = all(passed for _, passed, _ in checks)
    if args.json:
        print(json.dumps({
            "ok": ok,
            "checks": [{"name": n, "passed": p_, "detail": d}
                       for n, p_, d in checks],
        }, ensure_ascii=False, indent=1))
    else:
        for name, passed, detail in checks:
            print(f"{'✅' if passed else '❌'} {name}: {detail}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
