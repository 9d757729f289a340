"""Ops/migration CLI coverage (reference tests/test_scripts_comprehensive.py):
import -> rollback cycle with conflict policies and safety guards,
object-storage sync, observe local mode, evidence backfill CLI."""

import json
import os
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(name, *argv, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", name), *argv],
        capture_output=True, text=True, env=env, cwd=ROOT,
    )


@pytest.fixture()
def dirs():
    src = tempfile.TemporaryDirectory()
    dst = tempfile.TemporaryDirectory()
    # a source deployment with one session + one report
    os.makedirs(os.path.join(src.name, "sessions"))
    os.makedirs(os.path.join(src.name, "reports"))
    session = {
        "session_id": "dv-20260101000000-aaaa1111",
        "topic": "迁移测试访谈",
        "status": "completed",
        "interview_log": [
            {"question": "现状如何？", "answer": "流程割裂，因为系统多",
             "dimension": "d1"},
        ],
        "dimensions": {}, "reference_materials": [],
        "current_report_name": "迁移-r1.md",
    }
    with open(os.path.join(src.name, "sessions",
                           "dv-20260101000000-aaaa1111.json"), "w",
              encoding="utf-8") as fh:
        json.dump(session, fh, ensure_ascii=False)
    with open(os.path.join(src.name, "reports", "迁移-r1.md"), "w",
              encoding="utf-8") as fh:
        fh.write("# 迁移报告\n\n内容")
    # one malformed session to exercise the reject list
    with open(os.path.join(src.name, "sessions", "bad.json"), "w") as fh:
        fh.write("{not json")
    yield src.name, dst.name
    src.cleanup()
    dst.cleanup()


def _manifest_path(data_dir):
    ops = os.path.join(data_dir, "operations")
    names = [n for n in os.listdir(ops) if n.startswith("import-")]
    assert names, os.listdir(ops)
    return os.path.join(ops, sorted(names)[-1])


def test_import_then_rollback_cycle(dirs):
    src, dst = dirs
    r = run_script("import_external_local_data_to_cloud.py", src,
                   "--data-dir", dst, "--owner", "7")
    assert r.returncode == 0, r.stderr
    assert "imported 1 sessions, 1 reports" in r.stdout
    assert "1 rejected" in r.stdout  # bad.json

    # imported session got evidence backfill + restamped ownership
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(dst, "meta_index.sqlite3"))
    sess = SessionStore(dst, meta).load("dv-20260101000000-aaaa1111")
    assert sess["owner_user_id"] == "7"
    assert sess["interview_log"][0].get("evidence_class")

    # rollback removes both and archives content
    manifest = _manifest_path(dst)
    r = run_script("rollback_external_import.py", manifest,
                   "--data-dir", dst)
    assert r.returncode == 0, r.stderr + r.stdout
    assert "rolled back 1 sessions, 1 reports" in r.stdout
    assert SessionStore(dst, meta).load(
        "dv-20260101000000-aaaa1111") is None
    # double rollback is a no-op
    r = run_script("rollback_external_import.py", manifest,
                   "--data-dir", dst)
    assert "already rolled back" in r.stdout


def test_import_conflict_policies(dirs):
    src, dst = dirs
    run_script("import_external_local_data_to_cloud.py", src,
               "--data-dir", dst, "--owner", "7")
    # second import: skip (default)
    r = run_script("import_external_local_data_to_cloud.py", src,
                   "--data-dir", dst, "--owner", "7")
    assert "imported 0 sessions" in r.stdout
    assert "2 conflicts" in r.stdout
    # suffix policy re-ids and remaps the session's report binding
    r = run_script("import_external_local_data_to_cloud.py", src,
                   "--data-dir", dst, "--owner", "8",
                   "--on-conflict", "suffix")
    assert "imported 1 sessions, 1 reports" in r.stdout
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(dst, "meta_index.sqlite3"))
    rows = meta.query("SELECT session_id FROM session_index")
    sids = {r["session_id"] for r in rows}
    suffixed = [s for s in sids if s != "dv-20260101000000-aaaa1111"]
    assert suffixed
    sess = SessionStore(dst, meta).load(suffixed[0])
    assert sess["current_report_name"] != "迁移-r1.md"  # remapped


def test_rollback_refuses_modified_records(dirs):
    src, dst = dirs
    run_script("import_external_local_data_to_cloud.py", src,
               "--data-dir", dst, "--owner", "7")
    # touch the imported session (simulate continued interview)
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(dst, "meta_index.sqlite3"))
    store = SessionStore(dst, meta)
    sess = store.load("dv-20260101000000-aaaa1111")
    sess["summary"] = "后续修改"
    import time as _t
    _t.sleep(1.1)  # ensure updated_at advances past manifest timestamp
    store.save(sess)

    r = run_script("rollback_external_import.py", _manifest_path(dst),
                   "--data-dir", dst)
    assert r.returncode == 1
    assert "modified after import" in r.stdout
    assert store.load("dv-20260101000000-aaaa1111") is not None
    # --force removes it (fresh store: the old one holds a payload cache)
    r = run_script("rollback_external_import.py", _manifest_path(dst),
                   "--data-dir", dst, "--force")
    assert r.returncode == 0
    fresh = SessionStore(dst, MetaIndex(
        os.path.join(dst, "meta_index.sqlite3")))
    assert fresh.load("dv-20260101000000-aaaa1111") is None


def test_sync_object_storage_kinds(dirs):
    src, dst = dirs
    run_script("import_external_local_data_to_cloud.py", src,
               "--data-dir", dst, "--owner", "7")
    r = run_script("sync_object_storage_history.py", "--data-dir", dst,
                   "--kinds", "reports,operations", "--verify",
                   env_extra={"DEEPVISION_TPU_TESTING": "1"})
    assert r.returncode == 0, r.stderr
    assert "failed=0" in r.stdout
    # objects landed in the local FS backend
    obj_root = os.path.join(dst, "object_storage")
    found = []
    for base, _, files in os.walk(obj_root):
        found.extend(files)
    assert found


def test_observe_local_mode(dirs):
    src, dst = dirs
    run_script("import_external_local_data_to_cloud.py", src,
               "--data-dir", dst, "--owner", "7")
    r = run_script("agent_observe.py", "--local", "--data-dir", dst,
                   "--json")
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout)
    assert data["sessions"]["n"] == 1
    assert data["reports"]["n"] == 1
    assert data["recent_sessions"]


def test_backfill_cli(dirs):
    src, dst = dirs
    run_script("import_external_local_data_to_cloud.py", src,
               "--data-dir", dst, "--owner", "7")
    # strip annotations then backfill via the CLI
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(dst, "meta_index.sqlite3"))
    store = SessionStore(dst, meta)
    sess = store.load("dv-20260101000000-aaaa1111")
    for e in sess["interview_log"]:
        e.pop("evidence_class", None)
        e.pop("quality_score", None)
    store.save(sess)
    r = run_script("backfill_evidence_annotations.py", "--data-dir", dst)
    assert r.returncode == 0, r.stderr
    assert "1 entries across 1 sessions" in r.stdout


def test_version_manager_lifecycle(tmp_path, monkeypatch):
    """add -> validate -> next -> release -> notes (reference
    scripts/version_manager.py release aggregation)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vm", os.path.join(ROOT, "scripts", "version_manager.py"))
    vm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vm)
    monkeypatch.setattr(vm, "FRAGMENTS_DIR", str(tmp_path / "unreleased"))
    monkeypatch.setattr(vm, "VERSION_JSON", str(tmp_path / "version.json"))

    class A:  # argparse shim
        pass

    a = A(); a.kind = "feature"; a.summary = "新增引擎路由"
    vm.cmd_add(a)
    a = A(); a.kind = "fix"; a.summary = "修复回滚竞态"
    vm.cmd_add(a)
    a = A()
    assert vm.cmd_validate(a) == 0
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vm.cmd_next(A())
    assert buf.getvalue().strip() == "0.1.0"  # feature -> minor bump

    a = A(); a.version = "0.1.0"; a.force = False
    vm.cmd_release(a)
    data = json.load(open(tmp_path / "version.json", encoding="utf-8"))
    assert data["version"] == "0.1.0"
    assert len(data["releases"][0]["changes"]) == 2
    assert not os.listdir(tmp_path / "unreleased")  # fragments consumed

    a = A(); a.unreleased = False
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vm.cmd_notes(a)
    notes = buf.getvalue()
    assert "0.1.0" in notes and "新增引擎路由" in notes

    # invalid fragment caught
    (tmp_path / "unreleased" / "bad.json").write_text(
        '{"kind": "nope", "summary": ""}', encoding="utf-8")
    assert vm.cmd_validate(A()) == 1


# ---------------------------------------------------------------------------
# session_manager / report_generator / convert_doc CLI workflows
# ---------------------------------------------------------------------------

@pytest.fixture()
def seeded_data_dir():
    """A data dir with two sessions written through the real store (index
    rows present) — what the ops CLIs operate against."""
    tmp = tempfile.TemporaryDirectory()
    sys.path.insert(0, ROOT)
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(tmp.name, "meta_index.sqlite3"))
    store = SessionStore(tmp.name, meta)
    for i, status in enumerate(["completed", "in_progress"]):
        store.save({
            "session_id": f"dv-2026010100000{i}-feed000{i}",
            "topic": f"CLI测试主题{i}",
            "status": status,
            "instance_scope": "default",
            "owner_user_id": "u1",
            "interview_mode": "standard",
            "scenario_id": "product-requirement",
            "created_at": "2026-01-01T00:00:00Z",
            "updated_at": "2026-01-01T00:00:00Z",
            "interview_log": [
                {"question": "现状如何？", "answer": "高峰期单据积压严重，"
                 "主要卡在审批环节", "dimension": "d1",
                 "quality_score": 0.8},
                {"question": "目标是什么？", "answer": "两小时内处理完",
                 "dimension": "d1", "quality_score": 0.5},
            ],
            "dimensions": {"d1": {"coverage": 1.0}},
            "reference_materials": [],
        })
    yield tmp.name
    tmp.cleanup()


def test_session_manager_stats_and_search(seeded_data_dir):
    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "stats")
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout)
    assert stats["sessions"] == 2 and stats["answers"] == 4
    assert stats["by_status"] == {"completed": 1, "in_progress": 1}
    assert stats["answer_quality"]["high"] == 2

    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "search", "审批环节")
    assert r.returncode == 0
    assert "dv-20260101000000-feed0000" in r.stdout


def test_session_manager_repair_rebuilds_index(seeded_data_dir):
    from deepvision_tpu.web.meta_index import MetaIndex

    meta = MetaIndex(os.path.join(seeded_data_dir, "meta_index.sqlite3"))
    # simulate index drift: drop one row, add one orphan
    meta.execute("DELETE FROM session_index WHERE session_id = ?",
                 ("dv-20260101000000-feed0000",))
    meta.execute(
        "INSERT INTO session_index (session_id, instance_scope, topic, "
        "status, updated_at, created_at) VALUES (?, 'default', 'x', "
        "'completed', '2026-01-01T00:00:00Z', '2026-01-01T00:00:00Z')",
        ("dv-ghost",))
    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "repair", "--dry-run")
    assert "would reindex dv-20260101000000-feed0000" in r.stdout
    assert "would drop orphan index row dv-ghost" in r.stdout
    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "repair")
    assert r.returncode == 0, r.stderr
    meta2 = MetaIndex(os.path.join(seeded_data_dir, "meta_index.sqlite3"))
    rows = meta2.query("SELECT session_id FROM session_index")
    ids = {row["session_id"] for row in rows}
    assert "dv-ghost" not in ids
    assert "dv-20260101000000-feed0000" in ids


def test_session_manager_trim(seeded_data_dir):
    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "trim", "--days", "0")
    assert "would delete" in r.stdout  # dry-run by default
    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "trim", "--days", "0", "--apply")
    assert r.returncode == 0
    # only the completed session is purged; a backup was taken first
    assert os.path.isdir(os.path.join(seeded_data_dir, "session_backups"))
    r = run_script("session_manager.py", "--data-dir", seeded_data_dir,
                   "stats")
    assert json.loads(r.stdout)["sessions"] == 1


def test_report_generator_batch_and_readiness(seeded_data_dir):
    r = run_script("report_generator.py", "--data-dir", seeded_data_dir,
                   "readiness", "--all")
    assert r.returncode == 0, r.stderr
    assert "READY" in r.stdout
    r = run_script("report_generator.py", "--data-dir", seeded_data_dir,
                   "generate", "--all", "--status", "completed",
                   "--workers", "2")
    assert r.returncode == 0, r.stderr
    assert "reports/min" in r.stdout
    # report bound back to the session
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(seeded_data_dir, "meta_index.sqlite3"))
    store = SessionStore(seeded_data_dir, meta)
    s = store.load("dv-20260101000000-feed0000")
    assert s["last_report_name"]
    assert s["last_report_quality_meta"]


def test_convert_doc_inspect_and_batch(tmp_path):
    src = tmp_path / "docs"
    out = tmp_path / "out"
    cache = tmp_path / "cache"
    src.mkdir()
    (src / "a.md").write_text("# 标题\n\n正文" * 50, encoding="utf-8")
    (src / "b.txt").write_text("纯文本内容\n" * 100, encoding="utf-8")
    (src / "skip.bin").write_bytes(b"\x00\x01")

    r = run_script("convert_doc.py", "inspect", str(src / "a.md"))
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout)
    assert info["type"] == "md" and info["supported"] and info["chars"] > 100

    r = run_script("convert_doc.py", "batch", str(src), str(out),
                   "--cache-dir", str(cache))
    assert r.returncode == 0, r.stderr
    stats = json.loads(r.stdout)
    assert stats["files"] == 2 and stats["failed"] == 0
    assert (out / "a.md").exists() and (out / "b.md").exists()
    # second run: everything served from the sha256 cache
    r = run_script("convert_doc.py", "batch", str(src), str(out),
                   "--cache-dir", str(cache))
    assert json.loads(r.stdout)["cache_hits"] == 2


def test_identity_audit_finds_and_fixes(seeded_data_dir):
    from deepvision_tpu.web.meta_index import MetaIndex

    meta = MetaIndex(os.path.join(seeded_data_dir, "meta_index.sqlite3"))
    # inject: missing scope + cross-owner report binding + dangling share
    meta.execute(
        "UPDATE session_index SET instance_scope = '' WHERE session_id = ?",
        ("dv-20260101000000-feed0000",))
    meta.execute(
        "INSERT INTO report_index (report_name, owner_user_id, "
        "instance_scope, session_id, deleted, created_at) VALUES "
        "(?, 'u2', 'default', 'dv-20260101000001-feed0001', 0, "
        "'2026-01-01T00:00:00Z')", ("审计-r1.md",))
    meta.execute(
        "INSERT INTO report_meta_shares (report_name, share_token, "
        "created_at) VALUES (?, 'tok12345', '2026-01-01T00:00:00Z')",
        ("不存在的报告.md",))

    r = run_script("audit_identity_isolation.py", "--data-dir",
                   seeded_data_dir, "--json")
    assert r.returncode == 1, r.stdout + r.stderr
    payload = json.loads(r.stdout)
    kinds = {p["kind"] for p in payload["problems"]}
    assert "session_missing_scope" in kinds
    assert "binding_cross_owner" in kinds
    assert "share_to_missing_report" in kinds

    # --apply stamps the missing scope (and only that)
    r = run_script("audit_identity_isolation.py", "--data-dir",
                   seeded_data_dir, "--apply", "--json")
    payload = json.loads(r.stdout)
    assert payload["fixes_applied"] == 1
    meta2 = MetaIndex(os.path.join(seeded_data_dir, "meta_index.sqlite3"))
    row = meta2.query_one(
        "SELECT instance_scope FROM session_index WHERE session_id = ?",
        ("dv-20260101000000-feed0000",))
    assert row["instance_scope"] == "default"


def test_auth_migration_rehearsal_and_verify(tmp_path):
    """sqlite->sqlite rehearsal of the auth migration: copy, verify
    checksums, idempotent re-run (conflicts skipped, not duplicated)."""
    import sqlite3

    sys.path.insert(0, ROOT)
    from deepvision_tpu.web.authn import AUTH_SCHEMA, hash_code

    src_path = str(tmp_path / "auth_src.sqlite3")
    dst_path = str(tmp_path / "auth_dst.sqlite3")
    conn = sqlite3.connect(src_path)
    for ddl in AUTH_SCHEMA:
        conn.execute(ddl)
    conn.execute(
        "INSERT INTO users (phone, nickname, level, is_admin, created_at) "
        "VALUES ('13800000001', '管理员', 'professional', 1, "
        "'2026-01-01T00:00:00Z')")
    conn.execute(
        "INSERT INTO users (phone, nickname, level, created_at) "
        "VALUES ('13900000002', '普通用户', 'standard', "
        "'2026-01-01T00:00:00Z')")
    conn.execute(
        "INSERT INTO wechat_identities (openid, user_id, bound_at) "
        "VALUES ('wx-open-1', 1, '2026-01-01T00:00:00Z')")
    conn.execute(
        "INSERT INTO auth_meta (key, value) VALUES ('license_secret', 's')")
    conn.execute(
        "INSERT INTO auth_sms_codes (phone, code_hash, created_at, "
        "expires_at) VALUES ('13800000001', ?, 0, 0)",
        (hash_code("13800000001", "123456"),))
    conn.commit()
    conn.close()

    r = run_script("migrate_auth_sqlite_to_postgres.py", src_path, dst_path,
                   "--allow-sqlite-target", "--verify")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "verify OK" in r.stdout
    assert "users: 2 rows (+2 inserted, 0 skipped)" in r.stdout

    # idempotent re-run: unique keys skip, nothing duplicated
    r = run_script("migrate_auth_sqlite_to_postgres.py", src_path, dst_path,
                   "--allow-sqlite-target", "--tables",
                   "users,wechat_identities,auth_meta", "--verify")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "users: 2 rows (+0 inserted, 2 skipped)" in r.stdout

    dst = sqlite3.connect(dst_path)
    n = dst.execute("SELECT COUNT(*) FROM users").fetchone()[0]
    assert n == 2


# ---------------------------------------------------------------------------
# ownership-migration CLI (scripts/admin_migrate_ownership.py — reference
# scripts/admin_migrate_ownership.py:1 operator workflows without HTTP)
# ---------------------------------------------------------------------------

@pytest.fixture()
def owned_dir():
    tmp = tempfile.TemporaryDirectory()
    from deepvision_tpu.web.server import AppState

    state = AppState(data_dir=tmp.name, overrides={
        "AI_MODE": "off", "SMS_PROVIDER": "mock",
        "SECRET_KEY": "ownership-test"})
    u1 = state.auth.upsert_user_by_phone("13900000201")
    u2 = state.auth.upsert_user_by_phone("13900000202")
    for i in range(2):
        state.sessions.save({
            "session_id": f"dv-20260102000000-own{i:05d}",
            "owner_user_id": str(u1["user_id"]),
            "instance_scope": state.instance_scope,
            "topic": f"归属迁移{i}", "status": "in_progress",
            "created_at": "2026-01-02T00:00:00Z",
            "updated_at": "2026-01-02T00:00:00Z",
            "interview_log": [], "dimensions": {},
            "reference_materials": [],
        })
    yield tmp.name, str(u1["user_id"]), str(u2["user_id"])
    tmp.cleanup()


def test_ownership_cli_dry_run_changes_nothing(owned_dir):
    data_dir, u1, u2 = owned_dir
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "migrate", "--from-user-id", u1, "--to-user-id", u2)
    assert r.returncode == 0, r.stderr
    assert "DRY-RUN" in r.stdout
    assert "会话 2 个" in r.stdout
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "audit", "--user-id", u1)
    assert '"session_count": 2' in r.stdout


def test_ownership_cli_apply_and_rollback(owned_dir):
    data_dir, u1, u2 = owned_dir
    summary = os.path.join(data_dir, "summary.json")
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "migrate", "--from-user-id", u1, "--to-user-id", u2,
                   "--apply", "--summary-json", summary)
    assert r.returncode == 0, r.stderr
    assert "已执行：会话 2 个" in r.stdout
    with open(summary, encoding="utf-8") as fh:
        s = json.load(fh)
    assert s["result"]["moved_sessions"] == 2
    backup = s["result"]["backup"]

    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "audit", "--user-id", u2)
    assert '"session_count": 2' in r.stdout

    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "rollback", "--backup", backup)
    assert r.returncode == 0 and "已回滚 2 条" in r.stdout
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "audit", "--user-id", u1)
    assert '"session_count": 2' in r.stdout
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "history")
    assert "apply" in r.stdout and "rollback" in r.stdout


def test_ownership_cli_kinds_filter_and_user_listing(owned_dir):
    data_dir, u1, u2 = owned_dir
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "list-users", "--query", "13900000201")
    assert r.returncode == 0 and "13900000201" in r.stdout
    # reports-only migration must not move sessions
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "migrate", "--from-user-id", u1,
                   "--to-account", "13900000202",
                   "--kinds", "reports", "--apply")
    assert r.returncode == 0, r.stderr
    assert "会话 0 个" in r.stdout
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "audit", "--user-id", u1)
    assert '"session_count": 2' in r.stdout


def test_ownership_cli_rejects_bad_input(owned_dir):
    data_dir, u1, _ = owned_dir
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "migrate", "--from-user-id", u1, "--to-user-id", u1)
    assert r.returncode != 0
    assert "相同" in (r.stdout + r.stderr)
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "migrate", "--from-user-id", u1, "--to-user-id", "999",
                   )
    assert r.returncode != 0
    r = run_script("admin_migrate_ownership.py", "--data-dir", data_dir,
                   "rollback", "--backup", "missing.json")
    assert r.returncode != 0


# ---------------------------------------------------------------------------
# preflight replay + evidence-annotation migration (reference
# scripts/replay_preflight_diagnostics.py:1 +
# migrate_session_evidence_annotations.py:1)
# ---------------------------------------------------------------------------

@pytest.fixture()
def legacy_dir():
    """A data dir with one legacy session lacking evidence annotations
    and with weak/uncovered dimensions (preflight must fire)."""
    tmp = tempfile.TemporaryDirectory()
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    meta = MetaIndex(os.path.join(tmp.name, "meta_index.sqlite3"))
    store = SessionStore(tmp.name, meta)
    store.save({
        "session_id": "dv-20260103000000-lega0001",
        "owner_user_id": "1", "instance_scope": "default",
        "topic": "遗留会话", "status": "in_progress",
        "created_at": "2026-01-03T00:00:00Z",
        "updated_at": "2026-01-03T00:00:00Z",
        "scenario_config": {"dimensions": [
            {"id": "goal", "name": "目标",
             "key_aspects": ["核心目标", "量化指标"]},
            {"id": "flow", "name": "流程", "key_aspects": ["现状流程"]},
        ]},
        "dimensions": {},
        "interview_log": [
            {"question": "目标是什么？", "answer": "提效", "dimension": "goal"},
            {"question": "再具体点？", "answer": "不太确定",
             "dimension": "goal", "is_follow_up": True},
            {"question": "预算？",
             "answer": "预算两百万元，必须兼容现有ERP接口，因为数据不出机房",
             "dimension": "goal",
             "rationale_text": "管理层定的硬约束"},
        ],
        "reference_materials": [],
    })
    yield tmp.name
    tmp.cleanup()


def test_preflight_replay_reports_triggers(legacy_dir):
    out_json = os.path.join(legacy_dir, "replay.json")
    r = run_script("replay_preflight_diagnostics.py",
                   "--data-dir", legacy_dir, "--all", "--json", out_json)
    assert r.returncode == 0, r.stderr
    assert "预检" in r.stdout and "首次触发" in r.stdout
    with open(out_json, encoding="utf-8") as fh:
        data = json.load(fh)
    s = data["sessions"][0]
    assert s["answers"] == 3
    assert s["triggers"] >= 1
    assert s["first_trigger"]["step"] >= 1
    assert s["by_dimension"]
    # cooldown suppression: with a huge cooldown only one trigger fires
    r2 = run_script("replay_preflight_diagnostics.py",
                    "--data-dir", legacy_dir, "--all",
                    "--cooldown-steps", "99", "--json", out_json)
    with open(out_json, encoding="utf-8") as fh:
        data2 = json.load(fh)
    assert data2["sessions"][0]["triggers"] <= s["triggers"]


def test_evidence_migration_dry_run_then_apply_then_restore(legacy_dir):
    # dry run: reports the gap, changes nothing
    r = run_script("migrate_session_evidence_annotations.py",
                   "--data-dir", legacy_dir, "migrate", "--all")
    assert r.returncode == 0, r.stderr
    assert "DRY-RUN" in r.stdout and "evidence_class" in r.stdout
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    store = SessionStore(legacy_dir, MetaIndex(
        os.path.join(legacy_dir, "meta_index.sqlite3")))
    sid = "dv-20260103000000-lega0001"
    assert "evidence_class" not in store.load(sid)["interview_log"][0]

    # apply: annotations land, backup + manifest written
    r = run_script("migrate_session_evidence_annotations.py",
                   "--data-dir", legacy_dir, "migrate", "--all",
                   "--apply", "--backup-dir", "evmig-test")
    assert r.returncode == 0, r.stderr
    entry = store.load(sid)["interview_log"][0]
    assert entry["evidence_class"]
    assert "quality_score" in entry
    manifest = os.path.join(legacy_dir, "operations", "evmig-test",
                            "manifest.json")
    assert os.path.isfile(manifest)

    # restore: the un-annotated original comes back
    r = run_script("migrate_session_evidence_annotations.py",
                   "--data-dir", legacy_dir, "restore",
                   "--manifest", manifest)
    assert r.returncode == 0, r.stderr
    assert "evidence_class" not in store.load(sid)["interview_log"][0]


def test_evidence_migration_idempotent(legacy_dir):
    run_script("migrate_session_evidence_annotations.py",
               "--data-dir", legacy_dir, "migrate", "--all", "--apply")
    r = run_script("migrate_session_evidence_annotations.py",
                   "--data-dir", legacy_dir, "migrate", "--all")
    assert "没有需要迁移的会话" in r.stdout


# ---------------------------------------------------------------------------
# multi-user import with user mapping (reference
# resolve_source_user_mappings import_external...py:408)
# ---------------------------------------------------------------------------

def _make_auth_db(path, users):
    import sqlite3
    os.makedirs(os.path.dirname(path), exist_ok=True)
    conn = sqlite3.connect(path)
    conn.execute("""CREATE TABLE users (
        user_id INTEGER PRIMARY KEY, phone TEXT, nickname TEXT,
        level TEXT, is_admin INTEGER DEFAULT 0, created_at TEXT,
        last_login_at TEXT)""")
    conn.execute("""CREATE TABLE wechat_identities (
        openid TEXT PRIMARY KEY, user_id INTEGER, unionid TEXT,
        nickname TEXT, created_at TEXT)""")
    for uid, phone, openid in users:
        conn.execute(
            "INSERT INTO users (user_id, phone, nickname) VALUES (?,?,?)",
            (uid, phone, f"u{uid}"))
        if openid:
            conn.execute(
                "INSERT INTO wechat_identities (openid, user_id) "
                "VALUES (?, ?)", (openid, uid))
    conn.commit()
    conn.close()


def test_multi_user_import_maps_owners(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sessions").mkdir(parents=True)
    dst.mkdir()
    # source: users 1 (phone match), 2 (wechat match), 3 (json map)
    _make_auth_db(str(src / "auth" / "auth.sqlite3"), [
        (1, "13900003001", None),
        (2, None, "wx-openid-2"),
        (3, None, None),
    ])
    _make_auth_db(str(dst / "auth" / "auth.sqlite3"), [
        (11, "13900003001", None),
        (12, None, "wx-openid-2"),
        (13, "13900003099", None),
    ])
    for i, owner in ((1, 1), (2, 2), (3, 3)):
        with open(src / "sessions" / f"dv-2026010400000{i}-mu{i:06d}.json",
                  "w", encoding="utf-8") as fh:
            json.dump({
                "session_id": f"dv-2026010400000{i}-mu{i:06d}",
                "owner_user_id": str(owner), "topic": f"多用户{i}",
                "status": "completed", "interview_log": [
                    {"question": "q", "answer": "a", "dimension": "d"}],
                "dimensions": {}, "reference_materials": [],
            }, fh, ensure_ascii=False)
    umap = tmp_path / "map.json"
    umap.write_text(json.dumps({"users": {"3": 13}}), encoding="utf-8")

    # dry-run prints the plan
    r = run_script("import_external_local_data_to_cloud.py", str(src),
                   "--data-dir", str(dst),
                   "--source-auth-db", str(src / "auth" / "auth.sqlite3"),
                   "--user-map-json", str(umap), "--dry-run")
    assert r.returncode == 0, r.stderr
    assert "phone_match" in r.stdout and "wechat_match" in r.stdout
    assert "user_map_json" in r.stdout

    # apply stamps each session with its mapped target
    r = run_script("import_external_local_data_to_cloud.py", str(src),
                   "--data-dir", str(dst),
                   "--source-auth-db", str(src / "auth" / "auth.sqlite3"),
                   "--user-map-json", str(umap))
    assert r.returncode == 0, r.stderr
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore
    store = SessionStore(str(dst), MetaIndex(
        str(dst / "meta_index.sqlite3")))
    owners = {store.load(f"dv-2026010400000{i}-mu{i:06d}")
              ["owner_user_id"] for i in (1, 2, 3)}
    assert owners == {"11", "12", "13"}


def test_multi_user_import_refuses_unmapped_on_apply(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sessions").mkdir(parents=True)
    dst.mkdir()
    _make_auth_db(str(src / "auth" / "auth.sqlite3"),
                  [(9, None, None)])   # unmappable
    with open(src / "sessions" / "dv-20260104000009-mu000009.json", "w",
              encoding="utf-8") as fh:
        json.dump({"session_id": "dv-20260104000009-mu000009",
                   "owner_user_id": "9", "topic": "孤儿",
                   "status": "completed", "interview_log": [
                       {"question": "q", "answer": "a"}],
                   "dimensions": {}, "reference_materials": []}, fh)
    r = run_script("import_external_local_data_to_cloud.py", str(src),
                   "--data-dir", str(dst),
                   "--source-auth-db", str(src / "auth" / "auth.sqlite3"))
    assert r.returncode == 1
    assert "拒绝执行" in r.stdout
    # --owner fallback unblocks
    r = run_script("import_external_local_data_to_cloud.py", str(src),
                   "--data-dir", str(dst), "--owner", "42",
                   "--source-auth-db", str(src / "auth" / "auth.sqlite3"))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "fallback_owner" in r.stdout


def test_agent_ops_status_and_views(tmp_path):
    from deepvision_tpu.web.meta_index import MetaIndex
    from deepvision_tpu.web.stores import SessionStore

    store = SessionStore(str(tmp_path), MetaIndex(
        str(tmp_path / "meta_index.sqlite3")))
    store.save({"session_id": "dv-20260105000000-ops00001",
                "owner_user_id": "1", "instance_scope": "default",
                "topic": "ops", "status": "in_progress",
                "created_at": "2026-01-05T00:00:00Z",
                "updated_at": "2026-01-05T00:00:00Z",
                "interview_log": [], "dimensions": {},
                "reference_materials": []})
    r = run_script("agent_ops.py", "--data-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "session_index: 1" in r.stdout
    assert "dv-mini.npz" in r.stdout
    assert "bench vs BASELINE" in r.stdout
    r = run_script("agent_ops.py", "models", "--data-dir", str(tmp_path))
    assert r.returncode == 0 and "checkpoints" in r.stdout
    r = run_script("agent_ops.py", "bench", "--data-dir", str(tmp_path))
    assert r.returncode == 0 and "BENCH_r01.json" in r.stdout


def test_agent_eval_calibration_mode():
    r = run_script("agent_eval.py", "--calibration")
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("correctly detected") == 5


# ---------------------------------------------------------------------------
# agent_observe: health gate + trend history
# ---------------------------------------------------------------------------

def _load_observe():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "agent_observe", os.path.join("scripts", "agent_observe.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_observe_health_rules_fire_on_bad_snapshot():
    obs = _load_observe()
    out = {
        "source": "live",
        "status": {
            "gateway_circuit": {"report": {"until": 99}},
            "report_queue": {"failed": 2, "rejected": 1},
            "engine": {"dv-fast": {"queues": {"free_pages": 0,
                                              "high": 20}}},
        },
        "metrics": {
            "ai_calls": {"total_ms": {"p95": 9001.0},
                         "queue_wait_ms": {"p95": 2500.0}},
            "list_overload": {"sessions": 3},
            "question_generation": {"count": 20,
                                    "fallback_triggered": 10},
        },
    }
    findings = obs.evaluate_health(out)
    rules = {f["rule"] for f in findings}
    assert {"lanes_in_cooldown", "report_failures", "kv_pool_exhausted",
            "question_fallback_rate"} <= rules
    assert {"ai_latency_p95", "ai_queue_wait_p95", "list_load_shedding",
            "report_queue_rejections",
            "deep_high_priority_queue"} <= rules
    # crit sorted first
    sev = [f["severity"] for f in findings]
    assert sev == sorted(sev, key={"crit": 0, "warn": 1,
                                   "info": 2}.__getitem__)


def test_observe_health_quiet_on_clean_snapshot():
    obs = _load_observe()
    out = {"source": "live", "status": {
        "gateway_circuit": {}, "report_queue": {"failed": 0},
        "engine": {"dv-fast": {"queues": {"free_pages": 900,
                                          "high": 0}}}},
        "metrics": {"ai_calls": {"total_ms": {"p95": 300.0},
                                 "queue_wait_ms": {"p95": 10.0}},
                    "list_overload": {},
                    "question_generation": {"count": 20,
                                            "fallback_triggered": 0}}}
    assert obs.evaluate_health(out) == []


def test_observe_history_computes_interval_deltas(tmp_path):
    from deepvision_tpu.web.meta_index import MetaIndex

    obs = _load_observe()
    data_dir = str(tmp_path)
    meta = MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
    snaps = [
        {"ai_calls": {"count": 10, "total_ms": {"p95": 100}},
         "question_generation": {"count": 4, "fallback_triggered": 0}},
        {"ai_calls": {"count": 25, "total_ms": {"p95": 140}},
         "question_generation": {"count": 9, "fallback_triggered": 1}},
        {"ai_calls": {"count": 31, "total_ms": {"p95": 120}},
         "question_generation": {"count": 12, "fallback_triggered": 1}},
    ]
    for i, s in enumerate(snaps):
        meta.execute(
            "INSERT INTO runtime_metrics_store (kind, payload, created_at)"
            " VALUES (?, ?, ?)",
            ("snapshot", json.dumps(s), f"2026-08-20T0{i}:00:00Z"))
    trend = obs.collect_history(data_dir, n=5)
    assert [t["ai_calls"] for t in trend] == [15, 6]
    assert [t["questions"] for t in trend] == [5, 3]
    assert [t["fallbacks"] for t in trend] == [1, 0]
    assert trend[-1]["ai_p95_ms"] == 120


def test_observe_health_cli_exit_codes(tmp_path):
    """--health over a clean local data dir exits 0; --history renders."""
    from deepvision_tpu.web.meta_index import MetaIndex

    data_dir = str(tmp_path)
    MetaIndex(os.path.join(data_dir, "meta_index.sqlite3"))
    r = run_script("agent_observe.py", "--local",
                   "--data-dir", data_dir, "--health")
    assert r.returncode == 0, r.stderr[-500:]
    r = run_script("agent_observe.py",
                   "--data-dir", data_dir, "--history", "5")
    assert r.returncode == 0, r.stderr[-500:]
    assert "no snapshot history" in r.stdout


# ---------------------------------------------------------------------------
# Harness tooling (round 4: reference agent_smoke/test_runner/ci_summary/
# history counterparts)
# ---------------------------------------------------------------------------

def test_agent_smoke_list():
    r = run_script("agent_smoke.py", "--list")
    assert r.returncode == 0
    assert "pytest -m smoke" in r.stdout
    assert "tests/test_security_regression.py" in r.stdout


def test_agent_test_runner_writes_timing_artifact(tmp_path):
    # a tiny filtered run keeps this test fast while exercising the
    # junit aggregation + artifact layout end to end
    import shutil
    art = os.path.join(ROOT, "artifacts", "test-runs")
    r = run_script("agent_test_runner.py", "tests/test_db_compat.py")
    assert r.returncode == 0, r.stdout + r.stderr
    latest = os.path.join(art, "latest.json")
    with open(latest, encoding="utf-8") as fh:
        summary = json.load(fh)
    assert summary["totals"]["tests"] > 0
    assert summary["totals"]["failures"] == 0
    suites = {s["suite"] for s in summary["suites"]}
    assert "test_db_compat" in suites
    assert all(s["seconds"] >= 0 for s in summary["suites"])


def test_agent_history_and_ci_summary_read_artifacts():
    # history lists whatever exists (bench rounds are committed, so at
    # least those rows must render)
    r = run_script("agent_history.py", "list")
    assert r.returncode == 0
    assert "bench" in r.stdout
    r2 = run_script("agent_history.py", "bench")
    assert r2.returncode == 0 and "prefix_cache_question" in r2.stdout
    r3 = run_script("agent_ci_summary.py")
    assert r3.returncode == 0
    assert "Bench" in r3.stdout


def test_agent_guardrails_list():
    r = run_script("agent_guardrails.py", "--list")
    assert r.returncode == 0
    assert "test_guard_matrix" in r.stdout
    assert "IDOR" in r.stdout


def test_agent_doc_gardener_clean_on_repo():
    r = run_script("agent_doc_gardener.py")
    assert r.returncode == 0, r.stdout
    assert "0 errors" in r.stdout


def test_agent_artifacts_list_and_dry_prune():
    r = run_script("agent_artifacts.py", "list")
    assert r.returncode == 0
    r2 = run_script("agent_artifacts.py", "prune", "--keep", "1",
                    "--dry-run")
    assert r2.returncode == 0
    assert "would prune" in r2.stdout
