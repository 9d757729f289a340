"""Store-layer concurrency: SessionStore/ReportStore under thread storms.

The reference serializes session access with per-session threading locks
inside a 45k-line server (web/server.py:2443-2500); here the stores own
that responsibility (web/stores.py _NamedLocks + signature cache), so
the proof lives at the store layer: parallel writers to the SAME
session, interleaved save/load/delete/backup, signature-cache coherence
(a load after an external file edit must not serve the stale cached
payload), and index consistency after the dust settles.
"""

import json
import os
import random
import tempfile
import threading

import pytest

from deepvision_tpu.web.meta_index import MetaIndex
from deepvision_tpu.web.stores import ReportStore, SessionStore


@pytest.fixture()
def stores():
    tmp = tempfile.TemporaryDirectory()
    meta = MetaIndex(os.path.join(tmp.name, "meta_index.sqlite3"))
    yield SessionStore(tmp.name, meta), ReportStore(tmp.name, meta), tmp.name
    tmp.cleanup()


def _mk_session(sid, n):
    return {
        "session_id": sid,
        "topic": f"并发测试{n}",
        "status": "in_progress",
        "interview_log": [{"question": f"q{i}", "answer": f"a{i}",
                           "dimension": "d1"} for i in range(n)],
        "dimensions": {}, "reference_materials": [],
        "owner_user_id": "1", "instance_scope": "default",
    }


def test_parallel_writers_last_write_wins_coherently(stores):
    sessions, _reports, _root = stores
    sid = "dv-20260821000000-cafe0001"
    errors = []

    def writer(k):
        try:
            for n in range(10):
                sessions.save(_mk_session(sid, k * 100 + n))
                got = sessions.load(sid)
                # NEVER a torn read: whatever version wins, it is a
                # complete, self-consistent payload
                assert got is not None
                assert got["topic"] == f"并发测试{len(got['interview_log'])}"
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    final = sessions.load(sid)
    assert final is not None
    # index row agrees with the file payload
    rows, _total = sessions.list_index(
        owner_user_id="1", instance_scope="default")
    row = [r for r in rows if r["session_id"] == sid]
    assert row and row[0]["topic"] == final["topic"]


def test_signature_cache_sees_external_file_edits(stores):
    sessions, _reports, root = stores
    sid = "dv-20260821000000-cafe0002"
    sessions.save(_mk_session(sid, 1))
    assert sessions.load(sid)["topic"] == "并发测试1"
    # an operator edits the file out-of-band (the migration CLIs do)
    path = sessions.path(sid)
    with open(path, encoding="utf-8") as fh:
        payload = json.load(fh)
    payload["topic"] = "外部修改后的主题"
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, ensure_ascii=False)
    got = sessions.load(sid)
    assert got["topic"] == "外部修改后的主题", \
        "signature cache served a stale payload after an external edit"


def test_interleaved_save_delete_backup_storm(stores):
    sessions, _reports, _root = stores
    rng = random.Random(11)
    sids = [f"dv-20260821000000-cafe{i:04x}" for i in range(8)]
    errors = []

    def chaos(seed):
        r = random.Random(seed)
        for _ in range(30):
            sid = r.choice(sids)
            op = r.random()
            try:
                if op < 0.5:
                    sessions.save(_mk_session(sid, r.randint(0, 5)))
                elif op < 0.7:
                    sessions.load(sid)
                elif op < 0.85:
                    sessions.delete(sid)
                else:
                    sessions.backup(sid, label=f"s{seed}")
            except Exception as e:  # noqa: BLE001
                errors.append((sid, op, e))

    threads = [threading.Thread(target=chaos, args=(k,)) for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors[:3]
    # whatever survived: file presence, index row and load() agree
    for sid in sids:
        got = sessions.load(sid)
        on_disk = os.path.isfile(sessions.path(sid))
        assert (got is not None) == on_disk, sid
        listed, _t = sessions.list_index(
            owner_user_id="1", instance_scope="default", page_size=100)
        rows = [r for r in listed if r["session_id"] == sid]
        assert bool(rows) == on_disk, sid


def test_report_save_delete_owner_binding_under_threads(stores):
    _sessions, reports, _root = stores
    errors = []

    def worker(k):
        try:
            for n in range(8):
                name = f"报告-{k}-{n}.md"
                reports.save(name, f"# 内容 {k}-{n}\n正文",
                             owner_user_id=str(k % 3),
                             session_id=f"dv-s{k}",
                             instance_scope="default")
                assert reports.load(name) is not None
                assert reports.owner_of(name) == str(k % 3)
                if n % 3 == 2:
                    assert reports.delete(name)
                    assert reports.load(name) is None
                    assert reports.is_deleted(name)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors[:3]
