"""DB shim: qmark translation, DDL rewrite, SQLite behaviors."""

import pytest
import tempfile

from deepvision_tpu.web.db import (
    _rewrite_ddl,
    _translate_qmark_placeholders,
    connect_db,
    is_postgres_url,
)

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


def test_qmark_translation_preserves_literals():
    sql = "SELECT * FROM t WHERE a = ? AND b = 'x?y' AND c = ?"
    out = _translate_qmark_placeholders(sql)
    assert out == "SELECT * FROM t WHERE a = %s AND b = 'x?y' AND c = %s"


def test_ddl_rewrite():
    ddl = ("CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT, "
           "ts DATETIME, data BLOB)")
    out = _rewrite_ddl(ddl)
    assert "BIGSERIAL PRIMARY KEY" in out
    assert "TIMESTAMPTZ" in out
    assert "BYTEA" in out


def test_postgres_url_detection():
    assert is_postgres_url("postgres://u:p@h/db")
    assert is_postgres_url("postgresql://h/db")
    assert not is_postgres_url("/data/meta.sqlite3")


def test_sqlite_wal_and_rows():
    with tempfile.NamedTemporaryFile(suffix=".sqlite3") as f:
        conn = connect_db(f.name)
        conn.execute("CREATE TABLE t (a TEXT, b INTEGER)")
        conn.execute("INSERT INTO t VALUES (?, ?)", ("中文", 7))
        conn.commit()
        row = conn.execute("SELECT * FROM t").fetchone()
        assert row["a"] == "中文" and row["b"] == 7
        mode = conn.execute("PRAGMA journal_mode").fetchone()[0]
        assert mode in ("wal", "memory")  # WAL unless tmpfs forbids
        conn.close()
