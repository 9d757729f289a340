"""Config-resolution precedence matrix (web/env.py, reference _cfg_get
web/server.py:281 + CONFIG_RESOLUTION_MODE web/.env.example:21).

The full 4-source ladder — runtime override > process env > env file >
code default — crossed with the resolution modes, provenance reporting,
typed-accessor coercion on hostile values, and env-file parsing edges
(quotes, comments, missing files, explicit DEEPVISION_ENV_FILE).
"""

import os
import tempfile

import pytest

from deepvision_tpu.web.env import ENV_FILE_VAR, ConfigResolver, parse_env_file


class FakeDefaults:
    MY_KEY = "from-default"
    MY_INT = 7
    MY_BOOL = False
    CONFIG_RESOLUTION_MODE = "auto"


@pytest.fixture()
def resolver(tmp_path, monkeypatch):
    envfile = tmp_path / ".env"
    envfile.write_text(
        "# comment line\n"
        "MY_KEY=from-file\n"
        'QUOTED="with spaces"\n'
        "SINGLE='single quoted'\n"
        "NOEQUALS-LINE\n"
        "MY_INT=42\n",
        encoding="utf-8")
    monkeypatch.chdir(tmp_path)
    r = ConfigResolver(defaults_module=FakeDefaults)
    r.load_env_files(str(tmp_path))
    return r


def test_ladder_every_rung(resolver, monkeypatch):
    # default only
    assert resolver.get("MY_KEY") != "from-default"  # file wins already
    assert resolver.source("MY_KEY") == "config"
    # process env beats the file
    monkeypatch.setenv("MY_KEY", "from-env")
    assert resolver.get("MY_KEY") == "from-env"
    assert resolver.source("MY_KEY") == "env"
    # runtime override beats everything
    resolver.set_runtime("MY_KEY", "from-admin")
    assert resolver.get("MY_KEY") == "from-admin"
    assert resolver.source("MY_KEY") == "runtime"
    # clearing the override falls back down the ladder
    resolver.clear_runtime("MY_KEY")
    assert resolver.get("MY_KEY") == "from-env"
    monkeypatch.delenv("MY_KEY")
    assert resolver.get("MY_KEY") == "from-file"


def test_default_rung_and_unknown_key(resolver):
    assert resolver.get("MY_BOOL") is False
    assert resolver.source("MY_BOOL") == "default"
    assert resolver.get("NO_SUCH_KEY", "fallback") == "fallback"


def test_env_only_mode_ignores_files(resolver, monkeypatch):
    monkeypatch.setenv("CONFIG_RESOLUTION_MODE", "env_only")
    assert resolver.mode == "env_only"
    # the file's MY_KEY must be invisible; the code default applies
    assert resolver.get("MY_KEY") == "from-default"
    assert resolver.source("MY_KEY") == "default"
    monkeypatch.setenv("MY_KEY", "from-env")
    assert resolver.get("MY_KEY") == "from-env"


def test_mode_itself_resolves_through_the_ladder(resolver, monkeypatch):
    assert resolver.mode == "auto"  # FakeDefaults
    monkeypatch.setenv("CONFIG_RESOLUTION_MODE", "hybrid")
    assert resolver.mode == "hybrid"


def test_typed_accessors_on_hostile_values(resolver, monkeypatch):
    assert resolver.get_int("MY_INT") == 42       # file value, cast
    monkeypatch.setenv("MY_INT", "not-a-number")
    # un-castable input degrades to the raw value, not a crash
    assert resolver.get_int("MY_INT") == "not-a-number" or \
        isinstance(resolver.get_int("MY_INT"), (int, str))
    for truthy in ("1", "true", "YES", "On"):
        monkeypatch.setenv("MY_BOOL", truthy)
        assert resolver.get_bool("MY_BOOL") is True, truthy
    for falsy in ("0", "false", "off", "garbage", ""):
        monkeypatch.setenv("MY_BOOL", falsy)
        assert resolver.get_bool("MY_BOOL") is False, falsy
    monkeypatch.setenv("MY_LIST", "a, b , ,c")
    assert resolver.get_list("MY_LIST") == ["a", "b", "c"]


def test_parse_env_file_edges(tmp_path):
    p = tmp_path / "x.env"
    p.write_text(
        "A=1\n"
        "  B = spaced \n"
        "#C=commented\n"
        'D="dq"\n'
        "E='sq'\n"
        "broken\n"
        "F=a=b\n",
        encoding="utf-8")
    out = parse_env_file(str(p))
    assert out == {"A": "1", "B": "spaced", "D": "dq", "E": "sq",
                   "F": "a=b"}
    assert parse_env_file(str(tmp_path / "missing.env")) == {}


def test_explicit_env_file_var_wins(tmp_path, monkeypatch):
    special = tmp_path / "special.env"
    special.write_text("MY_KEY=from-special\n", encoding="utf-8")
    (tmp_path / ".env").write_text("MY_KEY=from-dot-env\n",
                                   encoding="utf-8")
    monkeypatch.setenv(ENV_FILE_VAR, str(special))
    r = ConfigResolver(defaults_module=FakeDefaults)
    r.load_env_files(str(tmp_path))
    assert r.get("MY_KEY") == "from-special"
    assert str(special) in r.loaded_files


def test_runtime_snapshot_reflects_overrides(resolver):
    resolver.set_runtime("K1", "v1")
    resolver.set_runtime("K2", 2)
    snap = resolver.runtime_snapshot()
    assert snap == {"K1": "v1", "K2": 2}
    resolver.clear_runtime()
    assert resolver.runtime_snapshot() == {}
