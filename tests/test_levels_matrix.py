"""User-level capability matrix tests (SURVEY §2.3 "User levels"):
the experience/standard/professional matrix, clamp semantics, and
route-level enforcement — including the in-progress-only session cap
(ADVICE r2: completing/deleting interviews must free quota).
Reference capability map web/server.py:8738-9019."""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.levels import (
    CAPABILITIES,
    LEVELS,
    capabilities_for,
    clamp_interview_mode,
    clamp_report_profile,
    level_allows,
)
from deepvision_tpu.web.server import create_app

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke

ADMIN_PHONE = "13800000001"


# ---------------------------------------------------------------------------
# matrix shape: monotonic unlocks
# ---------------------------------------------------------------------------

def test_levels_are_strictly_widening():
    """Every capability a lower tier has, higher tiers keep."""
    for lo, hi in zip(LEVELS, LEVELS[1:]):
        lo_c, hi_c = CAPABILITIES[lo], CAPABILITIES[hi]
        for key, val in lo_c.items():
            if isinstance(val, list):
                assert set(val) <= set(hi_c[key]), (lo, hi, key)
            elif isinstance(val, bool):
                assert hi_c[key] >= val, (lo, hi, key)
        # session quota only grows (0 = unlimited)
        lo_max, hi_max = lo_c["max_sessions"], hi_c["max_sessions"]
        assert hi_max == 0 or (lo_max != 0 and hi_max >= lo_max)


def test_unknown_or_missing_level_falls_to_experience():
    assert capabilities_for(None) == CAPABILITIES["experience"]
    assert capabilities_for("enterprise") == CAPABILITIES["experience"]


def test_level_allows_semantics():
    assert level_allows("experience", "solution_view")
    assert not level_allows("experience", "solution_share")
    assert level_allows("standard", "exports", "docx")
    assert not level_allows("standard", "exports", "pdf")
    assert level_allows("professional", "max_sessions", 10_000)  # unlimited
    assert level_allows("experience", "max_sessions", 4)
    assert not level_allows("experience", "max_sessions", 5)
    assert not level_allows("experience", "no_such_capability")


def test_clamps_pick_strongest_allowed():
    assert clamp_interview_mode("experience", "deep") == "quick"
    assert clamp_interview_mode("standard", "deep") == "standard"
    assert clamp_interview_mode("professional", "deep") == "deep"
    assert clamp_report_profile("experience", "quality") == "balanced"
    assert clamp_report_profile(
        "professional", "release-conservative") == "release-conservative"
    # unknown values clamp instead of passing through
    assert clamp_interview_mode("professional", "turbo") == "deep"


# ---------------------------------------------------------------------------
# route-level enforcement
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def app():
    tmp = tempfile.TemporaryDirectory()
    a = create_app(data_dir=tmp.name, overrides={
        "AI_MODE": "template", "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
    })
    a._tmp = tmp
    yield a
    a.state.shutdown()
    tmp.cleanup()


def _login(app, phone):
    c = HttpClient(app)
    c.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = c.post("/api/auth/login/code",
               json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return c


def test_interview_mode_clamped_at_creation(app):
    c = _login(app, "13900002001")  # fresh user => experience
    r = c.post("/api/sessions", json_body={
        "topic": "等级钳制测试", "scenario_id": "product-requirement",
        "interview_mode": "deep",
    })
    assert r.status_code == 201
    assert r.get_json()["interview_mode"] == "quick"


def test_session_cap_counts_only_in_progress(app):
    """ADVICE r2: the experience cap of 5 must NOT count completed
    sessions — finishing an interview frees quota."""
    c = _login(app, "13900002002")
    sids = []
    for i in range(5):
        r = c.post("/api/sessions", json_body={
            "topic": f"配额{i}", "scenario_id": "product-requirement",
            "interview_mode": "quick"})
        assert r.status_code == 201, r.text
        sids.append(r.get_json()["session_id"])
    # 6th blocks with the structured error
    r = c.post("/api/sessions", json_body={
        "topic": "超额", "scenario_id": "product-requirement"})
    assert r.status_code == 403
    body = r.get_json()
    assert body["session_limit_reached"] is True
    assert body["session_count"] == 5
    # deleting one frees quota
    assert c.delete(f"/api/sessions/{sids[0]}").status_code == 200
    r = c.post("/api/sessions", json_body={
        "topic": "恢复", "scenario_id": "product-requirement"})
    assert r.status_code == 201


@pytest.fixture(scope="module")
def admin(app):
    return _login(app, ADMIN_PHONE)


def test_admin_level_change_is_effective_immediately(app, admin):
    c = _login(app, "13900002003")
    uid = c.get("/api/auth/me").get_json()["user"]["user_id"]
    r = admin.put(f"/api/admin/users/{uid}/level",
                  json_body={"level": "professional"})
    assert r.status_code == 200
    # no re-login: level is read per request
    r = c.post("/api/sessions", json_body={
        "topic": "专业模式", "scenario_id": "product-requirement",
        "interview_mode": "deep"})
    assert r.status_code == 201
    assert r.get_json()["interview_mode"] == "deep"


def test_admin_rejects_unknown_level(app, admin):
    c = _login(app, "13900002004")
    uid = c.get("/api/auth/me").get_json()["user"]["user_id"]
    r = admin.put(f"/api/admin/users/{uid}/level",
                  json_body={"level": "vip"})
    assert r.status_code == 400
