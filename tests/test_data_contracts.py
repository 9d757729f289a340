"""Byte-compat contract suite for SURVEY Appendix A payload shapes.

Each test pins one of the A.1-A.7 data contracts against the LIVE route
(template AI backend): a client of the reference switching to this
framework must find the same field names and value domains.  References:
A.1 session web/server.py:28638-28661; A.2 next-question
:29110-29169,:29985-30000; A.3 draft schema :23003-23048; A.4 status
:13549-13607; A.5 solution :43078-43114; A.6 metrics :44901-44923;
A.7 list index :7520-7614."""

import tempfile
import time

import pytest

from deepvision_tpu.web.server import create_app

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def client():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "AI_MODE": "template",
        "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666",
        "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": "13800000001",
    })
    c = app.test_client()
    c._app = app
    r = c.post("/api/auth/sms/send-code", json_body={"phone": "13977770001"})
    assert r.status_code == 200, r.text
    r = c.post("/api/auth/login/code",
               json_body={"phone": "13977770001", "code": "666666"})
    assert r.status_code == 200, r.text
    yield c
    app.state.shutdown()
    tmp.cleanup()


@pytest.fixture(scope="module")
def session(client):
    r = client.post("/api/sessions", json_body={
        "topic": "数据契约验证调研",
        "scenario_id": "product-requirement",
        "interview_mode": "quick",
    })
    assert r.status_code == 201, r.text
    return r.get_json()


def _answer_rounds(client, sid, rounds):
    """Drive N question->answer rounds; returns the last question payload."""
    q = None
    for _ in range(rounds):
        r = client.post(f"/api/sessions/{sid}/next-question", json_body={})
        assert r.status_code == 200, r.text
        q = r.get_json()
        if q.get("completed") and not q.get("question"):
            continue
        body = {"question": q.get("question") or "",
                "answer": (q.get("options") or ["现状流程存在断点"])[0],
                "rationale_text": "补充：预算和排期都受限。"}
        r = client.post(f"/api/sessions/{sid}/submit-answer", json_body=body)
        assert r.status_code == 200, r.text
    return q


# ---------------------------------------------------------------------------
# A.1 session object
# ---------------------------------------------------------------------------

A1_CREATE_FIELDS = (
    "session_id", "owner_user_id", "topic", "description",
    "interview_mode", "created_at", "updated_at", "status",
    "scenario_id", "scenario_config", "dimensions",
    "reference_materials", "interview_log", "requirements",
    "summary", "depth_v2",
)


def test_a1_session_create_fields(session):
    for field in A1_CREATE_FIELDS:
        assert field in session, field
    sid = session["session_id"]
    assert sid.startswith("dv-") and len(sid.split("-")) == 3
    assert len(sid.split("-")[2]) == 8  # hex8 suffix
    assert session["status"] == "in_progress"
    assert session["created_at"].endswith("Z") or "T" in session["created_at"]
    assert isinstance(session["depth_v2"], dict)
    assert set(session["depth_v2"]) >= {"enabled", "mode",
                                        "skip_followup_confirm"}
    # dimensions: {dim_id: {coverage, items, score}}
    assert session["dimensions"]
    dim = next(iter(session["dimensions"].values()))
    assert set(dim) >= {"coverage", "items", "score"}


A1_LOG_FIELDS = (
    "question", "answer", "dimension", "is_follow_up", "follow_up_round",
    "options", "multi_select", "answer_mode", "requires_rationale",
    "evidence_intent", "rationale_text", "quality_score",
    "quality_signals", "follow_up_signals", "hard_triggered",
)


def test_a1_interview_log_evidence_annotations(client, session):
    sid = session["session_id"]
    _answer_rounds(client, sid, 2)
    s = client.get(f"/api/sessions/{sid}").get_json()
    assert s["interview_log"], "answers must append to interview_log"
    entry = s["interview_log"][0]
    for field in A1_LOG_FIELDS:
        assert field in entry, field
    assert entry["answer_mode"] in ("pick_only", "pick_with_reason")
    assert entry["evidence_intent"] in ("low", "medium", "high")


# ---------------------------------------------------------------------------
# A.2 next-question response
# ---------------------------------------------------------------------------

A2_FIELDS = (
    "question", "options", "multi_select", "question_multi_select",
    "is_follow_up", "answer_mode", "requires_rationale",
    "evidence_intent", "ai_recommendation", "dimension", "ai_generated",
    "decision_meta", "question_generation_tier", "question_selected_lane",
    "question_runtime_profile", "question_hedge_triggered",
    "question_fallback_triggered", "question_attempts",
)


def test_a2_next_question_fields(client, session):
    sid = session["session_id"]
    r = client.post(f"/api/sessions/{sid}/next-question", json_body={})
    assert r.status_code == 200
    q = r.get_json()
    if q.get("cached"):
        # idempotent result-cache hit (A.2 `cached` field): answer it to
        # advance the session signature, then draw a FRESH question so
        # the route-added decision fields are exercised
        client.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q.get("question") or "",
            "answer": (q.get("options") or ["好的"])[0]})
        r = client.post(f"/api/sessions/{sid}/next-question", json_body={})
        assert r.status_code == 200
        q = r.get_json()
    if q.get("completed"):
        pytest.skip("dimension completed on this draw")
    for field in A2_FIELDS:
        assert field in q, field
    assert len(q["question"]) <= 240
    assert 2 <= len(q["options"]) <= 6
    assert q["answer_mode"] in ("pick_only", "pick_with_reason")
    assert q["evidence_intent"] in ("low", "medium", "high")
    dm = q["decision_meta"]
    assert set(dm) >= {"mode", "follow_up_round"}


# ---------------------------------------------------------------------------
# A.3 report draft schema (template gateway output must self-validate)
# ---------------------------------------------------------------------------

def test_a3_draft_schema_validates():
    import json

    from deepvision_tpu.engine.client import ModelGateway
    from deepvision_tpu.web.runtime.report_v3 import validate_report_draft

    gw = ModelGateway(mode="template")
    text = gw.call_model("草稿", call_type="report_draft",
                         context={"topic": "契约", "q_ids": ["Q1", "Q2"]})
    draft = json.loads(text)
    for key in ("overview", "needs", "analysis", "visualizations",
                "solutions", "risks", "actions", "open_questions",
                "evidence_index"):
        assert key in draft, key
    for key in ("customer_needs", "business_flow", "tech_constraints",
                "project_constraints"):
        assert key in draft["analysis"], key
    for key in ("priority_quadrant_mermaid", "business_flow_mermaid",
                "demand_pie_mermaid", "architecture_mermaid"):
        assert key in draft["visualizations"], key
    issues = validate_report_draft(draft, {"Q1", "Q2"})
    hard = [i for i in issues if i.get("severity") == "error"]
    assert not hard, hard
    # review-issue contract: {type, severity, message, target}
    for issue in issues:
        assert set(issue) >= {"type", "severity", "message"}


# ---------------------------------------------------------------------------
# A.4 report-generation + thinking status
# ---------------------------------------------------------------------------

A4_FIELDS = (
    "active", "processing", "state", "stage_index", "total_stages",
    "progress", "message", "stage_label", "updated_at", "report_name",
    "ai_generated", "v3_enabled", "report_profile", "error",
    "queue_position", "queue_pending", "queue_running",
    "estimated_wait_seconds",
)

A4_STATES = {"idle", "queued", "building_prompt", "generating", "fallback",
             "saving", "completed", "failed"}


def test_a4_report_generation_status_fields(client, session):
    sid = session["session_id"]
    _answer_rounds(client, sid, 6)
    r = client.post(f"/api/sessions/{sid}/generate-report", json_body={})
    assert r.status_code in (200, 202), r.text
    deadline = time.monotonic() + 120
    payload = None
    while time.monotonic() < deadline:
        payload = client.get(
            f"/api/status/report-generation/{sid}").get_json()
        assert payload["state"] in A4_STATES, payload["state"]
        if payload["state"] in ("completed", "failed"):
            break
        time.sleep(0.1)
    assert payload["state"] == "completed", payload
    for field in A4_FIELDS:
        assert field in payload, field
    assert payload["total_stages"] == 6
    assert payload["ai_generated"] in (True, False)
    assert payload["report_name"]


def test_a4_thinking_status_fields(client, session):
    sid = session["session_id"]
    payload = client.get(f"/api/status/thinking/{sid}").get_json()
    for field in ("active", "stage", "stage_index", "total_stages",
                  "message"):
        assert field in payload, field


# ---------------------------------------------------------------------------
# A.5 solution payload keys against the live route
# ---------------------------------------------------------------------------

def test_a5_solution_payload_keys_live(client, session):
    from tests.fidelity_utils import A5_KEYS

    sid = session["session_id"]
    status = client.get(f"/api/status/report-generation/{sid}").get_json()
    name = status.get("report_name")
    assert name, "A.4 test must have produced a report"
    payload = client.get(f"/api/reports/{name}/solution").get_json()
    missing = [k for k in A5_KEYS if k not in payload]
    assert not missing, missing
    meta = payload["solution_schema_meta"]
    assert set(meta) >= {"version", "section_count", "render_mode",
                         "snapshot_origin"}


# ---------------------------------------------------------------------------
# A.6 metrics payload
# ---------------------------------------------------------------------------

def test_a6_metrics_payload_sections(client):
    # metrics is admin-gated: elevate with the configured admin phone
    r = client.post("/api/auth/sms/send-code",
                    json_body={"phone": "13800000001"})
    assert r.status_code == 200, r.text
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13800000001", "code": "666666"})
    assert r.status_code == 200, r.text
    payload = client.get("/api/metrics").get_json()
    for key in ("ai_calls", "list_endpoints", "question_generation",
                "question_generation_runtime", "search_decision",
                "report_generation_queue", "report_generation_runtime",
                "list_overload"):
        assert key in payload, key
    qg = payload["question_generation"]
    assert "by_mode" in qg
    r = client.post("/api/metrics/reset")
    assert r.status_code in (200, 204)


# ---------------------------------------------------------------------------
# A.7 list index schemas
# ---------------------------------------------------------------------------

A7_SESSION_INDEX_COLS = {
    "session_id", "owner_user_id", "instance_scope", "topic", "status",
    "created_at", "updated_at", "interview_count", "scenario_id",
    "dimensions_json", "current_report_name", "last_report_name",
    "file_signature",
}


def test_a7_session_index_columns(client):
    state = client._app.state
    con = state.meta.conn()
    cols = {row[1] for row in
            con.execute("PRAGMA table_info(session_index)").fetchall()}
    missing = A7_SESSION_INDEX_COLS - cols
    assert not missing, missing


def test_a7_report_index_columns(client):
    state = client._app.state
    con = state.meta.conn()
    cols = {row[1] for row in
            con.execute("PRAGMA table_info(report_index)").fetchall()}
    for col in ("report_name", "owner_user_id", "session_id",
                "report_profile", "source_report_name"):
        assert col in cols, col
