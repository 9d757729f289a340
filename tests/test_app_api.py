"""App API tests: full interview->report lifecycle through the HTTP surface
with the template AI backend (the reference's test pattern: real routes,
fake AI — SURVEY.md §4)."""

import tempfile

import pytest

from deepvision_tpu.web.server import create_app

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


@pytest.fixture()
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
    c._tmp = tmp
    yield c
    app.state.shutdown()
    tmp.cleanup()


def login(client, phone="13900000001"):
    r = client.post("/api/auth/sms/send-code", json_body={"phone": phone})
    assert r.status_code == 200, r.text
    r = client.post("/api/auth/login/code",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return r.get_json()["user"]


def make_session(client, topic="CRM 系统需求调研"):
    r = client.post("/api/sessions", json_body={
        "topic": topic, "scenario_id": "product-requirement",
        "interview_mode": "quick",
    })
    assert r.status_code == 201, r.text
    return r.get_json()


# ---------------------------------------------------------------------------

def test_status_endpoint(client):
    data = client.get("/api/status").get_json()
    assert data["status"] == "ok"
    assert data["ai_mode"] == "template"


def test_auth_flow(client):
    assert client.get("/api/auth/me").get_json()["authenticated"] is False
    user = login(client)
    assert user["level"] == "experience"
    me = client.get("/api/auth/me").get_json()
    assert me["authenticated"] is True
    client.post("/api/auth/logout")
    assert client.get("/api/auth/me").get_json()["authenticated"] is False


def test_wrong_sms_code_rejected(client):
    client.post("/api/auth/sms/send-code",
                json_body={"phone": "13900000002"})
    r = client.post("/api/auth/login/code",
                    json_body={"phone": "13900000002", "code": "000000"})
    assert r.status_code == 401


def test_anonymous_writes_blocked(client):
    # security regression parity: anonymous users cannot create sessions
    assert client.post("/api/sessions", json_body={"topic": "x"}).status_code == 401
    assert client.get("/api/sessions").status_code == 401
    assert client.get("/api/reports").status_code == 401


def test_scenarios_listing(client):
    # scenario routes are part of the protected /api surface
    assert client.get("/api/scenarios").status_code == 401
    login(client)
    data = client.get("/api/scenarios").get_json()
    ids = {s["id"] for s in data}
    assert {"product-requirement", "tech-solution", "bidding-tendering",
            "business-model", "competitive-analysis",
            "interview-assessment", "problem-diagnosis",
            "user-research"} <= ids
    one = client.get("/api/scenarios/product-requirement").get_json()
    assert one["dimensions"][0]["id"] == "customer_needs"


def test_scenario_recognition(client):
    login(client)
    r = client.post("/api/scenarios/recognize",
                    json_body={"text": "我们要做一个产品需求 PRD 梳理"})
    matches = r.get_json()["matches"]
    assert matches and matches[0]["scenario_id"] == "product-requirement"


def test_session_lifecycle(client):
    user = login(client)
    session = make_session(client)
    sid = session["session_id"]
    assert sid.startswith("dv-")
    assert session["status"] == "in_progress"
    assert "customer_needs" in session["dimensions"]

    listing = client.get("/api/sessions")
    assert listing.status_code == 200
    assert listing.headers.get("X-Total-Count") == "1"

    # ETag 304
    etag = listing.headers["ETag"]
    r304 = client.get("/api/sessions", headers={"If-None-Match": etag})
    assert r304.status_code == 304

    r = client.put(f"/api/sessions/{sid}",
                   json_body={"description": "补充说明"})
    assert r.get_json()["description"] == "补充说明"

    assert client.delete(f"/api/sessions/{sid}").status_code == 200
    assert client.get(f"/api/sessions/{sid}").status_code == 404


def test_session_ownership_isolation(client):
    login(client, "13900000001")
    session = make_session(client)
    sid = session["session_id"]
    client.post("/api/auth/logout")
    login(client, "13900000003")
    assert client.get(f"/api/sessions/{sid}").status_code == 403


def test_interview_flow_to_report(client):
    login(client)
    session = make_session(client)
    sid = session["session_id"]

    answered = 0
    for _ in range(24):  # quick mode should finish well within this
        r = client.post(f"/api/sessions/{sid}/next-question", json_body={})
        assert r.status_code == 200, r.text
        q = r.get_json()
        if q.get("all_dimensions_completed"):
            break
        if q.get("completed"):
            continue
        assert q["question"]
        assert 2 <= len(q["options"]) <= 6
        assert q["answer_mode"] in ("pick_only", "pick_with_reason")
        assert q["evidence_intent"] in ("low", "medium", "high")
        r2 = client.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"],
            "answer": q["options"][0] + f"。具体来说，因为我们目前的流程涉及"
                      f"多个部门协作，第{answered}轮补充了数据与例子。",
            "dimension": q.get("dimension"),
            "is_follow_up": q.get("is_follow_up", False),
            "options": q["options"],
            "answer_mode": q["answer_mode"],
            "evidence_intent": q["evidence_intent"],
            "rationale_text": "例如跨部门报表需要手工汇总，效率较低。",
        })
        assert r2.status_code == 200, r2.text
        answered += 1
    assert answered >= 4

    # readiness + generate
    r = client.post(f"/api/sessions/{sid}/report-readiness", json_body={})
    assert r.status_code == 200
    r = client.post(f"/api/sessions/{sid}/generate-report",
                    json_body={"force": True})
    assert r.status_code == 202, r.text

    client._app.state.report_queue.drain()
    status = client.get(
        f"/api/status/report-generation/{sid}").get_json()
    assert status["state"] == "completed", status
    report_name = status["report_name"]
    assert sid in report_name

    # report content + listing
    content = client.get(f"/api/reports/{report_name}").text
    assert "总体概述" in content
    reports = client.get("/api/reports").get_json()
    assert any(r["report_name"] == report_name for r in reports)

    # solution payload
    sol = client.get(f"/api/reports/{report_name}/solution").get_json()
    assert sol["report_name"] == report_name
    assert sol["hero"]["title"]
    assert sol["sections"]

    # exports: markdown always allowed at experience level
    r = client.post(f"/api/reports/{report_name}/exports",
                    json_body={"format": "markdown"})
    assert r.status_code == 201
    asset_id = r.get_json()["asset_id"]
    dl = client.get(f"/api/reports/{report_name}/exports/{asset_id}")
    assert dl.status_code == 200
    # docx blocked at experience level
    r = client.post(f"/api/reports/{report_name}/exports",
                    json_body={"format": "docx"})
    assert r.status_code == 403


def test_duplicate_submit_deduped(client):
    login(client)
    session = make_session(client)
    sid = session["session_id"]
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    body = {
        "question": q["question"], "answer": "第一次回答内容",
        "dimension": q.get("dimension"), "options": q["options"],
    }
    r1 = client.post(f"/api/sessions/{sid}/submit-answer", json_body=body)
    r2 = client.post(f"/api/sessions/{sid}/submit-answer", json_body=body)
    assert r1.status_code == 200
    assert r2.get_json().get("duplicate") is True


def test_document_upload_and_context(client):
    login(client)
    session = make_session(client)
    sid = session["session_id"]
    md = "# 项目背景\n\n现有系统使用 Excel 管理客户，数据分散。\n" * 3
    r = client.post(
        f"/api/sessions/{sid}/documents",
        files={"file": ("背景说明.md", md.encode("utf-8"), "text/markdown")},
    )
    assert r.status_code == 200, r.text
    assert r.get_json()["total_documents"] == 1
    # unsupported type rejected
    r = client.post(
        f"/api/sessions/{sid}/documents",
        files={"file": ("evil.exe", b"MZ\x90\x00", "application/x-dos")},
    )
    assert r.status_code == 400
    # delete
    r = client.delete(f"/api/sessions/{sid}/documents/背景说明.md")
    assert r.status_code == 200


def test_docx_upload_roundtrip(client):
    from deepvision_tpu.web.runtime.exports import markdown_to_docx

    login(client)
    session = make_session(client)
    sid = session["session_id"]
    docx_bytes = markdown_to_docx("# 标题\n\n这是正文段落。\n\n- 列表项一")
    r = client.post(
        f"/api/sessions/{sid}/documents",
        files={"file": ("需求文档.docx", docx_bytes,
                        "application/vnd.openxmlformats-officedocument"
                        ".wordprocessingml.document")},
    )
    assert r.status_code == 200, r.text
    doc = r.get_json()["document"]
    assert "正文段落" in doc["content"]


def test_undo_and_restart(client):
    login(client)
    session = make_session(client)
    sid = session["session_id"]
    assert client.post(f"/api/sessions/{sid}/undo-answer",
                       json_body={}).status_code == 400
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    client.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": "回答",
        "dimension": q.get("dimension"),
    })
    r = client.post(f"/api/sessions/{sid}/undo-answer", json_body={})
    assert r.status_code == 200
    r = client.post(f"/api/sessions/{sid}/restart-interview", json_body={})
    assert r.status_code == 200
    data = client.get(f"/api/sessions/{sid}").get_json()
    assert data["interview_log"] == []


def test_assistant_chat(client):
    login(client)
    session = make_session(client)
    sid = session["session_id"]
    r = client.post(
        f"/api/sessions/{sid}/interview-assistant-chat",
        json_body={"message": "这个问题我该怎么回答？",
                   "current_question": {"question": "您的主要痛点？",
                                        "options": ["效率低", "成本高"]}},
    )
    assert r.status_code == 200
    assert r.get_json()["reply"]


def test_solution_share_requires_level(client):
    login(client)
    session = make_session(client)
    sid = session["session_id"]
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    client.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": "回答内容较充分，因为有具体例子",
        "dimension": q.get("dimension"),
    })
    client.post(f"/api/sessions/{sid}/generate-report",
                json_body={"force": True})
    client._app.state.report_queue.drain()
    status = client.get(
        f"/api/status/report-generation/{sid}").get_json()
    name = status["report_name"]
    # experience level cannot share
    r = client.post(f"/api/reports/{name}/solution/share", json_body={})
    assert r.status_code == 403


def test_metrics_endpoint(client):
    login(client, "13800000001")  # /api/metrics is admin-gated (ref parity)
    data = client.get("/api/metrics").get_json()
    assert "ai_calls" in data and "report_generation_queue" in data
    # A.6 payload parity (reference web/server.py:44901-44923)
    for key in ("question_generation", "question_generation_runtime",
                "search_decision", "report_generation_runtime",
                "list_overload", "list_endpoints"):
        assert key in data, key
    assert "by_mode" in data["question_generation_runtime"]


def test_metrics_question_generation_stats(client):
    login(client, "13800000001")
    sid = make_session(client)["session_id"]
    r = client.post(f"/api/sessions/{sid}/next-question", json_body={})
    assert r.status_code == 200
    data = client.get("/api/metrics").get_json()
    qg = data["question_generation"]
    assert qg["count"] >= 1
    assert sum(m["count"] for m in qg["by_mode"].values()) >= 1
    # reset clears aggregates (admin only; this login is the admin phone)
    assert client.post("/api/metrics/reset", json_body={}).status_code == 200
    data = client.get("/api/metrics").get_json()
    assert data["question_generation"]["count"] == 0


def test_admin_requires_admin(client):
    login(client, "13900000009")  # not in admin list
    assert client.get("/api/admin/licenses/summary").status_code == 403


def test_admin_license_lifecycle(client):
    login(client, "13800000001")  # admin phone
    r = client.post("/api/admin/licenses/batch",
                    json_body={"count": 2, "level": "professional"})
    assert r.status_code == 201
    codes = r.get_json()["codes"]
    assert len(codes) == 2

    summary = client.get("/api/admin/licenses/summary").get_json()
    assert summary["by_status"].get("issued", 0) >= 2

    # activate as normal user
    client.post("/api/auth/logout")
    login(client, "13900000010")
    r = client.post("/api/licenses/activate", json_body={"code": codes[0]})
    assert r.status_code == 200, r.text
    assert r.get_json()["license"]["status"] == "active"
    me = client.get("/api/auth/me").get_json()
    assert me["user"]["level"] == "professional"

    # wrong code
    r = client.post("/api/licenses/activate", json_body={"code": "BAD-CODE"})
    assert r.status_code == 400


def test_license_enforcement_gate(client):
    login(client, "13800000001")
    r = client.post("/api/admin/license-enforcement",
                    json_body={"enabled": True})
    assert r.get_json()["enabled"] is True
    client.post("/api/auth/logout")

    login(client, "13900000020")  # unlicensed user
    r = client.post("/api/sessions", json_body={
        "topic": "x", "scenario_id": "product-requirement"})
    assert r.status_code == 403
    assert r.get_json().get("license_required") is True


def test_admin_config_center(client):
    login(client, "13800000001")
    data = client.get("/api/admin/config-center").get_json()
    assert "ai" in data["groups"]
    r = client.post("/api/admin/config-center/save", json_body={
        "updates": {"QUESTION_MAX_PENDING": 20, "NOT_ALLOWED_KEY": 1}})
    applied = r.get_json()["applied"]
    assert applied == {"QUESTION_MAX_PENDING": 20}


def test_ownership_migration_flow(client):
    login(client, "13900000030")
    session = make_session(client, topic="迁移测试")
    from_user = client.get("/api/auth/me").get_json()["user"]["user_id"]
    client.post("/api/auth/logout")

    login(client, "13800000001")  # admin
    audit = client.post("/api/admin/ownership-migrations/audit",
                        json_body={"user_id": from_user}).get_json()
    assert audit["session_count"] == 1
    preview = client.post(
        "/api/admin/ownership-migrations/preview",
        json_body={"from_user_id": from_user, "to_user_id": 999},
    ).get_json()
    # wrong confirm word
    r = client.post("/api/admin/ownership-migrations/apply", json_body={
        "preview_token": preview["preview_token"], "confirm_word": "wrong"})
    assert r.status_code == 400
    r = client.post("/api/admin/ownership-migrations/apply", json_body={
        "preview_token": preview["preview_token"],
        "confirm_word": preview["confirm_word"]})
    assert r.status_code == 200
    assert r.get_json()["moved_sessions"] == 1

    history = client.get("/api/admin/ownership-migrations").get_json()
    assert history and history[0]["action"] == "apply"
    backup = r.get_json()["backup"]
    r = client.post("/api/admin/ownership-migrations/rollback",
                    json_body={"backup": backup})
    assert r.status_code == 200
    assert r.get_json()["restored"] >= 1


def test_custom_scenario_generate_and_use(client):
    login(client, "13800000001")
    r = client.post("/api/scenarios/generate",
                    json_body={"description": "智能客服机器人选型调研"})
    # experience-level admin may be blocked by level; accept 200 or 403
    assert r.status_code in (200, 403)
    if r.status_code == 200:
        scenario = r.get_json()["scenario"]
        assert scenario["dimensions"]


def test_image_upload_degraded_caption(client):
    """Images are accepted and contribute a structured degraded caption to
    the session docs (reference describe_image_with_vision
    web/server.py:26523; VERDICT r2 item #9)."""
    import io

    from PIL import Image

    login(client)
    sid = make_session(client)["session_id"]
    buf = io.BytesIO()
    Image.new("RGB", (1920, 600), (40, 90, 200)).save(buf, format="PNG")
    r = client.open(f"/api/sessions/{sid}/documents", method="POST",
                    files={"file": ("flow.png", buf.getvalue(), "image/png")})
    assert r.status_code == 200, r.text
    doc = r.get_json()["document"]
    assert doc["kind"] == "image"
    assert doc["vision_mode"] == "degraded_caption"
    assert "1920x600" in doc["content"]
    assert "宽幅" in doc["content"]
    # the doc must reach the interview prompt context
    sess = client.get(f"/api/sessions/{sid}").get_json()
    assert any(d.get("kind") == "image"
               for d in sess["reference_materials"])
    from deepvision_tpu.web.runtime.interview import build_doc_context
    ctx = build_doc_context(sess["reference_materials"])
    assert "flow.png" in ctx


def test_evidence_ledger_and_preflight(client):
    """Evidence ledger + preflight probes + legacy backfill
    (reference web/server.py:19481, 19738, 20903)."""
    from deepvision_tpu.web.runtime.followup import (
        backfill_evidence_annotations,
        build_evidence_ledger,
        plan_preflight_probes,
    )

    login(client)
    sid = make_session(client)["session_id"]
    q = client.post(f"/api/sessions/{sid}/next-question",
                    json_body={}).get_json()
    client.post(f"/api/sessions/{sid}/submit-answer", json_body={
        "question": q["question"], "answer": "具体来说我们有三个系统，因为数据分散",
        "dimension": q.get("dimension"), "rationale_text": "例如报表手工汇总",
    })
    sess = client.get(f"/api/sessions/{sid}").get_json()
    # entries carry evidence_class annotations at submit time
    assert sess["interview_log"][0].get("evidence_class")
    ledger = build_evidence_ledger(sess)
    assert ledger["overall"] in ("weak", "adequate", "strong")
    assert ledger["dimensions"]  # per-dimension accounting
    probes = plan_preflight_probes(sess)
    assert probes and probes[0]["reason"] in (
        "dimension_unvisited", "weak_evidence", "aspect_uncovered",
        "pending_follow_up")
    # readiness payload exposes the ledger
    r = client.get(f"/api/sessions/{sid}/report-readiness")
    assert "evidence_ledger" in r.get_json()
    # legacy backfill: strip annotations, re-derive
    for e in sess["interview_log"]:
        e.pop("quality_score", None)
        e.pop("evidence_class", None)
    n = backfill_evidence_annotations(sess)
    assert n == len(sess["interview_log"])
    assert all(e.get("evidence_class") for e in sess["interview_log"])
