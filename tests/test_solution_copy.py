"""AI chapter copy + quality review merge into solution payloads."""

import json

from deepvision_tpu.web.runtime.solution import merge_ai_copy


def _payload():
    return {"chapter_copy": {}, "quality_review": {}, "overview": "x",
            "title": "方案"}


def test_valid_copy_merges():
    resp = json.dumps({
        "chapter_copy": {"value_statement": "价值", "approach": "路径",
                         "commitment": "承诺"},
        "quality_review": {"score": 0.9, "verdict": "pass",
                           "strengths": ["好"], "concerns": []},
    }, ensure_ascii=False)
    out = merge_ai_copy(_payload(), resp)
    assert out["chapter_copy"]["value_statement"] == "价值"
    assert out["quality_review"]["score"] == 0.9
    assert out["quality_review"]["verdict"] == "pass"


def test_malformed_json_leaves_payload_untouched():
    out = merge_ai_copy(_payload(), "not json at all {{{")
    assert out["chapter_copy"] == {}
    assert out["quality_review"] == {}


def test_partial_copy_rejected():
    resp = json.dumps({"chapter_copy": {"value_statement": "只有一个字段"}})
    out = merge_ai_copy(_payload(), resp)
    assert out["chapter_copy"] == {}  # schema requires all three fields


def test_score_clamped_and_bad_score_rejected():
    good = json.dumps({"quality_review": {"score": 7, "verdict": "pass"}})
    out = merge_ai_copy(_payload(), good)
    assert out["quality_review"]["score"] == 1.0
    bad = json.dumps({"quality_review": {"score": "abc", "verdict": "x"}})
    out2 = merge_ai_copy(_payload(), bad)
    assert out2["quality_review"] == {}


def test_end_to_end_solution_has_ai_copy(tmp_path):
    from deepvision_tpu.web.server import create_app

    app = create_app(data_dir=str(tmp_path), overrides={
        "AI_MODE": "template", "SMS_TEST_CODE": "666666",
        "DEBUG_MODE": True,
    })
    try:
        c = app.test_client()
        c.post("/api/auth/sms/send-code", json_body={"phone": "139"})
        c.post("/api/auth/login/code",
               json_body={"phone": "139", "code": "666666"})
        s = c.post("/api/sessions", json_body={
            "topic": "文案测试", "scenario_id": "product-requirement",
            "interview_mode": "quick"}).get_json()
        sid = s["session_id"]
        q = c.post(f"/api/sessions/{sid}/next-question",
                   json_body={}).get_json()
        c.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"], "answer": "回答，因为有具体例子",
            "dimension": q.get("dimension")})
        c.post(f"/api/sessions/{sid}/generate-report",
               json_body={"force": True})
        app.state.report_queue.drain()
        name = c.get(
            f"/api/status/report-generation/{sid}").get_json()["report_name"]
        sol = c.get(f"/api/reports/{name}/solution").get_json()
        assert sol["chapter_copy"].get("value_statement")
        assert sol["quality_review"].get("verdict") == "pass"
    finally:
        app.state.shutdown()
