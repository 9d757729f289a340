"""Interview-assessment scenario produces a scorecard report."""

import tempfile

import pytest

from deepvision_tpu.web.server import create_app


@pytest.fixture()
def client():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "AI_MODE": "template", "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
    })
    c = app.test_client()
    c._app = app
    yield c
    app.state.shutdown()
    tmp.cleanup()


def test_assessment_scenario_report_has_scorecard(client):
    client.post("/api/auth/sms/send-code", json_body={"phone": "139"})
    client.post("/api/auth/login/code",
                json_body={"phone": "139", "code": "666666"})
    s = client.post("/api/sessions", json_body={
        "topic": "后端工程师面试评估",
        "scenario_id": "interview-assessment",
        "interview_mode": "quick",
    }).get_json()
    sid = s["session_id"]

    for i in range(6):
        q = client.post(f"/api/sessions/{sid}/next-question",
                        json_body={}).get_json()
        if q.get("all_dimensions_completed"):
            break
        if q.get("completed"):
            continue
        client.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"],
            "answer": "候选人给出了具体案例：首先分析了瓶颈，其次用缓存优化，"
                      f"例如第{i}个项目中 QPS 提升明显。",
            "dimension": q.get("dimension"),
        })

    client.post(f"/api/sessions/{sid}/generate-report",
                json_body={"force": True})
    client._app.state.report_queue.drain()
    status = client.get(
        f"/api/status/report-generation/{sid}").get_json()
    assert status["state"] == "completed", status
    content = client.get(
        f"/api/reports/{status['report_name']}").text
    assert "评估打分" in content
    assert "综合得分" in content
    assert "| 维度 |" in content
