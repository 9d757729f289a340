"""Lifecycle matrix: the full interview->report->solution->export journey
crossed over (user level x interview mode x store backend), plus
share-link and deletion lifecycles per backend.

This is the round-4 depth pass toward the reference's
test_api_comprehensive.py grid (6.5k LoC of per-combination lifecycles):
instead of sampling one happy path, every capability-relevant
combination drives the REAL route surface end to end — mode clamping,
report-profile gating, export gating, share gating, and byte-identical
behavior between file-mirrored and store-backed persistence (the
reference's "pure cloud" mode, web/server.py:5021-5164).
"""

import tempfile

import pytest

from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800000001"

LEVELS = ("experience", "standard", "professional")
MODES = ("quick", "standard", "deep")
BACKENDS = ("files", "store")

# level -> highest mode it may run (levels_matrix: experience=quick,
# standard=standard, professional=deep)
MODE_RANK = {"quick": 0, "standard": 1, "deep": 2}
LEVEL_MODE_CAP = {"experience": "quick", "standard": "standard",
                  "professional": "deep"}
# level -> (docx_export, appendix, share)
# exports per levels.py: experience=markdown; standard=+docx;
# professional=+pdf/appendix (+solution share)
LEVEL_CAPS = {
    "experience": {"docx": False, "appendix": False, "share": False},
    "standard": {"docx": True, "appendix": False, "share": True},
    "professional": {"docx": True, "appendix": True, "share": True},
}


def _mkclient(tmp, backend):
    app = create_app(data_dir=tmp, overrides={
        "AI_MODE": "template", "SMS_PROVIDER": "mock",
        "SMS_TEST_CODE": "666666", "DEBUG_MODE": True,
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": 0, "SMS_DAILY_CAP": 1000,
    })
    if backend == "store":
        # the reference's "pure cloud" payload mode: session/report bodies
        # live in the meta-index stores, files become a write-through
        # detail (tests force the code path the same way the reference
        # monkeypatches _use_pure_cloud_session_storage)
        app.state.sessions.use_db_payload = True
        app.state.reports.use_db_payload = True
    c = app.test_client()
    c._app = app
    return c


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


@pytest.fixture()
def client(backend):
    tmp = tempfile.TemporaryDirectory()
    c = _mkclient(tmp.name, backend)
    yield c
    c.app.state.shutdown()
    tmp.cleanup()


def login(client, phone="13900000001"):
    client.post("/api/auth/sms/send-code", json_body={"phone": phone})
    r = client.post("/api/auth/login/code",
                    json_body={"phone": phone, "code": "666666"})
    assert r.status_code == 200, r.text
    return r.get_json()["user"]


def set_level(client, user_id, level):
    client.post("/api/auth/logout")
    login(client, ADMIN_PHONE)
    r = client.put(f"/api/admin/users/{user_id}/level",
                   json_body={"level": level})
    assert r.status_code == 200, r.text
    client.post("/api/auth/logout")


def login_at_level(client, level, phone="13900000001"):
    user = login(client, phone)
    if level != "experience":
        set_level(client, user["user_id"], level)
        user = login(client, phone)
        assert user["level"] == level
    return user


def run_interview(client, mode, n_answers=2, topic="矩阵验证访谈"):
    r = client.post("/api/sessions", json_body={
        "topic": topic, "scenario_id": "product-requirement",
        "interview_mode": mode,
    })
    assert r.status_code == 201, r.text
    session = r.get_json()
    sid = session["session_id"]
    for _ in range(n_answers):
        q = client.post(f"/api/sessions/{sid}/next-question",
                        json_body={}).get_json()
        assert q.get("question"), q
        r = client.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"],
            "answer": "主要诉求是统一数据口径，因为现在三套系统口径不一致",
            "dimension": q.get("dimension"), "options": q.get("options"),
        })
        assert r.status_code == 200, r.text
    return session


def gen_report(client, sid):
    r = client.post(f"/api/sessions/{sid}/generate-report",
                    json_body={"force": True})
    assert r.status_code == 202, r.text
    client.app.state.report_queue.drain()
    status = client.get(f"/api/status/report-generation/{sid}").get_json()
    assert status["state"] == "completed", status
    return status["report_name"]


# ---------------------------------------------------------------------------
# Grid A: level x mode x backend full lifecycle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("level", LEVELS)
@pytest.mark.parametrize("mode", MODES)
def test_full_lifecycle_level_mode_backend(client, level, mode):
    login_at_level(client, level)
    session = run_interview(client, mode)
    sid = session["session_id"]

    # 1. mode clamping follows the level capability matrix
    cap = LEVEL_MODE_CAP[level]
    expected = mode if MODE_RANK[mode] <= MODE_RANK[cap] else cap
    assert session["interview_mode"] == expected, (level, mode, session)

    # 2. session round-trips through the active backend with evidence
    got = client.get(f"/api/sessions/{sid}").get_json()
    assert got["topic"] == "矩阵验证访谈"
    assert len(got["interview_log"]) == 2
    entry = got["interview_log"][0]
    for key in ("answer_mode", "evidence_intent", "quality_score"):
        assert key in entry, entry.keys()

    # 3. report completes and binds to the session
    report_name = gen_report(client, sid)
    got = client.get(f"/api/sessions/{sid}").get_json()
    assert got["current_report_name"] == report_name
    body = client.get(f"/api/reports/{report_name}")
    assert body.status_code == 200 and "总体概述" in body.text

    # 4. solution payload derives with the A.5 top-level contract
    sol = client.get(f"/api/reports/{report_name}/solution").get_json()
    for key in ("hero", "sections", "nav_items", "decision_brief",
                "solution_schema_meta"):
        assert key in sol, key

    # 5. export gates follow the level
    caps = LEVEL_CAPS[level]
    r_docx = client.post(f"/api/reports/{report_name}/exports",
                         json_body={"format": "docx"})
    assert (r_docx.status_code == 201) == caps["docx"], \
        (level, r_docx.status_code, r_docx.text[:200])
    r_app = client.get(f"/api/reports/{report_name}/appendix/pdf")
    assert (r_app.status_code == 200) == caps["appendix"], \
        (level, r_app.status_code)
    # markdown export is available to every level
    r_md = client.post(f"/api/reports/{report_name}/exports",
                       json_body={"format": "markdown"})
    assert r_md.status_code == 201, r_md.text

    # 6. share gate follows the level
    r_share = client.post(f"/api/reports/{report_name}/solution/share",
                          json_body={})
    assert (r_share.status_code == 200) == caps["share"], \
        (level, r_share.status_code, r_share.text[:200])


# ---------------------------------------------------------------------------
# Grid B: share-link lifecycle per backend
# ---------------------------------------------------------------------------

def test_share_lifecycle_public_read_and_owner_only_create(client):
    login_at_level(client, "professional")
    sid = run_interview(client, "quick")["session_id"]
    report = gen_report(client, sid)
    token = client.post(f"/api/reports/{report}/solution/share",
                        json_body={}).get_json()["share_token"]

    # public access works anonymously
    client.post("/api/auth/logout")
    pub = client.get(f"/api/public/solutions/{token}")
    assert pub.status_code == 200
    assert "hero" in pub.get_json()

    # a DIFFERENT professional user cannot mint a share for it
    other = login(client, "13900000002")
    set_level(client, other["user_id"], "professional")
    login(client, "13900000002")
    r = client.post(f"/api/reports/{report}/solution/share", json_body={})
    assert r.status_code in (403, 404), r.status_code

    # bogus token 404s
    client.post("/api/auth/logout")
    assert client.get("/api/public/solutions/not-a-token").status_code == 404


# ---------------------------------------------------------------------------
# Grid C: deletion + backend equivalence
# ---------------------------------------------------------------------------

def test_delete_session_then_report_listing_consistent(client):
    login_at_level(client, "standard")
    sid = run_interview(client, "quick")["session_id"]
    report = gen_report(client, sid)
    r = client.post("/api/sessions/batch-delete",
                    json_body={"session_ids": [sid],
                               "delete_reports": True})
    assert r.status_code == 200, r.text
    ids = [s["session_id"] for s in
           client.get("/api/sessions").get_json()]
    assert sid not in ids
    names = [x["report_name"] for x in
             client.get("/api/reports").get_json()]
    assert report not in names
    assert client.get(f"/api/reports/{report}").status_code == 404


def test_store_backend_serves_payload_without_files():
    """store mode must serve the payload from the meta-index even when
    the mirrored file vanishes (multi-worker 'pure cloud' semantics)."""
    import os

    tmp = tempfile.TemporaryDirectory()
    try:
        c = _mkclient(tmp.name, "store")
        login(c, "13900000003")
        sid = run_interview(c, "quick")["session_id"]
        # remove the mirrored file; the store copy must still serve
        path = os.path.join(tmp.name, "sessions", f"{sid}.json")
        if os.path.exists(path):
            os.remove(path)
        with c.app.state.sessions._cache_lock:
            c.app.state.sessions._cache.clear()
        got = c.get(f"/api/sessions/{sid}")
        assert got.status_code == 200
        assert len(got.get_json()["interview_log"]) == 2
        c.app.state.shutdown()
    finally:
        tmp.cleanup()


# ---------------------------------------------------------------------------
# Grid D: pagination + ETag behave identically across backends
# ---------------------------------------------------------------------------

def test_pagination_and_etag_across_backends(client):
    login_at_level(client, "professional")
    for i in range(5):
        run_interview(client, "quick", n_answers=1, topic=f"分页验证{i}")
    r = client.get("/api/sessions?page=1&page_size=2")
    assert r.status_code == 200
    assert len(r.get_json()) == 2
    assert int(r.headers.get("X-Total-Count", 0)) >= 5
    etag = r.headers.get("ETag")
    assert etag
    r304 = client.get("/api/sessions?page=1&page_size=2",
                      headers={"If-None-Match": etag})
    assert r304.status_code == 304
