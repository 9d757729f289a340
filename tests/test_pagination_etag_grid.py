"""Pagination + ETag conditional-GET grid over every list endpoint.

The pagination layer (web/pagination.py, mirroring reference
web/server.py:5338-5399) is exercised per endpoint here: hostile page
params, the X-Total-Count contract, the full If-None-Match state
machine (match -> 304 with ETag, stale -> 200 with new ETag, garbage ->
200), and ETag stability/invalidations driven by actual writes.
List endpoints are enumerated so a new one joins the grid on ship.
"""

import tempfile

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800006001"
USER_PHONE = "13900006001"

# endpoint -> (client key, needs_query)
LIST_ENDPOINTS = {
    "/api/sessions": "user",
    "/api/reports": "user",
    "/api/scenarios": "user",
    "/api/admin/licenses": "admin",
    "/api/admin/users?q=139": "admin",
    "/api/admin/usage/users": "admin",
    "/api/admin/ownership-migrations": "admin",
}

HOSTILE_PAGING = [
    "page=0", "page=-5", "page=999999", "page=abc", "page=",
    "page_size=0", "page_size=-1", "page_size=100000", "page_size=x",
    "page=2&page_size=1", "page=1.5", "page=%20", "page=1&page=2",
]


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "etag-grid-secret",
        "ADMIN_PHONE_NUMBERS": ADMIN_PHONE,
        "SMS_SEND_COOLDOWN_SECONDS": "0",
    })

    def login(phone):
        c = HttpClient(app)
        c.post("/api/auth/sms/send-code", json_body={"phone": phone})
        r = c.post("/api/auth/login/code",
                   json_body={"phone": phone, "code": "666666"})
        assert r.status_code == 200, r.text
        return c

    user, admin = login(USER_PHONE), login(ADMIN_PHONE)
    sids = []
    for i in range(3):
        r = user.post("/api/sessions", json_body={
            "topic": f"分页访谈{i}", "scenario_id": "product-requirement"})
        sids.append(r.get_json()["session_id"])
    admin.post("/api/admin/licenses/batch",
               json_body={"count": 3, "level": "standard"})
    yield {"app": app, "user": user, "admin": admin, "sids": sids}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def _client(ctx, path):
    return ctx[LIST_ENDPOINTS[path]]


def _q(path, extra):
    return path + ("&" if "?" in path else "?") + extra


@pytest.mark.parametrize("path", sorted(LIST_ENDPOINTS))
def test_hostile_paging_params_never_5xx(ctx, path):
    c = _client(ctx, path)
    for params in HOSTILE_PAGING:
        r = c.get(_q(path, params))
        assert r.status_code < 500, (path, params, r.status_code)


@pytest.mark.parametrize("path", sorted(LIST_ENDPOINTS))
def test_etag_roundtrip_and_304(ctx, path):
    c = _client(ctx, path)
    r1 = c.get(path)
    assert r1.status_code == 200, (path, r1.status_code, r1.text)
    etag = r1.headers.get("ETag")
    if etag is None:
        pytest.skip(f"{path} serves no ETag (not a cached list)")
    # match -> 304, empty body, ETag echoed
    r2 = c.get(path, headers={"If-None-Match": etag})
    assert r2.status_code == 304, (path, r2.status_code)
    assert r2.data in (b"", None)
    assert r2.headers.get("ETag") == etag
    # stale/garbage validators -> full 200 with the current ETag
    for bogus in ('"deadbeef"', "W/\"x\"", "garbage", ""):
        r3 = c.get(path, headers={"If-None-Match": bogus})
        assert r3.status_code == 200, (path, bogus, r3.status_code)
        assert r3.headers.get("ETag") == etag


def test_etag_changes_when_the_list_changes(ctx):
    c = ctx["user"]
    r1 = c.get("/api/sessions")
    etag1 = r1.headers.get("ETag")
    assert etag1
    r = c.post("/api/sessions", json_body={
        "topic": "使缓存失效的新访谈", "scenario_id": "product-requirement"})
    assert r.status_code in (200, 201)
    r2 = c.get("/api/sessions")
    assert r2.status_code == 200
    assert r2.headers.get("ETag") != etag1
    # and the OLD validator now revalidates to 200, not 304
    r3 = c.get("/api/sessions", headers={"If-None-Match": etag1})
    assert r3.status_code == 200


def test_total_count_is_stable_across_pages(ctx):
    c = ctx["user"]
    r = c.get("/api/sessions?page=1&page_size=2")
    total = r.headers.get("X-Total-Count")
    assert total is not None and int(total) >= 3
    body1 = r.get_json()
    r2 = c.get("/api/sessions?page=2&page_size=2")
    assert r2.headers.get("X-Total-Count") == total
    body2 = r2.get_json()
    items1 = body1 if isinstance(body1, list) else body1.get("items", [])
    items2 = body2 if isinstance(body2, list) else body2.get("items", [])
    assert len(items1) == 2
    ids1 = {s.get("session_id") for s in items1}
    ids2 = {s.get("session_id") for s in items2}
    assert not ids1 & ids2, "pages overlap"


def test_out_of_range_page_is_empty_not_error(ctx):
    c = ctx["user"]
    r = c.get("/api/sessions?page=50&page_size=20")
    assert r.status_code == 200
    body = r.get_json()
    items = body if isinstance(body, list) else body.get("items", [])
    assert items == []


def test_page_size_is_clamped(ctx):
    c = ctx["user"]
    r = c.get("/api/sessions?page=1&page_size=100000")
    assert r.status_code == 200
    items = r.get_json()
    items = items if isinstance(items, list) else items.get("items", [])
    # clamped to the layer's cap, and total still reported
    assert len(items) <= 200
    assert r.headers.get("X-Total-Count")


def test_etags_differ_between_users(ctx):
    """ETags are content-addressed per OWNER-scoped list: another user
    must not be able to replay a victim's validator and learn whether
    the victim's list changed (scope isolation extends to caching)."""
    app = ctx["app"]
    c2 = HttpClient(app)
    c2.post("/api/auth/sms/send-code", json_body={"phone": "13900006002"})
    c2.post("/api/auth/login/code",
            json_body={"phone": "13900006002", "code": "666666"})
    mine = ctx["user"].get("/api/sessions").headers.get("ETag")
    r = c2.get("/api/sessions", headers={"If-None-Match": mine})
    # different (empty) list: the validator must NOT match
    assert r.status_code == 200
    assert r.headers.get("ETag") != mine
