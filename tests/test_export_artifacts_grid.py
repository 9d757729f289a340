"""Export artifact structure × format grid, on real generated reports.

tests/test_exports.py validates the OOXML/PDF writers on synthetic
documents; tests/test_lifecycle_matrix.py pins WHO may export WHAT.
This grid closes the remaining gap: artifacts produced through the live
route, from a real generated report, are structurally valid files a
third-party reader would open — every docx part parses as XML with
resolvable relationships, the PDF has header/xref/EOF and decodes its
content streams, markdown carries the report's headings — and the asset
lifecycle (list → download → regenerate → delete) holds together.

Reference: export endpoints web/server.py (docx/pdf/appendix family).
"""

import io
import re
import tempfile
import zipfile
from xml.etree import ElementTree

import pytest

from deepvision_tpu.web.http import TestClient as HttpClient
from deepvision_tpu.web.server import create_app

ADMIN_PHONE = "13800003001"
USER_PHONE = "13900003001"


@pytest.fixture(scope="module")
def ctx():
    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "export-grid-secret",
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

    admin = login(ADMIN_PHONE)
    user = login(USER_PHONE)
    uid = user.get("/api/auth/me").get_json()["user"]["user_id"]
    r = admin.put(f"/api/admin/users/{uid}/level",
                  json_body={"level": "professional"})
    assert r.status_code == 200
    r = user.post("/api/sessions", json_body={
        "topic": "导出产物结构测试", "scenario_id": "product-requirement"})
    sid = r.get_json()["session_id"]
    for _ in range(2):
        q = user.post(f"/api/sessions/{sid}/next-question",
                      json_body={}).get_json()
        user.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"], "answer": "现状是人工对账，因为系统割裂",
            "dimension": q.get("dimension"), "options": q.get("options")})
    r = user.post(f"/api/sessions/{sid}/generate-report",
                  json_body={"force": True})
    assert r.status_code == 202, r.text
    app.state.report_queue.drain()
    st = user.get(f"/api/status/report-generation/{sid}").get_json()
    assert st["state"] == "completed", st
    yield {"app": app, "user": user, "sid": sid,
           "report": st["report_name"]}
    app.state.report_queue.shutdown()
    app.state.shutdown()
    tmp.cleanup()


def _export(ctx, fmt):
    r = ctx["user"].post(f"/api/reports/{ctx['report']}/exports",
                         json_body={"format": fmt})
    assert r.status_code == 201, (fmt, r.status_code, r.text)
    asset = r.get_json()
    aid = asset["asset_id"]
    dl = ctx["user"].get(
        f"/api/reports/{ctx['report']}/exports/{aid}")
    assert dl.status_code == 200, (fmt, dl.status_code)
    return asset, dl


def test_markdown_export_carries_report_structure(ctx):
    _asset, dl = _export(ctx, "markdown")
    text = dl.data.decode("utf-8")
    assert "导出产物结构测试" in text
    assert re.search(r"^# ", text, re.M), "top-level heading missing"
    assert re.search(r"^## ", text, re.M), "section headings missing"


def test_docx_export_is_openable_ooxml(ctx):
    _asset, dl = _export(ctx, "docx")
    zf = zipfile.ZipFile(io.BytesIO(dl.data))
    names = set(zf.namelist())
    assert "[Content_Types].xml" in names
    assert "word/document.xml" in names
    # every XML part parses; relationships resolve to present parts
    for n in names:
        if n.endswith(".xml") or n.endswith(".rels"):
            ElementTree.fromstring(zf.read(n))
    rels = zf.read("_rels/.rels").decode("utf-8")
    for target in re.findall(r'Target="([^"]+)"', rels):
        if not target.startswith(("http", "/")):
            assert target in names, target
    doc = zf.read("word/document.xml").decode("utf-8")
    assert "导出产物结构测试" in doc


def test_pdf_export_has_valid_skeleton_and_text(ctx):
    _asset, dl = _export(ctx, "pdf")
    data = dl.data
    assert data.startswith(b"%PDF-")
    assert b"%%EOF" in data[-64:]
    assert b"xref" in data and b"trailer" in data
    # content streams are uncompressed (<< /Length n >>; the writer
    # trades bytes for a zero-dependency reader path) — each declared
    # Length must match its stream body exactly, and at least one
    # stream carries text-showing operators
    streams = re.findall(
        rb"<< /Length (\d+) >>\r?\nstream\r?\n(.*?)\r?\nendstream",
        data, re.S)
    assert streams, "no sized streams"
    for length, raw in streams:
        assert int(length) == len(raw), (length, len(raw))
    assert any(b"Tj" in raw or b"TJ" in raw for _l, raw in streams), \
        "no text operators in any content stream"


def test_appendix_pdf_streams_direct(ctx):
    r = ctx["user"].get(
        f"/api/reports/{ctx['report']}/appendix/pdf")
    assert r.status_code == 200
    assert r.data.startswith(b"%PDF-")
    assert "pdf" in (r.headers.get("Content-Type") or "")


def test_asset_listing_reflects_all_created_assets(ctx):
    listed = ctx["user"].get(
        f"/api/reports/{ctx['report']}/exports").get_json()
    assets = listed if isinstance(listed, list) else listed.get("items", [])
    fmts = {a.get("format") for a in assets}
    assert {"markdown", "docx", "pdf"} <= fmts, fmts
    for a in assets:
        assert a.get("asset_id") and a.get("created_at"), a


def test_reexport_creates_distinct_asset(ctx):
    a1, _ = _export(ctx, "markdown")
    a2, _ = _export(ctx, "markdown")
    assert a1["asset_id"] != a2["asset_id"]


def test_unknown_asset_and_foreign_report_404(ctx):
    r = ctx["user"].get(
        f"/api/reports/{ctx['report']}/exports/no-such-asset")
    assert r.status_code == 404
    r = ctx["user"].get("/api/reports/不存在的报告.md/exports")
    assert r.status_code in (403, 404)
