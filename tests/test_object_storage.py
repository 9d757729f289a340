"""Object storage: SigV4 signing determinism + local backend."""

import datetime

from deepvision_tpu.web.object_storage import LocalObjectStore, SigV4S3Client


def test_sigv4_deterministic_and_well_formed():
    client = SigV4S3Client(
        "https://s3.example.com", "bucket", "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", region="us-east-1",
    )
    t = datetime.datetime(2026, 8, 16, 12, 0, 0,
                          tzinfo=datetime.timezone.utc)
    h1 = client._sign("PUT", "/bucket/key.txt", "", b"hello", now=t)
    h2 = client._sign("PUT", "/bucket/key.txt", "", b"hello", now=t)
    assert h1 == h2  # deterministic for fixed time
    assert h1["Authorization"].startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20260816/us-east-1/s3/"
        "aws4_request"
    )
    assert "SignedHeaders=host;x-amz-content-sha256;x-amz-date" in \
        h1["Authorization"]
    assert len(h1["Authorization"].split("Signature=")[1]) == 64
    assert h1["x-amz-date"] == "20260816T120000Z"
    # different payload -> different signature
    h3 = client._sign("PUT", "/bucket/key.txt", "", b"world", now=t)
    assert h3["Authorization"] != h1["Authorization"]


def test_local_backend_roundtrip(tmp_path):
    store = LocalObjectStore(str(tmp_path))
    store.put_object("exports/报告.md/a1/file.pdf", b"%PDF-1.4")
    assert store.get_object("exports/报告.md/a1/file.pdf") == b"%PDF-1.4"
    keys = store.list_keys("exports/")
    assert keys == ["exports/报告.md/a1/file.pdf"]
    assert store.list_keys("nope/") == []


def test_sigv4_signature_matches_independent_derivation():
    """The signature must equal a from-first-principles AWS4 derivation
    (key chain + canonical request), computed independently here — the
    production signer cannot drift from the spec without this failing."""
    import hashlib
    import hmac as hmac_mod

    endpoint = "https://s3.example.com"
    client = SigV4S3Client(
        endpoint, "bucket", "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", region="eu-west-1",
    )
    t = datetime.datetime(2026, 1, 2, 3, 4, 5,
                          tzinfo=datetime.timezone.utc)
    payload = "中文内容".encode("utf-8")
    headers = client._sign("PUT", "/bucket/导出 报告.md", "", payload,
                           now=t)

    # independent derivation, straight from the SigV4 spec
    from urllib.parse import quote

    payload_hash = hashlib.sha256(payload).hexdigest()
    canonical = "\n".join([
        "PUT",
        quote("/bucket/导出 报告.md"),
        "",
        f"host:s3.example.com\nx-amz-content-sha256:{payload_hash}\n"
        f"x-amz-date:20260102T030405Z\n",
        "host;x-amz-content-sha256;x-amz-date",
        payload_hash,
    ])
    scope = "20260102/eu-west-1/s3/aws4_request"
    sts = "\n".join([
        "AWS4-HMAC-SHA256", "20260102T030405Z", scope,
        hashlib.sha256(canonical.encode()).hexdigest(),
    ])

    def hm(key, msg):
        return hmac_mod.new(key, msg.encode(), hashlib.sha256).digest()

    k = hm(b"AWS4wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "20260102")
    k = hm(k, "eu-west-1")
    k = hm(k, "s3")
    k = hm(k, "aws4_request")
    expect = hmac_mod.new(k, sts.encode(), hashlib.sha256).hexdigest()
    assert headers["Authorization"].endswith(f"Signature={expect}")


def test_local_backend_nested_keys_and_listing(tmp_path):
    store = LocalObjectStore(str(tmp_path))
    store.put_object("exports/报告甲.md/a1/导出.md", "内容一".encode())
    store.put_object("exports/报告乙.md/a2/导出.docx", b"\x00binary")
    store.put_object("presentations/deck1.json", b"{}")
    assert store.get_object("exports/报告甲.md/a1/导出.md") == \
        "内容一".encode()
    keys = set(store.list_keys("exports/"))
    assert keys == {"exports/报告甲.md/a1/导出.md",
                    "exports/报告乙.md/a2/导出.docx"}
    assert set(store.list_keys()) >= keys | {"presentations/deck1.json"}


def test_local_backend_refuses_escaping_keys(tmp_path):
    import pytest as _pytest

    store = LocalObjectStore(str(tmp_path))
    for bad in ("../outside.txt", "a/../../outside.txt", "/absolute.txt",
                "a/../..", "..\\win.txt"):
        with _pytest.raises(ValueError):
            store.put_object(bad, b"x")
        with _pytest.raises((ValueError, OSError)):
            store.get_object(bad)
    # benign dot-dot-free nesting still works
    store.put_object("a/b/../b/c.txt".replace("/../", "/"), b"ok")


def test_history_service_archives_and_syncs_local(tmp_path):
    """archive_export + sync_history against the LOCAL backend through a
    real app (the production no-endpoint configuration)."""
    import tempfile as _tf

    from deepvision_tpu.web.http import TestClient as HttpClient
    from deepvision_tpu.web.server import create_app

    tmp = _tf.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "objstore-secret",
        "SMS_SEND_COOLDOWN_SECONDS": "0",
    })
    try:
        c = HttpClient(app)
        c.post("/api/auth/sms/send-code", json_body={"phone": "13900000201"})
        c.post("/api/auth/login/code",
               json_body={"phone": "13900000201", "code": "666666"})
        r = c.post("/api/sessions", json_body={
            "topic": "对象存储访谈", "scenario_id": "product-requirement"})
        sid = r.get_json()["session_id"]
        q = c.post(f"/api/sessions/{sid}/next-question",
                   json_body={}).get_json()
        c.post(f"/api/sessions/{sid}/submit-answer", json_body={
            "question": q["question"], "answer": "现状靠表格，因为没系统",
            "dimension": q.get("dimension"), "options": q.get("options")})
        r = c.post(f"/api/sessions/{sid}/generate-report",
                   json_body={"force": True})
        assert r.status_code == 202
        app.state.report_queue.drain()
        st = c.get(f"/api/status/report-generation/{sid}").get_json()
        report = st["report_name"]
        r = c.post(f"/api/reports/{report}/exports",
                   json_body={"format": "markdown"})
        assert r.status_code == 201
        from deepvision_tpu.web.object_storage import (
            ObjectStorageHistoryService,
        )

        svc = ObjectStorageHistoryService(app.state)
        out = svc.sync_history()
        assert out["synced"] >= 1
        keys = svc.backend.list_keys("exports/")
        assert any(report in k for k in keys), keys
    finally:
        app.state.report_queue.shutdown()
        app.state.shutdown()
        tmp.cleanup()
