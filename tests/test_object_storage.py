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
