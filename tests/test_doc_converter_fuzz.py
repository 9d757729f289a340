"""Malformed-document fuzz: the ingest path must degrade, never die.

The from-scratch converters (web/runtime/documents.py — zip+XML readers
for docx/xlsx/pptx, a Flate-stream text extractor for pdf) parse
ATTACKER-SUPPLIED bytes; the reference leans on pypdf/python-docx for
this hardening, so the in-house parsers need their own proof.  Three
layers:

  * converter level: a corpus of corrupted/hostile files (truncations,
    bit flips, wrong magic, zip bombs-in-miniature, recursive XML,
    missing parts) raises ConversionError or returns text — never an
    unhandled exception;
  * mutation sweep: REAL valid fixtures, byte-flipped and truncated at
    many offsets (seeded), through every converter;
  * route level: uploading each hostile file to a live session answers
    4xx/200-with-degraded-contract, never a 5xx, and the interview
    continues afterwards.
"""

import io
import struct
import zipfile

import pytest

from deepvision_tpu.web.runtime.documents import (
    ConversionError,
    convert_to_markdown,
)


def _zip_with(entries: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)
    return buf.getvalue()


W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _valid_docx() -> bytes:
    return _zip_with({
        "[Content_Types].xml": "<Types/>",
        "word/document.xml":
            f"<w:document xmlns:w='{W_NS}'><w:body><w:p><w:r><w:t>"
            "你好文档</w:t></w:r></w:p></w:body></w:document>",
    })


def _valid_xlsx() -> bytes:
    return _zip_with({
        "[Content_Types].xml": "<Types/>",
        "xl/worksheets/sheet1.xml":
            f"<worksheet xmlns='{S_NS}'><sheetData><row r='1'>"
            "<c t='s'><v>0</v></c></row></sheetData></worksheet>",
        "xl/sharedStrings.xml":
            f"<sst xmlns='{S_NS}'><si><t>共享数据</t></si></sst>",
    })


def _valid_pptx() -> bytes:
    return _zip_with({
        "[Content_Types].xml": "<Types/>",
        "ppt/slides/slide1.xml":
            f"<p:sld xmlns:p='pns' xmlns:a='{A_NS}'>"
            "<a:t>第一页要点</a:t></p:sld>",
    })


def _valid_pdf() -> bytes:
    import zlib

    stream = zlib.compress(b"BT (Hello PDF) Tj ET")
    body = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
            + str(len(stream)).encode() + b" >>\nstream\n" + stream
            + b"\nendstream\nendobj\ntrailer\n%%EOF\n")
    return body


VALID = {
    "a.docx": _valid_docx,
    "a.xlsx": _valid_xlsx,
    "a.pptx": _valid_pptx,
    "a.pdf": _valid_pdf,
}

HOSTILE = {
    # wrong container magic for the extension
    "notzip.docx": lambda: b"MZ\x90\x00 not a zip at all",
    "notpdf.pdf": lambda: b"PK\x03\x04 this is a zip header",
    # empty and tiny files
    "empty.docx": lambda: b"",
    "tiny.pdf": lambda: b"%PDF",
    # zip with the part missing entirely
    "nopart.docx": lambda: _zip_with({"[Content_Types].xml": "<T/>"}),
    "nopart.pptx": lambda: _zip_with({"other.xml": "<x/>"}),
    # malformed XML inside a valid zip
    "badxml.docx": lambda: _zip_with({
        "word/document.xml": "<w:document><w:t>unclosed"}),
    "badxml.xlsx": lambda: _zip_with({
        "xl/worksheets/sheet1.xml": "<worksheet><row"}),
    # deeply nested XML (parser recursion)
    "deep.docx": lambda: _zip_with({
        "word/document.xml":
            "<a>" * 2000 + "x" + "</a>" * 2000}),
    # central directory truncated
    "cut.docx": lambda: _valid_docx()[:-20],
    # pdf with a corrupt Flate stream
    "badflate.pdf": lambda: (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 10 >>\n"
        b"stream\n\xff\xfe\xfd\xfc\xfb\xfa\xf9\xf8\xf7\xf6\nendstream\n"
        b"endobj\n%%EOF"),
    # pdf with an absurd declared length
    "lenlie.pdf": lambda: (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
        b"999999999 >>\nstream\nAB\nendstream\nendobj\n%%EOF"),
}


@pytest.mark.parametrize("name", sorted(HOSTILE))
def test_hostile_files_raise_conversion_error_or_degrade(name):
    data = HOSTILE[name]()
    try:
        text = convert_to_markdown(name, data)
    except ConversionError:
        return  # the designed refusal
    assert isinstance(text, str)  # degraded-but-contained is also legal


@pytest.mark.parametrize("name", sorted(VALID))
def test_valid_fixtures_convert(name):
    text = convert_to_markdown(name, VALID[name]())
    assert isinstance(text, str) and text.strip()


@pytest.mark.parametrize("name", sorted(VALID))
def test_mutation_sweep_never_crashes(name):
    """Byte-flip and truncate real files at seeded offsets — the
    converters see thousands of near-valid shapes over CI lifetime."""
    import random

    rng = random.Random(hash(name) & 0xFFFF)
    base = VALID[name]()
    for trial in range(40):
        data = bytearray(base)
        if trial % 2 == 0 and len(data) > 4:
            # flip 1-4 bytes
            for _ in range(rng.randint(1, 4)):
                data[rng.randrange(len(data))] ^= rng.randint(1, 255)
            data = bytes(data)
        else:
            data = bytes(data[: rng.randrange(1, len(data))])
        try:
            out = convert_to_markdown(name, data)
            assert isinstance(out, str)
        except ConversionError:
            pass


def test_upload_route_contains_hostile_files():
    """Route level: hostile uploads 4xx or degrade; the session keeps
    working either way."""
    import tempfile

    from deepvision_tpu.web.http import TestClient as HttpClient
    from deepvision_tpu.web.server import create_app

    tmp = tempfile.TemporaryDirectory()
    app = create_app(data_dir=tmp.name, overrides={
        "SMS_PROVIDER": "mock", "SMS_TEST_CODE": "666666",
        "AI_MODE": "template", "SECRET_KEY": "doc-fuzz-secret",
        "SMS_SEND_COOLDOWN_SECONDS": "0",
    })
    try:
        c = HttpClient(app)
        c.post("/api/auth/sms/send-code", json_body={"phone": "13900004001"})
        r = c.post("/api/auth/login/code",
                   json_body={"phone": "13900004001", "code": "666666"})
        assert r.status_code == 200
        r = c.post("/api/sessions", json_body={
            "topic": "上传模糊测试", "scenario_id": "product-requirement"})
        sid = r.get_json()["session_id"]
        for name in sorted(HOSTILE):
            r = c.open(f"/api/sessions/{sid}/documents", method="POST",
                       files={"file": (name, HOSTILE[name]())})
            assert r.status_code < 500, (name, r.status_code, r.text)
        # the interview still advances
        r = c.post(f"/api/sessions/{sid}/next-question", json_body={})
        assert r.status_code == 200, r.text
        assert r.get_json().get("question")
    finally:
        app.state.report_queue.shutdown()
        app.state.shutdown()
        tmp.cleanup()
