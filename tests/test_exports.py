"""Export writers: from-scratch docx + PDF generators."""

import zipfile
import io

from deepvision_tpu.web.runtime.documents import convert_to_markdown
from deepvision_tpu.web.runtime.exports import (
    markdown_to_docx,
    markdown_to_paragraphs,
    markdown_to_pdf,
)

MD = """# 调研报告

## 一、概述

这是总体概述段落，包含中文内容。

- 需求一：提升效率
- 需求二：降低成本

```mermaid
flowchart LR
  A --> B
```
"""


def test_paragraph_model():
    paras = markdown_to_paragraphs(MD)
    styles = [s for s, _ in paras]
    assert "h1" in styles and "h2" in styles and "bullet" in styles
    assert all(s != "code" or True for s in styles)


def test_docx_is_valid_zip_and_roundtrips():
    data = markdown_to_docx(MD)
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()
    assert "[Content_Types].xml" in names
    assert "word/document.xml" in names
    xml = zf.read("word/document.xml").decode("utf-8")
    assert "调研报告" in xml and "提升效率" in xml
    # our own converter can read our own docx back
    md = convert_to_markdown("r.docx", data)
    assert "概述" in md


def test_pdf_structure():
    data = markdown_to_pdf(MD, title="调研报告")
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert b"/UniGB-UCS2-H" in data  # CJK CID encoding present
    assert b"xref" in data and b"trailer" in data
    # UTF-16BE hex of 调研报告 should appear in a content stream
    hexstr = "调研报告".encode("utf-16-be").hex().upper().encode()
    assert hexstr in data


def test_pdf_multipage():
    long_md = "\n\n".join(f"第{i}段：" + "内容" * 40 for i in range(200))
    data = markdown_to_pdf(long_md)
    assert data.count(b"/Type /Page ") >= 2
