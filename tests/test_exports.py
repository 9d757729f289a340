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


# ---------------------------------------------------------------------------
# format-level validation with stdlib parsers: every XML part must be
# well-formed in the OOXML namespaces and all package relationships must
# resolve; the PDF xref table's byte offsets must actually point at the
# objects they claim (this is what makes Word/Acrobat accept the files)
# ---------------------------------------------------------------------------

W_NS = ("http://schemas.openxmlformats.org/wordprocessingml/2006/main")


def test_docx_parts_wellformed_and_relationships_resolve():
    import xml.etree.ElementTree as ET

    data = markdown_to_docx(MD)
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = set(zf.namelist())
    # every XML part parses
    for name in names:
        if name.endswith((".xml", ".rels")):
            ET.fromstring(zf.read(name))
    # package-level rels point at parts that exist
    root = ET.fromstring(zf.read("_rels/.rels"))
    for rel in root:
        target = rel.get("Target").lstrip("/")
        assert target in names, f"dangling package rel {target}"
    # document-level rels too (styles/numbering/fonts)
    if "word/_rels/document.xml.rels" in names:
        droot = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
        for rel in droot:
            target = "word/" + rel.get("Target")
            assert target.lstrip("/") in names or \
                rel.get("TargetMode") == "External", target
    # body content sits in the wordprocessingml namespace
    doc = ET.fromstring(zf.read("word/document.xml"))
    body = doc.find(f"{{{W_NS}}}body")
    assert body is not None
    texts = [t.text or "" for t in body.iter(f"{{{W_NS}}}t")]
    assert any("调研报告" in t for t in texts)
    # content types declare the main part
    ct = zf.read("[Content_Types].xml").decode()
    assert "wordprocessingml.document.main" in ct


def test_docx_table_and_injection_content():
    import xml.etree.ElementTree as ET

    md = ("# 标题\n\n| 列1 | 列2 |\n|---|---|\n| 甲 | 乙 |\n\n"
          "> 引用段落\n\n**加粗** 与 `代码` 与 <注入>内容\n")
    data = markdown_to_docx(md)
    zf = zipfile.ZipFile(io.BytesIO(data))
    doc = ET.fromstring(zf.read("word/document.xml"))  # must stay valid
    text = "".join(t.text or "" for t in doc.iter(f"{{{W_NS}}}t"))
    assert "甲" in text and "乙" in text
    assert "注入" in text  # markup-like user content escaped, not dropped


def test_pdf_xref_offsets_point_at_objects():
    data = markdown_to_pdf(
        "\n\n".join(f"第{i}段：" + "内容" * 40 for i in range(120)),
        title="多页导出")
    # parse the classic xref table
    start = data.rindex(b"startxref")
    xref_pos = int(data[start + 9:data.index(b"%%EOF", start)].strip())
    assert data[xref_pos:xref_pos + 4] == b"xref"
    lines = data[xref_pos:].split(b"\n")
    assert lines[1].split()[0] == b"0"
    n_objs = int(lines[1].split()[1])
    checked = 0
    for i, line in enumerate(lines[2:2 + n_objs]):
        parts = line.split()
        if len(parts) >= 3 and parts[2] == b"n":
            off = int(parts[0])
            obj_no = i  # first entry is the free object 0
            head = data[off:off + 24]
            assert head.startswith(f"{obj_no} 0 obj".encode()), (
                obj_no, off, head)
            checked += 1
    assert checked >= 5  # catalog, pages, >=2 page objs, font, streams
