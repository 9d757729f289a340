#!/usr/bin/env python
"""Document conversion CLI (reference scripts/convert_doc.py, 494 LoC):
convert pdf/docx/xlsx/pptx/md/txt to Markdown, inspect container
metadata, chunk to JSON, or batch-convert a directory with a sha256
cache and pages/sec accounting (the doc-ingest benchmark path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.runtime.documents import (  # noqa: E402
    ConversionError,
    chunk_markdown,
    convert_to_markdown,
    sha256_of,
)

SUPPORTED = (".pdf", ".docx", ".xlsx", ".pptx", ".md", ".txt")


def _read(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


def cmd_convert(args):
    try:
        print(convert_to_markdown(os.path.basename(args.path),
                                  _read(args.path)))
    except ConversionError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    return 0


def cmd_chunk(args):
    try:
        markdown = convert_to_markdown(os.path.basename(args.path),
                                       _read(args.path))
    except ConversionError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    chunks = chunk_markdown(markdown, chunk_chars=args.chunk_chars)
    print(json.dumps({"chunks": chunks, "count": len(chunks)},
                     ensure_ascii=False))
    return 0


def cmd_inspect(args):
    """Container metadata without full conversion: type, unit counts
    (pages/sheets/slides), size, sha256 — the triage tool for uploads
    the converter rejects."""
    data = _read(args.path)
    ext = os.path.splitext(args.path)[1].lower()
    info = {
        "file": os.path.basename(args.path),
        "type": ext.lstrip("."),
        "bytes": len(data),
        "sha256": sha256_of(data),
        "supported": ext in SUPPORTED,
    }
    try:
        if ext in (".docx", ".xlsx", ".pptx"):
            import io

            zf = zipfile.ZipFile(io.BytesIO(data))
            names = zf.namelist()
            if ext == ".docx":
                info["has_document_xml"] = "word/document.xml" in names
            elif ext == ".xlsx":
                info["sheets"] = sum(
                    1 for n in names
                    if n.startswith("xl/worksheets/") and n.endswith(".xml"))
            else:
                info["slides"] = sum(
                    1 for n in names
                    if n.startswith("ppt/slides/slide")
                    and n.endswith(".xml"))
            info["zip_entries"] = len(names)
        elif ext == ".pdf":
            info["pages"] = data.count(b"/Type /Page") or data.count(
                b"/Type/Page")
        else:
            text = data.decode("utf-8", errors="replace")
            info["chars"] = len(text)
            info["lines"] = text.count("\n") + 1
    except Exception as e:  # noqa: BLE001 — inspect must not die
        info["inspect_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(info, ensure_ascii=False, indent=1))
    return 0


def cmd_batch(args):
    """Convert every supported file under a directory, with a sha256
    converted-cache (reference converted-cache web/server.py:6973-7037)
    and throughput accounting."""
    cache_dir = args.cache_dir
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    os.makedirs(args.out_dir, exist_ok=True)
    n_files = n_cached = n_failed = 0
    total_chars = 0
    t0 = time.time()
    for root, _, files in os.walk(args.src_dir):
        for fn in sorted(files):
            if os.path.splitext(fn)[1].lower() not in SUPPORTED:
                continue
            src = os.path.join(root, fn)
            data = _read(src)
            digest = sha256_of(data)
            cached_path = (os.path.join(cache_dir, digest + ".md")
                           if cache_dir else None)
            out_path = os.path.join(
                args.out_dir, os.path.splitext(fn)[0] + ".md")
            if cached_path and os.path.exists(cached_path):
                with open(cached_path, encoding="utf-8") as fh:
                    markdown = fh.read()
                n_cached += 1
            else:
                try:
                    markdown = convert_to_markdown(fn, data)
                except ConversionError as e:
                    n_failed += 1
                    print(f"{fn}: {e}", file=sys.stderr)
                    continue
                if cached_path:
                    with open(cached_path, "w", encoding="utf-8") as fh:
                        fh.write(markdown)
            with open(out_path, "w", encoding="utf-8") as fh:
                fh.write(markdown)
            n_files += 1
            total_chars += len(markdown)
    dt = time.time() - t0
    pages = total_chars / 1800.0  # reference MAX_DOC_LENGTH char-page unit
    print(json.dumps({
        "files": n_files,
        "cache_hits": n_cached,
        "failed": n_failed,
        "chars": total_chars,
        "seconds": round(dt, 2),
        "pages_per_s": round(pages / dt, 1) if dt > 0 else None,
    }, ensure_ascii=False))
    return 0 if n_files and not n_failed else 1


def main():
    p = argparse.ArgumentParser(description="document converter")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("convert")
    sp.add_argument("path")
    sp.set_defaults(fn=cmd_convert)
    sp = sub.add_parser("chunk")
    sp.add_argument("path")
    sp.add_argument("--chunk-chars", type=int, default=800)
    sp.set_defaults(fn=cmd_chunk)
    sp = sub.add_parser("inspect")
    sp.add_argument("path")
    sp.set_defaults(fn=cmd_inspect)
    sp = sub.add_parser("batch")
    sp.add_argument("src_dir")
    sp.add_argument("out_dir")
    sp.add_argument("--cache-dir", default="")
    sp.set_defaults(fn=cmd_batch)
    args = p.parse_args()
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
