#!/usr/bin/env python
"""Document conversion CLI (reference scripts/convert_doc.py): convert
pdf/docx/xlsx/pptx/md/txt to Markdown on stdout, or chunk to JSON."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepvision_tpu.web.runtime.documents import (  # noqa: E402
    ConversionError,
    chunk_markdown,
    convert_to_markdown,
)


def main():
    p = argparse.ArgumentParser(description="document converter")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("convert")
    sp.add_argument("path")
    sp = sub.add_parser("chunk")
    sp.add_argument("path")
    sp.add_argument("--chunk-chars", type=int, default=800)
    args = p.parse_args()

    with open(args.path, "rb") as fh:
        data = fh.read()
    try:
        markdown = convert_to_markdown(os.path.basename(args.path), data)
    except ConversionError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if args.cmd == "convert":
        print(markdown)
    else:
        chunks = chunk_markdown(markdown, chunk_chars=args.chunk_chars)
        print(json.dumps({"chunks": chunks, "count": len(chunks)},
                         ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
