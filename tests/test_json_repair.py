"""Structured-JSON parse + deterministic repair (reference parser+repair
web/server.py:21685-21943): adversarial model-output shapes.

Grammar-constrained lanes parse by construction, but non-constrained
lanes (big-vocab models, remote replicas) and review patches still lean
on this path — SURVEY §7 hard parts requires the repair chain to stay
for fidelity. Zero direct coverage before round 4.
"""

import pytest

from deepvision_tpu.web.runtime.report_v3 import (
    parse_structured_json_response,
    repair_json_text,
)

GOOD = '{"overview": "概述内容", "needs": [{"title": "诉求"}]}'


# --- shapes that MUST parse -------------------------------------------------

@pytest.mark.parametrize("text", [
    GOOD,
    f"  \n{GOOD}\n  ",
    f"好的，以下是报告草稿：\n```json\n{GOOD}\n```\n请审阅。",
    f"```\n{GOOD}\n```",
    f"前置说明文字 {GOOD} 后置说明",
    '{"overview": "x", "needs": [1, 2,], }',            # trailing commas
    '{"overview": "x", "needs": ["a", "b"',              # truncated array
    '{"overview": "x", "analysis": {"customer_needs": "y"',  # nested trunc
    '{"overview": "x", "needs": [], "risks": [{"title": "r1"},'
    ' {"title": "r2", "desc": "被截断的值',               # dangling value
])
def test_parses_model_output_shapes(text):
    out = parse_structured_json_response(text)
    assert isinstance(out, dict), text
    assert "overview" in out


@pytest.mark.parametrize("text,key", [
    ('{"a": 1,}', "a"),
    ('{"a": {"b": [1, 2', "a"),
    ('{"a": "值", "b": "断', "a"),
])
def test_repair_closes_and_drops_dangling(text, key):
    import json

    repaired = repair_json_text(text)
    data = json.loads(repaired)
    assert key in data


# --- shapes that must NOT become dicts --------------------------------------

@pytest.mark.parametrize("text", [
    "",
    "完全没有 JSON 的一段话。",
    "[1, 2, 3]",                        # top-level list is not a draft
    "null",
])
def test_garbage_returns_none(text):
    assert parse_structured_json_response(text) is None


def test_balanced_json_untouched_by_repair():
    assert repair_json_text(GOOD) == GOOD


def test_fence_beats_surrounding_prose_braces():
    # prose contains braces; the fenced block is the real payload
    text = ('说明 {不是JSON} 以下：\n```json\n'
            '{"overview": "真正内容"}\n```')
    out = parse_structured_json_response(text)
    assert out == {"overview": "真正内容"}


def test_repair_survives_cjk_and_escapes():
    text = ('{"overview": "包含\\"转义\\"与中文：约40%", '
            '"needs": [{"title": "诉求（含括号）"},')
    out = parse_structured_json_response(text)
    assert out is not None
    assert "40%" in out["overview"]


# --- truncation mid bare-token (round-5 advisor finding): the r4 string-
# aware rewrite handled dangling STRINGS but left a cut literal (`fal`,
# `tr`, `12.`) in place, so the closed text failed json.loads -----------------

@pytest.mark.parametrize("text,expect", [
    ('{"a": true, "b": fal', {"a": True}),
    ('{"b": tr', {}),
    ('{"score": 12.', {}),
    ('{"a": 1, "b": nul', {"a": 1}),
    ('{"a": {"b": fals', {"a": {}}),
    ('{"xs": [1, 2, fal', {"xs": [1, 2]}),
    ('{"xs": [tru', {"xs": []}),
    ('{"score": 1e', {}),
])
def test_repair_strips_partial_bare_token(text, expect):
    import json

    assert json.loads(repair_json_text(text)) == expect


@pytest.mark.parametrize("text,expect", [
    # COMPLETE trailing literals are legal values and must survive
    ('{"a": true', {"a": True}),
    ('{"a": false', {"a": False}),
    ('{"a": null', {"a": None}),
    ('{"a": 12.5', {"a": 12.5}),
    ('{"a": -3e2', {"a": -300.0}),
    ('{"xs": [1, 2', {"xs": [1, 2]}),
])
def test_repair_keeps_complete_bare_token(text, expect):
    import json

    assert json.loads(repair_json_text(text)) == expect
