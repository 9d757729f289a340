"""Solution-page derivation: report snapshot -> structured solution payload.

Re-implements the reference's solution derivation (SURVEY.md §2.3 "Solution
page derivation", build_solution_payload_from_report web/server.py:43275,
payload shape :43078-43114 / Appendix A.5): sidecar snapshots, quality
signals, hero/sections/cards, decision brief, narrative outline, and the
degraded variant when quality signals flag problems.
"""

from __future__ import annotations

import hashlib
import json
import re
import time
from typing import Dict, List, Optional

SCHEMA_VERSION = "tpu-1.0"


def _fingerprint(content: str) -> str:
    return hashlib.md5(content.encode("utf-8")).hexdigest()[:16]


def _extract_sections(markdown: str) -> List[dict]:
    sections = []
    current = None
    for line in markdown.splitlines():
        m = re.match(r"^(#{1,3})\s+(.*)", line)
        if m:
            if current:
                sections.append(current)
            current = {
                "id": f"sec-{len(sections) + 1}",
                "level": len(m.group(1)),
                "title": m.group(2).strip(),
                "body_lines": [],
            }
        elif current is not None:
            current["body_lines"].append(line)
    if current:
        sections.append(current)
    out = []
    for s in sections:
        body = "\n".join(s.pop("body_lines")).strip()
        s["body"] = body
        s["render_mode"] = "mermaid" if "```mermaid" in body else "markdown"
        out.append(s)
    return out


def _quality_signals(markdown: str, quality_meta: Optional[dict]) -> dict:
    signals = {
        "length_ok": len(markdown) > 400,
        "has_structure": markdown.count("#") >= 3,
        "has_evidence": "证据" in markdown or "Q1" in markdown,
        "quality_score": (quality_meta or {}).get("score", 0.0),
        "degraded_source": bool((quality_meta or {}).get("degraded")),
    }
    signals["healthy"] = (
        signals["length_ok"] and signals["has_structure"]
        and not signals["degraded_source"]
    )
    return signals


def build_solution_payload(
    report_name: str,
    markdown: str,
    *,
    session: Optional[dict] = None,
    quality_meta: Optional[dict] = None,
) -> dict:
    sections = _extract_sections(markdown)
    title = sections[0]["title"] if sections else (
        session or {}).get("topic", "解决方案")
    signals = _quality_signals(markdown, quality_meta)

    overview = ""
    for s in sections:
        if "概述" in s["title"] or "overview" in s["title"].lower():
            overview = s["body"][:600]
            break
    if not overview and sections:
        overview = sections[0]["body"][:600]

    needs, risks, actions = [], [], []
    for s in sections:
        if "需求" in s["title"]:
            needs = _bullet_items(s["body"])
        elif "风险" in s["title"]:
            risks = _bullet_items(s["body"])
        elif "行动" in s["title"] or "下一步" in s["title"]:
            actions = _bullet_items(s["body"])

    highlights = [n[:60] for n in needs[:3]] or [title]
    metrics = [
        {"label": "访谈轮次", "value": len((session or {}).get(
            "interview_log", []))},
        {"label": "需求条目", "value": len(needs)},
        {"label": "风险条目", "value": len(risks)},
        {"label": "质量分", "value": signals["quality_score"]},
    ]

    headline_cards = [
        {"title": "核心结论", "body": overview[:200], "tone": "primary"},
    ]
    if risks:
        headline_cards.append(
            {"title": "首要风险", "body": risks[0][:160], "tone": "warning"}
        )
    if actions:
        headline_cards.append(
            {"title": "关键行动", "body": actions[0][:160], "tone": "success"}
        )

    nav_items = [
        {"id": s["id"], "title": s["title"]}
        for s in sections if s["level"] <= 2
    ]

    render_sections = [
        {
            "id": s["id"],
            "title": s["title"],
            "level": s["level"],
            "render_mode": s["render_mode"],
            "content": s["body"],
        }
        for s in sections
    ]

    decision_summary = {
        "conclusion": overview[:200],
        "top_needs": needs[:5],
        "top_risks": risks[:3],
        "next_actions": actions[:5],
    }

    payload = {
        "report_name": report_name,
        "title": title,
        "subtitle": (session or {}).get("description", "")[:120],
        "overview": overview,
        "source_mode": "report_snapshot",
        "report_template": "default",
        "report_type": "standard",
        "fingerprint": _fingerprint(markdown),
        "quality_signals": signals,
        "solution_schema_meta": {
            "version": SCHEMA_VERSION,
            "section_count": len(render_sections),
            "render_mode": "sections",
            "snapshot_origin": "derived",
        },
        "hero": {
            "eyebrow": "解决方案",
            "title": title,
            "subtitle": (session or {}).get("topic", ""),
            "summary": overview[:300],
            "highlights": highlights,
            "actions": [{"label": "查看完整报告", "href":
                         f"/api/reports/{report_name}"}],
            "metrics": metrics,
        },
        "headline_cards": headline_cards,
        "metrics": metrics,
        "decision_summary": decision_summary,
        "proposal_brief": {"overview": overview, "needs": needs[:8]},
        "chapter_copy": {},
        "proposal_page": {},
        "proposal_support": {},
        "decision_brief": decision_summary,
        "narrative_outline": [s["title"] for s in sections],
        "page_copy": {},
        "proposal_content_model": {},
        "content_priority_plan": {},
        "closing_block": {
            "title": "下一步",
            "items": actions[:5] or ["确认报告内容", "安排方案评审"],
        },
        "summary_card": {"title": title, "summary": overview[:200]},
        "render_model": {"sections": render_sections},
        "render_model_legacy": None,
        "audience_profile": {
            "primary": "业务决策者",
            "secondary": "实施团队",
        },
        "comparison_matrix": None,
        "value_board": None,
        "quality_review": quality_meta or {},
        "nav_items": nav_items,
        "sections": render_sections,
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if not signals["healthy"]:
        # degraded variant (reference :43018)
        payload["source_mode"] = "degraded"
        payload["hero"]["eyebrow"] = "解决方案（简版）"
        payload["headline_cards"] = headline_cards[:1]
    return payload


def _bullet_items(body: str) -> List[str]:
    items = []
    for line in body.splitlines():
        m = re.match(r"^\s*(?:[-*]|\d+\.)\s*(?:\[ \]\s*)?(.+)", line)
        if m:
            text = re.sub(r"\*\*([^*]+)\*\*", r"\1", m.group(1)).strip()
            if text:
                items.append(text)
    return items


_COPY_SCHEMA_KEYS = {
    "chapter_copy": ("value_statement", "approach", "commitment"),
    "quality_review": ("score", "verdict"),
}


def merge_ai_copy(payload: dict, ai_response: str) -> dict:
    """Schema-validated merge of AI chapter copy + quality review into the
    solution payload (reference schema-validated merge web/server.py:41210):
    malformed or partial AI output never corrupts the payload."""
    import json as _json
    import re as _re

    try:
        m = _re.search(r"\{.*\}", ai_response, _re.S)
        data = _json.loads(m.group(0) if m else ai_response)
    except (ValueError, AttributeError):
        return payload
    if not isinstance(data, dict):
        return payload
    copy = data.get("chapter_copy")
    if isinstance(copy, dict) and all(
        isinstance(copy.get(k), str) and copy.get(k)
        for k in _COPY_SCHEMA_KEYS["chapter_copy"]
    ):
        payload["chapter_copy"] = {
            k: copy[k][:500] for k in _COPY_SCHEMA_KEYS["chapter_copy"]
        }
    review = data.get("quality_review")
    if isinstance(review, dict) and all(
        k in review for k in _COPY_SCHEMA_KEYS["quality_review"]
    ):
        try:
            score = float(review["score"])
        except (TypeError, ValueError):
            return payload
        payload["quality_review"] = {
            "score": max(0.0, min(1.0, score)),
            "verdict": str(review["verdict"])[:40],
            "strengths": [str(s)[:120] for s in
                          (review.get("strengths") or [])[:5]],
            "concerns": [str(s)[:120] for s in
                         (review.get("concerns") or [])[:5]],
        }
    return payload


class SolutionService:
    """Sidecar snapshots + payload cache (reference :35405-36253,
    :35523-35605); optional AI chapter copy + quality review when a
    gateway is provided (reference :41442/:41488)."""

    def __init__(self, meta, reports, sessions, gateway=None):
        self.meta = meta
        self.reports = reports
        self.sessions = sessions
        self.gateway = gateway

    def get_payload(self, report_name: str) -> Optional[dict]:
        content = self.reports.load(report_name)
        if content is None:
            return None
        fp = _fingerprint(content)
        cached_raw = self.meta.kv_get(
            "solution_payload_cache", "report_name", report_name, "payload"
        )
        if cached_raw:
            try:
                cached = json.loads(cached_raw)
                if cached.get("fingerprint") == fp:
                    return cached
            except json.JSONDecodeError:
                pass
        session = None
        row = self.meta.query_one(
            "SELECT session_id FROM report_index WHERE report_name = ?",
            (report_name,),
        )
        if row and row["session_id"]:
            session = self.sessions.load(row["session_id"])
        quality_meta = (session or {}).get("last_report_quality_meta")
        payload = build_solution_payload(
            report_name, content, session=session, quality_meta=quality_meta
        )
        if self.gateway is not None and getattr(
            self.gateway, "mode", "off"
        ) != "off":
            try:
                ai_text = self.gateway.call_model(
                    "请为以下方案页撰写章节文案并做质量评审，输出 JSON："
                    '{"chapter_copy": {"value_statement", "approach", '
                    '"commitment"}, "quality_review": {"score": 0-1, '
                    '"verdict", "strengths": [], "concerns": []}}。\n\n'
                    f"方案概述：{payload.get('overview', '')[:1500]}",
                    call_type="solution_copy",
                    context={"title": payload.get("title", "")},
                )
                payload = merge_ai_copy(payload, ai_text)
            except Exception:
                pass  # AI copy is an enhancement; the payload stands alone
        self.meta.execute(
            "INSERT INTO solution_payload_cache (report_name, payload, "
            "fingerprint, updated_at) VALUES (?, ?, ?, ?) "
            "ON CONFLICT(report_name) DO UPDATE SET "
            "payload = excluded.payload, fingerprint = excluded.fingerprint, "
            "updated_at = excluded.updated_at",
            (report_name, json.dumps(payload, ensure_ascii=False), fp,
             time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())),
        )
        return payload

    def prewarm(self, report_name: str) -> None:
        try:
            self.get_payload(report_name)
        except Exception:
            pass
