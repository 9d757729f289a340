"""Report V3 pipeline: evidence pack -> draft -> validate/repair -> review
-> quality gate -> markdown render, with a layered degrade chain.

Re-implements the reference pipeline (generate_report_v3_pipeline
report_generation_runtime.py:409-1208, evidence pack web/server.py:22002,
draft validation :22980, deterministic repairs :24675, review patch merge
:23423, quality gate :25086-25312, render :26152, structured-JSON
parse+repair :21685-21943, salvage :32445, simple template :33355).
"""

from __future__ import annotations

import json
import re
import time
from typing import Dict, List, Optional, Tuple

from deepvision_tpu.web.runtime.followup import classify_evidence

REPORT_PROFILES = {
    "balanced": {
        "draft_retries": 2, "review_rounds": 1, "quality_floor": 0.55,
        "facts_limit": 40,
    },
    "quality": {
        "draft_retries": 3, "review_rounds": 2, "quality_floor": 0.7,
        "facts_limit": 60,
    },
    "release-conservative": {
        "draft_retries": 3, "review_rounds": 2, "quality_floor": 0.8,
        "facts_limit": 60,
    },
}

DRAFT_REQUIRED_KEYS = ("overview", "needs", "analysis")
DRAFT_ALL_KEYS = (
    "overview", "needs", "analysis", "visualizations", "solutions",
    "risks", "actions", "open_questions", "evidence_index",
)
ANALYSIS_KEYS = (
    "customer_needs", "business_flow", "tech_constraints",
    "project_constraints",
)


def profile_config(profile: str) -> dict:
    return REPORT_PROFILES.get(profile, REPORT_PROFILES["balanced"])


# ---------------------------------------------------------------------------
# Evidence pack (reference build_report_evidence_pack :22002)
# ---------------------------------------------------------------------------

def build_evidence_pack(session: dict, facts_limit: int = 40) -> dict:
    facts = []
    for i, entry in enumerate(session.get("interview_log", []), 1):
        q_id = f"Q{i}"
        facts.append({
            "q_id": q_id,
            "dimension": entry.get("dimension"),
            "question": entry.get("question"),
            "answer": entry.get("answer"),
            "rationale": entry.get("rationale_text") or "",
            "is_follow_up": bool(entry.get("is_follow_up")),
            "evidence_class": classify_evidence(entry),
            "quality_score": entry.get("quality_score"),
        })
    # fact slimming (reference select_slimmed_facts_for_prompt :22320):
    # keep strongest evidence first when over the limit.
    if len(facts) > facts_limit:
        rank = {"explicit": 0, "rich_option": 1, "weak_inferred": 2,
                "pending_follow_up": 3}
        facts = sorted(
            facts, key=lambda f: rank.get(f["evidence_class"], 9)
        )[:facts_limit]
        facts.sort(key=lambda f: int(f["q_id"][1:]))
    scenario = session.get("scenario_config") or {}
    return {
        "topic": session.get("topic", ""),
        "description": session.get("description", ""),
        "scenario_id": session.get("scenario_id"),
        "interview_mode": session.get("interview_mode"),
        "report_type": (scenario.get("report") or {}).get(
            "type", "standard"),
        "dimensions": session.get("dimensions", {}),
        "dimension_names": {
            d.get("id"): d.get("name")
            for d in scenario.get("dimensions", [])
        },
        "facts": facts,
        "q_ids": [f["q_id"] for f in facts],
        "documents": [
            {"name": d.get("name"), "summary": d.get("summary") or
             (d.get("content") or "")[:400]}
            for d in session.get("reference_materials", [])
        ],
    }


# ---------------------------------------------------------------------------
# Structured JSON parsing + repair (reference :21685-21943)
# ---------------------------------------------------------------------------

def parse_structured_json_response(text: str) -> Optional[dict]:
    if not text:
        return None
    candidates = [text.strip()]
    fence = re.search(r"```(?:json)?\s*(.+?)```", text, re.S)
    if fence:
        candidates.append(fence.group(1).strip())
    brace = re.search(r"\{.*\}", text, re.S)
    if brace:
        candidates.append(brace.group(0))
    for cand in list(candidates):
        candidates.append(repair_json_text(cand))
    for cand in candidates:
        try:
            data = json.loads(cand)
            if isinstance(data, dict):
                return data
        except json.JSONDecodeError:
            continue
    return None


def repair_json_text(text: str) -> str:
    """Deterministic JSON repairs: trailing commas, unbalanced braces,
    truncated tail (reference JSON repair :21724)."""
    s = re.sub(r",\s*([}\]])", r"\1", text)
    opens = s.count("{") - s.count("}")
    if opens > 0:
        # truncate dangling partial value then close
        s = re.sub(r",?\s*\"[^\"]*\"?\s*:?\s*\"?[^\"{}\[\]]*$", "", s)
        s += "}" * opens
    opens_sq = s.count("[") - s.count("]")
    if opens_sq > 0:
        s += "]" * opens_sq
    return s


# ---------------------------------------------------------------------------
# Draft validation + deterministic repairs (reference :22980, :24675)
# ---------------------------------------------------------------------------

def validate_report_draft(draft: dict, q_ids: List[str]) -> List[dict]:
    issues = []
    for key in DRAFT_REQUIRED_KEYS:
        if not draft.get(key):
            issues.append({"type": "missing_section", "severity": "error",
                           "message": f"缺少必需章节 {key}", "target": key})
    analysis = draft.get("analysis") or {}
    for key in ANALYSIS_KEYS:
        if not analysis.get(key):
            issues.append({"type": "missing_analysis", "severity": "warning",
                           "message": f"分析缺少 {key}", "target": key})
    valid_ids = set(q_ids)
    for section in ("needs", "solutions", "risks", "actions",
                    "open_questions"):
        for i, item in enumerate(draft.get(section) or []):
            refs = item.get("refs") if isinstance(item, dict) else None
            if refs:
                bad = [r for r in refs if r not in valid_ids]
                if bad:
                    issues.append({
                        "type": "invalid_ref", "severity": "warning",
                        "message": f"{section}[{i}] 引用了不存在的证据 {bad}",
                        "target": f"{section}[{i}]",
                    })
    return issues


def apply_deterministic_repairs(draft: dict, q_ids: List[str]) -> dict:
    """Fix what rules can fix: drop invalid refs, backfill empty sections."""
    valid_ids = set(q_ids)
    for section in ("needs", "solutions", "risks", "actions",
                    "open_questions"):
        items = draft.get(section)
        if not isinstance(items, list):
            draft[section] = []
            continue
        for item in items:
            if isinstance(item, dict) and item.get("refs"):
                item["refs"] = [r for r in item["refs"] if r in valid_ids]
    analysis = draft.get("analysis")
    if not isinstance(analysis, dict):
        draft["analysis"] = {k: "" for k in ANALYSIS_KEYS}
    else:
        for k in ANALYSIS_KEYS:
            analysis.setdefault(k, "")
    draft.setdefault("visualizations", {})
    draft.setdefault("evidence_index", [
        {"q_id": q, "summary": ""} for q in q_ids[:10]
    ])
    # deterministic repair: models may emit evidence_index as bare q_id
    # strings ("Q1") — normalize every entry to the dict contract
    # (reference deterministic repairs web/server.py:24675)
    norm_ev = []
    for e in draft.get("evidence_index") or []:
        if isinstance(e, dict):
            norm_ev.append(e)
        elif isinstance(e, str):
            norm_ev.append({"q_id": e, "summary": ""})
    draft["evidence_index"] = norm_ev
    return draft


# ---------------------------------------------------------------------------
# Quality gate (reference :25086-25312)
# ---------------------------------------------------------------------------

def quality_gate(draft: dict, issues: List[dict], profile: str) -> dict:
    cfg = profile_config(profile)
    errors = sum(1 for i in issues if i["severity"] == "error")
    warnings = sum(1 for i in issues if i["severity"] == "warning")
    sections_present = sum(1 for k in DRAFT_ALL_KEYS if draft.get(k))
    refs_total = 0
    refs_items = 0
    for section in ("needs", "solutions", "risks", "actions"):
        for item in draft.get(section) or []:
            if isinstance(item, dict):
                refs_items += 1
                if item.get("refs"):
                    refs_total += 1
    ref_coverage = refs_total / refs_items if refs_items else 0.0
    score = (
        0.45 * (sections_present / len(DRAFT_ALL_KEYS))
        + 0.35 * ref_coverage
        + 0.2 * max(0.0, 1.0 - errors * 0.5 - warnings * 0.08)
    )
    passed = errors == 0 and score >= cfg["quality_floor"]
    # soft-pass (reference :32110-32299): warnings-only drafts with decent
    # structure ship with a quality warning instead of failing.
    soft_pass = errors == 0 and not passed and score >= cfg[
        "quality_floor"] - 0.15
    return {
        "score": round(score, 3),
        "passed": passed,
        "soft_pass": soft_pass,
        "errors": errors,
        "warnings": warnings,
        "ref_coverage": round(ref_coverage, 3),
        "profile": profile,
    }


# ---------------------------------------------------------------------------
# Markdown render (reference render_report_from_draft_v3 :26152)
# ---------------------------------------------------------------------------

def render_report_markdown(draft: dict, pack: dict, quality: dict) -> str:
    out = [f"# {pack.get('topic') or '需求调研报告'}", ""]
    out.append(f"> 生成时间：{time.strftime('%Y-%m-%d %H:%M')}  "
               f"模式：{pack.get('interview_mode') or 'standard'}  "
               f"质量分：{quality.get('score')}")
    out += ["", "## 一、总体概述", "", draft.get("overview", "")]

    needs = draft.get("needs") or []
    if needs:
        out += ["", "## 二、需求清单", ""]
        for i, n in enumerate(needs, 1):
            refs = "、".join(n.get("refs") or [])
            pr = n.get("priority", "")
            out.append(
                f"{i}. **{n.get('title', '')}**"
                + (f"（{pr}）" if pr else "")
                + f" — {n.get('description', '')}"
                + (f" _(证据: {refs})_" if refs else "")
            )

    analysis = draft.get("analysis") or {}
    out += ["", "## 三、详细分析", ""]
    for key, label in (
        ("customer_needs", "客户需求"),
        ("business_flow", "业务流程"),
        ("tech_constraints", "技术约束"),
        ("project_constraints", "项目约束"),
    ):
        if analysis.get(key):
            out += [f"### {label}", "", analysis[key], ""]

    vis = draft.get("visualizations") or {}
    mermaid_blocks = [
        (vis.get("priority_quadrant_mermaid"), "需求优先级矩阵"),
        (vis.get("business_flow_mermaid"), "业务流程图"),
        (vis.get("demand_pie_mermaid"), "诉求分布"),
        (vis.get("architecture_mermaid"), "架构示意"),
    ]
    if any(b for b, _ in mermaid_blocks):
        out += ["## 四、可视化", ""]
        for block, label in mermaid_blocks:
            if block:
                out += [f"### {label}", "", "```mermaid", block, "```", ""]

    solutions = draft.get("solutions") or []
    if solutions:
        out += ["## 五、方案建议", ""]
        for s in solutions:
            out.append(f"- **{s.get('title', '')}**：{s.get('description', '')}")

    risks = draft.get("risks") or []
    if risks:
        out += ["", "## 六、风险提示", ""]
        for r in risks:
            sev = r.get("severity", "")
            out.append(
                f"- **{r.get('title', '')}**"
                + (f"（{sev}）" if sev else "")
                + f"：{r.get('description', '')}"
            )

    actions = draft.get("actions") or []
    if actions:
        out += ["", "## 七、下一步行动", ""]
        for a in actions:
            owner = a.get("owner", "")
            out.append(
                f"- [ ] {a.get('title', '')}"
                + (f"（负责人：{owner}）" if owner else "")
            )

    open_qs = draft.get("open_questions") or []
    if open_qs:
        out += ["", "## 八、待澄清问题", ""]
        for q in open_qs:
            text = q.get("question") if isinstance(q, dict) else str(q)
            out.append(f"- {text}")

    # Assessment-type scenarios (interview-assessment) append a per-
    # dimension scorecard from the answer quality signals (reference
    # interview-assessment report prompt web/server.py:21044).
    if pack.get("report_type") == "assessment":
        out += ["", "## 评估打分", ""]
        out.append("| 维度 | 答题数 | 平均得分 | 评级 |")
        out.append("|---|---|---|---|")
        by_dim: Dict[str, List[float]] = {}
        for f in pack.get("facts", []):
            if f.get("quality_score") is not None:
                by_dim.setdefault(f.get("dimension") or "其他", []).append(
                    float(f["quality_score"])
                )
        names = pack.get("dimension_names", {})
        total_scores = []
        for dim, scores in by_dim.items():
            avg = sum(scores) / len(scores)
            total_scores.extend(scores)
            grade = ("优秀" if avg >= 0.7 else
                     "良好" if avg >= 0.5 else
                     "待提升" if avg >= 0.3 else "不足")
            out.append(
                f"| {names.get(dim, dim)} | {len(scores)} "
                f"| {avg:.2f} | {grade} |"
            )
        if total_scores:
            overall = sum(total_scores) / len(total_scores)
            rec = ("推荐" if overall >= 0.6 else
                   "待定" if overall >= 0.4 else "不推荐")
            out += ["", f"**综合得分：{overall:.2f} — 结论：{rec}**"]

    ev = draft.get("evidence_index") or []
    if ev:
        out += ["", "## 附录：证据索引", ""]
        for e in ev:
            if isinstance(e, dict):
                out.append(f"- {e.get('q_id', '')}: {e.get('summary', '')}")
            else:
                out.append(f"- {e}")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Simple template last resort (reference :33355)
# ---------------------------------------------------------------------------

def render_simple_template(pack: dict) -> str:
    out = [f"# {pack.get('topic') or '需求调研报告'}（简版）", ""]
    out.append("> 自动降级生成：AI 报告管线不可用，以下为问答实录整理。")
    by_dim: Dict[str, List[dict]] = {}
    for f in pack.get("facts", []):
        by_dim.setdefault(f.get("dimension") or "其他", []).append(f)
    for dim, facts in by_dim.items():
        out += ["", f"## {dim}", ""]
        for f in facts:
            out.append(f"- **{f['question']}**")
            out.append(f"  - 回答：{f.get('answer') or '（未回答）'}")
            if f.get("rationale"):
                out.append(f"  - 补充：{f['rationale']}")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Pipeline driver
# ---------------------------------------------------------------------------

class ReportPipelineResult:
    def __init__(self):
        self.markdown: str = ""
        self.draft: Optional[dict] = None
        self.quality: dict = {}
        self.path: str = "v3"          # v3 | salvage | simple_template
        self.timings: Dict[str, float] = {}
        self.review_rounds_run = 0
        self.draft_attempts = 0
        self.issues: List[dict] = []


def generate_report_v3(
    gateway, session: dict, *, profile: str = "balanced",
    status_cb=None, metrics=None,
) -> ReportPipelineResult:
    cfg = profile_config(profile)
    res = ReportPipelineResult()
    t0 = time.monotonic()

    def mark(stage):
        res.timings[stage] = round((time.monotonic() - t0) * 1e3, 1)
        if status_cb:
            status_cb(stage)

    pack = build_evidence_pack(session, cfg["facts_limit"])
    mark("evidence_pack")

    # --- draft loop with degrading facts/tokens (reference :558-563) ----
    draft = None
    facts_limit = cfg["facts_limit"]
    for attempt in range(cfg["draft_retries"] + 1):
        res.draft_attempts += 1
        slim_pack = dict(pack)
        slim_pack["facts"] = pack["facts"][:facts_limit]
        prompt = _draft_prompt(slim_pack)
        try:
            text = gateway.call_model(
                prompt, call_type="report_draft",
                context={"topic": pack["topic"], "q_ids": pack["q_ids"]},
            )
            draft = parse_structured_json_response(text)
            if draft and all(draft.get(k) for k in DRAFT_REQUIRED_KEYS):
                break
            draft = None
        except Exception:
            draft = None
        facts_limit = max(10, int(facts_limit * 0.6))
    mark("draft")

    if draft is None:
        # salvage -> simple template (reference :32445, :33355)
        res.path = "simple_template"
        res.markdown = render_simple_template(pack)
        res.quality = {"score": 0.2, "passed": False, "soft_pass": True,
                       "profile": profile, "degraded": True}
        mark("render")
        return res

    draft = apply_deterministic_repairs(draft, pack["q_ids"])
    issues = validate_report_draft(draft, pack["q_ids"])
    mark("validate")

    # --- review rounds (reference review prompt :23243, merge :23423) ---
    for round_no in range(cfg["review_rounds"]):
        try:
            review_text = gateway.call_model(
                _review_prompt(draft, issues), call_type="report_review",
                context={"topic": pack["topic"]},
            )
            review = parse_structured_json_response(review_text) or {}
        except Exception:
            break
        res.review_rounds_run += 1
        patch = review.get("patch") or {}
        if isinstance(patch, dict) and patch:
            draft = _merge_patch(draft, patch)
            draft = apply_deterministic_repairs(draft, pack["q_ids"])
            issues = validate_report_draft(draft, pack["q_ids"])
        if review.get("pass", True):
            break
    mark("review")

    res.issues = issues
    res.quality = quality_gate(draft, issues, profile)
    mark("quality_gate")

    if not (res.quality["passed"] or res.quality["soft_pass"]):
        res.path = "salvage"
        draft = apply_deterministic_repairs(draft, pack["q_ids"])
        res.quality["salvaged"] = True

    res.draft = draft
    res.markdown = render_report_markdown(draft, pack, res.quality)
    mark("render")
    if metrics:
        metrics.record_stages("report_v3", res.timings)
    return res


def _draft_prompt(pack: dict) -> str:
    facts_lines = "\n".join(
        f"[{f['q_id']}]({f['evidence_class']}) 问：{f['question']} "
        f"答：{f.get('answer') or ''} {f.get('rationale') or ''}"
        for f in pack["facts"]
    )
    docs = "\n".join(
        f"- {d['name']}: {d['summary']}" for d in pack.get("documents", [])
    )
    return (
        f"你是资深需求分析师。基于以下访谈证据撰写结构化报告草稿，输出 JSON，"
        f"字段：overview/needs/analysis{{customer_needs,business_flow,"
        f"tech_constraints,project_constraints}}/visualizations{{"
        f"priority_quadrant_mermaid,business_flow_mermaid,demand_pie_mermaid,"
        f"architecture_mermaid}}/solutions/risks/actions/open_questions/"
        f"evidence_index。列表项需携带 refs 引用证据编号。\n\n"
        f"主题：{pack['topic']}\n说明：{pack.get('description', '')}\n\n"
        f"访谈证据：\n{facts_lines}\n\n参考文档：\n{docs}"
    )


def _review_prompt(draft: dict, issues: List[dict]) -> str:
    return (
        "请审查以下报告草稿 JSON，输出 JSON："
        '{"pass": bool, "quality_score": 0-1, "issues": '
        '[{"type","severity","message","target"}], "patch": {可直接合并的'
        "修正字段}}。\n\n已知问题：" + json.dumps(issues, ensure_ascii=False)
        + "\n\n草稿：" + json.dumps(draft, ensure_ascii=False)[:8000]
    )


def _merge_patch(draft: dict, patch: dict) -> dict:
    """Shallow-merge review patches (reference patch merge :23423)."""
    for key, value in patch.items():
        if key in ("needs", "solutions", "risks", "actions",
                   "open_questions") and isinstance(value, list):
            draft[key] = value
        elif key == "analysis" and isinstance(value, dict):
            draft.setdefault("analysis", {}).update(value)
        elif key == "visualizations" and isinstance(value, dict):
            draft.setdefault("visualizations", {}).update(value)
        elif isinstance(value, str):
            draft[key] = value
    return draft
