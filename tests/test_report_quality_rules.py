"""Rule-matrix tests for the report quality subsystem
(deepvision_tpu/web/runtime/report_quality.py) — one test per repair
rule / threshold family / soft-pass branch, mirroring the reference's
behavior (reference apply_deterministic_report_repairs_v3
web/server.py:24675, thresholds :25086-25205, gate issues :25207-25312,
soft pass :32110-32299) over degraded-draft fixtures."""

import copy

from deepvision_tpu.web.runtime import report_quality as rq


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def facts():
    return [
        {"q_id": "Q1", "dimension": "目标价值",
         "question": "核心目标是什么？",
         "answer": "把审批周期从两天压缩到两小时，减少人工对账",
         "rationale": "当前流程依赖线下审批", "evidence_class": "explicit",
         "quality_score": 0.8},
        {"q_id": "Q2", "dimension": "技术约束",
         "question": "现有系统有哪些约束？",
         "answer": "必须兼容现有ERP接口，数据不出私有化机房",
         "rationale": "", "evidence_class": "rich_option",
         "quality_score": 0.6},
        {"q_id": "Q3", "dimension": "预算排期",
         "question": "预算与排期如何？",
         "answer": "预算两百万，四个月窗口",
         "rationale": "", "evidence_class": "weak_inferred",
         "quality_score": 0.4},
    ]


def pack(**over):
    p = {
        "topic": "审批流程再造",
        "facts": facts(),
        "q_ids": ["Q1", "Q2", "Q3"],
        "blindspots": [],
    }
    p.update(over)
    return p


def draft(**over):
    d = {
        "overview": "本报告基于三轮访谈整理，核心痛点是审批流程依赖线下、"
                    "周期长且不透明，目标是两小时内完成审批。",
        "needs": [
            {"title": "审批线上化", "description": "全流程线上化且可追溯，"
             "覆盖移动端审批场景。", "priority": "P0", "refs": ["Q1"]},
        ],
        "analysis": {
            "customer_needs": "痛点集中在审批链路长、责任人不明确等方面。",
            "business_flow": "现有流程存在线下断点，需要线上化改造处理。",
            "tech_constraints": "必须兼容ERP接口且数据不出私有化机房。",
            "project_constraints": "预算两百万以内，四个月窗口期完成一期。",
        },
        "visualizations": {},
        "solutions": [
            {"title": "分阶段实施", "description": "一期覆盖核心审批流程，"
             "二期扩展到全部单据类型，降低切换风险。", "refs": ["Q2"]},
        ],
        "risks": [
            {"title": "接口适配风险", "description": "ERP接口版本差异可能"
             "拉长联调周期，需要预留缓冲。", "severity": "medium",
             "refs": ["Q2"]},
        ],
        "actions": [
            {"title": "输出一期范围", "owner": "需求方", "timeline": "两周内",
             "metric": "范围清单评审通过",
             "description": "按访谈证据确定一期流程清单。", "refs": ["Q1"]},
        ],
        "open_questions": [],
        "evidence_index": [
            {"q_id": "Q1", "summary": "目标：审批两小时内完成"},
        ],
    }
    d.update(over)
    return d


def meta(**over):
    m = rq.compute_quality_meta(draft(), pack(), "balanced")
    m.update(over)
    return m


def _notes(result):
    return " | ".join(result["notes"])


# ---------------------------------------------------------------------------
# R1: not_actionable -> owner/timeline/metric inference
# ---------------------------------------------------------------------------

def test_r1_fills_missing_action_fields():
    d = draft(actions=[{"title": "完成数据盘点",
                        "description": "两周内完成主数据盘点，覆盖率达到95%",
                        "refs": ["Q1"]}])
    issues = [{"type": "not_actionable", "target": "actions[0]"}]
    out = rq.apply_issue_repairs(d, pack(), issues)
    item = out["draft"]["actions"][0]
    assert out["changed"]
    assert item["owner"]
    assert item["timeline"] == "两周内"          # extracted from its text
    assert "95%" in item["metric"]               # quantified goal found
    assert "补齐" in _notes(out)


def test_r1_inference_is_conservative_without_signals():
    d = draft(actions=[{"title": "推进事项", "description": "尽快推进。",
                        "refs": ["Q2"]}])
    issues = [{"type": "not_actionable", "target": "actions[0]"}]
    out = rq.apply_issue_repairs(d, pack(), issues)
    item = out["draft"]["actions"][0]
    # no invented numbers: fallback metric is an explicit review ask
    assert item["metric"] == "完成评审并确认验收口径"
    assert item["timeline"] == "两周内"


def test_r1_unparsed_target_sweeps_all_actions():
    d = draft(actions=[
        {"title": "A", "description": "事项一。", "refs": ["Q1"]},
        {"title": "B", "description": "事项二。", "refs": ["Q2"]},
    ])
    issues = [{"type": "not_actionable", "target": "actions"}]
    out = rq.apply_issue_repairs(d, pack(), issues)
    assert all(a["owner"] and a["timeline"] and a["metric"]
               for a in out["draft"]["actions"])


# ---------------------------------------------------------------------------
# R2: no_evidence -> weak binding or demotion
# ---------------------------------------------------------------------------

def test_r2_weak_binds_overlapping_item():
    d = draft(risks=[{"title": "审批周期风险",
                      "description": "审批周期从两天压缩到两小时的目标"
                                     "依赖线下审批流程彻底改造",
                      "refs": []}])
    issues = [{"type": "no_evidence", "target": "risks[0]"}]
    out = rq.apply_issue_repairs(d, pack(), issues)
    item = out["draft"]["risks"][0]
    assert item["refs"] == ["Q1"]
    assert item["evidence_binding"] == "weak_inferred"
    assert item["binding_score"] >= rq.WEAK_BINDING_FLOOR


def test_r2_demotes_unbindable_item_to_open_question():
    d = draft(needs=[{"title": "区块链溯源",
                      "description": "引入联盟链做全链路溯源", "refs": []}])
    issues = [{"type": "no_evidence", "target": "needs[0]"}]
    out = rq.apply_issue_repairs(d, pack(), issues)
    assert out["draft"]["needs"] == []
    oq = out["draft"]["open_questions"]
    assert len(oq) == 1
    assert "区块链溯源" in oq[0]["question"]
    assert oq[0]["evidence_binding"] == "pending_follow_up"
    assert "降级" in _notes(out)


def test_r2_quality_profile_raises_binding_floor():
    item = {"title": "预算摸底两百万看窗口", "description": "", "refs": []}
    bind = rq.infer_weak_refs(item, facts())
    # binds under the balanced floor but not the quality floor
    assert rq.WEAK_BINDING_FLOOR <= bind["score"] < 0.48
    d = draft(risks=[copy.deepcopy(item)])
    issues = [{"type": "no_evidence", "target": "risks[0]"}]
    balanced = rq.apply_issue_repairs(d, pack(), issues, "balanced")
    assert balanced["draft"]["risks"][0]["refs"] == [bind["refs"][0]]
    quality = rq.apply_issue_repairs(draft(risks=[copy.deepcopy(item)]),
                                     pack(), issues, "quality")
    assert quality["draft"]["risks"] == []   # demoted instead


# ---------------------------------------------------------------------------
# R3/R4: evidence_index pruning
# ---------------------------------------------------------------------------

def test_r3_refless_evidence_index_entry_removed():
    d = draft(evidence_index=[{"claim": "无出处结论", "refs": []}])
    issues = [{"type": "no_evidence", "target": "evidence_index[0]"}]
    out = rq.apply_issue_repairs(d, pack(), issues)
    assert out["draft"]["evidence_index"] == []
    assert "移除无证据索引项" in _notes(out)


def test_r4_orphan_evidence_index_entry_removed_without_issue():
    d = draft(evidence_index=[
        {"q_id": "Q1", "summary": "有效"},
        {"q_id": "Q99", "summary": "访谈里不存在的问答"},
    ])
    out = rq.apply_issue_repairs(d, pack(), [])
    kept = [e["q_id"] for e in out["draft"]["evidence_index"]]
    assert kept == ["Q1"]
    assert "孤立证据索引项" in _notes(out)


# ---------------------------------------------------------------------------
# R5/R6/R7: blindspot backfill
# ---------------------------------------------------------------------------

def test_r5_blindspot_adds_open_question_once():
    p = pack(blindspots=[{"dimension": "合规", "aspect": "等保要求"}])
    out = rq.apply_issue_repairs(draft(), p, [])
    oq = out["draft"]["open_questions"]
    assert len(oq) == 1 and "等保要求" in oq[0]["question"]
    # idempotent: running again over the repaired draft adds nothing
    again = rq.apply_issue_repairs(out["draft"], p, [])
    assert len(again["draft"]["open_questions"]) == 1


def test_r6_blindspot_overview_annotation_when_targeted():
    p = pack(blindspots=[{"dimension": "合规", "aspect": "等保要求"}])
    issues = [{"type": "blindspot", "target": "overview",
               "dimension": "合规", "aspect": "等保要求"}]
    out = rq.apply_issue_repairs(draft(), p, issues)
    assert "【盲区提示】" in out["draft"]["overview"]
    assert "等保要求" in out["draft"]["overview"]


def test_r7_quality_profile_adds_pending_action():
    p = pack(blindspots=[{"dimension": "合规", "aspect": "等保要求"}])
    out = rq.apply_issue_repairs(draft(), p, [], "quality")
    titles = [a["title"] for a in out["draft"]["actions"]]
    assert any("等保要求" in t for t in titles)
    added = [a for a in out["draft"]["actions"] if "等保要求" in a["title"]]
    assert added[0]["owner"] and added[0]["timeline"]


def test_r7_balanced_requires_strong_refs_and_few_blindspots():
    # balanced + 3 blindspots -> no action backfill (only open questions)
    p = pack(blindspots=[
        {"dimension": "合规", "aspect": f"要点{i}"} for i in range(3)
    ])
    issues = [{"type": "blindspot", "target": "actions"}]
    out = rq.apply_issue_repairs(draft(), p, issues, "balanced")
    assert not any("要点" in a.get("title", "")
                   for a in out["draft"]["actions"])
    assert sum("要点" in q["question"]
               for q in out["draft"]["open_questions"]) == 3


# ---------------------------------------------------------------------------
# R8: unknown-ratio backfill
# ---------------------------------------------------------------------------

def test_r8_unknown_heavy_session_backfills_pending_questions():
    fs = facts()
    fs[1]["evidence_class"] = "pending_follow_up"
    p = pack(facts=fs)  # 2/3 unknown >= 0.45 trigger
    out = rq.apply_issue_repairs(draft(), p, [])
    oq = out["draft"]["open_questions"]
    assert {q["refs"][0] for q in oq} == {"Q2", "Q3"}
    assert all(q["evidence_binding"] == "pending_follow_up" for q in oq)


def test_r8_backfill_is_capped():
    fs = [dict(f, q_id=f"Q{i+1}", evidence_class="weak_inferred")
          for i in range(6) for f in [facts()[0]]]
    p = pack(facts=fs, q_ids=[f["q_id"] for f in fs])
    out = rq.apply_issue_repairs(draft(), p, [])
    assert len(out["draft"]["open_questions"]) == rq.UNKNOWN_BACKFILL_MAX


def test_r8_below_trigger_no_backfill():
    out = rq.apply_issue_repairs(draft(), pack(), [])  # 1/3 unknown
    assert out["draft"]["open_questions"] == []


# ---------------------------------------------------------------------------
# R9/R10: refs cleaning + dedup
# ---------------------------------------------------------------------------

def test_r9_refs_cleaned_of_invalid_and_duplicate_ids():
    d = draft(needs=[{"title": "审批线上化", "description": "全流程线上化，"
                      "覆盖移动端审批与代理机制。",
                      "refs": ["Q1", "Q1", "Q99"]}])
    out = rq.apply_issue_repairs(d, pack(), [])
    assert out["draft"]["needs"][0]["refs"] == ["Q1"]


def test_r10_sections_deduped_by_key_rules():
    dup_need = {"title": "审批线上化", "description": "全流程线上化且可追溯，"
                "覆盖移动端审批场景。", "priority": "P0", "refs": ["Q1"]}
    d = draft(needs=[dup_need, copy.deepcopy(dup_need)])
    out = rq.apply_issue_repairs(d, pack(), [])
    assert len(out["draft"]["needs"]) == 1
    assert "去重" in _notes(out)


def test_r10_actions_dedupe_on_title_and_timeline():
    a = {"title": "输出范围", "owner": "需求方", "timeline": "两周内",
         "metric": "评审通过", "description": "确定一期流程清单。",
         "refs": ["Q1"]}
    b = dict(a, timeline="本月")   # same title, different timeline -> keep
    d = draft(actions=[a, copy.deepcopy(a), b])
    out = rq.apply_issue_repairs(d, pack(), [])
    assert len(out["draft"]["actions"]) == 2


# ---------------------------------------------------------------------------
# quality metrics
# ---------------------------------------------------------------------------

def test_metrics_pending_open_questions_excluded_from_coverage():
    d = draft(open_questions=[
        {"question": "待确认", "refs": [],
         "evidence_binding": "pending_follow_up"},
    ])
    m = rq.compute_quality_meta(d, pack(), "balanced")
    assert m["evidence_coverage"] == 1.0          # pending item not counted
    assert m["pending_follow_up_count"] == 1


def test_metrics_weak_binding_by_field():
    d = draft()
    d["risks"][0]["evidence_binding"] = "weak_inferred"
    m = rq.compute_quality_meta(d, pack(), "balanced")
    assert m["weak_binding_ratio_by_field"]["risks"] == 1.0
    assert m["weak_binding_ratio_by_field"]["actions"] == 0.0
    assert 0 < m["weak_binding_ratio"] < 1


def test_metrics_actionability_rules():
    d = draft(
        actions=[
            {"title": "齐全", "owner": "A", "timeline": "两周内",
             "metric": "x", "refs": ["Q1"]},
            {"title": "缺字段", "refs": ["Q2"]},
        ],
        solutions=[
            {"title": "实", "description": "一期覆盖核心审批流程，"
             "二期扩展到全部单据类型，降低风险。", "refs": ["Q2"]},
            {"title": "虚", "description": "尽快推进", "refs": ["Q3"]},
        ],
    )
    m = rq.compute_quality_meta(d, pack(), "balanced")
    assert m["actionability"] == 0.5   # 2 of 4 qualify


def test_metrics_action_acceptance_and_milestones():
    d = draft(actions=[
        {"title": "a", "owner": "A", "timeline": "两周内", "metric": "m",
         "description": "完成一期范围确认与评审。", "refs": ["Q1"]},
        {"title": "b", "owner": "B", "timeline": "",
         "description": "输出里程碑计划并评审。", "refs": ["Q2"]},
    ])
    m = rq.compute_quality_meta(d, pack(), "balanced")
    assert m["action_acceptance"] == 0.5
    assert m["milestone_coverage"] == 0.5


def test_metrics_table_readiness_action_alternative():
    d = draft(actions=[{"title": "短身action", "owner": "需求方",
                        "timeline": "两周内", "refs": ["Q1"]}])
    m = rq.compute_quality_meta(d, pack(), "balanced")
    assert m["table_readiness"] == 1.0


def test_metrics_template_counts():
    m = rq.compute_quality_meta(draft(), pack(), "balanced")
    assert m["list_counts"]["needs"] == 1
    assert m["template_minimums"]["needs"] == 3


# ---------------------------------------------------------------------------
# thresholds
# ---------------------------------------------------------------------------

def test_profile_thresholds_balanced_relaxation():
    q = rq.profile_thresholds("quality")
    b = rq.profile_thresholds("balanced")
    assert q == rq.QUALITY_THRESHOLDS
    assert b["expression_structure"] == 0.72
    assert b["table_readiness"] == 0.68
    assert b["action_acceptance"] == 0.65
    assert b["milestone_coverage"] == 0.45
    assert b["max_weak_binding_ratio"] == 0.45
    assert b["evidence_coverage"] == q["evidence_coverage"]  # never relaxed


def test_adapt_unknown_heavy_relaxes_soft_gates_not_consistency():
    m = meta()
    m["evidence_context"] = {"facts_count": 5, "unknown_ratio": 0.8,
                             "average_quality_score": 0.25,
                             "blindspots_count": 0}
    limits = rq.adapt_thresholds_by_evidence(
        rq.profile_thresholds("balanced"), m)
    assert limits["evidence_coverage"] >= 0.82
    assert limits["evidence_coverage"] < 0.90
    assert limits["actionability"] < 0.80
    assert limits["consistency"] == 0.80        # rigid
    # balanced base (0.45) already exceeds 0.35+tension; quality's
    # stricter 0.35 base is the one the tension visibly relaxes
    q_limits = rq.adapt_thresholds_by_evidence(
        rq.profile_thresholds("quality"), m)
    assert 0.35 < q_limits["max_weak_binding_ratio"] <= 0.60


def test_adapt_rich_option_sessions_relax_evidence_bar():
    m = meta(rich_option_count=3, weak_binding_ratio=0.05)
    m["evidence_context"] = {"facts_count": 4, "unknown_ratio": 0.1,
                             "average_quality_score": 0.6,
                             "blindspots_count": 0}
    limits = rq.adapt_thresholds_by_evidence(
        rq.profile_thresholds("balanced"), m)
    assert limits["evidence_coverage"] == 0.73   # strongest tier fires


def test_adapt_blindspot_dominated_pending_capture_report():
    m = meta(weak_binding_ratio=0.0, pending_follow_up_count=3,
             claim_total=10)
    m["evidence_context"] = {"facts_count": 6, "unknown_ratio": 0.4,
                             "average_quality_score": 0.5,
                             "blindspots_count": 12}
    limits = rq.adapt_thresholds_by_evidence(
        rq.profile_thresholds("balanced"), m)
    assert limits["evidence_coverage"] == 0.52


def test_adapt_no_facts_returns_base():
    m = meta()
    m["evidence_context"] = {"facts_count": 0}
    base = rq.profile_thresholds("balanced")
    assert rq.adapt_thresholds_by_evidence(base, m) == base


def test_weak_binding_field_limits_by_profile_and_unknowns():
    m = meta()
    assert rq.weak_binding_field_limits("quality", m)["actions"] == 0.25
    assert rq.weak_binding_field_limits("balanced", m)["actions"] == 0.35
    m["evidence_context"]["unknown_ratio"] = 0.7
    shifted = rq.weak_binding_field_limits("balanced", m)
    assert abs(shifted["risks"] - 0.80) < 1e-9
    assert abs(shifted["actions"] - 0.38) < 1e-9


# ---------------------------------------------------------------------------
# gate-issue builder
# ---------------------------------------------------------------------------

def test_gate_each_scalar_check_fires():
    keys = ["evidence_coverage", "consistency", "actionability",
            "expression_structure", "table_readiness",
            "action_acceptance", "milestone_coverage"]
    for key in keys:
        m = meta(**{k: 1.0 for k in keys})
        m["weak_binding_ratio"] = 0.0
        m["weak_binding_ratio_by_field"] = {}
        m["list_counts"] = {k: 9 for k in rq.TEMPLATE_MINIMUMS}
        m[key] = 0.0
        issues = rq.build_quality_gate_issues(m)
        assert len(issues) == 1, (key, issues)
        assert key.split("_")[0] in issues[0]["type"] or \
            issues[0]["type"].startswith("quality_gate"), issues


def test_gate_per_field_weak_binding_beats_overall():
    m = meta(**{k: 1.0 for k in ("evidence_coverage", "consistency",
                                 "actionability", "expression_structure",
                                 "table_readiness", "action_acceptance",
                                 "milestone_coverage")})
    m["list_counts"] = {k: 9 for k in rq.TEMPLATE_MINIMUMS}
    m["weak_binding_ratio"] = 0.9
    m["weak_binding_ratio_by_field"] = {"actions": 0.9, "solutions": 0.0,
                                        "risks": 0.0}
    issues = rq.build_quality_gate_issues(m)
    weak = [i for i in issues if i["type"] == "quality_gate_weak_binding"]
    assert len(weak) == 1 and weak[0]["target"] == "actions"
    assert "行动项" in weak[0]["message"]


def test_gate_style_template_deficits():
    m = meta(**{k: 1.0 for k in ("evidence_coverage", "consistency",
                                 "actionability", "expression_structure",
                                 "table_readiness", "action_acceptance",
                                 "milestone_coverage")})
    m["weak_binding_ratio"] = 0.0
    m["weak_binding_ratio_by_field"] = {}
    m["list_counts"] = {"needs": 1, "solutions": 2, "risks": 2,
                        "actions": 2, "open_questions": 1}
    issues = rq.build_quality_gate_issues(m)
    assert len(issues) == 1
    assert issues[0]["type"] == "style_template_violation"
    assert "核心需求≥3（当前1）" in issues[0]["message"]
    assert issues[0]["severity"] == "medium"    # balanced


def test_gate_missing_meta():
    issues = rq.build_quality_gate_issues(None)
    assert issues[0]["type"] == "quality_gate_missing"


# ---------------------------------------------------------------------------
# soft-pass rules
# ---------------------------------------------------------------------------

def _clean_meta(**over):
    m = meta(**{k: 1.0 for k in ("evidence_coverage", "consistency",
                                 "actionability", "expression_structure",
                                 "table_readiness", "action_acceptance",
                                 "milestone_coverage", "overall")})
    m["weak_binding_ratio"] = 0.0
    m["weak_binding_ratio_by_field"] = {"actions": 0, "solutions": 0,
                                        "risks": 0}
    m["review_issue_count"] = 0
    m["pending_follow_up_count"] = 0
    m["evidence_context"] = {"facts_count": 5, "unknown_ratio": 0.0,
                             "average_quality_score": 0.7,
                             "blindspots_count": 0}
    m.update(over)
    return m


def _issue(t):
    return {"type": t, "severity": "high", "message": "", "target": ""}


def test_release_soft_pass_allows_soft_expression_gaps():
    m = _clean_meta(runtime_profile="release-conservative")
    issues = [_issue("quality_gate_expression"),
              _issue("style_template_violation")]
    soft = rq.resolve_soft_pass(issues, m, "release-conservative")
    assert soft and soft["kind"] == "release_conservative_soft_pass"


def test_release_soft_pass_blocks_evidence_issues():
    m = _clean_meta(runtime_profile="release-conservative")
    issues = [_issue("quality_gate_evidence")]
    assert rq.resolve_soft_pass(issues, m, "release-conservative") is None


def test_release_soft_pass_requires_floors():
    m = _clean_meta(runtime_profile="release-conservative",
                    table_readiness=0.3)
    issues = [_issue("quality_gate_table")]
    assert rq.resolve_soft_pass(issues, m, "release-conservative") is None


def test_balanced_multi_fact_sparse_variant():
    m = _clean_meta(runtime_profile="balanced", evidence_coverage=0.6,
                    overall=0.6)
    m["evidence_context"]["blindspots_count"] = 9
    issues = [_issue("quality_gate_evidence")]
    soft = rq.resolve_soft_pass(issues, m, "balanced")
    assert soft and soft["variant"] == "multi_fact_sparse"


def test_balanced_sparse_refused_without_gap_explanation():
    # low blindspots + no pending + no evidence issue -> refuse
    m = _clean_meta(runtime_profile="balanced")
    issues = [_issue("quality_gate_expression")]
    assert rq.resolve_soft_pass(issues, m, "balanced") is None


def test_balanced_weak_binding_variant_strict_bounds():
    m = _clean_meta(runtime_profile="balanced", evidence_coverage=0.8,
                    overall=0.6, actionability=0.5, table_readiness=0.6,
                    weak_binding_ratio=0.2)
    m["weak_binding_ratio_by_field"] = {"actions": 0.4, "solutions": 0.1,
                                        "risks": 0.2}
    m["evidence_context"].update({"facts_count": 4, "unknown_ratio": 0.05,
                                  "average_quality_score": 0.65,
                                  "blindspots_count": 9})
    issues = [_issue("quality_gate_evidence"),
              _issue("quality_gate_weak_binding")]
    soft = rq.resolve_soft_pass(issues, m, "balanced")
    assert soft and soft["variant"] == "multi_fact_light_weak_binding"
    # any bound violated -> refused
    m2 = copy.deepcopy(m)
    m2["weak_binding_ratio"] = 0.3
    assert rq.resolve_soft_pass(issues, m2, "balanced") is None
    m3 = copy.deepcopy(m)
    m3["weak_binding_ratio_by_field"]["solutions"] = 0.3
    assert rq.resolve_soft_pass(issues, m3, "balanced") is None


def test_balanced_single_fact_high_signal_variant():
    m = _clean_meta(runtime_profile="balanced", evidence_coverage=0.8,
                    overall=0.6)
    m["evidence_context"] = {"facts_count": 1, "unknown_ratio": 0.0,
                             "average_quality_score": 0.6,
                             "blindspots_count": 11}
    issues = [_issue("quality_gate_evidence")]
    soft = rq.resolve_soft_pass(issues, m, "balanced")
    assert soft and soft["variant"] == "single_fact_high_signal"
    # weak binding present -> refused for single-fact
    m["weak_binding_ratio"] = 0.1
    assert rq.resolve_soft_pass(issues, m, "balanced") is None


def test_balanced_soft_pass_hard_floors():
    m = _clean_meta(runtime_profile="balanced", consistency=0.9,
                    evidence_coverage=0.6)
    m["evidence_context"]["blindspots_count"] = 9
    issues = [_issue("quality_gate_evidence")]
    assert rq.resolve_soft_pass(issues, m, "balanced") is None  # consistency


def test_soft_pass_wrong_profile_refused():
    m = _clean_meta(runtime_profile="quality", evidence_coverage=0.6,
                    overall=0.6)
    issues = [_issue("quality_gate_evidence")]
    assert rq.resolve_soft_pass(issues, m, "quality") is None
