#!/usr/bin/env python
"""Synthesize the dv-mini training corpus.

The reference outsources all model quality to remote gateways; our engine
serves in-house weights, so the framework owns the full loop: corpus ->
tokenizer -> train -> serve.  This script deterministically generates an
interview-domain corpus whose *formats match the serving prompts exactly*
(deepvision_tpu/web/runtime/interview.py build_interview_prompt, report_v3
draft prompts), so a model trained on it produces parseable JSON for the
app's call types: question, report_draft, report_review, summary,
search_decision, assessment.

Usage: python scripts/build_corpus.py --out data/corpus/dv_corpus.txt \
           [--mb 40] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENARIO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "scenarios", "builtin",
)

# --------------------------------------------------------------------------
# Phrase banks (original content; domain = requirements interviews)
# --------------------------------------------------------------------------

TOPICS = [
    "电商平台会员体系升级", "制造业设备巡检数字化", "银行信贷审批流程再造",
    "连锁零售门店补货系统", "医院预约挂号平台改版", "物流园区智能调度中心",
    "企业内部知识库建设", "政务服务一网通办入口", "在线教育直播课堂优化",
    "新能源充电桩运营平台", "餐饮供应链协同系统", "保险理赔自动化审核",
    "智慧社区物业服务小程序", "跨境电商清关申报系统", "汽车经销商CRM升级",
    "券商投顾智能推荐引擎", "地产项目成本管控平台", "农产品溯源区块链应用",
    "航空公司常旅客计划改造", "运营商家庭宽带装维派单",
    "SaaS客服工单系统重构", "园区能耗监测与优化", "母婴品牌私域运营工具",
    "二手车检测定价平台", "酒店收益管理系统选型", "城市停车位共享平台",
    "印刷厂生产排程优化", "律所案件管理协同平台", "基金公司直销APP改版",
    "宠物医院连锁信息化",
]

ROLES = [
    "产品负责人", "技术总监", "运营经理", "业务部门主管", "创始人",
    "项目经理", "数据分析师", "客服主管", "供应链总监", "财务负责人",
    "渠道经理", "区域销售总监", "IT基础架构负责人", "合规风控专员",
]

PAIN_POINTS = [
    "人工处理效率低，高峰期单据积压严重",
    "多套系统数据不互通，口径经常对不上",
    "现有流程依赖线下审批，周期长且不透明",
    "客户流失率上升但缺乏归因手段",
    "库存周转慢，呆滞库存占用大量资金",
    "一线员工操作复杂，培训成本高",
    "报表出数滞后，管理层决策缺少实时依据",
    "供应商协同靠邮件和电话，错漏频发",
    "老系统技术栈陈旧，扩展一个功能要改多处",
    "促销活动规则复杂，配置出错会直接造成资损",
    "跨部门需求排期冲突，优先级缺少统一标准",
    "数据安全与合规要求提高，现有权限体系粒度不够",
]

GOALS = [
    "把平均处理时长从两天压缩到两小时以内",
    "建立统一的数据口径和实时看板",
    "实现审批流程全程线上化、可追溯",
    "将复购率提升百分之十五以上",
    "库存周转天数下降三成",
    "新员工一周内可独立上岗",
    "核心报表T+0产出",
    "供应商准时交付率达到98%",
    "新功能平均交付周期缩短到两周",
    "活动配置零资损事故",
    "建立统一的需求优先级评审机制",
    "通过等保三级与行业合规审计",
]

CONSTRAINTS = [
    "预算上限约两百万元，分两期投入",
    "必须兼容现有ERP与财务系统接口",
    "上线窗口在下一个业务淡季，约四个月后",
    "团队只有两名后端与一名前端可投入",
    "数据不允许出私有化机房",
    "需保留旧系统并行运行至少一个季度",
    "供应商需具备同行业交付案例",
    "移动端必须覆盖微信小程序",
    "高峰并发约每秒三千次查询",
    "历史数据迁移量约二十亿条",
]

OPTION_BANK = [
    ["效率优先", "质量优先", "成本优先", "体验优先", "其他（请说明）"],
    ["已有明确方案", "有初步想法", "还在调研", "完全未开始"],
    ["核心业务流程", "辅助支撑环节", "对外服务能力", "内部管理需求"],
    ["一个月内", "一个季度内", "半年以上", "时间不确定"],
    ["自研为主", "采购成熟产品", "混合方案", "尚未决定"],
    ["每天多次", "每周几次", "每月几次", "偶尔使用"],
    ["强烈需要", "比较需要", "可有可无", "不需要"],
    ["百万元以内", "一百到五百万", "五百万以上", "预算未定"],
]

ANSWER_SENTENCES = [
    "我们目前主要依靠人工在表格里维护，{pain}。",
    "这个问题业务部门反馈很多次了，核心是{pain}。",
    "理想状态是{goal}，但现在差距还比较大。",
    "我们倾向于{opt}，因为团队经验和预算都更匹配。",
    "上一次尝试过外采方案，效果一般，主要卡在{pain}。",
    "管理层最关心的是{goal}，其次才是成本。",
    "约束方面，{constraint}，这点在方案里必须考虑。",
    "如果必须排序，我会把{opt}放在第一位。",
    "涉及的角色包括{role}和一线执行同事，流程跨三个部门。",
    "我们做过一轮调研，同行普遍的做法也验证了{goal}的价值。",
]

PROSE_TEMPLATES = [
    "{topic}项目的背景是：{pain}。业务方期望{goal}，同时受到以下约束：{constraint}。"
    "访谈中{role}强调，方案必须先解决最影响一线效率的环节，再逐步扩展。",
    "在{topic}的调研中，我们发现{pain}。这一问题的根因在于流程与系统的割裂，"
    "因此建议优先建设统一的数据底座，再推进流程线上化，最终实现{goal}。",
    "需求访谈是一种结构化的信息采集方法：围绕既定维度逐层提问，"
    "通过追问澄清模糊表述，并用证据等级标注每条结论的可信度。"
    "对于{topic}这类项目，关键维度包括目标价值、业务流程、技术约束与实施计划。",
    "{role}在访谈中提到，{pain}，并补充说明了量化影响。"
    "结合参考资料与检索结果，我们将其归类为高优先级诉求，"
    "对应的成功标准是{goal}。",
    "方案评审会上，围绕{topic}形成了两种路线：一是快速落地的轻量改造，"
    "二是彻底重构。考虑到{constraint}，最终倾向于分阶段推进，"
    "第一阶段以{goal}为验收目标。",
]

EN_PROSE = [
    "A requirements interview proceeds dimension by dimension: goals, "
    "business flow, constraints, and rollout plan. Each answer is scored "
    "for evidence strength, and weak answers trigger follow-up probes.",
    "The report pipeline drafts a structured JSON document, validates it "
    "against the evidence index, repairs reference errors, and renders "
    "markdown with mermaid diagrams for flows and priority quadrants.",
    "Paged attention keeps the key-value cache in fixed-size pages so the "
    "scheduler can admit and evict sequences without copying memory.",
    "Continuous batching interleaves prefill chunks with decode steps, "
    "keeping time-to-first-token low while sustaining throughput.",
]


def load_scenarios():
    out = []
    for fn in sorted(os.listdir(SCENARIO_DIR)):
        if fn.endswith(".json"):
            with open(os.path.join(SCENARIO_DIR, fn), encoding="utf-8") as fh:
                out.append(json.load(fh))
    return out


# --------------------------------------------------------------------------
# Example generators — formats mirror the serving prompts
# --------------------------------------------------------------------------

def _question_json(rng, dim, is_follow_up=False):
    aspects = dim.get("key_aspects") or [dim.get("name", "核心需求")]
    aspect = rng.choice(aspects)
    stems = [
        f"在{aspect}方面，您目前遇到的最大挑战是什么？",
        f"关于{aspect}，您期望达到的理想状态是怎样的？",
        f"请描述{aspect}涉及的具体场景、频率和参与角色。",
        f"针对{aspect}，您已经尝试过哪些做法？效果如何？",
        f"如果资源有限，{aspect}中哪一项您认为必须优先解决？",
        f"{aspect}目前由谁负责？判断好坏的标准是什么？",
        f"能否量化一下{aspect}带来的影响，比如时间、成本或人力？",
        f"{aspect}的现状与一年前相比有什么变化？",
        f"在{aspect}上，团队内部是否存在分歧？主要集中在哪里？",
        f"如果{aspect}得到解决，您预期最先看到哪些改善？",
        f"{aspect}相关的数据目前存放在哪些系统里？口径一致吗？",
        f"围绕{aspect}，最近一次出问题的具体经过是怎样的？",
        f"{aspect}的决策流程是怎样的？需要哪些角色审批？",
        f"您认为{aspect}的瓶颈更多在流程、工具还是人员能力？",
        f"针对{aspect}，同行或竞品的做法您了解多少？",
        f"{aspect}如果继续维持现状，半年后会发生什么？",
    ]
    q = ("追问：" if is_follow_up else "") + rng.choice(stems)
    options = rng.choice(OPTION_BANK)
    return {
        "question": q,
        "options": list(options[: rng.randint(3, len(options))]),
        "multi_select": rng.random() < 0.25,
        "is_follow_up": is_follow_up,
        "answer_mode": rng.choice(["pick_only", "pick_with_reason"]),
        "requires_rationale": rng.random() < 0.5,
        "evidence_intent": rng.choice(["low", "medium", "high"]),
        "ai_recommendation": (rng.choice(options)
                              if rng.random() < 0.3 else None),
    }


def _answer_text(rng):
    t = rng.choice(ANSWER_SENTENCES)
    return t.format(
        pain=rng.choice(PAIN_POINTS), goal=rng.choice(GOALS),
        opt=rng.choice(rng.choice(OPTION_BANK)),
        constraint=rng.choice(CONSTRAINTS), role=rng.choice(ROLES),
    )


def gen_question_example(rng, scenarios):
    sc = rng.choice(scenarios)
    dim = rng.choice(sc["dimensions"])
    topic = rng.choice(TOPICS)
    is_follow_up = rng.random() < 0.3
    aspects = "、".join(dim.get("key_aspects", []))
    parts = [
        "你是一名资深需求访谈顾问，正在进行结构化访谈。",
        f"访谈主题：{topic}",
        f"当前维度：{dim.get('name')}（关注要点：{aspects}）",
    ]
    n_hist = rng.randint(0, 3)
    if n_hist:
        hist = []
        for _ in range(n_hist):
            hq = _question_json(rng, dim)["question"]
            hist.append(f"问：{hq}\n答：{_answer_text(rng)}")
        parts.append("历史问答：\n" + "\n".join(hist))
    if is_follow_up:
        parts.append(f"请针对上一个回答进行追问。追问背景：{_answer_text(rng)}")
    parts.append(
        "请生成下一个访谈问题，输出 JSON："
        '{"question": "问题文本(≤240字)", "options": ["选项1", ...2-6项], '
        '"multi_select": bool, "is_follow_up": %s, '
        '"answer_mode": "pick_only|pick_with_reason", '
        '"requires_rationale": bool, "evidence_intent": "low|medium|high", '
        '"ai_recommendation": "推荐选项或null"}'
        % ("true" if is_follow_up else "false")
    )
    prompt = "\n\n".join(parts)
    target = json.dumps(_question_json(rng, dim, is_follow_up),
                        ensure_ascii=False)
    return prompt + "\n" + target


def gen_report_example(rng, scenarios):
    topic = rng.choice(TOPICS)
    n_q = rng.randint(3, 8)
    q_ids = [f"Q{i+1}" for i in range(n_q)]
    facts = []
    for qid in q_ids:
        facts.append(
            f"[{qid}] 问：{_question_json(rng, rng.choice(rng.choice(scenarios)['dimensions']))['question']}"
            f" 答：{_answer_text(rng)}"
        )
    prompt = (
        f"你是一名需求分析专家。请基于以下访谈证据，为主题「{topic}」撰写结构化报告草稿，"
        "输出 JSON，键：overview, needs, analysis, visualizations, solutions, "
        "risks, actions, open_questions, evidence_index。\n访谈证据：\n"
        + "\n".join(facts)
    )

    def refs():
        return [rng.choice(q_ids)]

    draft = {
        "overview": (
            f"本报告基于对「{topic}」的{n_q}轮结构化访谈整理。"
            f"核心发现：{rng.choice(PAIN_POINTS)}；业务目标为{rng.choice(GOALS)}。"
        ),
        "needs": [
            {"title": "核心业务诉求",
             "description": rng.choice(GOALS), "priority": "P0",
             "refs": refs()},
            {"title": "实施路径诉求",
             "description": rng.choice(CONSTRAINTS), "priority": "P1",
             "refs": refs()},
        ],
        "analysis": {
            "customer_needs": f"访谈对象明确表达了痛点：{rng.choice(PAIN_POINTS)}。",
            "business_flow": "现有流程存在线下断点，需要线上化与自动化改造。",
            "tech_constraints": rng.choice(CONSTRAINTS),
            "project_constraints": rng.choice(CONSTRAINTS),
        },
        "visualizations": {
            "priority_quadrant_mermaid": (
                "quadrantChart\n    title 需求优先级\n    x-axis 实施难度\n"
                "    y-axis 业务价值\n    核心诉求: [0.3, 0.8]"
            ),
            "business_flow_mermaid": (
                "flowchart LR\n    A[需求提出] --> B[评审]\n    B --> C[排期]"
                "\n    C --> D[交付]"
            ),
        },
        "solutions": [
            {"title": "分阶段实施方案",
             "description": f"第一阶段以{rng.choice(GOALS)}为目标，小步快跑。",
             "refs": refs()},
        ],
        "risks": [
            {"title": "数据迁移风险",
             "description": rng.choice(CONSTRAINTS), "refs": refs()},
        ],
        "actions": [
            {"title": "两周内完成方案评审",
             "description": "组织业务与技术联合评审，冻结一期范围。",
             "refs": refs()},
        ],
        "open_questions": [rng.choice(PAIN_POINTS)],
        "evidence_index": q_ids,
    }
    return prompt + "\n" + json.dumps(draft, ensure_ascii=False)


def gen_review_example(rng):
    issues = []
    if rng.random() < 0.6:
        issues.append({
            "type": rng.choice(["missing_ref", "weak_evidence",
                                "inconsistent"]),
            "severity": rng.choice(["low", "medium", "high"]),
            "message": "部分结论缺少访谈证据编号支撑，建议补充 refs。",
            "target": rng.choice(["needs", "solutions", "risks"]),
        })
    prompt = (
        "你是一名报告评审专家。请检查以下报告草稿的证据引用与一致性，"
        '输出 JSON：{"issues": [{"type", "severity", "message", "target"}], '
        '"pass": bool}\n草稿摘要：'
        + rng.choice(PAIN_POINTS) + "；" + rng.choice(GOALS)
    )
    target = json.dumps({"issues": issues, "pass": not issues},
                        ensure_ascii=False)
    return prompt + "\n" + target


def gen_summary_example(rng):
    body = "。".join(
        rng.choice(PROSE_TEMPLATES).format(
            topic=rng.choice(TOPICS), pain=rng.choice(PAIN_POINTS),
            goal=rng.choice(GOALS), constraint=rng.choice(CONSTRAINTS),
            role=rng.choice(ROLES),
        ) for _ in range(rng.randint(2, 5))
    )
    summary = (
        f"要点：1) {rng.choice(PAIN_POINTS)}；2) 目标是{rng.choice(GOALS)}；"
        f"3) 约束：{rng.choice(CONSTRAINTS)}。"
    )
    prompt = f"请将以下文档压缩为不超过700字的要点摘要：\n{body}"
    return prompt + "\n" + summary


def gen_search_decision_example(rng):
    topic = rng.choice(TOPICS)
    need = rng.random() < 0.4
    prompt = (
        "判断以下访谈话题是否需要联网检索外部信息，输出 JSON "
        '{"need_search": bool, "query": "检索词"}：' + topic
    )
    target = json.dumps(
        {"need_search": need, "query": topic[:20] if need else ""},
        ensure_ascii=False,
    )
    return prompt + "\n" + target


def gen_assessment_example(rng):
    ans = _answer_text(rng)
    score = round(rng.uniform(0.2, 0.95), 2)
    prompt = (
        "请为以下访谈回答的信息含量打分(0-1)，输出 JSON "
        '{"score": 数值, "reason": "简短理由"}：' + ans
    )
    target = json.dumps(
        {"score": score,
         "reason": "回答包含具体场景与量化信息" if score > 0.6
         else "回答较为笼统，缺少具体事实"},
        ensure_ascii=False)
    return prompt + "\n" + target


def gen_prose(rng):
    return rng.choice(PROSE_TEMPLATES).format(
        topic=rng.choice(TOPICS), pain=rng.choice(PAIN_POINTS),
        goal=rng.choice(GOALS), constraint=rng.choice(CONSTRAINTS),
        role=rng.choice(ROLES),
    )


GENS = [
    (gen_question_example, 0.30, True),
    (gen_report_example, 0.18, True),
    (gen_review_example, 0.08, False),
    (gen_summary_example, 0.12, False),
    (gen_search_decision_example, 0.08, False),
    (gen_assessment_example, 0.08, False),
    (gen_prose, 0.13, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/corpus/dv_corpus.txt")
    ap.add_argument("--mb", type=float, default=40.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    scenarios = load_scenarios()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    target_bytes = int(args.mb * 1024 * 1024)
    written = 0
    n = 0
    weights = [w for _, w, _ in GENS]
    with open(args.out, "w", encoding="utf-8") as fh:
        while written < target_bytes:
            gen, _, needs_sc = rng.choices(GENS, weights=weights)[0]
            text = gen(rng, scenarios) if needs_sc else gen(rng)
            if rng.random() < 0.05:
                text += "\n" + rng.choice(EN_PROSE)
            doc = text + "\n<|eot|>\n"
            fh.write(doc)
            written += len(doc.encode("utf-8"))
            n += 1
    print(f"wrote {n} documents, {written/1e6:.1f} MB -> {args.out}")


if __name__ == "__main__":
    main()
