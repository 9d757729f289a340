"""Serving↔training prompt alignment.

A from-scratch checkpoint only decodes well on prompt formats it was
trained on, so the serving builders (report_v3, followup) and the corpus
generators (scripts/build_corpus.py) must render through the SAME
canonical builders (web/runtime/prompt_formats.py). These tests pin that
contract: if either side drifts, the prompts stop matching and the
report/assessment lanes silently go out-of-distribution.

Reference parity: the reference uses one vendor model for all call types
(web/server.py:22430 draft, :23243 review, :23307 repair, :20655
assessment), so its prompt/训练 alignment is implicit; here it must be
explicit.
"""

import json
import random

from deepvision_tpu.web.runtime import prompt_formats, report_v3
import pytest

# fast main-path tier: scripts/agent_smoke.py runs `pytest -m smoke`
pytestmark = pytest.mark.smoke


def _pack():
    return {
        "topic": "门店数字化改造",
        "description": "连锁零售门店的数字化升级评估",
        "q_ids": ["Q1", "Q2"],
        "facts": [
            {"q_id": "Q1", "question": "现状如何？", "answer": "靠手工台账",
             "rationale": "每天花两小时", "evidence_class": "strong"},
            {"q_id": "Q2", "question": "目标是什么？", "answer": "实时库存",
             "rationale": None, "evidence_class": "weak"},
        ],
        "documents": [{"name": "现状报告.docx", "summary": "门店20家"}],
    }


class TestDraftPrompt:
    def test_serving_renders_through_canonical_builder(self):
        got = report_v3._draft_prompt(_pack())
        want = prompt_formats.report_draft_prompt(
            "门店数字化改造",
            [("Q1", "现状如何？", "靠手工台账 每天花两小时"),
             ("Q2", "目标是什么？", "实时库存")],
            description="连锁零售门店的数字化升级评估",
            documents=[("现状报告.docx", "门店20家")],
        )
        assert got == want

    def test_contains_required_keys_and_evidence(self):
        text = report_v3._draft_prompt(_pack())
        assert prompt_formats.DRAFT_KEYS in text
        assert "[Q1] 问：现状如何？ 答：靠手工台账 每天花两小时" in text
        assert "【参考文档：现状报告.docx】" in text
        assert "主题说明：连锁零售门店的数字化升级评估" in text

    def test_optional_sections_absent_when_empty(self):
        pack = _pack()
        pack["description"] = ""
        pack["documents"] = []
        text = report_v3._draft_prompt(pack)
        assert "主题说明" not in text
        assert "参考文档" not in text


class TestReviewRepairPrompts:
    def test_review_serving_matches_canonical(self):
        draft = {"overview": "x", "needs": []}
        issues = [{"type": "missing_ref", "severity": "low",
                   "message": "m", "target": "needs"}]
        got = report_v3._review_prompt(draft, issues)
        want = prompt_formats.report_review_prompt(
            json.dumps(draft, ensure_ascii=False)[:8000], issues)
        assert got == want
        assert '"quality_score"' in got and '"patch"' in got

    def test_repair_serving_matches_canonical(self):
        draft = {"overview": "x"}
        issues = [{"type": "too_short", "severity": "medium",
                   "message": "m", "target": "overview"}] * 12
        got = report_v3._repair_reprompt(draft, issues)
        want = prompt_formats.report_repair_prompt(
            json.dumps(draft, ensure_ascii=False)[:8000], issues[:10])
        assert got == want


class TestCorpusAlignment:
    """The corpus generators must emit prompts the serving side produces:
    same prefix sentence, same section markers."""

    def _gen(self, fn_name, n=8):
        from scripts import build_corpus
        rng = random.Random(11)
        scenarios = build_corpus.load_scenarios()
        fn = getattr(build_corpus, fn_name)
        return [fn(rng, scenarios) for _ in range(n)]

    def test_report_examples_use_canonical_draft_prompt(self):
        for ex in self._gen("gen_report_example"):
            assert ex.startswith("你是一名需求分析专家。请基于以下访谈证据，为主题「")
            assert prompt_formats.DRAFT_KEYS in ex
            # target is parseable draft JSON with the validated keys
            target = ex[ex.index("\n{"):].strip()
            draft = json.loads(target)
            assert set(report_v3.DRAFT_REQUIRED_KEYS) <= set(draft)

    def test_review_examples_carry_full_response_contract(self):
        saw_patch = False
        for ex in self._gen("gen_review_example", n=24):
            assert ex.startswith("你是一名报告评审专家。")
            target = json.loads(ex[ex.rindex("\n"):])
            assert set(target) == {"pass", "quality_score", "issues", "patch"}
            saw_patch = saw_patch or bool(target["patch"])
        assert saw_patch, "corpus never teaches the patch field"

    def test_repair_examples_fix_the_injected_flaw(self):
        for ex in self._gen("gen_repair_example", n=12):
            assert ex.startswith("以下报告草稿存在评审问题")
            fixed = json.loads(ex[ex.rindex("\n"):])
            assert set(report_v3.DRAFT_REQUIRED_KEYS) <= set(fixed)
            assert fixed["open_questions"], "fixed draft must be complete"

    def test_assessment_examples_include_question_context(self):
        for ex in self._gen("gen_assessment_example"):
            head = ex.split("\n")[0]
            assert head.startswith("请为以下访谈回答的信息含量打分(0-1)")
            assert "\n问：" in ex and "\n答：" in ex
            target = json.loads(ex[ex.rindex("\n"):])
            assert 0.0 <= target["score"] <= 1.0


class TestFollowupAssessmentLane:
    def test_followup_renders_assessment_via_canonical(self):
        calls = []

        class Gateway:
            def call_model(self, prompt, call_type=None, context=None):
                calls.append((prompt, call_type))
                return json.dumps({"score": 0.9, "reason": "ok"})

        from deepvision_tpu.web.runtime.followup import should_follow_up
        last_entry = {"question": "现状如何？", "answer": "短",
                      "dimension": "d1", "follow_up_round": 0}
        session = {"dimensions": {"d1": {"coverage": 0.2}},
                   "scenario_config": {"dimensions": [{"id": "d1"}]},
                   "conversation_history": [last_entry]}
        should_follow_up(session, {"id": "d1"}, last_entry, "standard",
                         gateway=Gateway())
        assert calls, "low-quality answer must reach the assessment lane"
        prompt, call_type = calls[0]
        assert call_type == "assessment"
        assert prompt == prompt_formats.assessment_prompt("现状如何？", "短")
