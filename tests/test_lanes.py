"""Lane-profile tests (SURVEY §2.3 "AI lane/client manager"): call-type
→ lane resolution with failover pairing, preferred-lane override, and
the operational envelope (token caps / timeouts / priorities) the
reference runs with.  Reference: lane resolution web/server.py:2033-2407,
lane config web/.env.example:36-84, fast tier web/config.py:98-100."""

from deepvision_tpu.engine.lanes import (
    CALL_TYPE_LANES,
    DEFAULT_LANES,
    LaneProfile,
    resolve_lanes,
)
from deepvision_tpu.engine.scheduler import HIGH, LOW


def test_every_call_type_resolves_to_known_lanes():
    for call_type, (primary, fallback) in CALL_TYPE_LANES.items():
        assert primary in DEFAULT_LANES, call_type
        if fallback is not None:
            assert fallback in DEFAULT_LANES, call_type
            assert fallback != primary, (
                f"{call_type}: failover must differ from primary")


def test_resolution_order_primary_then_fallback():
    assert resolve_lanes("question") == ["question", "question_deep"]
    assert resolve_lanes("report_review") == ["report_review",
                                              "report_draft"]
    assert resolve_lanes("summary") == ["summary"]


def test_preferred_lane_goes_first_without_duplicates():
    assert resolve_lanes("question", "question_deep") == [
        "question_deep", "question"]
    assert resolve_lanes("question", "report") == [
        "report", "question", "question_deep"]
    # unknown preferred lane is ignored
    assert resolve_lanes("question", "no-such-lane") == [
        "question", "question_deep"]


def test_unknown_call_type_defaults_to_question():
    assert resolve_lanes("mystery")[0] == "question"


def test_interactive_lanes_are_high_priority():
    for name in ("question", "question_fast", "question_deep", "report",
                 "report_draft", "report_review"):
        assert DEFAULT_LANES[name].priority == HIGH, name


def test_background_lanes_are_low_priority():
    """Summary/search/assessment must never steal capacity from live
    question/report traffic (reference priority gate web/server.py:4499)."""
    for name in ("summary", "search_decision", "assessment"):
        assert DEFAULT_LANES[name].priority == LOW, name


def test_operational_envelope_tracks_baseline():
    # BASELINE.md: question 2200 tok, report 8000, summary 600;
    # fast tier 8 s / 900 tok (web/config.py:98-100)
    assert DEFAULT_LANES["question"].max_tokens == 2200
    assert DEFAULT_LANES["report_draft"].max_tokens == 8000
    assert DEFAULT_LANES["summary"].max_tokens == 600
    fast = DEFAULT_LANES["question_fast"]
    assert fast.max_tokens == 900 and fast.timeout_s == 8.0


def test_deterministic_lanes_use_zero_temperature():
    """Decision/scoring lanes must be reproducible."""
    assert DEFAULT_LANES["search_decision"].temperature == 0.0
    assert DEFAULT_LANES["assessment"].temperature == 0.0


def test_profile_replace_is_pure():
    base = DEFAULT_LANES["question"]
    hot = base.replace(max_tokens=100)
    assert hot.max_tokens == 100 and base.max_tokens == 2200
    assert isinstance(hot, LaneProfile)
