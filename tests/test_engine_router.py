"""Engine replica router + remote engine service (DCN scale-out surface).

Reference analogue: multi-worker Gunicorn over 8 remote lanes
(SURVEY.md §5.8); here requests route across replicas with prefix
stickiness, health demotion, and failover; RemoteEngine speaks the same
surface over HTTP.
"""

import threading

import pytest

from deepvision_tpu.engine.engine import EngineConfig, LLMEngine
from deepvision_tpu.engine.router import EngineRouter
from deepvision_tpu.engine.scheduler import EngineOverloadedError
from deepvision_tpu.engine.service import EngineService, RemoteEngine


def tiny_engine(seed=0):
    return LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2, num_pages=64,
        page_size=16, max_pages_per_seq=8, interpret=True, seed=seed,
        json_dfa=False,
    ))


@pytest.fixture()
def pair():
    a, b = tiny_engine(0), tiny_engine(1)
    router = EngineRouter([a, b], cooldown_s=5.0)
    yield router, a, b
    router.shutdown()


def test_router_generates_and_records_routing(pair):
    router, _, _ = pair
    text, meta = router.generate_text("你好", max_tokens=4,
                                      temperature=0.0, timeout=120)
    assert meta["completion_tokens"] >= 1
    assert meta["replica"] in (0, 1)
    assert sum(router.routed) == 1


def test_router_prefix_stickiness(pair):
    router, _, _ = pair
    homes = set()
    for _ in range(3):
        _, meta = router.generate_text(
            "会话前缀", max_tokens=2, temperature=0.0, timeout=120,
            prefix_key="sess-sticky")
        homes.add(meta["replica"])
    assert len(homes) == 1  # same home replica every time


def test_router_failover_on_dead_replica(pair):
    import zlib

    router, a, b = pair
    # kill whichever replica is the sticky home for this prefix key
    home = zlib.crc32(b"sess-x") % 2
    dead = (a, b)[home]
    dead.shutdown()
    dead.scheduler.submit = lambda req: (_ for _ in ()).throw(
        EngineOverloadedError("dead"))
    _, meta = router.generate_text(
        "路由容错", max_tokens=2, temperature=0.0, timeout=120,
        prefix_key="sess-x")
    assert meta["replica"] != home
    assert meta.get("failover") is True
    assert router.failovers >= 1
    # the dead replica's breaker opens: subsequent calls skip it directly
    _, meta2 = router.generate_text(
        "路由容错2", max_tokens=2, temperature=0.0, timeout=120,
        prefix_key="sess-x")
    assert meta2["replica"] != home


def test_router_stats_aggregate(pair):
    router, _, _ = pair
    router.generate_text("a", max_tokens=2, temperature=0.0, timeout=120)
    s = router.stats()
    assert s["router"]["replicas"] == 2
    assert s["tokens_generated"] >= 1
    assert len(s["replicas"]) == 2


def test_remote_engine_over_http():
    eng = tiny_engine()
    svc = EngineService(eng, host="127.0.0.1", port=0)
    port = svc.start(background=True)
    try:
        remote = RemoteEngine(f"http://127.0.0.1:{port}")
        remote.start()  # health check
        text, meta = remote.generate_text("远程调用", max_tokens=4,
                                          temperature=0.0, timeout=120)
        assert meta["completion_tokens"] >= 1
        assert meta["remote"].endswith(str(port))
        stats = remote.stats()
        assert stats["model"] == "dv-tiny-test"
        # a router can mix local + remote replicas transparently
        local = tiny_engine(2)
        router = EngineRouter([local, remote])
        _, m = router.generate_text("混合路由", max_tokens=2,
                                    temperature=0.0, timeout=120)
        assert m["replica"] in (0, 1)
        local.shutdown()
    finally:
        svc.shutdown()


def test_remote_engine_unreachable_raises():
    remote = RemoteEngine("http://127.0.0.1:1", connect_timeout=0.5)
    with pytest.raises(Exception):
        remote.start()


def test_multihost_dcn_dryrun():
    """2-process jax.distributed DP-over-DCN x TP-over-ICI train step
    (SURVEY §5.8; VERDICT r2 missing #8). Spawns two OS processes with 4
    virtual CPU devices each, joined over gloo collectives."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multihost(2, 2)
