"""Web-search subsystem tests (SURVEY §2.3 "Web search"): MCP JSON-RPC
protocol against a stub HTTP server, the rule→AI search-need decision
ladder, decision/result caches, and inflight dedupe.  Reference:
MCPClient web/server.py:17349-17550 (protocol 2024-11-05), decision
:17667-17959, caches :4033-4850."""

import http.server
import json
import threading
import time

import pytest

from deepvision_tpu.engine.client import ModelGateway
from deepvision_tpu.web.runtime.search import MCPClient, SearchService


class _StubMCP(http.server.BaseHTTPRequestHandler):
    """Records every JSON-RPC request; serves canned MCP responses."""

    requests = []  # class-level: (method, params, headers)
    delay_s = 0.0
    fail_next = False

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(
            int(self.headers["Content-Length"])))
        _StubMCP.requests.append(
            (body["method"], body.get("params", {}),
             dict(self.headers.items())))
        if _StubMCP.delay_s:
            time.sleep(_StubMCP.delay_s)
        if _StubMCP.fail_next:
            _StubMCP.fail_next = False
            payload = {"jsonrpc": "2.0", "id": body["id"],
                       "error": {"code": -32000, "message": "boom"}}
        elif body["method"] == "initialize":
            payload = {"jsonrpc": "2.0", "id": body["id"],
                       "result": {"protocolVersion": "2024-11-05"}}
        else:
            q = body["params"]["arguments"]["query"]
            payload = {"jsonrpc": "2.0", "id": body["id"], "result": {
                "content": [
                    {"type": "text", "text": f"结果1：{q} 的市场综述"},
                    {"type": "image", "data": "ignored"},
                    {"type": "text", "text": "结果2：竞品对比"},
                ]}}
        blob = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(blob)))
        self.end_headers()
        self.wfile.write(blob)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def stub_url():
    _StubMCP.requests = []
    _StubMCP.delay_s = 0.0
    _StubMCP.fail_next = False
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _StubMCP)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/mcp"
    srv.shutdown()


# ---------------------------------------------------------------------------
# MCP client protocol
# ---------------------------------------------------------------------------

def test_mcp_initialize_once_then_tools_call(stub_url):
    client = MCPClient(stub_url, api_key="sk-test")
    out = client.search("新能源 市场")
    assert "结果1" in out and "结果2" in out
    assert "ignored" not in out  # non-text content skipped
    methods = [r[0] for r in _StubMCP.requests]
    assert methods == ["initialize", "tools/call"]
    init_params = _StubMCP.requests[0][1]
    assert init_params["protocolVersion"] == "2024-11-05"
    call = _StubMCP.requests[1][1]
    assert call["name"] == "web_search"
    assert call["arguments"]["query"] == "新能源 市场"
    # bearer auth on every request
    assert _StubMCP.requests[0][2].get("Authorization") == "Bearer sk-test"
    # second search must NOT re-initialize
    client.search("另一个查询")
    assert [r[0] for r in _StubMCP.requests].count("initialize") == 1


def test_mcp_error_response_raises(stub_url):
    client = MCPClient(stub_url)
    client.ensure_initialized()
    _StubMCP.fail_next = True
    with pytest.raises(RuntimeError, match="MCP error"):
        client.search("x")


def test_mcp_request_ids_increment(stub_url):
    client = MCPClient(stub_url)
    client.search("a")
    client.search("b")
    ids = [r[1] for r in _StubMCP.requests]
    assert len(_StubMCP.requests) == 3  # init + 2 calls


# ---------------------------------------------------------------------------
# decision ladder
# ---------------------------------------------------------------------------

def _service(**kw):
    return SearchService(ModelGateway(mode="template"), **kw)


def test_rule_time_sensitive_triggers_search():
    svc = _service()
    d = svc.smart_search_decision("2026 新能源汽车 市场规模 调研")
    assert d["need_search"] is True
    assert d["reason"] == "rule:time_sensitive"
    assert d["query"]


def test_rule_local_topic_skips_search():
    svc = _service()
    d = svc.smart_search_decision("内部审批流程 痛点 访谈")
    assert d["need_search"] is False
    assert d["reason"] == "rule:local_topic"


def test_ai_layer_used_when_rules_silent():
    svc = _service()
    d = svc.smart_search_decision("企业数字化转型选型")
    assert d["reason"] in ("ai", "decision_failed")
    assert "need_search" in d


def test_decision_failure_defaults_to_no_search():
    class Boom:
        def call_model(self, *a, **k):
            raise RuntimeError("lane down")

    svc = SearchService(Boom())
    d = svc.smart_search_decision("企业数字化转型选型")
    assert d == {"need_search": False, "reason": "decision_failed"}


def test_decision_cache_prevents_second_ai_call():
    calls = []

    class Counting:
        def call_model(self, *a, **k):
            calls.append(1)
            return '{"need_search": false, "query": ""}'

    svc = SearchService(Counting())
    svc.smart_search_decision("云平台选型对比分析")
    svc.smart_search_decision("云平台选型对比分析")
    assert len(calls) == 1


# ---------------------------------------------------------------------------
# result cache + inflight dedupe
# ---------------------------------------------------------------------------

def test_search_disabled_returns_empty(stub_url):
    svc = _service()  # enabled=False
    assert svc.search("任何查询") == ""
    svc2 = _service(enabled=True)  # no mcp_url
    assert svc2.search("任何查询") == ""


def test_result_cache_hits_within_ttl(stub_url):
    svc = _service(enabled=True, mcp_url=stub_url)
    out1 = svc.search("行业 趋势")
    n_calls = len([r for r in _StubMCP.requests if r[0] == "tools/call"])
    out2 = svc.search("行业 趋势")
    assert out1 == out2 != ""
    assert len([r for r in _StubMCP.requests
                if r[0] == "tools/call"]) == n_calls
    # expired TTL refetches
    out3 = svc.search("行业 趋势", ttl=0.0)
    assert len([r for r in _StubMCP.requests
                if r[0] == "tools/call"]) == n_calls + 1
    assert out3 != ""


def test_inflight_dedupe_single_upstream_call(stub_url):
    _StubMCP.delay_s = 0.3
    svc = _service(enabled=True, mcp_url=stub_url)
    outs = []

    def w():
        outs.append(svc.search("并发 查询 竞品"))

    threads = [threading.Thread(target=w) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(10)
    assert len(outs) == 4
    assert len(set(outs)) == 1 and outs[0] != ""
    assert len([r for r in _StubMCP.requests
                if r[0] == "tools/call"]) == 1


def test_mcp_failure_degrades_to_empty(stub_url):
    svc = _service(enabled=True, mcp_url=stub_url)
    svc.client.ensure_initialized()
    _StubMCP.fail_next = True
    assert svc.search("会失败的查询") == ""
    # and the failure is not cached as a result
    assert svc.search("会失败的查询") != ""


def test_maybe_search_for_session_end_to_end(stub_url):
    svc = _service(enabled=True, mcp_url=stub_url)
    ctx = svc.maybe_search_for_session(
        {"topic": "2026 行业 市场规模", "description": ""})
    assert "结果1" in ctx
    assert svc.maybe_search_for_session(
        {"topic": "内部流程 痛点", "description": ""}) == ""
