"""Grammar-constrained decoding: JSON DFA construction + engine integration.

The reference repairs free-form model JSON after the fact
(web/server.py:21685-21943); the TPU engine masks logits inside the decode
scan so outputs are grammatical by construction (engine/constrained.py).
"""

import json
import os

import numpy as np
import pytest

from deepvision_tpu.engine.constrained import JsonTokenDfa, token_bytes
from deepvision_tpu.engine.tokenizer import ByteTokenizer, get_tokenizer

TOKENIZER_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "tokenizer", "dv_bpe_8k.json",
)


@pytest.fixture(scope="module")
def bpe_dfa():
    tok = get_tokenizer(TOKENIZER_PATH)
    return tok, JsonTokenDfa.build(tok)


@pytest.fixture(scope="module")
def byte_dfa():
    tok = ByteTokenizer()
    return tok, JsonTokenDfa.build(tok)


GOOD = [
    '{"question": "在库存周转方面，您的目标是什么？", "options": ["A", "B"]}',
    '{"score": 0.73, "reason": "回答具体"}',
    '[1, 2, {"a": null}, true]',
    '{"nested": {"deep": {"x": [1, -2.5e3]}}}',
    '"bare string"',
    '  {"ws": "ok"} ',
    '{"needs": [{"title": "核心", "refs": ["Q1"]}], "pass": true}',
    '{"esc": "a\\"b\\\\c"}',
    '{"nums": [0, -1, 0.5, 1e10, 1E-5, 123.456e+7]}',
    "{}", "[]", "0", "true", "null",
]

BAD = [
    '{"a": }', "{a: 1}", '{"a" 1}', "[1, 2,,]", "truefalse",
    '{"x": 1} extra', "[06]", "[--1]", "[1.]", "[+1]", "[1e]", "[-]",
    '{"bad": "\\x"}', "{,}", '["open"',
]


def test_positive_json_walks_to_accept(bpe_dfa):
    tok, dfa = bpe_dfa
    for text in GOOD:
        # EOS appended: top-level numbers complete only via EOS
        assert dfa.walk(tok.encode(text) + [tok.eos_id]) == dfa.accept, text


def test_negative_json_never_accepts(bpe_dfa):
    tok, dfa = bpe_dfa
    for text in BAD:
        s = dfa.walk(tok.encode(text))
        if s >= 0:
            s = dfa.next_state(s, tok.eos_id)
        assert s != dfa.accept, text


def test_byte_tokenizer_dfa(byte_dfa):
    tok, dfa = byte_dfa
    ids = tok.encode('{"k": [1, true, "值"]}', add_bos=False)
    assert dfa.walk(ids) == dfa.accept


def test_free_row_allows_everything(bpe_dfa):
    _, dfa = bpe_dfa
    assert (dfa.table[dfa.FREE] == dfa.FREE).all()


def test_eos_terminates_only_at_complete_values(bpe_dfa):
    tok, dfa = bpe_dfa
    col = dfa.table[1:, tok.eos_id]
    allowed_rows = np.nonzero(col >= 0)[0] + 1
    # ACCEPT is terminable, and every EOS-terminable state lands on ACCEPT
    assert dfa.accept in allowed_rows
    assert (dfa.table[allowed_rows, tok.eos_id] == dfa.accept).all()
    # mid-string / mid-object states must not allow EOS
    mid = dfa.walk(tok.encode('{"question": "正在'))
    assert dfa.table[mid, tok.eos_id] == -1


def test_random_policy_stays_in_grammar(bpe_dfa):
    """Worst-case model (uniform random over allowed tokens): every
    completed generation must parse."""
    tok, dfa = bpe_dfa
    rng = np.random.RandomState(7)
    completed = 0
    for _ in range(30):
        state, out = dfa.start, []
        for _ in range(250):
            scores = rng.rand(tok.vocab_size)
            allowed = dfa.table[state] >= 0
            assert allowed.any(), state
            tid = int(np.argmax(np.where(allowed, scores, -1)))
            if tid == tok.eos_id:
                break
            out.append(tid)
            state = int(dfa.table[state, tid])
        if state == dfa.accept:
            json.loads(tok.decode(out))
            completed += 1
    assert completed >= 20


def test_special_tokens_forbidden_in_grammar(bpe_dfa):
    tok, dfa = bpe_dfa
    for sid in tok.special_ids:
        if sid == tok.eos_id:
            continue
        assert (dfa.table[1:, sid] == -1).all(), sid


def test_close_distance_properties(bpe_dfa):
    """dist[s] = min tokens from s to ACCEPT (EOS rides the table)."""
    tok, dfa = bpe_dfa
    assert dfa.dist[dfa.FREE] == 0          # unconstrained never masked
    assert dfa.dist[dfa.accept] == 0
    # start ("value" root): a single-token complete value (e.g. "0") + EOS
    # cannot beat 1; every reachable state closes in a bounded token count
    assert 1 <= dfa.dist[dfa.start] <= 4
    # deeper open structure => monotonically-growing (or equal) distance
    shallow = dfa.walk(tok.encode('{"a": "x'))
    deep = dfa.walk(tok.encode('{"a": [{"b": "x'))
    assert 0 < dfa.dist[shallow] <= dfa.dist[deep]
    # distances are finite everywhere the grammar can still move
    live = (dfa.table >= 0).any(axis=1)
    assert (dfa.dist[np.nonzero(live)[0]] < (1 << 20)).all()


def test_force_close_policy_parses_at_any_budget(bpe_dfa):
    """Simulated worst-case decode loop with the EXACT masking rule from
    sampling.py: at every budget, a random policy must produce text that
    parses once the budget is spent."""
    tok, dfa = bpe_dfa
    rng = np.random.RandomState(3)
    for budget in (4, 7, 12, 30, 80):
        state, out = dfa.start, []
        remaining = budget
        while remaining > 0:
            allowed = dfa.table[state] >= 0
            nxt = np.maximum(dfa.table[state], 0)
            can_close = allowed & (dfa.dist[nxt] <= remaining - 1)
            mask = can_close if can_close.any() else allowed
            scores = rng.rand(tok.vocab_size)
            tid = int(np.argmax(np.where(mask, scores, -1.0)))
            remaining -= 1
            if tid == tok.eos_id:
                break
            out.append(tid)
            state = int(dfa.table[state, tid])
        if budget >= int(dfa.dist[dfa.start]):
            json.loads(tok.decode(out))  # must parse at ANY such budget


def test_token_bytes_roundtrip():
    assert token_bytes("Ġ\"") == b' "'
    assert token_bytes("åľ¨") == "在".encode("utf-8")


def test_engine_json_mode_parses():
    """Engine-level: random weights + constraint => parseable JSON."""
    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    eng = LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2, num_pages=64,
        page_size=16, max_pages_per_seq=8, interpret=True,
    ))
    try:
        text, meta = eng.generate_text(
            "输出 JSON：", max_tokens=60, temperature=0.9, top_k=0,
            json_mode=True, timeout=300,
        )
        assert meta["json_constrained"] is True
        # grammar guarantee now covers BOTH finish reasons: the budget-aware
        # force-close masks transitions that cannot reach ACCEPT within the
        # remaining tokens, so even a max_tokens cut parses
        json.loads(text)
    finally:
        eng.shutdown()


def test_engine_unconstrained_unaffected():
    from deepvision_tpu.engine.engine import EngineConfig, LLMEngine

    eng = LLMEngine(EngineConfig(
        model="dv-tiny-test", tokenizer="byte", max_slots=2, num_pages=64,
        page_size=16, max_pages_per_seq=8, interpret=True,
    ))
    try:
        text, meta = eng.generate_text(
            "你好", max_tokens=8, temperature=0.0, timeout=300)
        assert meta["json_constrained"] is False
        assert meta["completion_tokens"] >= 1
    finally:
        eng.shutdown()


def test_control_chars_forbidden_inside_strings(bpe_dfa):
    """json.loads strict mode rejects unescaped \\t \\n \\r inside strings;
    the grammar must too (code-review finding: CLS_WS used to cover them
    as string content)."""
    tok, dfa = bpe_dfa
    for bad in ('{"a": "x\ny"}', '{"a": "x\ty"}', '{"a\r": 1}'):
        s = dfa.walk(tok.encode(bad))
        if s >= 0:
            s = dfa.next_state(s, tok.eos_id)
        assert s != dfa.accept, repr(bad)
    # ... while they remain legal BETWEEN tokens
    ok = '{\n\t"a":\t1\n}'
    assert dfa.walk(tok.encode(ok) + [tok.eos_id]) == dfa.accept


def test_unicode_escapes_allowed(bpe_dfa):
    tok, dfa = bpe_dfa
    good = '{"a": "\\u4e2d\\u6587", "k\\u0041": 1}'
    assert dfa.walk(tok.encode(good) + [tok.eos_id]) == dfa.accept
    for bad in ('{"a": "\\u12"}', '{"a": "\\uzzzz"}', '{"a": "\\x41"}'):
        s = dfa.walk(tok.encode(bad))
        if s >= 0:
            s = dfa.next_state(s, tok.eos_id)
        assert s != dfa.accept, repr(bad)


def test_cache_signature_tracks_tokenizer_content(tmp_path):
    """A retrained tokenizer with identical vocab size must not reuse a
    stale cached table (code-review finding)."""
    import os

    from deepvision_tpu.engine.tokenizer import ByteTokenizer

    class ShiftedByteTokenizer(ByteTokenizer):
        """Same vocab size/eos, different token content."""

    JsonTokenDfa.build(ByteTokenizer(), cache_dir=str(tmp_path))
    files1 = set(os.listdir(tmp_path))
    assert files1
    # identical tokenizer -> cache hit, no new file
    JsonTokenDfa.build(ByteTokenizer(), cache_dir=str(tmp_path))
    assert set(os.listdir(tmp_path)) == files1


def test_packed_table_parity_with_unpacked():
    """The runner's packed grammar table ((dist<<16)|(state+1), one row
    gather) must sample EXACTLY like the two-gather unpacked form, for
    every (budget, state) shape incl. the force-close band and the
    unlimited sentinel."""
    import jax
    import jax.numpy as jnp

    from deepvision_tpu.engine.sampling import sample_tokens_constrained

    rng0 = np.random.default_rng(7)
    S, V, B = 9, 640, 8
    table = rng0.integers(-1, S, size=(S, V)).astype(np.int32)
    table[0, :] = 0  # FREE row: all allowed
    dist = rng0.integers(0, 6, size=S).astype(np.int32)
    dist[3] = 1 << 20  # INF sentinel (unreachable-to-ACCEPT state)
    dist[0] = 0
    packed = ((np.clip(dist[np.maximum(table, 0)], 0, 32767)
               .astype(np.int64) << 16)
              | (table.astype(np.int64) + 1)).astype(np.int32)

    logits = jnp.asarray(rng0.normal(size=(B, V)).astype(np.float32))
    temp = jnp.asarray([0.0, 0.7, 1.0, 0.3, 0.9, 0.0, 1.2, 0.5],
                       jnp.float32)
    topk = jnp.asarray([0, 40, 5, 0, 64, 1, 7, 0], jnp.int32)
    topp = jnp.asarray([1.0, 0.9, 1.0, 0.5, 0.95, 1.0, 1.0, 0.8],
                       jnp.float32)
    states = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)
    for budget_row in ([1, 2, 3, 4, 5, 6, 7, 1 << 20],
                       [1 << 20] * 8, [2] * 8):
        buds = jnp.asarray(budget_row, jnp.int32)
        key = jax.random.PRNGKey(42)
        t1, s1 = sample_tokens_constrained(
            logits, key, temp, topk, topp, states, jnp.asarray(table),
            budgets=buds, dfa_dist=jnp.asarray(dist))
        t2, s2 = sample_tokens_constrained(
            logits, key, temp, topk, topp, states, jnp.asarray(packed),
            budgets=buds, dfa_dist=jnp.asarray(dist), packed=True)
        assert np.array_equal(np.asarray(t1), np.asarray(t2)), budget_row
        assert np.array_equal(np.asarray(s1), np.asarray(s2)), budget_row
