"""Tokenizer tests: byte fallback + the in-repo trained BPE vocabs the
production checkpoints serve with (resources/tokenizer/dv_bpe_{8k,16k}
.json, trained by scripts/train_tokenizer.py).  The reference tokenizes
remotely (SURVEY §2.1) — here the tokenizer is a first-class serving
component, so its round-trip and id-domain invariants are load-bearing
(a single out-of-range id would index out of the embedding table)."""

import os

import pytest

from deepvision_tpu.engine.tokenizer import (
    ByteTokenizer,
    get_tokenizer,
)

TOK8 = "resources/tokenizer/dv_bpe_8k.json"
TOK16 = "resources/tokenizer/dv_bpe_16k.json"

SAMPLES = [
    "企业客户关系管理系统需求调研",
    "跨部门协作效率低，数据分散，报表手工汇总耗时。",
    'JSON 输出：{"question": "当前流程的主要痛点是什么？", "options": []}',
    "Mixed 中英文 with ASCII, punctuation! And numbers 12345.",
    "换行\n与\t制表符",
]


# ---------------------------------------------------------------------------
# byte tokenizer
# ---------------------------------------------------------------------------

def test_byte_roundtrip_arbitrary_unicode():
    tok = ByteTokenizer()
    for s in SAMPLES + ["🚀 emoji ♞ ß ü"]:
        ids = tok.encode(s)
        assert tok.decode(ids) == s
        assert all(0 <= i < tok.vocab_size for i in ids)


def test_byte_ids_match_utf8_bytes():
    tok = ByteTokenizer()
    ids = tok.encode("AB", add_bos=False)
    # byte-level: ASCII maps 1:1 into the byte range (offset by specials
    # if any — relative order must hold)
    assert ids[-1] - ids[-2] == ord("B") - ord("A")


def test_byte_batch_matches_single():
    tok = ByteTokenizer()
    batch = tok.encode_batch(SAMPLES)
    assert batch == [tok.encode(s) for s in SAMPLES]


def test_byte_eos_in_vocab():
    tok = ByteTokenizer()
    assert 0 <= tok.eos_id < tok.vocab_size


# ---------------------------------------------------------------------------
# trained BPE vocabs (the production serving path)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module", params=[TOK8, TOK16])
def bpe(request):
    if not os.path.isfile(request.param):
        pytest.skip(f"{request.param} not in repo")
    return get_tokenizer(request.param)


def test_bpe_roundtrips_cjk_exactly(bpe):
    for s in SAMPLES:
        ids = bpe.encode(s)
        assert bpe.decode(ids) == s, s


def test_bpe_ids_within_vocab(bpe):
    for s in SAMPLES:
        assert all(0 <= i < bpe.vocab_size for i in bpe.encode(s))


def test_bpe_compresses_chinese_over_bytes():
    """The BPE vocab exists to beat ~0.35 chars/token byte encoding;
    PERF_NOTES records ~3.5 chars/token on interview text."""
    bpe = get_tokenizer(TOK8)
    text = ("访谈主题：企业客户关系管理系统需求调研。"
            "当前流程的主要痛点是跨部门协作效率低。" * 5)
    ratio = len(text) / len(bpe.encode(text))
    assert ratio > 1.5, f"chars/token {ratio:.2f}"


def test_bpe_eos_resolves_to_special(bpe):
    assert bpe.eos_id != 0 or bpe.vocab_size <= 1
    assert 0 <= bpe.eos_id < bpe.vocab_size


def test_bpe_batch_matches_single(bpe):
    assert bpe.encode_batch(SAMPLES) == [bpe.encode(s) for s in SAMPLES]


def test_bpe_deterministic(bpe):
    a = bpe.encode(SAMPLES[0])
    b = bpe.encode(SAMPLES[0])
    assert a == b


def test_bpe_handles_unseen_codepoints(bpe):
    """Characters outside the training corpus must not crash or emit
    out-of-range ids (byte-fallback or unk)."""
    ids = bpe.encode("ᚠᚢᚦ unseen ᚱᚲ")
    assert all(0 <= i < bpe.vocab_size for i in ids)


def test_vocab_sizes_fit_model_presets():
    """Checkpoint embedding tables are sized to the tokenizer: vocab must
    fit the preset's padded vocab (CLAUDE.md: pad to x128)."""
    from deepvision_tpu.engine.config import get_model_config

    pairs = [("dv-mini", TOK8), ("dv-fast", TOK16), ("dv-base", TOK16)]
    for model, tok_path in pairs:
        if not os.path.isfile(tok_path):
            continue
        tok = get_tokenizer(tok_path)
        mc = get_model_config(model)
        assert tok.vocab_size <= mc.vocab_size, (
            f"{model}: tokenizer {tok.vocab_size} > embedding "
            f"{mc.vocab_size}")
        assert mc.vocab_size % 128 == 0, model


def test_get_tokenizer_spec_errors():
    with pytest.raises(FileNotFoundError):
        get_tokenizer("no/such/tokenizer.json")
    assert isinstance(get_tokenizer(None), ByteTokenizer)
    assert isinstance(get_tokenizer("byte"), ByteTokenizer)


# ---------------------------------------------------------------------------
# trainer round-trip on a fresh tiny vocab
# ---------------------------------------------------------------------------

def test_train_tiny_bpe_and_roundtrip(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "\n".join("访谈问题与回答示例文本，流程痛点与预算约束。"
                  for _ in range(200)) + "\nhello world ascii text\n",
        encoding="utf-8")
    out = tmp_path / "tiny.json"
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "scripts/train_tokenizer.py", "--corpus",
         str(corpus), "--out", str(out), "--vocab", "600"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    tok = get_tokenizer(str(out))
    s = "流程痛点与预算约束 hello"
    assert tok.decode(tok.encode(s)) == s
    assert tok.vocab_size <= 600 + 16  # + specials
