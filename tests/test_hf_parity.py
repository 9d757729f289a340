"""Architecture parity: our forward must match HuggingFace LlamaForCausalLM
logits on a randomly-initialized tiny config (proves real Llama/Gemma
checkpoints load and run correctly)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from deepvision_tpu.engine import model as model_lib  # noqa: E402
from deepvision_tpu.engine.hf_import import (  # noqa: E402
    convert_hf_state_dict,
    infer_config_from_hf,
)


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return cfg, model


def test_logits_match_hf(tiny_llama):
    hf_cfg, hf_model = tiny_llama
    cfg = infer_config_from_hf(hf_cfg)
    params = convert_hf_state_dict(
        dict(hf_model.state_dict()), cfg, norm_offset=-1.0
    )

    rng = np.random.RandomState(0)
    tokens = rng.randint(0, hf_cfg.vocab_size, size=(2, 17))

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(tokens)).logits.numpy()

    ours = np.asarray(
        model_lib.forward_train(
            params, jnp.asarray(tokens, jnp.int32), cfg=cfg,
            act_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    # greedy decisions identical at every position
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()


def test_decode_path_matches_hf_greedy(tiny_llama):
    """Paged prefill+decode must continue exactly like HF greedy decoding."""
    hf_cfg, hf_model = tiny_llama
    cfg = infer_config_from_hf(hf_cfg)
    params = convert_hf_state_dict(
        dict(hf_model.state_dict()), cfg, norm_offset=-1.0
    )
    params = {  # engine serves in bf16; greedy decisions must survive
        k: v for k, v in params.items()
    }

    from deepvision_tpu.engine.kv_cache import (
        CacheConfig,
        PageAllocator,
        init_cache,
    )

    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_pages_per_seq=8)
    cache = init_cache(cfg, cache_cfg)
    alloc = PageAllocator(cache_cfg.num_pages)

    prompt = list(np.random.RandomState(1).randint(
        0, hf_cfg.vocab_size, size=9))
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=5, do_sample=False,
        )[0].tolist()
    hf_cont = hf_out[len(prompt):]

    S_pad = 16
    pages = alloc.alloc(3)
    toks = np.zeros((1, S_pad), np.int32)
    toks[0, : len(prompt)] = prompt
    pp = np.asarray([pages[:1]], np.int32)
    logits, cache = model_lib.forward_prefill(
        params, cache, jnp.asarray(toks), jnp.asarray([len(prompt)],
                                                      jnp.int32),
        jnp.asarray(pp), cfg=cfg, interpret=True,
    )
    seq = list(prompt) + [int(jnp.argmax(logits[0]))]
    bt = np.zeros((1, cache_cfg.max_pages_per_seq), np.int32)
    bt[0, : len(pages)] = pages
    for _ in range(4):
        logits, cache = model_lib.forward_decode(
            params, cache, jnp.asarray([seq[-1]], jnp.int32),
            jnp.asarray([len(seq)], jnp.int32), jnp.asarray(bt),
            cfg=cfg, interpret=True,
        )
        seq.append(int(jnp.argmax(logits[0])))
    assert seq[len(prompt):] == hf_cont
