"""Property-level kernel tests (interpret mode): causality, masking,
page indirection, in-place update semantics, GQA grouping, numerical
stability, and sampling-distribution invariants.

These pin the semantic contracts the serving stack builds on — the class
of bug a closeness-to-reference test on one shape cannot catch (e.g. a
kernel that reads one token past seq_len is numerically close on random
inputs but breaks batching isolation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvision_tpu.engine.kernels.flash_attention import (
    flash_attention,
    flash_attention_reference,
)
from deepvision_tpu.engine.kernels.paged_attention import (
    paged_attention,
    paged_attention_reference,
    paged_attention_update,
)
from deepvision_tpu.engine.kernels.paged_chunk import paged_chunk_attention
from deepvision_tpu.engine.sampling import sample_tokens

RTOL = ATOL = 2e-3


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# ---------------------------------------------------------------------------
# flash attention: causality + masking + grouping
# ---------------------------------------------------------------------------

def test_flash_causality_future_tokens_do_not_leak():
    """Changing K/V at positions > i must not change the output at i."""
    B, H, KV, S, HD = 1, 4, 2, 128, 32
    q = _rand(0, (B, H, S, HD))
    k = _rand(1, (B, KV, S, HD))
    v = _rand(2, (B, KV, S, HD))
    lens = jnp.asarray([S], jnp.int32)
    out1 = flash_attention(q, k, v, lens, interpret=True)
    # corrupt the tail half of K/V
    half = S // 2
    k2 = k.at[:, :, half:].set(99.0)
    v2 = v.at[:, :, half:].set(-99.0)
    out2 = flash_attention(q, k2, v2, lens, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :, :half], np.asarray(out2)[:, :, :half],
        rtol=1e-5, atol=1e-5,
    )
    # and the tail MUST differ (the corruption is visible causally)
    assert not np.allclose(np.asarray(out1)[:, :, half:],
                           np.asarray(out2)[:, :, half:])


def test_flash_seq_len_isolates_padding():
    """Junk past seq_lens must not affect valid rows (batch isolation)."""
    B, H, KV, S, HD = 2, 4, 2, 128, 32
    q = _rand(3, (B, H, S, HD))
    k = _rand(4, (B, KV, S, HD))
    v = _rand(5, (B, KV, S, HD))
    lens = jnp.asarray([64, 128], jnp.int32)
    out1 = flash_attention(q, k, v, lens, interpret=True)
    k2 = k.at[0, :, 64:].set(1e4)
    v2 = v.at[0, :, 64:].set(-1e4)
    out2 = flash_attention(q, k2, v2, lens, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1)[0, :, :64], np.asarray(out2)[0, :, :64],
        rtol=1e-5, atol=1e-5,
    )
    # row 1 (full length) untouched by row 0's corruption
    np.testing.assert_allclose(
        np.asarray(out1)[1], np.asarray(out2)[1], rtol=1e-5, atol=1e-5)


def test_flash_gqa_equals_repeated_mha():
    """GQA with KV heads repeated g× must equal MHA with explicit copies."""
    B, KV, g, S, HD = 1, 2, 2, 64, 32
    H = KV * g
    q = _rand(6, (B, H, S, HD))
    k = _rand(7, (B, KV, S, HD))
    v = _rand(8, (B, KV, S, HD))
    lens = jnp.asarray([S], jnp.int32)
    out_gqa = flash_attention(q, k, v, lens, interpret=True)
    k_full = jnp.repeat(k, g, axis=1)
    v_full = jnp.repeat(v, g, axis=1)
    out_mha = flash_attention(q, k_full, v_full, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out_gqa), np.asarray(out_mha),
                               rtol=RTOL, atol=ATOL)


def test_flash_logsumexp_stable_at_large_logits():
    """Blockwise softmax must not overflow when scores are large."""
    B, H, KV, S, HD = 1, 2, 2, 128, 32
    q = 30.0 * _rand(9, (B, H, S, HD))
    k = 30.0 * _rand(10, (B, KV, S, HD))
    v = _rand(11, (B, KV, S, HD))
    lens = jnp.asarray([S], jnp.int32)
    out = np.asarray(flash_attention(q, k, v, lens, interpret=True))
    assert np.isfinite(out).all()
    ref = np.asarray(flash_attention_reference(q, k, v, lens))
    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-3)


def test_flash_vjp_matches_reference_grads_masked():
    """Pallas backward vs autodiff-of-reference, under ragged seq_lens."""
    B, H, KV, S, HD = 2, 2, 2, 64, 32
    q = _rand(12, (B, H, S, HD))
    k = _rand(13, (B, KV, S, HD))
    v = _rand(14, (B, KV, S, HD))
    lens = jnp.asarray([40, 64], jnp.int32)

    def valid_sum(fn):
        def f(q, k, v):
            out = fn(q, k, v, lens)
            mask = (jnp.arange(S)[None, :] < lens[:, None])
            return jnp.sum(out * mask[:, None, :, None])
        return f

    g1 = jax.grad(valid_sum(
        lambda q, k, v, l: flash_attention(q, k, v, l, interpret=True)),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(valid_sum(flash_attention_reference),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        # padded rows may hold junk grads; compare valid region only
        mask = (np.arange(S)[None, :] < np.asarray(lens)[:, None])
        m = mask[:, None, :, None]
        np.testing.assert_allclose(a * m, b * m, rtol=5e-3, atol=5e-3,
                                   err_msg=f"d{name}")


# ---------------------------------------------------------------------------
# paged attention: indirection + trash page + update semantics
# ---------------------------------------------------------------------------

def _paged_setup(seed, B=2, KV=2, H=4, HD=32, PAGE=8, NPAGES=32, MP=8):
    q = _rand(seed, (B, H, HD))
    k_pages = _rand(seed + 1, (KV, NPAGES, PAGE, HD))
    v_pages = _rand(seed + 2, (KV, NPAGES, PAGE, HD))
    bt = jnp.asarray(
        [[1, 2, 3, 4, 5, 6, 7, 8], [9, 10, 11, 12, 13, 14, 15, 16]],
        jnp.int32)[:B]
    lens = jnp.asarray([30, 46], jnp.int32)[:B]
    return q, k_pages, v_pages, bt, lens


def test_paged_page_permutation_invariance():
    """The same KV content reached through permuted page ids must produce
    identical output — the block table is pure indirection."""
    q, k_pages, v_pages, bt, lens = _paged_setup(20)
    out1 = paged_attention(q, k_pages, v_pages, bt, lens, interpret=True)

    # move page contents 1..8 -> 21..28 for row 0 and update its table
    perm = jnp.asarray([21, 22, 23, 24, 25, 26, 27, 28], jnp.int32)
    k2, v2 = k_pages, v_pages
    for src, dst in zip(range(1, 9), list(np.asarray(perm))):
        k2 = k2.at[:, dst].set(k_pages[:, src])
        v2 = v2.at[:, dst].set(v_pages[:, src])
    bt2 = bt.at[0].set(perm)
    out2 = paged_attention(q, k2, v2, bt2, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_paged_unused_table_entries_ignored():
    """Entries past the sequence's last page (conventionally 0, the trash
    page) must not affect the output, whatever they point at."""
    q, k_pages, v_pages, bt, lens = _paged_setup(30)
    k_pages = k_pages.at[:, 0].set(1e4)   # poison the trash page
    v_pages = v_pages.at[:, 0].set(-1e4)
    out1 = paged_attention(q, k_pages, v_pages, bt, lens, interpret=True)
    # row 0 uses ceil(30/8)=4 pages; repoint its unused tail at a poisoned
    # arbitrary page
    bt2 = bt.at[0, 4:].set(0)
    out2 = paged_attention(q, k_pages, v_pages, bt2, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)
    ref = paged_attention_reference(q, k_pages, v_pages, bt, lens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


def test_paged_update_equals_write_then_attend():
    """The fused write+attend kernel must equal the two-step route and
    touch ONLY the target slot of the page pools."""
    from deepvision_tpu.engine.kv_cache import write_decode_token

    q, k_pages, v_pages, bt, lens = _paged_setup(40)
    B, KV, HD = q.shape[0], k_pages.shape[0], q.shape[2]
    new_k = _rand(50, (B, KV, HD))
    new_v = _rand(51, (B, KV, HD))

    out_f, kf, vf = paged_attention_update(
        q, new_k, new_v, k_pages, v_pages, bt, lens, interpret=True)

    positions = lens - 1
    k2, v2 = write_decode_token(
        k_pages, v_pages, new_k, new_v, bt, positions)
    out_s = paged_attention(q, k2, v2, bt, lens, interpret=True)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(k2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(v2),
                               rtol=1e-6, atol=1e-6)
    # exactly one slot per (batch, kv-head) changed in each pool
    diff = (np.asarray(kf) != np.asarray(k_pages)).any(axis=-1)
    assert diff.sum() == B * KV, f"expected {B * KV} written slots"


def test_paged_update_len1_first_token():
    """seq_len=1: the very first decode token attends only to itself."""
    B, KV, H, HD, PAGE, NPAGES = 1, 2, 4, 32, 8, 8
    q = _rand(60, (B, H, HD))
    k_pages = jnp.zeros((KV, NPAGES, PAGE, HD), jnp.float32)
    v_pages = jnp.zeros((KV, NPAGES, PAGE, HD), jnp.float32)
    new_k = _rand(61, (B, KV, HD))
    new_v = _rand(62, (B, KV, HD))
    bt = jnp.asarray([[1, 0, 0, 0]], jnp.int32)
    lens = jnp.asarray([1], jnp.int32)
    out, _, _ = paged_attention_update(
        q, new_k, new_v, k_pages, v_pages, bt, lens, interpret=True)
    # attending to a single position = its value, replicated per group
    g = H // KV
    expect = jnp.repeat(new_v, g, axis=1)  # [B, H, HD]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=RTOL, atol=ATOL)


def test_chunk_attention_consistent_with_decode_path():
    """Prefilling a context chunk-wise then decoding one more token must
    see exactly the same KV as the chunk kernel saw (cross-kernel
    consistency: paged_chunk_attention vs paged_attention)."""
    B, KV, H, HD, PAGE, NPAGES, MP = 1, 2, 4, 32, 8, 16, 8
    C = 16
    total = 16
    k_pages = _rand(70, (KV, NPAGES, PAGE, HD))
    v_pages = _rand(71, (KV, NPAGES, PAGE, HD))
    bt = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    q_chunk = _rand(72, (B, C, H, HD))
    starts = jnp.asarray([0], jnp.int32)
    lens = jnp.asarray([total], jnp.int32)
    out_chunk = paged_chunk_attention(
        q_chunk, k_pages, v_pages, bt, starts, lens, interpret=True)
    # the LAST row of the chunk must equal a decode step at position
    # total-1 over the same pools
    out_dec = paged_attention(
        q_chunk[:, -1], k_pages, v_pages, bt, lens, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_chunk)[:, -1], np.asarray(out_dec),
        rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# sampling invariants
# ---------------------------------------------------------------------------

def _sample(logits, temp, top_k, top_p, seed=0):
    B = logits.shape[0]
    return sample_tokens(
        logits, jax.random.PRNGKey(seed),
        jnp.full((B,), temp, jnp.float32),
        jnp.full((B,), top_k, jnp.int32),
        jnp.full((B,), top_p, jnp.float32))


def test_sampling_greedy_is_argmax():
    logits = _rand(80, (4, 1000))
    toks = _sample(logits, 0.0, 0, 1.0)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_sampling_topk_never_escapes_candidates():
    logits = _rand(81, (2, 500))
    top8 = set(np.asarray(jax.lax.top_k(logits, 8)[1]).flatten().tolist())
    for seed in range(20):
        toks = np.asarray(_sample(logits, 1.5, 8, 1.0, seed=seed))
        assert set(toks.tolist()) <= top8


def test_sampling_top_p_collapses_to_greedy_on_peaked_dist():
    # one token holds ~all probability mass: nucleus p=0.5 keeps only it
    logits = jnp.full((2, 100), -10.0).at[:, 7].set(10.0)
    for seed in range(10):
        toks = np.asarray(_sample(logits, 1.0, 0, 0.5, seed=seed))
        assert (toks == 7).all()


def test_sampling_temperature_flattens_distribution():
    """High temperature must visit strictly more distinct tokens than
    low temperature on the same peaked logits."""
    logits = jnp.concatenate(
        [jnp.asarray([[5.0, 4.5, 4.0]]), jnp.zeros((1, 97))], axis=1)
    lo = {int(np.asarray(_sample(logits, 0.2, 0, 1.0, seed=s))[0])
          for s in range(40)}
    hi = {int(np.asarray(_sample(logits, 3.0, 0, 1.0, seed=s))[0])
          for s in range(40)}
    assert len(hi) > len(lo)


def test_sampling_per_row_controls_are_independent():
    """Row-wise temperature: row 0 greedy, row 1 random — row 0 must be
    exactly argmax regardless of row 1's setting."""
    logits = _rand(82, (2, 200))
    toks = sample_tokens(
        logits, jax.random.PRNGKey(3),
        jnp.asarray([0.0, 2.0], jnp.float32),
        jnp.asarray([0, 0], jnp.int32),
        jnp.asarray([1.0, 1.0], jnp.float32))
    assert int(np.asarray(toks)[0]) == int(np.asarray(jnp.argmax(logits[0])))


def test_paged_update_grid_modes_agree():
    """grid=(B,) (flattened kv x page loop, PERF_NOTES round-3 decode
    anatomy) and the original grid=(B, KV) must be the same function:
    identical outputs AND identical pool writes, including ragged lens
    and GQA groups."""
    from deepvision_tpu.engine.kv_cache import write_decode_token

    q, k_pages, v_pages, bt, lens = _paged_setup(80, B=2, KV=2, H=8)
    B, KV, HD = q.shape[0], k_pages.shape[0], q.shape[2]
    new_k = _rand(81, (B, KV, HD))
    new_v = _rand(82, (B, KV, HD))

    out_b, kb, vb = paged_attention_update(
        q, new_k, new_v, k_pages, v_pages, bt, lens, interpret=True,
        grid_mode="b")
    out_g, kg, vg = paged_attention_update(
        q, new_k, new_v, k_pages, v_pages, bt, lens, interpret=True,
        grid_mode="bkv")
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_g),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(kg),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vg),
                               rtol=1e-6, atol=1e-6)
    # and both equal the unfused two-step route
    k2, v2 = write_decode_token(
        k_pages, v_pages, new_k, new_v, bt, lens - 1)
    out_s = paged_attention(q, k2, v2, bt, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s),
                               rtol=RTOL, atol=ATOL)
