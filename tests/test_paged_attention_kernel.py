"""Pallas paged-attention kernel vs jnp reference (interpret mode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.ops.pallas import paged_attention as pa


def ref_paged_attention(q, k_pages, v_pages, block_table, seq_lens):
    B, n_heads, hd = q.shape
    _, n_kv, page, _ = k_pages.shape
    rep = n_heads // n_kv
    outs = []
    for b in range(B):
        S = int(seq_lens[b])
        ks, vs = [], []
        for i in range((S + page - 1) // page):
            pid = int(block_table[b, i])
            ks.append(np.asarray(k_pages[pid]).transpose(1, 0, 2))
            vs.append(np.asarray(v_pages[pid]).transpose(1, 0, 2))
        k = np.concatenate(ks, axis=0)[:S]  # [S, n_kv, hd]
        v = np.concatenate(vs, axis=0)[:S]
        k = np.repeat(k, rep, axis=1)  # [S, n_heads, hd]
        v = np.repeat(v, rep, axis=1)
        qb = np.asarray(q[b])  # [n_heads, hd]
        s = np.einsum("nd,snd->ns", qb, k) / math.sqrt(hd)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        outs.append(np.einsum("ns,snd->nd", p, v))
    return np.stack(outs)


@pytest.mark.parametrize("seq_lens", [[33, 7], [16, 64]])
def test_kernel_matches_reference(seq_lens):
    rng = np.random.default_rng(0)
    B, n_heads, n_kv, hd, page, n_pages, maxP = 2, 4, 2, 16, 16, 12, 4
    q = jnp.asarray(rng.normal(size=(B, n_heads, hd)).astype(np.float32))
    k_pages = jnp.asarray(rng.normal(size=(n_pages, n_kv, page, hd)).astype(np.float32))
    v_pages = jnp.asarray(rng.normal(size=(n_pages, n_kv, page, hd)).astype(np.float32))
    # distinct pages per sequence
    bt = np.full((B, maxP), -1, np.int32)
    bt[0, :4] = [3, 5, 7, 9]
    bt[1, :4] = [2, 4, 6, 8]
    lens = np.asarray(seq_lens, np.int32)
    out = pa.paged_attention_decode(
        q, k_pages, v_pages, jnp.asarray(bt), jnp.asarray(lens))
    ref = ref_paged_attention(q, k_pages, v_pages, bt, lens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_gqa_repeat():
    rng = np.random.default_rng(1)
    B, n_heads, n_kv, hd, page = 1, 8, 2, 32, 8
    q = jnp.asarray(rng.normal(size=(B, n_heads, hd)).astype(np.float32))
    k_pages = jnp.asarray(rng.normal(size=(4, n_kv, page, hd)).astype(np.float32))
    v_pages = jnp.asarray(rng.normal(size=(4, n_kv, page, hd)).astype(np.float32))
    bt = np.asarray([[1, 2, -1, -1]], np.int32)
    lens = np.asarray([13], np.int32)
    out = pa.paged_attention_decode(q, k_pages, v_pages, jnp.asarray(bt), jnp.asarray(lens))
    ref = ref_paged_attention(q, k_pages, v_pages, bt, lens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
