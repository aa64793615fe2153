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


class TestPagedPrefillKernel:
    def _setup(self, B=2, T=8, ctx=(13, 5), n_kv=2, rep=2, page=8, hd=32):
        rng = np.random.default_rng(0)
        nH = n_kv * rep
        maxP = 4
        n_pages = 1 + B * maxP
        k_pages = jnp.asarray(rng.normal(size=(n_pages, n_kv, page, hd)).astype(np.float32))
        v_pages = jnp.asarray(rng.normal(size=(n_pages, n_kv, page, hd)).astype(np.float32))
        bt = np.full((B, maxP), -1, np.int32)
        for b in range(B):
            for i in range((ctx[b] + page - 1) // page):
                bt[b, i] = 1 + b * maxP + i
        q = jnp.asarray(rng.normal(size=(B, T, nH, hd)).astype(np.float32))
        ck = jnp.asarray(rng.normal(size=(B, T, n_kv, hd)).astype(np.float32))
        cv = jnp.asarray(rng.normal(size=(B, T, n_kv, hd)).astype(np.float32))
        lens = jnp.asarray(list(ctx), jnp.int32)
        return q, k_pages, v_pages, jnp.asarray(bt), lens, ck, cv, page, rep

    def _reference(self, q, k_pages, v_pages, bt, lens, ck, cv, page, rep):
        B, T, nH, hd = q.shape
        outs = []
        for b in range(B):
            L = int(lens[b])
            ks, vs = [], []
            for i in range((L + page - 1) // page):
                pid = int(bt[b, i])
                n = min(page, L - i * page)
                ks.append(np.asarray(k_pages[pid, :, :n]))  # [n_kv, n, hd]
                vs.append(np.asarray(v_pages[pid, :, :n]))
            kc = np.concatenate(ks, axis=1) if ks else np.zeros((k_pages.shape[1], 0, hd))
            vc = np.concatenate(vs, axis=1) if vs else kc
            # append chunk
            kc = np.concatenate([kc, np.asarray(ck[b]).transpose(1, 0, 2)], axis=1)
            vc = np.concatenate([vc, np.asarray(cv[b]).transpose(1, 0, 2)], axis=1)
            kc = np.repeat(kc, rep, axis=0)  # [nH, S, hd]
            vc = np.repeat(vc, rep, axis=0)
            qb = np.asarray(q[b]).transpose(1, 0, 2)  # [nH, T, hd]
            s = np.einsum("ntd,nsd->nts", qb, kc) / np.sqrt(hd)
            S = kc.shape[1]
            for t in range(T):
                s[:, t, L + t + 1:] = -1e30  # causal over chunk part
            p = np.exp(s - s.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            o = np.einsum("nts,nsd->ntd", p, vc)
            outs.append(o.transpose(1, 0, 2))
        return np.stack(outs)

    def test_matches_reference(self):
        from tensorrt_model_optimizer_tpu.ops.pallas import paged_attention as pa

        args = self._setup()
        out = pa.paged_attention_prefill(*args[:7])
        ref = self._reference(*args)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    def test_zero_context(self):
        """Pure prefill from scratch: only the causal chunk contributes."""
        from tensorrt_model_optimizer_tpu.ops.pallas import paged_attention as pa

        args = list(self._setup(ctx=(0, 0)))
        out = pa.paged_attention_prefill(*args[:7])
        ref = self._reference(*args)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


class TestSkipSoftmaxFlash:
    def test_matches_dense_attention(self):
        from tensorrt_model_optimizer_tpu.ops.pallas import sparse_attention as sa

        rng = np.random.default_rng(0)
        BH, S, d = 4, 64, 32
        q = jnp.asarray(rng.normal(size=(BH, S, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(BH, S, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(BH, S, d)).astype(np.float32))
        out, keep = sa.skip_softmax_flash(q, k, v, threshold=1e-9,
                                          block_q=16, block_k=16)
        s = np.einsum("bqd,bkd->bqk", np.asarray(q), np.asarray(k)) / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bqk,bkd->bqd", p, np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
        assert keep.all()  # tiny threshold -> nothing skipped

    def test_blocks_actually_skip_and_error_bounded(self):
        from tensorrt_model_optimizer_tpu.ops.pallas import sparse_attention as sa

        rng = np.random.default_rng(1)
        BH, S, d = 2, 128, 32
        q = jnp.asarray(rng.normal(size=(BH, S, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(BH, S, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(BH, S, d)).astype(np.float32))
        # spike: concentrate attention so off-spike blocks are negligible
        q = q.at[:, :, 0].set(8.0)
        k = k.at[:, :16, 0].set(8.0)
        out, keep = sa.skip_softmax_flash(q, k, v, threshold=1e-2,
                                          block_q=16, block_k=16)
        frac_kept = float(np.asarray(keep).mean())
        assert frac_kept < 1.0, "no block was skipped"
        dense, keep_all = sa.skip_softmax_flash(q, k, v, threshold=1e-30,
                                                block_q=16, block_k=16)
        rel = float(jnp.abs(out - dense).max() / (jnp.abs(dense).max() + 1e-9))
        assert rel < 5e-2, rel
