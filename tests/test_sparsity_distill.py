"""Sparsity (N:M magnitude, SparseGPT) and distillation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.distill import distillation, losses
from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.sparsity import magnitude, sparsegpt, sparsify


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


class TestMagnitude:
    def test_2_4_pattern(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
        mask = magnitude.nm_mask(w, 2, 4)
        m = np.asarray(mask).reshape(8, 8, 4)
        assert np.all(m.sum(-1) == 2)
        # kept entries are the largest-magnitude in each group
        wg = np.abs(np.asarray(w)).reshape(8, 8, 4)
        kept_min = np.where(m, wg, np.inf).min(-1)
        dropped_max = np.where(~m, wg, -np.inf).max(-1)
        assert np.all(kept_min >= dropped_max - 1e-6)

    def test_sparsity_ratio(self):
        w = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32))
        mask = magnitude.nm_mask(w, 2, 4)
        assert magnitude.sparsity_ratio(mask) == pytest.approx(0.5)


class TestSparseGPT:
    def test_mask_pattern_and_better_than_magnitude(self):
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
        # correlated inputs make reconstruction matter
        X = X.at[:, 1].set(X[:, 0] * 0.9 + 0.1 * X[:, 1])
        w = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
        H = sparsegpt.hessian_from_acts(X)
        w_sg, mask = sparsegpt.sparsegpt_prune(w, H, 2, 4, block=8)
        m = np.asarray(mask).reshape(8, 8, 4)
        assert np.all(m.sum(-1) == 2)
        # output reconstruction error <= plain magnitude pruning
        w_mag = magnitude.apply_mask(w, magnitude.nm_mask(w, 2, 4))
        ref = X @ w.T
        e_sg = float(jnp.mean((X @ w_sg.T - ref) ** 2))
        e_mag = float(jnp.mean((X @ w_mag.T - ref) ** 2))
        assert e_sg <= e_mag * 1.05

    def test_model_sparsify(self, tiny):
        cfg, params, batches = tiny
        sp, masks = sparsify.sparsify(cfg, params, "magnitude", (2, 4))
        assert magnitude.sparsity_ratio(masks["mlp.gate_proj"]) == pytest.approx(0.5)
        logits, _, _ = llama.forward(cfg, sp, batches[0])
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_model_sparsegpt(self, tiny):
        cfg, params, batches = tiny
        sp, masks = sparsify.sparsify(cfg, params, "sparsegpt", (2, 4), batches,
                                      capture_tokens=32)
        assert magnitude.sparsity_ratio(masks["mlp.down_proj"]) == pytest.approx(0.5)
        logits, _, _ = llama.forward(cfg, sp, batches[0])
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_reapply_after_update(self, tiny):
        cfg, params, batches = tiny
        sp, masks = sparsify.sparsify(cfg, params, "magnitude")
        perturbed = jax.tree.map(lambda a: a + 0.01 if a.dtype == jnp.float32 else a, sp)
        back = sparsify.reapply(perturbed, masks)
        w = np.asarray(back["layers"]["mlp.gate_proj"])
        m = np.asarray(masks["mlp.gate_proj"])
        assert np.all(w[~m] == 0)


class TestDistill:
    def test_kl_zero_when_identical(self):
        logits = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 16)).astype(np.float32))
        assert float(losses.logits_kl(logits, logits)) == pytest.approx(0.0, abs=1e-6)

    def test_kl_positive(self):
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32))
        assert float(losses.logits_kl(a, b)) > 0

    def test_distill_step_reduces_kd_loss(self, tiny):
        cfg, params, batches = tiny
        teacher = params
        student = llama.init_params(cfg, jax.random.PRNGKey(7))
        step = jax.jit(distillation.make_distill_step(cfg, distillation.KDConfig(kd_weight=1.0), lr=5e-2))
        tokens = batches[0]
        s, l0 = step(student, teacher, tokens)
        for _ in range(5):
            s, l = step(s, teacher, tokens)
        assert float(l) < float(l0)

    def test_qad_step(self, tiny):
        from tensorrt_model_optimizer_tpu.quant import get_preset

        cfg, params, batches = tiny
        layout = llama.build_layout(cfg, get_preset("FP8_DEFAULT_CFG"))
        qs = llama.init_quant_state(cfg, layout)
        _, qs, _ = llama.forward(cfg, params, batches[0], layout=layout, qstate=qs, calib=True)
        step = jax.jit(distillation.make_distill_step(cfg, layout=layout))
        s, loss = step(params, params, batches[0], qs)
        assert np.isfinite(float(loss))


class TestAttentionSparsity:
    def _qkv(self):
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(rng.normal(size=(2, 32, 4, 16)).astype(np.float32))
        return mk(), mk(), mk()

    def test_threshold_zero_is_exact(self):
        from tensorrt_model_optimizer_tpu.sparsity import attention_sparsity as asp
        import math

        q, k, v = self._qkv()
        out, sp = asp.skip_softmax_attention(q, k, v, threshold=1e-30)
        # reference full attention
        s = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(16)
        cm = jnp.where(jnp.arange(32)[None, :] <= jnp.arange(32)[:, None], 0.0, -np.inf)
        p = jax.nn.softmax(s + cm[None, None], axis=-1)
        ref = jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
        assert float(sp) == 0.0

    def test_higher_threshold_more_sparsity(self):
        from tensorrt_model_optimizer_tpu.sparsity import attention_sparsity as asp

        q, k, v = self._qkv()
        _, sp_lo = asp.skip_softmax_attention(q, k, v, 1e-6, block_q=8, block_k=8)
        _, sp_hi = asp.skip_softmax_attention(q, k, v, 0.5, block_q=8, block_k=8)
        assert float(sp_hi) > float(sp_lo)

    def test_calibrate_threshold(self):
        from tensorrt_model_optimizer_tpu.sparsity import attention_sparsity as asp

        q, k, v = self._qkv()
        th = asp.calibrate_threshold(q, k, v, target_sparsity=0.3)
        _, sp = asp.skip_softmax_attention(q, k, v, th)
        assert float(sp) <= 0.3 + 1e-6


class TestLossBalancers:
    def test_static(self):
        from tensorrt_model_optimizer_tpu.distill import loss_balancers as lb

        bal = lb.StaticLossBalancer(weights=(0.7, 0.3))
        out = bal([jnp.asarray(1.0), jnp.asarray(2.0)])
        assert float(out) == pytest.approx(1.3)

    def test_dynamic_normalizes_scales(self):
        from tensorrt_model_optimizer_tpu.distill import loss_balancers as lb

        st = lb.init_dynamic_balancer(2)
        # one term 1000x larger; after a few updates contributions equalize
        for _ in range(300):
            total, st = lb.dynamic_balance(
                [jnp.asarray(1000.0), jnp.asarray(1.0)], st, decay=0.9)
        ratio = float(st.ema[0] / st.ema[1])
        assert 500 < ratio < 2000
        assert float(total) == pytest.approx(1.0, rel=0.2)


class TestVSA:
    def test_full_topk_matches_dense(self):
        from tensorrt_model_optimizer_tpu.sparsity import attention_sparsity as AS

        rng = np.random.default_rng(0)
        B, S, n, d = 2, 64, 2, 16
        q = jnp.asarray(rng.normal(size=(B, S, n, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, n, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, n, d)).astype(np.float32))
        out, keep = AS.vsa_attention(q, k, v, block_size=16, top_k_ratio=1.0,
                                     gate_compress=0.0)
        s = np.einsum("bqnd,bknd->bnqk", np.asarray(q), np.asarray(k)) / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bnqk,bknd->bqnd", p, np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
        assert keep.all()

    def test_sparse_branch_selects_topk(self):
        from tensorrt_model_optimizer_tpu.sparsity import attention_sparsity as AS

        rng = np.random.default_rng(1)
        B, S, n, d = 1, 64, 1, 16
        q = jnp.asarray(rng.normal(size=(B, S, n, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, n, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, n, d)).astype(np.float32))
        out, keep = AS.vsa_attention(q, k, v, block_size=16, top_k_ratio=0.5,
                                     gate_compress=0.3)
        nB = 4
        counts = np.asarray(keep).sum(-1)
        assert (counts >= nB // 2).all()  # at least top_k kept (ties may add)
        assert np.isfinite(np.asarray(out)).all()

    def test_tile_3d_roundtrip(self):
        from tensorrt_model_optimizer_tpu.sparsity import attention_sparsity as AS

        perm = np.asarray(AS.tile_3d_indices((4, 4, 4), (2, 2, 2)))
        assert sorted(perm.tolist()) == list(range(64))
        # first tile = the (2,2,2) corner block of the video volume
        t, h, w = np.unravel_index(perm[:8], (4, 4, 4))
        assert t.max() < 2 and h.max() < 2 and w.max() < 2


def test_moe_family_qad_step_reduces_loss():
    """QAD (distill with fake quant) over a registry family forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.distill import distillation as dd
    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import get_preset

    cfg = mixtral.MixtralConfig.tiny(capacity_factor=4.0)
    teacher = mixtral.init_params(cfg, jax.random.PRNGKey(40))
    student = jax.tree.map(lambda a: a + 0.01, teacher)
    layout = mixtral.build_layout(cfg, get_preset("FP8_DEFAULT_CFG"))
    qs = mixtral.init_quant_state(cfg, layout)
    toks = jnp.asarray(np.random.default_rng(40).integers(0, 256, (4, 17)))
    _, qs = mixtral.forward(cfg, student, toks[:, :-1], layout=layout, qstate=qs, calib=True)
    step = jax.jit(dd.make_distill_step(
        cfg, lr=1e-3, layout=layout, forward_fn=mixtral.forward))
    losses = []
    for _ in range(6):
        student, loss = step(student, teacher, toks, qs)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
