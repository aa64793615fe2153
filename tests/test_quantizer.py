"""Quantizer config/state/forward tests (TensorQuantizer-equivalent coverage)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.ops import numerics
from tensorrt_model_optimizer_tpu.quant import (
    DISABLED,
    QuantizerConfig,
    amax_shape,
    collect,
    get_preset,
    init_state,
    make_config,
    quantize,
)
from tensorrt_model_optimizer_tpu.quant import config as qconfig
from tensorrt_model_optimizer_tpu.quant import quantizer as Q


class TestAmaxShape:
    def test_per_tensor(self):
        assert amax_shape(QuantizerConfig(num_bits=8), (4, 16)) == ()

    def test_per_channel(self):
        assert amax_shape(QuantizerConfig(num_bits=8, axis=(0,)), (4, 16)) == (4, 1)

    def test_block(self):
        cfg = qconfig.INT4_PER_BLOCK_128
        assert amax_shape(cfg, (32, 256)) == (32, 2)

    def test_dynamic_no_state(self):
        assert amax_shape(qconfig.FP8_PER_TOKEN_DYNAMIC, (2, 3, 8)) is None

    def test_nvfp4_keeps_global(self):
        assert amax_shape(qconfig.NVFP4_BLOCK16, (4, 64)) == ()

    def test_disabled(self):
        assert amax_shape(DISABLED, (4,)) is None


class TestCollectQuantize:
    def test_max_collect_running(self):
        cfg = QuantizerConfig(num_bits=8)
        st = init_state(cfg, (4,))
        st = collect(jnp.array([1.0, -3.0, 2.0, 0.0]), cfg, st)
        assert float(st.amax) == 3.0
        st = collect(jnp.array([5.0, 0.0, 0.0, 0.0]), cfg, st)
        assert float(st.amax) == 5.0

    def test_per_channel_collect(self):
        cfg = QuantizerConfig(num_bits=8, axis=(0,))
        x = jnp.asarray(np.array([[1.0, -4.0], [2.0, 0.5]], np.float32))
        st = collect(x, cfg, init_state(cfg, x.shape))
        np.testing.assert_allclose(np.asarray(st.amax), [[4.0], [2.0]])

    def test_quantize_matches_numerics(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
        cfg = QuantizerConfig(num_bits=8)
        st = collect(x, cfg, init_state(cfg, x.shape))
        y = quantize(x, cfg, st)
        ref = numerics.fake_quant_int(x, st.amax, 8)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref))

    def test_dynamic_per_token(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 16)).astype(np.float32))
        y = quantize(x, qconfig.FP8_PER_TOKEN_DYNAMIC, None)
        # each token's max must be representable exactly (maps to 448 grid point)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_nvfp4_site(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 64)).astype(np.float32))
        cfg = qconfig.NVFP4_BLOCK16
        st = collect(x, cfg, init_state(cfg, x.shape))
        assert st.amax.shape == ()
        y = quantize(x, cfg, st)
        ref = numerics.fake_quant_nvfp4(x, 16, st.amax)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref))

    def test_sequential_w4a8(self):
        x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 128)).astype(np.float32))
        cfg = qconfig.W4A8_SEQUENTIAL
        st = init_state(cfg, x.shape)
        assert isinstance(st.amax, tuple) and len(st.amax) == 2
        st = collect(x, cfg, st)
        # child 0: int4 per-block amax; child 1: fp8 per-tensor amax
        assert st.amax[0].shape == (8, 1)
        assert st.amax[1].shape == ()
        y = quantize(x, cfg, st)
        assert np.all(np.isfinite(np.asarray(y)))
        assert not np.allclose(np.asarray(y), np.asarray(x))

    def test_constant_amax_cast_mode(self):
        cfg = qconfig.FP8_KV_CAST
        st = init_state(cfg, (4,))
        assert float(st.amax) == 448.0
        st2 = collect(jnp.array([1000.0, 0, 0, 0]), cfg, st)
        assert float(st2.amax) == 448.0  # collect is a no-op
        y = quantize(jnp.array([500.0]), cfg, st2)
        assert float(y[0]) == 448.0

    def test_disabled_identity(self):
        x = jnp.ones((4,))
        np.testing.assert_array_equal(np.asarray(quantize(x, DISABLED, None)), np.asarray(x))

    def test_pre_quant_scale(self):
        cfg = QuantizerConfig(num_bits=8, pre_quant_scale=True)
        x = jnp.ones((2, 4))
        st = init_state(cfg, x.shape)
        st = st.replace(pre_quant_scale=jnp.full((4,), 2.0), amax=jnp.asarray(2.0))
        y = quantize(x, cfg, st)
        # scaled tensor flows onward (inverse scale lives in the weights)
        np.testing.assert_allclose(np.asarray(y), np.full((2, 4), 2.0), rtol=0.01)

    def test_state_is_pytree(self):
        cfg = QuantizerConfig(num_bits=8)
        st = collect(jnp.ones((4,)), cfg, init_state(cfg, (4,)))
        leaves = jax.tree_util.tree_leaves(st)
        assert len(leaves) == 1

    def test_collect_inside_jit(self):
        cfg = QuantizerConfig(num_bits=8, axis=(0,))

        @jax.jit
        def step(x, st):
            return collect(x, cfg, st)

        x = jnp.ones((4, 8))
        st = step(x, init_state(cfg, (4, 8)))
        np.testing.assert_allclose(np.asarray(st.amax), np.ones((4, 1)))


class TestConfigResolution:
    def test_preset_lookup(self):
        cfg = get_preset("FP8_DEFAULT_CFG")
        w = cfg.resolve("model.layers.0.self_attn.q_proj.weight_quantizer")
        assert w.num_bits == (4, 3) and w.enable

    def test_lm_head_disabled(self):
        cfg = get_preset("FP8_DEFAULT_CFG")
        assert not cfg.resolve("lm_head.weight_quantizer").enable

    def test_kv_rules_override(self):
        cfg = get_preset("NVFP4_KV_CFG")
        k = cfg.resolve("model.layers.0.self_attn.k_bmm_quantizer")
        assert k.enable and k.num_bits == (2, 1)

    def test_order_last_wins(self):
        cfg = make_config({
            "*weight_quantizer": {"num_bits": 8},
            "*q_proj.weight_quantizer": {"enable": False},
        })
        assert cfg.resolve("x.q_proj.weight_quantizer") is DISABLED
        assert cfg.resolve("x.k_proj.weight_quantizer").enable

    def test_effective_bits(self):
        assert qconfig.NVFP4_BLOCK16.fake_bits == pytest.approx(4.5)
        assert qconfig.INT8_PER_CHANNEL.fake_bits == 8.0
        assert qconfig.W4A8_SEQUENTIAL.fake_bits == pytest.approx(4.0)

    def test_reference_dict_coercion(self):
        cfg = make_config({
            "*weight_quantizer": {"num_bits": 4, "block_sizes": {-1: 128}},
            "*input_quantizer": {"enable": False},
        }, algorithm={"method": "awq_lite"})
        w = cfg.resolve("a.weight_quantizer")
        assert w.num_bits == 4 and w.block.sizes == ((-1, 128),)

    def test_all_presets_resolve(self):
        for name in qconfig.choices():
            cfg = get_preset(name)
            for site in [
                "model.layers.3.mlp.down_proj.weight_quantizer",
                "model.layers.3.mlp.down_proj.input_quantizer",
                "model.layers.3.self_attn.k_bmm_quantizer",
                "lm_head.weight_quantizer",
            ]:
                c = cfg.resolve(site)
                assert isinstance(c, QuantizerConfig)


class TestAffineBias:
    """BiasCalibrator semantics (`calib/bias.py`): midrange bias + centered
    amax — asymmetric tensors quantize with far less error."""

    def test_collect_tracks_midrange(self):
        cfg = Q.QuantizerConfig(enable=True, num_bits=(4, 3), bias_corr=True)
        x = jnp.asarray(np.linspace(2.0, 6.0, 64, dtype=np.float32))
        st = Q.collect(x, cfg, Q.QuantizerState())
        assert abs(float(st.bias) - 4.0) < 1e-5
        assert abs(float(st.amax) - 2.0) < 1e-5
        # running update with a wider batch extends the range
        x2 = jnp.asarray(np.linspace(-2.0, 6.0, 64, dtype=np.float32))
        st = Q.collect(x2, cfg, st)
        assert abs(float(st.bias) - 2.0) < 1e-5
        assert abs(float(st.amax) - 4.0) < 1e-5

    def test_affine_beats_symmetric_on_shifted_data(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray((rng.normal(size=(256,)) * 0.1 + 5.0).astype(np.float32))
        sym = Q.QuantizerConfig(enable=True, num_bits=(4, 3))
        aff = dataclasses.replace(sym, bias_corr=True)
        st_s = Q.collect(x, sym, Q.QuantizerState())
        st_a = Q.collect(x, aff, Q.QuantizerState())
        err_s = float(jnp.mean((Q.quantize(x, sym, st_s) - x) ** 2))
        err_a = float(jnp.mean((Q.quantize(x, aff, st_a) - x) ** 2))
        assert err_a < err_s * 0.5, (err_a, err_s)

    def test_affine_kv_preset_end_to_end(self):
        from tensorrt_model_optimizer_tpu.models import llama
        from tensorrt_model_optimizer_tpu.quant import ptq

        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        batches = [jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 16)))]
        model = ptq.quantize(cfg, params, "FP8_KV_AFFINE_CFG", batches)
        st = model.qstate["self_attn.k_bmm"]
        assert st.bias is not None
        logits, _, _ = model.forward(batches[0])
        assert np.isfinite(np.asarray(logits)).all()


def test_custom_backend_registry():
    """register_quant_backend routes fake-quant through the custom fn."""
    calls = []

    def my_backend(x, cfg, state):
        calls.append(cfg.num_bits)
        return x * 0 + 7.0

    Q.register_quant_backend("sevens", my_backend)
    try:
        cfg = Q.QuantizerConfig(enable=True, num_bits=8, backend="sevens")
        out = Q.quantize(jnp.ones((4,)), cfg, Q.QuantizerState())
        np.testing.assert_allclose(np.asarray(out), 7.0)
        assert calls == [8]
        with pytest.raises(KeyError):
            Q.quantize(jnp.ones((4,)),
                       Q.QuantizerConfig(enable=True, num_bits=8, backend="nope"),
                       Q.QuantizerState())
    finally:
        Q.unregister_quant_backend("sevens")
