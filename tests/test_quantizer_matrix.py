"""Format-matrix coverage in the reference's unit-test style: every preset's
quantizer semantics on controlled tensors (test_tensor_quantizer.py analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.ops import numerics
from tensorrt_model_optimizer_tpu.quant import (
    QuantizerConfig, collect, init_state, quantize,
)
from tensorrt_model_optimizer_tpu.quant import config as qc


def _roundtrip(cfg, x):
    st = collect(x, cfg, init_state(cfg, x.shape))
    return quantize(x, cfg, st)


class TestFormatMatrix:
    @pytest.mark.parametrize("unit", [
        qc.INT8_PER_CHANNEL, qc.INT8_PER_TENSOR, qc.INT4_PER_BLOCK_64,
        qc.FP8_PER_TENSOR, qc.FP8_PER_CHANNEL, qc.NVFP4_BLOCK16,
        qc.MXFP4_BLOCK32, qc.MXFP6_E3M2_BLOCK32, qc.MXFP8_E4M3_BLOCK32,
        qc.NF4_BLOCK64, qc.FP8_2D_BLOCKWISE_128,
    ])
    def test_idempotent(self, unit):
        """Quantize(Quantize(x)) == Quantize(x) — the grid is a fixed point."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        st = collect(x, unit, init_state(unit, x.shape))
        y1 = quantize(x, unit, st)
        y2 = quantize(y1, unit, st)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("unit,bound", [
        (qc.INT8_PER_TENSOR, 1/254.), (qc.INT4_PER_BLOCK_64, 1/14.),
        (qc.FP8_PER_TENSOR, 1/16.), (qc.NVFP4_BLOCK16, 1/4.),
    ])
    def test_error_bound(self, unit, bound):
        """Max relative-to-amax quantization error within the format's grid."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        y = _roundtrip(unit, x)
        err = np.abs(np.asarray(y) - np.asarray(x))
        amax = float(jnp.max(jnp.abs(x)))
        assert err.max() <= amax * bound * 1.05

    def test_per_token_dynamic_rowwise(self):
        x = np.ones((4, 64), np.float32)
        x[2] *= 100.0  # one hot row must not affect others' scales
        y = np.asarray(quantize(jnp.asarray(x), qc.FP8_PER_TOKEN_DYNAMIC, None))
        np.testing.assert_allclose(y[0], x[0], rtol=1e-6)  # exact: row amax maps on grid
        np.testing.assert_allclose(y[2], x[2], rtol=1e-6)

    def test_fp8_2d_block(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
        cfg = qc.FP8_2D_BLOCKWISE_128
        st = collect(x, cfg, init_state(cfg, x.shape))
        assert st.amax.shape == (2, 2)
        y = quantize(x, cfg, st)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_narrow_range(self):
        cfg = QuantizerConfig(num_bits=8, narrow_range=True)
        x = jnp.asarray([-1.0, 1.0])
        st = collect(x, cfg, init_state(cfg, (2,)))
        y = np.asarray(quantize(x, cfg, st))
        np.testing.assert_allclose(y, [-1.0, 1.0], rtol=1e-6)

    def test_int8_per_token_dynamic(self):
        x = np.ones((3, 32), np.float32) * np.asarray([[1.], [10.], [100.]])
        y = np.asarray(quantize(jnp.asarray(x), qc.INT8_PER_TOKEN_DYNAMIC, None))
        np.testing.assert_allclose(y, x, rtol=1e-5)  # row maxes exactly on grid

    def test_w4a8_order(self):
        """Sequential W4A8: result lies on the FP8 grid of the INT4 output."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        cfg = qc.W4A8_SEQUENTIAL
        st = collect(x, cfg, init_state(cfg, x.shape))
        y = quantize(x, cfg, st)
        # re-applying only the FP8 child leaves y unchanged
        from tensorrt_model_optimizer_tpu.quant.quantizer import QuantizerState

        y2 = quantize(y, cfg.sequential[1], QuantizerState(amax=st.amax[1]))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)


class TestReferenceDictCompat:
    """Configs written in the reference's dict style must coerce."""

    def test_nvfp4_dict(self):
        from tensorrt_model_optimizer_tpu.quant import make_config

        cfg = make_config({
            "*weight_quantizer": {
                "num_bits": (2, 1),
                "block_sizes": {-1: 16, "type": "dynamic", "scale_bits": (4, 3)},
            },
            "*input_quantizer": {"enable": False},
        })
        w = cfg.resolve("x.weight_quantizer")
        assert w.num_bits == (2, 1) and w.block.scale_bits == (4, 3)
        assert w.block.dynamic

    def test_kv_cast_dict(self):
        from tensorrt_model_optimizer_tpu.quant import make_config

        cfg = make_config({
            "*k_bmm_quantizer": {"num_bits": (4, 3), "constant_amax": 448.0},
        })
        k = cfg.resolve("a.k_bmm_quantizer")
        st = init_state(k, (4,))
        assert float(st.amax) == 448.0


class TestEveryPreset:
    """Every registered preset must quantize the tiny model end to end."""

    @pytest.mark.parametrize("preset", sorted(qc.PRESETS))
    def test_preset_quantizes_and_runs(self, preset):
        from tensorrt_model_optimizer_tpu.models import llama
        from tensorrt_model_optimizer_tpu.quant import ptq

        cfg = llama.LlamaConfig.tiny(num_hidden_layers=2)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        batches = [jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))]
        model = ptq.quantize(cfg, params, preset, batches)
        logits, _, _ = model.forward(batches[0])
        assert np.isfinite(np.asarray(logits)).all(), preset
        ref, _, _ = llama.forward(cfg, params, batches[0])
        corr = np.corrcoef(np.asarray(logits).ravel(), np.asarray(ref).ravel())[0, 1]
        assert corr > 0.8, (preset, corr)
