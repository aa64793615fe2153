"""Opt-framework tests: mode registry, save/restore roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.opt import state as opt_state
from tensorrt_model_optimizer_tpu.opt.mode import ModeRegistry
from tensorrt_model_optimizer_tpu.quant import get_preset, ptq
from tensorrt_model_optimizer_tpu.quant import config as qconfig


@pytest.fixture(scope="module")
def quantized():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16))) for _ in range(2)]
    return ptq.quantize(cfg, params, "INT8_SMOOTHQUANT_CFG", batches), batches


def test_mode_registered():
    desc = ModeRegistry.get_global("quantize")
    assert desc.name == "quantize"


def test_config_roundtrip():
    for name in qconfig.choices():
        cfg = get_preset(name)
        d = qconfig.config_to_dict(cfg)
        back = qconfig.config_from_dict(d)
        assert back.rules == cfg.rules, name
        assert back.algorithm == cfg.algorithm


def test_save_restore_roundtrip(quantized, tmp_path):
    model, batches = quantized
    ref, _, _ = model.forward(batches[0])
    opt_state.save(model, str(tmp_path / "ckpt"))
    restored = opt_state.restore(str(tmp_path / "ckpt"))
    out, _, _ = restored.forward(batches[0])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
    # pre_quant_scale survived
    pqs = restored.qstate["self_attn.q_proj"]["input"].pre_quant_scale
    assert pqs is not None and np.any(np.asarray(pqs) != 1.0)


def test_restore_with_external_params(quantized, tmp_path):
    model, batches = quantized
    opt_state.save(model, str(tmp_path / "ckpt2"), save_params=False)
    restored = opt_state.restore(str(tmp_path / "ckpt2"), params=model.params)
    out, _, _ = restored.forward(batches[0])
    assert np.all(np.isfinite(np.asarray(out)))


def test_sharded_save_restore(quantized, tmp_path, mesh8):
    """Orbax sharded roundtrip: TP-sharded params save/restore, forward parity."""
    from jax.sharding import NamedSharding

    model, batches = quantized
    ref, _, _ = model.forward(batches[0])
    # shard the params over the mesh before saving
    import dataclasses as dc

    from tensorrt_model_optimizer_tpu.models import llama as lm

    specs = lm.param_specs(model.model_cfg)
    sharded_layers = {
        k: jax.device_put(v, NamedSharding(mesh8, specs["layers"][k]))
        for k, v in model.params["layers"].items()
    }
    params2 = dict(model.params)
    params2["layers"] = sharded_layers
    model2 = dc.replace(model, params=params2)
    opt_state.save_sharded(model2, str(tmp_path / "sharded"))
    restored = opt_state.restore_sharded(str(tmp_path / "sharded"))
    # arrays come back with their saved shardings; run under the mesh
    with jax.set_mesh(mesh8):
        out, _, _ = jax.jit(lambda t: restored.forward(t))(batches[0])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_svdquant_adapters_roundtrip(tmp_path):
    """mto.save/restore must carry the low-rank branch."""
    from tensorrt_model_optimizer_tpu.opt import state as opt_state

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    batches = [jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))]
    model = ptq.quantize(cfg, params, "INT4_SVDQUANT_CFG", batches)
    opt_state.save(model, str(tmp_path))
    restored = opt_state.restore(str(tmp_path))
    assert restored.adapters is not None
    ref, _, _ = model.forward(batches[0])
    out, _, _ = restored.forward(batches[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
