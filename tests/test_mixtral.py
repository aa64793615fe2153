"""Mixtral MoE tests: routing, quantized experts, EP sharding amax sync."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding

from tensorrt_model_optimizer_tpu.models import llama, mixtral
from tensorrt_model_optimizer_tpu.quant import get_preset


@pytest.fixture(scope="module")
def tiny_moe():
    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    return cfg, params, tokens


def test_forward(tiny_moe):
    cfg, params, tokens = tiny_moe
    logits, _ = mixtral.forward(cfg, params, tokens)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_experts_matter(tiny_moe):
    cfg, params, tokens = tiny_moe
    l1, _ = mixtral.forward(cfg, params, tokens)
    p2 = dict(params)
    p2["layers"] = dict(params["layers"])
    p2["layers"]["moe.gate_proj"] = params["layers"]["moe.gate_proj"] * 2.0
    l2, _ = mixtral.forward(cfg, p2, tokens)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_quantized_moe_ptq(tiny_moe):
    cfg, params, tokens = tiny_moe
    layout = mixtral.build_layout(cfg, get_preset("NVFP4_DEFAULT_CFG"))
    # router excluded by default rules
    assert not layout.get("moe.router.weight").enable
    assert layout.get("moe.gate_proj.weight").enable
    qs = mixtral.init_quant_state(cfg, layout)
    # per-expert amax (GroupedQuantizer semantics)
    assert qs["moe.gate_proj"]["weight"].amax.shape == (
        cfg.num_hidden_layers, cfg.num_experts)
    _, qs = mixtral.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    assert np.all(np.asarray(qs["moe.gate_proj"]["weight"].amax) > 0)
    ref, _ = mixtral.forward(cfg, params, tokens)
    ql, _ = mixtral.forward(cfg, params, tokens, layout=layout, qstate=qs)
    assert np.all(np.isfinite(np.asarray(ql)))
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(ql).ravel())[0, 1]
    assert corr > 0.8


def test_expert_sharded_calibration(tiny_moe, mesh8):
    """EP-sharded experts: calibrated amax equals single-device amax (the
    GSPMD analog of EP amax sync, model_calib.py:248-262)."""
    cfg, params, tokens = tiny_moe
    devices = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("expert", "tensor"))
    layout = mixtral.build_layout(cfg, get_preset("INT8_DEFAULT_CFG"))
    qs = mixtral.init_quant_state(cfg, layout)
    _, qs_ref = mixtral.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    specs = mixtral.param_specs(cfg)
    sharded = dict(params)
    sharded["layers"] = {
        k: jax.device_put(v, NamedSharding(mesh, specs["layers"][k]))
        for k, v in params["layers"].items()
    }
    with jax.set_mesh(mesh):
        _, qs_sh = jax.jit(
            lambda p, t, q: mixtral.forward(cfg, p, t, layout=layout, qstate=q, calib=True)
        )(sharded, tokens, qs)
    np.testing.assert_allclose(
        np.asarray(qs_ref["moe.gate_proj"]["weight"].amax),
        np.asarray(qs_sh["moe.gate_proj"]["weight"].amax),
        rtol=1e-6,
    )


def test_gpt_oss_expert_sharded_calibration(mesh8):
    """GPT-OSS (sinks + sliding masks + biased experts) calibrates
    identically under EP/TP sharding — the family rides mixtral's MoE, so
    GSPMD amax sync must hold with the extra leaves sharded too."""
    from tensorrt_model_optimizer_tpu.models import gpt_oss

    cfg = gpt_oss.GptOssConfig.tiny(num_experts=4, sliding_window=4)
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    devices = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("expert", "tensor"))
    layout = gpt_oss.build_layout(cfg, get_preset("NVFP4_DEFAULT_CFG"))
    qs = gpt_oss.init_quant_state(cfg, layout)
    _, qs_ref = gpt_oss.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    specs = gpt_oss.param_specs(cfg)
    sharded = dict(params)
    sharded["layers"] = {
        k: jax.device_put(v, NamedSharding(mesh, specs["layers"][k]))
        for k, v in params["layers"].items()
    }
    with jax.set_mesh(mesh):
        _, qs_sh = jax.jit(
            lambda p, t, q: gpt_oss.forward(cfg, p, t, layout=layout, qstate=q, calib=True)
        )(sharded, tokens, qs)
    np.testing.assert_allclose(
        np.asarray(qs_ref["moe.gate_proj"]["weight"].amax),
        np.asarray(qs_sh["moe.gate_proj"]["weight"].amax),
        rtol=1e-6,
    )
