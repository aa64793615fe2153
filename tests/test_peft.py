"""LoRA / QLoRA tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.peft import lora


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    return cfg, params, tokens


def test_fresh_adapter_is_identity(tiny):
    cfg, params, tokens = tiny
    ad = lora.init_adapters(cfg, lora.LoRAConfig(rank=4), jax.random.PRNGKey(1))
    ref, _, _ = llama.forward(cfg, params, tokens)
    out, _, _ = llama.forward(cfg, params, tokens, adapters=ad)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)


def test_lora_training_reduces_loss(tiny):
    cfg, params, tokens = tiny
    ad = lora.init_adapters(cfg, lora.LoRAConfig(rank=4), jax.random.PRNGKey(2))
    step = jax.jit(lora.make_lora_train_step(cfg, lr=5e-2))
    ad, l0 = step(ad, params, tokens)
    for _ in range(5):
        ad, l = step(ad, params, tokens)
    assert float(l) < float(l0)
    # base params untouched by design (only adapters returned)


def test_merge_matches_adapter_forward(tiny):
    cfg, params, tokens = tiny
    ad = lora.init_adapters(cfg, lora.LoRAConfig(rank=4), jax.random.PRNGKey(3))
    # make adapters non-trivial
    ad = jax.tree.map(lambda a: a + 0.01 if a.ndim == 3 else a, ad)
    with_ad, _, _ = llama.forward(cfg, params, tokens, adapters=ad)
    merged = lora.merge(params, ad)
    merged_out, _, _ = llama.forward(cfg, merged, tokens)
    np.testing.assert_allclose(np.asarray(with_ad), np.asarray(merged_out),
                               rtol=1e-4, atol=1e-4)


def test_qlora_step(tiny):
    from tensorrt_model_optimizer_tpu.quant import get_preset

    cfg, params, tokens = tiny
    layout = llama.build_layout(cfg, get_preset("NF4_WEIGHT_ONLY_CFG"))
    qs = llama.init_quant_state(cfg, layout)
    _, qs, _ = llama.forward(cfg, params, tokens, layout=layout, qstate=qs, calib=True)
    ad = lora.init_adapters(cfg, lora.LoRAConfig(rank=4), jax.random.PRNGKey(4))
    step = jax.jit(lora.make_lora_train_step(cfg, lr=1e-2, layout=layout))
    ad, loss = step(ad, params, tokens, qs)
    assert np.isfinite(float(loss))
