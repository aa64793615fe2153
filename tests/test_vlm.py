"""VLM (LLaVA-style vision + llama LM) PTQ tests.

Reference counterpart: `examples/vlm_ptq/` + VLM calib loaders
(`utils/dataset_utils.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.models import vlm


@pytest.fixture(scope="module")
def tiny_vlm():
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [
        (jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
         jnp.asarray(rng.integers(0, 256, size=(2, 12)).astype(np.int32)))
        for _ in range(2)
    ]
    return cfg, params, batches


def test_forward_shapes(tiny_vlm):
    cfg, params, batches = tiny_vlm
    px, tk = batches[0]
    logits, _ = vlm.forward(cfg, params, px, tk)
    assert logits.shape == (2, 12, cfg.lm.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_image_conditions_text_logits(tiny_vlm):
    """Different images must change the text logits (the projector path is
    live, not dead weight)."""
    cfg, params, batches = tiny_vlm
    (px1, tk), (px2, _) = batches
    l1, _ = vlm.forward(cfg, params, px1, tk)
    l2, _ = vlm.forward(cfg, params, px2, tk)
    assert float(np.abs(np.asarray(l1) - np.asarray(l2)).max()) > 1e-4


@pytest.mark.parametrize("preset", [
    "INT8_DEFAULT_CFG", "FP8_DEFAULT_CFG", "NVFP4_DEFAULT_CFG",
])
def test_vlm_ptq(tiny_vlm, preset):
    cfg, params, batches = tiny_vlm
    layout, qstate = vlm.quantize_vlm(cfg, params, preset, batches)
    # amax collected on BOTH towers + projector
    assert np.all(np.asarray(qstate["vision.attn.qkv"]["weight"].amax) > 0)
    assert np.all(np.asarray(qstate["proj.fc1"]["weight"].amax) > 0)
    assert "mlp.down_proj" in qstate  # LM tower
    px, tk = batches[0]
    ref, _ = vlm.forward(cfg, params, px, tk)
    out, _ = vlm.forward(cfg, params, px, tk, layout=layout, qstate=qstate)
    a, b = np.asarray(ref).ravel(), np.asarray(out).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    # same bar as test_dit_ptq: W4A4-class formats on a tiny random model
    bar = 0.9 if "NVFP4" in preset else 0.95
    assert corr > bar, f"{preset}: {corr}"


def test_lm_exclusions_apply(tiny_vlm):
    """Preset exclusion wildcards (lm_head etc.) hold in the VLM layout."""
    cfg, params, batches = tiny_vlm
    layout, _ = vlm.quantize_vlm(cfg, params, "INT8_DEFAULT_CFG", batches)
    assert not layout.get("lm_head.weight").enable
    assert layout.get("vision.attn.qkv.weight").enable


def test_vlm_unified_export(tiny_vlm, tmp_path):
    """export_vlm_checkpoint writes the LLaVA-scheme unified checkpoint:
    LM tower via the standard exporter + packed vision/projector sites."""
    import json

    from safetensors import safe_open

    from tensorrt_model_optimizer_tpu.export.hf_export import (
        export_vlm_checkpoint)

    cfg, params, batches = tiny_vlm
    layout, qstate = vlm.quantize_vlm(cfg, params, "NVFP4_DEFAULT_CFG", batches)
    out = tmp_path / "vlm_ckpt"
    hqc = export_vlm_checkpoint(cfg, params, layout, qstate, str(out),
                                quant_cfg="NVFP4_DEFAULT_CFG")
    assert hqc["quantization"]["quant_algo"] == "NVFP4"
    # torch framework handles the F8 weight_scale tensors numpy can't
    with safe_open(str(out / "model.safetensors"), framework="pt") as sf:
        names = set(sf.keys())
        w = sf.get_tensor("vision_tower.blocks.0.attn.qkv.weight").numpy()
    assert any(n.startswith("language_model.model.layers.0") for n in names)
    assert "vision_tower.blocks.0.attn.qkv.weight" in names
    assert "vision_tower.blocks.0.attn.qkv.weight_scale" in names
    assert "multi_modal_projector.linear_1.weight" in names
    # packed NVFP4: nibbles halve the input dim
    assert w.shape[-1] == cfg.vision.hidden_size // 2
    cfgj = json.loads((out / "config.json").read_text())
    assert cfgj["vision_config"]["depth"] == cfg.vision.depth
