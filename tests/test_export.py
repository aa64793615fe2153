"""Unified HF export tests: layouts, scales, dequant roundtrip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.export import hf_export
from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.ops import numerics
from tensorrt_model_optimizer_tpu.quant import ptq


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


def _load(path):
    return hf_export.load_exported(str(path))


def test_nvfp4_export(tiny, tmp_path):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "NVFP4_KV_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "nvfp4"))
    assert qc["quantization"]["quant_algo"] == "NVFP4"
    assert qc["quantization"]["kv_cache_quant_algo"] == "NVFP4"
    t = _load(tmp_path / "nvfp4")
    w = t["model.layers.0.mlp.down_proj.weight"]
    assert w.dtype == np.uint8 and w.shape == (cfg.hidden_size, cfg.intermediate_size // 2)
    ws = t["model.layers.0.mlp.down_proj.weight_scale"]
    assert ws.shape == (cfg.hidden_size, cfg.intermediate_size // 16)
    ws2 = t["model.layers.0.mlp.down_proj.weight_scale_2"]
    assert ws2.size == 1
    # dequant roundtrip == fake quant of the original weight
    codes_lo = w & 0xF
    codes_hi = (w >> 4) & 0xF
    codes = np.empty((w.shape[0], w.shape[1] * 2), np.uint8)
    codes[:, 0::2] = codes_lo
    codes[:, 1::2] = codes_hi
    vals = np.asarray(numerics.codes_to_fp4(jnp.asarray(codes)))
    scale = np.asarray(jnp.asarray(ws).astype(jnp.float32)) * ws2
    deq = vals * np.repeat(scale, 16, axis=1)
    orig = np.asarray(params["layers"]["mlp.down_proj"][0], np.float32)
    g_amax = model.qstate["mlp.down_proj"]["weight"].amax[0]
    fake = np.asarray(numerics.fake_quant_nvfp4(jnp.asarray(orig), 16, g_amax))
    np.testing.assert_allclose(deq, fake, rtol=1e-3, atol=1e-4)


def test_fp8_export(tiny, tmp_path):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "FP8_DEFAULT_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "fp8"))
    assert qc["quantization"]["quant_algo"] == "FP8"
    t = _load(tmp_path / "fp8")
    w = t["model.layers.0.self_attn.q_proj.weight"]
    assert str(w.dtype) == "float8_e4m3fn" or w.dtype.itemsize == 1
    assert "model.layers.0.self_attn.q_proj.input_scale" in t


def test_int4_awq_export(tiny, tmp_path):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "INT4_AWQ_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "awq"))
    assert qc["quantization"]["quant_algo"] == "W4A16_AWQ"
    t = _load(tmp_path / "awq")
    assert "model.layers.0.mlp.gate_proj.pre_quant_scale" in t
    w = t["model.layers.0.mlp.gate_proj.weight"]
    assert w.dtype == np.uint8


def test_int8_sq_export(tiny, tmp_path):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "INT8_SMOOTHQUANT_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "sq"))
    assert qc["quantization"]["quant_algo"] == "W8A8_SQ_PER_CHANNEL"
    t = _load(tmp_path / "sq")
    w = t["model.layers.0.mlp.up_proj.weight"]
    assert w.dtype == np.int8
    assert "model.layers.0.mlp.up_proj.pre_quant_scale" in t
    assert "model.layers.0.mlp.up_proj.input_scale" in t


def test_config_json_written(tiny, tmp_path):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "FP8_DEFAULT_CFG", batches)
    hf_export.export_hf_checkpoint(model, str(tmp_path / "cfgtest"))
    with open(tmp_path / "cfgtest" / "config.json") as f:
        d = json.load(f)
    assert d["model_type"] == "llama"
    assert d["quantization_config"]["quant_algo"] == "FP8"
    with open(tmp_path / "cfgtest" / "hf_quant_config.json") as f:
        q = json.load(f)
    assert q["quantization"]["exclude_modules"] == ["lm_head"]
