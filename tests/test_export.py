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


def _reference_pack_int4_in_uint8(weight, scale_blocked):
    """Independent reimplementation of the reference's pack_int4_in_uint8
    semantics (quant_utils.py:790): scale/round/clamp to [-8, 7], transpose
    to [K, O], group output-channel pairs, pack val0 | val1 << 4, transpose
    back to [O/2, K]."""
    O, K = weight.shape
    block = K // scale_blocked.shape[-1]
    s_full = np.repeat(scale_blocked, block, axis=-1)
    q = np.clip(np.round(weight / s_full), -8, 7).astype(np.int8)
    tr = q.T.reshape(K, O // 2, 2)
    val0 = tr[..., 0].astype(np.uint8) & 0x0F
    val1 = tr[..., 1].astype(np.uint8) & 0x0F
    return (val0 | (val1 << 4)).T  # [O/2, K]


def test_int4_awq_pack_golden():
    """Export byte layout must match the reference's output-pair packing
    exactly (a checkpoint consumer indexes bytes by [O/2, K])."""
    from tensorrt_model_optimizer_tpu.quant import config as qconfig

    rng = np.random.default_rng(0)
    O, K, block = 8, 32, 16
    w = rng.standard_normal((O, K)).astype(np.float32)
    bam = np.abs(w).reshape(O, K // block, block).max(axis=-1)
    preset = qconfig.get_preset("INT4_AWQ_CFG")
    wcfg = preset.resolve("mlp.down_proj.weight_quantizer")
    import dataclasses as dc

    wcfg = dc.replace(wcfg, block=dc.replace(wcfg.block, sizes=((-1, block),)))
    from tensorrt_model_optimizer_tpu.quant import quantizer as Q

    wst = Q.QuantizerState(amax=jnp.asarray(bam))
    out = hf_export._export_weight(jnp.asarray(w), wcfg, wst, "W4A16_AWQ")
    assert out["weight"].shape == (O // 2, K)
    golden = _reference_pack_int4_in_uint8(w, out["weight_scale"])
    np.testing.assert_array_equal(out["weight"], golden)


def test_w4a8_weight_scale_2(tiny, tmp_path):
    """W4A8 exports the fp8-stage secondary scale (quant_utils.py:343)."""
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "W4A8_AWQ_BETA_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "w4a8"))
    assert qc["quantization"]["quant_algo"] == "W4A8_AWQ"
    t = _load(tmp_path / "w4a8")
    ws2 = t["model.layers.0.mlp.down_proj.weight_scale_2"]
    assert ws2.size == 1 and ws2 > 0
    amax = model.qstate["mlp.down_proj"]["weight"].amax
    assert isinstance(amax, tuple)
    fp8_amax = float(np.asarray(amax[-1], np.float32)[0].max())
    np.testing.assert_allclose(float(ws2), fp8_amax / 448.0, rtol=1e-6)


def test_mxfp8_compress_routes_to_mx_branch():
    """MXFP8 (num_bits (4,3), E8M0 scales) must not hit the per-tensor FP8
    branch (bug class fixed in commit eece6fc for MXFP4)."""
    from tensorrt_model_optimizer_tpu.quant import compress as C
    from tensorrt_model_optimizer_tpu.quant import config as qconfig

    w = jnp.asarray(np.random.default_rng(2).standard_normal((16, 64)), jnp.float32)
    kind, arrays = C.compress_weight(w, qconfig.MXFP8_E4M3_BLOCK32, None)
    assert kind == "bf16"  # MX formats store fake-quantized values
    expect = numerics.fake_quant_mx(w, 4, 3, 32)
    np.testing.assert_allclose(
        np.asarray(arrays["w"], np.float32), np.asarray(expect, np.float32),
        rtol=1e-2, atol=1e-3,
    )


def test_mxfp8_export_algo(tiny, tmp_path):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "MXFP8_DEFAULT_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "mxfp8"))
    assert qc["quantization"]["quant_algo"] == "MXFP8"
    t = _load(tmp_path / "mxfp8")
    w = t["model.layers.0.mlp.down_proj.weight"]
    assert w.dtype == np.float16  # fake-quantized MX grid values


def test_fp8_kv_scale_clamped(tiny, tmp_path):
    """FP8 KV scales are clamped to >= 1.0 (quant_utils.py:390-404)."""
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "FP8_KV_CFG", batches)
    hf_export.export_hf_checkpoint(model, str(tmp_path / "fp8kv"))
    t = _load(tmp_path / "fp8kv")
    for i in range(cfg.num_hidden_layers):
        assert float(np.asarray(t[f"model.layers.{i}.self_attn.k_proj.k_scale"]).reshape(())) >= 1.0
        assert float(np.asarray(t[f"model.layers.{i}.self_attn.v_proj.v_scale"]).reshape(())) >= 1.0


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


def test_moe_export_unstacks_experts(tmp_path):
    """MoE unified export: stacked experts emit per-expert HF modules with
    per-expert scales; dequant roundtrip matches the fake-quant weight."""
    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import ptq as ptq_mod

    cfg = mixtral.MixtralConfig.tiny(qk_norm=True)  # qwen3-moe flavor
    params = mixtral.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(5)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq_mod.quantize_family("mixtral", cfg, params, "NVFP4_DEFAULT_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "moe"))
    assert qc["quantization"]["quant_algo"] == "NVFP4"
    t = _load(tmp_path / "moe")
    # router exported unquantized; qk norms pass through
    assert "model.layers.0.mlp.gate.weight" in t
    assert "model.layers.0.self_attn.q_norm.weight" in t
    w = t["model.layers.1.mlp.experts.2.gate_proj.weight"]
    assert w.dtype == np.uint8
    ws = t["model.layers.1.mlp.experts.2.gate_proj.weight_scale"]
    ws2 = t["model.layers.1.mlp.experts.2.gate_proj.weight_scale_2"]
    codes = np.empty((w.shape[0], w.shape[1] * 2), np.uint8)
    codes[:, 0::2] = w & 0xF
    codes[:, 1::2] = (w >> 4) & 0xF
    vals = np.asarray(numerics.codes_to_fp4(jnp.asarray(codes)))
    scale = np.asarray(jnp.asarray(ws).astype(jnp.float32)) * ws2
    deq = vals * np.repeat(scale, 16, axis=1)
    orig = np.asarray(params["layers"]["moe.gate_proj"][1, 2], np.float32)
    g_amax = model.qstate["moe.gate_proj"]["weight"].amax[1, 2]
    fake = np.asarray(numerics.fake_quant_nvfp4(jnp.asarray(orig), 16, g_amax))
    np.testing.assert_allclose(deq, fake, rtol=1e-3, atol=1e-4)
    # config.json declares the MoE family
    with open(tmp_path / "moe" / "config.json") as f:
        d = json.load(f)
    assert d["model_type"] == "qwen3_moe" and d["num_experts"] == cfg.num_experts


def test_gpt_oss_export_raises_clearly(tmp_path):
    from tensorrt_model_optimizer_tpu.models import gpt_oss
    from tensorrt_model_optimizer_tpu.quant import ptq as ptq_mod

    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(4))
    model = ptq_mod.quantize_family("gpt_oss", cfg, params, "FP8_DEFAULT_CFG",
                                    [jnp.zeros((1, 8), jnp.int32)])
    with pytest.raises(NotImplementedError):
        hf_export.export_hf_checkpoint(model, str(tmp_path / "oss"))


def test_gpt_oss_native_mxfp4_export_roundtrip(tmp_path):
    """GPT-OSS export writes the architecture's NATIVE shipped format
    (gate_up_proj_blocks/scales, interleaved rows, E8M0 biased scales) and
    our MXFP4-aware loader reads it back: dequantized experts == the
    MXFP4 fake-quant of the originals."""
    from tensorrt_model_optimizer_tpu.models import gpt_oss, hf_loader
    from tensorrt_model_optimizer_tpu.quant import ptq as ptq_mod

    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(5))
    # non-trivial biases/sinks so passthrough is actually checked
    layers = dict(params["layers"])
    layers["self_attn.sinks"] = jnp.asarray(
        np.random.default_rng(0).normal(size=layers["self_attn.sinks"].shape),
        jnp.float32)
    params = {**params, "layers": layers}
    rng = np.random.default_rng(7)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq_mod.quantize_family("gpt_oss", cfg, params,
                                    "MXFP4_WEIGHT_ONLY_CFG", batches)
    qc = hf_export.export_hf_checkpoint(model, str(tmp_path / "oss"))
    assert qc["quantization"]["quant_algo"] == "MXFP4"
    t = _load(tmp_path / "oss")
    blocks = t["model.layers.0.mlp.experts.gate_up_proj_blocks"]
    assert blocks.dtype == np.uint8 and blocks.shape[-1] == 16
    assert t["model.layers.0.mlp.experts.gate_up_proj_scales"].dtype == np.uint8

    # loader roundtrip: dequantized == mxfp4 fake-quant of original
    lcfg, lparams = hf_loader.load_hf_moe_checkpoint(
        str(tmp_path / "oss"), dtype=jnp.float32)
    assert lcfg.sliding_window == cfg.sliding_window
    from tensorrt_model_optimizer_tpu.ops import numerics as nx

    orig = np.asarray(params["layers"]["moe.gate_proj"][0, 1], np.float32)
    fake = np.asarray(nx.fake_quant_mx(jnp.asarray(orig), 2, 1, 32))
    got = np.asarray(lparams["layers"]["moe.gate_proj"][0, 1], np.float32)
    np.testing.assert_allclose(got, fake, rtol=1e-5, atol=1e-6)
    # sinks/biases pass through
    np.testing.assert_allclose(
        np.asarray(lparams["layers"]["self_attn.sinks"]),
        np.asarray(params["layers"]["self_attn.sinks"], np.float16).astype(np.float32),
        rtol=1e-3)


def test_gpt_oss_export_streams_sharded(tmp_path):
    """GPT-OSS export honors max_shard_bytes (layer-at-a-time shards)."""
    from tensorrt_model_optimizer_tpu.models import gpt_oss, hf_loader
    from tensorrt_model_optimizer_tpu.quant import ptq as ptq_mod

    cfg = gpt_oss.GptOssConfig.tiny()
    params = gpt_oss.init_params(cfg, jax.random.PRNGKey(6))
    model = ptq_mod.quantize_family("gpt_oss", cfg, params,
                                    "MXFP4_WEIGHT_ONLY_CFG",
                                    [jnp.zeros((1, 8), jnp.int32)])
    hf_export.export_hf_checkpoint(model, str(tmp_path / "oss"),
                                   max_shard_bytes=64 * 1024)
    import glob as _glob
    shards = _glob.glob(str(tmp_path / "oss" / "model-*.safetensors"))
    assert len(shards) > 1 and os.path.exists(
        str(tmp_path / "oss" / "model.safetensors.index.json"))
    lcfg, lparams = hf_loader.load_hf_moe_checkpoint(
        str(tmp_path / "oss"), dtype=jnp.float32)
    assert lparams["layers"]["moe.gate_proj"].shape[:2] == (
        cfg.num_hidden_layers, cfg.num_experts)


def test_mixtral_naming_export_roundtrip(tmp_path):
    """Non-qk_norm MoE exports declare model_type=mixtral AND use mixtral
    tensor naming (block_sparse_moe.experts.{e}.w1/w3/w2) — the directory
    must be self-consistent and loadable."""
    import json as _json

    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import ptq as ptq_mod
    from tensorrt_model_optimizer_tpu.serve.loader import load_quantized_checkpoint

    cfg = mixtral.MixtralConfig.tiny()  # qk_norm False -> mixtral naming
    params = mixtral.init_params(cfg, jax.random.PRNGKey(12))
    rng = np.random.default_rng(19)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq_mod.quantize_family("mixtral", cfg, params, "FP8_DEFAULT_CFG", batches)
    hf_export.export_hf_checkpoint(model, str(tmp_path / "mx"))
    with open(tmp_path / "mx" / "config.json") as f:
        assert _json.load(f)["model_type"] == "mixtral"
    t = _load(tmp_path / "mx")
    assert "model.layers.0.block_sparse_moe.experts.1.w1.weight" in t
    cm = load_quantized_checkpoint(str(tmp_path / "mx"))
    assert cm.kinds["moe.gate_proj"] == "fp8"
