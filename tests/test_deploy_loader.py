"""Export -> load -> serve roundtrip (the deploy loop)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.export import hf_export
from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import compress, ptq
from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
from tensorrt_model_optimizer_tpu.serve import loader


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


@pytest.mark.parametrize("preset,algo", [
    ("INT8_SMOOTHQUANT_CFG", "W8A8_SQ_PER_CHANNEL"),
    ("FP8_DEFAULT_CFG", "FP8"),
    ("NVFP4_WEIGHT_ONLY_CFG", "NVFP4"),
    ("INT4_AWQ_CFG", "W4A16_AWQ"),
])
def test_roundtrip(tiny, tmp_path, preset, algo):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, preset, batches)
    out_dir = str(tmp_path / preset)
    qc = hf_export.export_hf_checkpoint(model, out_dir)
    assert qc["quantization"]["quant_algo"] == algo

    cm = loader.load_quantized_checkpoint(out_dir)
    eng = serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=32, backend="xla"))
    prompt = batches[0][:, :8]
    cache = eng.init_cache(2, 32)
    logits, _ = eng.prefill(prompt, cache)

    # reference: the fake-quant model's last-position logits
    ref, _, _ = model.forward(prompt)
    a = np.asarray(logits).ravel()
    b = np.asarray(ref[:, -1]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    # export stores unquantized tensors (embed/lm_head/norms) as fp16 —
    # the fp32 test model picks up that cast noise on top of quant error
    assert corr > 0.95, f"{preset}: corr={corr}"


def test_svdquant_roundtrip_through_export():
    """NVFP4_SVDQUANT: lora tensors exported and re-applied by the engine."""
    import numpy as np

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq.quantize(cfg, params, "NVFP4_SVDQUANT_CFG", batches)
    with tempfile.TemporaryDirectory() as d:
        qc = hf_export.export_hf_checkpoint(model, d)
        assert qc["quantization"]["quant_algo"] == "NVFP4_SVDQUANT"
        assert qc["quantization"]["lora_rank"] > 0
        cm = loader.load_quantized_checkpoint(d)
    assert cm.adapters is not None and "mlp.down_proj" in cm.adapters
    eng = serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=32, backend="xla"))
    prompt = batches[0][:, :8]
    cache = eng.init_cache(2, 32)
    logits, _ = eng.prefill(prompt, cache)
    ref, _, _ = model.forward(prompt)
    corr = np.corrcoef(np.asarray(logits).ravel(), np.asarray(ref[:, -1]).ravel())[0, 1]
    # same bar as the other export roundtrips: fp16-stored tensors add
    # cast noise on top of the W4A4 quantization error
    assert corr > 0.95, corr


class TestExportSweep:
    """Every export-capable preset through export -> load -> engine."""

    @pytest.mark.parametrize("preset", [
        "INT8_DEFAULT_CFG", "FP8_KV_CFG", "INT4_GPTQ_CFG",
        "INT4_AWQ_KV_FP8_CFG", "NVFP4_DEFAULT_CFG", "W4A8_AWQ_BETA_CFG",
    ])
    def test_roundtrip_preset(self, tiny, tmp_path, preset):
        cfg, params, batches = tiny
        model = ptq.quantize(cfg, params, preset, batches)
        out_dir = str(tmp_path / preset)
        hf_export.export_hf_checkpoint(model, out_dir)
        cm = loader.load_quantized_checkpoint(out_dir)
        eng = serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=32,
                                                               backend="xla"))
        prompt = batches[0][:, :8]
        logits, _ = eng.prefill(prompt, eng.init_cache(2, 32))
        ref, _, _ = model.forward(prompt)
        corr = np.corrcoef(np.asarray(logits).ravel(),
                           np.asarray(ref[:, -1]).ravel())[0, 1]
        assert corr > 0.93, (preset, corr)


def test_moe_export_deploy_roundtrip(tmp_path):
    """MoE unified checkpoint: quantize -> export -> deploy-load -> engine
    prefill parity against the in-memory compressed engine."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorrt_model_optimizer_tpu.export import hf_export
    from tensorrt_model_optimizer_tpu.models import mixtral
    from tensorrt_model_optimizer_tpu.quant import compress, ptq
    from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
    from tensorrt_model_optimizer_tpu.serve.loader import load_quantized_checkpoint

    cfg = mixtral.MixtralConfig.tiny(qk_norm=True, capacity_factor=4.0)
    params = mixtral.init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(16)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq.quantize_family("mixtral", cfg, params, "NVFP4_DEFAULT_CFG", batches)
    hf_export.export_hf_checkpoint(model, str(tmp_path / "moe"))

    cm_mem = compress.compress(model)
    cm_disk = load_quantized_checkpoint(str(tmp_path / "moe"))
    assert cm_disk.kinds["moe.gate_proj"] == "nvfp4"
    assert cm_disk.model_cfg.num_experts == cfg.num_experts
    # capacity_factor is a serving knob (not checkpoint metadata) and the
    # disk default dtype is bf16 — align both for the parity comparison
    import dataclasses as _dc
    cm_disk = _dc.replace(
        cm_disk, model_cfg=_dc.replace(
            cm_disk.model_cfg, capacity_factor=4.0, dtype=jnp.float32))

    # the loader must reconstruct the packed expert grids EXACTLY; logits
    # can only be compared loosely (fp16 router passthrough flips top-k on
    # near-ties, swapping whole experts for some tokens)
    for site in ("moe.gate_proj", "moe.down_proj", "self_attn.q_proj"):
        for key, a in cm_mem.params["layers"][site].items():
            b = cm_disk.params["layers"][site][key]
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=f"{site}.{key}")
    prompt = batches[0][:, :8]
    e1 = serve_engine.Engine(cm_mem, serve_engine.EngineConfig(max_seq_len=32, backend="xla"))
    e2 = serve_engine.Engine(cm_disk, serve_engine.EngineConfig(max_seq_len=32, backend="xla"))
    l1, _ = e1.prefill(prompt, e1.init_cache(2, 32))
    l2, _ = e2.prefill(prompt, e2.init_cache(2, 32))
    corr = np.corrcoef(np.asarray(l1).ravel(), np.asarray(l2).ravel())[0, 1]
    assert corr > 0.95, corr  # fp16 router rounding flips near-tie routing
    # with the aux leaves (router/norms/embeds) taken exactly, the loaded
    # engine must be numerically IDENTICAL — pins the packed-weight path
    l3d = dict(cm_disk.params["layers"])
    for n in ("moe.router", "input_layernorm", "post_attention_layernorm",
              "self_attn.q_norm", "self_attn.k_norm"):
        l3d[n] = cm_mem.params["layers"][n]
    p3 = {**cm_disk.params, "layers": l3d,
          "embed_tokens": cm_mem.params["embed_tokens"],
          "norm": cm_mem.params["norm"]}
    if "lm_head" in cm_mem.params:
        p3["lm_head"] = cm_mem.params["lm_head"]
    cm3 = _dc.replace(cm_disk, params=p3)
    e3 = serve_engine.Engine(cm3, serve_engine.EngineConfig(max_seq_len=32, backend="xla"))
    l3, _ = e3.prefill(prompt, e3.init_cache(2, 32))
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l1), rtol=1e-5, atol=1e-5)
