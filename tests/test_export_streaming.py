"""Streaming (sharded) export/load: layer-at-a-time, bounded host memory.

The reference streams 70B-scale exports so the full state dict never sits on
host (`unified_export_hf_streaming.py:445`). Our counterpart: a per-layer
tensor generator feeding an HF-style sharded writer (index.json + shards),
plus lazy mmap-backed loads on both the deploy loader and the HF loader.
Correctness contract: sharded output is tensor-identical to the single-file
export and round-trips through every reader.
"""

import json
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrt_model_optimizer_tpu.export import hf_export
from tensorrt_model_optimizer_tpu.models import hf_loader, llama
from tensorrt_model_optimizer_tpu.quant import ptq
from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
from tensorrt_model_optimizer_tpu.serve.loader import load_quantized_checkpoint


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


@pytest.mark.parametrize("preset", ["NVFP4_KV_CFG", "FP8_DEFAULT_CFG", "INT4_AWQ_CFG"])
def test_sharded_equals_single(tiny, tmp_path, preset):
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, preset, batches)
    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    qc1 = hf_export.export_hf_checkpoint(model, single)
    # tiny shard budget -> many shards; exercises flush + rename + index
    qc2 = hf_export.export_hf_checkpoint(model, sharded, max_shard_bytes=16 * 1024)
    assert qc1 == qc2

    shards = glob(os.path.join(sharded, "model-*-of-*.safetensors"))
    assert len(shards) > 1, "tiny shard budget must split into multiple shards"
    with open(os.path.join(sharded, "model.safetensors.index.json")) as f:
        index = json.load(f)
    assert set(index["weight_map"].values()) == {os.path.basename(s) for s in shards}

    t1 = hf_export.load_exported(single)
    t2 = hf_export.load_exported(sharded)
    assert set(t1.keys()) == set(t2.keys()) == set(index["weight_map"])
    total = 0
    for k in t1.keys():
        a, b = t1[k], t2[k]
        assert a.dtype == b.dtype and a.shape == b.shape, k
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8), err_msg=k
        )
        total += a.nbytes
    assert index["metadata"]["total_size"] == total


def test_sharded_deploy_loader_roundtrip(tiny, tmp_path):
    """Engine decode from a sharded checkpoint == from the single-file one."""
    cfg, params, batches = tiny
    model = ptq.quantize(cfg, params, "NVFP4_KV_CFG", batches)
    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    hf_export.export_hf_checkpoint(model, single)
    hf_export.export_hf_checkpoint(model, sharded, max_shard_bytes=16 * 1024)

    prompt = jnp.asarray(np.arange(8, dtype=np.int32)[None, :] % cfg.vocab_size)
    outs = []
    for path in (single, sharded):
        cm = load_quantized_checkpoint(path)
        eng = serve_engine.Engine(
            cm, serve_engine.EngineConfig(max_seq_len=32, backend="xla")
        )
        outs.append(np.asarray(eng.generate(prompt, max_new_tokens=6)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_hf_loader_reads_sharded_bf16(tiny, tmp_path):
    """hf_loader round-trips through a manually sharded bf16 checkpoint
    (the layout of real multi-shard HF releases)."""
    cfg, params, _ = tiny
    single = str(tmp_path / "hf")
    hf_loader.save_hf_checkpoint(cfg, params, single)

    # split the single file into two shards + index.json
    from safetensors import safe_open
    from safetensors.numpy import save_file

    src = os.path.join(single, "model.safetensors")
    with safe_open(src, framework="np") as sf:
        keys = sorted(sf.keys())
        tensors = {k: sf.get_tensor(k) for k in keys}
    os.remove(src)
    half = len(keys) // 2
    parts = {
        "model-00001-of-00002.safetensors": {k: tensors[k] for k in keys[:half]},
        "model-00002-of-00002.safetensors": {k: tensors[k] for k in keys[half:]},
    }
    weight_map = {}
    for fname, d in parts.items():
        save_file(d, os.path.join(single, fname))
        weight_map.update({k: fname for k in d})
    with open(os.path.join(single, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)

    cfg2, params2 = hf_loader.load_hf_checkpoint(single, dtype=jnp.float32)
    flat1 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat2 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(params2)[0]
    }
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(
            np.asarray(flat1[k], np.float32), np.asarray(flat2[k]), atol=1e-6,
            err_msg=k,
        )
