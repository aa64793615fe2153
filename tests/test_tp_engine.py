"""Tensor-parallel serving engine: token parity vs single device.

VERDICT round-2 item #2: TP decode with packed weights, block scales, and
paged KV sharded over a mesh, token-identical to the single-device engine.
Runs on the virtual CPU mesh (conftest); the same shard_map path carries the
Pallas kernels on TPU hardware.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tensorrt_model_optimizer_tpu.models import llama
from tensorrt_model_optimizer_tpu.quant import compress, ptq
from tensorrt_model_optimizer_tpu.serve import engine as serve_engine
from tensorrt_model_optimizer_tpu.serve import tp as tp_mod


def tp_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("tp",))


@pytest.fixture(scope="module")
def tiny_ptq():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    return cfg, params, batches


def _generate(cm, ecfg, prompt, n=8):
    eng = serve_engine.Engine(cm, ecfg)
    return np.asarray(eng.generate(prompt, max_new_tokens=n)), eng


PRESETS = [
    "INT8_DEFAULT_CFG",       # W8A8 (per-token dynamic acts -> pmax path)
    "FP8_DEFAULT_CFG",
    "INT4_BLOCKWISE_WEIGHT_ONLY_CFG",  # plane-packed col repack
    "NVFP4_DEFAULT_CFG",      # block scales + per-shard K-perm layout
    "INT4_AWQ_CFG",           # pre_quant_scale sharding on row sites
]


class TestTPRelayout:
    def test_plane_tp_major_roundtrip(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.integers(0, 16, size=(3, 8, 16)).astype(np.uint8))
        packed = ((q[:, 4:] << 4) | q[:, :4]).astype(jnp.uint8)  # [3, 4, 16]
        for d in (1, 2, 4):
            tpm = tp_mod._plane_to_tp_major(packed, d)
            # each shard's slice must plane-unpack to its own original rows
            Os = 8 // d
            for s in range(d):
                blk = tpm[:, s * Os // 2 : (s + 1) * Os // 2]
                lo = np.asarray(blk & 0xF)
                hi = np.asarray((blk >> 4) & 0xF)
                want = np.asarray(q[:, s * Os : (s + 1) * Os])
                np.testing.assert_array_equal(lo, want[:, : Os // 2])
                np.testing.assert_array_equal(hi, want[:, Os // 2 :])

    def test_decompress_order_preserved(self, tiny_ptq):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, "INT4_BLOCKWISE_WEIGHT_ONLY_CFG", batches)
        cm = compress.compress(model)
        cm2, _ = tp_mod.shard_compressed(cm, 2, int4_layout="blockdot")
        name = "mlp.gate_proj"
        ref = compress.decompress_weight("int4", cm.params["layers"][name], jnp.float32)
        arr = cm2.params["layers"][name]
        O = ref.shape[1] * 2 // 2  # [L, O, K]
        d = 2
        Os = ref.shape[1] // d
        outs = []
        for s in range(d):
            blk = {k: v[:, s * Os // 2 : (s + 1) * Os // 2] for k, v in arr.items()}
            outs.append(compress.decompress_weight("int4", blk, jnp.float32))
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


class TestTPEngineParity:
    @pytest.mark.parametrize("preset", PRESETS)
    def test_dense_generate_parity(self, tiny_ptq, preset):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, preset, batches)
        cm = compress.compress(model)
        prompt = jnp.asarray(np.random.default_rng(3).integers(0, 256, size=(2, 12)))
        ref, _ = _generate(cm, serve_engine.EngineConfig(max_seq_len=64), prompt)
        got, _ = _generate(
            cm,
            serve_engine.EngineConfig(max_seq_len=64, mesh=tp_mesh(2)),
            prompt,
        )
        np.testing.assert_array_equal(got, ref)

    def test_dense_generate_parity_tp4(self, tiny_ptq):
        cfg, params, batches = tiny_ptq
        # tp=4 needs nKV % 4 == 0: widen the tiny config
        cfg = llama.LlamaConfig.tiny(
            num_attention_heads=8, num_key_value_heads=4, hidden_size=128,
            intermediate_size=256,
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        model = ptq.quantize(cfg, params, "NVFP4_DEFAULT_CFG", batches)
        cm = compress.compress(model)
        prompt = jnp.asarray(np.random.default_rng(3).integers(0, 256, size=(1, 9)))
        ref, _ = _generate(cm, serve_engine.EngineConfig(max_seq_len=64), prompt)
        got, _ = _generate(
            cm, serve_engine.EngineConfig(max_seq_len=64, mesh=tp_mesh(4)), prompt
        )
        np.testing.assert_array_equal(got, ref)

    def test_paged_serve_parity(self, tiny_ptq):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, "NVFP4_DEFAULT_CFG", batches)
        cm = compress.compress(model)
        from tensorrt_model_optimizer_tpu.serve.scheduler import Request

        rng = np.random.default_rng(5)

        def reqs():
            return [
                Request(rid=i, prompt=rng.integers(0, 256, size=(6 + i,)),
                        max_new_tokens=5)
                for i in range(3)
            ]

        rng = np.random.default_rng(5)
        eng = serve_engine.Engine(cm, serve_engine.EngineConfig(max_seq_len=64))
        ref = eng.serve(reqs(), n_pages=32, page_size=8, max_slots=2,
                        max_pages_per_seq=8)
        rng = np.random.default_rng(5)
        eng_tp = serve_engine.Engine(
            cm, serve_engine.EngineConfig(max_seq_len=64, mesh=tp_mesh(2))
        )
        got = eng_tp.serve(reqs(), n_pages=32, page_size=8, max_slots=2,
                           max_pages_per_seq=8)
        assert {k: list(v) for k, v in got.items()} == {
            k: list(v) for k, v in ref.items()
        }

    def test_kv_quantized_cache_parity(self, tiny_ptq):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, "FP8_DEFAULT_CFG", batches)
        cm = compress.compress(model)
        prompt = jnp.asarray(np.random.default_rng(7).integers(0, 256, size=(1, 8)))
        ec = serve_engine.EngineConfig(max_seq_len=64, kv_dtype=jnp.float8_e4m3fn)
        ref, _ = _generate(cm, ec, prompt)
        got, _ = _generate(
            cm, dataclasses.replace(ec, mesh=tp_mesh(2)), prompt
        )
        np.testing.assert_array_equal(got, ref)


class TestLayoutMeshBackendMatrix:
    """Layout x mesh x backend equivalence matrix (VERDICT r2 item 2).

    Round 2 shipped a red test because the int4 word-layout default applied
    only when `mesh is None` — single-device and TP legs served different
    numerics. This pins the full matrix: for each serving layout, tokens
    must be identical across {no-mesh, TP2 mesh} x {pallas, xla}, so a
    layout default flip can never silently diverge the TP leg again.
    (Cross-LAYOUT parity is intentionally not asserted: int4's word layout
    rounds block scales to bf16, a documented perturbation.)
    """

    @pytest.mark.parametrize("preset,key,layouts", [
        # "a8" is excluded here: its fallback asymmetry on this TINY config
        # (down_proj has a single K block, so TP row-shards fall back to
        # word2 while single-device serves the real int8-act w48 kernel)
        # makes exact parity impossible by construction; a dedicated test
        # below pins a8 TP parity on a shardable shape.
        ("INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "int4_layout",
         ("blockdot", "word", "word2", "bd2", "xla")),
        ("NVFP4_DEFAULT_CFG", "nvfp4_layout",
         ("blockdot", "perm", "word", "word2")),
    ])
    def test_token_parity_matrix(self, tiny_ptq, preset, key, layouts):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, preset, batches)
        cm = compress.compress(model)
        prompt = jnp.asarray(np.random.default_rng(11).integers(0, 256, size=(2, 10)))
        for layout in layouts:
            ref = None
            for mesh in (None, tp_mesh(2)):
                for backend in ("pallas", "xla"):
                    ec = serve_engine.EngineConfig(
                        max_seq_len=48, backend=backend, mesh=mesh,
                        **{key: layout},
                    )
                    got, _ = _generate(cm, ec, prompt, n=6)
                    if ref is None:
                        ref = got
                    else:
                        np.testing.assert_array_equal(
                            got, ref,
                            err_msg=f"{preset} layout={layout} mesh="
                                    f"{mesh is not None} backend={backend}",
                        )


class TestW4A8TPParity:
    """a8 (W4A8 int8-MXU serving) TP parity on a SHARDABLE shape: hidden
    128 / intermediate 256 gives every site >= 2 K-blocks at tp=2, so both
    legs serve the real int4w48 kernel (no fallback asymmetry)."""

    def test_a8_tp2_token_parity(self):
        cfg = llama.LlamaConfig.tiny(hidden_size=128, intermediate_size=256)
        params = llama.init_params(cfg, jax.random.PRNGKey(5))
        batches = [jnp.asarray(
            np.random.default_rng(6).integers(0, 256, size=(2, 16)))]
        model = ptq.quantize(cfg, params, "INT4_BLOCKWISE_WEIGHT_ONLY_CFG",
                             batches)
        cm = compress.compress(model)
        prompt = batches[0][:, :8]
        ref, eng1 = _generate(cm, serve_engine.EngineConfig(
            max_seq_len=48, int4_layout="a8"), prompt, n=6)
        assert eng1.cm.kinds["mlp.down_proj"] == "int4w48"
        got, eng2 = _generate(cm, serve_engine.EngineConfig(
            max_seq_len=48, int4_layout="a8", mesh=tp_mesh(2)), prompt, n=6)
        np.testing.assert_array_equal(got, ref)


class TestMoEExpertParallel:
    """Expert-parallel MoE serving: TP=2 token parity vs single device."""

    def _moe_cm(self, preset, gpt_oss=False):
        if gpt_oss:
            from tensorrt_model_optimizer_tpu.models import gpt_oss as fam

            cfg = fam.GptOssConfig.tiny(capacity_factor=4.0, sliding_window=4)
        else:
            from tensorrt_model_optimizer_tpu.models import mixtral as fam

            cfg = fam.MixtralConfig.tiny(qk_norm=True, capacity_factor=4.0)
        params = fam.init_params(cfg, jax.random.PRNGKey(9))
        if gpt_oss:
            layers = dict(params["layers"])
            layers["self_attn.sinks"] = jnp.asarray(
                np.random.default_rng(2).normal(size=layers["self_attn.sinks"].shape),
                cfg.dtype)
            params = {**params, "layers": layers}
        rng = np.random.default_rng(15)
        batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
        model = ptq.quantize_family(
            "gpt_oss" if gpt_oss else "mixtral", cfg, params, preset, batches)
        return compress.compress(model), batches

    @pytest.mark.parametrize("preset", ["INT8_DEFAULT_CFG", "NVFP4_DEFAULT_CFG"])
    def test_mixtral_tp2_token_parity(self, preset):
        cm, batches = self._moe_cm(preset)
        prompt = batches[0][:, :8]
        ref, _ = _generate(cm, serve_engine.EngineConfig(
            max_seq_len=48, backend="xla"), prompt)
        got, _ = _generate(cm, serve_engine.EngineConfig(
            max_seq_len=48, backend="xla", mesh=tp_mesh(2)), prompt)
        np.testing.assert_array_equal(got, ref)

    def test_gpt_oss_tp2_token_parity(self):
        cm, batches = self._moe_cm("MXFP4_DEFAULT_CFG", gpt_oss=True)
        prompt = batches[0][:, :8]
        ref, _ = _generate(cm, serve_engine.EngineConfig(
            max_seq_len=48, backend="xla"), prompt)
        got, _ = _generate(cm, serve_engine.EngineConfig(
            max_seq_len=48, backend="xla", mesh=tp_mesh(2)), prompt)
        np.testing.assert_array_equal(got, ref)


def test_llama4_tp2_token_parity():
    """Llama4 (interleaved rope/nope flags + shared expert + EP) under
    TP=2: token-identical to single device."""
    from tensorrt_model_optimizer_tpu.models import llama4

    cfg = llama4.Llama4Config.tiny(
        capacity_factor=4.0, attention_chunk_size=4, floor_scale=4.0)
    params = llama4.init_params(cfg, jax.random.PRNGKey(27))
    rng = np.random.default_rng(27)
    batches = [jnp.asarray(rng.integers(0, 256, size=(2, 16)))]
    model = ptq.quantize_family("llama4", cfg, params, "INT8_DEFAULT_CFG", batches)
    cm = compress.compress(model)
    prompt = batches[0][:, :8]
    ref, _ = _generate(cm, serve_engine.EngineConfig(
        max_seq_len=48, backend="xla"), prompt, n=5)
    got, _ = _generate(cm, serve_engine.EngineConfig(
        max_seq_len=48, backend="xla", mesh=tp_mesh(2)), prompt, n=5)
    np.testing.assert_array_equal(got, ref)


class TestDPxTP:
    """DP x TP serving mesh: batch shards over the replica axis (no
    collective crosses it in the decode step), weights replicate over it,
    TP psums stay on the inner axis. Token-identical to single device."""

    def test_dense_generate_parity_dp2_tp2(self, tiny_ptq):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, "INT8_DEFAULT_CFG", batches)
        cm = compress.compress(model)
        prompt = jnp.asarray(np.random.default_rng(21).integers(0, 256, size=(2, 10)))
        ref, _ = _generate(cm, serve_engine.EngineConfig(max_seq_len=48), prompt)
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
        got, _ = _generate(
            cm,
            serve_engine.EngineConfig(max_seq_len=48, mesh=mesh, dp_axis="dp"),
            prompt,
        )
        np.testing.assert_array_equal(got, ref)

    def test_overlap_collectives_parity(self, tiny_ptq):
        cfg, params, batches = tiny_ptq
        model = ptq.quantize(cfg, params, "INT8_DEFAULT_CFG", batches)
        cm = compress.compress(model)
        prompt = jnp.asarray(np.random.default_rng(22).integers(0, 256, size=(2, 10)))
        ref, _ = _generate(cm, serve_engine.EngineConfig(max_seq_len=48), prompt)
        got, _ = _generate(
            cm,
            serve_engine.EngineConfig(
                max_seq_len=48, mesh=tp_mesh(2), overlap_collectives=True),
            prompt,
        )
        np.testing.assert_array_equal(got, ref)
