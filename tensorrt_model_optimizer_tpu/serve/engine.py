"""Quantized serving engine: prefill + on-device decode loop.

This is the "beyond the reference" serving path (SURVEY §7 stage 6): the
reference simulates quantization and delegates serving to TRT-LLM; here the
decode loop itself runs on TPU with real packed weights.

Design:
 - Packed projections (from `quant.compress`) are dequantized tile-by-tile
   inside the matmul (Pallas fused kernels; XLA fallback dequantizes per
   layer inside the scan — still never materializes all layers at once).
 - The whole decode loop runs on device via `lax.scan` over steps — one host
   dispatch per generation, not per token (dispatch latency through a remote
   chip would otherwise dominate).
 - KV cache layout [L, B, S, n_kv, hd]; optional int8/fp8 storage with
   per-head scales (the KV quantizers' calibrated amax).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..ops.pallas import qmm
from ..quant import quantizer as Q
from ..quant.compress import CompressedModel, decompress_weight


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_seq_len: int = 2048
    backend: str = "auto"  # "auto" | "pallas" | "xla"
    kv_dtype: Any = None  # None = model dtype; jnp.int8/float8_e4m3fn for quantized cache
    # paged decode attention via the Pallas kernel (scalar-prefetched block
    # tables); False = jnp gather path
    paged_attention_kernel: bool = False
    # Dense decode/prefill attention via the packed-KV Pallas kernel
    # (`ops/pallas/kv_attention.py`): the cache stays in STORED form
    # (int8/fp8/plane-packed NVFP4) laid out kv-head-major
    # [L, B, n_kv, S, C]; tiles dequantize in VMEM inside the attention
    # kernel and the bf16 cache image never materializes (the r04 BS64
    # collapse: ~19 GB/step of XLA dequant with the packed NVFP4 cache).
    # Prefill runs the GQA flash kernel over the fresh tokens' QDQ'd k/v
    # instead of an einsum over the full max_seq_len cache. TPU-native
    # analog of the reference's decode attention with in-kernel QDQ
    # (`kernels/common/attention/decode_attention.py:47,263`).
    # Unsupported (engine init raises): attention sinks / sliding windows
    # (GPT-OSS), Llama4 rope/nope chunking, attn_sparsity, and
    # tree-speculative mask_override steps.
    kv_attention_kernel: bool = False
    # NVFP4 serving layout: "word" converts to the row-pair SWAR kernel
    # layout at engine init — slope-timed on-chip at 204 us/gate-proj vs
    # 875 (blockdot) / 1243 (perm) / 955 (XLA decompress), 2026-08-18
    # (tools/probe_qmm_scan.py; earlier fori_loop microbenches were invalid,
    # see BENCH_RESULTS.md round-2 timing notes)
    # "word2" adds the 4-bytes-per-lane decode (qmm_nvfp4_word2: remapped
    # E2M1 affine construction) — DEFAULT since the r04 engine-level A/B:
    # 26.53 ms/step (1.083x chip-normalized bf16) vs word's 28.86 (0.98x)
    # at 8B L32 BS8 (artifacts/bench_r04/engine_nvfp4_*.json)
    # "bd4" is EXPERIMENTAL AND MEASURED SLOW: ~621 ms/step vs word2's
    # ~26.5 at 8B BS8 (artifacts/bench_r04b/engine_nvfp4_bd4_flat.json;
    # the default-TK run OOMed) — kept for the post-mortem record only,
    # word2 is the recommended layout. See BENCH_RESULTS.md "bd4".
    # "i8" = W8A8-class serving: weights re-encoded per-channel int8
    # (exact-to-8-bits E2M1 x E4M3 values) + per-token int8 acts on the
    # s8 MXU — the reference's W4A8 recast move applied to NVFP4
    # checkpoints. 8-bit HBM weight bytes (vs 4-bit for word2) traded for
    # the fast MXU class; changes act numerics (8-bit acts), opt-in.
    nvfp4_layout: str = "word2"  # "word"|"word2"|"i8"|"bd4"(slow)|"perm"|"blockdot"
    # INT4 serving layout: "word" converts to the row-pair magic-number
    # kernel layout (one full-depth dot; scales round to bf16) — on-chip
    # same-session A/B 2026-08-18 (bench_kernels BS8 gate-proj): word
    # 1927.7 us vs blockdot 2032.1 us, and word beats fp8 (2506.6 us)
    # "bd2" = block-major batched-dot layout (qmm_int4_bd2): post-dot block
    # scales + side-dot offsets — DEFAULT since the r04 engine-level A/B:
    # 18.93 ms/step (1.505x chip-normalized bf16) vs word's 22.52 (1.261x)
    # at 8B L32 BS8 (artifacts/bench_r04/engine_int4_*.json); falls back to
    # word2 on shapes bd2 can't tile (O not a multiple of 128, blocks
    # narrower than 128)
    # "xla" = XLA-native s4 storage + grouped convert-dot (qmm_int4_xla):
    # MEASURED AND RULED OUT as the escalation route — 102.4 ms/step
    # (0.275x) in the same A/B; kept for the record and for host-safe ckpts
    # "a8" = W4A8 native serving (qmm_int4_w48): int8-decoded nibbles +
    # per-token int8 acts on the s8 MXU path — the reference's fastest
    # 4-bit format at batch (W4A8 rows, benchmark.md:23-25). Changes act
    # numerics (8-bit acts), so it is opt-in, matching the W4A8 presets.
    int4_layout: str = "bd2"  # "word"|"word2"|"bd2"|"blockdot"|"xla"|"a8"
    # Tensor parallelism: a jax.sharding.Mesh with a `tp_axis` axis shards
    # the packed weights megatron-style (serve/tp.py) and runs every step
    # under shard_map (Pallas kernels see local shards; two psums/layer).
    mesh: Any = None
    tp_axis: str = "tp"
    # Data parallelism: when set (and present in `mesh`), the BATCH dim of
    # tokens/caches shards over this axis — each replica serves its own
    # requests with fully local attention; weights replicate across it.
    # Name the axis for the slowest interconnect it spans (e.g. "dcn" for
    # a cross-slice/host replica group): per-replica continuous batching is
    # exactly the multi-host serving topology — no cross-replica collective
    # ever runs in the decode step, so DCN latency never sits on the token
    # path (north-star "continuous batching across hosts").
    dp_axis: Optional[str] = None
    # Split row-parallel (o/down) projections into two output-column chunks
    # with independent psums: layer-i chunk-2's matmul is independent of
    # chunk-1's psum, giving XLA's latency-hiding scheduler a legal
    # comm/compute overlap inside the sequential decode dependency chain.
    # Byte/bf16 kinds only (packed 4-bit layouts don't O-slice); token
    # parity asserted in the dryrun.
    overlap_collectives: bool = False
    # Prefill skip-softmax attention sparsity (reference
    # `sparsity/attention_sparsity/methods/flash_skip_softmax.py`): score
    # blocks contributing < this relative probability mass are skipped in
    # the Pallas flash kernel. None = dense. Calibrate with
    # `sparsity.attention_sparsity.calibrate_threshold`. Prefill-only
    # (`Engine.prefill`); decode and tree-verify stay dense.
    attn_sparsity: Optional[float] = None
    attn_sparsity_blocks: tuple = (128, 128)


# Prefill row threshold above which 4-bit sites decompress the layer weight
# to bf16 once and run a plain MXU matmul instead of the fused
# decode-in-kernel path. Rationale: the fused kernels pay the nibble-decode
# + scale VPU tail PER ROW TILE; at N = B*T prefill rows the decode is
# re-done N/tn times, while a one-shot decompress (write+read ~2x the bf16
# weight bytes, ~0.15 ms/layer at 8B) amortizes over every row — the r04
# grid's 4-bit TTFT was 1.8x fp8's (int4 521 ms vs fp8 282 at BS1,
# grid.json) for exactly this reason. Decode (N < threshold) is unaffected.
# DEFAULT OFF (r5 grid measured the decompress route REGRESSING TTFT:
# int4-a8 718 ms / nvfp4 1428 ms at BS1-2048 vs the r4 fused-kernel
# prefills' 521/519 — the per-layer bf16 weight materialization costs more
# HBM traffic than re-paying the in-kernel decode per row tile). The fused
# kernels handle prefill rows since the r5 w48 row-tiling fix; set the env
# to ~512 to re-enable the decompress route for experiments.
_PREFILL_DECOMPRESS_ROWS = int(
    os.environ.get("ENGINE_PREFILL_DECOMPRESS_ROWS", "1000000000"))


def _slice_arrays_O(kind, arrays):
    """Split a byte/bf16 packed site into two output-column halves (for
    `EngineConfig.overlap_collectives`). None = kind doesn't O-slice."""
    if kind == "bf16":
        O = arrays["w"].shape[-2]
        h = O // 2
        if h == 0:
            return None
        return [{"w": arrays["w"][..., :h, :]}, {"w": arrays["w"][..., h:, :]}]
    if kind in ("int8", "fp8"):
        q = arrays["q"]
        h = q.shape[-2] // 2
        if h == 0:
            return None
        sc = arrays["scale"]
        def cut(lo, hi):
            out = {"q": q[..., lo:hi, :]}
            # int8: per-channel [O, 1]; fp8: per-tensor scalar
            out["scale"] = sc[..., lo:hi, :] if sc.ndim >= 2 else sc
            return out
        return [cut(0, h), cut(h, q.shape[-2])]
    return None


def _qlinear(x, name, kind, arrays, cm: CompressedModel, backend: str, ist=None,
             adapter=None, tp_axis=None, row=False, skip_input_quant=False,
             overlap=False):
    """Quantized matmul dispatch: y = q_act(x) @ dequant(W)^T.

    `x` is [B*T, K] 2-D. Input quantizers stay active on the real-quant path
    (reference `RealQuantLinear.forward`, `quant_linear.py:218`). Backend
    "pallas" uses the fused kernels; "xla" dequantizes the layer weight then
    matmuls (XLA fuses what it can).

    Under tensor parallelism (`tp_axis` set inside shard_map): `row=True`
    marks row-parallel sites (o/down) whose K dim is sharded — dynamic
    per-token act amaxes are `pmax`-reduced for single-device parity and the
    partial output is `psum`-reduced (adapter partials ride the same psum).
    """
    if overlap and row and tp_axis is not None and adapter is None:
        # two O-chunks, each with its OWN psum: chunk-2's matmul does not
        # depend on chunk-1's psum, so the latency-hiding scheduler can run
        # them concurrently (comm/compute overlap inside the decode chain)
        parts = _slice_arrays_O(kind, arrays)
        if parts is not None:
            return jnp.concatenate([
                _qlinear(x, name, kind, a, cm, backend, ist, None, tp_axis,
                         row=True, skip_input_quant=skip_input_quant)
                for a in parts
            ], axis=-1)
    reduce_amax = None
    if tp_axis is not None and row:
        reduce_amax = lambda am: jax.lax.pmax(am, tp_axis)
    icfg = cm.layout.get(f"{name}.input")
    if skip_input_quant:
        # caller already applied the block's shared input quantizer (MoE
        # experts share ONE site on the gate input, matching the
        # calibrated forward's semantics). ist must drop too: Q.quantize
        # applies pre_quant_scale even for disabled sites, so leaving the
        # state would scale the activations a second time.
        icfg = dataclasses.replace(icfg, enable=False)
        ist = None
    if kind == "int8" and icfg.enable and not icfg.is_fp:
        # W8A8 on the native int8 MXU: per-token dynamic act quant, int8 x
        # int8 -> int32, rescale by (act_scale * weight_scale). Exact
        # real-quant semantics of the fake-quant pair (per-token acts).
        if ist is not None and ist.pre_quant_scale is not None:
            x = x * ist.pre_quant_scale.astype(x.dtype)
        x32 = x.astype(jnp.float32)
        if icfg.dynamic or icfg.per_token or ist is None or ist.amax is None:
            a_amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # per token
            if reduce_amax is not None:
                a_amax = reduce_amax(a_amax)
        else:
            a_amax = jnp.broadcast_to(
                ist.amax.astype(jnp.float32).reshape(1, -1)[:, :1], (x.shape[0], 1)
            )
        a_scale = jnp.where(a_amax == 0, 1.0, a_amax / 127.0)
        x8 = jnp.clip(jnp.round(x32 / a_scale), -128, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, arrays["q"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * a_scale * arrays["scale"].reshape(1, -1)
        y = y.astype(x.dtype)
        if tp_axis is not None and row:
            y = jax.lax.psum(y, tp_axis)
        return y
    if kind == "int8a8":
        # W8A8-class serving of an NVFP4 checkpoint (nvfp4_layout="i8"):
        # per-channel int8 re-encode of the E2M1 x E4M3 dequant values +
        # per-token int8 acts on the s8 x s8 MXU (the reference's W4A8
        # recast move, `w4a8_awq_beta.yaml`, TPU-natively). Changes act
        # numerics (8-bit acts) like int4_layout="a8" — opt-in.
        if ist is not None and ist.pre_quant_scale is not None:
            x = x * ist.pre_quant_scale.astype(x.dtype)
        x32 = x.astype(jnp.float32)
        a_amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        if reduce_amax is not None:
            a_amax = reduce_amax(a_amax)
        a_scale = jnp.where(a_amax == 0, 1.0, a_amax / 127.0)
        x8 = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, arrays["q"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * a_scale * arrays["scale"].reshape(1, -1)
        y = y.astype(x.dtype)
        if adapter is not None:
            lo = (x @ adapter["A"].T.astype(x.dtype)) @ adapter["B"].T.astype(x.dtype)
            y = y + lo * adapter["scale"].astype(y.dtype)
        if tp_axis is not None and row:
            y = jax.lax.psum(y, tp_axis)
        return y
    if kind == "int4w48":
        # W4A8 native serving (int4_layout="a8"): per-token dynamic int8
        # acts + s8 x s8 MXU dots over int8-decoded nibbles
        # (qmm.qmm_int4_w48; reference W4A8 rows, benchmark.md:23-25 — its
        # fastest 4-bit at batch). The reference's act side is per-tensor
        # fp8; v5e has no fp8 MXU, so per-token int8 is the native analog.
        if ist is not None and ist.pre_quant_scale is not None:
            x = x * ist.pre_quant_scale.astype(x.dtype)
        x32 = x.astype(jnp.float32)
        a_amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        if reduce_amax is not None:
            a_amax = reduce_amax(a_amax)
        a_scale = jnp.where(a_amax == 0, 1.0, a_amax / 127.0)
        x8 = jnp.clip(jnp.round(x32 / a_scale), -127, 127).astype(jnp.int8)
        if x.shape[0] >= _PREFILL_DECOMPRESS_ROWS:
            # prefill rows: decompress once, one MXU matmul (see
            # _PREFILL_DECOMPRESS_ROWS); int8 codes are exact in bf16
            w = decompress_weight("int4w48", arrays, out_dtype=x.dtype)
            y = jax.lax.dot_general(
                x8.astype(x.dtype), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            y = qmm.qmm_int4_w48(x8, arrays["packed"], arrays["scales"])
        y = (y * a_scale).astype(x.dtype)
        if adapter is not None:
            lo = (x @ adapter["A"].T.astype(x.dtype)) @ adapter["B"].T.astype(x.dtype)
            y = y + lo * adapter["scale"].astype(y.dtype)
        if tp_axis is not None and row:
            y = jax.lax.psum(y, tp_axis)
        return y
    if icfg.enable or (ist is not None and ist.pre_quant_scale is not None):
        x = Q.quantize(x, icfg, ist, amax_reduce=reduce_amax)
    fourbit_kinds = ("int4", "int4w", "int4w2", "int4b2", "nvfp4", "nvfp4p",
                     "nvfp4w", "nvfp4w2", "nvfp4b4", "mxfp4w", "mxfp4w2")
    if (backend == "pallas" and kind in fourbit_kinds
            and x.shape[0] >= _PREFILL_DECOMPRESS_ROWS):
        # prefill rows: one-shot bf16 decompress + plain MXU matmul beats
        # re-running the nibble decode per row tile (r04 TTFT gap; see
        # _PREFILL_DECOMPRESS_ROWS)
        w = decompress_weight(kind, arrays, out_dtype=x.dtype)
        y = x @ w.T
    elif kind == "int4x" or (backend == "pallas" and kind in (
            "int8", "int4", "int4w", "int4w2", "int4b2", "nvfp4", "nvfp4p",
            "nvfp4w", "nvfp4w2", "mxfp4w", "mxfp4w2", "fp8")):
        # int4x (XLA-native s4 grouped dot) is backend-independent
        # NOTE "nvfp4p" was missing from this set until round 2's end: the
        # engine's default perm conversion silently routed every projection
        # through the XLA decompress path instead of the Pallas kernel.
        y = qmm.quantized_matmul(x, kind, arrays)
    else:
        w = decompress_weight(kind, arrays, out_dtype=x.dtype)
        y = x @ w.T
    if adapter is not None:
        # SVDQuant low-rank branch (`SVDQuantLinear`, quant_linear.py:117)
        lo = (x @ adapter["A"].T.astype(x.dtype)) @ adapter["B"].T.astype(x.dtype)
        y = y + lo * adapter["scale"].astype(y.dtype)
    if tp_axis is not None and row:
        y = jax.lax.psum(y, tp_axis)
    return y


def _moe_ffn(cfg, cm, backend, h2, lp, lstate, kinds, tp_axis=None):
    """Routed-expert FFN on packed weights (mixtral/qwen3-moe/gpt-oss).

    Routing/dispatch/activation semantics come from the model family
    (`models.mixtral.route/dispatch_combine/expert_act`) so serving is
    token-faithful to the calibrated forward; each expert's packed slice
    goes through the same `_qlinear` kernels as dense projections (a
    static python loop over E — traced once)."""
    from ..models import mixtral

    S, H = h2.shape
    E, k = cfg.num_experts, cfg.top_k
    C = max(int(cfg.capacity_factor * S * k / E), 1)
    logits = h2.astype(jnp.float32) @ lp["moe.router"].T.astype(jnp.float32)
    if cfg.router_bias:
        logits = logits + lp["moe.router__bias"].astype(jnp.float32)
    topw, topi = mixtral.route(cfg, logits)
    dispatch, combine = mixtral.dispatch_combine(cfg, topw, topi, S, C)
    E_loop = E
    if tp_axis is not None:
        # expert parallelism: this device holds E/d experts; routing is
        # computed on the replicated activations, the dispatch/combine
        # slices pick the local experts, and the combine partial psums
        E_loop = jax.tree.leaves(lp["moe.gate_proj"])[0].shape[0]
        e0 = jax.lax.axis_index(tp_axis) * E_loop
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, e0, E_loop, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, e0, E_loop, axis=1)
    xe = jnp.einsum("sec,sh->ech", dispatch, h2.astype(jnp.float32)).astype(h2.dtype)
    ist = (lstate or {}).get("moe.gate_proj", {}).get("input")
    icfg_g = cm.layout.get("moe.gate_proj.input")
    ye = []
    for e in range(E_loop):
        sl = lambda n: jax.tree.map(lambda a: a[e], lp[n])
        xq = xe[e]
        if icfg_g.enable or (ist is not None and ist.pre_quant_scale is not None):
            # ONE shared input site per expert block (the calibrated
            # forward quantizes h_in once before gate AND up; down input
            # stays unquantized — mixtral._moe_mlp semantics)
            xq = Q.quantize(xq, icfg_g, ist)
        g = _qlinear(xq, "moe.gate_proj", kinds["moe.gate_proj"],
                     sl("moe.gate_proj"), cm, backend, ist, None, tp_axis,
                     skip_input_quant=True)
        u = _qlinear(xq, "moe.up_proj", kinds["moe.up_proj"],
                     sl("moe.up_proj"), cm, backend, ist, None, tp_axis,
                     skip_input_quant=True)
        if cfg.moe_bias:
            g = g + lp["moe.gate_proj__bias"][e].astype(g.dtype)
            u = u + lp["moe.up_proj__bias"][e].astype(u.dtype)
        y = mixtral.expert_act(cfg, g, u).astype(h2.dtype)
        d = _qlinear(y, "moe.down_proj", kinds["moe.down_proj"],
                     sl("moe.down_proj"), cm, backend, None, None, tp_axis,
                     skip_input_quant=True)
        if cfg.moe_bias:
            d = d + lp["moe.down_proj__bias"][e].astype(d.dtype)
        ye.append(d)
    ye = jnp.stack(ye)  # [E(_local), C, H]
    y = jnp.einsum(
        "sec,ech->sh", combine, ye.astype(jnp.float32)
    ).astype(h2.dtype)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y


def _ffn(cfg, cm, backend, h2, lp, lstate, kinds, ist, ad, tp_axis=None,
         overlap=False):
    """Dense or routed FFN on packed weights (dispatch on the layer leaves)."""
    if "moe.gate_proj" in lp:
        y = _moe_ffn(cfg, cm, backend, h2, lp, lstate, kinds, tp_axis)
        if "shared.gate_proj" in lp:  # Llama4 shared expert adds in
            g = _qlinear(h2, "shared.gate_proj", kinds["shared.gate_proj"], lp["shared.gate_proj"], cm, backend, ist("shared.gate_proj"), None, tp_axis)
            u = _qlinear(h2, "shared.up_proj", kinds["shared.up_proj"], lp["shared.up_proj"], cm, backend, ist("shared.up_proj"), None, tp_axis)
            ys = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(h2.dtype)
            y = y + _qlinear(ys, "shared.down_proj", kinds["shared.down_proj"], lp["shared.down_proj"], cm, backend, ist("shared.down_proj"), None, tp_axis, row=True, overlap=overlap)
        return y
    g = _qlinear(h2, "mlp.gate_proj", kinds["mlp.gate_proj"], lp["mlp.gate_proj"], cm, backend, ist("mlp.gate_proj"), ad("mlp.gate_proj"), tp_axis)
    u = _qlinear(h2, "mlp.up_proj", kinds["mlp.up_proj"], lp["mlp.up_proj"], cm, backend, ist("mlp.up_proj"), ad("mlp.up_proj"), tp_axis)
    y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(h2.dtype)
    return _qlinear(y, "mlp.down_proj", kinds["mlp.down_proj"], lp["mlp.down_proj"], cm, backend, ist("mlp.down_proj"), ad("mlp.down_proj"), tp_axis, row=True, overlap=overlap)


def _kv_pack_width(hd: int) -> int:
    """Last-axis byte width of the packed NVFP4 cache for head_dim `hd`:
    hd/2 nibble bytes + hd/16 E4M3 block-scale bytes = 9*hd/16."""
    assert hd % 16 == 0, f"NVFP4 KV needs head_dim % 16 == 0, got {hd}"
    return hd * 9 // 16


def _kv_store(v: jax.Array, dtype, amax: Optional[jax.Array]):
    """Quantize k/v for cache storage. Returns stored array (+ scale baked)."""
    from ..ops import numerics

    if dtype == "nvfp4":
        # REAL packed NVFP4 KV (VERDICT r3 item #7): E2M1 nibbles + E4M3
        # block-16 scales along head_dim, byte-concatenated into ONE uint8
        # array [..., 9*hd/16] so the cache pytree / update-slice / TP specs
        # are unchanged. 3.55x smaller than bf16 storage (2*hd bytes).
        # Numerics are bit-identical to the fake-quant form ("nvfp4_fake"):
        # real_quant_nvfp4 and fake_quant_nvfp4 share the same two-level
        # scale math (reference contract nvfp4_quant.py:92-110).
        # The global scale must be static per layer for storage, so an
        # uncalibrated cache (amax None) uses gs=1 (amax = 6*448) rather
        # than the fake path's per-call dynamic global.
        g = (amax if amax is not None
             else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
        packed, s8, _ = numerics.real_quant_nvfp4(v, 16, g)
        return jnp.concatenate(
            [packed, jax.lax.bitcast_convert_type(s8, jnp.uint8)], axis=-1)
    if dtype == "nvfp4_fake":
        # legacy emulated cache: E2M1 block-quantized values stored bf16
        g = amax if amax is not None else None
        return numerics.fake_quant_nvfp4(v, 16, g, axis=-1)
    if dtype is None or v.dtype == dtype:
        return v
    if dtype == jnp.int8:
        scale = (amax if amax is not None else 448.0) / 127.0
        return jnp.clip(jnp.round(v.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    if dtype == jnp.float8_e4m3fn:
        amax = amax if amax is not None else jnp.asarray(448.0)
        scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 448.0
        return jnp.clip(v.astype(jnp.float32) / scale, -448, 448).astype(jnp.float8_e4m3fn)
    return v.astype(dtype)


def _kv_load(stored: jax.Array, out_dtype, kv_dtype, amax: Optional[jax.Array]):
    if kv_dtype == "nvfp4":  # packed nibbles + fp8 block scales (see store)
        from ..ops import numerics

        hd = stored.shape[-1] * 16 // 9
        p = hd // 2
        codes = numerics.unpack_nibbles(stored[..., :p])
        q = numerics.codes_to_fp4(codes)  # f32 E2M1 grid values
        s8 = jax.lax.bitcast_convert_type(
            stored[..., p:], jnp.float8_e4m3fn).astype(jnp.float32)
        g = (amax if amax is not None
             else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
        gs = numerics.nvfp4_global_scale(g)
        sb = jnp.where(s8 <= 0.0, 1.0, s8) * gs
        return (q * jnp.repeat(sb, 16, axis=-1)).astype(out_dtype)
    if kv_dtype == "nvfp4_fake":  # stored pre-dequantized (bf16 grid values)
        return stored.astype(out_dtype)
    if kv_dtype is None or stored.dtype == out_dtype:
        return stored.astype(out_dtype)
    if kv_dtype == jnp.int8:
        scale = (amax if amax is not None else 448.0) / 127.0
        return (stored.astype(jnp.float32) * scale).astype(out_dtype)
    if kv_dtype == jnp.float8_e4m3fn:
        amax = amax if amax is not None else jnp.asarray(448.0)
        scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 448.0
        return (stored.astype(jnp.float32) * scale).astype(out_dtype)
    return stored.astype(out_dtype)


def _kv_amax_from(qstate, which: str) -> Optional[jax.Array]:
    st = (qstate or {}).get(f"self_attn.{which}_bmm")
    if st is None or st.amax is None:
        return None
    # [L] or [L, 1, 1, n_kv, hd]-ish; reduce to per-layer scalar for cache
    a = st.amax
    return a.reshape(a.shape[0], -1).max(axis=-1)  # [L]


def _kv_fmt(kv_dtype) -> str:
    """Map EngineConfig.kv_dtype to the kv_attention kernel format tag."""
    if kv_dtype == "nvfp4":
        return "nvfp4"
    if kv_dtype == jnp.int8:
        return "int8"
    if kv_dtype == jnp.float8_e4m3fn:
        return "fp8"
    # None / model dtype / "nvfp4_fake" (stored as dequantized bf16 grid
    # values) all serve as plain values with unit global scales
    return "bf16"


def _kv_globals(kv_dtype, k_amax_l, v_amax_l):
    """Per-layer GLOBAL dequant scales (folded outside the kernel: k's into
    q, v's into the context). Block scales (NVFP4) stay in-kernel."""
    from ..ops import numerics

    def one(amax):
        if kv_dtype == jnp.int8:
            return (amax if amax is not None else 448.0) / 127.0
        if kv_dtype == jnp.float8_e4m3fn:
            a = (amax if amax is not None else jnp.asarray(448.0))
            return jnp.maximum(a.astype(jnp.float32), 1e-12) / 448.0
        if kv_dtype == "nvfp4":
            g = (amax if amax is not None
                 else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
            return numerics.nvfp4_global_scale(g)
        return jnp.asarray(1.0, jnp.float32)

    return one(k_amax_l), one(v_amax_l)


def _kv_store_kvh(v: jax.Array, kv_dtype, amax):
    """Quantize k/v [B, T, n_kv, hd] into the kv-head-major kernel cache
    form: (stored [B, n_kv, T, C], scales [B, n_kv, T, hd/16] | None)."""
    from ..ops import numerics

    vt = jnp.swapaxes(v, 1, 2)  # [B, n_kv, T, hd]
    if kv_dtype == "nvfp4":
        g = (amax if amax is not None
             else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
        planes, sbits, _ = numerics.real_quant_nvfp4_planes(vt, 16, g)
        return planes, sbits
    return _kv_store(vt, kv_dtype, amax), None


def _kv_code_new(stored: jax.Array, scales, kv_dtype, out_dtype):
    """Stored form -> CODE-DOMAIN values [B, n_kv, T, hd] (global scale NOT
    applied — the kernel's q/ctx folding covers it)."""
    from ..ops import numerics

    if kv_dtype == "nvfp4":
        return numerics.nvfp4_planes_code_load(stored, scales, out_dtype)
    if kv_dtype in (jnp.int8, jnp.float8_e4m3fn):
        return stored.astype(jnp.float32).astype(out_dtype)
    return stored.astype(out_dtype)


def _layer_forward(cfg, ecfg, cm, backend, x, lp, lstate, kinds, positions, mask,
                   ck, cv, pos, k_amax_l, v_amax_l, tp_axis=None,
                   sparse_prefill=False, alt_flag=None, decode_inplace=False,
                   kvk=False, cks=None, cvs=None):
    """One decoder layer on packed weights. ck/cv: [B, S, n_kv, hd] stored.

    `alt_flag` is the per-layer scan-traced bool used by alternating
    architectures: GPT-OSS (True = sliding mask, already folded into
    `mask`) and Llama4 (True = rope+chunked layer, False = nope layer with
    attention temperature tuning).

    `decode_inplace` (T == 1 only): do NOT write the cache here — return
    the current token's STORED-form k/v instead of updated ck/cv, and
    attend via split attention (scores over the old cache + the current
    token's own QDQ'd k/v patched in at `pos`). The caller batches one
    in-place cache update after the layer scan. Rationale: threading the
    cache through lax.scan as ys makes XLA materialize a FRESH full cache
    (+ zero-init temps) every model step — 2 x 1.27 GB HLO temps at BS64
    with the packed NVFP4 cache (r04 BS64 grid OOM, 190 MB over HBM), and
    a full-cache write per step on the relay."""
    B, T, H = x.shape
    hd, nH, nKV = cfg.hd, cfg.num_attention_heads, cfg.num_key_value_heads
    eps = cfg.rms_norm_eps

    def ist(name):
        return (lstate or {}).get(name, {}).get("input")

    def ad(name):
        return (lp.get("__adapters__") or {}).get(name) if "__adapters__" in lp else None

    h = llama.norm(cfg, x, lp["input_layernorm"])
    h2 = h.reshape(B * T, H)

    q = _qlinear(h2, "self_attn.q_proj", kinds["self_attn.q_proj"], lp["self_attn.q_proj"], cm, backend, ist("self_attn.q_proj"), ad("self_attn.q_proj"), tp_axis)
    k = _qlinear(h2, "self_attn.k_proj", kinds["self_attn.k_proj"], lp["self_attn.k_proj"], cm, backend, ist("self_attn.k_proj"), ad("self_attn.k_proj"), tp_axis)
    v = _qlinear(h2, "self_attn.v_proj", kinds["self_attn.v_proj"], lp["self_attn.v_proj"], cm, backend, ist("self_attn.v_proj"), ad("self_attn.v_proj"), tp_axis)
    # Qwen2-style attention biases ride alongside the packed weights
    if "self_attn.q_proj__bias" in lp:
        q = q + lp["self_attn.q_proj__bias"].astype(q.dtype)
        k = k + lp["self_attn.k_proj__bias"].astype(k.dtype)
        v = v + lp["self_attn.v_proj__bias"].astype(v.dtype)
    if cfg.clip_qkv is not None:  # DBRX qkv clamp (llama._attention rule)
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
    q = q.reshape(B, T, nH, hd)
    k = k.reshape(B, T, nKV, hd)
    v = v.reshape(B, T, nKV, hd)
    if hasattr(cfg, "use_rope_layers"):  # Llama4 rope/nope layers — the
        # SAME helper the parity-tested model forward uses
        from ..models.llama4 import rope_or_temperature

        q, k = rope_or_temperature(cfg, q, k, positions, alt_flag)
    else:
        if "self_attn.q_norm" in lp:  # Qwen3-style per-head norms
            q = llama.rms_norm(q, lp["self_attn.q_norm"], eps)
            k = llama.rms_norm(k, lp["self_attn.k_norm"], eps)
        q = llama.rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
        k = llama.rope(k, positions, cfg.rope_theta, cfg.rope_scaling)

    kv_dtype = ecfg.kv_dtype
    if kvk:
        # Packed-KV Pallas attention (EngineConfig.kv_attention_kernel):
        # kv-head-major stored-form cache, in-VMEM dequant — see
        # ops/pallas/kv_attention.py. Global scales fold into q / ctx.
        from ..ops.pallas import kv_attention as kva

        kg, vg = _kv_globals(kv_dtype, k_amax_l, v_amax_l)
        k_st, k_sc = _kv_store_kvh(k, kv_dtype, k_amax_l)
        v_st, v_sc = _kv_store_kvh(v, kv_dtype, v_amax_l)
        if decode_inplace:
            kn = _kv_code_new(k_st, k_sc, kv_dtype, cfg.dtype)
            vn = _kv_code_new(v_st, v_sc, kv_dtype, cfg.dtype)
            q_eff = q.reshape(B, nH, hd).astype(jnp.float32) * (
                jnp.asarray(kg, jnp.float32) / math.sqrt(hd))
            ctx = kva.kv_decode_attention(
                q_eff, ck, cv, kn, vn, pos, _kv_fmt(kv_dtype),
                k_scales=cks, v_scales=cvs)
            ctx = (ctx * vg).astype(x.dtype).reshape(B * T, nH * hd)
            k_leg, v_leg = (k_st, k_sc), (v_st, v_sc)
        else:
            # fresh prefill (Engine.prefill contract: empty cache, pos=0);
            # attention spans exactly the T fresh tokens via the GQA flash
            # kernel over their QDQ'd k/v — no full-max_seq_len einsum (or
            # its [B, nH, T, S] score tensor) on the TTFT path
            ck = jax.lax.dynamic_update_slice(ck, k_st, (0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_st, (0, 0, pos, 0))
            if cks is not None:
                cks = jax.lax.dynamic_update_slice(cks, k_sc, (0, 0, pos, 0))
                cvs = jax.lax.dynamic_update_slice(cvs, v_sc, (0, 0, pos, 0))
            kq = (_kv_code_new(k_st, k_sc, kv_dtype, jnp.float32)
                  * kg).astype(cfg.dtype)
            vq = (_kv_code_new(v_st, v_sc, kv_dtype, jnp.float32)
                  * vg).astype(cfg.dtype)
            from ..ops.pallas import flash_gqa

            qt = q.transpose(0, 2, 1, 3)  # [B, nH, T, hd]
            pad = (-T) % 8  # Pallas row tiles; padded keys are causal-masked
            if pad:
                qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
                kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
                vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
            ctx = flash_gqa.flash_attention_gqa(qt, kq, vq, causal=True)
            ctx = (ctx[:, :, :T].transpose(0, 2, 1, 3)
                   .reshape(B * T, nH * hd).astype(x.dtype))
            k_leg, v_leg = (ck, cks), (cv, cvs)
        attn = _qlinear(ctx, "self_attn.o_proj", kinds["self_attn.o_proj"], lp["self_attn.o_proj"], cm, backend, ist("self_attn.o_proj"), ad("self_attn.o_proj"), tp_axis, row=True, overlap=ecfg.overlap_collectives)
        if "self_attn.o_proj__bias" in lp:
            attn = attn + lp["self_attn.o_proj__bias"].astype(attn.dtype)
        x = x + attn.reshape(B, T, H)
        h = llama.norm(cfg, x, lp["post_attention_layernorm"])
        h2 = h.reshape(B * T, H)
        d = _ffn(cfg, cm, backend, h2, lp, lstate, kinds, ist, ad, tp_axis,
                 overlap=ecfg.overlap_collectives)
        x = x + d.reshape(B, T, H)
        return x, k_leg, v_leg, None
    if decode_inplace:
        # T == 1 split-attention decode: QDQ the current token's k/v (same
        # numerics as store-then-load), attend over the OLD cache with the
        # pos slot patched, and hand the stored rows back for ONE batched
        # post-scan cache update (see docstring).
        k_st = _kv_store(k, kv_dtype, k_amax_l).astype(ck.dtype)
        v_st = _kv_store(v, kv_dtype, v_amax_l).astype(cv.dtype)
        k_q = _kv_load(k_st, cfg.dtype, kv_dtype, k_amax_l)  # [B, 1, nKV, hd]
        v_q = _kv_load(v_st, cfg.dtype, kv_dtype, v_amax_l)
        k_all = _kv_load(ck, cfg.dtype, kv_dtype, k_amax_l)
        v_all = _kv_load(cv, cfg.dtype, kv_dtype, v_amax_l)
        rep = nH // nKV
        qg = q.reshape(B, T, nKV, rep, hd)
        scores = jnp.einsum("btgrd,bsgd->bgrts", qg, k_all,
                            preferred_element_type=jnp.float32)
        s_new = jnp.einsum("btgrd,bugd->bgrtu", qg, k_q,
                           preferred_element_type=jnp.float32)
        scores = jax.lax.dynamic_update_slice(
            scores, s_new, (0, 0, 0, 0, pos))  # slot pos = current token
        scores = scores.reshape(B, nH, T, -1) / math.sqrt(hd) + mask
        sinks = lp.get("self_attn.sinks")
        if sinks is not None:
            probs = llama.sink_softmax(scores, sinks, x.dtype)
        else:
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        w_new = jax.lax.dynamic_slice(
            probs, (0, 0, 0, pos), (B, nH, T, 1))  # weight of current token
        probs = jax.lax.dynamic_update_slice(
            probs, jnp.zeros_like(w_new), (0, 0, 0, pos))  # old slot is stale
        probs = probs.reshape(B, nKV, rep, T, -1)
        ctx = jnp.einsum("bgrts,bsgd->btgrd", probs, v_all)
        ctx = ctx + jnp.einsum(
            "bgrtu,bugd->btgrd", w_new.reshape(B, nKV, rep, T, 1), v_q)
        ctx = ctx.reshape(B * T, nH * hd)
        attn = _qlinear(ctx, "self_attn.o_proj", kinds["self_attn.o_proj"], lp["self_attn.o_proj"], cm, backend, ist("self_attn.o_proj"), ad("self_attn.o_proj"), tp_axis, row=True, overlap=ecfg.overlap_collectives)
        if "self_attn.o_proj__bias" in lp:
            attn = attn + lp["self_attn.o_proj__bias"].astype(attn.dtype)
        x = x + attn.reshape(B, T, H)
        h = llama.norm(cfg, x, lp["post_attention_layernorm"])
        h2 = h.reshape(B * T, H)
        d = _ffn(cfg, cm, backend, h2, lp, lstate, kinds, ist, ad, tp_axis,
                 overlap=ecfg.overlap_collectives)
        x = x + d.reshape(B, T, H)
        return x, k_st, v_st, None
    ck = jax.lax.dynamic_update_slice_in_dim(
        ck, _kv_store(k, kv_dtype, k_amax_l).astype(ck.dtype), pos, axis=1
    )
    cv = jax.lax.dynamic_update_slice_in_dim(
        cv, _kv_store(v, kv_dtype, v_amax_l).astype(cv.dtype), pos, axis=1
    )
    keep_frac = None
    if sparse_prefill:
        # Skip-softmax flash kernel over the T fresh tokens (prefill into an
        # empty cache: attention span == the new tokens, causal). Scores use
        # the pre-store (unquantized) k/v; the cache keeps stored form.
        from ..ops.pallas import sparse_attention

        rep = nH // nKV
        kf = jnp.repeat(k, rep, axis=2).transpose(0, 2, 1, 3).reshape(B * nH, T, hd)
        vf = jnp.repeat(v, rep, axis=2).transpose(0, 2, 1, 3).reshape(B * nH, T, hd)
        qf = q.transpose(0, 2, 1, 3).reshape(B * nH, T, hd)
        bqt, bkt = ecfg.attn_sparsity_blocks
        ctx, keep = sparse_attention.skip_softmax_flash(
            qf, kf, vf, threshold=ecfg.attn_sparsity,
            block_q=bqt, block_k=bkt, causal=True,
        )
        ctx = ctx.reshape(B, nH, T, hd).transpose(0, 2, 1, 3).reshape(B * T, nH * hd)
        ctx = ctx.astype(x.dtype)
        keep_frac = jnp.mean(keep.astype(jnp.float32))
    else:
        k_all = _kv_load(ck, cfg.dtype, kv_dtype, k_amax_l)
        v_all = _kv_load(cv, cfg.dtype, kv_dtype, v_amax_l)

        # Grouped GQA: K/V stay at nKV heads through both einsums. The old
        # jnp.repeat path materialized [B, S, nH, hd] K AND V every step —
        # ~6 ms/step of pure HBM traffic for llama3-8b at BS8/512ctx (decode
        # ablation 2026-08-18: engine fused 23.7 ms vs grouped-local 17.1).
        # Head order matches repeat(k, rep, axis=2): head n <-> (g, r) with
        # n = g * rep + r, so the [B, g, r, T, S] <-> [B, nH, T, S] reshapes
        # are views, and sink-softmax sees the standard per-head layout.
        rep = nH // nKV
        qg = q.reshape(B, T, nKV, rep, hd)
        scores = jnp.einsum("btgrd,bsgd->bgrts", qg, k_all,
                            preferred_element_type=jnp.float32)
        scores = scores.reshape(B, nH, T, -1) / math.sqrt(hd) + mask
        sinks = lp.get("self_attn.sinks")
        if sinks is not None:
            probs = llama.sink_softmax(scores, sinks, x.dtype)
        else:
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        probs = probs.reshape(B, nKV, rep, T, -1)
        ctx = jnp.einsum("bgrts,bsgd->btgrd", probs, v_all).reshape(B * T, nH * hd)

    attn = _qlinear(ctx, "self_attn.o_proj", kinds["self_attn.o_proj"], lp["self_attn.o_proj"], cm, backend, ist("self_attn.o_proj"), ad("self_attn.o_proj"), tp_axis, row=True, overlap=ecfg.overlap_collectives)
    if "self_attn.o_proj__bias" in lp:  # GPT-OSS biases all four projections
        attn = attn + lp["self_attn.o_proj__bias"].astype(attn.dtype)
    x = x + attn.reshape(B, T, H)

    h = llama.norm(cfg, x, lp["post_attention_layernorm"])
    h2 = h.reshape(B * T, H)
    d = _ffn(cfg, cm, backend, h2, lp, lstate, kinds, ist, ad, tp_axis,
             overlap=ecfg.overlap_collectives)
    x = x + d.reshape(B, T, H)
    return x, ck, cv, keep_frac


def _model_step(cfg, ecfg, cm, backend, params, qstate, tokens, cache, positions,
                mask_override=None, full_logits=False, return_hidden=False,
                tp_axis=None, sparse_prefill=False):
    """Forward over packed weights with cache update. tokens [B, T].

    `params`/`qstate` are explicit jit arguments — closing over them would
    bake gigabytes of packed weights into the lowered program as constants.
    `cm` supplies only static info (kinds, layout). `mask_override`
    ([1,1,T,S] additive over CACHE INDICES) replaces the causal mask — used
    by tree-speculative verification where cache slot != token position.
    """
    B, T = tokens.shape
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    S = cache["k"].shape[2]
    kpos = jnp.arange(S)[None, :]
    qpos = positions[0][:, None]
    if mask_override is not None:
        mask = mask_override
    else:
        mask = jnp.where(kpos <= qpos, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)
    # Alternating-attention families: a per-layer flag rides the scan.
    # GPT-OSS: flagged layers see only the last `sliding_window` keys.
    # Llama4: flagged (rope) layers see only their `attention_chunk_size`
    # chunk; unflagged (nope) layers stay fully causal.
    window = getattr(cfg, "sliding_window", None)
    ltypes = (cfg.resolved_layer_types()
              if hasattr(cfg, "resolved_layer_types") else None)
    L_ = cfg.num_hidden_layers
    if window and ltypes and mask_override is None:
        slide_mask = jnp.where(
            (kpos <= qpos) & (kpos > qpos - window), 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)
        sliding_flags = jnp.asarray(
            [t == "sliding_attention" for t in ltypes], jnp.bool_)
    elif hasattr(cfg, "use_rope_layers") and mask_override is None:
        chunk = cfg.attention_chunk_size
        slide_mask = jnp.where(
            (kpos <= qpos) & (kpos // chunk == qpos // chunk), 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)
        sliding_flags = jnp.asarray(cfg.use_rope_layers(), jnp.bool_)
    else:  # (tree-verify mask_override applies to every layer)
        slide_mask = mask
        sliding_flags = (jnp.asarray(cfg.use_rope_layers(), jnp.bool_)
                         if hasattr(cfg, "use_rope_layers")
                         else jnp.zeros((L_,), jnp.bool_))
    kinds = cm.kinds
    k_amax = _kv_amax_from(qstate, "k")
    v_amax = _kv_amax_from(qstate, "v")

    # T == 1 decode: the cache stays a scan INPUT only — each layer emits
    # just its new stored k/v row and ONE batched dynamic_update_slice
    # lands them after the scan. Threading the cache through scan ys made
    # XLA materialize a fresh full cache + zero-init temps every step
    # (2 x 1.27 GB at BS64/nvfp4-KV — the r04 BS64 OOM) and write the
    # whole cache per step.
    decode_inplace = (T == 1 and mask_override is None and not sparse_prefill)
    kvk = ecfg.kv_attention_kernel
    if kvk and (mask_override is not None or sparse_prefill):
        raise NotImplementedError(
            "kv_attention_kernel does not support mask_override "
            "(tree-speculative) or sparse-prefill steps")

    def body(carry, per_layer):
        x = carry
        lp, lstate, ck, cv, cks, cvs, ka, va, sliding = per_layer
        mask_l = jnp.where(sliding, slide_mask, mask)
        x, ck, cv, keep_frac = _layer_forward(
            cfg, ecfg, cm, backend, x, lp, lstate, kinds, positions, mask_l, ck, cv,
            cache["pos"], ka, va, tp_axis=tp_axis, sparse_prefill=sparse_prefill,
            alt_flag=sliding, decode_inplace=decode_inplace,
            kvk=kvk, cks=cks, cvs=cvs,
        )
        ys = (ck, cv) if not sparse_prefill else (ck, cv, keep_frac)
        return x, ys

    L = cfg.num_hidden_layers
    # Uncalibrated quantized KV: use the documented 448 default amax (the
    # _kv_store fallback) — a zeros placeholder makes scale = 0 and stores
    # garbage (pre-r5 behavior on BOTH paths; timing-only benches never
    # noticed, parity tests always calibrate)
    default_amax = jnp.full((L,), 448.0)
    ka = k_amax if k_amax is not None else default_amax
    va = v_amax if v_amax is not None else default_amax
    # Per-layer input-quantizer state rides through the scan (stacked [L, ...])
    act_state = {
        name: {"input": sub["input"]}
        for name, sub in (qstate or {}).items()
        if isinstance(sub, dict) and "input" in sub
    }
    xs = (params["layers"], act_state, cache["k"], cache["v"],
          cache.get("ks"), cache.get("vs"), ka, va, sliding_flags)
    keep_fracs = None
    cks = cvs = None
    if sparse_prefill:
        x, (ck, cv, keep_fracs) = jax.lax.scan(body, x, xs)
    elif kvk:
        x, ((ck, cks), (cv, cvs)) = jax.lax.scan(body, x, xs)
    else:
        x, (ck, cv) = jax.lax.scan(body, x, xs)
    if decode_inplace and kvk:
        # stacked new rows [L, B, n_kv, 1, C] (+ scales) -> one in-place
        # update at `pos` on the sequence axis of [L, B, n_kv, S, C]
        ck = jax.lax.dynamic_update_slice(
            cache["k"], ck, (0, 0, 0, cache["pos"], 0))
        cv = jax.lax.dynamic_update_slice(
            cache["v"], cv, (0, 0, 0, cache["pos"], 0))
        if cks is not None:
            cks = jax.lax.dynamic_update_slice(
                cache["ks"], cks, (0, 0, 0, cache["pos"], 0))
            cvs = jax.lax.dynamic_update_slice(
                cache["vs"], cvs, (0, 0, 0, cache["pos"], 0))
    elif decode_inplace:
        # ck/cv are the stacked new rows [L, B, 1, nKV, ...]; one in-place
        # update at `pos` along the sequence axis of [L, B, S, nKV, ...]
        zeros = (0,) * (cache["k"].ndim - 3)
        ck = jax.lax.dynamic_update_slice(
            cache["k"], ck, (0, 0, cache["pos"]) + zeros)
        cv = jax.lax.dynamic_update_slice(
            cache["v"], cv, (0, 0, cache["pos"]) + zeros)
    x = llama.norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    if full_logits:
        logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    else:
        logits = (x[:, -1, :] @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    new_cache = {"k": ck, "v": cv, "pos": cache["pos"] + T}
    if kvk and cks is not None:
        new_cache["ks"], new_cache["vs"] = cks, cvs
    if return_hidden:
        return logits, new_cache, x
    if sparse_prefill:
        return logits, new_cache, keep_fracs
    return logits, new_cache


def _kv_scales(kv_dtype, k_amax_l, v_amax_l):
    """Dequant scales for quantized-KV kernels (fold k into q, v into ctx)."""
    if kv_dtype == jnp.int8:
        return ((k_amax_l if k_amax_l is not None else 448.0) / 127.0,
                (v_amax_l if v_amax_l is not None else 448.0) / 127.0)
    if kv_dtype == jnp.float8_e4m3fn:
        k = jnp.maximum((k_amax_l if k_amax_l is not None else jnp.asarray(448.0)).astype(jnp.float32), 1e-12) / 448.0
        v = jnp.maximum((v_amax_l if v_amax_l is not None else jnp.asarray(448.0)).astype(jnp.float32), 1e-12) / 448.0
        return k, v
    if kv_dtype == "nvfp4":  # packed planes: the fp32 GLOBAL scale only
        from ..ops import numerics

        def g(amax):
            a = (amax if amax is not None
                 else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
            return numerics.nvfp4_global_scale(a)

        return g(k_amax_l), g(v_amax_l)
    return None, None


def _paged_layer_attn(cfg, ecfg, x_q, k_new, v_new, layer_kp, layer_vp, cache,
                      positions, k_amax_l, v_amax_l, write_mask=None,
                      layer_ksc=None, layer_vsc=None):
    """Paged attention for ONE layer, T tokens per slot (T=1 decode, T>1
    chunked prefill). Returns ctx [B, T, nH*hd] + updated pages (+ scale
    pages when the pool is packed NVFP4)."""
    import math as _math

    from . import paged_cache as pc

    B, T = x_q.shape[0], x_q.shape[1]
    nH, nKV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    page = layer_kp.shape[2]
    # Packed-NVFP4 page pool (PagedKV.k_scales present): pages hold
    # plane-packed nibbles + E4M3 block scales and the kernels dequantize
    # per tile (replaces the r04 bf16-stored fake-quant fallback). Without
    # scale pools, NVFP4 still runs the emulated (fake-quant, bf16) form.
    packed4 = layer_ksc is not None
    kv_dtype = ecfg.kv_dtype
    if kv_dtype == "nvfp4" and not packed4:
        kv_dtype = "nvfp4_fake"
    # write the T new tokens' kv at positions seq_lens .. seq_lens+T-1
    pos = cache.seq_lens
    tok_pos = pos[:, None] + jnp.arange(T)[None, :]  # [B, T]
    pidx = tok_pos // page
    poff = tok_pos % page
    page_ids = jnp.maximum(
        jnp.take_along_axis(cache.block_table, jnp.minimum(pidx, cache.block_table.shape[1] - 1), axis=1), 0
    )  # [B, T]
    if write_mask is not None:
        # non-writing slots target the scratch page (page 0)
        page_ids = jnp.where(write_mask[:, None], page_ids, 0)
    ids, offs = page_ids.reshape(-1), poff.reshape(-1)
    if packed4:
        from ..ops import numerics

        gk = (k_amax_l if k_amax_l is not None
              else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
        gv = (v_amax_l if v_amax_l is not None
              else jnp.asarray(numerics.NVFP4_GLOBAL_DIV, jnp.float32))
        ks, ks_sc, _ = numerics.real_quant_nvfp4_planes(k_new, 16, gk)
        vs, vs_sc, _ = numerics.real_quant_nvfp4_planes(v_new, 16, gv)
        layer_ksc = layer_ksc.at[ids, :, offs].set(
            ks_sc.reshape(B * T, nKV, hd // 16), unique_indices=True,
            mode="drop")
        layer_vsc = layer_vsc.at[ids, :, offs].set(
            vs_sc.reshape(B * T, nKV, hd // 16), unique_indices=True,
            mode="drop")
    else:
        ks = _kv_store(k_new, kv_dtype, k_amax_l).astype(layer_kp.dtype)
        vs = _kv_store(v_new, kv_dtype, v_amax_l).astype(layer_vp.dtype)
        ks_sc = vs_sc = None
    # unique indices (each (slot, t) owns a distinct page/offset pair)
    Cw = layer_kp.shape[-1]
    layer_kp = layer_kp.at[ids, :, offs].set(
        ks.reshape(B * T, nKV, Cw), unique_indices=True, mode="drop")
    layer_vp = layer_vp.at[ids, :, offs].set(
        vs.reshape(B * T, nKV, Cw), unique_indices=True, mode="drop")
    fmt = "nvfp4" if packed4 else "raw"
    scale_kv = "nvfp4" if packed4 else kv_dtype

    if ecfg.paged_attention_kernel and T > 1:
        # Batched chunked-prefill kernel: context pages stream via block
        # tables; the chunk's kv goes in QUANTIZED (stored) form so one
        # k_scale fold into q covers both context and chunk scores.
        from ..ops.pallas import paged_attention as pa_kernel

        k_sc, v_sc = _kv_scales(scale_kv, k_amax_l, v_amax_l)
        qk = x_q
        if k_sc is not None:
            qk = (qk.astype(jnp.float32) * k_sc).astype(x_q.dtype)
        ctx = pa_kernel.paged_attention_prefill(
            qk, layer_kp, layer_vp, cache.block_table, pos,
            ks.astype(layer_kp.dtype), vs.astype(layer_vp.dtype),
            fmt=fmt, k_scale_pages=layer_ksc, v_scale_pages=layer_vsc,
            chunk_k_scales=ks_sc, chunk_v_scales=vs_sc,
        )
        if v_sc is not None:
            ctx = (ctx.astype(jnp.float32) * v_sc).astype(x_q.dtype)
        return (ctx.reshape(B, T, nH * hd).astype(x_q.dtype), layer_kp,
                layer_vp, layer_ksc, layer_vsc)

    if ecfg.paged_attention_kernel and T == 1:
        # Pallas kernel path: pages stream via scalar-prefetched block
        # tables. Quantized-KV scales fold exactly: k_scale into q (scores
        # are linear in k), v_scale into the context output.
        from ..ops.pallas import paged_attention as pa_kernel

        qk = x_q[:, 0]  # [B, nH, hd]
        k_sc, v_sc = _kv_scales(scale_kv, k_amax_l, v_amax_l)
        if k_sc is not None:
            qk = (qk.astype(jnp.float32) * k_sc).astype(qk.dtype)
        # pages pass RAW (int8/fp8/nibbles stay packed; the kernel
        # converts per tile)
        ctx = pa_kernel.paged_attention_decode(
            qk, layer_kp, layer_vp, cache.block_table, pos + T,
            fmt=fmt, k_scale_pages=layer_ksc, v_scale_pages=layer_vsc,
        )
        if v_sc is not None:
            ctx = (ctx.astype(jnp.float32) * v_sc).astype(x_q.dtype)
        return (ctx.reshape(B, 1, nH * hd).astype(x_q.dtype), layer_kp,
                layer_vp, layer_ksc, layer_vsc)

    bt = jnp.maximum(cache.block_table, 0)
    if packed4:
        from ..ops import numerics

        k_sc, v_sc = _kv_scales("nvfp4", k_amax_l, v_amax_l)
        ka = jnp.swapaxes(layer_kp[bt], 2, 3).reshape(B, -1, nKV, hd // 2)
        va = jnp.swapaxes(layer_vp[bt], 2, 3).reshape(B, -1, nKV, hd // 2)
        kas = jnp.swapaxes(layer_ksc[bt], 2, 3).reshape(B, -1, nKV, hd // 16)
        vas = jnp.swapaxes(layer_vsc[bt], 2, 3).reshape(B, -1, nKV, hd // 16)
        k_all = (numerics.nvfp4_planes_code_load(ka, kas, jnp.float32)
                 * k_sc).astype(cfg.dtype)
        v_all = (numerics.nvfp4_planes_code_load(va, vas, jnp.float32)
                 * v_sc).astype(cfg.dtype)
    else:
        k_all = jnp.swapaxes(layer_kp[bt], 2, 3).reshape(B, -1, nKV, hd)
        v_all = jnp.swapaxes(layer_vp[bt], 2, 3).reshape(B, -1, nKV, hd)
        k_all = _kv_load(k_all, cfg.dtype, kv_dtype, k_amax_l)
        v_all = _kv_load(v_all, cfg.dtype, kv_dtype, v_amax_l)
    S = k_all.shape[1]
    # query qi (global position pos+qi) sees keys at positions <= pos+qi
    mask = jnp.where(
        jnp.arange(S)[None, None, :] <= tok_pos[:, :, None], 0.0, -1e9
    )[:, None, :, :].astype(jnp.float32)

    # grouped GQA (no K/V materialization at nH heads; see _layer_forward)
    rep = nH // nKV
    qg = x_q.reshape(B, T, nKV, rep, hd)
    scores = jnp.einsum("btgrd,bsgd->bgrts", qg, k_all,
                        preferred_element_type=jnp.float32)
    scores = scores.reshape(B, nH, T, -1) / _math.sqrt(hd) + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x_q.dtype)
    probs = probs.reshape(B, nKV, rep, T, -1)
    ctx = jnp.einsum("bgrts,bsgd->btgrd", probs, v_all).reshape(B, T, nH * hd)
    return ctx, layer_kp, layer_vp, layer_ksc, layer_vsc


def _paged_model_step(cfg, ecfg, cm, backend, params, qstate, tokens, cache,
                      active, tp_axis=None):
    """One step over paged KV for all slots. tokens [B, T] (T=1 decode;
    T>1 = chunked prefill writing the chunk's kv into pages)."""
    from . import paged_cache as pc

    if "self_attn.sinks" in params["layers"]:
        raise NotImplementedError(
            "paged serving does not support attention sinks / sliding "
            "windows yet (GPT-OSS) — use the dense cache path")
    B, T = tokens.shape
    x = params["embed_tokens"][tokens].astype(cfg.dtype)
    positions = cache.seq_lens[:, None] + jnp.arange(T)[None, :]
    kinds = cm.kinds
    k_amax = _kv_amax_from(qstate, "k")
    v_amax = _kv_amax_from(qstate, "v")
    L = cfg.num_hidden_layers
    default_amax = jnp.full((L,), 448.0)  # see _model_step
    ka = k_amax if k_amax is not None else default_amax
    va = v_amax if v_amax is not None else default_amax
    act_state = {
        name: {"input": sub["input"]}
        for name, sub in (qstate or {}).items()
        if isinstance(sub, dict) and "input" in sub
    }
    nH, nKV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd

    def body(carry, per_layer):
        x = carry
        lp, lstate, kp, vp, ksc, vsc, ka_l, va_l = per_layer

        def ist(name):
            return (lstate or {}).get(name, {}).get("input")

        def ad(name):
            return (lp.get("__adapters__") or {}).get(name) if "__adapters__" in lp else None

        h = llama.norm(cfg, x, lp["input_layernorm"])
        h2 = h.reshape(B * T, -1)
        q = _qlinear(h2, "self_attn.q_proj", kinds["self_attn.q_proj"], lp["self_attn.q_proj"], cm, backend, ist("self_attn.q_proj"), ad("self_attn.q_proj"), tp_axis)
        k = _qlinear(h2, "self_attn.k_proj", kinds["self_attn.k_proj"], lp["self_attn.k_proj"], cm, backend, ist("self_attn.k_proj"), ad("self_attn.k_proj"), tp_axis)
        v = _qlinear(h2, "self_attn.v_proj", kinds["self_attn.v_proj"], lp["self_attn.v_proj"], cm, backend, ist("self_attn.v_proj"), ad("self_attn.v_proj"), tp_axis)
        if "self_attn.q_proj__bias" in lp:
            q = q + lp["self_attn.q_proj__bias"].astype(q.dtype)
            k = k + lp["self_attn.k_proj__bias"].astype(k.dtype)
            v = v + lp["self_attn.v_proj__bias"].astype(v.dtype)
        if cfg.clip_qkv is not None:  # DBRX qkv clamp
            q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
            k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
            v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
        q = q.reshape(B, T, nH, hd)
        k = k.reshape(B, T, nKV, hd)
        if "self_attn.q_norm" in lp:  # Qwen3-style per-head norms
            q = llama.rms_norm(q, lp["self_attn.q_norm"], cfg.rms_norm_eps)
            k = llama.rms_norm(k, lp["self_attn.k_norm"], cfg.rms_norm_eps)
        q = llama.rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
        k = llama.rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
        v = v.reshape(B, T, nKV, hd)
        ctx, kp, vp, ksc, vsc = _paged_layer_attn(
            cfg, ecfg, q, k, v, kp, vp, cache, positions, ka_l, va_l,
            write_mask=active, layer_ksc=ksc, layer_vsc=vsc,
        )
        attn = _qlinear(ctx.reshape(B * T, -1), "self_attn.o_proj", kinds["self_attn.o_proj"], lp["self_attn.o_proj"], cm, backend, ist("self_attn.o_proj"), ad("self_attn.o_proj"), tp_axis, row=True)
        if "self_attn.o_proj__bias" in lp:
            attn = attn + lp["self_attn.o_proj__bias"].astype(attn.dtype)
        x = x + attn.reshape(B, T, -1)
        h = llama.norm(cfg, x, lp["post_attention_layernorm"])
        h2 = h.reshape(B * T, -1)
        d = _ffn(cfg, cm, backend, h2, lp, lstate, kinds, ist, ad, tp_axis)
        x = x + d.reshape(B, T, -1)
        return x, (kp, vp, ksc, vsc)

    xs = (params["layers"], act_state, cache.k_pages, cache.v_pages,
          cache.k_scales, cache.v_scales, ka, va)
    x, (new_kp, new_vp, new_ksc, new_vsc) = jax.lax.scan(body, x, xs)
    x = llama.norm(cfg, x, params["norm"])
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x[:, -1] @ head_w.T.astype(x.dtype)).astype(jnp.float32)
    import dataclasses as _dc

    new_cache = _dc.replace(
        cache,
        k_pages=new_kp,
        v_pages=new_vp,
        k_scales=new_ksc,
        v_scales=new_vsc,
        seq_lens=cache.seq_lens + T * active.astype(jnp.int32),
    )
    return logits, new_cache


class Engine:
    """Generation engine over a compressed model."""

    def __init__(self, cm: CompressedModel, config: EngineConfig = EngineConfig()):
        if config.mesh is None:
            # (under TP the layout conversion happens per-shard in
            # serve/tp.py's shard_compressed)
            if config.nvfp4_layout == "perm" and "nvfp4" in cm.kinds.values():
                from ..quant.compress import convert_nvfp4_perm

                cm = convert_nvfp4_perm(cm)
            # mxfp4 has no blockdot kernel — a word layout IS the fused
            # path (otherwise serving falls back to XLA decompress)
            mx_layout = {"word2": "word2", "bd4": "bd4"}.get(
                config.nvfp4_layout, "word")
            from ..quant.compress import convert_packed_layouts

            cm = convert_packed_layouts(
                cm,
                nvfp4=(config.nvfp4_layout
                       if config.nvfp4_layout in ("word", "word2", "bd4", "i8")
                       else "blockdot"),
                int4=config.int4_layout,
                mxfp4=mx_layout,
            )
        # NVFP4 KV presets: emulate the E2M1 block-quantized cache when the
        # user didn't pick an explicit storage dtype
        kcfg = cm.layout.get("self_attn.k_bmm")
        if (config.kv_dtype is None and kcfg.enable and kcfg.is_fp
                and kcfg.num_bits == (2, 1)):
            config = dataclasses.replace(config, kv_dtype="nvfp4")
        self.cm = cm
        self.cfg = cm.model_cfg
        self.ecfg = config
        if config.kv_attention_kernel:
            cfg_ = cm.model_cfg
            if (getattr(cfg_, "sliding_window", None)
                    and getattr(cfg_, "resolved_layer_types", None)):
                raise NotImplementedError(
                    "kv_attention_kernel: sliding-window families "
                    "(GPT-OSS) use the dense-cache path for now")
            if hasattr(cfg_, "use_rope_layers"):
                raise NotImplementedError(
                    "kv_attention_kernel: Llama4 rope/nope chunked "
                    "attention uses the dense-cache path for now")
            if "self_attn.sinks" in cm.params["layers"]:
                raise NotImplementedError(
                    "kv_attention_kernel: attention sinks unsupported")
            if config.attn_sparsity is not None:
                raise NotImplementedError(
                    "kv_attention_kernel: prefill attention sparsity "
                    "unsupported (flash prefill path owns attention)")
        backend = config.backend
        if backend == "auto":
            backend = "pallas" if qmm.pallas_supported() else "xla"
        self.backend = backend
        self._prefill_fns = {}
        self._decode_fn = None
        self._decode_steps = None
        self._fwd_cfg = self.cfg
        self._tp_specs = None
        if config.mesh is not None:
            from . import tp as tp_mod

            d = int(config.mesh.shape[config.tp_axis])
            cm2, specs = tp_mod.shard_compressed(
                self.cm, d, config.tp_axis,
                nvfp4_layout=config.nvfp4_layout,
                int4_layout=config.int4_layout,
            )
            self.cm = tp_mod.device_put_sharded(cm2, config.mesh, specs)
            self._tp_specs = specs
            self._fwd_cfg = tp_mod.local_cfg(self.cfg, d)
            self._pspec = tp_mod._concretize(specs.params, self.cm.params)
            self._qspec = tp_mod._concretize(specs.qstate, self.cm.qstate)

    @property
    def _tp_axis(self):
        return self.ecfg.tp_axis if self.ecfg.mesh is not None else None

    @property
    def _dp(self):
        """Replica (data-parallel / cross-slice) axis name, if meshed."""
        e = self.ecfg
        if e.mesh is not None and e.dp_axis and e.dp_axis in e.mesh.shape:
            return e.dp_axis
        return None

    def _wrap_step(self, fn, tail_in_specs, out_specs, donate=()):
        """jit, or shard_map+jit under TP (tail specs follow params/qstate).

        `donate` argnums (e.g. the KV cache) are donated to the call: without
        donation every decode step copies the full cache (measured 10-20x the
        fused step time at 8B on-chip — see BENCH_RESULTS round-2 ablation).
        """
        import jax as _jax

        if self.ecfg.mesh is None:
            return _jax.jit(fn, donate_argnums=donate)
        from . import tp as tp_mod

        return _jax.jit(tp_mod.shard_map_fn(
            fn, self.ecfg.mesh,
            in_specs=(self._pspec, self._qspec, *tail_in_specs),
            out_specs=out_specs,
        ), donate_argnums=donate)

    def _cache_specs(self):
        from . import tp as tp_mod

        return tp_mod.cache_specs(
            self.ecfg.tp_axis, self._dp,
            kvh=self.ecfg.kv_attention_kernel,
            scales=(self.ecfg.kv_attention_kernel
                    and self.ecfg.kv_dtype == "nvfp4"),
        )

    def init_cache(self, batch: int, max_len: Optional[int] = None) -> dict:
        max_len = max_len or self.ecfg.max_seq_len
        cfg = self.cfg
        dtype = self.ecfg.kv_dtype or cfg.dtype
        nKV, L = cfg.num_key_value_heads, cfg.num_hidden_layers
        if self.ecfg.kv_attention_kernel:
            # kv-head-major stored-form layout for the packed-KV kernel
            # ([L, B, n_kv, S, C]; NVFP4 splits nibble planes and E4M3
            # block scales into parallel arrays — see kv_attention.py)
            last = cfg.hd
            if dtype == "nvfp4":
                dtype = jnp.uint8
                last = cfg.hd // 2
            elif dtype == "nvfp4_fake":
                dtype = cfg.dtype
            shape = (L, batch, nKV, max_len, last)
            cache = {
                "k": jnp.zeros(shape, dtype),
                "v": jnp.zeros(shape, dtype),
                "pos": jnp.asarray(0, jnp.int32),
            }
            if self.ecfg.kv_dtype == "nvfp4":
                sshape = (L, batch, nKV, max_len, cfg.hd // 16)
                cache["ks"] = jnp.zeros(sshape, jnp.uint8)
                cache["vs"] = jnp.zeros(sshape, jnp.uint8)
        else:
            last = cfg.hd
            if dtype == "nvfp4":  # packed: nibbles + fp8 scales, one u8 row
                dtype = jnp.uint8
                last = _kv_pack_width(cfg.hd)
            elif dtype == "nvfp4_fake":  # emulated: bf16 grid values
                dtype = cfg.dtype
            shape = (L, batch, max_len, nKV, last)
            cache = {
                "k": jnp.zeros(shape, dtype),
                "v": jnp.zeros(shape, dtype),
                "pos": jnp.asarray(0, jnp.int32),
            }
        if self.ecfg.mesh is not None:
            from jax.sharding import NamedSharding

            cs = self._cache_specs()
            cache = {
                k: jax.device_put(v, NamedSharding(self.ecfg.mesh, cs[k]))
                for k, v in cache.items()
            }
        return cache

    def prefill(self, tokens: jax.Array, cache: dict):
        """Prefill a fresh cache. With `ecfg.attn_sparsity` set, runs the
        skip-softmax flash kernel (prefill-only sparsity) and records the
        per-layer kept-block fraction in `self.last_prefill_keep_frac`."""
        B, T = tokens.shape
        sparse = self.ecfg.attn_sparsity is not None and T > 1
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T)).astype(jnp.int32)
        if getattr(self, "_prefill_fns", None) is None:
            self._prefill_fns = {}
        if sparse not in self._prefill_fns:
            from jax.sharding import PartitionSpec as P

            from . import tp as tp_mod

            fn = partial(_model_step, self._fwd_cfg, self.ecfg, self.cm,
                         self.backend, tp_axis=self._tp_axis,
                         sparse_prefill=sparse)
            cs = self._cache_specs()
            bP = P(self._dp, None)  # [B, ...] sharded over replicas
            out_specs = (bP, cs, P()) if sparse else (bP, cs)
            self._prefill_fns[sparse] = self._wrap_step(fn, (bP, cs, bP), out_specs)
        out = self._prefill_fns[sparse](
            self.cm.params, self.cm.qstate, tokens, cache, positions
        )
        if sparse:
            logits, cache, keep_fracs = out
            self.last_prefill_keep_frac = keep_fracs
            return logits, cache
        return out

    def decode(self, first_token: jax.Array, cache: dict, steps: int):
        """Greedy decode `steps` tokens fully on device (one dispatch)."""
        cfg, ecfg, cm, backend = self._fwd_cfg, self.ecfg, self.cm, self.backend
        tp_ax = self._tp_axis
        if self._decode_fn is None or self._decode_steps != steps:

            def run(params, qstate, first_token, cache):
                def step_fn(carry, _):
                    tok, cache = carry
                    B = tok.shape[0]
                    positions = jnp.broadcast_to(
                        cache["pos"][None, None], (B, 1)
                    ).astype(jnp.int32)
                    logits, cache = _model_step(
                        cfg, ecfg, cm, backend, params, qstate, tok, cache,
                        positions, tp_axis=tp_ax,
                    )
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                    return (nxt, cache), nxt[:, 0]

                (last, cache), toks = jax.lax.scan(
                    step_fn, (first_token, cache), None, length=steps
                )
                return toks.T, cache  # [B, steps]

            from jax.sharding import PartitionSpec as P

            from . import tp as tp_mod

            cs = self._cache_specs()
            bP = P(self._dp, None)
            self._decode_fn = self._wrap_step(run, (bP, cs), (bP, cs))
            self._decode_steps = steps
        return self._decode_fn(self.cm.params, self.cm.qstate, first_token, cache)

    def decode_step(self, tok: jax.Array, cache: dict, unroll: int = 1):
        """Fused greedy decode: (tok [B,1], cache) -> (next [B,1], cache).

        Single dispatch for `unroll` chained steps: argmax runs on device,
        each step's token feeds the next, and the cache is DONATED (in-place
        KV update). `unroll > 1` amortizes per-dispatch overhead the way
        multi-step scheduling does in serving engines — the returned token is
        the last of the `unroll` steps (use unroll=1 when every intermediate
        token is needed). This is the hot path on backends where a steps-scan
        over the layers-scan won't compile (the remote TPU relay);
        `decode()` (lax.scan) is preferred where it compiles. The caller must
        drop its reference to the passed cache (donated = invalidated).
        """
        if getattr(self, "_stepk_fns", None) is None:
            self._stepk_fns = {}
        if unroll not in self._stepk_fns:
            cfg, ecfg, cm, backend = self._fwd_cfg, self.ecfg, self.cm, self.backend
            tp_ax = self._tp_axis

            def k_steps(params, qstate, tok, cache):
                for _ in range(unroll):
                    B = tok.shape[0]
                    positions = jnp.broadcast_to(
                        cache["pos"][None, None], (B, 1)
                    ).astype(jnp.int32)
                    logits, cache = _model_step(
                        cfg, ecfg, cm, backend, params, qstate, tok, cache,
                        positions, tp_axis=tp_ax,
                    )
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
                return tok, cache

            from jax.sharding import PartitionSpec as P

            from . import tp as tp_mod

            cs = self._cache_specs()
            bP = P(self._dp, None)
            self._stepk_fns[unroll] = self._wrap_step(
                k_steps, (bP, cs), (bP, cs), donate=(3,)
            )
        return self._stepk_fns[unroll](self.cm.params, self.cm.qstate, tok, cache)

    def generate_host(self, prompt: jax.Array, max_new_tokens: int = 32):
        """Greedy generation via host-stepped fused decode (relay-safe)."""
        cache = self.init_cache(prompt.shape[0])
        logits, cache = self.prefill(prompt, cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        out = [tok]
        for _ in range(max_new_tokens - 1):
            tok, cache = self.decode_step(tok, cache)
            out.append(tok)
        return jnp.concatenate(out, axis=1)

    def generate(self, prompt: jax.Array, max_new_tokens: int = 32):
        """Greedy generation. prompt [B, T] -> [B, max_new_tokens]."""
        cache = self.init_cache(prompt.shape[0])
        logits, cache = self.prefill(prompt, cache)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        toks, cache = self.decode(first, cache, max_new_tokens - 1)
        return jnp.concatenate([first, toks], axis=1)

    # ---------------- paged KV + continuous batching ----------------

    def init_paged_cache(self, n_pages: int, page_size: int, max_slots: int,
                         max_pages_per_seq: int):
        from . import paged_cache as pc

        cfg = self.cfg
        dtype = self.ecfg.kv_dtype or cfg.dtype
        packed4 = dtype == "nvfp4"  # REAL packed pages: nibble planes +
        # E4M3 scale pools, dequantized per tile in the paged kernels
        # (replaces the r04 bf16-stored fake-quant fallback)
        if dtype in ("nvfp4", "nvfp4_fake"):
            dtype = cfg.dtype
        cache = pc.init_paged(
            cfg.num_hidden_layers, n_pages, page_size,
            cfg.num_key_value_heads, cfg.hd, max_slots, max_pages_per_seq,
            dtype, packed_nvfp4=packed4,
        )
        if self.ecfg.mesh is not None:
            import dataclasses as _dc

            from jax.sharding import NamedSharding

            from . import tp as tp_mod

            spec = tp_mod.paged_cache_specs(cache, self.ecfg.tp_axis, self._dp)
            cache = jax.tree.map(
                lambda v, sp: jax.device_put(v, NamedSharding(self.ecfg.mesh, sp)),
                cache, spec)
        return cache

    def prefill_into_slot(self, cache, slot: int, tokens: jax.Array):
        """Prefill one sequence into its slot's pages.

        Runs the dense prefill then scatters k/v into the slot's pages (the
        batched paged-prefill kernel is the round-2 hot path)."""
        import dataclasses as _dc

        T = tokens.shape[1]
        dense = self.init_cache(1, max_len=T)
        logits, dense = self.prefill(tokens, dense)
        page = cache.page_size
        pos = jnp.arange(T)
        bt_row = jnp.maximum(cache.block_table[slot], 0)
        page_ids = bt_row[pos // page]
        poff = pos % page
        k = dense["k"][:, 0]  # [L, T, n_kv, hd]  (uint8 [.., 9*hd/16] packed)
        v = dense["v"][:, 0]
        if getattr(cache, "packed_nvfp4", False):
            # packed page pool: write nibble planes + E4M3 scales straight
            # from the dense stored form (no dequant round trip)
            from ..ops import numerics as _nu

            hd = self.cfg.hd

            def _to_planes(stored):
                if self.ecfg.kv_attention_kernel:
                    # dense kvh cache IS plane-packed: [L, n_kv, T, hd/2]
                    return None  # handled below
                codes = _nu.unpack_nibbles(stored[..., : hd // 2])
                h = codes.shape[-1] // 2
                planes = (codes[..., :h] | (codes[..., h:] << 4)).astype(jnp.uint8)
                return planes, stored[..., hd // 2 :]

            if self.ecfg.kv_attention_kernel:
                kpl = jnp.swapaxes(k, 1, 2)  # [L, T, n_kv, hd/2]
                vpl = jnp.swapaxes(v, 1, 2)
                ksc = jnp.swapaxes(dense["ks"][:, 0], 1, 2)
                vsc = jnp.swapaxes(dense["vs"][:, 0], 1, 2)
            else:
                kpl, ksc = _to_planes(k)
                vpl, vsc = _to_planes(v)
            swap = lambda a: jnp.swapaxes(a, 0, 1)
            cache = _dc.replace(
                cache,
                k_pages=cache.k_pages.at[:, page_ids, :, poff].set(swap(kpl)),
                v_pages=cache.v_pages.at[:, page_ids, :, poff].set(swap(vpl)),
                k_scales=cache.k_scales.at[:, page_ids, :, poff].set(swap(ksc)),
                v_scales=cache.v_scales.at[:, page_ids, :, poff].set(swap(vsc)),
                seq_lens=cache.seq_lens.at[slot].set(T),
            )
            return logits, cache
        if self.ecfg.kv_attention_kernel:
            # dense cache is kv-head-major stored form [L, n_kv, T, C];
            # bring it to the page form [L, T, n_kv, *] (NVFP4 planes
            # dequantize to the emulated grid-value form pages hold)
            from ..ops import numerics as _nu

            if self.ecfg.kv_dtype == "nvfp4":
                ka = _kv_amax_from(self.cm.qstate, "k")
                va = _kv_amax_from(self.cm.qstate, "v")
                Lk = k.shape[0]

                def _deq(st, sc, amax_l):
                    code = _nu.nvfp4_planes_code_load(st, sc, jnp.float32)
                    g = (_nu.nvfp4_global_scale(amax_l)
                         if amax_l is not None
                         else jnp.ones((Lk,), jnp.float32))
                    return (code * g[:, None, None, None]).astype(self.cfg.dtype)

                k = _deq(k, dense["ks"][:, 0], ka)
                v = _deq(v, dense["vs"][:, 0], va)
            k = jnp.swapaxes(k, 1, 2)  # [L, T, n_kv, *]
            v = jnp.swapaxes(v, 1, 2)
        elif self.ecfg.kv_dtype == "nvfp4":
            # dense cache is packed-NVFP4; pages hold the emulated (decoded
            # grid-value) form — unpack per layer with the layer's kv amax
            ka = _kv_amax_from(self.cm.qstate, "k")
            va = _kv_amax_from(self.cm.qstate, "v")
            dt = self.cfg.dtype

            def _unp(stored, amax_l):
                if amax_l is None:
                    return jax.vmap(
                        lambda s: _kv_load(s, dt, "nvfp4", None))(stored)
                return jax.vmap(
                    lambda s, a: _kv_load(s, dt, "nvfp4", a))(stored, amax_l)

            k, v = _unp(k, ka), _unp(v, va)
        # non-adjacent advanced indices (pages axis 1, offset axis 3) put the
        # broadcast T dim first: slice shape [T, L, n_kv, hd]
        kp = cache.k_pages.at[:, page_ids, :, poff].set(
            jnp.swapaxes(k, 0, 1).astype(cache.k_pages.dtype))
        vp = cache.v_pages.at[:, page_ids, :, poff].set(
            jnp.swapaxes(v, 0, 1).astype(cache.v_pages.dtype))
        cache = _dc.replace(
            cache,
            k_pages=kp,
            v_pages=vp,
            seq_lens=cache.seq_lens.at[slot].set(T),
        )
        return logits, cache

    def paged_step(self, tokens: jax.Array, cache, active: jax.Array):
        """One continuous-batching step (jitted per token-width T)."""
        if getattr(self, "_paged_fns", None) is None:
            self._paged_fns = {}
        T = tokens.shape[1]
        if T not in self._paged_fns:
            from jax.sharding import PartitionSpec as P

            from . import tp as tp_mod

            fn = partial(_paged_model_step, self._fwd_cfg, self.ecfg, self.cm,
                         self.backend, tp_axis=self._tp_axis)
            ps = tp_mod.paged_cache_specs(cache, self.ecfg.tp_axis, self._dp)
            bP, b1 = P(self._dp, None), P(self._dp)
            self._paged_fns[T] = self._wrap_step(
                fn, (bP, ps, b1), (bP, ps), donate=(3,)
            )
        return self._paged_fns[T](self.cm.params, self.cm.qstate, tokens, cache, active)

    def paged_decode_step(self, tok: jax.Array, cache, active: jax.Array,
                          unroll: int = 1, return_all: bool = False):
        """Fused greedy paged decode: `unroll` chained steps in ONE dispatch
        (on-device argmax feeds the next token; cache donated) — the paged
        counterpart of `decode_step(unroll=k)`. The measured dense-vs-paged
        decode gap (22.4 vs 68 ms/step, int4 8B BS8 ctx512, 2026-08-18,
        BENCH_RESULTS.md) is the stepping regime, not the attention path, so
        multi-step scheduling applies here identically.

        The caller (scheduler) must guarantee every active slot's block
        table has page capacity through seq_len + unroll tokens before the
        call, and must drop its reference to the donated cache. Returns the
        LAST token of the block."""
        if getattr(self, "_paged_stepk_fns", None) is None:
            self._paged_stepk_fns = {}
        if unroll not in self._paged_stepk_fns:
            from jax.sharding import PartitionSpec as P

            from . import tp as tp_mod

            fn1 = partial(_paged_model_step, self._fwd_cfg, self.ecfg,
                          self.cm, self.backend, tp_axis=self._tp_axis)

            def k_steps(params, qstate, tok, cache, active):
                toks = []
                for _ in range(unroll):
                    logits, cache = fn1(params, qstate, tok, cache, active)
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    tok = tok.reshape(tok.shape[0], 1)
                    toks.append(tok)
                # [B, unroll] block (continuous batching consumes every
                # token; plain callers take the last column)
                return jnp.concatenate(toks, axis=1), cache

            ps = tp_mod.paged_cache_specs(cache, self.ecfg.tp_axis, self._dp)
            bP, b1 = P(self._dp, None), P(self._dp)
            self._paged_stepk_fns[unroll] = self._wrap_step(
                k_steps, (bP, ps, b1), (bP, ps), donate=(3,)
            )
        toks, cache = self._paged_stepk_fns[unroll](
            self.cm.params, self.cm.qstate, tok, cache, active)
        if return_all:
            return toks, cache
        return toks[:, -1:], cache

    def prefill_chunked(self, cache, slot: int, tokens: jax.Array, chunk: int = 64):
        """Paged chunked prefill: stream the prompt into the slot's pages in
        fixed-size chunks (+ single-token steps for the remainder) — no dense
        cache materialized (compare `prefill_into_slot`). Returns
        (last_logits [V], cache)."""
        import numpy as np

        B = cache.block_table.shape[0]
        T = tokens.shape[1]
        onehot = jnp.zeros((B,), bool).at[slot].set(True)
        row = jnp.zeros((B, 1), jnp.int32)
        logits = None
        done = 0
        while done < T:
            step_t = chunk if T - done >= chunk else 1
            seg = jax.lax.dynamic_slice_in_dim(tokens, done, step_t, axis=1)
            toks = jnp.broadcast_to(row, (B, step_t)).at[slot].set(seg[0])
            logits, cache = self.paged_step(toks, cache, onehot)
            done += step_t
        return logits[slot], cache

    def generate_speculative(self, prompt: jax.Array, medusa_params: dict,
                             max_new_tokens: int = 32, tree=None):
        """Greedy medusa TREE-speculative decode on the engine cache.

        One verify forward per emitted block: candidate tree tokens occupy
        cache slots pos..pos+N-1 with a tree mask over cache indices
        (slot != position, so the causal mask is overridden), accepted
        nodes' kv is compacted back to pos..pos+a-1. Greedy semantics are
        exactly the plain decode's (speculation changes speed, not tokens).
        BS=1 (`specdec_bench` analog in-engine).
        """
        import numpy as np

        from ..speculative import medusa as med_mod
        from ..speculative import tree as tree_mod

        tree = tree or tree_mod.build_tree()
        assert prompt.shape[0] == 1
        cfg = self.cfg
        cache = self.init_cache(1)
        S = cache["k"].shape[2]
        N = tree.n_nodes

        B, T0 = prompt.shape
        positions = jnp.arange(T0)[None, :]
        step_h = jax.jit(
            lambda p, q, t, c, po, m: _model_step(
                cfg, self.ecfg, self.cm, self.backend, p, q, t, c, po,
                mask_override=m, full_logits=True, return_hidden=True)
        )
        logits, cache, hid = step_h(self.cm.params, self.cm.qstate, prompt,
                                    cache, positions, None)
        head_w = self.cm.params.get("lm_head", self.cm.params["embed_tokens"])
        base_tok = int(jnp.argmax(logits[0, -1]))
        h_last = hid[:, -1, :]
        k_needed = max(tree.choice) + 1
        anc = np.asarray(tree.attn_mask)
        # the base token is emitted once here; each round then emits its
        # accepted DRAFT tokens plus the bonus (the next round's base)
        out: list[int] = [base_tok]
        n_acc_total = n_prop_total = 0
        while len(out) < max_new_tokens:
            pos = int(cache["pos"])
            head_lg = med_mod.apply_heads(medusa_params, h_last,
                                          head_w.astype(h_last.dtype))
            head_topk = np.stack([
                np.asarray(jax.lax.top_k(head_lg[d][0], k_needed)[1])
                for d in range(tree.max_depth)
            ])
            cand = tree_mod.assemble_candidates(tree, base_tok, head_topk)
            allow = np.zeros((N, S), bool)
            allow[:, :pos] = True
            allow[:, pos:pos + N] = anc
            mask = jnp.asarray(np.where(allow, 0.0, -1e9), jnp.float32)[None, None]
            tpos = (pos + jnp.asarray(tree.depth, jnp.int32))[None, :]
            v_logits, v_cache, v_hid = step_h(
                self.cm.params, self.cm.qstate, jnp.asarray(cand[None]),
                cache, tpos, mask)
            ver = np.asarray(jnp.argmax(v_logits[0], axis=-1))
            # greedy path acceptance, tracking node indices
            node, idxs, toks = 0, [0], [int(cand[0])]
            while True:
                want = int(ver[node])
                nxt = None
                for ch in tree.children(node):
                    if int(cand[ch]) == want:
                        nxt = ch
                        break
                if nxt is None:
                    bonus = want
                    break
                idxs.append(nxt)
                toks.append(int(cand[nxt]))
                node = nxt
            a = len(idxs)
            n_acc_total += a - 1
            n_prop_total += N - 1
            # compact accepted nodes' kv to pos..pos+a-1
            take = jnp.asarray([pos + i for i in idxs], jnp.int32)
            new_cache = {
                "k": v_cache["k"].at[:, :, pos:pos + a].set(
                    jnp.take(v_cache["k"], take, axis=2)),
                "v": v_cache["v"].at[:, :, pos:pos + a].set(
                    jnp.take(v_cache["v"], take, axis=2)),
                "pos": jnp.asarray(pos + a, jnp.int32),
            }
            cache = new_cache
            out.extend(toks[1:] + [bonus])
            base_tok = bonus
            h_last = v_hid[:, idxs[-1], :]
        rate = n_acc_total / max(n_prop_total, 1)
        return out[:max_new_tokens], rate

    def serve(self, requests, n_pages=64, page_size=16, max_slots=4,
              max_pages_per_seq=16, prefix_cache=False, unroll=1,
              collect_metrics=False):
        """Continuous batching over a request list. Returns {rid: tokens}
        (or (outs, metrics) with `collect_metrics`).

        `prefix_cache=True` shares full prompt-prefix pages across requests
        (admissions with a cached prefix skip re-prefilling those tokens).
        `unroll > 1` = multi-step scheduling: one fused dispatch emits an
        `unroll`-token block per slot (decode overshoot past EOS is dropped;
        requires unroll <= page_size so the admit-time page reservation
        absorbs the cache overshoot). Metrics: per-request TTFT (from serve
        start, queueing included), p50/p95, total tok/s, slot utilization
        (active-slot-steps / slots*steps)."""
        import time as _time

        import numpy as np

        from .scheduler import Scheduler

        assert unroll <= page_size, (unroll, page_size)
        sched = Scheduler(max_slots, n_pages, page_size, max_pages_per_seq,
                          prefix_cache=prefix_cache)
        for r in requests:
            sched.submit(r)
        cache = self.init_paged_cache(n_pages, page_size, max_slots, max_pages_per_seq)
        last_tok = np.zeros((max_slots, 1), np.int32)
        t0 = _time.time()
        ttft = {}
        done_at = {}
        steps = 0
        active_slot_steps = 0
        while sched.has_work:
            cache, admissions = sched.admit(cache)
            for slot, req in admissions:
                skip = int(np.asarray(cache.seq_lens)[slot])  # cached prefix
                if skip > 0:
                    # tail must attend to the shared prefix pages -> paged
                    # chunked prefill (positions continue at seq_lens)
                    logits, cache = self.prefill_chunked(
                        cache, slot, jnp.asarray(req.prompt[None, skip:])
                    )
                    logits = logits[None]
                else:
                    logits, cache = self.prefill_into_slot(
                        cache, slot, jnp.asarray(req.prompt[None, :])
                    )
                sched.register_prefix(slot)
                first = int(jnp.argmax(logits[0]))
                ttft[req.rid] = _time.time() - t0
                req.output.append(first)
                last_tok[slot, 0] = first
                if len(req.output) >= req.max_new_tokens or (
                    req.eos_token is not None and first == req.eos_token
                ):
                    req.done = True
            active = sched.active_mask()
            if not active.any():
                cache = sched.retire(cache)
                continue
            if unroll > 1:
                blk, cache = self.paged_decode_step(
                    jnp.asarray(last_tok), cache, jnp.asarray(active),
                    unroll=unroll, return_all=True)
                nxt_blk = np.asarray(blk)
                sched.record_token_block(nxt_blk)
                nxt = nxt_blk[:, -1]
            else:
                logits, cache = self.paged_step(
                    jnp.asarray(last_tok), cache, jnp.asarray(active)
                )
                nxt = np.asarray(jnp.argmax(logits, axis=-1))
                sched.record_tokens(nxt)
            steps += 1
            active_slot_steps += int(active.sum())
            for i in range(max_slots):
                if active[i]:
                    last_tok[i, 0] = int(nxt[i])
            for r in requests:
                if r.done and r.rid not in done_at:
                    done_at[r.rid] = _time.time() - t0
            cache = sched.retire(cache)
        outs = {r.rid: r.output for r in requests}
        if not collect_metrics:
            return outs
        wall = _time.time() - t0
        tt = sorted(ttft.values())
        pc = lambda q: tt[min(len(tt) - 1, int(q * len(tt)))] if tt else 0.0
        total_new = sum(len(v) for v in outs.values())
        metrics = {
            "wall_s": wall,
            "tok_s": total_new / wall if wall else 0.0,
            "ttft_p50_s": pc(0.50),
            "ttft_p95_s": pc(0.95),
            "slot_utilization": (active_slot_steps / (steps * max_slots)
                                 if steps else 0.0),
            "decode_dispatches": steps,
            "unroll": unroll,
        }
        return outs, metrics
