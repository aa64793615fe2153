"""Hybrid Mamba2 (Nemotron-H-style) model: SSM + attention + MLP blocks.

Covers the reference's Mamba/hybrid model family — Minitron pruning of
`MambaModel`/hybrid stacks (`prune/plugins/mcore_minitron.py:22,104-106`:
`mamba_num_heads`/`mamba_head_dim` hparams, `hybrid_override_pattern`) and
NemotronH PTQ (`puzzletron/anymodel/models/nemotron_h/`). TPU-first design:

 - Prefill runs the **chunked SSD** formulation of Mamba2 (matmul-dominated:
   within-chunk quadratic attention-like products + an inter-chunk state
   scan), so the FLOPs land on the MXU instead of a length-T sequential
   scan. Decode keeps the O(1) recurrent state update.
 - The layer pattern is a string over {"M": Mamba2 mixer, "*": attention,
   "-": MLP}; params are stacked per block TYPE (shape-uniform pytrees) and
   the forward walks the pattern in Python — block types differ structurally
   so a single lax.scan cannot cover them (same trade as deepseek.py's
   dense/moe split).
 - Quantization sites reuse the functional injection of `llama._linear`
   ("mixer.in_proj"/"mixer.out_proj" + the llama attention/MLP names), so
   every preset/calibration algorithm applies unchanged.

Numerics follow HF `Mamba2Mixer`/NemotronH: in_proj → [z, xBC, dt]; causal
depthwise conv + SiLU on xBC; dt = softplus(dt + dt_bias); A = -exp(A_log)
scalar per head; y = SSD(x·dt, A·dt, B, C) + D·x; gated RMSNorm(y · silu(z));
out_proj. The MLP block uses NemotronH's squared-ReLU. Attention blocks carry
no RoPE (position is carried by the SSM states, as in NemotronH).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quant import QuantizeConfig, QuantizerState
from ..quant import quantizer as Q
from . import llama
from .llama import QuantLayout, _linear, _qsite, rms_norm, slice_layer

MAMBA, ATTN, MLP = "M", "*", "-"


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    vocab_size: int = 32000
    hidden_size: int = 1024
    # block pattern over {"M", "*", "-"}; len(pattern) = depth
    hybrid_pattern: str = "MM*M-"
    # Mamba2 mixer
    mamba_num_heads: int = 16
    mamba_head_dim: int = 64
    ssm_state_size: int = 128
    n_groups: int = 2
    conv_kernel: int = 4
    chunk_size: int = 64
    time_step_limit: tuple = (0.0, float("inf"))
    # attention blocks
    num_attention_heads: int = 8
    num_key_value_heads: int = 4
    head_dim: Optional[int] = None
    # MLP blocks (squared-ReLU, no gate — NemotronH MLP)
    intermediate_size: int = 4096
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 4096
    dtype: Any = jnp.bfloat16

    @property
    def d_inner(self) -> int:
        return self.mamba_num_heads * self.mamba_head_dim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.n_groups * self.ssm_state_size

    @property
    def d_in_proj(self) -> int:
        # [z (d_inner), xBC (conv_dim), dt (heads)]
        return 2 * self.d_inner + 2 * self.n_groups * self.ssm_state_size + self.mamba_num_heads

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    def n_blocks(self, kind: str) -> int:
        return self.hybrid_pattern.count(kind)

    @staticmethod
    def tiny(**kw) -> "MambaConfig":
        base = dict(
            vocab_size=256, hidden_size=64, hybrid_pattern="MM*M-",
            mamba_num_heads=4, mamba_head_dim=16, ssm_state_size=16,
            n_groups=2, conv_kernel=4, chunk_size=8,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, dtype=jnp.float32,
        )
        base.update(kw)
        return MambaConfig(**base)

    @staticmethod
    def nemotron_h_8b(**kw) -> "MambaConfig":
        """Nemotron-H-8B shapes (52 blocks, M/attention/MLP interleave)."""
        base = dict(
            vocab_size=131072, hidden_size=4096,
            hybrid_pattern="M-M-M-M-M-M-M-M*-M-M-M-M*-M-M-M-M*-M-M-M-M*-M-M-M-M-",
            mamba_num_heads=128, mamba_head_dim=64, ssm_state_size=128,
            n_groups=8, num_attention_heads=32, num_key_value_heads=8,
            head_dim=128, intermediate_size=21504,
        )
        base.update(kw)
        return MambaConfig(**base)


MIXER_NAMES = ("mixer.in_proj", "mixer.out_proj")
ATTN_NAMES = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
              "self_attn.o_proj")
MLP_NAMES = ("mlp.up_proj", "mlp.down_proj")


def _shapes(cfg: MambaConfig) -> dict[str, tuple[int, int]]:
    h, hd = cfg.hidden_size, cfg.hd
    return {
        "mixer.in_proj": (cfg.d_in_proj, h),
        "mixer.out_proj": (h, cfg.d_inner),
        "self_attn.q_proj": (cfg.num_attention_heads * hd, h),
        "self_attn.k_proj": (cfg.num_key_value_heads * hd, h),
        "self_attn.v_proj": (cfg.num_key_value_heads * hd, h),
        "self_attn.o_proj": (h, cfg.num_attention_heads * hd),
        "mlp.up_proj": (cfg.intermediate_size, h),
        "mlp.down_proj": (h, cfg.intermediate_size),
    }


def init_params(cfg: MambaConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 24))
    h = cfg.hidden_size
    shapes = _shapes(cfg)

    def winit(k, shape, fan):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan)).astype(cfg.dtype)

    params: dict = {
        "embed_tokens": winit(next(keys), (cfg.vocab_size, h), h),
        "norm": jnp.ones((h,), cfg.dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = winit(next(keys), (cfg.vocab_size, h), h)

    Lm, La, Lf = cfg.n_blocks(MAMBA), cfg.n_blocks(ATTN), cfg.n_blocks(MLP)
    if Lm:
        H = cfg.mamba_num_heads
        params["layers_mamba"] = {
            "norm": jnp.ones((Lm, h), cfg.dtype),
            "mixer.in_proj": winit(next(keys), (Lm, cfg.d_in_proj, h), h),
            "mixer.out_proj": winit(next(keys), (Lm, h, cfg.d_inner), cfg.d_inner),
            "mixer.conv_w": winit(next(keys), (Lm, cfg.conv_dim, cfg.conv_kernel), cfg.conv_kernel),
            "mixer.conv_b": jnp.zeros((Lm, cfg.conv_dim), cfg.dtype),
            # A_log init log(1..H) (mamba2 default); D=1; dt_bias so that
            # softplus(0 + bias) lands in a sane dt range
            "mixer.A_log": jnp.broadcast_to(
                jnp.log(jnp.arange(1, H + 1, dtype=jnp.float32)), (Lm, H)).copy(),
            "mixer.D": jnp.ones((Lm, H), jnp.float32),
            "mixer.dt_bias": jnp.full((Lm, H), -2.0, jnp.float32),
            "mixer.gnorm": jnp.ones((Lm, cfg.d_inner), cfg.dtype),
        }
    if La:
        params["layers_attn"] = {
            "norm": jnp.ones((La, h), cfg.dtype),
            **{n: winit(next(keys), (La,) + shapes[n], shapes[n][1]) for n in ATTN_NAMES},
        }
    if Lf:
        params["layers_mlp"] = {
            "norm": jnp.ones((Lf, h), cfg.dtype),
            **{n: winit(next(keys), (Lf,) + shapes[n], shapes[n][1]) for n in MLP_NAMES},
        }
    return params


def param_specs(cfg: MambaConfig) -> dict:
    """TP PartitionSpecs: mixer.in_proj column-parallel (heads + groups both
    live on the output dim), out_proj row-parallel; attention/MLP megatron
    column/row; conv + per-head vectors shard on their channel dim."""
    col, row = P(None, "tensor", None), P(None, None, "tensor")
    specs: dict = {
        "embed_tokens": P("tensor", None),
        "norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P("tensor", None)
    if cfg.n_blocks(MAMBA):
        specs["layers_mamba"] = {
            "norm": P(None, None),
            "mixer.in_proj": col,
            "mixer.out_proj": row,
            "mixer.conv_w": P(None, "tensor", None),
            "mixer.conv_b": P(None, "tensor"),
            "mixer.A_log": P(None, "tensor"),
            "mixer.D": P(None, "tensor"),
            "mixer.dt_bias": P(None, "tensor"),
            "mixer.gnorm": P(None, "tensor"),
        }
    if cfg.n_blocks(ATTN):
        specs["layers_attn"] = {
            "norm": P(None, None),
            "self_attn.q_proj": col, "self_attn.k_proj": col,
            "self_attn.v_proj": col, "self_attn.o_proj": row,
        }
    if cfg.n_blocks(MLP):
        specs["layers_mlp"] = {
            "norm": P(None, None), "mlp.up_proj": col, "mlp.down_proj": row,
        }
    return specs


def build_layout(cfg: MambaConfig, qcfg: QuantizeConfig) -> QuantLayout:
    sites = {}
    for name in MIXER_NAMES + ATTN_NAMES + MLP_NAMES:
        full = f"model.layers.0.{name}"
        sites[f"{name}.weight"] = qcfg.resolve(f"{full}.weight_quantizer")
        sites[f"{name}.input"] = qcfg.resolve(f"{full}.input_quantizer")
    for name in llama.BMM_NAMES:
        sites[name] = qcfg.resolve(f"model.layers.0.{name}_quantizer")
    sites["lm_head.weight"] = qcfg.resolve("lm_head.weight_quantizer")
    sites["embed_tokens.weight"] = qcfg.resolve("model.embed_tokens.weight_quantizer")
    return QuantLayout(sites=tuple(sites.items()))


def init_quant_state(cfg: MambaConfig, layout: QuantLayout) -> dict:
    shapes = _shapes(cfg)

    def stacked(site_cfg, shape, L):
        st = Q.init_state(site_cfg, shape)
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), st)

    def group(names, L):
        st: dict = {}
        for name in names:
            o, inp = shapes[name]
            wcfg = layout.get(f"{name}.weight")
            icfg = layout.get(f"{name}.input")
            sub = {}
            if wcfg.enable:
                sub["weight"] = stacked(wcfg, (o, inp), L)
            if icfg.enable:
                sub["input"] = stacked(icfg, (1, 1, inp), L)
            if sub:
                st[name] = sub
        return st

    state: dict = {}
    if cfg.n_blocks(MAMBA):
        state["mamba"] = group(MIXER_NAMES, cfg.n_blocks(MAMBA))
    if cfg.n_blocks(ATTN):
        a = group(ATTN_NAMES, cfg.n_blocks(ATTN))
        for name in llama.BMM_NAMES:
            bcfg = layout.get(name)
            if bcfg.enable:
                a[name] = stacked(
                    bcfg, (1, 1, cfg.num_key_value_heads, cfg.hd), cfg.n_blocks(ATTN)
                )
        state["attn"] = a
    if cfg.n_blocks(MLP):
        state["mlp"] = group(MLP_NAMES, cfg.n_blocks(MLP))
    return state


# --------------------------------------------------------------------------
# Mamba2 mixer
# --------------------------------------------------------------------------


def _segsum(a: jax.Array) -> jax.Array:
    """Lower-triangular segment sums: out[..., i, j] = sum_{k=j+1..i} a_k."""
    Qn = a.shape[-1]
    cs = jnp.cumsum(a, axis=-1)
    d = cs[..., :, None] - cs[..., None, :]
    mask = jnp.tril(jnp.ones((Qn, Qn), bool))
    return jnp.where(mask, d, -jnp.inf)


def _ssd(x, dt, A, Bm, Cm, chunk: int, init_state=None):
    """Chunked SSD (Mamba2): returns (y [B,T,H,P], final_state [B,H,P,N]).

    x [B,T,H,P], dt [B,T,H] (post-softplus), A [H] (negative), Bm/Cm
    [B,T,G,N]. Within-chunk terms are quadratic matmuls (MXU); across chunks
    a short lax.scan carries the [B,H,P,N] state. All state math in f32.
    """
    Bsz, T, H, Pd = x.shape
    G, N = Bm.shape[2], Bm.shape[3]
    pad = (-T) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Tp = T + pad
    nC = Tp // chunk
    rep = H // G

    f32 = jnp.float32
    xb = x.reshape(Bsz, nC, chunk, H, Pd).astype(f32)
    dtb = dt.reshape(Bsz, nC, chunk, H).astype(f32)
    Bb = jnp.repeat(Bm.reshape(Bsz, nC, chunk, G, N), rep, axis=3).astype(f32)
    Cb = jnp.repeat(Cm.reshape(Bsz, nC, chunk, G, N), rep, axis=3).astype(f32)

    a = (dtb * A.astype(f32)[None, None, None, :]).transpose(0, 1, 3, 2)  # [B,nC,H,Q]
    A_cum = jnp.cumsum(a, axis=-1)
    L = jnp.exp(_segsum(a))  # [B,nC,H,Q,Q]
    xdt = xb * dtb[..., None]  # [B,nC,Q,H,P]

    y_diag = jnp.einsum("bclhn,bcshn,bchls,bcshp->bclhp", Cb, Bb, L, xdt)
    decay_states = jnp.exp(A_cum[..., -1:] - A_cum)  # [B,nC,H,Q]
    states = jnp.einsum("bclhn,bchl,bclhp->bchpn", Bb, decay_states, xdt)
    chunk_decay = jnp.exp(A_cum[..., -1])  # [B,nC,H]

    S0 = (jnp.zeros((Bsz, H, Pd, N), f32) if init_state is None
          else init_state.astype(f32))

    def scan_fn(S, inp):
        st, dec = inp
        return S * dec[..., None, None] + st, S

    final, prevs = jax.lax.scan(
        scan_fn, S0,
        (states.transpose(1, 0, 2, 3, 4), chunk_decay.transpose(1, 0, 2)),
    )
    prevs = prevs.transpose(1, 0, 2, 3, 4)  # [B,nC,H,P,N]
    y_off = jnp.einsum("bclhn,bchpn,bchl->bclhp", Cb, prevs, jnp.exp(A_cum))
    y = (y_diag + y_off).reshape(Bsz, Tp, H, Pd)[:, :T]
    return y.astype(x.dtype), final


def _causal_conv(xBC, w, b, conv_state):
    """Depthwise causal conv via shifted adds (kernel is tiny, K=4).

    xBC [B,T,C], w [C,K], b [C], conv_state [B,K-1,C] (trailing context) or
    None. Returns (y [B,T,C], new_state [B,K-1,C])."""
    K = w.shape[-1]
    Bsz, T, Cd = xBC.shape
    if conv_state is None:
        conv_state = jnp.zeros((Bsz, K - 1, Cd), xBC.dtype)
    full = jnp.concatenate([conv_state.astype(xBC.dtype), xBC], axis=1)
    y = jnp.zeros((Bsz, T, Cd), jnp.float32)
    for k in range(K):
        y = y + full[:, k:k + T].astype(jnp.float32) * w[:, k].astype(jnp.float32)
    y = y + b.astype(jnp.float32)
    new_state = full[:, -(K - 1):] if K > 1 else jnp.zeros((Bsz, 0, Cd), xBC.dtype)
    return y.astype(xBC.dtype), new_state


def _mixer(cfg, x, lp, lstate, layout, cache_m, calib, capture=False):
    """Mamba2 mixer block body. cache_m = (conv_state, ssm_state) or None."""
    Bsz, T, _ = x.shape
    H, Pd, G, N = (cfg.mamba_num_heads, cfg.mamba_head_dim, cfg.n_groups,
                   cfg.ssm_state_size)
    d_inner = cfg.d_inner
    new_state = {}

    proj, s = _linear(x, lp["mixer.in_proj"], "mixer.in_proj", layout, lstate, calib)
    if s:
        new_state["mixer.in_proj"] = s
    z = proj[..., :d_inner]
    xBC = proj[..., d_inner:d_inner + cfg.conv_dim]
    dt = proj[..., d_inner + cfg.conv_dim:]

    conv_state = cache_m[0] if cache_m is not None else None
    xBC, new_conv = _causal_conv(xBC, lp["mixer.conv_w"], lp["mixer.conv_b"], conv_state)
    xBC = jax.nn.silu(xBC.astype(jnp.float32)).astype(xBC.dtype)

    xs = xBC[..., :d_inner].reshape(Bsz, T, H, Pd)
    Bm = xBC[..., d_inner:d_inner + G * N].reshape(Bsz, T, G, N)
    Cm = xBC[..., d_inner + G * N:].reshape(Bsz, T, G, N)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + lp["mixer.dt_bias"].astype(jnp.float32))
    lo, hi = cfg.time_step_limit
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)
    A = -jnp.exp(lp["mixer.A_log"].astype(jnp.float32))  # [H]

    init_state = cache_m[1] if cache_m is not None else None
    if T == 1 and cache_m is not None:
        # O(1) recurrent step: h' = h·exp(dt·A) + dt·(B ⊗ x); y = C·h' + D·x
        f32 = jnp.float32
        rep = H // G
        dt1 = dt[:, 0]  # [B,H]
        dA = jnp.exp(dt1 * A[None, :])  # [B,H]
        Bh = jnp.repeat(Bm[:, 0], rep, axis=1).astype(f32)  # [B,H,N]
        Ch = jnp.repeat(Cm[:, 0], rep, axis=1).astype(f32)
        x1 = xs[:, 0].astype(f32)  # [B,H,P]
        h = init_state.astype(f32) * dA[..., None, None] + (
            (dt1[..., None] * x1)[..., None] * Bh[:, :, None, :]
        )
        y = jnp.einsum("bhpn,bhn->bhp", h, Ch)[:, None]  # [B,1,H,P]
        new_ssm = h
    else:
        y, new_ssm = _ssd(xs * 1.0, dt, A, Bm, Cm, cfg.chunk_size, init_state)
    y = y + xs.astype(jnp.float32)[..., :, :] * lp["mixer.D"].astype(jnp.float32)[None, None, :, None]
    y = y.reshape(Bsz, T, d_inner)

    # gated RMSNorm (Mamba2 RMSNormGated: norm(y * silu(z)) * weight)
    g = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    var = jnp.mean(g * g, axis=-1, keepdims=True)
    g = (g * jax.lax.rsqrt(var + cfg.rms_norm_eps)).astype(x.dtype) * lp["mixer.gnorm"]

    out, s = _linear(g, lp["mixer.out_proj"], "mixer.out_proj", layout, lstate, calib)
    if s:
        new_state["mixer.out_proj"] = s
    caps = {"mixer_out_in": llama._grab(g, 128)} if capture else {}
    new_cache = (new_conv, new_ssm) if cache_m is not None else None
    return out, new_state, new_cache, caps


def _attention(cfg, x, lp, lstate, layout, positions, mask, cache_kv, calib):
    """No-RoPE GQA attention (NemotronH: SSM carries position)."""
    hd, nH, nKV = cfg.hd, cfg.num_attention_heads, cfg.num_key_value_heads
    Bsz, T, _ = x.shape
    new_state = {}

    def lin(name):
        y, s = _linear(x, lp[name], name, layout, lstate, calib)
        if s:
            new_state[name] = s
        return y

    q = lin("self_attn.q_proj").reshape(Bsz, T, nH, hd)
    k = lin("self_attn.k_proj").reshape(Bsz, T, nKV, hd)
    v = lin("self_attn.v_proj").reshape(Bsz, T, nKV, hd)

    for name, t in (("self_attn.k_bmm", k), ("self_attn.v_bmm", v)):
        bcfg = layout.get(name)
        t2, st = _qsite(t, bcfg, (lstate or {}).get(name), calib)
        if st is not None:
            new_state[name] = st
        if name.startswith("self_attn.k"):
            k = t2
        else:
            v = t2

    new_cache = None
    if cache_kv is not None:
        ck, cv, pos = cache_kv
        ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), pos, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), pos, axis=1)
        k, v = ck, cv
        new_cache = (ck, cv)
    rep = nH // nKV
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd) + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(Bsz, T, nH * hd)
    out, s = _linear(ctx, lp["self_attn.o_proj"], "self_attn.o_proj", layout, lstate, calib)
    if s:
        new_state["self_attn.o_proj"] = s
    return out, new_state, new_cache, ctx


def _mlp(x, lp, lstate, layout, calib):
    """NemotronH MLP: down(relu(up(x))^2)."""
    new_state = {}
    u, s = _linear(x, lp["mlp.up_proj"], "mlp.up_proj", layout, lstate, calib)
    if s:
        new_state["mlp.up_proj"] = s
    a = jnp.square(jax.nn.relu(u.astype(jnp.float32))).astype(x.dtype)
    d, s = _linear(a, lp["mlp.down_proj"], "mlp.down_proj", layout, lstate, calib)
    if s:
        new_state["mlp.down_proj"] = s
    return d, new_state, a


def init_cache(cfg: MambaConfig, batch: int, max_len: int, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    Lm, La = cfg.n_blocks(MAMBA), cfg.n_blocks(ATTN)
    cache: dict = {"pos": jnp.asarray(0, jnp.int32)}
    if Lm:
        cache["conv"] = jnp.zeros(
            (Lm, batch, cfg.conv_kernel - 1, cfg.conv_dim), dtype)
        cache["ssm"] = jnp.zeros(
            (Lm, batch, cfg.mamba_num_heads, cfg.mamba_head_dim,
             cfg.ssm_state_size), jnp.float32)
    if La:
        cache["k"] = jnp.zeros((La, batch, max_len, cfg.num_key_value_heads, cfg.hd), dtype)
        cache["v"] = jnp.zeros_like(cache["k"])
    return cache


def forward(
    cfg: MambaConfig,
    params: dict,
    tokens: jax.Array,
    *,
    layout: Optional[QuantLayout] = None,
    qstate: Optional[dict] = None,
    calib: bool = False,
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    capture: bool = False,
):
    """Returns (logits, new_qstate, new_cache[, captures]).

    qstate follows the {"mamba": ..., "attn": ..., "mlp": ...} split of
    `init_quant_state` (each leaf stacked over that type's block count).
    """
    if layout is None:
        layout = QuantLayout(sites=())
    B, T = tokens.shape
    if positions is None:
        start = cache["pos"] if cache is not None else 0
        positions = start + jnp.arange(T)[None, :].astype(jnp.int32)
        positions = jnp.broadcast_to(positions, (B, T))

    x = params["embed_tokens"][tokens].astype(cfg.dtype)

    if cache is not None and "k" in cache:
        S = cache["k"].shape[2]
        kpos = jnp.arange(S)[None, :]
        qpos = positions[0][:, None]
        mask = jnp.where(kpos <= qpos, 0.0, -1e9)[None, None, :, :].astype(jnp.float32)
    else:
        mask = jnp.where(
            jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
        )[None, None, :, :].astype(jnp.float32)

    group_key = {MAMBA: "mamba", ATTN: "attn", MLP: "mlp"}
    group_params = {MAMBA: params.get("layers_mamba"),
                    ATTN: params.get("layers_attn"),
                    MLP: params.get("layers_mlp")}
    qs = qstate or {}
    new_qs: dict = {k: [] for k in ("mamba", "attn", "mlp")}
    new_conv, new_ssm, new_k, new_v = [], [], [], []
    captures: dict = {"block_in": [], "mixer_out_in": [], "down_in": [], "o_in": []}

    counters = {MAMBA: 0, ATTN: 0, MLP: 0}
    for ch in cfg.hybrid_pattern:
        i = counters[ch]
        counters[ch] += 1
        lp = slice_layer(group_params[ch], i)
        gstate = qs.get(group_key[ch])
        lstate = slice_layer(gstate, i) if gstate else None

        h = rms_norm(x, lp["norm"], cfg.rms_norm_eps)
        if capture:
            captures["block_in"].append(llama._grab(h, 128))
        if ch == MAMBA:
            cache_m = ((cache["conv"][i], cache["ssm"][i])
                       if cache is not None else None)
            out, st, new_cache_m, caps = _mixer(
                cfg, h, lp, lstate, layout, cache_m, calib, capture)
            if capture:
                captures["mixer_out_in"].append(caps["mixer_out_in"])
            if new_cache_m is not None:
                new_conv.append(new_cache_m[0])
                new_ssm.append(new_cache_m[1])
        elif ch == ATTN:
            cache_kv = ((cache["k"][i], cache["v"][i], cache["pos"])
                        if cache is not None else None)
            out, st, new_cache_kv, o_in = _attention(
                cfg, h, lp, lstate, layout, positions, mask, cache_kv, calib)
            if capture:
                captures["o_in"].append(llama._grab(o_in, 128))
            if new_cache_kv is not None:
                new_k.append(new_cache_kv[0])
                new_v.append(new_cache_kv[1])
        else:
            out, st, down_in = _mlp(h, lp, lstate, layout, calib)
            if capture:
                captures["down_in"].append(llama._grab(down_in, 128))
        x = x + out
        new_qs[group_key[ch]].append(st)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    head_w = params.get("lm_head", params["embed_tokens"])
    logits = (x @ head_w.T.astype(x.dtype)).astype(jnp.float32)

    def restack(lst):
        if not lst or all(s is None or s == {} for s in lst):
            return None
        return jax.tree.map(lambda *xs: jnp.stack(xs), *lst)

    out_qstate = None
    if calib or qstate:
        out_qstate = {}
        for k in ("mamba", "attn", "mlp"):
            st = restack(new_qs[k])
            if st is not None:
                out_qstate[k] = st

    new_cache = None
    if cache is not None:
        new_cache = {"pos": cache["pos"] + T}
        if new_conv:
            new_cache["conv"] = jnp.stack(new_conv)
            new_cache["ssm"] = jnp.stack(new_ssm)
        if new_k:
            new_cache["k"] = jnp.stack(new_k)
            new_cache["v"] = jnp.stack(new_v)

    if capture:
        caps = {k: jnp.stack(v) for k, v in captures.items() if v}
        return logits, out_qstate, new_cache, caps
    return logits, out_qstate, new_cache


@dataclasses.dataclass
class MambaQuantizedModel:
    model_cfg: MambaConfig
    params: dict
    layout: QuantLayout
    qstate: dict
    quant_cfg: Any

    def forward(self, tokens, **kw):
        return forward(self.model_cfg, self.params, tokens,
                       layout=self.layout, qstate=self.qstate, **kw)


def quantize(cfg: MambaConfig, params: dict, quant_cfg, calib_batches) -> MambaQuantizedModel:
    """Max-calibration PTQ over the hybrid stack (every preset applies; the
    reference quantizes NemotronH through the same HF-plugin machinery)."""
    from ..quant.config import get_preset

    if isinstance(quant_cfg, str):
        quant_cfg = get_preset(quant_cfg)
    layout = build_layout(cfg, quant_cfg)
    qstate = init_quant_state(cfg, layout)
    step = jax.jit(
        lambda p, t, q: forward(cfg, p, t, layout=layout, qstate=q, calib=True)[1]
    )
    for batch in calib_batches:
        qstate = step(params, jnp.asarray(batch), qstate)
    return MambaQuantizedModel(cfg, params, layout, qstate, quant_cfg)


def generate(cfg, params, prompt, max_new_tokens=8, max_len=64, **kw):
    """Greedy generation via prefill + recurrent decode (host loop)."""
    cache = init_cache(cfg, prompt.shape[0], max_len)
    logits, _, cache = forward(cfg, params, prompt, cache=cache, **kw)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    out = [tok]
    for _ in range(max_new_tokens - 1):
        logits, _, cache = forward(cfg, params, tok, cache=cache, **kw)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out.append(tok)
    return jnp.concatenate(out, axis=1)
