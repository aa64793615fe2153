"""The quantizer: static config + pytree state + pure functions.

TPU-native re-design of the reference's `TensorQuantizer`
(`modelopt/torch/quantization/nn/modules/tensor_quantizer.py:136`). Instead of
a mutable nn.Module holding buffers, a quantizer here is:

 - `QuantizerConfig`: frozen, hashable, jit-static. Carries format (int bits
   or (E, M)), axis/block layout, dynamic-vs-static, calibrator choice — the
   equivalent of `QuantizerAttributeConfig` (`config.py:329`).
 - `QuantizerState`: a small pytree (amax, pre_quant_scale, bias) that flows
   through jitted calibration/forward passes — the equivalent of the
   TensorQuantizer buffers, but functional so `lax.scan`/`pjit` can carry it.
 - pure functions: `init_state`, `collect`, `quantize`.

Sequential (W4A8-style) quantizers are a config with `sequential` children
(reference `SequentialQuantizer`, `tensor_quantizer.py:1797`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp

from ..ops import numerics, ste
from ..ops.formats import BlockSpec, NumBits

@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    """Static description of one quantization site.

    Fields mirror `QuantizerAttributeConfig` semantics:
      enable: disabled quantizers are identity (still recorded for provenance).
      num_bits: int width (4, 8, ...) or (E, M) tuple ((4,3) FP8, (2,1) FP4).
      axis: kept axes for per-channel amax (reference `axis`); None=per-tensor.
      block: block-quant layout (sizes / scale format / dynamic).
      dynamic: scales recomputed from data each call (no calibrated amax).
      per_token: dynamic per-token amax (reduce only the feature axis).
      unsigned / narrow_range: integer grid options.
      pre_quant_scale: site carries a SmoothQuant/AWQ per-channel scale.
      bias_corr: affine bias state (KV-cache affine variants).
      constant_amax: pin amax to a constant (FP8 "cast" KV presets pin 448;
        reference `use_constant_amax`, `config.py:672-679`).
      pass_through_bwd: identity STE backward (QAT option).
      calibrator: "max" | "histogram" | "mse" — which collector to run.
      sequential: chain of configs applied in order over the same tensor
        (W4A8 = INT4-block then FP8).
      backend: optional named kernel backend override (Pallas dispatch).
    """

    enable: bool = True
    num_bits: NumBits = 8
    axis: Optional[tuple[int, ...]] = None
    block: Optional[BlockSpec] = None
    dynamic: bool = False
    per_token: bool = False
    unsigned: bool = False
    narrow_range: bool = False
    pre_quant_scale: bool = False
    bias_corr: bool = False
    constant_amax: Optional[float] = None
    pass_through_bwd: bool = False
    learn_amax: bool = False  # LSQ: amax receives gradients (QAT)
    rotate: bool = False  # Hadamard (RHT) rotation before quant
    calibrator: str = "max"
    sequential: Optional[tuple["QuantizerConfig", ...]] = None
    backend: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.num_bits, list):
            object.__setattr__(self, "num_bits", tuple(self.num_bits))
        if isinstance(self.axis, int):
            object.__setattr__(self, "axis", (self.axis,))
        elif isinstance(self.axis, list):
            object.__setattr__(self, "axis", tuple(self.axis))
        if isinstance(self.block, dict):
            object.__setattr__(self, "block", BlockSpec.from_dict(self.block))

    @property
    def is_fp(self) -> bool:
        return isinstance(self.num_bits, tuple)

    @property
    def fake_bits(self) -> float:
        """Effective bits incl. block-scale overhead (AutoQuantize cost)."""
        if self.sequential:
            return min(c.fake_bits for c in self.sequential)
        if not self.enable:
            return 16.0
        bits = sum(self.num_bits) + 1 if self.is_fp else self.num_bits
        if self.block is not None and self.block.scale_bits is not None:
            sb = self.block.scale_bits
            sbits = sum(sb) + 1 if isinstance(sb, tuple) else sb
            bsz = self.block.sizes[0][1] if self.block.sizes else 1
            if bsz > 0:
                bits = bits + sbits / bsz
        return float(bits)

    def replace(self, **kw) -> "QuantizerConfig":
        return dataclasses.replace(self, **kw)


DISABLED = QuantizerConfig(enable=False)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizerState:
    """Per-site calibrated state (a pytree; every leaf optional)."""

    amax: Optional[jax.Array] = None
    pre_quant_scale: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    # Running auxiliary stats used by some calibrators (e.g. act mean for
    # bias correction); kept here so one scan carries everything.
    aux: Optional[dict[str, jax.Array]] = None

    def replace(self, **kw) -> "QuantizerState":
        return dataclasses.replace(self, **kw)


def _resolve_axes(axis: tuple[int, ...], ndim: int) -> tuple[int, ...]:
    return tuple(sorted(a % ndim for a in axis))


def amax_shape(cfg: QuantizerConfig, x_shape: tuple[int, ...]) -> Optional[tuple[int, ...]]:
    """Shape of the calibrated amax buffer for a tensor of `x_shape`.

    per-tensor -> (); per-channel -> keepdims shape; static block -> compact
    per-block shape; dynamic -> None (no state). NVFP4 static weights keep a
    per-tensor global amax even though block scales are dynamic.
    """
    if not cfg.enable:
        return None
    if cfg.sequential:
        raise ValueError("amax_shape on sequential parent; query children")
    if cfg.dynamic or (cfg.block is not None and cfg.block.dynamic):
        # NVFP4-style two-level needs the per-tensor global amax.
        if cfg.block is not None and cfg.block.scale_bits is not None:
            return ()
        return None
    if cfg.constant_amax is not None:
        return ()
    if cfg.block is not None and cfg.block.sizes:
        norm = [(a % len(x_shape), min(b, x_shape[a % len(x_shape)])) for a, b in cfg.block.sizes]
        axmap = dict(norm)
        return tuple(
            -(-d // axmap[i]) if i in axmap else d for i, d in enumerate(x_shape)
        )
    if cfg.axis is not None:
        kept = _resolve_axes(cfg.axis, len(x_shape))
        return tuple(d if i in kept else 1 for i, d in enumerate(x_shape))
    return ()


def init_state(cfg: QuantizerConfig, x_shape: tuple[int, ...]) -> QuantizerState:
    if cfg.sequential:
        # Sequential (W4A8-style): amax is a tuple of per-child amaxes
        # (reference SequentialQuantizer keeps independent quantizers).
        children = [init_state(c, x_shape) for c in cfg.sequential]
        amaxes = tuple(c.amax for c in children)
        return QuantizerState(amax=amaxes if any(a is not None for a in amaxes) else None)
    if not cfg.enable:
        return QuantizerState()
    shp = amax_shape(cfg, x_shape)
    amax = None
    if shp is not None:
        if cfg.constant_amax is not None:
            amax = jnp.full(shp, cfg.constant_amax, jnp.float32)
        else:
            amax = jnp.zeros(shp, jnp.float32)
    pqs = None
    if cfg.pre_quant_scale:
        pqs = jnp.ones((x_shape[-1],), jnp.float32)
    return QuantizerState(amax=amax, pre_quant_scale=pqs)


# --------------------------------------------------------------------------
# Calibration collect (max calibrator; histogram lives in quant/calib)
# --------------------------------------------------------------------------


def local_amax(x: jax.Array, cfg: QuantizerConfig) -> Optional[jax.Array]:
    """This batch's amax in the buffer's shape (before cross-device sync)."""
    shp = amax_shape(cfg, x.shape)
    if shp is None:
        return None
    x32 = jnp.abs(x.astype(jnp.float32))
    if cfg.block is not None and cfg.block.sizes and not (
        cfg.dynamic or cfg.block.dynamic
    ):
        return numerics.block_amax_compact(x32, cfg.block.sizes)
    if (cfg.dynamic or (cfg.block is not None and cfg.block.dynamic)) and shp == ():
        return jnp.max(x32)  # NVFP4 global amax
    if cfg.constant_amax is not None:
        return jnp.full((), cfg.constant_amax, jnp.float32)
    if cfg.axis is not None:
        kept = _resolve_axes(cfg.axis, x.ndim)
        red = tuple(i for i in range(x.ndim) if i not in kept)
        return jnp.max(x32, axis=red, keepdims=True)
    return jnp.max(x32)


def collect(x: jax.Array, cfg: QuantizerConfig, state: QuantizerState) -> QuantizerState:
    """Max-calibrator collect: running max into state.amax (pure)."""
    if not cfg.enable or cfg.constant_amax is not None:
        return state
    if state.pre_quant_scale is not None:
        # amax must describe what the quantizer actually sees at runtime
        # (the SmoothQuant/AWQ-scaled tensor).
        x = x * state.pre_quant_scale.astype(x.dtype)
    if cfg.rotate:
        from ..ops.hadamard import blocked_fwht

        x = blocked_fwht(x, -1)
    if cfg.sequential:
        old = state.amax if isinstance(state.amax, tuple) else (None,) * len(cfg.sequential)
        new = []
        for sub, prev in zip(cfg.sequential, old):
            cs = collect(x, sub, QuantizerState(amax=prev))
            new.append(cs.amax)
        return state.replace(amax=tuple(new))
    if cfg.bias_corr:
        # BiasCalibrator (`calib/bias.py`): affine KV variants track a
        # per-tensor midrange bias; amax then describes the centered tensor.
        x32 = x.astype(jnp.float32)
        hi, lo = jnp.max(x32), jnp.min(x32)
        if state.bias is None:
            bias = (hi + lo) / 2.0
            new_hi, new_lo = hi, lo
        else:
            # recover running extremes from (bias, amax): hi/lo = bias +- amax
            prev_amax = state.amax if state.amax is not None else 0.0
            new_hi = jnp.maximum(hi, state.bias + prev_amax)
            new_lo = jnp.minimum(lo, state.bias - prev_amax)
            bias = (new_hi + new_lo) / 2.0
        amax = (new_hi - new_lo) / 2.0
        return state.replace(amax=amax, bias=bias)
    la = local_amax(x, cfg)
    if la is None:
        return state
    amax = la if state.amax is None else jnp.maximum(state.amax, la)
    return state.replace(amax=amax)


# --------------------------------------------------------------------------
# Quantize (fake-quant forward)
# --------------------------------------------------------------------------


def _expand_amax(amax: jax.Array, cfg: QuantizerConfig, x: jax.Array) -> jax.Array:
    """Broadcast a stored amax buffer against x (handles compact block form)."""
    if cfg.block is not None and cfg.block.sizes and not (
        cfg.dynamic or cfg.block.dynamic
    ):
        return numerics.expand_block_scale(amax, x.shape, cfg.block.sizes)
    return amax


def _dynamic_amax(x: jax.Array, cfg: QuantizerConfig) -> jax.Array:
    if cfg.per_token:
        return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if cfg.axis is not None:
        kept = _resolve_axes(cfg.axis, x.ndim)
        red = tuple(i for i in range(x.ndim) if i not in kept)
        return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=red, keepdims=True)
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def quantize(
    x: jax.Array, cfg: QuantizerConfig, state: Optional[QuantizerState] = None,
    amax_reduce=None,
) -> jax.Array:
    """Fake-quantize `x` per the config (the TensorQuantizer forward).

    Order matches `tensor_quantizer.py:1119`: pre_quant_scale multiply (the
    scaled tensor is what flows onward — SmoothQuant/AWQ fold the inverse
    scale into the *weights* during calibration, `model_calib.py:1274`),
    then format-specific fake quant with STE gradients.

    `amax_reduce` (optional fn) reduces DYNAMIC amaxes across devices — the
    TP engine passes a `pmax` over the tensor axis for row-parallel inputs
    whose reduction dim is sharded, keeping per-token scales bit-identical
    to single-device. Block-dynamic formats (NVFP4/MX) never need it: their
    scale blocks are local to each shard.
    """
    state = state or QuantizerState()
    if state.pre_quant_scale is not None:
        # Applied even when the format is disabled: W4A16 AWQ keeps the
        # activation-side scale with act quantization off.
        x = x * state.pre_quant_scale.astype(x.dtype)
    if cfg.rotate:
        # RHT: orthonormal Hadamard flattens outliers; exact when the paired
        # weight site rotates its input dim too ((xH)(WH)^T = xW^T).
        from ..ops.hadamard import blocked_fwht

        x = blocked_fwht(x, -1)
    if not cfg.enable:
        return x

    if cfg.sequential:
        amaxes = state.amax if isinstance(state.amax, tuple) else (None,) * len(cfg.sequential)
        for sub, am in zip(cfg.sequential, amaxes):
            x = (_fake_quant_dispatch(x, sub, QuantizerState(amax=am), amax_reduce)
                 if sub.enable else x)
        return x

    if cfg.bias_corr and state.bias is not None:
        # affine: quantize the centered tensor, add the bias back
        b = state.bias.astype(x.dtype)
        return _fake_quant_dispatch(x - b, cfg, state, amax_reduce) + b
    return _fake_quant_dispatch(x, cfg, state, amax_reduce)


# Custom backend registry (`tensor_quantizer.py:92` register_quant_backend):
# pluggable fake-quant functionals selected via QuantizerConfig.backend.
_QUANT_BACKENDS: dict = {}


def register_quant_backend(name: str, fn) -> None:
    """Register `fn(x, cfg, state) -> x_q` under `name`; a QuantizerConfig
    with backend=name routes its fake-quant through it."""
    _QUANT_BACKENDS[name] = fn


def unregister_quant_backend(name: str) -> None:
    _QUANT_BACKENDS.pop(name, None)


def _fake_quant_dispatch(x, cfg: QuantizerConfig, state: QuantizerState,
                         amax_reduce=None):
    if cfg.backend is not None:
        if cfg.backend not in _QUANT_BACKENDS:
            raise KeyError(f"quant backend {cfg.backend!r} not registered")
        return _QUANT_BACKENDS[cfg.backend](x, cfg, state)
    blk = cfg.block
    dynamic_block = blk is not None and (blk.dynamic or cfg.dynamic) and blk.sizes

    # --- dynamic block formats (NVFP4 / MX) ---
    if dynamic_block:
        ax, bsz = blk.sizes[0]
        if blk.scale_bits == (4, 3) and cfg.num_bits == (2, 1):
            g_amax = state.amax if state.amax is not None else None
            return ste.fake_quant_nvfp4_ste(x, bsz, g_amax, ax)
        if blk.scale_bits == (8, 0):
            e, m = cfg.num_bits if cfg.is_fp else (0, 0)
            if cfg.is_fp:
                return ste.fake_quant_mx_ste(x, e, m, bsz, ax)
            # MXINT8-style: int grid with power-of-two shared scale
            def _mxint(t):
                bam = numerics.block_amax_compact(
                    t.astype(jnp.float32), ((ax, bsz),)
                )
                scale = numerics.e8m0_scale(bam, 0)
                sf = numerics.expand_block_scale(scale, t.shape, ((ax, bsz),))
                amax_full = sf * float(2 ** (cfg.num_bits - 1) - 1)
                return numerics.fake_quant_int(t, amax_full, cfg.num_bits)
            return ste.pass_through(_mxint, x)
        # generic dynamic block: amax per block computed on the fly
        def _dynblk(t):
            am = numerics.block_reduce_amax(t.astype(jnp.float32), blk.sizes)
            if cfg.is_fp:
                e, m = cfg.num_bits
                return numerics.fake_quant_fp(t, am, e, m)
            return numerics.fake_quant_int(t, am, cfg.num_bits, cfg.unsigned, cfg.narrow_range)
        return ste.pass_through(_dynblk, x)

    # --- dynamic per-token / per-tensor ---
    if cfg.dynamic:
        def _dyn(t):
            am = _dynamic_amax(t, cfg)
            if amax_reduce is not None:
                am = amax_reduce(am)
            if cfg.is_fp:
                e, m = cfg.num_bits
                return numerics.fake_quant_fp(t, am, e, m)
            return numerics.fake_quant_int(t, am, cfg.num_bits, cfg.unsigned, cfg.narrow_range)
        return ste.pass_through(_dyn, x)

    # --- static (calibrated amax) ---
    amax = state.amax
    if amax is None and cfg.constant_amax is not None:
        amax = jnp.asarray(cfg.constant_amax, jnp.float32)
    if amax is None:
        raise ValueError(
            "static quantizer used before calibration (amax is None); "
            f"cfg={cfg}"
        )
    amax_b = _expand_amax(amax, cfg, x)
    if cfg.pass_through_bwd:
        if cfg.is_fp:
            e, m = cfg.num_bits
            return ste.pass_through(lambda t: numerics.fake_quant_fp(t, amax_b, e, m), x)
        return ste.pass_through(
            lambda t: numerics.fake_quant_int(t, amax_b, cfg.num_bits, cfg.unsigned, cfg.narrow_range),
            x,
        )
    if cfg.is_fp:
        e, m = cfg.num_bits
        return ste.fake_quant_fp_ste(x, amax_b, e, m)
    if cfg.learn_amax:
        return ste.fake_quant_int_lsq(x, amax_b, cfg.num_bits)
    return ste.fake_quant_int_ste(x, amax_b, cfg.num_bits, cfg.unsigned, cfg.narrow_range)


def validate_state(state: QuantizerState, site: str = "?") -> list[str]:
    """Post-calibration sanity (`TensorQuantizer.validate_attr`,
    tensor_quantizer.py:753): amax must be finite and non-negative; returns
    human-readable problem strings (empty = ok)."""
    problems: list[str] = []
    amaxes = state.amax if isinstance(state.amax, tuple) else (state.amax,)
    for i, a in enumerate(amaxes):
        if a is None:
            continue
        a32 = jnp.asarray(a, jnp.float32)
        if bool(jnp.any(~jnp.isfinite(a32))):
            problems.append(f"{site}: amax[{i}] has NaN/Inf")
        elif bool(jnp.any(a32 < 0)):
            problems.append(f"{site}: amax[{i}] negative")
    if state.bias is not None and bool(jnp.any(~jnp.isfinite(jnp.asarray(state.bias, jnp.float32)))):
        problems.append(f"{site}: bias has NaN/Inf")
    return problems


def validate_qstate(qstate: dict) -> list[str]:
    """Walk a model qstate dict validating every quantizer's state
    (the post-calibration validation loop, `model_quant.py:116-119`)."""
    problems: list[str] = []
    for name, sub in (qstate or {}).items():
        if isinstance(sub, QuantizerState):
            problems += validate_state(sub, name)
        elif isinstance(sub, dict):
            for which, st in sub.items():
                if isinstance(st, QuantizerState):
                    problems += validate_state(st, f"{name}.{which}")
    return problems
