"""Histogram calibrator: percentile / entropy (KL) amax selection.

Replicates `modelopt/torch/quantization/calib/histogram.py:35,210,285,328`.
TPU-first twist: instead of a mutable torch calibrator that re-bins on the
fly, this is a two-pass functional design — pass 1 (max calibration) fixes the
range, pass 2 fills a fixed-bin histogram inside the jitted forward; amax
selection then runs host-side on the final counts. Fixed bins keep the
collect step a pure scatter-add that XLA vectorizes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HistogramState:
    counts: jax.Array  # [num_bins] float32
    amax: jax.Array  # scalar range (fixed after pass 1)


def init_histogram(range_amax: jax.Array, num_bins: int = 2048) -> HistogramState:
    return HistogramState(
        counts=jnp.zeros((num_bins,), jnp.float32),
        amax=jnp.asarray(range_amax, jnp.float32),
    )


def collect_histogram(x: jax.Array, st: HistogramState) -> HistogramState:
    """Scatter |x| into fixed bins [0, amax] (pure, jit-safe)."""
    nb = st.counts.shape[0]
    ax = jnp.abs(x.astype(jnp.float32)).reshape(-1)
    idx = jnp.clip((ax / jnp.maximum(st.amax, 1e-12) * nb).astype(jnp.int32), 0, nb - 1)
    counts = st.counts.at[idx].add(1.0)
    return HistogramState(counts=counts, amax=st.amax)


def percentile_amax(st: HistogramState, percentile: float = 99.99) -> jax.Array:
    """amax covering `percentile`% of observed magnitudes (`histogram.py:328`)."""
    nb = st.counts.shape[0]
    cdf = jnp.cumsum(st.counts)
    total = cdf[-1]
    target = total * (percentile / 100.0)
    idx = jnp.searchsorted(cdf, target)
    idx = jnp.clip(idx, 0, nb - 1)
    return (idx.astype(jnp.float32) + 1.0) / nb * st.amax


def mse_amax(st: HistogramState, num_bits: int = 8, n_steps: int = 64) -> jax.Array:
    """amax minimizing expected INT-quant MSE over the histogram density."""
    nb = st.counts.shape[0]
    centers = (jnp.arange(nb, dtype=jnp.float32) + 0.5) / nb * st.amax
    bound = float(2 ** (num_bits - 1) - 1)
    ratios = jnp.linspace(0.25, 1.0, n_steps)

    def loss(r):
        amax = st.amax * r
        scale = amax / bound
        q = jnp.clip(jnp.round(centers / scale), -bound - 1, bound) * scale
        return jnp.sum(st.counts * (q - centers) ** 2)

    losses = jax.lax.map(loss, ratios)
    return st.amax * ratios[jnp.argmin(losses)]


def entropy_amax(st: HistogramState, num_bits: int = 8, start_frac: float = 0.125) -> jax.Array:
    """KL-divergence-minimizing amax (TensorRT-style entropy calibration,
    `histogram.py:210`). Host-side numpy: runs once post-collection."""
    counts = np.asarray(st.counts)
    nb = counts.shape[0]
    nlevels = 2 ** (num_bits - 1)
    full_range = float(np.asarray(st.amax))
    start = max(int(nb * start_frac), nlevels)
    best_kl, best_i = np.inf, nb
    p_full = counts.astype(np.float64)
    tail_from = np.concatenate([np.cumsum(p_full[::-1])[::-1], [0.0]])
    nzf = (p_full > 0).astype(np.float64)
    # Every candidate bin is swept (reference histogram.py:210 sweeps stride
    # 1); per-candidate work is O(i) via reduceat, ~2k candidates total.
    for i in range(start, nb + 1):
        p = p_full[:i].copy()
        p[i - 1] += tail_from[i]  # clip-outliers mass into last bin
        psum = p.sum()
        if psum == 0:
            continue
        # quantize histogram into nlevels equal-width buckets: each kept bin
        # takes its bucket's mean over the bucket's nonzero bins
        edges = (np.arange(nlevels, dtype=np.float64) * (i / nlevels)).astype(int)
        sums = np.add.reduceat(p, edges)
        nz = np.add.reduceat(nzf[:i], edges)
        if p[i - 1] > 0 and p_full[i - 1] == 0:
            nz[-1] += 1  # tail mass made the last bin nonzero
        seg_lens = np.diff(np.append(edges, i))
        q_full = np.repeat(sums / np.maximum(nz, 1.0), seg_lens)
        q = np.where(p > 0, q_full, 0.0)
        pn = p / psum
        qn = q / max(q.sum(), 1e-12)
        mask = pn > 0
        kl = float(np.sum(pn[mask] * np.log(pn[mask] / np.maximum(qn[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return jnp.asarray(best_i / nb * full_range, jnp.float32)


def compute_amax(
    st: HistogramState,
    method: str = "percentile",
    percentile: float = 99.99,
    num_bits: int = 8,
) -> jax.Array:
    if method == "percentile":
        return percentile_amax(st, percentile)
    if method == "mse":
        return mse_amax(st, num_bits)
    if method == "entropy":
        return entropy_amax(st, num_bits)
    if method == "max":
        return st.amax
    raise ValueError(f"unknown histogram method {method!r}")
