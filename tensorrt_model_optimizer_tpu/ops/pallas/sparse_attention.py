"""Skip-softmax sparse flash attention (Pallas).

The kernel counterpart of `sparsity/attention_sparsity.py` — re-creates the
reference's Triton skip-softmax flash kernels
(`kernels/sparsity/attention/`, diffusers/LTX variants): a [Tq x Tk] score
block whose maximum is more than log(threshold) below the q-tile's running
row max contributes < threshold relative probability mass, so its exp/PV
work is skipped entirely. On TPU the skip is a `pl.when` on a per-block
scalar — the MXU still computes the QK^T block (that dot is what produces
the decision), but the exp, the PV matmul, and the state update are elided,
which is where most of the time goes for high-sparsity diffusion attention.

Non-causal (DiT/video diffusion) layout: q/k/v [B, H, S, d]. A second
output reports the per-(q-tile, k-tile) keep decision so calibration can
measure realized block sparsity on hardware.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale, log_thresh, nq, nk, bq, bk, causal, q_ref, k_ref, v_ref,
            o_ref, keep_ref, m_ref, l_ref, acc_ref):
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_kt = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        keep_ref[0] = jnp.zeros_like(keep_ref[0])

    q = q_ref[0].astype(jnp.float32)  # [Tq, d]
    k = k_ref[0].astype(jnp.float32)  # [Tk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Tq, Tk]

    if causal:
        rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(cols <= rows, s, -1e30)

    blk_max = jnp.max(s)
    # Tile-level skip test matching `attention_sparsity.block_skip_mask` (so
    # calibrated thresholds transfer): skip when the tile's max sits more
    # than log(threshold) below the q-tile's running max. (The earlier
    # min-over-rows form was so conservative it never skipped on real data.)
    # Under causality, tiles fully above the diagonal mask to -1e30 and the
    # structural term kills them outright.
    keep = blk_max >= jnp.max(m_ref[:]) + log_thresh
    if causal:
        keep = keep & (j * bk <= i * bq + bq - 1)
    # dynamic-lane stores aren't legal on Mosaic; mask-update the whole
    # (tiny) [nq, nk] map instead
    cell = (jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) == i) & (
        jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) == j)
    keep_ref[0] = jnp.where(cell, keep.astype(jnp.int32), keep_ref[0])

    @pl.when(keep)
    def _():
        v = v_ref[0].astype(jnp.float32)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if causal:
            # rows with no unmasked entry yet have m_new = -1e30 and
            # exp(s - m_new) = 1 garbage; zero masked lanes explicitly
            p = jnp.where(s > -1e29, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    @pl.when(j == n_kt - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _skip_softmax_ref(q, k, v, scale, log_thresh, bq, bk, causal):
    """jnp emulation of the kernel, used when no TPU is present.

    Interpret-mode Pallas iterates every grid cell in Python — at RULER
    calibration sizes (BH 512 x 7 x 7 tiles x 6 layers x 27 sweep points)
    that is millions of interpreted cells and effectively hangs (observed
    2026-08-20). This path reproduces the kernel's EXACT keep semantics
    (tile max vs the q-tile's running max over previously KEPT tiles, in
    k-tile visit order, causal structural skip) with one scan over k tiles,
    so CPU-calibrated thresholds transfer to the hardware kernel."""
    BH, S, d = q.shape
    nq, nk = S // bq, S // bk
    s = jax.lax.dot_general(
        q.astype(jnp.float32), k.astype(jnp.float32),
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    ) * scale  # [BH, S, S]
    if causal:
        rows = jnp.arange(S)[:, None]
        s = jnp.where(jnp.arange(S)[None, :] <= rows, s, -1e30)
    blk_max = s.reshape(BH, nq, bq, nk, bk).max(axis=(2, 4))  # [BH, nq, nk]

    def visit(run, j):
        bm = blk_max[:, :, j]
        keep = bm >= run + log_thresh
        if causal:
            # tiles fully above the diagonal are structurally skipped
            qi = jnp.arange(nq)
            keep = keep & (j * bk <= qi[None, :] * bq + bq - 1)
        run = jnp.where(keep, jnp.maximum(run, bm), run)
        return run, keep

    _, keep_t = jax.lax.scan(visit, jnp.full((BH, nq), -1e30), jnp.arange(nk))
    keep = jnp.moveaxis(keep_t, 0, -1)  # [BH, nq, nk]
    keep_full = jnp.broadcast_to(
        keep[:, :, None, :, None], (BH, nq, bq, nk, bk)
    ).reshape(BH, S, S)
    s = jnp.where(keep_full, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(s > -1e29, p, 0.0)
    out = jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype), keep.astype(jnp.int32)


def skip_softmax_flash(
    q: jax.Array,  # [BH, S, d] (fold batch*heads outside)
    k: jax.Array,
    v: jax.Array,
    threshold: float = 1e-3,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
    causal: bool = False,
):
    """Returns (out [BH, S, d], keep [BH, nQt, nKt] int32).

    NOTE the skip test compares against the running max, so k-tiles visited
    BEFORE the row max is seen are kept conservatively — same behavior as
    the reference kernel (skipping only provably-negligible blocks).
    With `causal=True` the standard LLM-prefill mask applies inside the
    kernel and tiles fully above the diagonal are skipped structurally.
    """
    BH, S, d = q.shape
    bq = min(block_q, S)
    bk = min(block_k, S)
    while S % bq:
        bq //= 2
    while S % bk:
        bk //= 2
    nq, nk = S // bq, S // bk
    if interpret is None:
        from .qmm import _interpret

        interpret = _interpret()
    if interpret:
        return _skip_softmax_ref(
            q, k, v, 1.0 / math.sqrt(d), math.log(max(threshold, 1e-30)),
            bq, bk, causal)
    kern = functools.partial(_kernel, 1.0 / math.sqrt(d),
                             math.log(max(threshold, 1e-30)), nq, nk, bq, bk,
                             causal)
    out, keep = pl.pallas_call(
        kern,
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            # whole [nq, nk] keep map stays resident per b; each (i, j)
            # grid step stores its own cell
            pl.BlockSpec((1, nq, nk), lambda b, i, j: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, d), q.dtype),
            jax.ShapeDtypeStruct((BH, nq, nk), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, keep
