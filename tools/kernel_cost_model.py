#!/usr/bin/env python
"""Static cost model for the serving-layout kernels (VERDICT r4 #10).

The relay's wall-clock microbench is unusable for kernel work (replay
caching, >HBM-peak readings, HTTP 500s on pallas-in-scan — r3/r4 notes),
and the engine A/B is too coarse an instrument to kill a bad layout cheaply
(bd4 cost a full engine cycle to discover a ~23x regression). This model
ranks layouts from KERNEL STRUCTURE alone — no timing:

  per decode step over one [O, K] site with N activation rows:
    hbm       packed bytes streamed (weights dominate at decode batch)
    vpu       decode-construct ops per element x elements touched
              (op counts from the kernel docstrings/code, not fitted)
    mxu       MXU dispatch count: grid cells x dot_generals per cell,
              each dispatch costing >= one systolic pass
    relayout  True when the decoded tile's lane/sublane orientation is not
              the dot operand's — Mosaic inserts per-tile vector shuffles
              whose cost is UNMODELED (the bd4 failure class); any layout
              with this flag is untrusted until engine-measured.

The score is the max of the three modeled axes in normalized units
(bytes / ops / dispatches scaled by per-unit weights from first
principles: HBM ~1 B/unit, VPU ~8 ops/unit-elem, MXU pass ~128 K-depth).
`rank()` returns layouts best-first with flags. The test
(tests/test_kernel_cost_model.py) pins the ordering to the round-4/5
ENGINE-MEASURED ordering — if a new layout ranks well here but regresses
on-chip (or vice versa), the model's assumptions are what to update.
"""

import json
import sys

# per-element decode-construct VPU op counts, from the kernel code:
#   word:  ~6 ops + 1 bitcast per 2 elements            -> 3.5
#   word2: ~13 ops + 4 bitcasts per 8 elements          -> 2.1
#   scale tail (elementwise layouts): lane repeat + mul -> +2.0
#   bd2/bd3: word2 construct, NO elementwise scale tail -> 2.1 (+post-dot
#            scale on [nblk, TN, TO] results: TN*O*nblk elems, tiny at
#            decode N)
#   a8:    3 i32 ops per 8 elements (int8 codes)        -> 0.4
#   xla:   s4->bf16 convert NOT fused into the dot; XLA materializes the
#          grouped dequant (measured 0.275x) — modeled as decode 1.0 +
#          full bf16 tile write+read to HBM
LAYOUTS = {
    # fmt: layout: dict(bits, vpu_per_elem, dots_per_tile, tile=(TO, TK),
    #                   relayout, extra_hbm_bytes_per_elem)
    "int4": {
        "a8":   dict(bits=4, vpu=0.4, dots=2, tile=(512, 4096), relayout=False, extra=0.0),
        "bd3":  dict(bits=4, vpu=2.1, dots=2, tile=(512, 4096), relayout=False, extra=0.0),
        "bd2":  dict(bits=4, vpu=2.1, dots=5, tile=(512, 4096), relayout=False, extra=0.0),
        "word2": dict(bits=4, vpu=4.1, dots=4, tile=(512, 2048), relayout=False, extra=0.0),
        "word": dict(bits=4, vpu=5.5, dots=1, tile=(256, 2048), relayout=False, extra=0.0),
        "xla":  dict(bits=4, vpu=1.0, dots=1, tile=(512, 4096), relayout=False, extra=2.0),
    },
    "nvfp4": {
        "word2": dict(bits=4.5, vpu=4.1, dots=4, tile=(512, 2048), relayout=False, extra=0.0),
        "word": dict(bits=4.5, vpu=5.5, dots=1, tile=(256, 2048), relayout=False, extra=0.0),
        "bd4":  dict(bits=4.5, vpu=2.6, dots=1, tile=(512, 4096), relayout=True, extra=0.0),
        "i8":   dict(bits=8, vpu=0.0, dots=1, tile=(512, 4096), relayout=False, extra=0.0),
        # blockdot: one 16-deep batched dot PER PLANE per 16-block
        # (K/16 blocks x 2 planes = 512 dispatches per 4096-K tile)
        "blockdot": dict(bits=4.5, vpu=1.0, dots=512, tile=(512, 4096), relayout=False, extra=0.0),
    },
}

# normalization: one "unit" ~ the cost of streaming 1 byte from HBM.
VPU_OPS_PER_UNIT = 4.0     # ~4 elementwise int/bf16 ops per byte-time
                           # (v5e VPU throughput : HBM bandwidth)
MXU_PASS_UNITS = 32768.0   # one dot dispatch ~ issue + pipeline fill
                           # (~100 ns at HBM-peak byte-time ~ 32 KB)
RELAYOUT_PENALTY = 20.0    # unmodeled; forces "untrusted" rank, not a fit


def score(fmt: str, layout: str, O=14336, K=4096, N=8):
    c = LAYOUTS[fmt][layout]
    elems = O * K
    hbm = elems * c["bits"] / 8 + elems * c["extra"]
    vpu = elems * c["vpu"] / VPU_OPS_PER_UNIT
    to, tk = c["tile"]
    n_tiles = max(O // to, 1) * max(K // tk, 1)
    mxu = n_tiles * c["dots"] * MXU_PASS_UNITS
    s = max(hbm, vpu, mxu) + (vpu + mxu) * 0.25  # overlap is imperfect
    if c["relayout"]:
        s *= RELAYOUT_PENALTY
    return {"layout": layout, "score": s, "hbm": hbm, "vpu": vpu,
            "mxu": mxu, "relayout_flagged": c["relayout"]}


def rank(fmt: str, **kw):
    rows = [score(fmt, l, **kw) for l in LAYOUTS[fmt]]
    return sorted(rows, key=lambda r: r["score"])


if __name__ == "__main__":
    out = {}
    for fmt in LAYOUTS:
        rows = rank(fmt)
        out[fmt] = [
            {k: (round(v, 1) if isinstance(v, float) else v)
             for k, v in r.items()} for r in rows
        ]
        print(f"[cost-model] {fmt}: " + " < ".join(
            r["layout"] + ("(!relayout)" if r["relayout_flagged"] else "")
            for r in rows), file=sys.stderr)
    print(json.dumps(out))
