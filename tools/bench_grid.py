#!/usr/bin/env python
"""BS1/8/64 x {int4, nvfp4, fp8} decode grid with p50 TTFT — the round-3
headline measurement (VERDICT r2 item #4), mirroring the reference's
published grid (`/root/reference/examples/benchmark.md:11-28`: Llama3.1-8B,
input 2048 / output 128, BS 1/8/64, speedup normalized to chip count).

Every cell runs in a FRESH process (`bench.py` with env knobs):
 - format cells run with BENCH_ANCHOR=0 — at the 2048-token scenario the
   bf16 anchor (8 GB) cannot share the chip with an 8-bit format's weights
   + KV (fp8 L32 8 GB + 2.4 GB KV + anchor > 15.75 GB HBM), which is what
   produced round-2's fp8 RESOURCE_EXHAUSTED TTFT gap.
 - one bf16-L16 anchor process per batch size supplies the chip-normalized
   baseline for that row: vs = fmt_tok_s / (bf16_L16_tok_s / 2) — same
   normalization as bench.py (bf16 8B needs 2 chips; measured OOM).
 - BS64 cells store the KV cache int8 on BOTH sides (bf16 KV at 64 x 2304
   tokens = 18.9 GB > HBM; int8-KV attention reads half the bytes, which
   if anything SPEEDS the bf16 anchor — the conservative direction).
 - a sentinel (int4 BS8) re-runs at the end; the artifact reports its
   drift ratio so cross-process pairing is honest about pool-speed drift
   (the axon pool drifts between windows — BENCH_RESULTS.md).

Writes artifacts/bench_r03/grid.json and prints a summary table.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.environ.get("GRID_OUT", os.path.join(REPO, "artifacts", "bench_r03"))
FORMATS = os.environ.get("GRID_FORMATS", "int4,nvfp4,fp8").split(",")
BATCHES = [int(b) for b in os.environ.get("GRID_BS", "1,8,64").split(",")]
PREFILL = int(os.environ.get("GRID_PREFILL", "2048"))
CELL_TIMEOUT = int(os.environ.get("GRID_CELL_TIMEOUT", "1500"))


def run_cell(fmt_spec, bs, anchor, extra=None):
    # format spec "fmt[:layout][:kvk]" — e.g. "int4:bd2" (weight-only bd3
    # schedule), "nvfp4:i8" (W8A8-class recast), ":kvk" appends the
    # packed-KV attention kernel
    parts = fmt_spec.split(":")
    fmt = parts[0]
    env = dict(os.environ)
    env.update({
        "BENCH_FORMAT": fmt,
        "BENCH_BS": str(bs),
        "BENCH_PREFILL": str(PREFILL),
        "BENCH_MAXLEN": str(PREFILL + 256),
        "BENCH_STEPS": "64",
        "BENCH_ROUNDS": "3",
        "BENCH_TTFT": "1",
        "BENCH_TTFT_REPEATS": "5",
        "BENCH_ANCHOR": "1" if anchor else "0",
        "BENCH_DEADLINE": str(CELL_TIMEOUT - 300),
    })
    # pin KV/kernel explicitly per cell so bench.py's scenario defaults
    # (r5: int8-KV + kernel at >=1024-token prefill) never change grid
    # semantics out from under the published protocol
    if bs >= 64:
        env["BENCH_KV"] = os.environ.get("GRID_KV64", "int8")
        env["BENCH_KVK"] = ("1" if os.environ.get("GRID_KVK64", "0") == "1"
                            else "0")
    else:
        env["BENCH_KV"] = "none"  # bf16 KV at BS1/8 (r3/r4 grid protocol)
        env["BENCH_KVK"] = "0"
    for part in parts[1:]:
        if part == "kvk":
            env["BENCH_KVK"] = "1"
        elif part:
            env["BENCH_LAYOUT"] = part
    env.update(extra or {})
    label = f"{fmt_spec.replace(':', '-')}-bs{bs}"
    print(f"[grid] cell {label} ...", file=sys.stderr, flush=True)
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=CELL_TIMEOUT,
        )
    except subprocess.TimeoutExpired as e:
        print(f"[grid] {label} TIMEOUT after {CELL_TIMEOUT}s", file=sys.stderr)
        tail = ((e.stderr or b"").decode() if isinstance(e.stderr, bytes)
                else (e.stderr or ""))[-800:]
        return {"cell": label, "error": "timeout", "stderr_tail": tail}
    dt = time.time() - t0
    line = next(
        (ln for ln in (p.stdout or "").splitlines() if ln.startswith("{")), None
    )
    if p.returncode != 0 or line is None:
        print(f"[grid] {label} FAILED rc={p.returncode}", file=sys.stderr)
        return {"cell": label, "error": f"rc={p.returncode}",
                "stderr_tail": (p.stderr or "")[-800:]}
    cell = json.loads(line)
    cell["cell"] = label
    cell["wall_s"] = round(dt, 1)
    print(f"[grid] {label}: {cell.get('value')} tok/s, "
          f"ttft {cell.get('ttft_ms')} ms ({dt:.0f}s)", file=sys.stderr, flush=True)
    return cell


def _flush_partial(anchors, cells):
    """Write grid_partial.json after every cell: a chain kill mid-grid must
    still leave every measured cell on disk (VERDICT r3 weak #6)."""
    path = os.path.join(OUT_DIR, "grid_partial.json")
    with open(path, "w") as f:
        json.dump({"anchors": {str(k): v for k, v in anchors.items()},
                   "cells": {f"{fmt.replace(':', '-')}-bs{bs}": c
                             for (fmt, bs), c in cells.items()}}, f, indent=1)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    cells = {}
    anchors = {}
    for bs in BATCHES:
        anchors[bs] = run_cell("bf16", bs, anchor=False)
        _flush_partial(anchors, cells)
        for fmt in FORMATS:
            cells[(fmt, bs)] = run_cell(fmt, bs, anchor=False)
            _flush_partial(anchors, cells)
    # drift sentinel: re-run the first non-anchor cell
    sent_fmt, sent_bs = FORMATS[0], BATCHES[min(1, len(BATCHES) - 1)]
    sentinel = run_cell(sent_fmt, sent_bs, anchor=False,
                        extra={"BENCH_TTFT": "0"})

    grid = []
    for bs in BATCHES:
        a = anchors[bs]
        a_tok = a.get("value")
        for fmt in FORMATS:
            c = cells[(fmt, bs)]
            row = dict(c)
            if "value" in c and a_tok:
                row["vs_baseline"] = round(c["value"] / (a_tok / 2.0), 3)
                row["bf16_anchor_tok_s"] = a_tok
            grid.append(row)

    first = cells.get((sent_fmt, sent_bs), {})
    drift = None
    if "value" in first and "value" in sentinel:
        drift = round(sentinel["value"] / first["value"], 3)

    out = {
        "scenario": {"prefill": PREFILL, "decode_steps": 64,
                     "kv_bs64": os.environ.get("GRID_KV64", "int8"),
                     "normalization": "fmt_tok_s / (bf16_L16_tok_s / 2), "
                     "per-batch-size anchor process (see module docstring)"},
        "anchors": {str(bs): anchors[bs] for bs in BATCHES},
        "grid": grid,
        "sentinel": {"cell": f"{sent_fmt.replace(':', '-')}-bs{sent_bs}", "drift_ratio": drift,
                     **{k: sentinel.get(k) for k in ("value", "error")}},
        "reference_grid_h200": "examples/benchmark.md:20-28",
    }
    path = os.path.join(OUT_DIR, "grid.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[grid] wrote {path}", file=sys.stderr)

    # summary table
    hdr = f"{'format':8s} " + " ".join(f"BS{bs:<4d}" for bs in BATCHES)
    print(hdr, file=sys.stderr)
    for fmt in FORMATS:
        vals = []
        for bs in BATCHES:
            c = cells[(fmt, bs)]
            v = c.get("vs_baseline") or next(
                (r.get("vs_baseline") for r in grid
                 if r.get("cell") == f"{fmt.replace(':', '-')}-bs{bs}"), None)
            vals.append(f"{v if v else 'ERR':>5}")
        print(f"{fmt:8s} " + " ".join(vals), file=sys.stderr)
    print(json.dumps({"metric": "grid", "path": path}))


if __name__ == "__main__":
    main()
