"""Static kernel cost model ordering vs the ENGINE-MEASURED layout ordering
(VERDICT r4 #10: a cheap kill-switch for kernel layouts, since the relay
microbench is invalid and the engine A/B is expensive)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import kernel_cost_model as kcm


def _order(fmt):
    return [r["layout"] for r in kcm.rank(fmt)]


def test_int4_ordering_matches_engine_ab():
    """r4/r5 engine A/B (8B BS8): a8 13.1 ms < bd3 16.6 < bd2 18.9 <
    word2 < word 22.5 << xla 102.4."""
    order = _order("int4")
    assert order.index("a8") < order.index("bd3") < order.index("bd2")
    assert order.index("bd2") < order.index("word") < order.index("xla")


def test_nvfp4_ordering_matches_engine_ab():
    """r4 engine A/B: word2 26.5 ms < word 28.9 << bd4 621; blockdot slower
    than word (r2 slope + r4 notes); i8 trades 2x HBM for zero decode."""
    order = _order("nvfp4")
    assert order.index("word2") < order.index("word")
    assert order.index("word") < order.index("blockdot")
    # i8 (W8A8 recast, zero decode, 2x HBM) beats the VPU-bound word2 —
    # the int8-class weight-only engine row measured 15.7 ms vs word2's
    # 26.5 (r4 chain6 int8 1.794x vs nvfp4-word2 1.083x)
    assert order.index("i8") < order.index("word2")
    assert order[-1] == "bd4"


def test_bd4_flagged_untrusted():
    """The bd4 failure class (decode orientation != dot orientation) must
    be FLAGGED, not silently scored: relayout cost is unmodeled."""
    rows = {r["layout"]: r for r in kcm.rank("nvfp4")}
    assert rows["bd4"]["relayout_flagged"]
    assert not rows["word2"]["relayout_flagged"]
