"""Jaxpr dependency tracing: derive prunable-dimension groups automatically.

The functional analog of the reference's symbolic tracer
(`modelopt/torch/trace/tracer.py:33`, `symbols.py:276`): where the reference
fx-traces an nn.Module graph to find which dimensions must change together
under pruning, this walks the *jaxpr* of a model's forward function and
unifies (param-leaf, axis) slots whose sizes an equation forces equal:

 - `dot_general` unifies contracting axes (and batch axes) of its operands;
   remaining axes flow through to the output.
 - Elementwise / broadcast ops zip same-size axes (size-1 broadcast axes
   never unify).
 - `reshape` handles the two structural cases transformers actually use —
   a single axis SPLIT into two (e.g. [B,T,nH*hd] -> [B,T,nH,hd]) and two
   adjacent axes MERGED — recording a product relation
   `parent = left x right` so ratio-coupled groups (GQA q-heads vs
   kv-heads) stay connected instead of silently diverging.
 - `scan` recurses into the body jaxpr; every stacked-parameter leaf's
   leading axis joins the `depth` group, and inner-site unions are lifted
   back out with the leading axis re-offset.
 - `pjit` / `custom_jvp` / `custom_vjp` / `remat` recurse transparently.

Output is a set of `DerivedGroup`s in the same (param-path, axis) site
format as the hand-declared tables in `opt/dependency.py` — the test suite
asserts the llama trace reproduces `LLAMA_DIM_GROUPS` and that mixtral /
deepseek trace *unmodified*, which is the capability the reference's 2.8k-LoC
tracer exists to provide.

Unknown primitives degrade safely for unification (their outputs carry no
labels, so no false merges); a `coverage` report lists any param axis that
ended up in no group so callers can tell "independent" from "not traced".
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.extend.core import Literal as _Literal


# --------------------------------------------------------------------------
# union-find over (param-path, axis) nodes
# --------------------------------------------------------------------------


class _UF:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


@dataclasses.dataclass(frozen=True)
class DerivedGroup:
    """A dimension class: every (param path, axis) slot tied to one size.

    `coupled` lists slots related by a *product* (e.g. q_proj's head axis =
    ratio x this group) rather than direct equality — the divisor-style
    coupling `opt/dependency.py` encodes with `divisor_attr`."""

    name: str
    size: int
    sites: tuple[tuple[str, int], ...]
    coupled: tuple[tuple[str, int], ...] = ()


# Axis label: frozenset of nodes; each node is ("path", axis) for a param
# leaf or ("~synth", id) for a synthetic (split/merge-derived) axis.


def _zip_elementwise(uf, in_labels, shapes, out_shape):
    """Default rule: unify same-position, same-size (>1) axes of all
    broadcast-compatible operands; output axis label = union of inputs'."""
    out = []
    rank = len(out_shape)
    for ax in range(rank):
        merged: set = set()
        first = None
        for labels, shape in zip(in_labels, shapes):
            off = rank - len(shape)
            iax = ax - off
            if iax < 0 or shape[iax] != out_shape[ax] or out_shape[ax] == 1:
                continue
            lab = labels[iax]
            if lab:
                if first is None:
                    first = next(iter(lab))
                for n in lab:
                    uf.union(first, n)
                merged |= lab
        out.append(frozenset(merged))
    return tuple(out)


class _Tracer:
    def __init__(self):
        self.uf = _UF()
        self.relations: list[tuple] = []  # (parent, left, right, lsize, rsize)
        self._synth = 0

    def synth(self):
        self._synth += 1
        return ("~synth", self._synth)

    # ---- label helpers ---------------------------------------------------

    def rep(self, label):
        """Representative node of a label set (after closing unions)."""
        return self.uf.find(next(iter(label))) if label else None

    def label_union(self, *labels):
        out = set()
        first = None
        for lab in labels:
            for n in lab:
                if first is None:
                    first = n
                self.uf.union(first, n)
                out.add(n)
        return frozenset(out)

    # ---- the jaxpr walk ----------------------------------------------------

    def walk(self, jaxpr, in_labels):
        env: dict = {}

        def read(v):
            if isinstance(v, _Literal):
                return tuple(frozenset() for _ in getattr(v.val, "shape", ()))
            return env.get(v, tuple(frozenset() for _ in v.aval.shape))

        def write(v, lab):
            env[v] = tuple(lab)

        for var, lab in zip(jaxpr.invars, in_labels):
            write(var, lab)

        for eqn in jaxpr.eqns:
            ins = [read(v) for v in eqn.invars]
            shapes = [tuple(getattr(v.aval, "shape", ())) for v in eqn.invars]
            outs = self.eqn_rule(eqn, ins, shapes)
            for v, lab in zip(eqn.outvars, outs):
                write(v, lab)

        return [read(v) for v in jaxpr.outvars]

    def eqn_rule(self, eqn, ins, shapes):
        prim = eqn.primitive.name
        out_avals = [getattr(v.aval, "shape", ()) for v in eqn.outvars]

        if prim == "dot_general":
            return [self._dot_general(eqn, ins, shapes)]
        if prim in ("reshape",):
            return [self._reshape(ins[0], shapes[0], tuple(out_avals[0]))]
        if prim in ("transpose",):
            perm = eqn.params["permutation"]
            return [tuple(ins[0][p] for p in perm)]
        if prim in ("broadcast_in_dim",):
            bdims = eqn.params["broadcast_dimensions"]
            shape = tuple(out_avals[0])
            out = [frozenset()] * len(shape)
            for iax, oax in enumerate(bdims):
                if shapes[0][iax] == shape[oax] and shape[oax] != 1:
                    out[oax] = ins[0][iax]
            return [tuple(out)]
        if prim in ("squeeze",):
            dims = set(eqn.params["dimensions"])
            return [tuple(l for i, l in enumerate(ins[0]) if i not in dims)]
        if prim in ("expand_dims",):
            dims = set(eqn.params["dimensions"])
            out, src = [], iter(ins[0])
            for i in range(len(out_avals[0])):
                out.append(frozenset() if i in dims else next(src))
            return [tuple(out)]
        if prim.startswith("reduce_") or prim in ("argmax", "argmin"):
            axes = set(eqn.params.get("axes", ()))
            return [tuple(l for i, l in enumerate(ins[0]) if i not in axes)]
        if prim in ("concatenate",):
            dim = eqn.params["dimension"]
            out = list(_zip_elementwise(self.uf, ins, shapes, tuple(out_avals[0])))
            out[dim] = frozenset()  # concat axis is a sum, not an equality
            return [tuple(out)]
        if prim in ("slice", "dynamic_slice"):
            shape = tuple(out_avals[0])
            src = shapes[0]
            return [tuple(
                ins[0][i] if src[i] == shape[i] else frozenset()
                for i in range(len(shape))
            )]
        if prim in ("dynamic_update_slice",):
            out = _zip_elementwise(self.uf, ins[:1], shapes[:1], tuple(out_avals[0]))
            return [out]
        if prim in ("gather",):
            return [self._gather(eqn, ins, shapes, tuple(out_avals[0]))]
        if prim in ("iota", "rng_bit_generator", "eq", "lt", "gt", "le", "ge"):
            return [tuple(frozenset() for _ in s) for s in out_avals]
        if prim in ("scan",):
            return self._scan(eqn, ins, shapes)
        if prim in ("while",):  # conservative: no labels out
            return [tuple(frozenset() for _ in s) for s in out_avals]
        if prim in ("pjit", "closed_call", "core_call", "remat", "checkpoint",
                    "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr", "custom_lin"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") \
                or eqn.params.get("fun_jaxpr")
            if sub is None:
                return [tuple(frozenset() for _ in s) for s in out_avals]
            inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            n = len(inner.invars)
            return self.walk_closed(inner, ins[-n:] if len(ins) >= n else ins)
        # default: elementwise-ish (add, mul, exp, convert, select_n, ...)
        if all(len(s) == len(out_avals[0]) or len(s) == 0 for s in shapes):
            out = _zip_elementwise(self.uf, ins, shapes, tuple(out_avals[0]))
            return [out for _ in out_avals] if len(out_avals) > 1 else [out]
        return [tuple(frozenset() for _ in s) for s in out_avals]

    def walk_closed(self, jaxpr, in_labels):
        # pad missing labels (consts prepended etc.)
        labs = list(in_labels)
        while len(labs) < len(jaxpr.invars):
            labs.insert(0, tuple(frozenset() for _ in jaxpr.invars[0].aval.shape))
        fixed = []
        for v, lab in zip(jaxpr.invars, labs):
            want = len(getattr(v.aval, "shape", ()))
            lab = tuple(lab)
            if len(lab) != want:
                lab = tuple(frozenset() for _ in range(want))
            fixed.append(lab)
        return self.walk(jaxpr, fixed)

    # ---- structural rules --------------------------------------------------

    def _dot_general(self, eqn, ins, shapes):
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        llab, rlab = ins[0], ins[1]
        for a, b in list(zip(lc, rc)) + list(zip(lb, rb)):
            if llab[a] and rlab[b]:
                self.uf.union(next(iter(llab[a])), next(iter(rlab[b])))
        out = []
        for a, b in zip(lb, rb):
            out.append(self.label_union(llab[a], rlab[b]))
        for i, lab in enumerate(llab):
            if i not in lc and i not in lb:
                out.append(lab)
        for i, lab in enumerate(rlab):
            if i not in rc and i not in rb:
                out.append(lab)
        return tuple(out)

    def _reshape(self, labels, src, dst):
        """Split/merge with product relations; unchanged prefix/suffix axes
        keep their labels."""
        if src == dst:
            return labels
        # strip common prefix/suffix
        pre = 0
        while pre < min(len(src), len(dst)) and src[pre] == dst[pre]:
            pre += 1
        suf = 0
        while (suf < min(len(src), len(dst)) - pre
               and src[len(src) - 1 - suf] == dst[len(dst) - 1 - suf]):
            suf += 1
        mid_src = src[pre:len(src) - suf]
        mid_dst = dst[pre:len(dst) - suf]
        out = list(labels[:pre])
        core: list = []
        if len(mid_src) == 1 and len(mid_dst) == 2:
            # SPLIT: parent = left x right
            parent = labels[pre]
            ln, rn = self.synth(), self.synth()
            if parent:
                self.relations.append(
                    (self.rep(parent), ln, rn, mid_dst[0], mid_dst[1])
                )
            core = [frozenset([ln]), frozenset([rn])]
        elif len(mid_src) == 2 and len(mid_dst) == 1:
            # MERGE: new = left x right
            ln = self.rep(labels[pre]) or self.synth()
            rn = self.rep(labels[pre + 1]) or self.synth()
            mn = self.synth()
            self.relations.append((mn, ln, rn, mid_src[0], mid_src[1]))
            core = [frozenset([mn])]
        else:
            core = [frozenset() for _ in mid_dst]
        out += core
        out += list(labels[len(src) - suf:])
        return tuple(out)

    def _gather(self, eqn, ins, shapes, out_shape):
        """Embedding-lookup style gather: offset dims carry the operand's
        non-collapsed axes' labels."""
        dnums = eqn.params["dimension_numbers"]
        operand_labels = ins[0]
        collapsed = set(dnums.collapsed_slice_dims)
        offset_dims = list(dnums.offset_dims)
        kept = [l for i, l in enumerate(operand_labels) if i not in collapsed]
        out = [frozenset()] * len(out_shape)
        for lab, oax in zip(kept, offset_dims):
            out[oax] = lab
        return tuple(out)

    def _scan(self, eqn, ins, shapes):
        params = eqn.params
        inner = params["jaxpr"].jaxpr
        n_consts = params["num_consts"]
        n_carry = params["num_carry"]
        self._scan_id = getattr(self, "_scan_id", 0) + 1
        depth_node = ("~depth", self._scan_id)
        self.depth_nodes = getattr(self, "depth_nodes", [])
        self.depth_nodes.append(depth_node)
        in_labels = []
        for i, (lab, shape) in enumerate(zip(ins, shapes)):
            if i < n_consts + n_carry:
                in_labels.append(lab)
            else:
                # xs leaf: leading (scan) axis joins this scan's depth group
                if lab and lab[0]:
                    for n in lab[0]:
                        self.uf.union(depth_node, n)
                in_labels.append(tuple(lab[1:]))
        out_inner = self.walk_closed(inner, in_labels)
        outs = []
        for i, v in enumerate(eqn.outvars):
            shape = getattr(v.aval, "shape", ())
            if i < n_carry:
                outs.append(tuple(out_inner[i]) if i < len(out_inner)
                            else tuple(frozenset() for _ in shape))
            else:
                j = i  # stacked ys: prepend unlabeled scan axis
                lab = out_inner[j] if j < len(out_inner) else ()
                outs.append((frozenset(),) + tuple(lab)
                            if len(shape) == len(lab) + 1
                            else tuple(frozenset() for _ in shape))
        return outs


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def trace_dim_groups(
    forward: Callable,
    params: dict,
    cfg: Any = None,
    *,
    example_tokens: Optional[jax.Array] = None,
) -> dict:
    """Trace `forward(params, tokens)` and derive dimension groups.

    Returns {"groups": [DerivedGroup...], "ungrouped": [(path, axis)...],
    "relations": [(parent, left, right) group names/ids]}. Group names come
    from matching the group's size against integer attributes of `cfg`
    (e.g. hidden_size); unmatched groups get `dim<size>` names.
    """
    if example_tokens is None:
        example_tokens = jnp.zeros((2, 8), jnp.int32)

    flat, treedef = jax.tree_util.tree_flatten(params)
    paths = [
        jax.tree_util.keystr(kp, simple=True, separator="/")
        for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]

    jaxpr = jax.make_jaxpr(lambda p: forward(p, example_tokens))(params)

    tr = _Tracer()
    in_labels = []
    for path, leaf in zip(paths, flat):
        in_labels.append(tuple(
            frozenset([(path, ax)]) for ax in range(leaf.ndim)
        ))
    tr.walk(jaxpr.jaxpr, in_labels)

    # Product-relation congruence to fixpoint: two decompositions of unified
    # parents with matching factor sizes have unified factors (downward), and
    # unified factor pairs imply unified parents (upward). This is what ties
    # k/v head axes into ONE group even though each reshapes separately, and
    # couples q/o head axes to it through the GQA repeat's merge relation.
    changed = True
    while changed:
        changed = False
        rels = [
            (tr.uf.find(p), tr.uf.find(l), tr.uf.find(r), ls, rs)
            for p, l, r, ls, rs in tr.relations
        ]
        for i in range(len(rels)):
            for j in range(i + 1, len(rels)):
                p1, l1, r1, ls1, rs1 = rels[i]
                p2, l2, r2, ls2, rs2 = rels[j]
                if ls1 != ls2 or rs1 != rs2:
                    continue
                if p1 == p2 and (l1 != l2 or r1 != r2):
                    tr.uf.union(l1, l2)
                    tr.uf.union(r1, r2)
                    changed = True
                elif l1 == l2 and r1 == r2 and p1 != p2:
                    tr.uf.union(p1, p2)
                    changed = True

    # collect equivalence classes over real param-axis nodes
    by_root: dict = {}
    sizes: dict = {}
    leaf_by_path = dict(zip(paths, flat))
    for path, leaf in zip(paths, flat):
        for ax in range(leaf.ndim):
            root = tr.uf.find((path, ax))
            by_root.setdefault(root, []).append((path, ax))
            sizes[(path, ax)] = leaf.shape[ax]

    # Product relations -> coupled sites: param-axis roots connected through
    # the relation graph (sharing a factor chain) must co-prune at a ratio —
    # the `divisor_attr` coupling of the declared tables.
    rel_roots = [
        (tr.uf.find(p), tr.uf.find(l), tr.uf.find(r))
        for p, l, r, _, _ in tr.relations
    ]
    adj: dict = {}
    for p, l, r in rel_roots:
        for a, b in ((p, l), (p, r), (l, p), (r, p)):
            adj.setdefault(a, set()).add(b)
    coupled_of: dict = {}
    param_roots = set(by_root)
    for start in param_roots:
        if start not in adj:
            continue
        seen, frontier = {start}, [start]
        while frontier:
            cur = frontier.pop()
            for nxt in adj.get(cur, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    frontier.append(nxt)
        for other in seen & param_roots - {start}:
            coupled_of.setdefault(start, set()).update(by_root[other])

    def group_name(size, members):
        if cfg is not None:
            for f in sorted(dir(cfg)):
                if f.startswith("_"):
                    continue
                try:
                    val = getattr(cfg, f)
                except Exception:
                    continue
                if isinstance(val, int) and not isinstance(val, bool) and val == size:
                    return f
        return f"dim{size}"

    groups = []
    depth_roots = {tr.uf.find(d) for d in getattr(tr, "depth_nodes", [])}
    taken: dict = {}
    for root, members in sorted(by_root.items(), key=lambda kv: str(kv[0])):
        if len(members) < 2 and root not in coupled_of and root not in depth_roots:
            continue
        size = sizes[members[0]]
        name = "depth" if root in depth_roots else group_name(size, members)
        n = taken.get(name, 0)
        taken[name] = n + 1
        if n:
            name = f"{name}.{n}"
        groups.append(DerivedGroup(
            name=name,
            size=size,
            sites=tuple(sorted(members)),
            coupled=tuple(sorted(coupled_of.get(root, ()))),
        ))

    grouped = {s for g in groups for s in g.sites}
    ungrouped = [
        (path, ax)
        for path, leaf in leaf_by_path.items()
        for ax in range(leaf.ndim)
        if (path, ax) not in grouped
    ]
    return {"groups": groups, "ungrouped": ungrouped,
            "relations": rel_roots}
