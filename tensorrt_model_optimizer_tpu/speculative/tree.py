"""Tree attention for speculative decoding.

Re-creates the reference's speculative tree machinery
(`speculative/utils.py:84` TreeNode/Tree, `Tree.create_attention_mask`):
multiple candidate continuations are verified in ONE base-model forward by
laying the tree out as extra sequence positions with a tree-structured
attention mask — each draft token attends to the prompt plus its tree
ancestors only.

TPU-first: the tree topology (mask, depths, parents) is computed on the
host at trace time (it is static config), so the verify forward stays a
single fixed-shape jit with an additive mask — no dynamic shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama

# Default candidate tree (a small medusa-style tree: head-0 top-2,
# head-1 top-2 under the best head-0 pick, one depth-3 chain).
DEFAULT_TREE_PATHS = [[0], [1], [0, 0], [0, 1], [1, 0], [0, 0, 0]]


@dataclasses.dataclass(frozen=True)
class Tree:
    """Static tree topology. Node 0 is the base token (the model's own
    next-token pick); nodes 1.. are draft candidates in BFS order."""

    n_nodes: int
    parent: tuple[int, ...]  # parent node index per node (node 0 -> -1)
    depth: tuple[int, ...]  # 0 for the base token
    choice: tuple[int, ...]  # which top-k child of the parent (by path digit)
    attn_mask: np.ndarray  # [N, N] bool, True = may attend

    @property
    def max_depth(self) -> int:
        return max(self.depth)

    def children(self, idx: int) -> list[int]:
        return [i for i, p in enumerate(self.parent) if p == idx]


def build_tree(tree_paths: list[list[int]] | None = None) -> Tree:
    """BFS-ordered tree from reference-style paths (`utils.py:109`)."""
    paths = sorted(tree_paths or DEFAULT_TREE_PATHS)
    # nodes keyed by their path tuple; BFS order = sorted by (depth, path)
    node_paths = sorted({tuple(p) for p in paths}, key=lambda p: (len(p), p))
    for p in node_paths:
        if len(p) > 1 and p[:-1] not in node_paths:
            raise ValueError(f"incomplete tree path {p}")
    index = {(): 0}
    for i, p in enumerate(node_paths):
        index[p] = i + 1
    n = len(node_paths) + 1
    parent = [-1] + [index[p[:-1]] for p in node_paths]
    depth = [0] + [len(p) for p in node_paths]
    choice = [0] + [p[-1] for p in node_paths]
    mask = np.zeros((n, n), dtype=bool)
    for i in range(n):
        j = i
        while j >= 0:  # attend to self and every ancestor
            mask[i, j] = True
            j = parent[j]
    return Tree(n, tuple(parent), tuple(depth), tuple(choice), mask)


def tree_attention_mask(tree: Tree, prompt_len: int) -> jnp.ndarray:
    """Additive mask [1, 1, P+N, P+N] for [prompt || tree] verification.

    Prompt part is causal; tree rows attend to the whole prompt plus their
    tree ancestors (the reference's `create_attention_mask`, utils.py:152).
    """
    P, N = prompt_len, tree.n_nodes
    T = P + N
    allow = np.zeros((T, T), dtype=bool)
    tri = np.tril(np.ones((P, P), dtype=bool))
    allow[:P, :P] = tri
    allow[P:, :P] = True
    allow[P:, P:] = tree.attn_mask
    return jnp.asarray(np.where(allow, 0.0, -1e9), jnp.float32)[None, None]


def tree_position_ids(tree: Tree, prompt_len: int) -> jnp.ndarray:
    """[P+N] position ids: prompt 0..P-1, node at depth d sits at P+d."""
    pos = list(range(prompt_len)) + [prompt_len + d for d in tree.depth]
    return jnp.asarray(pos, jnp.int32)[None, :]


def assemble_candidates(tree: Tree, base_token: int, head_topk: np.ndarray) -> np.ndarray:
    """Token per node. `head_topk` is [n_heads, k]: medusa head d-1's top-k
    picks; a node at depth d with path digit c takes head_topk[d-1, c]."""
    toks = np.zeros((tree.n_nodes,), np.int32)
    toks[0] = base_token
    for i in range(1, tree.n_nodes):
        toks[i] = head_topk[tree.depth[i] - 1, tree.choice[i]]
    return toks


def greedy_accept(tree: Tree, tokens: np.ndarray, verify_argmax: np.ndarray):
    """Walk the tree accepting greedily (`Tree` path acceptance).

    `verify_argmax` is [N]: the base model's argmax at each tree node
    position. Returns the accepted token list (always >= 1: the base token),
    plus the bonus token the model predicts after the last accepted node.
    """
    accepted = [int(tokens[0])]
    node = 0
    while True:
        want = int(verify_argmax[node])
        nxt = None
        for c in tree.children(node):
            if int(tokens[c]) == want:
                nxt = c
                break
        if nxt is None:
            return accepted, want  # bonus token = model's own pick
        accepted.append(int(tokens[nxt]))
        node = nxt


def tree_propose_and_verify(
    cfg: llama.LlamaConfig,
    params,
    medusa: dict,
    prompt: jax.Array,
    tree: Tree | None = None,
    steps: int = 16,
):
    """Greedy tree-speculative decode loop (one verify forward per block).

    Returns (tokens, acceptance_rate). Matches the chain verifier's output
    distribution (greedy) while verifying the whole tree per forward.
    """
    from .medusa import medusa_logits

    tree = tree or build_tree()
    assert prompt.shape[0] == 1
    n_heads_needed = tree.max_depth
    tokens = prompt
    accepted_total = proposed_total = produced = 0

    while produced < steps:
        base_logits, head_logits = medusa_logits(cfg, params, medusa, tokens)
        base_tok = int(jnp.argmax(base_logits[0, -1]))
        k_needed = max(tree.choice) + 1
        head_topk = np.stack(
            [
                np.asarray(
                    jax.lax.top_k(head_logits[d][0, -1], k_needed)[1]
                )
                for d in range(n_heads_needed)
            ]
        )
        cand = assemble_candidates(tree, base_tok, head_topk)

        P = tokens.shape[1]
        seq = jnp.concatenate([tokens, jnp.asarray(cand[None, :], jnp.int32)], axis=1)
        mask = tree_attention_mask(tree, P)
        pos = tree_position_ids(tree, P)
        logits, _, _ = llama.forward(cfg, params, seq, positions=pos, mask=mask)
        ver = np.asarray(jnp.argmax(logits[0, P:], axis=-1))

        accepted, bonus = greedy_accept(tree, cand, ver)
        new = accepted + [bonus]
        tokens = jnp.concatenate([tokens, jnp.asarray([new], jnp.int32)], axis=1)
        produced += len(new)
        accepted_total += len(accepted) - 1  # draft tokens accepted
        proposed_total += tree.n_nodes - 1
    return tokens, accepted_total / max(proposed_total, 1)
