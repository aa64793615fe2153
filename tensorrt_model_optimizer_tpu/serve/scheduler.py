"""Continuous batching: request scheduler over the paged-KV engine.

Host-side loop (the part the reference delegates to serving engines):
fixed-size slot batch; requests join free slots, get pages from the free
list, decode together each step, leave on EOS/max-tokens and return their
pages. The per-step compute is one jitted decode step over all slots.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import paged_cache


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray  # [T] int32
    max_new_tokens: int = 32
    eos_token: Optional[int] = None
    # filled by the scheduler
    output: list = dataclasses.field(default_factory=list)
    done: bool = False


class Scheduler:
    """Slot-based continuous batching.

    `step_fn(tokens [B,1], cache, slot_mask) -> (next_tokens [B], cache)`:
    one decode step over all slots (the engine provides it).
    `prefill_fn(slot, tokens) -> cache`: prefill one sequence into its slot.
    """

    def __init__(self, max_slots: int, n_pages: int, page_size: int,
                 max_pages_per_seq: int, prefix_cache: bool = False):
        self.max_slots = max_slots
        self.page_size = page_size
        self.free_pages = list(range(1, n_pages))  # page 0 = scratch for idle
        self.max_pages_per_seq = max_pages_per_seq
        self.slots: list[Optional[Request]] = [None] * max_slots
        self.slot_pages: list[list[int]] = [[] for _ in range(max_slots)]
        self.pending: list[Request] = []
        # Prefix caching (shared prompt pages, vLLM-style): chained keys
        # (prev_key, page_tokens) -> page id; pages are refcounted and only
        # return to the free list when the last user releases them. KV pages
        # are immutable once a prompt page is FULL (decode writes land at
        # positions past the prompt), so sharing needs no copy-on-write.
        self.prefix_cache = prefix_cache
        self.page_refs: dict[int, int] = {}
        self.prefix_map: dict = {}
        self.page_key: dict[int, object] = {}

    def _match_prefix(self, prompt) -> list[int]:
        """Longest run of already-cached FULL prompt pages (tail >= 1 token
        always prefills fresh so the first decode write targets a new slot
        position)."""
        if not self.prefix_cache:
            return []
        ps = self.page_size
        full = (len(prompt) - 1) // ps
        matched = []
        key = ()
        for pi in range(full):
            key = (key, tuple(int(t) for t in prompt[pi * ps:(pi + 1) * ps]))
            page = self.prefix_map.get(key)
            if page is None:
                break
            matched.append(page)
        return matched

    def register_prefix(self, slot: int):
        """Publish the slot's freshly-prefilled full prompt pages into the
        prefix map (call after prefill)."""
        if not self.prefix_cache or self.slots[slot] is None:
            return
        prompt = self.slots[slot].prompt
        ps = self.page_size
        full = (len(prompt) - 1) // ps
        key = ()
        for pi in range(full):
            key = (key, tuple(int(t) for t in prompt[pi * ps:(pi + 1) * ps]))
            page = self.slot_pages[slot][pi]
            if key not in self.prefix_map:
                self.prefix_map[key] = page
                self.page_key[page] = key
                self.page_refs[page] = self.page_refs.get(page, 1)

    def submit(self, req: Request):
        self.pending.append(req)

    def _alloc_pages(self, n: int) -> Optional[list[int]]:
        if len(self.free_pages) < n:
            return None
        out = [self.free_pages.pop() for _ in range(n)]
        return out

    def _free_slot(self, i: int):
        for p in self.slot_pages[i]:
            if p in self.page_refs:
                self.page_refs[p] -= 1
                if self.page_refs[p] <= 0:
                    del self.page_refs[p]
                    key = self.page_key.pop(p, None)
                    if key is not None:
                        self.prefix_map.pop(key, None)
                    self.free_pages.append(p)
            else:
                self.free_pages.append(p)
        self.slot_pages[i] = []
        self.slots[i] = None

    def admit(self, cache: paged_cache.PagedKV):
        """Place pending requests into free slots; returns updated cache and
        the list of (slot, request) admissions needing prefill."""
        admissions = []
        bt = np.asarray(cache.block_table).copy()
        lens = np.asarray(cache.seq_lens).copy()
        for i in range(self.max_slots):
            if self.slots[i] is not None or not self.pending:
                continue
            req = self.pending.pop(0)
            need = min(
                (len(req.prompt) + req.max_new_tokens + self.page_size - 1)
                // self.page_size + 1,
                self.max_pages_per_seq,
            )
            shared = self._match_prefix(req.prompt)
            pages = self._alloc_pages(need - len(shared))
            if pages is None:
                self.pending.insert(0, req)
                break
            for p in shared:
                self.page_refs[p] = self.page_refs.get(p, 0) + 1
            all_pages = shared + pages
            # fresh pages that will hold full prompt chunks start refcounted
            if self.prefix_cache:
                full = (len(req.prompt) - 1) // self.page_size
                for p in all_pages[len(shared):full]:
                    self.page_refs[p] = self.page_refs.get(p, 0) + 1
            self.slots[i] = req
            self.slot_pages[i] = all_pages
            bt[i, :] = -1
            bt[i, : len(all_pages)] = all_pages
            lens[i] = len(shared) * self.page_size
            admissions.append((i, req))
        cache = dataclasses.replace(
            cache,
            block_table=jnp.asarray(bt),
            seq_lens=jnp.asarray(lens),
        )
        return cache, admissions

    def active_mask(self) -> np.ndarray:
        return np.asarray([s is not None and not s.done for s in self.slots])

    def retire(self, cache: paged_cache.PagedKV):
        """Free slots whose requests completed; retired slots point at the
        scratch page (page 0) so their idle writes can't corrupt reused
        pages."""
        bt = None
        lens = None
        for i, req in enumerate(self.slots):
            if req is not None and req.done:
                self._free_slot(i)
                if bt is None:
                    bt = np.asarray(cache.block_table).copy()
                    lens = np.asarray(cache.seq_lens).copy()
                bt[i, :] = 0
                lens[i] = 0
        if bt is not None:
            cache = dataclasses.replace(
                cache,
                block_table=jnp.asarray(bt),
                seq_lens=jnp.asarray(lens),
            )
        return cache

    def record_tokens(self, tokens: np.ndarray):
        """Append this step's token per active slot; mark completions."""
        for i, req in enumerate(self.slots):
            if req is None or req.done:
                continue
            t = int(tokens[i])
            req.output.append(t)
            if (req.eos_token is not None and t == req.eos_token) or len(
                req.output
            ) >= req.max_new_tokens:
                req.done = True

    def record_token_block(self, tokens: np.ndarray):
        """Append an unroll block [B, U] per active slot (multi-step
        scheduling): tokens past EOS/max_new are overshoot and dropped —
        standard multi-step semantics; the admit-time page reservation
        (prompt + max_new + 1 page) absorbs the cache overshoot as long as
        U <= page_size."""
        U = tokens.shape[1]
        for i, req in enumerate(self.slots):
            if req is None or req.done:
                continue
            for u in range(U):
                t = int(tokens[i, u])
                req.output.append(t)
                if (req.eos_token is not None and t == req.eos_token) or len(
                    req.output
                ) >= req.max_new_tokens:
                    req.done = True
                    break

    @property
    def has_work(self) -> bool:
        return bool(self.pending) or any(
            s is not None and not s.done for s in self.slots
        )
