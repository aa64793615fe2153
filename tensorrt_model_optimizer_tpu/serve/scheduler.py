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
                 max_pages_per_seq: int):
        self.max_slots = max_slots
        self.page_size = page_size
        self.free_pages = list(range(1, n_pages))  # page 0 = scratch for idle
        self.max_pages_per_seq = max_pages_per_seq
        self.slots: list[Optional[Request]] = [None] * max_slots
        self.slot_pages: list[list[int]] = [[] for _ in range(max_slots)]
        self.pending: list[Request] = []

    def submit(self, req: Request):
        self.pending.append(req)

    def _alloc_pages(self, n: int) -> Optional[list[int]]:
        if len(self.free_pages) < n:
            return None
        out = [self.free_pages.pop() for _ in range(n)]
        return out

    def _free_slot(self, i: int):
        self.free_pages.extend(self.slot_pages[i])
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
            pages = self._alloc_pages(need)
            if pages is None:
                self.pending.insert(0, req)
                break
            self.slots[i] = req
            self.slot_pages[i] = pages
            bt[i, :] = -1
            bt[i, : len(pages)] = pages
            lens[i] = 0
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

    @property
    def has_work(self) -> bool:
        return bool(self.pending) or any(
            s is not None and not s.done for s in self.slots
        )
