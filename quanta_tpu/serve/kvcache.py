"""Paged KV cache: fixed page pool + page-table indirection.

The reference has no serving layer at all (SURVEY.md §2.5; its roadmap
stops at module-level quantization). This realizes the north-star serving
requirement (BASELINE.json config 3: continuous batching) the TPU way:

  - one fixed-size page pool per model, shaped
    ``(n_layers, n_pages, page_size, n_kv_heads, head_dim)`` — static
    shapes, so every jitted step compiles exactly once;
  - a ``(n_slots, max_pages_per_slot)`` int32 page table maps each serving
    slot's logical token positions onto physical pages. The table is plain
    host data re-fed every step (tiny), so page allocation is host-side Python
    with zero recompilation;
  - memory is allocated lazily page-by-page as sequences grow, and freed
    when a request completes — HBM use tracks the *actual* token count,
    not n_slots * max_seq_len.

Sharding: pages carry the same head-axis TP sharding as the contiguous
cache (quanta_tpu.parallel.cache_specs) — P(None, None, None, 'model',
None); the page table is replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu.models.llama import LlamaConfig


def init_pool(cfg: LlamaConfig, n_pages: int, page_size: int) -> dict:
    """Allocate the page pool. Page 0 is reserved as the null page that
    unused page-table entries point at (always masked out in attention)."""
    shape = (cfg.n_layers, n_pages, page_size, cfg.n_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def gather_layer(pool_l: jax.Array, page_table: jax.Array) -> jax.Array:
    """(n_pages, page, nkv, hd) gathered by (n_slots, max_pages) ->
    (n_slots, max_pages*page, nkv, hd): each slot's logical KV stream."""
    g = pool_l[page_table]  # (S, maxp, page, nkv, hd)
    s, mp, pg, nkv, hd = g.shape
    return g.reshape(s, mp * pg, nkv, hd)


def write_token(
    pool_l: jax.Array,
    page_table: jax.Array,
    positions: jax.Array,
    kv_new: jax.Array,
    page_size: int,
) -> jax.Array:
    """Scatter one new token's K (or V) per slot into its current page.

    pool_l: (n_pages, page, nkv, hd); positions: (n_slots,) absolute token
    position being written; kv_new: (n_slots, nkv, hd).
    Inactive slots must point at distinct null positions or be masked by
    the caller — here slot i writes unconditionally to its mapped page.
    """
    page_idx = jnp.take_along_axis(
        page_table, (positions // page_size)[:, None], axis=1
    )[:, 0]
    offset = positions % page_size
    return pool_l.at[page_idx, offset].set(kv_new)


@partial(jax.jit, donate_argnums=(0,))
def write_prefill(
    pool: dict, pages: jax.Array, k_seq: jax.Array, v_seq: jax.Array
) -> dict:
    """Write a full prompt's KV into the given pages.

    pages: (n_prompt_pages,) int32 physical page ids.
    k_seq/v_seq: (n_layers, S_pad, nkv, hd) with S_pad == len(pages)*page.
    The pool is donated (in-place scatter in HBM).
    """
    n_pages = pages.shape[0]
    L, s_pad, nkv, hd = k_seq.shape
    page = s_pad // n_pages
    k_pg = k_seq.reshape(L, n_pages, page, nkv, hd)
    v_pg = v_seq.reshape(L, n_pages, page, nkv, hd)
    return {
        "k": pool["k"].at[:, pages].set(k_pg),
        "v": pool["v"].at[:, pages].set(v_pg),
    }


@dataclasses.dataclass
class PageAllocator:
    """Host-side free list over physical pages (page 0 reserved as null)."""

    n_pages: int

    def __post_init__(self):
        self._free: List[int] = list(range(self.n_pages - 1, 0, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"KV pool exhausted: need {n} pages, {len(self._free)} free"
            )
        return [self._free.pop() for _ in range(n)]

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if not 0 < p < self.n_pages:
                raise ValueError(f"bad page id {p}")
        self._free.extend(pages)
