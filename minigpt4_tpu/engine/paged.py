"""Paged KV cache pool — vLLM-style paging, TPU-native.

Serving lanes in the batched decode paths historically stacked dense
per-lane caches of a uniformly reserved ``session_ctx`` positions: a group
of B lanes costs B x [L, H, session_ctx, Dh] HBM no matter how short the
conversations actually are (at 13B/f8/512-ctx that is 210 MB/lane, and the
measured 16 GB capacity boundary was 8 lanes).  This module replaces that
reservation with a shared **page pool**: lanes own 128-position pages only
for positions they have actually consumed, so group HBM scales with used
context and short-conversation groups admit ~2x more lanes on the same
chip.

Layout: pools ``k``/``v`` are [L, NP, H, PAGE, Dh]; a lane's logical
positions [p*PAGE, (p+1)*PAGE) live in pool page ``table[p]``.  The flash
decode kernel reads blocks through the table
(ops/flash_decode.paged_flash_decode_attention — the blockwise schedule
makes paging a DMA-index lookup, not a new kernel) and single-token decode
writes route through the same table (models/llama._layer); PAGE equals the
kernel's 128-position KV block for serving windows, so paging costs no
bandwidth vs the dense path.

One pool page id (``trash_page``, the last page) is reserved as a shared
write sink: table slots a lane has not allocated point there, so finished
lanes decoding past their useful length (the batched paths let them
overshoot and roll back) write garbage into a page nothing ever trusts
instead of into a neighbour's history.

The reference has no serving layer at all (one global cursor,
/root/reference/minigpt4.cpp:2521); this is TPU-native new capability.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PAGE = 128  # positions per page == the flash kernel's serving KV block


class PoolExhausted(RuntimeError):
    """No free pages left — callers stop/shrink the group or retry later."""


@partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
def _scatter(pool, lane, page_ids, n_pages):
    """Copy a dense lane cache [L, 1, H, C, Dh] into ``n_pages`` pool pages
    (in place on the donated pool).  Same bytes moved as the dense paths'
    join concatenate — paging makes admission cheaper, not costlier."""
    for i in range(n_pages):
        upd = jax.lax.dynamic_slice_in_dim(lane, i * PAGE, PAGE, axis=3)
        pool = jax.lax.dynamic_update_slice(
            pool, upd, (0, page_ids[i], 0, 0, 0)
        )
    return pool


@partial(jax.jit, static_argnums=(2, 3))
def _gather(pool, page_ids, n_pages, n_ctx):
    """Collect a lane's pages back into a dense [L, 1, H, n_ctx, Dh] cache
    (detach path).  Positions past the last allocated page stay zero."""
    l, _, h, _, dh = pool.shape
    out = jnp.zeros((l, 1, h, n_ctx, dh), pool.dtype)
    for i in range(n_pages):
        blk = jax.lax.dynamic_slice(
            pool, (0, page_ids[i], 0, 0, 0), (l, 1, h, PAGE, dh)
        )
        out = jax.lax.dynamic_update_slice(out, blk, (0, 0, 0, i * PAGE, 0))
    return out


class PagedKVPool:
    """Shared KV page pool + free-list allocator for batched serving.

    ``n_pages`` counts usable pages (one extra trash page is added on top).
    ``capacity`` is the per-lane logical limit (= table width * PAGE); it
    normally equals the pool owner's ``session_ctx``.
    """

    def __init__(self, cfg, n_pages: int, capacity: int, dtype=jnp.bfloat16,
                 sharding=None):
        if capacity % PAGE:
            raise ValueError(f"capacity {capacity} must be a multiple of {PAGE}")
        self.cfg = cfg
        self.capacity = capacity
        self.maxp = capacity // PAGE
        self.n_pages = n_pages
        shape = (cfg.n_layer, n_pages + 1, cfg.n_head, PAGE, cfg.head_dim)
        if sharding is not None:
            # mesh-placed pool (parallel/spmd.pool_specs: heads over 'tp',
            # pages whole on every shard) — paged serving composes with
            # tensor parallelism; donation through the jitted scatter/decode
            # dispatches preserves the placement
            self.k = jax.device_put(jnp.zeros(shape, dtype), sharding)
            self.v = jax.device_put(jnp.zeros(shape, dtype), sharding)
        else:
            self.k = jnp.zeros(shape, dtype)
            self.v = jnp.zeros(shape, dtype)
        self.sharding = sharding
        self.trash_page = n_pages  # reserved write sink (never allocated)
        self._free = list(range(n_pages))
        self._allocated: set[int] = set()
        # a failed donated dispatch leaves k/v pointing at deleted buffers;
        # the owner marks the pool broken and falls back to dense groups
        # (engine/sessions.py) instead of poisoning every later group
        self.broken = False

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def allocated_pages(self) -> int:
        return len(self._allocated)

    def pages_for(self, n_positions: int) -> int:
        """Pages needed to cover ``n_positions`` consumed positions."""
        return max(1, -(-n_positions // PAGE))

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise PoolExhausted(
                f"need {n} pages, {len(self._free)} free (of {self.n_pages})"
            )
        got, self._free = self._free[:n], self._free[n:]
        self._allocated.update(got)
        return got

    def free(self, pages: list[int]) -> None:
        """Return pages to the free list.  Pages not currently allocated are
        rejected — a double-free would hand the same page to two lanes, whose
        decode writes would silently clobber each other's KV history."""
        for p in pages:
            if p not in self._allocated:
                raise ValueError(f"page {p} is not allocated (double free?)")
        for p in pages:
            self._allocated.discard(p)
        self._free.extend(pages)

    def admit(self, dense_cache: dict, n_past: int) -> list[int]:
        """Scatter a lane's dense cache (trimmed to its consumed ``n_past``
        prefix) into freshly allocated pages; returns the lane's page ids.
        The caller drops its dense cache afterwards (the pool copy is the
        live one until :meth:`evict`)."""
        n = self.pages_for(n_past)
        pages = self.alloc(n)
        try:
            ids = jnp.asarray(pages, jnp.int32)
            self.k = _scatter(self.k, dense_cache["k"], ids, n)
            self.v = _scatter(self.v, dense_cache["v"], ids, n)
        except Exception:
            # _scatter donates the pool arrays: after a failed dispatch they
            # may point at deleted buffers.  Poisoned pools are abandoned
            # (the owner rebuilds or serves dense), never reused.
            self.broken = True
            self.free(pages)
            raise
        return pages

    def admit_host(self, parked: dict, n_past: int) -> list[int]:
        """Scatter a PARKED session's host-trimmed cache straight into pool
        pages.  ``parked`` is ``DecodeState.parked`` ({"shape", "dtype",
        "k", "v"} with k/v [L, 1, H, n, Dh] trimmed to the consumed
        prefix): only the used pages cross PCIe, instead of ensure_device's
        full-geometry re-upload followed by a device-side scatter."""
        n = self.pages_for(n_past)
        pad = n * PAGE - parked["k"].shape[3]

        def prep(a):
            a = np.asarray(a)
            if pad:
                a = np.pad(a, ((0, 0),) * 3 + ((0, pad), (0, 0)))
            return jnp.asarray(a, self.k.dtype)

        return self.admit({"k": prep(parked["k"]), "v": prep(parked["v"])},
                          n_past)

    def extend(self, pages: list[int], needed_positions: int) -> list[int]:
        """Grow a lane's page list to cover ``needed_positions``; returns the
        (possibly unchanged) list.  Raises :class:`PoolExhausted` when the
        pool is dry — the caller stops the group and detaches."""
        want = self.pages_for(needed_positions)
        if want > self.maxp:
            raise ValueError(
                f"lane needs {want} pages > per-lane capacity {self.maxp}"
            )
        if want > len(pages):
            pages = pages + self.alloc(want - len(pages))
        return pages

    def table_row(self, pages: list[int]) -> np.ndarray:
        """[MAXP + 1] i32 table row: the lane's pages, then trash-sink slots.

        The extra trailing slot is load-bearing: a finished lane overshooting
        its capacity indexes the table at ``pos // PAGE >= MAXP``, which the
        gather clamps to the LAST slot — always trash here, even for a lane
        holding all MAXP real pages, so overshoot writes can never land in
        the lane's own (or anyone's) valid history."""
        row = np.full((self.maxp + 1,), self.trash_page, np.int32)
        row[: len(pages)] = pages
        return row

    def evict(self, pages: list[int], n_ctx: int) -> dict:
        """Gather a lane's pages back to a dense [L, 1, H, n_ctx, Dh] cache
        and free the pages (detach path).  The pages are freed even when the
        gather fails (the lane is being detached either way); ``free``'s
        allocated-set check keeps a repeated call from double-freeing."""
        try:
            ids = jnp.asarray(pages, jnp.int32)
            out = {
                "k": _gather(self.k, ids, len(pages), n_ctx),
                "v": _gather(self.v, ids, len(pages), n_ctx),
            }
        finally:
            self.free(pages)
        return out
