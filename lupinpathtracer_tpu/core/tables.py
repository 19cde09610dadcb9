"""Tiny-table lane lookup helpers.

XLA TPU 1-D lane gathers cost ~4-7 ms per op at 131k-610k lanes regardless
of table size (measured on v5e), while an unrolled select-chain over a
small static table is essentially free VPU work. Every hot-path lookup into
a table whose static length is small goes through `sel_by_id`.
"""

from __future__ import annotations

import jax.numpy as jnp

# Static table sizes at or below this use the unrolled select-chain.
SELECT_CHAIN_MAX = 64


def sel_by_id(tab, idx, n: int | None = None, cap: int = SELECT_CHAIN_MAX):
    """tab[idx] with a select-chain when the table is small.

    tab: 1-D array (static length), idx: integer lane batch. `n` overrides
    the number of live rows (defaults to tab.shape[0])."""

    if n is None:
        n = int(tab.shape[0])
    if n > cap:
        return tab[idx]
    out = jnp.broadcast_to(tab[0], idx.shape)
    for m in range(1, n):
        out = jnp.where(idx == m, tab[m], out)
    return out
