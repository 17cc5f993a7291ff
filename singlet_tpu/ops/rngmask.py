"""Counter-based RNG for speckled cross-validation masks.

The reference never materializes its CV test-set mask: membership of entry
(cell i, gene j) is recomputed on the fly from a stateless xorshift64-style
hash keyed by (seed, i, j), identically in the train update and the test-MSE
evaluation (reference:src/singlet.cpp:7-114, draw at :92-95). That property is
exactly what a multi-host TPU build needs — every shard recomputes identical
masks with zero communication — so we reimplement the same hash bit-faithfully
here.

JAX on TPU has no native uint64, so the 64-bit lanes are emulated as
(hi, lo) pairs of uint32. All operations (xor, shifts by static amounts,
add-with-carry, small modulus) are exact.

Convention: the mask is always keyed as (i=cell/sample index, j=gene/feature
index) — the reference flips loop order with its ``mask_t`` flag but the
(cell, gene) keying is invariant (reference:src/singlet.cpp:450,485,518,553).
``mask[i, j] == True`` means entry (gene j, cell i) is in the *test* set and
must be masked out of training updates.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

U32 = jnp.uint32
_MASK32 = (1 << 32) - 1


def _u64(hi, lo) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.asarray(hi, U32), jnp.asarray(lo, U32)


def u64_from_int(x: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a Python int (mod 2^64) into (hi, lo) uint32 device scalars."""
    x = int(x) & ((1 << 64) - 1)
    return _u64(x >> 32, x & _MASK32)


def u64_xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def u64_shl(a, s: int):
    """Left-shift by a *static* amount s (0 <= s < 64)."""
    hi, lo = a
    if s == 0:
        return hi, lo
    if s < 32:
        return (hi << s) | (lo >> (32 - s)), lo << s
    return lo << (s - 32), jnp.zeros_like(lo)


def u64_shr(a, s: int):
    """Logical right-shift by a *static* amount s (0 <= s < 64)."""
    hi, lo = a
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    return jnp.zeros_like(hi), hi >> (s - 32)


def u64_add(a, b):
    hi_a, lo_a = a
    hi_b, lo_b = b
    lo = lo_a + lo_b          # uint32 wrap-around is well-defined in XLA
    carry = (lo < lo_a).astype(U32)
    return hi_a + hi_b + carry, lo


def u64_mod_small(a, d: int) -> jnp.ndarray:
    """a mod d for a small static modulus d (d < 2^16), exact.

    (hi*2^32 + lo) % d == ((hi % d) * (2^32 % d) + lo % d) % d; every
    intermediate fits in uint32 for d < 2^16.
    """
    hi, lo = a
    two32_mod = (1 << 32) % d
    return ((hi % d) * U32(two32_mod) + lo % d) % d


def _xs(a, shifts):
    """Apply a sequence of xor-shift steps: ('l'|'r', amount)."""
    for direction, s in shifts:
        shifted = u64_shl(a, s) if direction == "l" else u64_shr(a, s)
        a = u64_xor(a, shifted)
    return a


# The three mixing stages of the reference's stateless hash
# (reference:src/singlet.cpp:30-64), reproduced bit-for-bit:
#   rand(i):    i ^= i<<19; i ^= i>>7; i ^= i<<36;  x = state + i;
#               x ^= x<<38; x ^= x>>13; x ^= x<<23
#   rand(i,j):  x = rand(i);  j ^= j>>7; j ^= j<<23; j ^= j>>8;  x += j;
#               x ^= x>>7;  x ^= x<<53; x ^= x>>4

_I_MIX = (("l", 19), ("r", 7), ("l", 36))
_X_MIX = (("l", 38), ("r", 13), ("l", 23))
_J_MIX = (("r", 7), ("l", 23), ("r", 8))
_XJ_MIX = (("r", 7), ("l", 53), ("r", 4))


def hash_i(seed_hi, seed_lo, i):
    """rand(i): mix cell index i into the seed. i is (hi, lo) uint32 pair."""
    i = _xs(i, _I_MIX)
    x = u64_add((seed_hi, seed_lo), i)
    return _xs(x, _X_MIX)


def hash_ij(seed_hi, seed_lo, i, j):
    """rand(i, j): the full stateless hash of (seed, cell i, gene j)."""
    x = hash_i(seed_hi, seed_lo, i)
    j = _xs(j, _J_MIX)
    x = u64_add(x, j)
    return _xs(x, _XJ_MIX)


def _ids_to_u64(ids):
    ids = jnp.asarray(ids)
    return jnp.zeros_like(ids, dtype=U32), ids.astype(U32)


@partial(jax.jit, static_argnames=("inv_density",))
def mask_block(seed: jnp.ndarray, cell_ids: jnp.ndarray, gene_ids: jnp.ndarray,
               inv_density: int) -> jnp.ndarray:
    """Compute the speckled test-set mask for a (cells x genes) tile.

    Args:
      seed: uint32[2] array (hi, lo) — from :func:`seed_pair`.
      cell_ids: int array of global cell (sample/column) indices, shape (C,).
      gene_ids: int array of global gene (feature/row) indices, shape (G,).
      inv_density: static int, 1 / test_set_density (reference passes
        ``round(1/test_density)``, reference:R/ard_nmf.R:112).

    Returns:
      bool[C, G]; True = entry is in the held-out test set.

    The i-stage of the hash depends only on the cell index, so it is computed
    once per cell and broadcast across the gene axis — the per-entry work is
    just the j-mix, one 64-bit add and three xor-shifts on the VPU.
    """
    seed_hi, seed_lo = seed[0], seed[1]
    ci = _ids_to_u64(cell_ids)
    gj = _ids_to_u64(gene_ids)

    # Per-cell stage: x_i = rand(i), shape (C,)
    xi = hash_i(seed_hi, seed_lo, ci)
    # Per-gene stage: mixed j, shape (G,)
    jm = _xs(gj, _J_MIX)

    # Outer combine to (C, G)
    x = (xi[0][:, None], xi[1][:, None])
    j = (jm[0][None, :], jm[1][None, :])
    x = u64_add(x, j)
    x = _xs(x, _XJ_MIX)
    return u64_mod_small(x, int(inv_density)) == 0


def seed_pair(seed: int) -> jnp.ndarray:
    """Pack a Python integer seed into the uint32[2] (hi, lo) device format."""
    hi, lo = u64_from_int(seed)
    return jnp.stack([hi, lo])


def mask_fraction(seed: int, n_cells: int, n_genes: int, inv_density: int) -> float:
    """Measured density of the mask on a full grid (diagnostic helper)."""
    m = mask_block(seed_pair(seed), jnp.arange(n_cells), jnp.arange(n_genes),
                   inv_density)
    return float(jnp.mean(m))
