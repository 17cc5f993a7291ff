"""Bit-faithfulness tests for the counter-based mask RNG.

The independent oracle below implements the reference hash semantics
(reference:src/singlet.cpp:30-95) with plain Python integers mod 2^64 — a
completely different arithmetic substrate from the device's (hi, lo) uint32
emulation, so agreement validates both the port and the emulation.
"""

import numpy as np
import jax.numpy as jnp

from singlet_tpu.ops import rngmask

M64 = (1 << 64) - 1


def _py_hash_ij(seed: int, i: int, j: int) -> int:
    i &= M64
    i ^= (i << 19) & M64
    i ^= i >> 7
    i ^= (i << 36) & M64
    x = (seed + i) & M64
    x ^= (x << 38) & M64
    x ^= x >> 13
    x ^= (x << 23) & M64

    j &= M64
    j ^= j >> 7
    j ^= (j << 23) & M64
    j ^= j >> 8
    x = (x + j) & M64
    x ^= x >> 7
    x ^= (x << 53) & M64
    x ^= x >> 4
    return x


def _py_mask(seed, i, j, inv_density):
    return _py_hash_ij(seed, i, j) % inv_density == 0


def test_hash_matches_python_oracle(rng):
    seeds = [0, 1, 999, 123456789, 2**31 - 1, 2**63 + 12345]
    for seed in seeds:
        cells = rng.integers(0, 1 << 20, size=13)
        genes = rng.integers(0, 1 << 20, size=17)
        m = np.asarray(
            rngmask.mask_block(
                rngmask.seed_pair(seed), jnp.asarray(cells), jnp.asarray(genes), 20
            )
        )
        for a, ci in enumerate(cells):
            for b, gj in enumerate(genes):
                assert m[a, b] == _py_mask(seed, int(ci), int(gj), 20), (
                    seed, ci, gj)


def test_u64_mod_small_exact(rng):
    for d in (2, 3, 17, 20, 33, 100, 1000):
        vals = rng.integers(0, M64, size=64, dtype=np.uint64)
        hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
        lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        got = np.asarray(rngmask.u64_mod_small((hi, lo), d))
        want = (vals % np.uint64(d)).astype(np.uint32)
        np.testing.assert_array_equal(got, want)


def test_mask_density_close_to_nominal():
    # inv_density=20 -> ~5% of entries masked
    frac = rngmask.mask_fraction(seed=42, n_cells=500, n_genes=400,
                                 inv_density=20)
    assert abs(frac - 0.05) < 0.005


def test_mask_deterministic_and_seed_sensitive():
    a1 = rngmask.mask_block(rngmask.seed_pair(7), jnp.arange(64), jnp.arange(64), 10)
    a2 = rngmask.mask_block(rngmask.seed_pair(7), jnp.arange(64), jnp.arange(64), 10)
    b = rngmask.mask_block(rngmask.seed_pair(8), jnp.arange(64), jnp.arange(64), 10)
    assert bool(jnp.all(a1 == a2))
    assert not bool(jnp.all(a1 == b))


def test_mask_block_indexing_is_global():
    """Tiles must agree with the full grid — shard-invariance property."""
    seed = rngmask.seed_pair(999)
    full = rngmask.mask_block(seed, jnp.arange(100), jnp.arange(80), 20)
    tile = rngmask.mask_block(seed, jnp.arange(50, 70), jnp.arange(10, 40), 20)
    assert bool(jnp.all(full[50:70, 10:40] == tile))
