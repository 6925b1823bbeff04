"""Reference-shaped key-set fixtures (FIXTURES.md §2).

Deterministic re-expressions of the reference benchmark harness:
``GenerateRandom64`` (``benchmarks/random.h:13-26`` — the reference
deliberately uses a strong RNG because weak sequential generators
interact pathologically with multiply-shift hashing, comment at
``:16-20``) and ``MixIn`` (``:30-45`` — build a lookup set with an
exact hit fraction against the add set).
"""

from __future__ import annotations

import numpy as np


def generate_random64(n: int, seed: int) -> np.ndarray:
    """n distinct-ish uint64 draws from PCG64 (statistically strong,
    like the reference's random_device, but reproducible)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def disjoint_key_sets(n_add: int, n_lookup: int, seed: int):
    """(add_set, lookup_set) with guaranteed empty intersection —
    the precondition of every FPR measurement."""
    raw = generate_random64(n_add + 2 * n_lookup, seed)
    uniq = np.unique(raw)
    rng = np.random.Generator(np.random.PCG64(seed ^ 0x5EED))
    uniq = uniq[rng.permutation(len(uniq))]
    if len(uniq) < n_add + n_lookup:
        raise ValueError("not enough distinct draws; raise n")
    return uniq[:n_add], uniq[n_add:n_add + n_lookup]


def mix_in(to_add: np.ndarray, to_lookup: np.ndarray, portion: float,
           seed: int) -> np.ndarray:
    """Reference MixIn: clone the lookup set, overwrite a ``portion``
    fraction with members of the add set, shuffle — yields a query set
    with hit rate ≈ portion (``benchmarks/random.h:30-45``)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out = to_lookup.copy()
    n_replace = int(round(len(out) * portion))
    if n_replace:
        src = rng.integers(0, len(to_add), size=n_replace)
        out[:n_replace] = to_add[src]
    return out[rng.permutation(len(out))]
