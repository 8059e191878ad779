"""Permutation index utilities used by block-FFT/monarch decompositions.

Parity target: `/root/reference/src/utils/permutations.py:8-42` — bit
reversal (power-of-2 and general), transpose, and snake permutations.
(The Hilbert-curve permutation there is vendored third-party code for image
experiments; out of scope for the genomic surface.)
"""

from __future__ import annotations

import math

import numpy as np


def bitreversal_po2(n: int) -> np.ndarray:
    """Bit-reversal permutation for power-of-2 n (`permutations.py:8-14`)."""
    m = int(math.log2(n))
    perm = np.arange(n).reshape(n, 1)
    for _ in range(m):
        n1 = perm.shape[0] // 2
        perm = np.hstack((perm[:n1], perm[n1:]))
    return perm.squeeze(0)


def bitreversal_permutation(n: int) -> np.ndarray:
    """General-n bit reversal by filtering the next-pow2 permutation
    (`permutations.py:16-20`)."""
    m = int(math.ceil(math.log2(n)))
    big = 1 << m
    perm = bitreversal_po2(big)
    return np.extract(perm < n, perm)


def transpose_permutation(h: int, w: int) -> np.ndarray:
    """(h, w) row-major -> column-major index permutation
    (`permutations.py:22-27`)."""
    return np.arange(h * w).reshape(h, w).T.reshape(h * w)


def snake_permutation(h: int, w: int) -> np.ndarray:
    """Boustrophedon ordering (`permutations.py:29-34`)."""
    indices = np.arange(h * w).reshape(h, w)
    indices[1::2, :] = indices[1::2, ::-1]
    return indices.reshape(h * w)
