"""Shared test utilities."""

import numpy as np
import scipy.sparse as sp


def random_graph(n, density, seed=0, weighted=False):
    """Random symmetric zero-diagonal sparse matrix (test graph)."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csr")
    A = A + A.T
    if not weighted:
        A.data[:] = 1.0
    A.setdiag(0)
    A.eliminate_zeros()
    return A.tocsr()
