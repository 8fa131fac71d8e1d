"""Bounded fill-density experiment (VERDICT r2 weak-item 7 / next-item 8).

The super-tile SpMM wall is ZERO FILL: tiles are ~0.2% dense, so the MXU
does ~500x the useful MACs. The one untried lever is the ORDERING: RCM
minimizes bandwidth, but tile count is a rectangular-cover objective —
clustered orderings (nested-dissection / community-style) could cover the
nnz with fewer (super-row, col-slab) tiles and fewer tiles = fewer grid
steps = proportionally faster kernel.

This script counts 512x256 super-tiles on the paper's two kernel-probe
graphs under: RCM, recursive spectral bisection (Fiedler, 256-node leaves),
and degree-descending label propagation communities (RCM within community).
Only a >=20% tile reduction would justify a TPU re-probe.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from scipy.sparse.csgraph import reverse_cuthill_mckee

from krylov_robustness_tpu.graphs.io import load_misc, load_transport
from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
from krylov_robustness_tpu.ops.pallas_bsr_super import super_tile_count


def rcm(A):
    return np.asarray(reverse_cuthill_mckee(sp.csr_matrix(A), symmetric_mode=True))


def spectral_bisection(A, leaf=256, tol=1e-3):
    """Recursive Fiedler bisection down to `leaf`-node parts; returns the
    concatenated part order (nested-dissection-style locality)."""
    n = A.shape[0]
    order = np.empty(n, dtype=np.int64)
    pos = [0]

    def rec(idx):
        m = len(idx)
        if m <= leaf:
            # RCM inside the leaf keeps the diagonal tile band-friendly
            sub = A[idx][:, idx]
            try:
                p = np.asarray(reverse_cuthill_mckee(sp.csr_matrix(sub),
                                                     symmetric_mode=True))
            except Exception:
                p = np.arange(m)
            order[pos[0]:pos[0] + m] = idx[p]
            pos[0] += m
            return
        sub = sp.csr_matrix(A[idx][:, idx], dtype=np.float64)
        deg = np.asarray(sub.sum(axis=1)).ravel()
        L = sp.diags(deg) - sub
        try:
            w, V = spla.eigsh(L, k=2, sigma=-1e-6, which="LM", tol=tol,
                              maxiter=400)
            fiedler = V[:, np.argsort(w)[1]]
            half = np.argsort(fiedler)
        except Exception:
            half = np.arange(m)
        rec(idx[half[: m // 2]])
        rec(idx[half[m // 2:]])

    rec(np.arange(n))
    return order


def label_prop(A, iters=30, seed=0):
    """Cheap label propagation; order = (community, degree desc), RCM inside
    each community."""
    rng = np.random.default_rng(seed)
    Acsr = sp.csr_matrix(A)
    n = A.shape[0]
    labels = np.arange(n)
    nodes = np.arange(n)
    for _ in range(iters):
        rng.shuffle(nodes)
        changed = 0
        for u in nodes:
            s, e = Acsr.indptr[u], Acsr.indptr[u + 1]
            nb = Acsr.indices[s:e]
            if len(nb) == 0:
                continue
            vals, counts = np.unique(labels[nb], return_counts=True)
            best = vals[np.argmax(counts)]
            if labels[u] != best:
                labels[u] = best
                changed += 1
        if changed == 0:
            break
    # order communities by size desc, nodes by RCM inside each
    order = []
    for lab in np.unique(labels):
        idx = np.nonzero(labels == lab)[0]
        sub = A[idx][:, idx]
        try:
            p = np.asarray(reverse_cuthill_mckee(sp.csr_matrix(sub),
                                                 symmetric_mode=True))
            order.append(idx[p])
        except Exception:
            order.append(idx)
    order.sort(key=len, reverse=True)
    return np.concatenate(order)


for name, loader in (("Vermont", lambda: load_transport("Vermont")),
                     ("ca-AstroPh", lambda: load_misc("ca-AstroPh"))):
    A = preprocess_unweighted(loader())
    print(f"== {name}: n={A.shape[0]} nnz={A.nnz}")
    perms = {"rcm": rcm(A)}
    import time
    t0 = time.time()
    perms["spectral_nd"] = spectral_bisection(A)
    t_nd = time.time() - t0
    t0 = time.time()
    perms["label_prop"] = label_prop(A)
    t_lp = time.time() - t0
    for pname, perm in perms.items():
        nt = super_tile_count(A, perm)
        print(f"  {pname:12s} tiles={nt}")
    print(f"  (ordering cost: spectral={t_nd:.1f}s labelprop={t_lp:.1f}s)")
