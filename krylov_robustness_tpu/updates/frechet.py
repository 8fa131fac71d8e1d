"""Batched Fréchet derivatives Df(A)(e_i·e_jᵀ) ≈ U_i · X_h · U_jᵀ.

TPU-native counterpart of ``functions/multiple_frechet_eval.m``: row spaces
from Arnoldi seeded e_i, column spaces from Arnoldi on Aᵀ seeded e_j
(``multiple_frechet_eval.m:99-147``), per-pair core factor via the
block-triangular trick f([Gm Cm; 0 Hmᵀ]) (``:150-159``). Differences from a
transliteration:

* All operators here are symmetric, so row and column spaces coincide — ONE
  batched Arnoldi over the unique touched nodes serves every pair (the
  reference builds both and saves Aᵀ, ``multiple_frechet_eval.m:56``).
* The block-triangular dense expm of the stacked 2m×2m matrix becomes the
  Daleckii–Krein divided-difference form over the two small eighs
  (:func:`..funm.dense.frechet_offdiag_sym`) — batched over pairs, no
  general expm needed.
* With CholQR the first basis vector is exactly +e_i, so the reference's
  start-vector sign bookkeeping (``Uaux/Vaux``, ``:95-96``) is identically 1.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..funm.dense import frechet_offdiag_sym
from ..funm.scalar import get_fun
from ..krylov.arnoldi import arnoldi_continue, arnoldi_start, assemble_hessenberg
from .entries import DEFAULT_SCHEDULE, _trim, seed_blocks


@dataclasses.dataclass
class FrechetBatch:
    """Low-rank Fréchet factorizations sharing a node-indexed basis pool."""

    bases: jax.Array  # (u, n, m) Arnoldi bases, one per unique node
    X: jax.Array  # (npairs, m, m) core factors
    node_index: dict  # node id -> basis slot
    omega: np.ndarray  # (npairs, 2)
    iters: int

    def hessian(self, at_edges: np.ndarray, exact: bool = True) -> jax.Array:
        """Hessian contributions from the Fréchet factorizations.

        ``exact=False`` reproduces the reference's assembly
        (``functions/hessianfcn_exp.m:9-15``):
        Hes[h, l] = [U_{i_h} X_h U_{j_h}ᵀ]_{(i_l, j_l)}.

        ``exact=True`` (default) adds the transpose-probe term the reference
        omits: the symmetric perturbation direction is E_l + E_lᵀ, so the
        true mixed partial of trace f(A+Δ(x)) needs
        [Df'(E_h)]_{(i_l, j_l)} + [Df'(E_h)]_{(j_l, i_l)} — verified against
        finite differences of the gradient in the test suite.
        """
        at_edges = np.asarray(at_edges, dtype=np.int64)
        row_slots = jnp.asarray([self.node_index[int(i)] for i in self.omega[:, 0]])
        col_slots = jnp.asarray([self.node_index[int(j)] for j in self.omega[:, 1]])
        li = jnp.asarray(at_edges[:, 0])
        lj = jnp.asarray(at_edges[:, 1])
        # rows of each pair's row/col basis at every probe edge endpoint
        Ur = self.bases[row_slots]  # (npairs, n, m)
        Uc = self.bases[col_slots]
        H = jnp.einsum("hlm,hmp,hlp->hl", Ur[:, li, :], self.X, Uc[:, lj, :])
        if exact:
            H = H + jnp.einsum(
                "hlm,hmp,hlp->hl", Ur[:, lj, :], self.X, Uc[:, li, :]
            )
        return H


def multiple_frechet_eval(
    A,
    omega: np.ndarray,
    fun="exp",
    tol: float = 1e-12,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    lag: int = 3,
) -> FrechetBatch:
    fun = get_fun(fun)
    omega = np.asarray(omega, dtype=np.int64)
    nodes = np.unique(omega.ravel())
    node_index = {int(v): i for i, v in enumerate(nodes)}
    n = A.n
    U0 = seed_blocks(n, nodes, A.dtype)
    sched = _trim(schedule, max(int(n // 2) - 1, 1))
    total = sum(sched)

    state, _ = arnoldi_start(A, U0, max_steps=total)
    h_all, beta_all = [], []
    m_done = 0
    X_prev_rounds: list = []
    row_slots = jnp.asarray([node_index[int(i)] for i in omega[:, 0]])
    col_slots = jnp.asarray([node_index[int(j)] for j in omega[:, 1]])

    from ..krylov.arnoldi import ArnoldiBlocks

    X_now = None
    for r, round_steps in enumerate(sched):
        blocks, state = arnoldi_continue(A, state, round_steps, 1)
        h_all.append(blocks.h)
        beta_all.append(blocks.beta)
        m_done += round_steps
        ab = ArnoldiBlocks(
            h=jnp.concatenate(h_all, axis=0),
            beta=jnp.concatenate(beta_all, axis=0),
        )
        X_now = _pair_cores(ab, row_slots, col_slots, m_done, fun.name)
        X_lag = _pair_cores(ab, row_slots, col_slots, m_done - lag, fun.name)
        pad = jnp.zeros_like(X_now)
        pad = pad.at[:, : X_lag.shape[1], : X_lag.shape[2]].set(X_lag)
        err = jnp.linalg.norm(X_now - pad, axis=(-2, -1))
        if bool(jnp.all(err < tol)) or not bool(jnp.any(state.alive)):
            break

    bases = state.V[:, :, :m_done]
    return FrechetBatch(
        bases=bases, X=X_now, node_index=node_index, omega=omega, iters=m_done
    )


def _pair_cores(blocks, row_slots, col_slots, m: int, fun_name: str):
    """Core factors for all pairs: top-right block of f([[G_i, C],[0, G_j]])
    with C = e₁e₁ᵀ, via divided differences on the batched eighs."""
    G = assemble_hessenberg(blocks, 1, m)  # (u, m, m)
    G = (G + jnp.swapaxes(G, -1, -2)) / 2
    w, V = jnp.linalg.eigh(G)
    w1, V1 = w[row_slots], V[row_slots]
    w2, V2 = w[col_slots], V[col_slots]
    # C = e1 e1ᵀ in the Krylov coordinates of each pair
    C = jnp.zeros((row_slots.shape[0], m, m), G.dtype).at[:, 0, 0].set(1.0)
    return frechet_offdiag_sym(w1, V1, w2, V2, C, fun_name)
