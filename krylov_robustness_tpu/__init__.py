"""krylov_robustness_tpu — TPU-native Krylov network-robustness framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
COMPiLELab/krylov_robustness (Massei & Tudisco, arXiv:2303.04971): Krylov
approximation of trace(f(A)) functionals on sparse adjacency matrices and
the discrete/continuous robustness optimizers built on them.

Layer map (bottom-up; reference counterparts in parentheses):

  ops       sparse containers + SpMM kernels (banded-ELL / BSR / super-tile
            Pallas MXU) + the Sturm banded eigensolver for projected
            spectra (MATLAB built-in sparse A*w, eig)
  krylov    batched block Lanczos / Arnoldi scans
            (lanczos_krylov.m / arnoldi_krylov.m)
  funm      expmv + theta table, norm estimators, stochastic trace, dense f
            (expmv.m, select_taylor_degree.m, normAm.m, mc_trace.m, fun_diag.m)
  updates   low-rank update engine: trace_fun_update, fun_update, entries,
            Fréchet batch (trace_fun_update.m, fun_update.m,
            function_multiple_entries.m, multiple_frechet_eval.m,
            edge2low_rank.m)
  graphs    dataset IO, preprocessing, centralities, candidate selection
            (compute_centrality.m, find_top_edges.m, find_top_missing_edges.m)
  optimize  greedy break/make (per-step + fused multi-step device blocks)
            + continuous tuning/rewire/add
            (greedy_krylov.m, krylov_miobi.m, fun_and_grad_krylov_*.m,
            hessianfcn_*.m + fmincon)
  baselines MIOBI family + EIGENV heuristic (MIOBI Codes/, inlined EIGENV)
  parallel  mesh + row-sharded SpMM (COO/ELL/Pallas-BSR local kernels with
            gather/compute overlap) + collectives (new scope)
  experiments  paper-protocol drivers (Tests/*.m)
  utils     configs, logging, checkpointing (new scope)
"""

__version__ = "0.1.0"

from .ops.sparse import CooMatrix, EllMatrix, spmm  # noqa: F401
