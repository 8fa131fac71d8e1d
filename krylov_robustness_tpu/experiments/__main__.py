"""CLI for the paper-protocol experiment drivers.

The reference's ``Tests/*.m`` are run-as-script drivers; here each becomes a
subcommand (SURVEY.md §2.2 mapping):

    python -m krylov_robustness_tpu.experiments unweighted --mode break
    python -m krylov_robustness_tpu.experiments budget --mode make \
        --datasets Barcelona Rome
    python -m krylov_robustness_tpu.experiments weighted --fun sinh --hessian
    python -m krylov_robustness_tpu.experiments trace
    python -m krylov_robustness_tpu.experiments scaling

By default runs on the CPU platform in float64 (the golden-result /
correctness configuration — matching the reference's MATLAB doubles);
pass ``--tpu`` to run on the ambient JAX platform in float32.
"""

from __future__ import annotations

import argparse
import os
import sys


def _setup_platform(use_tpu: bool):
    # Must happen before jax initializes its backend (CLAUDE.md: the ambient
    # axon hook otherwise routes eager ops through the remote TPU tunnel).
    if not use_tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    return jnp.float32 if use_tpu else jnp.float64


def main(argv=None):
    p = argparse.ArgumentParser(prog="krylov_robustness_tpu.experiments")
    p.add_argument("--tpu", action="store_true",
                   help="run on the ambient JAX platform (f32) instead of CPU f64")
    p.add_argument("--out-dir", default="results")
    sub = p.add_subparsers(dest="cmd", required=True)

    u = sub.add_parser("unweighted", help="Tables 2-3 protocol (break/make)")
    u.add_argument("--mode", choices=["break", "make"], default="break")
    u.add_argument("--datasets", nargs="*", default=None,
                   help="dataset names (searched in misc then transport)")
    u.add_argument("--collections", nargs="*", default=["misc", "transport"])
    u.add_argument("--k", type=int, default=50)
    u.add_argument("--Q", type=int, default=250)
    u.add_argument("--tol", type=float, default=1e-6)
    u.add_argument("--gkb-only", action="store_true",
                   help="run only the GREEDY_KRYLOV method (large-Q reruns "
                   "next to existing Q=250 baselines)")
    u.add_argument("--force", action="store_true",
                   help="regenerate rows even if the resume check finds "
                   "them complete (keyed in-place replace)")
    u.add_argument("--order", choices=["min", "mult"], default="min",
                   help="candidate-ranking order for find_top_(missing_)edges "
                   "(reference 'min'/'mult' tie semantics)")
    u.add_argument("--rescore-every", type=int, default=1,
                   help="candidate-score reuse period: full rescore every N "
                   "greedy steps, fixed-size fresh subset otherwise "
                   "(1 = reference protocol; >1 is a non-reference "
                   "heuristic — the committed winner is always scored "
                   "fresh, but picks are only heuristically equivalent to "
                   "the full-rescore protocol)")
    u.add_argument("--rescore-frac", type=float, default=0.2,
                   help="fraction of candidates scored fresh between full "
                   "rescores")
    u.add_argument("--fused-steps", type=int, default=None,
                   help="greedy steps fused per device dispatch (on-device "
                   "argmin + commit, optimize/fused.py); 0/1 = per-step "
                   "loop; default auto = 10 on --tpu (f32) sessions, 0 on "
                   "the CPU f64 golden lane. Picks match the per-step "
                   "loop; steps with convergence stragglers past the fused "
                   "budget replay through the accurate path")

    b = sub.add_parser("budget", help="Figures 1-4 budget sweeps")
    b.add_argument("--mode", choices=["break", "make"], default="break")
    b.add_argument("--datasets", nargs="+", required=True)
    b.add_argument("--budgets", type=int, nargs="*",
                   default=list(range(10, 101, 10)))
    b.add_argument("--search-spaces", type=int, nargs="*",
                   default=[50, 250, 1000])
    b.add_argument("--tol", type=float, default=1e-6)
    b.add_argument("--force", action="store_true",
                   help="regenerate sweeps even if their rows exist "
                   "(keyed in-place replace)")

    w = sub.add_parser("weighted", help="Tables 5-6 protocol (weighted IPM)")
    w.add_argument("--fun", choices=["exp", "sinh", "cosh"], default="exp")
    w.add_argument("--hessian", action="store_true",
                   help="exact Krylov Hessian instead of L-BFGS approximation")
    w.add_argument("--countries", nargs="*", default=None)
    w.add_argument("--methods", nargs="*",
                   default=["tuning", "rewire", "add"])
    w.add_argument("--maxiter", type=int, default=200)

    sub.add_parser("trace", help="trace(exp(A)) wall-time benchmark")

    pa = sub.add_parser("parity", help="deterministic 1e-6 accuracy tables "
                        "(expmv action + tightened trace) vs dense oracles")
    pa.add_argument("--dense-cutoff", type=int, default=2500)
    pa.add_argument("--trace-tol", type=float, default=1e-6)

    s = sub.add_parser("scaling", help="sharded-SpMM scaling efficiency")
    s.add_argument("--dataset", default="Barcelona")
    s.add_argument("--batch", type=int, default=8)
    s.add_argument("--layout", choices=["coo", "ell"], default="coo")

    args = p.parse_args(argv)
    dtype = _setup_platform(args.tpu)

    if args.cmd == "unweighted":
        from ..utils.config import UnweightedConfig
        from .unweighted import run_paper_suite

        cfg = UnweightedConfig(mode=args.mode, k=args.k, Q=args.Q,
                               tol=args.tol, order=args.order,
                               rescore_every=args.rescore_every,
                               rescore_frac=args.rescore_frac,
                               fused_steps=args.fused_steps)
        run_paper_suite(cfg, out_dir=args.out_dir,
                        collections=tuple(args.collections),
                        datasets=args.datasets or None, dtype=dtype,
                        gkb_only=args.gkb_only, force=args.force)
    elif args.cmd == "budget":
        from .unweighted import run_budget_sweep

        run_budget_sweep(args.datasets, args.budgets, args.search_spaces,
                         mode=args.mode, tol=args.tol, out_dir=args.out_dir,
                         dtype=dtype, force=args.force)
    elif args.cmd == "weighted":
        from ..utils.config import WeightedConfig
        from .weighted import run_paper_suite

        cfg = WeightedConfig(fun=args.fun, use_hessian=args.hessian,
                             maxiter=args.maxiter,
                             methods=tuple(args.methods))
        run_paper_suite(cfg, out_dir=args.out_dir, countries=args.countries,
                        dtype=dtype)
    elif args.cmd == "trace":
        from .trace_bench import run

        run(out_dir=args.out_dir, dtype=dtype)
    elif args.cmd == "parity":
        from .parity import (
            run_expmv_parity,
            run_trace_f32_lane,
            run_trace_tight,
        )

        run_expmv_parity(out_dir=args.out_dir,
                         dense_cutoff=args.dense_cutoff)
        run_trace_tight(out_dir=args.out_dir, tol=args.trace_tol)
        run_trace_f32_lane(out_dir=args.out_dir)
    elif args.cmd == "scaling":
        import json

        from ..graphs.io import load_transport
        from ..graphs.preprocess import preprocess_unweighted
        from .scaling import measure_sharded_spmm, scaling_efficiency

        A = preprocess_unweighted(load_transport(args.dataset))
        res = measure_sharded_spmm(A, b=args.batch, dtype=dtype,
                                   layout=args.layout)
        eff = scaling_efficiency(res)
        print(json.dumps({
            "dataset": args.dataset,
            "layout": args.layout,
            "rates_nnzb_per_s": {str(d): r for d, (t, r) in res.items()},
            "efficiency": {str(d): e for d, e in eff.items()},
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
