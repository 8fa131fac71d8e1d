#!/usr/bin/env python
"""VERDICT r3 item 6 demonstration: candidate-score reuse on the full-E
regime. Runs the Sydney break Q=10000/'mult' sweep twice on TPU — full
per-step rescoring (the reference protocol) vs rescore_every=5 — with
identical tolerances/shift, and records wall times + the complete edge
sequences to results/score_reuse_sydney.json. Pass --dataset/--Q to vary.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from krylov_robustness_tpu.funm.normest import normest2_host
from krylov_robustness_tpu.graphs.centrality import compute_centrality_host
from krylov_robustness_tpu.graphs.io import load_misc, load_transport
from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
from krylov_robustness_tpu.optimize.greedy import greedy_krylov

p = argparse.ArgumentParser()
p.add_argument("--dataset", default="Sydney")
p.add_argument("--Q", type=int, default=10000)
p.add_argument("--k", type=int, default=50)
p.add_argument("--order", default="mult")
p.add_argument("--mode", default="break")
p.add_argument("--rescore-every", type=int, default=5)
args = p.parse_args()

try:
    A = preprocess_unweighted(load_transport(args.dataset))
except Exception:
    A = preprocess_unweighted(load_misc(args.dataset))
n = A.shape[0]
lognrm = float(normest2_host(A, tol=1e-2))
sigma = lognrm if lognrm > 20.0 else 0.0
tol_abs = 1e-6 * float(np.exp(min(lognrm - sigma, 709.0)))
cent = compute_centrality_host(A, "eig")
print(f"{args.dataset}: n={n} Q={args.Q} k={args.k} order={args.order} "
      f"sigma={sigma:.2f}", flush=True)

out = {"dataset": args.dataset, "n": n, "Q": args.Q, "k": args.k,
       "order": args.order, "mode": args.mode, "sigma": sigma}
for tag, re_every in (("full", 1), (f"reuse{args.rescore_every}",
                                    args.rescore_every)):
    t0 = time.time()
    r = greedy_krylov(
        A, args.k, args.Q, cent, order=args.order, tol=tol_abs,
        mode=args.mode, dtype=jnp.float32, shift=sigma,
        rescore_every=re_every,
    )
    wall = time.time() - t0
    out[tag] = {
        "wall_s": round(wall, 1),
        "rob_variation": float(r.rob_variation),
        "edges": [[int(i), int(j)] for i, j in r.edges],
        "median_step_s": float(np.median(r.per_step_time)),
    }
    print(f"  {tag}: wall={wall:.1f}s rob={r.rob_variation:.6e} "
          f"median_step={np.median(r.per_step_time):.2f}s", flush=True)

same = out["full"]["edges"] == out[f"reuse{args.rescore_every}"]["edges"]
out["identical_picks"] = same
out["speedup"] = round(
    out["full"]["wall_s"] / out[f"reuse{args.rescore_every}"]["wall_s"], 2)
path = Path("results") / f"score_reuse_{args.dataset}.json"
path.write_text(json.dumps(out, indent=1))
print(f"identical_picks={same} speedup={out['speedup']}x -> {path}")
