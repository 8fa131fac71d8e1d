"""Experiment drivers on tiny synthetic data: schema, checkpoint/resume."""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_graph
from krylov_robustness_tpu.experiments.unweighted import run_dataset
from krylov_robustness_tpu.utils.checkpoint import GreedyCheckpoint
from krylov_robustness_tpu.utils.config import UnweightedConfig
from krylov_robustness_tpu.utils.logging import ResultLog


def small_graph():
    import scipy.sparse as sp

    A = random_graph(70, 0.08, seed=99)
    lil = A.tolil()
    for i in range(69):
        lil[i, i + 1] = 1.0
        lil[i + 1, i] = 1.0
    return sp.csr_matrix(lil)


def test_run_dataset_schema(tmp_path):
    A = small_graph()
    cfg = UnweightedConfig(k=3, Q=15, mode="break", miobi_eigs=8)
    log = ResultLog(tmp_path, "t")
    out = run_dataset(A, "tiny", cfg, log, verbose=False)
    assert len(log) == 3  # GKB + MIOBI + EIGENV rows
    methods = {r["method"] for r in log.rows}
    assert methods == {"GREEDY_KRYLOV_BREAK", "MIOBI", "EIGENV"}
    assert log.csv_path.exists() and log.jsonl_path.exists()
    # greedy at least matches the baselines on its own metric
    gkb = next(r for r in log.rows if r["method"].startswith("GREEDY"))
    for r in log.rows:
        assert gkb["tr_variation"] <= r["tr_variation"] + 1e-9
    assert len(out["intersections"]) == 4


def test_greedy_checkpoint_resume(tmp_path):
    import scipy.sparse as sp

    from krylov_robustness_tpu.graphs.centrality import compute_centrality
    from krylov_robustness_tpu.ops.sparse import CooMatrix
    from krylov_robustness_tpu.optimize.greedy import greedy_krylov

    A = small_graph()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")

    full = greedy_krylov(A, 4, 12, c, order="min", tol=1e-8, mode="break")

    ckpt_path = tmp_path / "ck.json"
    ck = GreedyCheckpoint(ckpt_path)
    # simulate a run killed after 2 steps: save state manually from the full run
    ck.save("tiny", 2, [tuple(e) for e in full.edges[:2]],
            float(np.sum(full.per_step_delta[:2])),
            extra={"deltas": full.per_step_delta[:2].tolist(),
                   "iters": full.per_step_iters[:2].tolist()})
    resumed = greedy_krylov(A, 4, 12, c, order="min", tol=1e-8, mode="break",
                            checkpoint=ck, dataset="tiny")
    np.testing.assert_array_equal(resumed.edges, full.edges)
    np.testing.assert_allclose(resumed.rob_variation, full.rob_variation,
                               rtol=1e-10)
    assert not ckpt_path.exists()  # cleared on completion


def test_resultlog_keyed_resume(tmp_path):
    """Keyed rows: same-day re-runs replace matching cells instead of
    duplicating them, and has() reports completed cells for driver skips."""
    cols = ["dataset", "method", "score"]
    log = ResultLog(tmp_path, "kr", columns=cols, key=("dataset", "method"))
    log.append(dataset="a", method="tuning", score=1.0)
    log.append(dataset="a", method="rewire", score=2.0)
    log.append(dataset="a", method="tuning", score=3.0)  # replaces row 1
    assert len(log) == 2
    assert [r["score"] for r in log.rows] == [2.0, 3.0]

    # resumed same-day instance sees the persisted rows
    log2 = ResultLog(tmp_path, "kr", columns=cols, key=("dataset", "method"))
    assert len(log2) == 2
    assert log2.has(dataset="a", method="rewire")
    assert not log2.has(dataset="b", method="rewire")
    log2.append(dataset="a", method="rewire", score=9.0)
    assert len(log2) == 2  # replaced, not appended

    # unkeyed log keeps duplicate rows (legacy behavior)
    log3 = ResultLog(tmp_path, "unkeyed", columns=cols)
    log3.append(dataset="a", method="x", score=0.0)
    log3.append(dataset="a", method="x", score=0.0)
    assert len(log3) == 2 and not log3.has(dataset="a", method="x")


def test_run_paper_suite_force_rerun(tmp_path, monkeypatch):
    """--force bypasses the completed-row resume skip and regenerates rows
    in place (keyed replace) — the wall-time-refresh path."""
    import krylov_robustness_tpu.experiments.unweighted as uw

    A = small_graph()
    calls = {"n": 0}

    def fake_load(name):
        calls["n"] += 1
        return A

    monkeypatch.setattr(uw, "load_transport", fake_load)
    monkeypatch.setattr(uw, "_misc_path_exists", lambda name: False)
    cfg = UnweightedConfig(k=2, Q=10, mode="break", miobi_eigs=8)

    uw.run_paper_suite(cfg, out_dir=tmp_path, datasets=["mock"])
    assert calls["n"] == 1
    log = ResultLog(tmp_path, "unweighted_break", key=("method", "dataset"))
    assert len(log) == 3

    # resume skip: dataset complete -> loader never invoked
    uw.run_paper_suite(cfg, out_dir=tmp_path, datasets=["mock"])
    assert calls["n"] == 1

    # force: reruns and keyed-replaces (no duplicate rows)
    uw.run_paper_suite(cfg, out_dir=tmp_path, datasets=["mock"], force=True)
    assert calls["n"] == 2
    log = ResultLog(tmp_path, "unweighted_break", key=("method", "dataset"))
    assert len(log) == 3


def test_resultlog_seed_ignores_sibling_suites(tmp_path):
    """Regression (round-1 data-integrity bug, utils/logging.py:45): suite
    `foo` must never be seeded from `foo_bar`/`foo_intersections` artifacts
    whose stem shares the prefix — only date-shaped stems of the exact suite
    name qualify."""
    import csv

    icols = ["dataset", "overlap"]
    old_sibling = tmp_path / "results_foo_intersections_2000-01-02.csv"
    with open(old_sibling, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=icols)
        w.writeheader()
        w.writerow({"dataset": "a", "overlap": 3})

    cols = ["dataset", "method", "score"]
    old_own = tmp_path / "results_foo_2000-01-01.csv"
    with open(old_own, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerow({"dataset": "a", "method": "tuning", "score": 1.0})

    # the sibling sorts lexicographically after old_own; the buggy glob
    # picked it — the fixed one must seed from old_own
    log = ResultLog(tmp_path, "foo", columns=cols, key=("dataset", "method"))
    assert len(log) == 1
    assert log.has(dataset="a", method="tuning")
    assert all(r.get("method") for r in log.rows)  # no blank foreign rows

    # with no same-suite prior at all, no seeding happens
    log2 = ResultLog(tmp_path, "bar", columns=cols, key=("dataset", "method"))
    (tmp_path / "results_bar_intersections_2000-01-02.csv").write_text(
        "dataset,overlap\na,3\n")
    log3 = ResultLog(tmp_path, "bar", columns=cols, key=("dataset", "method"))
    assert len(log2) == 0 and len(log3) == 0


def test_greedy_checkpoint_fingerprint(tmp_path):
    """A checkpoint cut under different sweep parameters must not resume."""
    p = tmp_path / "ck.json"
    ck = GreedyCheckpoint(p, fingerprint={"k": 50, "Q": 250, "tol": 1e-6})
    ck.save("g", 2, [(0, 1), (1, 2)], -0.5)
    assert ck.load("g") is not None
    # same params → resumes; changed k → ignored
    same = GreedyCheckpoint(p, fingerprint={"k": 50, "Q": 250, "tol": 1e-6})
    assert same.load("g") is not None
    changed = GreedyCheckpoint(p, fingerprint={"k": 10, "Q": 250, "tol": 1e-6})
    assert changed.load("g") is None
    # legacy checkpoint (no fingerprint stored) + fingerprinted loader → ignored
    legacy = GreedyCheckpoint(p)
    legacy.save("g", 1, [(0, 1)], -0.1)
    assert same.load("g") is None
    # unfingerprinted loader keeps legacy behavior
    assert legacy.load("g") is not None


def test_resultlog_cross_day_resume(tmp_path):
    """A table left by an earlier-day session seeds today's table, so
    multi-day suites skip completed cells instead of redoing them."""
    import csv

    cols = ["dataset", "method", "score"]
    # simulate yesterday's artifact by hand (ResultLog stamps today)
    old = tmp_path / "results_kr_2000-01-01.csv"
    with open(old, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerow({"dataset": "a", "method": "tuning", "score": 1.0})

    log = ResultLog(tmp_path, "kr", columns=cols, key=("dataset", "method"))
    assert log.has(dataset="a", method="tuning")
    assert not log.has(dataset="a", method="rewire")
    log.append(dataset="a", method="rewire", score=2.0)
    assert len(log) == 2
    # today's CSV holds both the carried-over and the new row
    with open(log.csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert {r["method"] for r in rows} == {"tuning", "rewire"}
    # yesterday's artifact is untouched
    with open(old, newline="") as f:
        assert len(list(csv.DictReader(f))) == 1


def test_budget_sweep_rows_have_positive_times(tmp_path, monkeypatch):
    """Regression (round-1 weak item): budget rows froze with time=0.0 in
    the goldens; every logged budget row must carry a real per-step time."""
    import krylov_robustness_tpu.experiments.unweighted as uw

    A = small_graph()
    monkeypatch.setattr(uw, "load_transport", lambda name: A)
    _, log = uw.run_budget_sweep(
        ["toy"], budgets=[2, 4], search_spaces=[6], mode="break",
        tol=1e-6, out_dir=tmp_path,
    )
    rows = log.rows if hasattr(log, "rows") else None
    import csv
    from pathlib import Path

    csv_path = sorted(Path(tmp_path).glob("results_unweighted_break_budget_*.csv"))[-1]
    with open(csv_path) as f:
        data = list(csv.DictReader(f))
    assert len(data) == 2
    for r in data:
        assert float(r["time"]) > 0.0
        assert float(r["tr_variation"]) < 0.0


def test_greedy_checkpoint_resume_with_score_reuse(tmp_path):
    """Resume + rescore_every>1: the resumed sweep starts with no stale
    scores (full rescore on its first step) and must still reproduce the
    uninterrupted full-rescore sweep edge-for-edge."""
    from krylov_robustness_tpu.graphs.centrality import compute_centrality
    from krylov_robustness_tpu.ops.sparse import CooMatrix
    from krylov_robustness_tpu.optimize.greedy import greedy_krylov

    A = small_graph()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")

    full = greedy_krylov(A, 6, 12, c, order="min", tol=1e-8, mode="break")

    ck = GreedyCheckpoint(tmp_path / "ck.json")
    ck.save("tiny", 3, [tuple(e) for e in full.edges[:3]],
            float(np.sum(full.per_step_delta[:3])),
            extra={"deltas": full.per_step_delta[:3].tolist(),
                   "iters": full.per_step_iters[:3].tolist()})
    resumed = greedy_krylov(A, 6, 12, c, order="min", tol=1e-8, mode="break",
                            checkpoint=ck, dataset="tiny", rescore_every=3,
                            rescore_frac=0.25)
    np.testing.assert_array_equal(resumed.edges, full.edges)
    np.testing.assert_allclose(resumed.rob_variation, full.rob_variation,
                               rtol=1e-10)


def test_greedy_checkpoint_resume_fused(tmp_path):
    """Resume × fused blocks: a sweep killed mid-budget must resume through
    `_greedy_loop_fused`'s replay path (re-apply edits, shrink the search
    space) and reproduce the uninterrupted fused sweep edge-for-edge."""
    import scipy.sparse as sp

    from krylov_robustness_tpu.graphs.centrality import compute_centrality
    from krylov_robustness_tpu.ops.sparse import CooMatrix
    from krylov_robustness_tpu.optimize.greedy import greedy_krylov

    # past the dense cutoff so the fused lane actually engages
    n = 150
    rng = np.random.default_rng(23)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 80)])
    dst = np.concatenate([i + 1, np.zeros(80, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 80)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")

    full = greedy_krylov(A, 6, 20, c, order="min", tol=1e-8, mode="break",
                         fused_steps=3)

    ckpt_path = tmp_path / "ck.json"
    ck = GreedyCheckpoint(ckpt_path)
    ck.save("tiny", 2, [tuple(e) for e in full.edges[:2]],
            float(np.sum(full.per_step_delta[:2])),
            extra={"deltas": full.per_step_delta[:2].tolist(),
                   "iters": full.per_step_iters[:2].tolist()})
    resumed = greedy_krylov(A, 6, 20, c, order="min", tol=1e-8, mode="break",
                            checkpoint=ck, dataset="tiny", fused_steps=3)
    np.testing.assert_array_equal(resumed.edges, full.edges)
    np.testing.assert_allclose(resumed.rob_variation, full.rob_variation,
                               rtol=1e-10)
    assert (full.A_new != resumed.A_new).nnz == 0
    assert not ckpt_path.exists()
