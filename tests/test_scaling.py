"""Scaling harness smoke test on the virtual CPU mesh."""

import numpy as np

from helpers import random_graph
from krylov_robustness_tpu.experiments.scaling import (
    measure_sharded_spmm,
    scaling_efficiency,
)


def test_scaling_harness_runs():
    A = random_graph(512, 0.03, seed=7, weighted=True)
    res = measure_sharded_spmm(A, mesh_sizes=[1, 2, 4], b=4, iters=5)
    assert set(res) == {1, 2, 4}
    eff = scaling_efficiency(res)
    assert eff[1] == 1.0
    for D, e in eff.items():
        assert e > 0
