"""2-process ``jax.distributed`` smoke test (SURVEY.md §5.8): the multi-host
init path must not be the one untested line that breaks on a real pod.

Spawns two CPU processes with a localhost coordinator; each runs
``maybe_init_distributed`` and a psum over the 2-process 'rows' mesh
(scripts/_dist_child.py).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_two_process_distributed_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            # the ambient axon sitecustomize (on PYTHONPATH) initializes the
            # remote-TPU backend at interpreter startup, before the child's
            # own config runs — strip it so the child is a clean CPU process
            PYTHONPATH=str(REPO),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "scripts" / "_dist_child.py")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert any("psum over 2-process mesh ok" in o for o in outs)
    # the DCN-analog step: a row-sharded SpMM whose all_gather crosses the
    # process boundary, validated per-shard on both processes
    assert all("2-process row-sharded SpMM ok" in o for o in outs)
