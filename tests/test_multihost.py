"""Multi-host execution tests: REAL process boundaries.

The reference never scales past one device (SURVEY.md §3.5 "no
multi-process, multi-device, or multi-node control flow anywhere");
these tests run the framework's actual `jax.distributed` bootstrap
(parallel/mesh.py initialize_distributed + scripts/launch_multihost.py)
with 2 OS processes x 4 virtual CPU devices each, joined by gloo
cross-process collectives — the same control flow a v5e pod slice uses
over DCN — and check (a) the decode transcript is IDENTICAL to a
single-process run and (b) a weak-scaling decode efficiency number is
produced (recorded in REPORT.md; CPU-simulated, so the number validates
the rig, not ICI bandwidth).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "scripts", "launch_multihost.py")
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _launch(nproc: int, out: str):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    r = subprocess.run(
        [sys.executable, LAUNCHER, "--simulate", str(nproc),
         "--devices-per-proc", "4", "--", WORKER, out],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_decode_parity_and_scaling(tmp_path):
    one = _launch(1, str(tmp_path / "p1.json"))
    two = _launch(2, str(tmp_path / "p2.json"))

    assert one["num_processes"] == 1 and one["global_devices"] == 4
    assert two["num_processes"] == 2 and two["global_devices"] == 8

    # Weak scaling: 2 hosts run 2x the batch. Per-sequence greedy
    # transcripts must be identical regardless of process count (the
    # first PER_HOST_BATCH sequences share the same seeded prompts).
    t1 = np.asarray(one["transcript"])
    t2 = np.asarray(two["transcript"])
    assert t2.shape[0] == 2 * t1.shape[0]
    np.testing.assert_array_equal(t2[: t1.shape[0]], t1)

    eff = two["tokens_per_s"] / (2.0 * one["tokens_per_s"])
    print(f"2-process weak-scaling decode efficiency: {eff:.2f} "
          f"({two['tokens_per_s']:.1f} vs {one['tokens_per_s']:.1f} tok/s)")
    # CPU-simulated hosts over loopback-gloo validate the RIG, not the
    # fabric. The efficiency threshold only means something when the
    # host can actually run both processes concurrently; on fewer cores
    # than processes the runs serialize and the number records overhead.
    assert eff > 0.0
    if (os.cpu_count() or 1) >= 8:
        assert eff > 0.25
