#!/usr/bin/env python
"""Multi-host launcher.

Two modes:

1. `python scripts/launch_multihost.py -- prog.py args...`
   On a Cloud TPU pod slice: run the SAME command on every host (gcloud
   `--worker=all`, slurm, mpi, ...); each process calls
   `initialize_distributed()` with auto-detection and runs `prog.py`
   with `jax.devices()` spanning the slice.

2. `python scripts/launch_multihost.py --simulate N [--devices-per-proc D]
   -- prog.py args...`
   Local simulation: spawn N processes on this machine, each a
   D-device virtual CPU host, wired together through a local
   coordinator (gloo cross-process collectives). This is the
   no-pod-available path for multi-host testing — the same
   `initialize_distributed()` contract, real process boundaries, real
   cross-process collectives, fake ICI. Used by tests/test_multihost.py.

The launched program just needs to call
`flash_attention_tpu.parallel.mesh.initialize_distributed()` before
touching JAX devices; the launcher passes the rendezvous through
FA_TPU_COORDINATOR / FA_TPU_NUM_PROCESSES / FA_TPU_PROCESS_ID.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--simulate", type=int, default=0, metavar="N",
                    help="spawn N local CPU processes instead of "
                         "relying on a pod runtime")
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- prog.py args...")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: launch_multihost.py -- prog.py ...)")

    if not args.simulate:
        # Pod mode: single process per host; jax auto-detects peers.
        from flash_attention_tpu.parallel.mesh import initialize_distributed
        initialize_distributed()
        os.execvp(cmd[0] if cmd[0] != "python" else sys.executable, cmd)

    port = _free_port()
    procs = []
    for pid in range(args.simulate):
        env = dict(
            os.environ,
            FA_TPU_COORDINATOR=f"127.0.0.1:{port}",
            FA_TPU_NUM_PROCESSES=str(args.simulate),
            FA_TPU_PROCESS_ID=str(pid),
            FA_TPU_FORCE_CPU="1",
            XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                       f" --xla_force_host_platform_device_count="
                       f"{args.devices_per_proc}").strip(),
        )
        procs.append(subprocess.Popen([sys.executable, *cmd], env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
