"""True multi-process jax.distributed exercise (BASELINE config 5).

Two local processes, a TCP coordinator, 4 virtual CPU devices each ->
one 8-device global mesh; the sharded batch-verify pipeline runs SPMD
across both processes (this is the DCN-path analog that the
single-process 8-device dryrun cannot cover)."""

import os
import socket
import subprocess
import sys


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_verify():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo", env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"MP_OK pid={i} procs=2 devs=8 local_devs=4" in out, out[-800:]
