"""Hermetic 2-process jax.distributed smoke (round-3 VERDICT #5).

parallel/distributed.py was dead code beyond process_count==1: the
reference exercises real multi-rank launches via torchrun
(src/xtuner/xtuner/entry_point.py:115-265 exports
MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE). This spawns 2 CPU ranks with
exactly that env, initializes through init_distributed (covering the
init-ordering rule: the client check must not touch the backend), and
runs a REAL sharded train step over a 4-device global mesh where each
process contributes only its local batch rows. Both ranks must see the
same replicated loss and arrive at bit-identical updated params.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_train_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    # bounded by the communicate(timeout=200) below (pytest-timeout is
    # not installed in this image)
    port = _free_port()
    base = dict(os.environ,
                MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
                WORLD_SIZE="2",
                JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen([sys.executable, WORKER],
                              env=dict(base, RANK=str(r)),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for r in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=200)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"
    results = {}
    for r, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith("RESULT ")]
        assert line, out[-2000:]
        kv = dict(tok.split("=") for tok in line[0].split()[1:])
        results[r] = kv
    assert results[0]["devices"] == results[1]["devices"] == "4"
    assert results[0]["rank"] == "0" and results[1]["rank"] == "1"
    # replicated loss and post-step params agree bit-for-bit: the update
    # consumed BOTH processes' batch shards through one psum'd step
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["checksum"] == results[1]["checksum"]
    assert float(results[0]["loss"]) > 0
