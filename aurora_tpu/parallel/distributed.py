"""Multi-host (multi-slice) runtime initialization.

Parity: the reference's torch.distributed/NCCL bring-up — mmengine
init_dist (env_cfg dist_cfg backend='nccl'), xtuner_lite init_dist +
device-mesh setup (parallel/setup.py:15-70), and sglang's multi-node
launch_tp_servers (server.py:313-334). On TPU the analog is ONE call:
`jax.distributed.initialize` connects every host's runtime, after which
`jax.devices()` spans the whole slice/pod and meshes built from it carry
DCN traffic between slices and ICI within them.

Environment contracts supported (first match wins):
  * TPU pods / GKE: no args — jax.distributed.initialize() autodetects.
  * torchrun-style: MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE
    (the reference's launchers export exactly these).
  * explicit kwargs.

Single-process runs are a no-op (returns False) so every entry point can
call this unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     log=print) -> bool:
    """Initialize jax.distributed when a multi-process env is detected.
    Returns True if distributed mode was initialized."""
    import jax

    # "already initialized?" must NOT go through jax.process_count():
    # that call initializes the local XLA backend as a side effect, after
    # which jax.distributed.initialize() below raises ("must be called
    # before any JAX computations") and the except turns every multi-host
    # launch into a silent single-host run. Check the distributed
    # client's own state instead (backend-free).
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return True  # already initialized
    except ImportError:  # private API moved: fall through, initialize()
        pass             # itself raises cleanly on double-init

    if coordinator_address is None and "MASTER_ADDR" in os.environ \
            and "WORLD_SIZE" in os.environ:
        world = int(os.environ["WORLD_SIZE"])
        if world > 1:
            coordinator_address = (f"{os.environ['MASTER_ADDR']}:"
                                   f"{os.environ.get('MASTER_PORT', 8476)}")
            num_processes = world
            process_id = int(os.environ.get("RANK", 0))

    in_pod = any(k in os.environ for k in
                 ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"))
    if coordinator_address is None and not in_pod:
        return False  # single host, single process

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        else:
            jax.distributed.initialize()  # TPU pod autodetect
        log(f"[distributed] process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.device_count()} global devices")
        return True
    except Exception as e:  # noqa: BLE001
        # the environment EXPLICITLY requested multi-process (WORLD_SIZE
        # >1 or a pod env): swallowing here would let N processes each
        # run single-host — training on identical data at 1/N the global
        # batch while clobbering each other's checkpoints. Fail loudly.
        log(f"[distributed] initialize failed ({e})")
        raise RuntimeError(
            "multi-process launch requested "
            f"(coordinator={coordinator_address!r}, in_pod={in_pod}) but "
            "jax.distributed.initialize failed — refusing to fall back "
            "to a silent single-host run") from e
