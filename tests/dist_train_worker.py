"""Worker for tests/test_distributed.py: one rank of a 2-process CPU
jax.distributed train step. Launched as a subprocess with torchrun-style
env (MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE — the contract
parallel/distributed.py supports, matching the reference's launcher env,
entry_point.py:115-265). Env vars (JAX_PLATFORMS=cpu, the forced device
count, the TPU-claim opt-out) must be set by the PARENT: sitecustomize
imports jax before this file's first line runs.

Prints one "RESULT ..." line the parent parses: global device count,
per-rank loss (must agree across ranks — the psum'd loss is replicated)
and a post-step trainable-param checksum (must agree — identical seeds +
replicated grads ⇒ identical updates)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from aurora_tpu.parallel.distributed import init_distributed

ok = init_distributed()
assert ok, "init_distributed() returned False under WORLD_SIZE=2"

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()

from aurora_tpu.models.aurora import AuroraConfig
from aurora_tpu.models.llama import init_llama_params
from aurora_tpu.models.projector import init_projector_params
from aurora_tpu.models.vit import init_vit_params
from aurora_tpu.train.trainer import (TrainConfig, init_train_state,
                                      make_optimizer, make_train_step)

cfg = AuroraConfig.tiny()
tcfg = TrainConfig(remat=False, max_steps=4)
keys = jax.random.split(jax.random.PRNGKey(0), 3)
params = {
    "visual_encoder": init_vit_params(keys[0], cfg.vit),
    "projector": init_projector_params(keys[1], cfg.projector),
    "llm": init_llama_params(keys[2], cfg.llm),
}
opt = make_optimizer(params, tcfg)
state = init_train_state(params, tcfg)

devs = np.array(jax.devices())            # 2 procs x 2 local = 4
mesh = Mesh(devs.reshape(-1), ("dp",))
repl = NamedSharding(mesh, P())
dp = NamedSharding(mesh, P("dp"))

# params/opt-state replicated (every process holds identical values —
# same PRNG seed), batch dp-sharded with each process contributing its
# LOCAL rows only (per-process batch placement, the thing a single-
# process mesh test cannot cover)
state = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        repl, np.asarray(x)), state)

rank = jax.process_index()
rng = np.random.default_rng(100 + rank)   # different data per rank
B_local, T = 2, 16
ids = rng.integers(3, 250, size=(B_local, T))
local = {
    "input_ids": ids,
    "labels": ids,
    "attention_mask": np.ones((B_local, T), bool),
}
batch = {k: jax.make_array_from_process_local_data(dp, np.asarray(v))
         for k, v in local.items()}

step = jax.jit(make_train_step(cfg, tcfg, opt))
state, metrics = step(state, batch)
state, metrics = step(state, batch)

loss = float(jax.device_get(metrics["loss"]))
# fetch a replicated param leaf; its checksum must agree across ranks
leaf = jax.device_get(state.params["llm"]["embed_tokens"])
checksum = float(np.sum(np.asarray(leaf, np.float64)))
print(f"RESULT devices={jax.device_count()} rank={rank} "
      f"loss={loss:.6f} checksum={checksum:.6f}", flush=True)
