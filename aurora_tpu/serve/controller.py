"""Multi-replica serving: data-parallel engines over multiple devices.

Parity: sglang's ControllerMulti (src/sglang/python/sglang/srt/managers/
controller_multi.py:1-206 — one ControllerSingle + TP group per DP
replica, round-robin / shortest-queue dispatch) and the multi-node
launch_tp_servers path (srt/server.py:313-334).

TPU-native redesign: no process tree, no ZMQ. Each replica is a ServeEngine
whose params and KV buffers are pinned to ONE device (jax.device_put);
XLA dispatch is async, so a single host thread stepping the replicas in
turn keeps every chip busy — replica i's step launches and returns while
replica j's previous step is still running on its chip. Dispatch policies
match the reference: round_robin | shortest_queue.

Multi-host deployments initialize `jax.distributed` first
(aurora_tpu.parallel.distributed.init_distributed) and run one controller
per host over its local devices; a front-end balancer spreads HTTP across
hosts (the reference's multi-node story is the same shape:
tp_worker.py:917-934).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax

from aurora_tpu.models.llama import LlamaConfig
from aurora_tpu.serve.engine import EngineConfig, ServeEngine
from aurora_tpu.serve.scheduler import Request


class MultiReplicaController:
    """N data-parallel ServeEngine replicas; each replica spans
    `ecfg.tp` devices (tp=1 → one engine per device, as before)."""

    def __init__(self, params, cfg: LlamaConfig,
                 ecfg: EngineConfig = EngineConfig(), *,
                 devices: Optional[List[Any]] = None,
                 dispatch: str = "shortest_queue",
                 embed_fn=None, tokenizer=None):
        devices = devices or jax.local_devices()
        assert dispatch in ("round_robin", "shortest_queue")
        self.dispatch = dispatch
        self.engines: List[ServeEngine] = []
        tp = ecfg.tp
        if len(devices) < tp:
            raise ValueError(f"tp={tp} needs {tp} devices per replica, "
                             f"have {len(devices)}")
        groups = [devices[i:i + tp]
                  for i in range(0, len(devices) - tp + 1, tp)]
        for grp in groups:
            if tp == 1:
                dev_params = jax.device_put(params, grp[0])
                self.engines.append(
                    ServeEngine(dev_params, cfg, ecfg,
                                embed_fn=embed_fn, tokenizer=tokenizer))
            else:
                # the engine shards params over its own tp mesh
                self.engines.append(
                    ServeEngine(params, cfg, ecfg, embed_fn=embed_fn,
                                tokenizer=tokenizer, devices=grp))
        self._rr = 0
        self._where: Dict[str, int] = {}

    # -- dispatch (controller_multi.py round_robin_scheduler /
    #    shortest_queue_scheduler parity) --------------------------------

    def _pick(self) -> int:
        if self.dispatch == "round_robin":
            i = self._rr
            self._rr = (self._rr + 1) % len(self.engines)
            return i
        loads = [len(e.sched.waiting) + len(e.sched.running)
                 for e in self.engines]
        return int(min(range(len(loads)), key=loads.__getitem__))

    def add_request(self, req: Request) -> None:
        i = self._pick()
        self._where[req.rid] = i
        self.engines[i].add_request(req)

    def abort(self, rid: str) -> bool:
        i = self._where.pop(rid, None)
        if i is not None:
            return self.engines[i].abort(rid)
        return any(e.abort(rid) for e in self.engines)

    def has_work(self) -> bool:
        return any(e.has_work() for e in self.engines)

    def step(self) -> List[Request]:
        """One controller iteration: step every busy replica. Steps are
        asynchronous XLA dispatches per device, so replicas overlap."""
        done: List[Request] = []
        for e in self.engines:
            if e.has_work():
                done.extend(e.step())
        for req in done:
            self._where.pop(req.rid, None)
        return done

    def fail_running(self) -> List[Request]:
        out = []
        for e in self.engines:
            out.extend(e.fail_running())
        for req in out:
            self._where.pop(req.rid, None)
        return out

    def flush_cache(self) -> int:
        return sum(e.flush_cache() for e in self.engines)

    def update_weights(self, new_params):
        """Swap weights on every replica ATOMICALLY across the fleet:
        check all replicas are idle first, then commit; if any commit
        still fails, roll the committed replicas back — a deployment must
        never serve two different models behind one dispatcher."""
        busy = [i for i, e in enumerate(self.engines) if e.sched.running]
        if busy:
            return False, f"replicas {busy} have requests in flight"
        old = [e.params for e in self.engines]
        committed = []
        for i, e in enumerate(self.engines):
            # hand the host tree straight to the engine: update_weights
            # device_puts each leaf onto the LIVE leaf's own sharding —
            # pre-placing the whole tree on one device would force a
            # full unsharded model copy per replica (OOM for tp>1
            # replicas whose model only fits sharded)
            ok, msg = e.update_weights(new_params)
            if not ok:
                for j in committed:  # rollback
                    self.engines[j].params = old[j]
                    self.engines[j].flush_cache()
                return False, f"replica {i}: {msg} (rolled back)"
            committed.append(i)
        return True, "weights updated on all replicas"

    def decode_stats(self) -> Dict[str, float]:
        stats = [e.decode_stats() for e in self.engines]
        return {"running": sum(s["running"] for s in stats),
                "queued": sum(s["queued"] for s in stats),
                "slot_usage": round(sum(s["slot_usage"]
                                        for s in stats) / len(stats), 4),
                "gen_tokens_per_s": round(sum(s["gen_tokens_per_s"]
                                              for s in stats), 1)}

    def check_memory(self) -> Dict[str, int]:
        mems = [e.check_memory() for e in self.engines]
        return {k: sum(m[k] for m in mems) for k in mems[0]}

    @property
    def sched(self):
        """API-layer compatibility (streaming scans running requests)."""
        class _Agg:
            def __init__(self, engines):
                self.engines = engines

            @property
            def running(self):
                out = []
                for e in self.engines:
                    out.extend(e.sched.running)
                return out
        return _Agg(self.engines)

    @property
    def ecfg(self) -> EngineConfig:
        return self.engines[0].ecfg

    @property
    def cfg(self) -> LlamaConfig:
        return self.engines[0].cfg
