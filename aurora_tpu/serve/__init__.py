from aurora_tpu.serve.kv_pool import KVPool, SlotAllocator
from aurora_tpu.serve.radix_cache import RadixCache
from aurora_tpu.serve.scheduler import (Request, Scheduler, SchedulePolicy)
from aurora_tpu.serve.engine import ServeEngine, EngineConfig
from aurora_tpu.serve.runtime import Runtime

__all__ = ["KVPool", "SlotAllocator", "RadixCache", "Request",
           "Scheduler", "SchedulePolicy", "ServeEngine", "EngineConfig",
           "Runtime"]
