from aurora_tpu.parallel.mesh import (MeshConfig, create_mesh,
                                      llama_param_specs, vit_param_specs,
                                      aurora_param_specs, shard_pytree)

__all__ = ["MeshConfig", "create_mesh", "llama_param_specs",
           "vit_param_specs", "aurora_param_specs", "shard_pytree"]
