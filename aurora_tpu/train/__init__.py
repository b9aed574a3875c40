from aurora_tpu.train.trainer import (TrainConfig, TrainState,
                                      init_train_state, make_optimizer,
                                      make_train_step)
from aurora_tpu.train.metrics import megatron_tflops_per_device, Throughput

__all__ = ["TrainConfig", "TrainState", "init_train_state",
           "make_optimizer", "make_train_step",
           "megatron_tflops_per_device", "Throughput"]
