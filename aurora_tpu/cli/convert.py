"""Checkpoint conversion CLI.

Parity: `xtuner convert pth_to_hf` (src/xtuner/xtuner/tools/
model_converters/pth_to_hf.py) and the to_hf save formats
(model/aurora.py:295-597): take an orbax training checkpoint (or an
xtuner-format dir) and write xtuner / huggingface-llava layouts.

  python -m aurora_tpu.cli.convert --src runs/exp1/checkpoints \
      --ref_model <xtuner dir for configs> --dst out/ --format xtuner
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True,
                   help="orbax checkpoint dir (training) or xtuner dir")
    p.add_argument("--ref_model", default=None,
                   help="xtuner dir providing configs when --src is orbax")
    p.add_argument("--dst", required=True)
    p.add_argument("--format", default="xtuner",
                   choices=["xtuner", "huggingface", "official"])
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    from aurora_tpu.models.export import (export_hf_llava,
                                          export_xtuner_dir)
    from aurora_tpu.train.checkpoint import latest_step, restore_checkpoint

    if latest_step(args.src) is not None:  # orbax training checkpoint
        assert args.ref_model, "--ref_model needed to size the pytree"
        from aurora_tpu.cli.infer import load_model
        params, acfg, tokenizer = load_model(args.ref_model,
                                             dtype=jnp.float32)
        from aurora_tpu.train.trainer import (TrainConfig,
                                              init_train_state,
                                              make_optimizer)
        state = init_train_state(params, TrainConfig())
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        state = restore_checkpoint(args.src, abstract, step=args.step)
        params = state.params
    else:
        from aurora_tpu.cli.infer import load_model
        params, acfg, tokenizer = load_model(args.src, dtype=jnp.float32)

    if args.format == "xtuner":
        export_xtuner_dir(params, acfg.llm, acfg.vit, acfg.projector,
                          args.dst, tokenizer=tokenizer)
    elif args.format == "official":
        from aurora_tpu.models.export import export_official_llava
        export_official_llava(params, acfg.llm, acfg.vit, acfg.projector,
                              args.dst,
                              visual_select_layer=acfg.visual_select_layer)
    else:
        export_hf_llava(params, acfg.llm, acfg.vit, acfg.projector,
                        args.dst)
    print(f"wrote {args.format} checkpoint to {args.dst}")


if __name__ == "__main__":
    main()
