"""Training CLI — the `xtuner train` equivalent.

Parity: src/xtuner/xtuner/tools/train.py:127-356 (config-driven training
with stage curriculum, checkpoint/resume, throughput logging) without the
mmengine Runner: stages are dataclass configs
(aurora_tpu.train.configs), the loop is explicit, distribution is the
('dp','fsdp','sp','tp') mesh.

  python -m aurora_tpu.cli.train --stage pretrain \
      --model_path <xtuner dir or 'random:tiny'> \
      --data data.json --image_folder imgs/ \
      --work_dir runs/exp1 --max_steps 100 --mesh dp=1,fsdp=1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp


def parse_mesh(spec: str):
    from aurora_tpu.parallel.mesh import MeshConfig
    kw = {}
    for kv in spec.split(","):
        if kv:
            k, v = kv.split("=")
            kw[k] = int(v)
    return MeshConfig(**kw)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default="pretrain",
                   choices=["pretrain", "vision", "language"])
    p.add_argument("--config", default=None,
                   help="copy-cfg JSON with stage-config overrides "
                        "(the --cfg-options analog); explicit CLI flags "
                        "still win")
    p.add_argument("--model_path", required=True,
                   help="xtuner-format dir, or 'random:tiny' for smoke")
    p.add_argument("--data", required=True, help="llava-format json/jsonl")
    p.add_argument("--image_folder", default="")
    p.add_argument("--work_dir", default="work_dir")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--mesh", default="", help="e.g. dp=2,fsdp=2,sp=1,tp=2")
    p.add_argument("--checkpoint_interval", type=int, default=500)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--pack_max_length", type=int, default=0,
                   help=">0 packs samples to this fused length with "
                        "per-document segment attention (SoftPackerForLlava"
                        " parity; works for multimodal batches)")
    p.add_argument("--cache_dir", default=None,
                   help="cache tokenized datasets here (skips re-"
                        "tokenization across runs)")
    p.add_argument("--wandb_project", default=None,
                   help="mirror metrics to Weights & Biases (optional)")
    p.add_argument("--lora_r", type=int, default=0,
                   help=">0 trains LoRA adapters over a frozen base "
                        "(reference llm_lora, xtuner/model/aurora.py)")
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int4"],
                   help="store the frozen LLM quantized and dequantize "
                        "per-layer in the scan (QLoRA analog; needs "
                        "--lora_r)")
    p.add_argument("--num_workers", type=int, default=2,
                   help="host decode/preprocess threads (DataLoader "
                        "num_workers analog; threads not processes — "
                        "decode releases the GIL and forks would re-run "
                        "the TPU claim)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="in-flight batches (2 = double buffering)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--remat-policy", default=None,
                   help="jax.checkpoint_policies name for selective "
                        "activation checkpointing (e.g. "
                        "dots_with_no_batch_dims_saveable: keep MXU "
                        "outputs, recompute elementwise — ~10%% faster "
                        "steps than full remat at 7B shapes for a "
                        "modest memory cost); default: full remat")
    p.add_argument("--float32", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from aurora_tpu.parallel.distributed import init_distributed
    init_distributed()  # no-op single-host; MASTER_ADDR/TPU-pod autodetect

    from aurora_tpu.data.collate import default_collate_fn
    from aurora_tpu.data.dataset import AuroraDataset, aurora_map_fn
    from aurora_tpu.data.sampler import LengthGroupedSampler
    from aurora_tpu.parallel.mesh import (aurora_param_specs, create_mesh,
                                          shard_pytree)
    from aurora_tpu.train import configs as stage_configs
    from aurora_tpu.train.checkpoint import (latest_step,
                                             restore_checkpoint,
                                             save_checkpoint)
    from aurora_tpu.train.metrics import Throughput
    from aurora_tpu.train.trainer import (init_train_state, make_optimizer,
                                          make_train_step)
    from aurora_tpu.utils.templates import PROMPT_TEMPLATE

    stage = {"pretrain": stage_configs.pretrain_stage,
             "vision": stage_configs.vision_stage,
             "language": stage_configs.language_stage}[args.stage]()
    if args.config:
        from aurora_tpu.cli.cfg_tools import load_cfg_overrides
        stage = load_cfg_overrides(args.config, stage)
    if args.max_steps:
        stage = dataclasses.replace(
            stage, train=dataclasses.replace(stage.train,
                                             max_steps=args.max_steps))
    batch_size = args.batch_size or stage.batch_size
    image_size = args.image_size or stage.image_size
    max_length = args.max_length or stage.max_length

    # ---- model (xtuner-format dir; tests build tiny dirs via
    # tests/utils.py:make_tiny_xtuner_dir)
    from aurora_tpu.cli.infer import load_model
    dtype = jnp.float32 if args.float32 else jnp.bfloat16
    params, acfg, tokenizer = load_model(args.model_path, dtype=dtype)
    acfg = dataclasses.replace(acfg, slowfast=stage.slowfast)

    # ---- mesh + sharding
    mesh = None
    if args.mesh:
        mesh = create_mesh(parse_mesh(args.mesh))
        params = shard_pytree(params, aurora_param_specs(params), mesh)

    # ---- data
    ds = AuroraDataset(args.data, tokenizer,
                       image_folder=args.image_folder,
                       map_fn=aurora_map_fn,
                       template=PROMPT_TEMPLATE.vicuna,
                       max_length=max_length, image_size=image_size,
                       cache_dir=args.cache_dir)
    packer = None
    if args.pack_max_length:
        from aurora_tpu.data.collate import SoftPackerMM, packed_collate_mm
        from aurora_tpu.models.aurora import num_visual_tokens
        n_vis = num_visual_tokens(acfg, stage.train.kept_ratio,
                                  image_size, image_size)
        packer = SoftPackerMM(ds.text_data, args.pack_max_length,
                              n_visual_tokens=n_vis, dataset=ds)
        # modality-signed lengths keep batches pack-homogeneous (mixed
        # text/frame packs would inflate the fused static width)
        from aurora_tpu.utils.constants import IMAGE_TOKEN_INDEX

        def pack_len(members):
            n = sum(len(ds.text_data[i]["input_ids"]) for i in members)
            has_img = any(IMAGE_TOKEN_INDEX in ds.text_data[i]["input_ids"]
                          for i in members)
            return n if has_img else -n
        sampler = LengthGroupedSampler(
            [pack_len(p) for p in packer.packs], batch_size,
            seed=args.seed)
    else:
        sampler = LengthGroupedSampler(ds.modality_length(), batch_size,
                                       seed=args.seed)

    # ---- state
    tcfg = stage.train
    if args.remat_policy:
        import dataclasses as _dc
        tcfg = _dc.replace(tcfg, remat_policy=args.remat_policy)
    ckpt_dir = os.path.join(args.work_dir, "checkpoints")
    start = 0
    use_lora = args.lora_r > 0
    if args.quant != "none" and not use_lora:
        p.error("--quant requires --lora_r (quantized base is frozen; "
                "full-parameter training needs a float base)")
    if use_lora:
        # (Q)LoRA: adapters-only optimizer; the (optionally int8/int4)
        # base never enters the optimizer (train/lora.py, train/quant.py)
        import optax
        from aurora_tpu.train.lora import (LoraConfig, init_lora_params,
                                           make_lora_train_step)
        from aurora_tpu.train.quant import (make_qlora_train_step,
                                            quantize_base, tree_nbytes)
        from aurora_tpu.train.trainer import lr_schedule
        lcfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
        adapters = init_lora_params(
            jax.random.PRNGKey(args.seed + 1), params, lcfg)
        base = params
        if args.quant != "none":
            bits = 8 if args.quant == "int8" else 4
            base = quantize_base(params, bits=bits)
            base = jax.tree.map(jnp.asarray, base)  # materialize now
            print(f"quantized base: {tree_nbytes(base)/1e9:.2f} GB "
                  f"(int{bits}) vs {tree_nbytes(params)/1e9:.2f} GB")
            params = None  # free the float copies of the layer stack
        opt = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip),
                          optax.adamw(lr_schedule(tcfg)))
        make = (make_qlora_train_step if args.quant != "none"
                else make_lora_train_step)
        raw = make(acfg, tcfg, base, lcfg, opt, mesh=mesh)
        jstep = jax.jit(raw.with_base, donate_argnums=(0, 1))
        state = {"adapters": adapters, "opt_state": opt.init(adapters)}
        if args.resume and latest_step(ckpt_dir) is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
            state = restore_checkpoint(ckpt_dir, abstract)
            start = latest_step(ckpt_dir)
            print(f"resumed from step {start}")

        def step_fn(st, batch):
            ad, ost, m = jstep(st["adapters"], st["opt_state"], batch,
                               base)
            return {"adapters": ad, "opt_state": ost}, m
    else:
        opt = make_optimizer(params, tcfg)
        state = init_train_state(params, tcfg)
        if args.resume and latest_step(ckpt_dir) is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
            state = restore_checkpoint(ckpt_dir, abstract)
            start = int(jax.device_get(state.step))
            print(f"resumed from step {start}")
        step_fn = jax.jit(make_train_step(acfg, tcfg, opt))
    thr = Throughput(acfg.llm.hidden_size, acfg.llm.num_hidden_layers,
                     acfg.llm.vocab_size,
                     num_devices=jax.device_count(),
                     intermediate=acfg.llm.intermediate_size)

    os.makedirs(args.work_dir, exist_ok=True)
    from aurora_tpu.utils.loggers import MetricsLogger
    logger = MetricsLogger(
        jsonl_path=os.path.join(args.work_dir, "train_log.jsonl"),
        wandb_project=args.wandb_project,
        run_name=f"{args.stage}-{os.path.basename(args.work_dir)}",
        config=vars(args))
    # ---- async host pipeline: worker threads decode/preprocess the NEXT
    # batches (and issue their H2D) while the device runs the current step;
    # index_stream fast-forwards to the resume position so a resumed run
    # consumes exactly the batches an uninterrupted one would
    # (llava_train_sp.py:705-708 DataLoader-workers analog + xtuner
    # tools/train.py:217-242 seed/iter resume semantics)
    from aurora_tpu.data.prefetch import BatchPrefetcher, index_stream

    if packer is not None:
        fetch = packer.__getitem__

        def collate(items):
            return {k: jnp.asarray(v)
                    for k, v in packed_collate_mm(items).items()}
    else:
        fetch = ds.__getitem__

        def collate(samples):
            # bucket the pad length so XLA compiles a handful of shapes,
            # not one per batch
            longest = max(len(s["input_ids"]) for s in samples)
            bucket = min(max_length, ((longest + 63) // 64) * 64)
            return {k: jnp.asarray(v) for k, v in
                    default_collate_fn(samples, max_length=bucket).items()}

    prefetcher = BatchPrefetcher(
        index_stream(sampler, batch_size, start_step=start),
        fetch, collate, depth=max(1, args.prefetch),
        workers=max(1, args.num_workers))
    last_logged = start
    for step_i in range(start, tcfg.max_steps):
        thr.data_tick()
        batch = next(prefetcher)   # blocks only on EXPOSED host time
        thr.data_tock()
        state, metrics = step_fn(state, batch)
        if (step_i + 1) % args.log_interval == 0 or step_i == start:
            loss = float(jax.device_get(metrics["loss"]))
            ntok = int(jax.device_get(metrics["ntokens"]))
            # window = steps actually covered since the last log (the
            # first log lands after ONE step — multiplying its tokens
            # by log_interval inflated tgs/tflops ~interval x)
            window = (step_i + 1) - last_logged
            last_logged = step_i + 1
            m = thr.step(ntok * window,
                         batch["input_ids"].shape[1], step_i + 1,
                         tcfg.max_steps, window_steps=window)
            rec = {"step": step_i + 1, "loss": round(loss, 4),
                   "grad_norm": round(float(jax.device_get(
                       metrics["grad_norm"])), 4),
                   "lr": float(jax.device_get(metrics["lr"]))
                   if "lr" in metrics else None,
                   "tgs": round(m["tgs"], 1),
                   "tflops": round(m["tflops"], 2),
                   "eta_s": int(m["eta_s"])}
            print(json.dumps(rec))
            logger.log(rec, step=step_i + 1)
        if (step_i + 1) % args.checkpoint_interval == 0:
            save_checkpoint(ckpt_dir, state, step_i + 1)
    prefetcher.close()
    save_checkpoint(ckpt_dir, state, tcfg.max_steps)
    if use_lora:
        # merge recipe for export: cli.convert reads this marker
        with open(os.path.join(args.work_dir, "lora.json"), "w") as f:
            json.dump({"r": args.lora_r, "alpha": args.lora_alpha,
                       "quant": args.quant}, f)
    logger.finish()
    print(f"done; checkpoints at {ckpt_dir}")


if __name__ == "__main__":
    main()
