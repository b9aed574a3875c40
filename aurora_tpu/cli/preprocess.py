"""Offline pre-tokenization — the process_untokenized_llava_data workflow.

Parity: src/xtuner/xtuner/tools/{process_untokenized_llava_data.py,
process_untokenized_large_data.py, merge_sharded_data.py} and the offline
flow in docs/auroracap/TRAIN.md:63-109: tokenize the text side once, save a
`datasets` dir, and train with dataset_path pointing at it (AuroraDataset
loads pre-tokenized dirs directly).

  python -m aurora_tpu.cli.preprocess --data in.json --out tok_data/ \
      --tokenizer <model dir> [--shard_size 100000] [--image_only]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--max_length", type=int, default=4096)
    p.add_argument("--shard_size", type=int, default=0,
                   help=">0 → shard every N records (large-data flow)")
    p.add_argument("--image_only", action="store_true",
                   help="projector-stage map fn (markers only)")
    args = p.parse_args()

    import datasets
    from transformers import AutoTokenizer
    from aurora_tpu.data.dataset import (aurora_image_only_map_fn,
                                         aurora_map_fn,
                                         encode_conversation,
                                         template_map_fn,
                                         _read_json_or_jsonl)
    from aurora_tpu.utils.templates import PROMPT_TEMPLATE

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    map_fn = aurora_image_only_map_fn if args.image_only else aurora_map_fn
    records = _read_json_or_jsonl(args.data)

    rows = []
    for rec in records:
        ex = template_map_fn(map_fn(rec), PROMPT_TEMPLATE.vicuna)
        enc = encode_conversation(ex, tokenizer, args.max_length)
        enc["image"] = rec.get("image")
        rows.append(enc)

    if args.shard_size and len(rows) > args.shard_size:
        for i in range(0, len(rows), args.shard_size):
            shard = datasets.Dataset.from_list(rows[i:i + args.shard_size])
            shard.save_to_disk(f"{args.out}_shard{i // args.shard_size}")
        print(f"wrote {-(-len(rows) // args.shard_size)} shards")
    else:
        datasets.Dataset.from_list(rows).save_to_disk(args.out)
        print(f"wrote {len(rows)} pre-tokenized rows to {args.out}")


if __name__ == "__main__":
    main()
