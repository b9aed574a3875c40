"""Unified entry point — the `xtuner MODE ...` dispatcher
(src/xtuner/xtuner/entry_point.py:14-56 parity, argparse instead of the
mmengine shim).

    python -m aurora_tpu MODE [MODE_ARGS...]
"""

from __future__ import annotations

import runpy
import sys

_MODULE_MODES = {
    "train": "aurora_tpu.cli.train",
    "test": "aurora_tpu.eval",              # xtuner `test` ≙ eval CLI
    "eval": "aurora_tpu.eval",
    "post-eval": "aurora_tpu.eval.post_eval",
    "chat": "aurora_tpu.cli.chat",
    "convert": "aurora_tpu.cli.convert",
    "preprocess": "aurora_tpu.cli.preprocess",
    "mmbench": "aurora_tpu.cli.mmbench",
    "infer": "aurora_tpu.cli.infer",
    "serve": "aurora_tpu.cli.serve",
    "bench-latency": "aurora_tpu.cli.bench_latency",
    "bench-serving": "aurora_tpu.cli.bench_serving",
    "bench-kernels": "aurora_tpu.cli.bench_kernels",
}

_TOOL_MODES = ("list-cfg", "copy-cfg", "log-dataset",
               "check-custom-dataset")


def _help() -> str:
    modes = ", ".join(list(_TOOL_MODES) + sorted(_MODULE_MODES))
    return (f"usage: python -m aurora_tpu MODE [ARGS...]\n"
            f"  modes: {modes}\n"
            "  examples:\n"
            "    python -m aurora_tpu list-cfg\n"
            "    python -m aurora_tpu copy-cfg vision my_cfg.json\n"
            "    python -m aurora_tpu train --stage vision "
            "--config my_cfg.json --model_path M --data d.json\n"
            "    python -m aurora_tpu log-dataset --data d.json "
            "--model_path M\n"
            "    python -m aurora_tpu check-custom-dataset --data d.json\n"
            "    python -m aurora_tpu serve --model_path M --port 30000\n")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_help())
        return 0
    mode, rest = argv[0], argv[1:]
    if mode in _TOOL_MODES:
        from aurora_tpu.cli import cfg_tools
        fn = {"list-cfg": cfg_tools.list_cfg,
              "copy-cfg": cfg_tools.copy_cfg,
              "log-dataset": cfg_tools.log_dataset,
              "check-custom-dataset": cfg_tools.check_custom_dataset}[mode]
        return fn(rest)
    if mode in _MODULE_MODES:
        sys.argv = [f"aurora {mode}"] + rest
        runpy.run_module(_MODULE_MODES[mode], run_name="__main__")
        return 0
    print(f"unknown mode {mode!r}\n\n{_help()}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
