"""Top-level CLI dispatcher — the `xtuner MODES` equivalent
(src/xtuner/xtuner/entry_point.py:13-15,115-265).

  python -m aurora_tpu <mode> [args...]

modes: infer | chat | train | serve | eval | convert | preprocess |
       list-stages
"""

import sys

_MODES = {
    "infer": "aurora_tpu.cli.infer",
    "chat": "aurora_tpu.cli.chat",
    "train": "aurora_tpu.cli.train",
    "serve": "aurora_tpu.cli.serve",
    "eval": "aurora_tpu.eval.__main__",
    "post-eval": "aurora_tpu.eval.post_eval",
    "convert": "aurora_tpu.cli.convert",
    "preprocess": "aurora_tpu.cli.preprocess",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        print("modes:", ", ".join(sorted(_MODES)))
        return
    mode = sys.argv[1]
    if mode == "list-stages":
        print("pretrain vision language")
        return
    if mode not in _MODES:
        raise SystemExit(f"unknown mode {mode!r}; "
                         f"choose from {sorted(_MODES)}")
    import importlib
    sys.argv = [f"aurora_tpu {mode}"] + sys.argv[2:]
    importlib.import_module(_MODES[mode]).main()


if __name__ == "__main__":
    main()
