#!/usr/bin/env python
"""Performance gates over a BENCH_r*.json record.

Parity: sglang's latency/throughput assert tests
(src/sglang/test/srt/test_serving_latency.py / test_serving_throughput.py)
— floors that fail loudly on regression instead of silently drifting.

  python tools/check_perf.py BENCH_r02.json
"""

import json
import sys

# conservative floors (v5e single chip; see docs/STATUS.md measured
# numbers ~2x these — gates catch regressions, not variance)
GATES = {
    "value": ("e2e videos/s", 0.15),
    "detail.decode_tokens_per_s_b8": ("b8 decode tok/s", 100.0),
    "detail.paged_attn_b8_ctx2048.ragged_pct_sol": ("kernel %SoL", 55.0),
    "detail.paged_attn_b8_ctx2048.speedup": ("kernel vs gather", 1.2),
    "detail.vit_encode_clips_per_s": ("ViT clips/s", 8.0),
}


def get(d, path):
    for k in path.split("."):
        if not isinstance(d, dict) or k not in d:
            return None
        d = d[k]
    return d


def main(path):
    with open(path) as f:
        raw = f.read()
    # driver records may wrap the metric line; find the metric object
    rec = None
    for ln in raw.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                obj = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "metric" in obj:
                rec = obj
            elif "parsed" in obj and isinstance(obj["parsed"], dict):
                rec = obj["parsed"]
    if rec is None:
        obj = json.loads(raw)
        rec = obj.get("parsed", obj)
    failures = []
    for path_, (name, floor) in GATES.items():
        val = get(rec, path_)
        if val is None:
            print(f"[gate] {name:24s} MISSING ({path_})")
            continue
        ok = float(val) >= floor
        print(f"[gate] {name:24s} {val:>10} >= {floor}  "
              f"{'ok' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)
    if failures:
        print("[gate] FAILED:", ", ".join(failures))
        return 1
    print("[gate] all perf gates passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r02.json"))
