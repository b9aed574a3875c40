"""Hermetic CPU smoke of the FULL bench.py flow (BENCH_TINY=1).

bench.py only ever runs for real on the driver's TPU window — a crash in
any stage there costs the whole round's performance evidence (the round-3
lesson: both driver artifacts came back empty). This test executes every
stage end-to-end on tiny shapes: synthetic on-disk videos → prefetcher
host decode → split CLIP pipeline → ViT+ToMe → bf16 e2e rung → W4+int8KV
e2e → decode stages → train step — and asserts the one-line JSON contract
the driver parses.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_tiny_full_flow():
    env = dict(os.environ, BENCH_TINY="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="", BENCH_DEADLINE_S="420")
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "auroracap7b_e2e_videos_per_s"
    assert rec["value"] and rec["value"] > 0
    assert "error" not in rec
    d = rec["detail"]
    # every stage must have reported (a silently skipped stage would
    # ship a bench that "works" but produces no evidence on the driver)
    for key in ("host_decode_ms_per_video_serial",
                "e2e_vit_device_only_s", "e2e_vit_with_host_decode_s",
                "e2e_bf16_videos_per_s", "e2e_llm_tokens_per_s",
                "decode_tokens_per_s_b8_ctx1k_w4",
                "train_step_ms", "train_tokens_per_s"):
        assert key in d, (key, sorted(d))
    for err_key in [k for k in d if k.endswith("_error")]:
        raise AssertionError((err_key, d[err_key]))
