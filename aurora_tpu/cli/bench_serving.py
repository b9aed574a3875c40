"""HTTP serving load generator.

Parity: sglang bench_serving.py — fire concurrent requests at a running
server, report request throughput, token throughput, and latency
percentiles.

  python -m aurora_tpu.cli.bench_serving --url http://localhost:30000 \
      --num-requests 64 --concurrency 8 --prompt-len 128 --max-tokens 64
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import string
import time


async def _one(session, url, prompt, max_tokens):
    t0 = time.perf_counter()
    async with session.post(url + "/generate", json={
            "text": prompt, "max_new_tokens": max_tokens,
            "temperature": 0.0}) as r:
        body = await r.json()
    dt = time.perf_counter() - t0
    return dt, body["meta_info"]["completion_tokens"], r.status


async def _run(args):
    import aiohttp
    rng = random.Random(0)
    prompts = ["".join(rng.choices(string.ascii_lowercase + " ",
                                   k=args.prompt_len))
               for _ in range(args.num_requests)]
    sem = asyncio.Semaphore(args.concurrency)
    results = []

    async with aiohttp.ClientSession() as session:
        async def worker(p):
            async with sem:
                results.append(await _one(session, args.url, p,
                                          args.max_tokens))

        t0 = time.perf_counter()
        await asyncio.gather(*[worker(p) for p in prompts])
        wall = time.perf_counter() - t0

    lat = sorted(dt for dt, _, _ in results)
    toks = sum(n for _, n, _ in results)
    ok = sum(1 for _, _, s in results if s == 200)

    def pct(p):
        return lat[min(int(len(lat) * p), len(lat) - 1)]

    print(json.dumps({
        "num_requests": args.num_requests, "ok": ok,
        "concurrency": args.concurrency,
        "wall_s": round(wall, 2),
        "requests_per_s": round(args.num_requests / wall, 2),
        "output_tokens_per_s": round(toks / wall, 1),
        "latency_s": {"p50": round(pct(0.5), 3),
                      "p90": round(pct(0.9), 3),
                      "p99": round(pct(0.99), 3)},
    }))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://localhost:30000")
    p.add_argument("--num-requests", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=128,
                   help="characters of random prompt text")
    p.add_argument("--max-tokens", type=int, default=64)
    args = p.parse_args()
    asyncio.run(_run(args))


if __name__ == "__main__":
    main()
