"""Headline benchmark: Mrays/s/chip on the disco_sphere (box_mirror) scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 100 Mrays/s — the BASELINE.md north-star target
(the reference publishes no numbers of its own; see BASELINE.md).

"Rays" counts traced path segments (live lanes summed over bounce
iterations), not just camera rays — the honest denominator for a path
tracer's throughput.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.integrator import radiance
from cpu_path_tracing_tpu.render import camera_rays
from cpu_path_tracing_tpu.ops import rng as rng_ops

BASELINE_MRAYS = 100.0


def bench_disco(width=1024, height=768, spp=8, chunk_cells=None, repeats=3):
    cfg = pt.RenderConfig(width=width, height=height, spp=spp, max_depth=100)
    scene = pt.get_scene("box_mirror", width, height)
    n = cfg.num_cells
    chunk = chunk_cells or n

    @jax.jit
    def run_chunk(scene, ids, sample_idx):
        root = rng_ops.base_key(cfg.seed)
        keys, o, d = camera_rays(scene, cfg, ids, sample_idx, root, scene.p0.dtype)
        out, stats = radiance(
            scene, o, d, keys, max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            epsilon=cfg.epsilon, inf=cfg.inf, loop="while", with_stats=True,
        )
        return jnp.sum(out, axis=0), stats["segments"]

    chunks = [jnp.arange(s, min(s + chunk, n), dtype=jnp.int32) for s in range(0, n, chunk)]

    def full_pass():
        total_segments = 0
        acc = None
        for s in range(cfg.spp):
            for ids in chunks:
                out, seg = run_chunk(scene, ids, s)
                acc = out if acc is None else acc + out
                total_segments += int(seg)
        jax.block_until_ready(acc)
        return total_segments

    # Warmup / compile.
    _ = full_pass()

    best = None
    segments = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        segments = full_pass()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    mrays = segments / best / 1e6
    return mrays, segments, best


def main():
    dev = jax.devices()[0]
    mrays, segments, secs = bench_disco()
    print(
        json.dumps(
            {
                "metric": "disco_sphere render throughput (1 chip, 1024x768, 32 total spp, max_depth 100)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
                "detail": {
                    "segments": segments,
                    "seconds": round(secs, 3),
                    "device": str(dev),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
