"""Headline benchmark: Mrays/s/chip on the disco_sphere (box_mirror) scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 100 Mrays/s — the BASELINE.md north-star target
(the reference publishes no numbers of its own; see BASELINE.md).

"Rays" counts traced path segments (live lanes summed over bounce
iterations), not just camera rays — the honest denominator for a path
tracer's throughput.  The render is the persistent wavefront integrator
(ops/wavefront.py), the production forward path.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas

BASELINE_MRAYS = 100.0


def bench_disco(width=1024, height=768, spp=8, lanes=1 << 19, repeats=2):
    cfg = pt.RenderConfig(width=width, height=height, spp=spp, max_depth=100,
                          wavefront_lanes=lanes)
    scene = pt.get_scene("box_mirror", width, height)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)

    wf = render_wavefront_pallas if jax.default_backend() == "tpu" else render_wavefront
    f = jax.jit(lambda s, i: wf(s, cfg, i, 0, cfg.spp, with_stats=True))
    out, stats = f(scene, ids)
    jax.block_until_ready(out)  # compile + warm
    # Deterministic per (scene, cfg): read stats once, OUTSIDE the timed
    # loop — an in-loop int(stats[...]) costs a device->host transfer over
    # the axon tunnel (~tens of ms) per repeat.
    segments = int(stats["segments"])

    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, _stats = f(scene, ids)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return segments / best / 1e6, segments, best


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
