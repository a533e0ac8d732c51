"""Sweep wavefront megakernel tuning knobs (lanes / rows / ring depth).

Dev tool: prints Mrays/s for each configuration on the disco_sphere
benchmark workload.  The segment count is deterministic for a fixed
(scene, config), so it is read once outside the timed region — reading it
inside would force a device sync mid-measurement.
"""

import time

import jax
import jax.numpy as jnp

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront_pallas

cfg = pt.RenderConfig(width=1024, height=768, spp=8, max_depth=100)
scene = pt.get_scene("box_mirror", cfg.width, cfg.height)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)

configs = [
    dict(lanes=1 << 18, rows=64, ring_depth=8),
    dict(lanes=1 << 19, rows=32, ring_depth=8),
    dict(lanes=1 << 19, rows=64, ring_depth=8),
    dict(lanes=1 << 19, rows=64, ring_depth=16),
    dict(lanes=3 << 18, rows=64, ring_depth=8),
]

for c in configs:
    f = jax.jit(lambda s, i: render_wavefront_pallas(s, cfg, i, 0, cfg.spp,
                with_stats=True, **c))
    try:
        out, stats = f(scene, ids)
        jax.block_until_ready(out)
        seg = int(stats["segments"])  # deterministic; read outside the timing
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out, _ = f(scene, ids)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{c}: {seg/best/1e6:.1f} Mrays/s ({best:.3f}s)", flush=True)
    except Exception as e:
        print(f"{c}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
