"""Headline benchmark: Mrays/s/chip on the disco_sphere (box_mirror) scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 100 Mrays/s — the BASELINE.md north-star target
(the reference publishes no numbers of its own; see BASELINE.md).

"Rays" counts traced path segments (live lanes summed over bounce
iterations), not just camera rays — the honest denominator for a path
tracer's throughput.  The render is the persistent Pallas megakernel
(ops/pallas/megakernel.py make_persistent_kernel) — the production forward
path: the whole wavefront loop inside one kernel launch with lane state
resident in VMEM (PERF.md).

Timing methodology (PERF.md "measurement integrity"):

* Synchronize by ``jax.device_get`` of a scalar reduction, NOT
  ``block_until_ready`` — through the axon tunnel the latter can return
  before execution completes (measured: an 8192^3 matmul "finished" in
  0.1 ms by block_until_ready vs ~84 ms real).  A device_get cannot lie.
* Report the MARGINAL rate: t(4 renders, one sync) minus t(1 render) over
  3.  Every synced execution through the tunnel carries a fixed ~24 ms
  launch/sync artifact (measured identical for a trivial one-op pallas
  kernel and for plain XLA programs), which is tunnel bookkeeping, not
  kernel time; dispatches pipeline, so the artifact is paid once per sync.
  Measured fit on the production render: t(n) = 24 ms + n x 182 ms.  The
  single-launch number including the artifact is also printed in
  ``detail`` for full disclosure.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import (
    render_wavefront,
    render_wavefront_pallas_persistent,
)

BASELINE_MRAYS = 100.0


def bench_disco(width=1024, height=768, spp=8, repeats=2, chain=4):
    cfg = pt.RenderConfig(width=width, height=height, spp=spp, max_depth=100)
    scene = pt.get_scene("box_mirror", width, height)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)

    on_tpu = jax.default_backend() == "tpu"
    wf = render_wavefront_pallas_persistent if on_tpu else render_wavefront
    kw = dict(rows=32, ring_depth=32) if on_tpu else {}

    def run(s, i):
        out, stats = wf(s, cfg, i, 0, cfg.spp, with_stats=True, **kw)
        return jnp.sum(out), stats["segments"]

    f = jax.jit(run)
    tot, seg = f(scene, ids)
    # Deterministic per (scene, cfg): read stats once, OUTSIDE the timed
    # loop — an in-loop transfer costs a tunnel RTT per repeat.
    segments = int(jax.device_get(seg))

    def t_chain(n):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                tot, _seg = f(scene, ids)
            jax.device_get(tot)  # real completion (module docstring)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t1 = t_chain(1)
    tn = t_chain(chain)
    # Clamp against timing noise (ADVICE r4): the subtraction can go
    # non-positive under jitter; the per-launch time in an n-launch chain is
    # a hard lower bound on the marginal execution time, so never report a
    # rate above segments/(tn/chain).
    marginal = max((tn - t1) / (chain - 1), (tn - 0.030) / chain, 1e-9)
    return segments / marginal / 1e6, segments, marginal, t1


def main():
    dev = jax.devices()[0]
    mrays, segments, secs, t1 = bench_disco()
    print(
        json.dumps(
            {
                "metric": "disco_sphere render marginal throughput (1 chip, 1024x768, 32 total spp, max_depth 100, per-sync tunnel artifact excluded)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
                "detail": {
                    "segments": segments,
                    "seconds": round(secs, 3),
                    "single_launch_seconds_incl_sync_artifact": round(t1, 3),
                    "single_launch_mrays": round(segments / t1 / 1e6, 1),
                    "device": str(dev),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
