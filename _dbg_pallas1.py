import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas
print(jax.devices())
cfg = pt.RenderConfig(width=32, height=24, spp=2, max_depth=100, wavefront_lanes=1<<14)
scene = pt.get_scene("box", 32, 24)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
w = np.asarray(jax.jit(lambda s,i: render_wavefront(s, cfg, i, 0, 2))(scene, ids))
p, stats = jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, 2, with_stats=True))(scene, ids)
p = np.asarray(p)
print("wavefront mean", w.mean(), "pallas mean", p.mean())
print("pallas zero frac", (p==0).mean(), "nan frac", np.isnan(p).mean())
print("segments", int(stats["segments"]), "iters", int(stats["iters"]))
print("w[:3]", w[:3].ravel())
print("p[:3]", p[:3].ravel())
