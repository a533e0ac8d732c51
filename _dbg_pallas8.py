import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas
W,H,SPP,DEPTH = 16,12,1,6
cfg = pt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, wavefront_lanes=8192)
scene = pt.get_scene("box_mirror", W, H)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
wave = np.asarray(jax.jit(lambda s,i: render_wavefront(s, cfg, i, 0, SPP))(scene, ids))
pal  = np.asarray(jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, SPP))(scene, ids))
s = np.maximum(np.abs(wave), np.maximum(np.abs(pal),1.0)); d = np.abs(wave-pal)/s
print("wave mean", wave.mean(), "pal mean", pal.mean(), "meandev", d.mean(), "maxdev", d.max())
