import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax
jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas

for W,H,SPP,DEPTH,lanes in [(16,12,1,6,8192),(24,16,3,24,501),(16,12,1,6,501)]:
    cfg = pt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, wavefront_lanes=lanes)
    scene = pt.get_scene("box_mirror", W, H)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    wave = np.asarray(render_wavefront(scene, cfg, ids, 0, SPP))
    pal  = np.asarray(render_wavefront_pallas(scene, cfg, ids, 0, SPP))
    s = np.maximum(np.abs(wave), np.maximum(np.abs(pal),1.0))
    d = np.abs(wave-pal)/s
    print(f"cfg {W}x{H} spp{SPP} d{DEPTH} lanes{lanes}: wave mean {wave.mean():.4f} pal mean {pal.mean():.4f} meandev {d.mean():.4f} maxdev {d.max():.4f}")
