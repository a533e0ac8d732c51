import time, sys
import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

W,H,SPP,DEPTH = 16,12,1,6
cfg = pt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, wavefront_lanes=8192)
scene = pt.get_scene("box_mirror", W, H)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
log("compiling wavefront...")
wave, wst = jax.jit(lambda s,i: render_wavefront(s, cfg, i, 0, SPP, with_stats=True))(scene, ids)
wave = np.asarray(wave)
log("wavefront done: mean", wave.mean(), "segments", int(wst["segments"]), "iters", int(wst["iters"]))
log("compiling pallas (device)...")
pal, pst = jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, SPP, with_stats=True))(scene, ids)
pal = np.asarray(pal)
log("pallas done: mean", pal.mean(), "segments", int(pst["segments"]), "iters", int(pst["iters"]))
def dev(a,b):
    s = np.maximum(np.abs(a), np.maximum(np.abs(b),1.0)); return float(np.mean(np.abs(a-b)/s)), float(np.max(np.abs(a-b)/s))
log("dev pal vs wave:", dev(pal, wave))
nz_w, nz_p = (wave.sum(1)!=0).sum(), (pal.sum(1)!=0).sum()
log("nonzero cells wave", nz_w, "pal", nz_p, "of", wave.shape[0])
log("compiling pallas (interpret, on tpu)...")
pali, ist = jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, SPP, with_stats=True, interpret=True))(scene, ids)
pali = np.asarray(pali)
log("pallas-interpret done: mean", pali.mean(), "segments", int(ist["segments"]), "iters", int(ist["iters"]))
log("dev pali vs wave:", dev(pali, wave))
log("dev pali vs pal:", dev(pali, pal))
