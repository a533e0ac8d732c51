import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas
cfg = pt.RenderConfig(width=32, height=24, spp=2, max_depth=100, wavefront_lanes=1<<14)
scene = pt.get_scene("box", 32, 24)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
w = np.asarray(jax.jit(lambda s,i: render_wavefront(s, cfg, i, 0, 2))(scene, ids))
p = np.asarray(jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, 2))(scene, ids))
nz_p = np.nonzero(p.sum(1))[0]
nz_w = np.nonzero(w.sum(1))[0]
print("n_cells", p.shape[0], "nonzero pallas", len(nz_p), "nonzero wavefront", len(nz_w))
print("pallas nonzero range", nz_p.min(), nz_p.max())
print("wavefront nonzero range", nz_w.min(), nz_w.max())
# where do pallas and wavefront agree?
agree = np.isclose(p, w, atol=1e-5, rtol=1e-4).all(1)
print("agree frac", agree.mean())
idx = np.nonzero(~agree)[0]
print("disagree idx range", idx.min(), idx.max(), "count", len(idx))
print("first disagreements:", idx[:10])
print("p[idx[:3]]", p[idx[:3]])
print("w[idx[:3]]", w[idx[:3]])
# pattern modulo 128 / 512 / 1024?
for m in (128, 512, 1024, 2048):
    print("mod", m, "agree by residue:", [round(agree[np.arange(len(agree))%m==r].mean(),2) for r in range(0, m, m//8)])
