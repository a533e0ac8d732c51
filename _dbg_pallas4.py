"""Reproduce in-loop pallas divergence: while_loop path vs python-driven loop."""
import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas
from cpu_path_tracing_tpu.ops.pallas.megakernel import (
    LANE, DEFAULT_ROWS, RING_NAMES, STATE_NAMES, F32_STATE, I32_STATE,
    megakernel_step, pack_camera, pack_scene)

W,H,SPP,DEPTH = 96,64,4,8
cfg = pt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, wavefront_lanes=1<<16)
scene = pt.get_scene("box_mirror", W, H)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
wave = np.asarray(jax.jit(lambda s,i: render_wavefront(s, cfg, i, 0, SPP))(scene, ids))
pal  = np.asarray(jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, SPP))(scene, ids))

# python-driven replication of render_wavefront_pallas internals
n_cells = cfg.num_cells; num_samples = SPP
n_items = n_cells*num_samples
rows = DEFAULT_ROWS; tile = rows*LANE
B = int(min(1<<16, n_items)); B = max(tile, B - B%tile)
n_gens = -(-n_items//B); n_rows = B//LANE; K=8
table = pack_scene(scene); cam = pack_camera(scene)
izero = jnp.zeros((n_rows, LANE), jnp.int32)
fzero = izero.astype(jnp.float32)
state = {n: fzero for n in F32_STATE}
state.update({n: izero for n in I32_STATE})
state["gen"] = izero - 1
state.update({n: izero.astype(jnp.uint32) for n in ("k0","k1")})
ring = {n: jnp.zeros((K, n_rows, LANE), jnp.float32) for n in RING_NAMES}
out = {c: jnp.zeros((n_gens*B,), jnp.float32) for c in "xyz"}
kw = dict(cfg=cfg, n_spheres=scene.num_spheres, n_cells=n_cells, n_items=n_items,
          n_gens=n_gens, lanes=B, ring_depth=K, rows=rows, interpret=False)
g_flush = 0
it = 0
while g_flush < n_gens and it < 10000:
    it += 1
    dyn = jnp.array([g_flush, 0, 0], jnp.int32)
    state, ring, ds = megakernel_step(state, ring, table, cam, dyn, **kw)
    alive = np.asarray(state["alive"]); gen = np.asarray(state["gen"])
    low = np.where(alive != 0, gen-1, gen)
    watermark = int(low.min())
    if g_flush <= watermark:
        slot = g_flush % K
        for c, rn in zip("xyz", RING_NAMES):
            row = np.asarray(ring[rn][slot]).reshape(B)
            o = np.asarray(out[c]); o[g_flush*B:(g_flush+1)*B] = row
            out[c] = jnp.asarray(o)
            r = np.asarray(ring[rn]); r[slot] = 0; ring[rn] = jnp.asarray(r)
        g_flush += 1
res = np.stack([np.asarray(out["x"])[:n_items], np.asarray(out["y"])[:n_items], np.asarray(out["z"])[:n_items]], -1)
pal2 = res.reshape(num_samples, n_cells, 3).sum(0)
def dev(a,b):
    s = np.maximum(np.abs(a), np.maximum(np.abs(b),1.0)); return float(np.mean(np.abs(a-b)/s)), float(np.max(np.abs(a-b)/s))
print("iters(python-driven):", it)
print("wave mean", wave.mean(), "pal(whileloop) mean", pal.mean(), "pal(python) mean", pal2.mean())
print("dev pal_while vs wave:", dev(pal, wave))
print("dev pal_python vs wave:", dev(pal2, wave))
print("dev pal_python vs pal_while:", dev(pal2, pal))
