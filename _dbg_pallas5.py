import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import render_wavefront, render_wavefront_pallas
from cpu_path_tracing_tpu.ops.pallas.megakernel import (
    LANE, DEFAULT_ROWS, RING_NAMES, STATE_NAMES, F32_STATE, I32_STATE,
    megakernel_step, pack_camera, pack_scene)

W,H,SPP,DEPTH = 16,12,1,4
cfg = pt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, wavefront_lanes=8192)
scene = pt.get_scene("box_mirror", W, H)
ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
wave = np.asarray(jax.jit(lambda s,i: render_wavefront(s, cfg, i, 0, SPP))(scene, ids))
pal  = np.asarray(jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, SPP))(scene, ids))

n_cells = cfg.num_cells; n_items = n_cells*SPP
rows = DEFAULT_ROWS; tile = rows*LANE
B = max(tile, (min(8192, n_items)//tile)*tile)
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
g_flush, it = 0, 0
while g_flush < n_gens and it < 200:
    it += 1
    dyn = jnp.array([g_flush, 0, 0], jnp.int32)
    state, ring, ds = megakernel_step(state, ring, table, cam, dyn, **kw)
    low = jnp.where(state["alive"] != 0, state["gen"]-1, state["gen"])
    watermark = int(jnp.min(low))
    if g_flush <= watermark:
        slot = g_flush % K
        for c, rn in zip("xyz", RING_NAMES):
            out[c] = jax.lax.dynamic_update_slice(out[c], ring[rn][slot].reshape(B), (g_flush*B,))
            ring[rn] = ring[rn].at[slot].set(0.0)
        g_flush += 1
res = jnp.stack([out["x"][:n_items], out["y"][:n_items], out["z"][:n_items]], -1)
pal2 = np.asarray(res.reshape(SPP, n_cells, 3).sum(0))
def dev(a,b):
    s = np.maximum(np.abs(a), np.maximum(np.abs(b),1.0)); return float(np.mean(np.abs(a-b)/s)), float(np.max(np.abs(a-b)/s))
print("iters(python-driven):", it, "B", B, "n_gens", n_gens)
print("wave mean", wave.mean(), "| pal(while) mean", pal.mean(), "| pal(py) mean", pal2.mean())
print("dev pal_while vs wave:", dev(pal, wave))
print("dev pal_py vs wave:", dev(pal2, wave))
print("dev pal_py vs pal_while:", dev(pal2, pal))
# determinism check of the while-loop path
pal_b = np.asarray(jax.jit(lambda s,i: render_wavefront_pallas(s, cfg, i, 0, SPP))(scene, ids))
print("while-loop deterministic:", np.array_equal(pal, pal_b))
