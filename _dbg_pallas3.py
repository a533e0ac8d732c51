import jax, jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.pallas.megakernel import (
    LANE, DEFAULT_ROWS, RING_NAMES, STATE_NAMES, F32_STATE, I32_STATE,
    megakernel_step, pack_camera, pack_scene)

cfg = pt.RenderConfig(width=32, height=24, spp=2, max_depth=100, wavefront_lanes=1<<14)
scene = pt.get_scene("box", 32, 24)
n_cells = cfg.num_cells; num_samples = 2
n_items = n_cells*num_samples
rows = DEFAULT_ROWS; tile = rows*LANE
B = max(tile, (min(1<<14, n_items)//tile)*tile)
n_gens = -(-n_items//B); n_rows = B//LANE; K=8
print("B",B,"n_gens",n_gens,"n_rows",n_rows)
table = pack_scene(scene); cam = pack_camera(scene)
izero = jnp.zeros((n_rows, LANE), jnp.int32)
fzero = izero.astype(jnp.float32)
state0 = {n: fzero for n in F32_STATE}
state0.update({n: izero for n in I32_STATE})
state0["gen"] = izero - 1
state0.update({n: izero.astype(jnp.uint32) for n in ("k0","k1")})
ring0 = {n: jnp.zeros((K, n_rows, LANE), jnp.float32) for n in RING_NAMES}
dyn = jnp.array([0, 0, 0], jnp.int32)
kw = dict(cfg=cfg, n_spheres=scene.num_spheres, n_cells=n_cells, n_items=n_items,
          n_gens=n_gens, lanes=B, ring_depth=K, rows=rows)

def run_n(n_iters, interpret):
    st = {k: v for k,v in state0.items()}; rg = {k: v for k,v in ring0.items()}
    segs = []
    for it in range(n_iters):
        st, rg, ds = megakernel_step(st, rg, table, cam, dyn, interpret=interpret, **kw)
        segs.append(int(ds))
    return st, rg, segs

for iters in (1, 2, 5, 20):
    st_d, rg_d, seg_d = run_n(iters, False)
    st_i, rg_i, seg_i = run_n(iters, True)
    bad = []
    for n in STATE_NAMES:
        a, b = np.asarray(st_d[n]), np.asarray(st_i[n])
        if a.dtype.kind=='f':
            ok = np.allclose(a, b, atol=1e-5, rtol=1e-4)
        else:
            ok = (a==b).all()
        if not ok:
            frac = 1.0 - (np.isclose(a,b,atol=1e-5,rtol=1e-4) if a.dtype.kind=='f' else (a==b)).mean()
            bad.append((n, round(float(frac),4)))
    rbad = []
    for n in RING_NAMES:
        a, b = np.asarray(rg_d[n]), np.asarray(rg_i[n])
        if not np.allclose(a,b,atol=1e-5,rtol=1e-4):
            rbad.append((n, round(float(1-np.isclose(a,b,atol=1e-5,rtol=1e-4).mean()),4)))
    print(f"iters={iters} seg_d={seg_d[-1]} seg_i={seg_i[-1]} bad_state={bad} bad_ring={rbad}")
