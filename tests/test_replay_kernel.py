"""Pallas replay-backward megakernel (ops/pallas/replay_kernel.py).

Correctness pins, all in interpret mode on CPU.  The tight oracle is an
independent f64-ACCUMULATOR reference (`_f64_accum_grads`): identical f32
bounce math via ops/integrator.bounce_step (so discrete decisions match the
kernel bitwise — the forward-parity invariant), with every gradient
contraction accumulated in f64.  Against it the kernel must sit at
f32-accumulation distance: ~1e-7 when each lane handles one item (single
generation — per-lane sums reduced once by a tree sum), ~7e-4 when lanes
chain multiple items across regenerations.  The XLA f32 replay's
per-iteration scalar accumulation measures ~3e-4..3e-3 against the same
reference, so the kernel is pinned at-or-tighter than the production XLA
path — and the loose kernel-vs-XLA-replay check below catches semantic
drift between the two implementations.

(An f64-SCENE oracle is deliberately not used at these shapes: a single
f32-vs-f64 Russian-roulette flip on a high-throughput lane shifts whole
gradient entries by tens of percent, which says nothing about either
implementation.  test_replay.py pins the replay ALGEBRA against jax.grad in
f64 end-to-end; these tests pin the KERNEL against the shared-decision
reference.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.grad import merge_params
from cpu_path_tracing_tpu.ops import rng as rng_ops
from cpu_path_tracing_tpu.ops.integrator import bounce_step, init_state
from cpu_path_tracing_tpu.ops.replay import (
    assemble_albedo_grad,
    replay_param_grads_wavefront,
)
from cpu_path_tracing_tpu.ops.pallas.replay_kernel import replay_param_grads_pallas
from cpu_path_tracing_tpu.render import camera_rays

FIELDS = ("albedo", "emission", "background")


def _perturbed(name, cfg, seed=0):
    scene = pt.get_scene(name, cfg.width, cfg.height, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    return merge_params(scene, {
        "albedo": jnp.abs(scene.albedo
                          + rng.normal(0, 0.03, scene.albedo.shape).astype(np.float32)) + 1e-3,
        "emission": jnp.abs(scene.emission
                            + rng.normal(0, 0.03, scene.emission.shape).astype(np.float32)),
    })


def _ct(cfg, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (cfg.num_cells, 3))).astype(jnp.float32)


def _f64_accum_grads(scene, cfg, cell_ids, ct):
    """Shared-decision reference: f32 bounce math, f64 accumulators — the
    replay algebra of ops/replay.py transcribed with exact summation.
    The per-depth body is jitted (one compile; eager dispatch of ~40
    bounce graphs dominated the test otherwise)."""
    import jax

    N = scene.num_spheres
    root_key = rng_ops.master_key(cfg.seed)
    kw = dict(rr_depth=cfg.rr_depth, epsilon=cfg.epsilon, inf=cfg.inf)
    sphere_ids = jnp.arange(N, dtype=jnp.int32)
    f64 = jnp.float64

    @jax.jit
    def depth_step(scene, st, keys, ct, depth, cnt, cnt_rr, ga_cq, ga_rr, ge, gbg):
        u = rng_ops.bounce_uniforms(keys[0], keys[1], depth).astype(jnp.float32)
        st, aux = bounce_step(scene, st, u, depth, with_aux=True, **kw)
        onehot = ((aux["hid"][:, None] == sphere_ids[None, :])
                  & aux["was_alive"][:, None] & aux["hit"][:, None]).astype(f64)
        thr_ct = (ct * aux["thr_pre"]).astype(f64)
        ge = ge + jnp.einsum("ln,lc->nc", onehot, thr_ct)
        q = (thr_ct * aux["em_h"].astype(f64)) * onehot.sum(-1, keepdims=True)
        q = q + jnp.where(aux["die_miss"][:, None],
                          thr_ct * aux["sky"].astype(f64), 0.0)
        ga_cq = ga_cq + jnp.einsum("ln,lc->nc", cnt, q)
        ga_rr = ga_rr + jnp.einsum("ln,l->n", cnt_rr, jnp.sum(q, axis=-1))
        mt = jnp.where(aux["die_miss"], aux["sky_t"].astype(f64), 0.0)
        m1 = jnp.where(aux["die_miss"], 1.0 - aux["sky_t"].astype(f64), 0.0)
        gbg = gbg.at[0].add(jnp.einsum("l,lc->c", m1, thr_ct))
        gbg = gbg.at[1].add(jnp.einsum("l,lc->c", mt, thr_ct))
        inc = onehot * aux["cont"][:, None].astype(f64)
        cnt = cnt + inc
        cnt_rr = cnt_rr + inc * aux["rr_scaled"][:, None].astype(f64)
        return st, cnt, cnt_rr, ga_cq, ga_rr, ge, gbg

    ga_cq = jnp.zeros((N, 3), f64)
    ga_rr = jnp.zeros((N,), f64)
    ge = jnp.zeros((N, 3), f64)
    gbg = jnp.zeros((2, 3), f64)
    for s_idx in range(cfg.spp):
        keys, o, d = camera_rays(scene, cfg, cell_ids, s_idx, root_key, jnp.float32)
        st = init_state(o, d)
        cnt = jnp.zeros((cell_ids.shape[0], N), f64)
        cnt_rr = jnp.zeros_like(cnt)
        for depth in range(cfg.max_depth):
            st, cnt, cnt_rr, ga_cq, ga_rr, ge, gbg = depth_step(
                scene, st, keys, ct, jnp.uint32(depth), cnt, cnt_rr,
                ga_cq, ga_rr, ge, gbg)
    ga = assemble_albedo_grad(scene.albedo.astype(f64), ga_cq, ga_rr)
    return {"albedo": ga, "emission": ge, "background": gbg}


def _check(gk, scene, cfg, ids, ct, *, lanes, ring, tol=1e-5):
    """``tol`` vs the f64-accum reference scales with how many items a lane
    accumulates in f32: one item/lane (single generation) leaves pure
    f32 roundoff (~1e-7 measured); multi-generation lanes chain several
    items' contributions sequentially (~7e-4 measured — still ~4x tighter
    than the XLA replay's own accumulation error, and both are orders below
    the MC gradient noise at any production spp)."""
    ref = _f64_accum_grads(scene, cfg, ids, ct)
    gx = replay_param_grads_wavefront(scene, cfg, ids, 0, cfg.spp, ct,
                                      lanes=lanes, ring_depth=ring)
    for k in FIELDS:
        a, b, c = np.asarray(ref[k]), np.asarray(gk[k]), np.asarray(gx[k])
        np.testing.assert_allclose(b, a, rtol=tol,
                                   atol=tol * (np.abs(a).max() + 1),
                                   err_msg=f"{k} vs f64-accum reference")
        np.testing.assert_allclose(b, c, rtol=2e-2,
                                   atol=2e-2 * (np.abs(c).max() + 1),
                                   err_msg=f"{k} vs XLA f32 replay")


def test_replay_kernel_single_generation():
    """All items fit one lane generation (no ring streaming): the pure
    accumulate-and-reduce path."""
    cfg = pt.RenderConfig(width=10, height=8, spp=2, max_depth=20)
    scene = _perturbed("box", cfg)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    ct = _ct(cfg)
    gk = replay_param_grads_pallas(scene, cfg, ids, 0, cfg.spp, ct,
                                   rows=8, ring_depth=4, unroll=1, interpret=True)
    _check(gk, scene, cfg, ids, ct, lanes=1024, ring=4)


@pytest.mark.slow
def test_replay_kernel_ring_admission():
    """n_gens (8) > ring_depth (4): cotangent slabs stream through the DMA
    ring mid-loop, lanes regenerate across generations."""
    cfg = pt.RenderConfig(width=16, height=16, spp=8, max_depth=20)
    scene = _perturbed("box", cfg)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    ct = _ct(cfg)
    gk, st = replay_param_grads_pallas(scene, cfg, ids, 0, cfg.spp, ct,
                                       rows=8, ring_depth=4, unroll=2,
                                       interpret=True, with_stats=True)
    assert cfg.num_cells * cfg.spp // (8 * 128) >= 8  # really multi-gen
    assert int(st["segments"]) > 0 and int(st["iters"]) > 0
    _check(gk, scene, cfg, ids, ct, lanes=1024, ring=4, tol=5e-3)


def test_replay_kernel_zero_albedo_deviation():
    """The guarded deferred assembly reproduces the documented zero-albedo
    behavior: finite everywhere, exactly zero gradient on exactly-zero
    channels (ops/replay.py scope note)."""
    # Same static shapes as test_replay_kernel_single_generation so the
    # jitted kernel is a cache hit (keeps the fast tier lean).  K=4 in the
    # fast tier: the ring unroll dominates interpret-compile time (measured
    # 28 s at K=8 vs 6 s at K=4); ring depth is schedule-only (bitwise
    # gradient invariance pinned on device, scripts/tpu_smoke.py).
    cfg = pt.RenderConfig(width=10, height=8, spp=2, max_depth=20)
    scene = pt.get_scene("box", cfg.width, cfg.height, dtype=jnp.float32)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    ct = jnp.ones((cfg.num_cells, 3), jnp.float32)
    g = replay_param_grads_pallas(scene, cfg, ids, 0, cfg.spp, ct,
                                  rows=8, ring_depth=4, unroll=1, interpret=True)
    ga = np.asarray(g["albedo"])
    assert np.isfinite(ga).all()
    assert np.all(ga[np.asarray(scene.albedo) == 0.0] == 0.0)


def test_replay_kernel_rejects_f64():
    cfg = pt.RenderConfig(width=8, height=6, spp=1, max_depth=4)
    scene = pt.get_scene("box", cfg.width, cfg.height, dtype=jnp.float64)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    with pytest.raises(ValueError, match="float32"):
        replay_param_grads_pallas(scene, cfg, ids, 0, 1,
                                  jnp.ones((cfg.num_cells, 3)), interpret=True)
