"""Pallas TPU replay-backward megakernel: analytic gradients at kernel speed.

Round-5 closed the backward-throughput gap algorithmically: the analytic
wavefront replay (ops/replay.py) accumulates the albedo/emission/background
gradients FORWARD — no tape, no transpose, early exit, regeneration — and
took the production inverse step (box 400x400 @64spp, BASELINE.json) from
0.19 to 1.26 steps/s.  What remained (PERF.md §8.4) was the same bound the
FORWARD path escaped in round 4: the XLA loop body pays ~0.4 ms/iteration in
per-op dispatch and unfused HBM round-trips, capping the replay at ~195 M
grad-segments/s vs the forward persistent kernel's ~1.9 G.

This module is the replay twin of ``make_persistent_kernel``
(megakernel.py): the ENTIRE replay loop runs inside one ``pallas_call`` with
every per-lane quantity resident in VMEM scratch —

  forward wavefront state   20 SoA (rows,128) tiles (shared step math:
                            ``make_step_math(with_aux=True)``, so decisions,
                            prefixes and RNG are bit-identical to the
                            forward kernel and the XLA replay)
  per-lane cotangent        3 tiles, loaded per generation from a K-slot
                            VMEM ring DMA'd from HBM (the reverse of the
                            forward kernel's result ring: admission instead
                            of flush)
  per-sphere prefix counters  2N tiles (hits, rouletted hits)
  gradient partials         (7N+6) accumulator tiles — cnt·q contractions,
                            roulette weights, emission pickups, background —
                            reduced to scalars OUTSIDE the kernel (one
                            jnp.sum over the DMA'd accumulator block)

The estimator algebra is ops/replay.py's, verbatim (multilinearity of the
path throughput in albedo/emission/background; src/main.cpp:104-158 is the
reference radiance loop being differentiated); the final assembly
(1/albedo, tie-split of max, 1/p guards) happens host-side in the same
guarded forms, so gradients equal the XLA replay up to fp summation order
(tests/test_replay_kernel.py pins this in interpret mode, plus the f64
jax.grad oracle).

Scope gate (``replay_kernel_eligible``): TPU backend, float32 scene,
uniform jitter, N <= MAX_REPLAY_SPHERES (the accumulator block is
(7N+6)·rows·512 B of VMEM and the intersect unroll's live ranges grow with
N — the production inverse scenes have N <= ~16).  Everything else falls
back to the XLA wavefront replay automatically (ops/replay.py
``replay_param_grads_auto``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.scene import Scene
from .megakernel import (
    LANE,
    F32_STATE,
    STATE_NAMES,
    make_step_math,
    pack_camera,
    pack_scene,
)

# VMEM-budget gate for the per-sphere counter/accumulator tiles (module
# docstring); scenes above this fall back to the XLA replay.
MAX_REPLAY_SPHERES = 40


def make_replay_kernel(cfg: RenderConfig, *, n_spheres: int, n_cells: int,
                       n_items: int, n_gens: int, rows: int, ring_depth: int,
                       ior: float = 2.0, unroll: int = 1):
    """Whole-backward kernel: forward wavefront + analytic accumulation.

    Outputs the (7N+6, rows, 128) gradient-partial block laid out as
      [0:3N)    cnt·q contractions (albedo numerator), sphere-major
      [3N:4N)   rouletted-prefix weights (albedo roulette term)
      [4N:7N)   emission pickups, sphere-major
      [7N:7N+6) background (bottom xyz, top xyz)
    plus nseg/iters SMEM scalars (occupancy telemetry, forward-kernel
    convention)."""
    K = ring_depth
    N = n_spheres
    M = 7 * N + 6
    if unroll != 1 and unroll % 2:
        raise ValueError("unroll must be 1 or even (flush-cadence invariant)")
    step = make_step_math(cfg, n_spheres=N, n_cells=n_cells, n_items=n_items,
                          n_gens=n_gens, stride=rows * LANE, ring_depth=K,
                          ior=ior, with_aux=True)

    def kernel(table_ref, cam_ref, dyn_ref, ct_hbm, acc_ref, nseg_ref,
               iters_ref, *scratch):
        ns = len(STATE_NAMES)
        state_scr = dict(zip(STATE_NAMES, scratch[:ns]))
        ct_scr = scratch[ns]        # (3, rows, LANE) lane cotangent
        cnt_scr = scratch[ns + 1]   # (N, rows, LANE) prefix hits
        crr_scr = scratch[ns + 2]   # (N, rows, LANE) rouletted prefix hits
        acc_scr = scratch[ns + 3]   # (M, rows, LANE) gradient partials
        ring_scr = scratch[ns + 4]  # (K, 3, rows, LANE) ct generation ring
        sem = scratch[ns + 5]

        cell_start = dyn_ref[0]
        sample_start = dyn_ref[1]
        lane_local = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        )

        # ---- init: all lanes idle, accumulators zero ----------------------
        izero = jnp.zeros((rows, LANE), jnp.int32)
        for n in F32_STATE:
            state_scr[n][...] = izero.astype(jnp.float32)
        state_scr["alive"][...] = izero
        state_scr["depth"][...] = izero
        state_scr["gen"][...] = izero - 1
        state_scr["k0"][...] = izero.astype(jnp.uint32)
        state_scr["k1"][...] = izero.astype(jnp.uint32)
        ct_scr[...] = jnp.zeros((3, rows, LANE), jnp.float32)
        cnt_scr[...] = jnp.zeros((N, rows, LANE), jnp.float32)
        crr_scr[...] = jnp.zeros((N, rows, LANE), jnp.float32)
        acc_scr[...] = jnp.zeros((M, rows, LANE), jnp.float32)

        # Preload the ct ring with generations 0..K-1 (clamped like the XLA
        # replay's ring0: a short range re-reads the last real slab, which no
        # lane can ever start, so the duplicate is never consumed).
        for k in range(K):
            dma = pltpu.make_async_copy(
                ct_hbm.at[min(k, n_gens - 1)], ring_scr.at[k], sem)
            dma.start()
            dma.wait()

        def cond(carry):
            return carry[0] < n_gens

        def body(carry):
            g_flush, nseg, iters = carry
            s = {n: state_scr[n][...] for n in STATE_NAMES}
            ctx, cty, ctz = ct_scr[0], ct_scr[1], ct_scr[2]
            # ``unroll`` bounce steps per while iteration (even) — lane
            # state and cotangent stay in registers across sub-steps and
            # the loop's fixed scalar work amortizes, exactly like the
            # forward persistent kernel (bitwise-invariant: per-item math
            # and the every-2nd-bounce admission cadence are unchanged).
            for u in range(unroll):
                s, was_alive, finished, aux = step(
                    s, table_ref, cam_ref, cell_start, sample_start, g_flush,
                    lane_local)
                del finished  # no result ring: gradients, not radiance
                nseg = nseg + jnp.sum(was_alive.astype(jnp.int32), dtype=jnp.int32)
                iters = iters + 1

                # ---- lane cotangent: K-way ring select on regeneration ----
                real = aux["real"]
                slot = s["gen"] % K  # regenerated lanes' NEW generation slot
                for k in range(K):
                    mk = real & (slot == k)
                    ctx = jnp.where(mk, ring_scr[k, 0], ctx)
                    cty = jnp.where(mk, ring_scr[k, 1], cty)
                    ctz = jnp.where(mk, ring_scr[k, 2], ctz)

                # ---- per-bounce contribution (ops/replay.py algebra) ------
                tpx, tpy, tpz = aux["thr_pre"]
                tcx, tcy, tcz = ctx * tpx, cty * tpy, ctz * tpz
                hm = was_alive & aux["hit"]
                hf = jnp.where(hm, 1.0, 0.0)
                mf = jnp.where(aux["die_miss"], 1.0, 0.0)
                skyx, skyy, skyz = aux["sky"]
                ehx, ehy, ehz = aux["eh"]
                # q = thr_ct * (emission pickup on a hit | sky on a miss)
                qx = tcx * ehx * hf + mf * tcx * skyx
                qy = tcy * ehy * hf + mf * tcy * skyy
                qz = tcz * ehz * hf + mf * tcz * skyz
                sq = qx + qy + qz
                contf = jnp.where(aux["cont"], 1.0, 0.0)
                rrf = jnp.where(aux["rr_scaled"], 1.0, 0.0)

                for m in range(N):
                    # Counters reset on regeneration BEFORE use: a fresh
                    # path has an empty prefix
                    # (replay_param_grads_wavefront.regenerate).
                    cm = jnp.where(real, 0.0, cnt_scr[m])
                    rm = jnp.where(real, 0.0, crr_scr[m])
                    ohf = jnp.where(hm & (aux["sidx"] == m), 1.0, 0.0)
                    # emission: dL/de[m] += onehot * thr_ct
                    acc_scr[4 * N + 3 * m + 0] = acc_scr[4 * N + 3 * m + 0] + ohf * tcx
                    acc_scr[4 * N + 3 * m + 1] = acc_scr[4 * N + 3 * m + 1] + ohf * tcy
                    acc_scr[4 * N + 3 * m + 2] = acc_scr[4 * N + 3 * m + 2] + ohf * tcz
                    # albedo numerator: cnt * q
                    acc_scr[3 * m + 0] = acc_scr[3 * m + 0] + cm * qx
                    acc_scr[3 * m + 1] = acc_scr[3 * m + 1] + cm * qy
                    acc_scr[3 * m + 2] = acc_scr[3 * m + 2] + cm * qz
                    # roulette weight: cnt_rr * sum(q)
                    acc_scr[3 * N + m] = acc_scr[3 * N + m] + rm * sq
                    inc = ohf * contf
                    cnt_scr[m] = cm + inc
                    crr_scr[m] = rm + inc * rrf

                w1 = mf * (1.0 - aux["sky_t"])
                wt = mf * aux["sky_t"]
                acc_scr[7 * N + 0] = acc_scr[7 * N + 0] + w1 * tcx
                acc_scr[7 * N + 1] = acc_scr[7 * N + 1] + w1 * tcy
                acc_scr[7 * N + 2] = acc_scr[7 * N + 2] + w1 * tcz
                acc_scr[7 * N + 3] = acc_scr[7 * N + 3] + wt * tcx
                acc_scr[7 * N + 4] = acc_scr[7 * N + 4] + wt * tcy
                acc_scr[7 * N + 5] = acc_scr[7 * N + 5] + wt * tcz

                if u % 2 == 0 and unroll > 1:
                    continue  # admission cadence: after every 2nd bounce

                # ---- watermark + ct-ring admission (forward cadence) ------
                check = (iters % 2) == 0 if unroll == 1 else True
                low = jnp.where(s["alive"] != 0, s["gen"] - 1, s["gen"])
                watermark = jnp.min(low)
                do_flush = check & (g_flush <= watermark)

                @pl.when(do_flush)
                def _admit(g_flush=g_flush):
                    top = jnp.minimum(g_flush + K, n_gens - 1)
                    dma = pltpu.make_async_copy(
                        ct_hbm.at[top], ring_scr.at[top % K], sem)
                    dma.start()
                    dma.wait()

                g_flush = g_flush + do_flush.astype(jnp.int32)

            ct_scr[0] = ctx
            ct_scr[1] = cty
            ct_scr[2] = ctz
            for n in STATE_NAMES:
                state_scr[n][...] = s[n]
            return g_flush, nseg, iters

        zero = jnp.int32(0)
        _, nseg, iters = jax.lax.while_loop(cond, body, (zero, zero, zero))
        acc_ref[...] = acc_scr[...]
        nseg_ref[0, 0] = nseg
        iters_ref[0, 0] = iters

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_spheres", "n_cells", "n_items", "n_gens",
                     "rows", "ring_depth", "interpret", "ior", "unroll"),
)
def replay_persistent(table, cam, dyn, ct_hbm, *, cfg: RenderConfig,
                      n_spheres: int, n_cells: int, n_items: int, n_gens: int,
                      rows: int, ring_depth: int, interpret: bool = False,
                      ior: float = 2.0, unroll: int = 1):
    """Run the whole replay backward in one kernel launch.

    Args:
      table: [N,17] f32 (pack_scene); cam: [20] f32 (pack_camera);
      dyn: [2] i32 (cell_start, sample_start);
      ct_hbm: [n_gens, 3, rows, 128] f32 per-generation cotangent slabs.
    Returns (acc [7N+6, rows, 128] f32, nseg, iters).
    """
    N = n_spheres
    M = 7 * N + 6
    kernel = make_replay_kernel(
        cfg, n_spheres=N, n_cells=n_cells, n_items=n_items, n_gens=n_gens,
        rows=rows, ring_depth=ring_depth, ior=ior, unroll=unroll)

    acc, nseg, iters = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANE), jnp.float32) for _ in F32_STATE]
            + [pltpu.VMEM((rows, LANE), jnp.int32) for _ in ("alive", "depth", "gen")]
            + [pltpu.VMEM((rows, LANE), jnp.uint32) for _ in ("k0", "k1")]
            + [pltpu.VMEM((3, rows, LANE), jnp.float32),
               pltpu.VMEM((N, rows, LANE), jnp.float32),
               pltpu.VMEM((N, rows, LANE), jnp.float32),
               pltpu.VMEM((M, rows, LANE), jnp.float32),
               pltpu.VMEM((ring_depth, 3, rows, LANE), jnp.float32),
               pltpu.SemaphoreType.DMA]
        ),
        # Same scoped-vmem headroom rationale as persistent_render: the
        # intersect unroll's live ranges plus the accumulator block exceed
        # the 16 MiB default well before MAX_REPLAY_SPHERES.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(table, cam, dyn, ct_hbm)
    return acc, nseg[0, 0], iters[0, 0]


def replay_param_grads_pallas(scene: Scene, cfg: RenderConfig, cell_ids,
                              sample_start, num_samples: int, ct, *,
                              rows: int | None = None,
                              ring_depth: int | None = None,
                              interpret: bool = False,
                              with_stats: bool = False,
                              unroll: int | None = None):
    """Kernel-backed :func:`ops.replay.replay_param_grads_wavefront` —
    identical signature, contract and gradient semantics (up to fp summation
    order); the caller-facing entry for the eligibility-gated dispatch in
    ``replay_param_grads_auto``."""
    from ..replay import assemble_albedo_grad
    from ...render import check_contiguous_cells

    check_contiguous_cells(cell_ids)
    if scene.p0.dtype != jnp.float32:
        raise ValueError("the pallas replay backward is float32-only")
    interpret = interpret or jax.devices()[0].platform != "tpu"
    rows = rows or cfg.pallas_rows or 32
    # Same deeper-ring default as the forward persistent kernel: the ct ring
    # lives in VMEM, so K=16 buys regeneration lookahead for ~free (measured
    # on the production invert chunk: 45.0 -> 33.2 ms going K=8 -> 16 at
    # rows=32; K=24/32 and other row widths are all worse — see PERF.md §8).
    if ring_depth is None and cfg.wavefront_ring is None:
        ring_depth = 16
    K = ring_depth or cfg.wavefront_ring or 8
    N = scene.num_spheres
    n_cells = cell_ids.shape[0]
    n_items = n_cells * num_samples
    Bt = rows * LANE
    n_gens = -(-n_items // Bt)

    table = pack_scene(scene)
    cam = pack_camera(scene)
    vzero = (cell_ids[0] * 0).astype(jnp.int32)
    dyn = jnp.stack(
        [cell_ids[0], jnp.asarray(sample_start, jnp.int32) + vzero]
    ).astype(jnp.int32)

    # Per-generation cotangent slabs: item = gen*Bt + row*128 + lane, and
    # ct_items[item] = ct[item % n_cells] (the XLA replay's tiled table).
    ctd = ct.astype(jnp.float32)
    ct_items = jnp.concatenate(
        [jnp.tile(ctd, (num_samples, 1)),
         jnp.zeros((n_gens * Bt - n_items, 3), jnp.float32) + vzero.astype(jnp.float32)],
        axis=0)
    ct_hbm = ct_items.reshape(n_gens, Bt, 3).transpose(0, 2, 1).reshape(
        n_gens, 3, rows, LANE)

    acc, nseg, iters = replay_persistent(
        table, cam, dyn, ct_hbm, cfg=cfg, n_spheres=N, n_cells=n_cells,
        n_items=n_items, n_gens=n_gens, rows=rows, ring_depth=K,
        interpret=interpret, ior=scene.ior,
        unroll=unroll or cfg.pallas_unroll)

    part = jnp.sum(acc, axis=(1, 2))  # [7N+6]
    cq = part[: 3 * N].reshape(N, 3)
    rr_w = part[3 * N : 4 * N]
    ge = part[4 * N : 7 * N].reshape(N, 3)
    gbg = part[7 * N :].reshape(2, 3)
    ga = assemble_albedo_grad(scene.albedo.astype(jnp.float32), cq, rr_w)
    grads = {"albedo": ga, "emission": ge, "background": gbg}
    if with_stats:
        return grads, {"segments": nseg, "iters": iters, "lanes": Bt}
    return grads
