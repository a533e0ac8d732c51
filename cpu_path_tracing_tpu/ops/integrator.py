"""Wavefront radiance integrator.

TPU-native replacement for the reference's per-ray iterative bounce loop
(``radiance``, ``src/main.cpp:104-158``): a whole batch of rays advances one
bounce per step of a ``lax.while_loop`` (fast forward path, early exit when
every lane is dead) or a fixed-trip ``lax.scan`` (reverse-mode differentiable
path).  Dead lanes are masked; their state is frozen so they cost no extra
memory traffic and cannot poison gradients.

Estimator semantics match the reference bounce-for-bounce:

* accumulates ``emission_0 + refl_0*emission_1 + refl_0*refl_1*emission_2 ...``
  (``src/main.cpp:99-103``);
* on miss: + throughput * sky gradient ``(1-t)*(1,1,1) + t*(.5,.7,1)``,
  ``t = 0.5*(unit_dir.y + 1)`` (``src/main.cpp:115-120``);
* Russian roulette after depth > rr_depth with survival prob
  ``p = max(albedo)`` *uncapped* — for the disco light p = 1.92 > 1, so RR
  never kills there and only damps by 1/p (``src/main.cpp:128-137``,
  SURVEY.md fidelity #1);
* material dispatch per ``src/main.cpp:141-154``.

Differentiability: discrete decisions (hit id, RR survival, reflect/refract
branch, material id) are piecewise-constant in the scene parameters, so
gradients flow through the *continuous* quantities only (t, normals, Fresnel
weights, throughput) — the standard detached/reparameterized estimator.
Visibility discontinuities are not edge-sampled; those derivatives are biased
(documented, SURVEY.md §7 hard-part 2).

Structure of the geometry gradient (be precise about what is nonzero): a
path's contribution is ``sum_k (prod_j albedo_j / p_j) * emission_k`` —
constants per path topology — plus the sky term on a miss, whose value
``(1-t)*bg0 + t*bg1`` varies continuously with the final direction.  Every
bounce direction is reparameterized through the hit normal, so sphere
position/radius gradients flow hit -> normal -> scattered direction -> ... ->
sky.  Consequently geometry gradients are exact-and-nonzero wherever some
sample paths escape to the background (e.g. the ``simple`` scene), and are
exactly zero in closed scenes (``box``/``box_mirror``), where the true
gradient is carried entirely by visibility edges the detached estimator
drops.  Emission/albedo/background/camera gradients are informative in every
scene.  Finite differences of the same estimator agree in all cases (the
BASELINE.json parity target), since FD sees the same piecewise structure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from . import rng as rng_ops
from .intersect import _rsqrt_safe, intersect_scene, hit_record, sphere_props
from .materials import scatter


class RayState(NamedTuple):
    origin: jax.Array  # [B,3]
    direction: jax.Array  # [B,3]
    throughput: jax.Array  # [B,3] "accumulated_reflectance" (main.cpp:108)
    emission: jax.Array  # [B,3] "accumulated_emission" (main.cpp:107)
    alive: jax.Array  # [B] bool
    result: jax.Array  # [B,3] radiance of finished lanes


def init_state(origins, directions) -> RayState:
    # Initializers are derived from `origins` (not fresh constants) so that
    # under shard_map the whole carry is "varying" over the mesh axes — JAX
    # 0.9 rejects while_loop carries that mix varying and unvarying parts.
    zero = origins * 0.0
    return RayState(
        origin=origins,
        direction=directions,
        throughput=zero + 1.0,
        emission=zero,
        alive=zero[:, 0] == 0.0,
        result=zero,
    )


def bounce_step(scene: Scene, state: RayState, uniforms, depth, *, rr_depth, epsilon, inf) -> RayState:
    """Advance every live ray one bounce.  ``uniforms``: [B,4] (see ops/rng.py).

    Expression structure mirrors the Pallas megakernel chain-for-chain (see
    ops/intersect.py docstring: identical structure compiles
    bitwise-identically under XLA and Mosaic — the on-device parity gate
    depends on it).
    """
    o, d, thr, emit, alive, result = state
    dt = o.dtype
    u_rr, u_a, u_b = uniforms[:, 0], uniforms[:, 1], uniforms[:, 2]

    t, hid, hit = intersect_scene(scene, o, d, epsilon=epsilon, inf=inf)

    # ---- miss: scene background gradient (src/main.cpp:115-120) ----
    # |d|^2 as the kernel's a_quad chain; sky from dy * rsqrt(a_quad).
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    a_quad = dx * dx + dy * dy + dz * dz
    dinv = _rsqrt_safe(a_quad)
    # Fusion-invariant form: see the megakernel's sky block.
    sky_t = (dy * dinv) * 0.5 + 0.5
    bg = scene.background.astype(dt)
    # Lerp form (one product): the two-product (1-t)*bg0 + t*bg1 blend has
    # an ambiguous fma grouping that XLA and Mosaic resolved differently —
    # see the megakernel's sky block.
    sky = bg[0] + sky_t[:, None] * (bg[1] - bg[0])
    die_miss = alive & ~hit
    result = jnp.where(die_miss[:, None], emit + thr * sky, result)

    # ---- hit record (grad-safe t for miss lanes; one-hot matmul gather) ----
    t_safe = jnp.where(hit, t, 1.0)
    props = sphere_props(scene, hid)
    hp, n_out, normal, front = hit_record(scene, o, d, t_safe, hid, props)
    em_h = props.emission  # [B,3]
    al_h = props.albedo  # [B,3]

    emit_new = emit + thr * em_h  # src/main.cpp:126 (before RR)

    # ---- Russian roulette (src/main.cpp:128-137) ----
    p = jnp.max(al_h, axis=-1)  # uncapped by design (fidelity #1)
    p_inv = 1.0 / jnp.where(p > 0, p, 1.0)
    do_rr = depth > rr_depth
    survive = u_rr < p
    killed = do_rr & ~survive
    die_rr = alive & hit & killed
    result = jnp.where(die_rr[:, None], emit_new, result)

    # throughput = (thr * albedo) * colf, colf = 1/p on a surviving roulette
    # round, else 1 — the kernel's exact product order.
    colf = jnp.where(do_rr & survive, p_inv, jnp.ones_like(p_inv))
    thr_new = thr * al_h * colf[:, None]  # src/main.cpp:139

    # ---- scatter (src/main.cpp:141-154) ----
    d_new = scatter(props.mat_mask, d, n_out, normal, front, u_a, u_b)

    cont = alive & hit & ~killed
    cm = cont[:, None]
    return RayState(
        origin=jnp.where(cm, hp, o),
        direction=jnp.where(cm, d_new, d),
        throughput=jnp.where(cm, thr_new, thr),
        emission=jnp.where(alive[:, None] & hit[:, None], emit_new, emit),
        alive=cont,
        result=result,
    )


def radiance(scene: Scene, origins, directions, keys, *, max_depth=100, rr_depth=4,
             epsilon=1e-4, inf=1e20, loop="while", with_stats=False, remat=False):
    """Estimate radiance for a ray batch.

    Args:
      keys: ([B],[B]) uint32 per-sample threefry key pair (ops/rng.py layout).
      loop: 'while' (early-exit; forward only) or 'scan' (differentiable).
      with_stats: also return {'segments': total rays traced (sum over
        bounces of live lanes), 'depth': iterations executed} — the
        observability counters of SURVEY.md §5.5.
      remat: wrap each scan step in jax.checkpoint so reverse-mode AD stores
        only the per-bounce RayState carry and recomputes intersection/shading
        intermediates (see RenderConfig.remat).  Ignored for loop='while'.
    Returns: [B,3] radiance (and the stats dict if requested).
    """
    state0 = init_state(origins, directions)
    kw = dict(rr_depth=rr_depth, epsilon=epsilon, inf=inf)

    if loop == "while":
        def cond(carry):
            depth, st, _ = carry
            return (depth < max_depth) & jnp.any(st.alive)

        def body(carry):
            depth, st, nseg = carry
            u = rng_ops.bounce_uniforms(keys[0], keys[1], depth).astype(origins.dtype)
            nseg = nseg + jnp.sum(st.alive, dtype=jnp.int32)
            return depth + 1, bounce_step(scene, st, u, depth, **kw), nseg

        nseg0 = jnp.sum(state0.alive, dtype=jnp.int32) * 0  # varying zero
        depth, state, nseg = jax.lax.while_loop(cond, body, (jnp.int32(0), state0, nseg0))
    elif loop == "scan":
        def body(st, depth):
            u = rng_ops.bounce_uniforms(keys[0], keys[1], depth).astype(origins.dtype)
            return bounce_step(scene, st, u, depth, **kw), jnp.sum(st.alive, dtype=jnp.int32)

        if remat:
            body = jax.checkpoint(body)
        state, counts = jax.lax.scan(body, state0, jnp.arange(max_depth, dtype=jnp.int32))
        nseg = jnp.sum(counts)
        depth = jnp.int32(max_depth)
    else:
        raise ValueError(f"unknown loop mode {loop!r}")

    # Depth-limit exhaustion returns accumulated emission (src/main.cpp:157).
    out = jnp.where(state.alive[:, None], state.emission, state.result)
    if with_stats:
        stats = {"segments": nseg, "depth": depth}
        if loop == "scan":
            # Live-lane count at each bounce depth — the survival curve
            # (SURVEY.md §5.5 bounce-depth observability), free from the scan.
            stats["live_per_depth"] = counts
        return out, stats
    return out
