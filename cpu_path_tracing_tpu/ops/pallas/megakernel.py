"""Pallas TPU megakernel: one fused wavefront iteration.

The "native layer" of the framework (SURVEY.md §7 build plan M3) — the
replacement for the role C++ plays in the reference.  One kernel fuses, per
lane tile resident in VMEM:

  regeneration (queue pop + threefry keys + thin-lens camera raygen)
  -> bounce RNG (Threefry-2x32, the exact ops/rng.py cipher — bit-identical
     uniforms to the XLA path)
  -> 8-wide unrolled sphere intersection (anchor-point stable quadratic,
     running min with lowest-index ties; per-hit properties selected
     sphere-by-sphere — no [B,N] materialization, no gathers)
  -> shading: sky miss, emission accumulation, Russian roulette, and all
     three material samplers blended by one-hot masks
  -> retirement into the K-deep dense ring (generation-striped, no scatter)

State is fully SoA: twenty [B] component arrays tiled as (rows, 128) blocks,
all aliased in-place (input_output_aliases) so the surrounding
lax.while_loop carries no copies.  The scalar sphere table and camera frame
live in SMEM.  Everything the kernel computes matches the jnp reference
implementation (ops/integrator.py bounce_step + ops/wavefront.py)
EXPRESSION-FOR-EXPRESSION: the XLA side is written in the same
left-associated component chains / reciprocal-multiplies as this kernel
(see ops/intersect.py docstring), because identical expression structure
compiles bitwise-identically under XLA and Mosaic (measured on v5e).
Parity is enforced by interpret-mode tests (tests/test_wavefront.py;
bitwise except sky-gradient miss lanes, whose fma grouping is
compiler-context-dependent — see that test's docstring) and on the real
chip by scripts/tpu_smoke.py (TPU_SMOKE.md, 13/13 scenes green):
full-depth (100-bounce) scale-aware deviation 0 to ~2e-6 across scenes
(2.7e-4 on smallpt) — at-or-near bitwise agreement between this kernel
and the XLA integrators on device, and EXACT equality between the
per-step and persistent kernels (shared make_step_math).

Reference semantics cited inline map to src/main.cpp:104-158 (radiance loop),
src/camera.cpp:32-38 (thin lens), src/sphere.cpp:6-30 (roots).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.camera import build_camera
from ...models.scene import Scene
from ..rng import threefry2x32, master_key

_INF = 1e20
LANE = 128  # TPU lane width
DEFAULT_ROWS = 64  # sublane rows per tile -> 8192 lanes/tile

# State array names, in kernel argument order.
F32_STATE = (
    "ox", "oy", "oz",        # origin
    "dx", "dy", "dz",        # direction
    "thx", "thy", "thz",     # throughput
    "emx", "emy", "emz",     # accumulated emission
    "rsx", "rsy", "rsz",     # result
)
I32_STATE = ("alive", "depth", "gen")
U32_STATE = ("k0", "k1")
STATE_NAMES = F32_STATE + I32_STATE + U32_STATE
RING_NAMES = ("rgx", "rgy", "rgz")


def pack_scene(scene: Scene):
    """Scene -> (table [N,17] f32 for SMEM).

    Columns 0..6 feed the intersect loop: p0(3) anchor(3) radius(1)
    (anchor-point stable quadratic).  Columns 7..16 are the running-select
    payload: center(3) emission(3) albedo(3) mat_code(1) — 10 tracked
    columns instead of the previous 16 (center-form normal + material code;
    see ops/intersect.py sphere_props on the precision budget).  The select
    is a masked move per column per sphere, so narrowing it is a direct
    ~10% cut of the many-sphere intersect cost (PERF.md §6)."""
    ad = jax.lax.stop_gradient(scene.anchor_dir)
    p0 = scene.p0.astype(jnp.float32)
    rad = scene.radius.astype(jnp.float32)
    adf = ad.astype(jnp.float32)
    center = p0 - rad[:, None] * adf  # identical chain to sphere_props
    return jnp.concatenate(
        [
            p0,
            adf,
            rad[:, None],
            center,
            scene.emission.astype(jnp.float32),
            scene.albedo.astype(jnp.float32),
            scene.material.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


def pack_camera(scene: Scene):
    """Camera frame + background -> [20] f32 for SMEM: pos(3) llc(3) cam_x(3)
    cam_y(3) lens_radius(1) bg_bottom(3) bg_top(3) origin_advance(1)."""
    cam = build_camera(scene.camera)
    return jnp.concatenate(
        [
            cam.position.astype(jnp.float32),
            cam.lower_left.astype(jnp.float32),
            cam.cam_x.astype(jnp.float32),
            cam.cam_y.astype(jnp.float32),
            cam.lens_radius.astype(jnp.float32)[None],
            scene.background.astype(jnp.float32).reshape(6),
            cam.origin_advance.astype(jnp.float32)[None],
        ]
    )


def _u01(bits):
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits int32 exactly,
    # so reinterpret and convert from there (bit-identical to ops/rng.py).
    i32 = jax.lax.bitcast_convert_type(bits >> jnp.uint32(8), jnp.int32)
    return i32.astype(jnp.float32) * np.float32(2.0**-24)


def _rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.where(x > 0, x, 1.0))


def _sqrt_safe(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def make_step_math(cfg: RenderConfig, *, n_spheres: int, n_cells: int,
                   n_items: int, n_gens: int, stride: int, ring_depth: int,
                   ior: float = 2.0, with_aux: bool = False):
    """One fused wavefront iteration as pure array math over the SoA state
    dict: regeneration (queue pop + camera raygen) -> bounce RNG -> unrolled
    intersect -> shade -> alive/result update.  Shared verbatim by the
    per-step kernel (``make_kernel``) and the persistent kernel
    (``make_persistent_kernel``) so the two compile the IDENTICAL expression
    chains — the bitwise XLA/Mosaic parity invariant (module docstring)
    holds for both by construction.

    ``stride`` is the lane-pool width B used in the item mapping
    ``item = gen * stride + lane`` (the whole pool for the per-step kernel,
    the single resident tile for the persistent kernel).

    Returns ``step(s, table_ref, cam_ref, cell_start, sample_start, g_flush,
    lane_global) -> (s', was_alive, finished)``.

    ``with_aux`` additionally returns the per-lane bounce internals the
    analytic replay backward consumes (the kernel twin of
    ops/integrator.bounce_step's ``with_aux`` — replay_kernel.py): the
    regeneration mask, selected-sphere index, hit/miss flags, pre-bounce
    throughput, this bounce's emission pickup, the sky value/lerp-t and the
    Russian-roulette survival indicator.  All are values this step already
    computes (plus one index-select per sphere in the intersect unroll), and
    the flag defaults off so the forward kernels trace unchanged."""
    K = ring_depth
    B = stride
    W, H, ns = cfg.width, cfg.height, cfg.num_subpixels
    total_cells = W * H * ns * ns
    sub_len = np.float32(1.0 / ns)
    eps = np.float32(cfg.epsilon)
    s0_key, s1_key = master_key(cfg.seed)
    max_depth = cfg.max_depth
    rr_depth = cfg.rr_depth
    N = n_spheres

    def step(s, table_ref, cam_ref, cell_start, sample_start, g_flush, lane_global):
        alive = s["alive"] != 0

        # ---------------- regeneration (queue pop + camera) ----------------
        want_g = s["gen"] + 1
        can = (~alive) & (want_g < n_gens) & (want_g < g_flush + K)
        item = want_g * B + lane_global
        real = can & (item < n_items)

        c_idx = item % n_cells
        smp = jax.lax.bitcast_convert_type(sample_start + item // n_cells, jnp.uint32)
        cell = jnp.minimum(cell_start + c_idx, total_cells - 1)

        a0, a1 = threefry2x32(jnp.uint32(s0_key), jnp.uint32(s1_key),
                              jax.lax.bitcast_convert_type(cell, jnp.uint32), smp)
        # Jitter from the item-key words themselves; one cipher block for the
        # lens-disk pair (rng.camera_uniforms — must stay in lockstep).
        c0, c1 = threefry2x32(a0, a1, jnp.uint32(0) * a0, jnp.uint32(0) * a0)
        jx, jy, du1, du2 = _u01(a0), _u01(a1), _u01(c0), _u01(c1)

        # decode cell -> (x, y, sx, sy); src/main.cpp:186-190 jitter
        sub = cell % (ns * ns)
        pix = cell // (ns * ns)
        px = (pix % W).astype(jnp.float32)
        py = (pix // W).astype(jnp.float32)
        sxf = (sub % ns).astype(jnp.float32)
        syf = (sub // ns).astype(jnp.float32)
        scr_s = (px + sxf * sub_len + jx * sub_len) * np.float32(1.0 / W)
        scr_t = (py + syf * sub_len + jy * sub_len) * np.float32(1.0 / H)

        # thin lens (src/camera.cpp:32-38; polar disk sample)
        lens_r = cam_ref[12]
        rr_ = jnp.sqrt(du1) * lens_r
        th_ = np.float32(2.0 * math.pi) * du2
        rdx = rr_ * jnp.cos(th_)
        rdy = rr_ * jnp.sin(th_)
        st_sum = scr_s + scr_t
        offx, offy = rdx * st_sum, rdy * st_sum  # quirk: rd*(s+t)
        n_dx = cam_ref[3] + cam_ref[6] * scr_s + cam_ref[9] * scr_t - cam_ref[0] - offx
        n_dy = cam_ref[4] + cam_ref[7] * scr_s + cam_ref[10] * scr_t - cam_ref[1] - offy
        n_dz = cam_ref[5] + cam_ref[8] * scr_s + cam_ref[11] * scr_t - cam_ref[2]
        # Near-clip advance along the unnormalized direction (cam slot 19;
        # sandbox/main.cpp:261 ``cam.o + d*140``; 0 for the src/ camera).
        adv = cam_ref[19]
        n_ox = cam_ref[0] + offx + adv * n_dx
        n_oy = cam_ref[1] + offy + adv * n_dy
        n_oz = cam_ref[2] + adv * n_dz

        def merge(cond, a, b):
            return jnp.where(cond, a, b)

        s["ox"] = merge(real, n_ox, s["ox"])
        s["oy"] = merge(real, n_oy, s["oy"])
        s["oz"] = merge(real, n_oz, s["oz"])
        s["dx"] = merge(real, n_dx, s["dx"])
        s["dy"] = merge(real, n_dy, s["dy"])
        s["dz"] = merge(real, n_dz, s["dz"])
        for nme in ("thx", "thy", "thz"):
            s[nme] = merge(real, jnp.ones_like(s[nme]), s[nme])
        for nme in ("emx", "emy", "emz", "rsx", "rsy", "rsz"):
            s[nme] = merge(real, jnp.zeros_like(s[nme]), s[nme])
        s["depth"] = merge(real, jnp.zeros_like(s["depth"]), s["depth"])
        s["gen"] = merge(can, want_g, s["gen"])
        s["k0"] = merge(real, a0, s["k0"])
        s["k1"] = merge(real, a1, s["k1"])
        was_alive = alive | real
        # Post-regeneration, pre-bounce throughput (the replay's thr_pre).
        th_pre = (s["thx"], s["thy"], s["thz"])

        # ---------------- bounce uniforms (ops/rng.py layout) ---------------
        purpose = jax.lax.bitcast_convert_type(s["depth"] + 1, jnp.uint32)
        b0, b1 = threefry2x32(s["k0"], s["k1"], purpose, purpose * jnp.uint32(0))
        # b3 is the RESERVED u_c word (ops/rng.py draw-layout docstring):
        # 3 words/bounce from 2-word blocks leaves one spare; reclaiming it
        # would carry a spare block across iterations (~2-3% forward) at the
        # cost of an RNG-layout change invalidating every pin — deliberately
        # kept as the future 4th-draw slot.
        b2, _b3 = threefry2x32(s["k0"], s["k1"], purpose, purpose * jnp.uint32(0) + jnp.uint32(1))
        u_rr, u_a, u_b = _u01(b0), _u01(b1), _u01(b2)

        ox, oy, oz = s["ox"], s["oy"], s["oz"]
        dx, dy, dz = s["dx"], s["dy"], s["dz"]

        # ---------------- intersect: unrolled over N spheres -----------------
        # (src/sphere.cpp:6-30 roots; src/main.cpp:30-42 nearest, lowest index)
        # Register-resident by design: the measured alternatives all lose on
        # v5e Mosaic — (rows,128)->(1,B) relayouts for an MXU Gram-matrix
        # formulation cost ~13 us each, (N,B)-blocked math is VMEM-bound at
        # ~1/35 of register-block VPU rate, and per-lane dynamic gather
        # (take_along_axis) does not compile (PERF.md "negative results").
        a_quad = dx * dx + dy * dy + dz * dz
        # Hoisted reciprocal: one divide per lane, not per (lane, sphere) —
        # f32 divide is ~8 fma slots (measured).  Mirrored in ops/intersect.py.
        a_inv = 1.0 / a_quad
        t_best = jnp.full_like(ox, _INF)
        # selected sphere properties (10 columns: table 7..16)
        sel = [jnp.zeros_like(ox) for _ in range(10)]
        sidx = jnp.zeros_like(s["depth"])  # selected sphere index (aux mode)
        for j in range(N):
            p0x, p0y, p0z = table_ref[j, 0], table_ref[j, 1], table_ref[j, 2]
            adx, ady, adz = table_ref[j, 3], table_ref[j, 4], table_ref[j, 5]
            rad = table_ref[j, 6]
            qx, qy, qz = ox - p0x, oy - p0y, oz - p0z
            qd = qx * dx + qy * dy + qz * dz
            add_ = adx * dx + ady * dy + adz * dz
            b_quad = qd + rad * add_
            qq = qx * qx + qy * qy + qz * qz
            qad = qx * adx + qy * ady + qz * adz
            c_quad = qq + 2.0 * rad * qad
            disc = b_quad * b_quad - a_quad * c_quad
            # No disc>=0 guard: sqrt(negative) = NaN, every NaN comparison
            # below is false, so a no-root sphere falls through to _INF —
            # exactly the guarded result, 3 ops cheaper.  (The XLA mirror
            # keeps its guard for gradient safety; guarded and unguarded
            # agree bitwise on every lane because the guard only touches
            # lanes whose root is _INF either way.)
            sq = jnp.sqrt(disc)
            sgn = jnp.where(b_quad >= 0.0, 1.0, -1.0)
            qf = -(b_quad + sgn * sq)
            r1 = qf * a_inv
            r2 = jnp.where(qf != 0.0, c_quad / jnp.where(qf != 0.0, qf, 1.0), _INF)
            tn = jnp.minimum(r1, r2)
            tf_ = jnp.maximum(r1, r2)
            root = jnp.where(tn >= eps, tn, jnp.where(tf_ >= eps, tf_, _INF))
            better = root < t_best  # strict: first (lowest) index wins ties
            t_best = jnp.where(better, root, t_best)
            for c in range(10):
                sel[c] = jnp.where(better, table_ref[j, 7 + c], sel[c])
            if with_aux:
                sidx = jnp.where(better, j, sidx)
        hit = t_best < _INF

        (cx_, cy_, cz_, ehx, ehy, ehz, alx, aly, alz, mcode) = sel
        # Material one-hot from the single selected code (0/1/2): exact
        # 0.0/1.0 masks, value-identical to gathering one-hot columns.
        m_dif = jnp.where(mcode < 0.5, 1.0, 0.0)
        m_spe = jnp.where((mcode > 0.5) & (mcode < 1.5), 1.0, 0.0)
        m_die = jnp.where(mcode > 1.5, 1.0, 0.0)

        # ------- miss: scene background gradient (src/main.cpp:115-120) ------
        dinv = _rsqrt_safe(a_quad)
        # (dy*dinv)*0.5 + 0.5 instead of 0.5*(dy*dinv + 1.0): x*0.5 is exact,
        # so ANY fma grouping of this form rounds identically — the previous
        # form's fma choice differed between compilers (1-ulp sky_t).
        sky_t = (dy * dinv) * 0.5 + 0.5
        # Lerp form bg0 + t*(bg1-bg0), algebraically equal to the reference's
        # (1-t)*bottom + t*top (src/main.cpp:116-119) but with only ONE
        # product — the two-product form's fma grouping is ambiguous and XLA
        # and Mosaic resolved it differently (1-ulp sky divergence, caught by
        # the bitwise interpret gate).
        skyx = cam_ref[13] + sky_t * (cam_ref[16] - cam_ref[13])
        skyy = cam_ref[14] + sky_t * (cam_ref[17] - cam_ref[14])
        skyz = cam_ref[15] + sky_t * (cam_ref[18] - cam_ref[15])
        die_miss = was_alive & ~hit
        s["rsx"] = jnp.where(die_miss, s["emx"] + s["thx"] * skyx, s["rsx"])
        s["rsy"] = jnp.where(die_miss, s["emy"] + s["thy"] * skyy, s["rsy"])
        s["rsz"] = jnp.where(die_miss, s["emz"] + s["thz"] * skyz, s["rsz"])

        # ---------------- hit record --------------------------------------
        t_safe = jnp.where(hit, t_best, 1.0)
        hx = ox + t_safe * dx
        hy = oy + t_safe * dy
        hz = oz + t_safe * dz
        # Outward normal = normalized (h - center); the 1/r scale is
        # absorbed by the normalization (ops/intersect.py hit_record).
        nrx = hx - cx_
        nry = hy - cy_
        nrz = hz - cz_
        ninv = _rsqrt_safe(nrx * nrx + nry * nry + nrz * nrz)
        nox_ = nrx * ninv
        noy_ = nry * ninv
        noz_ = nrz * ninv
        ndotd = nox_ * dx + noy_ * dy + noz_ * dz
        front = ndotd < 0.0
        fsign = jnp.where(front, 1.0, -1.0)
        nx_ = nox_ * fsign
        ny_ = noy_ * fsign
        nz_ = noz_ * fsign

        emnx = s["emx"] + s["thx"] * ehx  # src/main.cpp:126
        emny = s["emy"] + s["thy"] * ehy
        emnz = s["emz"] + s["thz"] * ehz

        # ---------------- Russian roulette (src/main.cpp:128-137) -----------
        pmax = jnp.maximum(alx, jnp.maximum(aly, alz))
        p_inv = 1.0 / jnp.where(pmax > 0.0, pmax, 1.0)
        do_rr = s["depth"] > rr_depth
        survive = u_rr < pmax
        killed = do_rr & ~survive
        colf = jnp.where(do_rr & survive, p_inv, 1.0)
        die_rr = was_alive & hit & killed
        s["rsx"] = jnp.where(die_rr, emnx, s["rsx"])
        s["rsy"] = jnp.where(die_rr, emny, s["rsy"])
        s["rsz"] = jnp.where(die_rr, emnz, s["rsz"])
        thnx = s["thx"] * alx * colf
        thny = s["thy"] * aly * colf
        thnz = s["thz"] * alz * colf

        # ---------------- diffuse (src/main.cpp:44-58) ----------------------
        phi = np.float32(2.0 * math.pi) * u_a
        sin_t = jnp.sqrt(u_b)
        cos_t = _sqrt_safe(1.0 - u_b)
        ax_y = jnp.abs(nx_) > 0.1
        # cross(axis, w) for axis = (0,1,0) vs (1,0,0)
        ux_r = jnp.where(ax_y, nz_, jnp.zeros_like(nz_))
        uy_r = jnp.where(ax_y, jnp.zeros_like(nz_), -nz_)
        uz_r = jnp.where(ax_y, -nx_, ny_)
        uinv = _rsqrt_safe(ux_r * ux_r + uy_r * uy_r + uz_r * uz_r)
        ux_, uy_, uz_ = ux_r * uinv, uy_r * uinv, uz_r * uinv
        vx_ = ny_ * uz_ - nz_ * uy_
        vy_ = nz_ * ux_ - nx_ * uz_
        vz_ = nx_ * uy_ - ny_ * ux_
        cp, sp_ = jnp.cos(phi), jnp.sin(phi)
        ddx = ux_ * cp * sin_t + vx_ * sp_ * sin_t + nx_ * cos_t
        ddy = uy_ * cp * sin_t + vy_ * sp_ * sin_t + ny_ * cos_t
        ddz = uz_ * cp * sin_t + vz_ * sp_ * sin_t + nz_ * cos_t
        dinv2 = _rsqrt_safe(ddx * ddx + ddy * ddy + ddz * ddz)
        ddx, ddy, ddz = ddx * dinv2, ddy * dinv2, ddz * dinv2

        # ---------------- specular (src/main.cpp:60-67) ---------------------
        spx = dx - 2.0 * nox_ * ndotd
        spy = dy - 2.0 * noy_ * ndotd
        spz = dz - 2.0 * noz_ * ndotd

        # ---------------- dielectric (src/main.cpp:69-97) -------------------
        # scene.ior is a static meta field: 2.0 (the default) compiles to the
        # same literals as before, preserving the bitwise parity pins.
        ratio = jnp.where(front, np.float32(1.0 / ior), np.float32(ior))
        udx, udy, udz = dx * dinv, dy * dinv, dz * dinv
        cos_d = jnp.minimum(-(udx * nx_ + udy * ny_ + udz * nz_), 1.0)
        sin_d = _sqrt_safe(1.0 - cos_d * cos_d)
        cannot = ratio * sin_d > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        mm = jnp.maximum(1.0 - cos_d, 0.0)
        reflprob = r0 + (1.0 - r0) * (mm * mm * mm * mm * mm)
        refl = cannot | (reflprob > u_a)
        ppx = (udx + nx_ * cos_d) * ratio
        ppy = (udy + ny_ * cos_d) * ratio
        ppz = (udz + nz_ * cos_d) * ratio
        kk = jnp.abs(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz))
        neg_sqrt_k = -jnp.sqrt(kk)
        dlx = jnp.where(refl, spx, ppx + nx_ * neg_sqrt_k)
        dly = jnp.where(refl, spy, ppy + ny_ * neg_sqrt_k)
        dlz = jnp.where(refl, spz, ppz + nz_ * neg_sqrt_k)

        # ---------------- blend + state update (src/main.cpp:141-154) -------
        dnx = m_dif * ddx + m_spe * spx + m_die * dlx
        dny = m_dif * ddy + m_spe * spy + m_die * dly
        dnz = m_dif * ddz + m_spe * spz + m_die * dlz

        cont = was_alive & hit & ~killed
        s["ox"] = jnp.where(cont, hx, s["ox"])
        s["oy"] = jnp.where(cont, hy, s["oy"])
        s["oz"] = jnp.where(cont, hz, s["oz"])
        s["dx"] = jnp.where(cont, dnx, s["dx"])
        s["dy"] = jnp.where(cont, dny, s["dy"])
        s["dz"] = jnp.where(cont, dnz, s["dz"])
        s["thx"] = jnp.where(cont, thnx, s["thx"])
        s["thy"] = jnp.where(cont, thny, s["thy"])
        s["thz"] = jnp.where(cont, thnz, s["thz"])
        upd_em = was_alive & hit
        s["emx"] = jnp.where(upd_em, emnx, s["emx"])
        s["emy"] = jnp.where(upd_em, emny, s["emy"])
        s["emz"] = jnp.where(upd_em, emnz, s["emz"])

        depth_new = jnp.where(was_alive, s["depth"] + 1, s["depth"])
        exhausted = cont & (depth_new >= max_depth)
        s["rsx"] = jnp.where(exhausted, s["emx"], s["rsx"])
        s["rsy"] = jnp.where(exhausted, s["emy"], s["rsy"])
        s["rsz"] = jnp.where(exhausted, s["emz"], s["rsz"])
        alive_new = cont & ~exhausted
        s["depth"] = depth_new
        s["alive"] = alive_new.astype(jnp.int32)

        finished = was_alive & ~alive_new
        if with_aux:
            aux = {
                "real": real, "hit": hit, "sidx": sidx, "die_miss": die_miss,
                "sky": (skyx, skyy, skyz), "sky_t": sky_t,
                "eh": (ehx, ehy, ehz), "thr_pre": th_pre,
                "cont": cont, "rr_scaled": do_rr & survive,
            }
            return s, was_alive, finished, aux
        return s, was_alive, finished

    return step


def make_kernel(cfg: RenderConfig, *, n_spheres: int, n_cells: int, n_items: int,
                n_gens: int, lanes: int, ring_depth: int, rows: int,
                ior: float = 2.0):
    """Per-step kernel body (one iteration per pallas_call; the surrounding
    lax.while_loop lives in XLA — see render_wavefront_pallas)."""
    K = ring_depth
    step = make_step_math(cfg, n_spheres=n_spheres, n_cells=n_cells,
                          n_items=n_items, n_gens=n_gens, stride=lanes,
                          ring_depth=ring_depth, ior=ior)

    def kernel(table_ref, cam_ref, dyn_ref, *refs):
        nstate = len(STATE_NAMES)
        in_refs = dict(zip(STATE_NAMES, refs[:nstate]))
        ring_in = dict(zip(RING_NAMES, refs[nstate : nstate + 3]))
        out_refs = dict(zip(STATE_NAMES, refs[nstate + 3 : 2 * nstate + 3]))
        ring_out = dict(zip(RING_NAMES, refs[2 * nstate + 3 : 2 * nstate + 6]))
        nseg_ref = refs[2 * nstate + 6]

        g_flush = dyn_ref[0]
        cell_start = dyn_ref[1]
        sample_start = dyn_ref[2]

        s = {n: in_refs[n][...] for n in STATE_NAMES}
        i = pl.program_id(0)
        lane_global = (
            i * (rows * LANE)
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        )

        s, was_alive, finished = step(s, table_ref, cam_ref, cell_start,
                                      sample_start, g_flush, lane_global)

        # Per-tile segment count, broadcast over the (8,128) min tile (SMEM
        # scalar outputs are not blockable per-tile under Mosaic's tiling
        # rules); the host sums element [0,0] of each tile.
        nseg_ref[...] = jnp.full((8, LANE), jnp.sum(was_alive.astype(jnp.int32)), jnp.int32)

        # ---------------- retire into the dense ring ------------------------
        slot = s["gen"] % K
        for k in range(K):
            mk = finished & (slot == k)
            ring_out["rgx"][k] = ring_in["rgx"][k] + jnp.where(mk, s["rsx"], 0.0)
            ring_out["rgy"][k] = ring_in["rgy"][k] + jnp.where(mk, s["rsy"], 0.0)
            ring_out["rgz"][k] = ring_in["rgz"][k] + jnp.where(mk, s["rsz"], 0.0)

        for n in STATE_NAMES:
            out_refs[n][...] = s[n]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_spheres", "n_cells", "n_items", "n_gens",
                     "lanes", "ring_depth", "rows", "interpret", "alias",
                     "ior"),
)
def megakernel_step(state: dict, ring: dict, table, cam, dyn, *, cfg: RenderConfig,
                    n_spheres: int, n_cells: int, n_items: int, n_gens: int,
                    lanes: int, ring_depth: int, rows: int = DEFAULT_ROWS,
                    interpret: bool = False, alias: bool = True,
                    ior: float = 2.0):
    """Run one fused wavefront iteration.

    Args:
      state: dict of STATE_NAMES -> [B/128, 128] arrays.
      ring:  dict of RING_NAMES -> [K, B/128, 128] arrays.
      table: [N,16] f32; cam: [20] f32 (pack_camera); dyn: [3] i32 (g_flush, cell_start,
        sample_start).
    Returns (state', ring', nseg).
    """
    n_rows_total = lanes // LANE
    grid = (n_rows_total // rows,)
    K = ring_depth

    kernel = make_kernel(
        cfg, n_spheres=n_spheres, n_cells=n_cells, n_items=n_items,
        n_gens=n_gens, lanes=lanes, ring_depth=ring_depth, rows=rows, ior=ior,
    )

    state_specs = [
        pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in STATE_NAMES
    ]
    ring_specs = [
        pl.BlockSpec((K, rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        for _ in RING_NAMES
    ]

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3  # table, cam, dyn
        + state_specs
        + ring_specs
    )
    out_specs = (
        state_specs
        + ring_specs
        + [pl.BlockSpec((8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((n_rows_total, LANE), state[n].dtype) for n in STATE_NAMES]
        + [jax.ShapeDtypeStruct((K, n_rows_total, LANE), jnp.float32) for _ in RING_NAMES]
        + [jax.ShapeDtypeStruct((grid[0] * 8, LANE), jnp.int32)]
    )

    n_state = len(STATE_NAMES)
    # inputs: 0=table 1=cam 2=dyn, 3..3+n_state-1 = state, then 3 rings
    aliases = {}
    if alias:
        aliases = {3 + i: i for i in range(n_state)}
        aliases.update({3 + n_state + i: n_state + i for i in range(3)})

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(table, cam, dyn, *[state[n] for n in STATE_NAMES], *[ring[n] for n in RING_NAMES])

    state_out = dict(zip(STATE_NAMES, outs[:n_state]))
    ring_out = dict(zip(RING_NAMES, outs[n_state : n_state + 3]))
    nseg = jnp.sum(outs[n_state + 3].reshape(grid[0], 8, LANE)[:, 0, 0], dtype=jnp.int32)
    return state_out, ring_out, nseg


# ---------------------------------------------------------------------------
# Persistent megakernel: the ENTIRE wavefront loop inside one pallas_call.
# ---------------------------------------------------------------------------

def make_persistent_kernel(cfg: RenderConfig, *, n_spheres: int, n_cells: int,
                           n_items: int, n_gens: int, rows: int,
                           ring_depth: int, ior: float = 2.0,
                           unroll: int = 1):
    """Whole-render kernel: the wavefront ``while`` loop runs INSIDE the
    kernel with all lane state resident in VMEM scratch.

    Motivation (PERF.md): the per-step kernel is HBM-bound — every iteration
    round-trips the 20 SoA state arrays plus the K-deep ring through HBM
    (~184 MB/iteration at the production pool width), which caps disco at
    ~1 Gray/s at a measured ~620 GB/s of achieved bandwidth.  Keeping the
    pool in VMEM leaves only the per-generation result flush
    (rows x 128 x 3 f32, DMA'd to the HBM output buffer) as off-chip
    traffic, moving the bound to the VPU.

    Design deltas vs the per-step kernel:
      * no grid — ONE resident lane tile of ``rows*128`` lanes; generations
        stripe the whole item range over this single pool (``stride`` =
        pool width), so per-item math and results are bitwise identical to
        the per-step kernel / XLA wavefront for the same pool width.
      * ring is a (K, 3, rows, 128) VMEM scratch; a completed generation is
        DMA'd to ``out[g]`` (shape (n_gens, 3, rows, 128), ANY/HBM) and the
        slot is zeroed in place.
      * loop carry is three scalars (g_flush, nseg, iters); everything else
        lives in mutable scratch refs.
    """
    K = ring_depth
    if unroll != 1 and unroll % 2:
        raise ValueError("unroll must be 1 or even (flush-cadence invariant)")
    step = make_step_math(cfg, n_spheres=n_spheres, n_cells=n_cells,
                          n_items=n_items, n_gens=n_gens, stride=rows * LANE,
                          ring_depth=ring_depth, ior=ior)

    def kernel(table_ref, cam_ref, dyn_ref, out_ref, nseg_ref, iters_ref,
               *scratch):
        state_scr = dict(zip(STATE_NAMES, scratch[: len(STATE_NAMES)]))
        ring_scr = scratch[len(STATE_NAMES)]
        sem = scratch[len(STATE_NAMES) + 1]

        cell_start = dyn_ref[0]
        sample_start = dyn_ref[1]
        lane_local = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        )

        # ---- init: all lanes idle, nothing processed yet -------------------
        izero = jnp.zeros((rows, LANE), jnp.int32)
        for n in F32_STATE:
            state_scr[n][...] = izero.astype(jnp.float32)
        state_scr["alive"][...] = izero
        state_scr["depth"][...] = izero
        state_scr["gen"][...] = izero - 1
        state_scr["k0"][...] = izero.astype(jnp.uint32)
        state_scr["k1"][...] = izero.astype(jnp.uint32)
        ring_scr[...] = jnp.zeros((K, 3, rows, LANE), jnp.float32)

        def cond(carry):
            g_flush, _, _ = carry
            return g_flush < n_gens

        def body(carry):
            g_flush, nseg, iters = carry
            s = {n: state_scr[n][...] for n in STATE_NAMES}
            # ``unroll`` bounce steps per while iteration (even, so the
            # flush cadence below is unchanged).  The lane state stays in
            # registers across the sub-steps — one scratch read + write per
            # body instead of per bounce — and the loop's fixed scalar work
            # (carry, cond, flush machinery) is amortized 1/unroll: the §7
            # "residual fixed per-iteration cost" lever.  Results are
            # BITWISE identical to unroll=1: per-item math never changes,
            # and the watermark/flush schedule (every 2nd bounce, same
            # g_flush visibility) is reproduced exactly.
            for u in range(unroll):
                s, was_alive, finished = step(s, table_ref, cam_ref, cell_start,
                                              sample_start, g_flush, lane_local)
                nseg = nseg + jnp.sum(was_alive.astype(jnp.int32), dtype=jnp.int32)
                iters = iters + 1

                # Retire finished results into the resident ring.
                slot = s["gen"] % K
                for k in range(K):
                    mk = finished & (slot == k)
                    ring_scr[k, 0] = ring_scr[k, 0] + jnp.where(mk, s["rsx"], 0.0)
                    ring_scr[k, 1] = ring_scr[k, 1] + jnp.where(mk, s["rsy"], 0.0)
                    ring_scr[k, 2] = ring_scr[k, 2] + jnp.where(mk, s["rsz"], 0.0)

                if u % 2 == 0 and unroll > 1:
                    continue  # watermark checked after every 2nd bounce only

                # Watermark: generations every lane has fully passed.
                # Checked only every 2nd bounce: a generation completes
                # every ~E[depth] bounces, so a one-step flush delay costs
                # at most a slightly earlier K-stall while halving the
                # min-reduce + flush-machinery overhead (bitwise-safe:
                # flush timing never changes per-item results, only the
                # schedule).
                check = (iters % 2) == 0 if unroll == 1 else True
                low = jnp.where(s["alive"] != 0, s["gen"] - 1, s["gen"])
                watermark = jnp.min(low)
                do_flush = check & (g_flush <= watermark)

                @pl.when(do_flush)
                def _flush(g_flush=g_flush):
                    fslot = g_flush % K
                    dma = pltpu.make_async_copy(
                        ring_scr.at[fslot], out_ref.at[g_flush], sem)
                    dma.start()
                    dma.wait()
                    for k in range(K):
                        @pl.when(fslot == k)
                        def _clear(k=k):
                            ring_scr[k] = jnp.zeros((3, rows, LANE), jnp.float32)

                g_flush = g_flush + do_flush.astype(jnp.int32)

            for n in STATE_NAMES:
                state_scr[n][...] = s[n]
            return g_flush, nseg, iters

        zero = jnp.int32(0)
        _, nseg, iters = jax.lax.while_loop(cond, body, (zero, zero, zero))
        nseg_ref[0, 0] = nseg
        iters_ref[0, 0] = iters

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_spheres", "n_cells", "n_items", "n_gens",
                     "rows", "ring_depth", "interpret", "ior", "unroll"),
)
def persistent_render(table, cam, dyn, *, cfg: RenderConfig, n_spheres: int,
                      n_cells: int, n_items: int, n_gens: int, rows: int,
                      ring_depth: int, interpret: bool = False,
                      ior: float = 2.0, unroll: int = 1):
    """Run the whole wavefront render in one kernel launch.

    Args:
      table: [N,16] f32 (pack_scene); cam: [20] f32 (pack_camera);
      dyn: [2] i32 (cell_start, sample_start).
    Returns (out [n_gens, 3, rows, 128] f32, nseg, iters).
    """
    kernel = make_persistent_kernel(
        cfg, n_spheres=n_spheres, n_cells=n_cells, n_items=n_items,
        n_gens=n_gens, rows=rows, ring_depth=ring_depth, ior=ior,
        unroll=unroll)

    out, nseg, iters = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_gens, 3, rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((rows, LANE), jnp.float32) for _ in F32_STATE]
            + [pltpu.VMEM((rows, LANE), jnp.int32) for _ in I32_STATE]
            + [pltpu.VMEM((rows, LANE), jnp.uint32) for _ in U32_STATE]
            + [pltpu.VMEM((ring_depth, 3, rows, LANE), jnp.float32),
               pltpu.SemaphoreType.DMA]
        ),
        # Many-sphere scenes: the unrolled intersect's live ranges grow with
        # N and overflow the default 16 MiB scoped-vmem budget near N~500
        # (measured: 26.5 MiB at N=531, rows=32).  Raise the cap — v5e has
        # 128 MiB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(table, cam, dyn)
    return out, nseg[0, 0], iters[0, 0]
