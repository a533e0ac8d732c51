"""On-device Pallas parity + perf gate (VERDICT r1 next-round #2).

Runs on the real TPU chip (no JAX_PLATFORMS override) and, for EVERY
registered scene, checks that the three integrators agree on-device:

    batch (fori over samples, while bounce loop)
  == XLA wavefront (persistent lanes, generation-striped ring)
  == Pallas megakernel (fused SoA kernel, ops/pallas/megakernel.py)

closing the megakernel docstring's "parity ... on device" claim, which the
CPU-only test suite (tests/conftest.py forces JAX_PLATFORMS=cpu) cannot
check.

Parity semantics (measured, not assumed): the threefry draws are
bit-identical by construction, but Mosaic and XLA contract f32 ops
differently (FMA/rsqrt lowering), so ~1 lane in 10^4 per bounce lands on the
other side of a discrete lottery (Schlick choice, argmin tie); over
max_depth=100 this chaotically decorrelates individual path samples.  Both
realizations sample the same estimator, so the gate is two-tier:

  1. STRICT at low depth (max_depth=8): scale-aware per-cell agreement for
     the overwhelming majority of cells, catching any real logic bug;
  2. STATISTICAL at full depth (max_depth=100): the pallas-vs-wavefront
     deviation must not exceed ~the deviation of an independent-seed
     wavefront render (the Monte-Carlo noise yardstick), and global means
     must match to <1%.

Writes the artifact TPU_SMOKE.md at the repo root.  No per-scene perf column:
at the small gate config fixed per-iteration overheads dominate and the
number misleads — the perf artifact is `python -m cpu_path_tracing_tpu.cli
bench --suite` (BENCH_SUITE.md) at production shapes.

Usage:  python scripts/tpu_smoke.py [--width 96] [--height 64] [--spp 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.ops.wavefront import (
    render_wavefront,
    render_wavefront_pallas,
    render_wavefront_pallas_persistent,
)
from cpu_path_tracing_tpu.render import render_cells_range


def _scale_aware(a, b):
    """Elementwise |a-b| / max(|a|,|b|,1)."""
    scale = np.maximum(np.abs(a), np.maximum(np.abs(b), 1.0))
    return np.abs(a - b) / scale


def run(width: int, height: int, spp: int, out_path: str, state_path: str | None = None) -> int:
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev} ({dev.device_kind}); tpu={on_tpu}", file=sys.stderr)
    if not on_tpu:
        print("WARNING: not a TPU — the pallas path will run interpreted", file=sys.stderr)

    # Incremental state: the axon tunnel dies unpredictably mid-run, so each
    # scene's verdict is persisted as soon as it is measured and green scenes
    # are skipped on re-run (the watchdog loops this script until rc==0).
    state: dict = {}
    if state_path and os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)
        if state.get("config") != [width, height, spp]:
            state = {}

    rows = []
    failures = 0
    for name in pt.scene_names():
        prev = state.get("scenes", {}).get(name)
        if prev and prev.get("ok"):
            rows.append(prev)
            print(f"{name}: cached green result, skipping", file=sys.stderr)
            continue
        scene = pt.get_scene(name, width, height)
        rec = {"scene": name, "spheres": int(scene.num_spheres)}

        # ---- tier 1: strict parity at low depth --------------------------
        lo = pt.RenderConfig(width=width, height=height, spp=spp, max_depth=8,
                             wavefront_lanes=1 << 16)
        ids = jnp.arange(lo.num_cells, dtype=jnp.int32)
        batch = np.asarray(jax.jit(
            lambda s, i: render_cells_range(s, lo.replace(integrator="batch"), i, 0, spp)
        )(scene, ids))
        wave = np.asarray(jax.jit(
            lambda s, i: render_wavefront(s, lo, i, 0, spp)
        )(scene, ids))
        pal = np.asarray(jax.jit(
            lambda s, i: render_wavefront_pallas(s, lo, i, 0, spp)
        )(scene, ids))
        pers = np.asarray(jax.jit(
            lambda s, i: render_wavefront_pallas_persistent(s, lo, i, 0, spp)
        )(scene, ids))
        # The persistent kernel shares make_step_math with the per-step
        # kernel verbatim: anything but exact equality is a bug.
        rec["lowdepth_persistent_vs_perstep_exact"] = bool(np.array_equal(pers, pal))
        d_wb = float(np.max(_scale_aware(wave, batch)))
        d_pw = _scale_aware(pal, wave)
        rec["lowdepth_wavefront_vs_batch_max"] = d_wb
        rec["lowdepth_pallas_vs_wavefront_p999"] = float(np.quantile(d_pw, 0.999))
        rec["lowdepth_pallas_vs_wavefront_flipped_frac"] = float((d_pw > 1e-3).mean())
        # Near-bitwise thresholds (VERDICT r2 weak #8), set from the measured
        # post-Precision.HIGHEST deviations (p999 <= 6e-8, flipped frac <=
        # 2.7e-5 across scenes) with ~30x headroom: the bf16-MXU bug this
        # gate exists to catch produced flipped fracs of 0.12-0.81.
        ok_lo = (
            d_wb < 2e-5
            and rec["lowdepth_pallas_vs_wavefront_p999"] < 1e-5
            and rec["lowdepth_pallas_vs_wavefront_flipped_frac"] < 1e-3
            and rec["lowdepth_persistent_vs_perstep_exact"]
        )

        # ---- tier 2: statistical parity at full depth --------------------
        hi = lo.replace(max_depth=100)
        wave_hi = np.asarray(jax.jit(
            lambda s, i: render_wavefront(s, hi, i, 0, spp)
        )(scene, ids))
        # Independent-seed wavefront render = the Monte-Carlo noise yardstick.
        wave_alt = np.asarray(jax.jit(
            lambda s, i: render_wavefront(s, hi.replace(seed=1234), i, 0, spp)
        )(scene, ids))
        pal_fn = jax.jit(
            lambda s, i: render_wavefront_pallas_persistent(
                s, hi, i, 0, spp, with_stats=True)
        )
        t0 = time.perf_counter()
        pal_hi, stats = pal_fn(scene, ids)
        pal_hi = np.asarray(jax.device_get(pal_hi))
        compile_s = time.perf_counter() - t0
        segments = int(stats["segments"])

        err_pal = float(np.mean(_scale_aware(pal_hi, wave_hi)))
        err_seed = float(np.mean(_scale_aware(wave_alt, wave_hi)))
        # Per-channel means (VERDICT r2 weak #8: a global mean can hide a
        # single-channel bias behind the other two channels).
        ch_ratio = pal_hi.reshape(-1, 3).mean(0) / np.maximum(
            wave_hi.reshape(-1, 3).mean(0), 1e-12)
        rec["fulldepth_mean_dev_pallas"] = err_pal
        rec["fulldepth_mean_dev_independent_seed"] = err_seed
        rec["fulldepth_channel_mean_ratios"] = [round(float(r), 4) for r in ch_ratio]
        ok_hi = err_pal <= 1.5 * err_seed + 1e-6 and bool(
            np.all(np.abs(ch_ratio - 1.0) < 0.01))

        rec["ok"] = bool(ok_lo and ok_hi)
        # No per-scene Mrays/s column: at this gate config (~2^17 items vs
        # the production 2^19-lane pool) fixed per-iteration overheads
        # dominate and the number misleads — the perf artifact is
        # `cli bench --suite` (BENCH_SUITE.md) at production shapes.
        rec["segments"] = segments
        rec["pallas_compile_s"] = round(compile_s, 1)
        failures += 0 if rec["ok"] else 1
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        if state_path:
            state.setdefault("scenes", {})[name] = rec
            state["config"] = [width, height, spp]
            with open(state_path + ".tmp", "w") as fh:
                json.dump(state, fh)
            os.replace(state_path + ".tmp", state_path)

    # ---- sharded persistent kernel ON DEVICE (VERDICT r4 #5) -------------
    # The production path under shard_map was only ever exercised in
    # interpret mode on the CPU mesh; run it here on the real chip —
    # mesh-of-1 (and mesh-of-2 when the runtime exposes 2 devices) must be
    # bit-identical to the unsharded kernel (same pool width => same
    # generation striping => same math).
    shard_rec = state.get("sharded")
    if not (shard_rec and shard_rec.get("ok")):
        from cpu_path_tracing_tpu.parallel.mesh import make_mesh
        from cpu_path_tracing_tpu.parallel.render import render_cells_sharded
        from cpu_path_tracing_tpu.render import render_cells

        sh_cfg = pt.RenderConfig(width=width, height=height, spp=spp,
                                 max_depth=100, integrator="pallas",
                                 wavefront_lanes=1 << 16)
        sh_scene = pt.get_scene("box", width, height)
        ref_cells = np.asarray(render_cells(
            sh_scene, sh_cfg, jnp.arange(sh_cfg.num_cells, dtype=jnp.int32)))
        shard_rec = {"ok": True, "meshes": []}
        n_dev = len(jax.devices())
        for n_tiles in (1, 2):
            if n_tiles > n_dev:
                continue
            got = np.asarray(render_cells_sharded(
                sh_scene, sh_cfg, make_mesh(n_tiles, 1)))
            exact = bool(np.array_equal(got, ref_cells))
            shard_rec["meshes"].append({"tiles": n_tiles, "exact": exact})
            shard_rec["ok"] = shard_rec["ok"] and exact
            print(f"sharded pallas mesh=({n_tiles},1): exact={exact}", flush=True)
        failures += 0 if shard_rec["ok"] else 1
        if state_path:
            state["sharded"] = shard_rec
            with open(state_path + ".tmp", "w") as fh:
                json.dump(state, fh)
            os.replace(state_path + ".tmp", state_path)

    # ---- replay-backward megakernel ON DEVICE (round 5) -------------------
    # Two gates on the production backward (ops/pallas/replay_kernel.py):
    #   (a) vs the XLA wavefront replay: within f32 summation-order noise
    #       (measured ~2e-3..6e-3 of max; gate 2e-2 — decisions are shared,
    #       only accumulation order differs);
    #   (b) ring-depth invariance: K=8 vs K=16 gradients BITWISE equal (the
    #       item->lane mapping fixes each lane's accumulation order; any
    #       difference means the ct ring streamed a wrong slab).
    replay_rec = state.get("replay")
    if not (replay_rec and replay_rec.get("ok")):
        from cpu_path_tracing_tpu.ops.replay import replay_param_grads_wavefront
        from cpu_path_tracing_tpu.ops.pallas.replay_kernel import (
            replay_param_grads_pallas)

        rp_cfg = pt.RenderConfig(width=width, height=height, spp=spp,
                                 max_depth=100)
        rp_scene = pt.get_scene("box", width, height)
        rp_ids = jnp.arange(rp_cfg.num_cells, dtype=jnp.int32)
        rng = np.random.default_rng(7)
        rp_ct = jnp.asarray(
            rng.normal(0, 0.01, (rp_cfg.num_cells, 3))).astype(jnp.float32)
        gk8 = replay_param_grads_pallas(rp_scene, rp_cfg, rp_ids, 0, spp,
                                        rp_ct, ring_depth=8)
        gk16 = replay_param_grads_pallas(rp_scene, rp_cfg, rp_ids, 0, spp,
                                         rp_ct, ring_depth=16)
        gx = replay_param_grads_wavefront(rp_scene, rp_cfg, rp_ids, 0, spp,
                                          rp_ct)
        replay_rec = {"ok": True, "fields": {}}
        for k in ("albedo", "emission", "background"):
            a8, a16, ax = (np.asarray(gk8[k]), np.asarray(gk16[k]),
                           np.asarray(gx[k]))
            rdev = float(np.abs(a16 - ax).max() / (np.abs(ax).max() + 1e-30))
            bitwise = bool(np.array_equal(a8, a16))
            ok = rdev < 2e-2 and bitwise
            replay_rec["fields"][k] = {
                "dev_vs_xla": rdev, "ring_bitwise": bitwise, "ok": ok}
            replay_rec["ok"] = replay_rec["ok"] and ok
            print(f"replay kernel {k}: dev_vs_xla={rdev:.2e} "
                  f"ring8==ring16 bitwise={bitwise}", flush=True)
        failures += 0 if replay_rec["ok"] else 1
        if state_path:
            state["replay"] = replay_rec
            with open(state_path + ".tmp", "w") as fh:
                json.dump(state, fh)
            os.replace(state_path + ".tmp", state_path)

    lines = [
        f"# TPU on-device parity smoke — {dev.device_kind} ({dev.platform})",
        "",
        f"Config: {width}x{height} @ {spp} spp/cell, f32.  Two-tier gate (see",
        "scripts/tpu_smoke.py docstring): strict scale-aware parity at",
        "max_depth=8; statistical parity at max_depth=100 where Mosaic/XLA",
        "fp-contraction differences chaotically decorrelate single samples —",
        "the pallas deviation must stay within 1.5x the independent-seed",
        "Monte-Carlo yardstick and every per-channel mean within 1%.",
        "",
        "| scene | spheres | wf vs batch (max) | pallas p99.9 @d8 | flipped frac @d8 "
        "| pallas dev @d100 | seed yardstick @d100 | ch mean ratios | ok | compile s |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        ratios = "/".join(f"{x:.3f}" for x in r["fulldepth_channel_mean_ratios"])
        lines.append(
            f"| {r['scene']} | {r['spheres']} | {r['lowdepth_wavefront_vs_batch_max']:.1e} | "
            f"{r['lowdepth_pallas_vs_wavefront_p999']:.1e} | "
            f"{r['lowdepth_pallas_vs_wavefront_flipped_frac']:.1e} | "
            f"{r['fulldepth_mean_dev_pallas']:.2e} | "
            f"{r['fulldepth_mean_dev_independent_seed']:.2e} | "
            f"{ratios} | {'yes' if r['ok'] else 'NO'} | "
            f"{r['pallas_compile_s']} |"
        )
    lines.append("")
    meshes = ", ".join(
        f"({m['tiles']},1)->{'EXACT' if m['exact'] else 'MISMATCH'}"
        for m in shard_rec["meshes"])
    lines.append(
        f"Sharded persistent kernel on device (shard_map over the real chip, "
        f"box @ max_depth 100, vs unsharded kernel): {meshes}.")
    lines.append("")
    rp = ", ".join(
        f"{k}: dev {v['dev_vs_xla']:.1e} / ring-bitwise "
        f"{'yes' if v['ring_bitwise'] else 'NO'}"
        for k, v in replay_rec["fields"].items())
    lines.append(
        f"Replay-backward megakernel on device (box @ max_depth 100, vs XLA "
        f"wavefront replay, gate 2e-2 + K=8/16 bitwise invariance): {rp} "
        f"-> {'ok' if replay_rec['ok'] else 'FAIL'}.")
    lines.append("")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out_path}; failures={failures}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TPU_SMOKE.md"))
    ap.add_argument("--state", default="/tmp/tpu_smoke_state.json",
                    help="incremental per-scene state (tunnel-death resume); '' disables")
    a = ap.parse_args()
    raise SystemExit(run(a.width, a.height, a.spp, a.out, a.state or None))
