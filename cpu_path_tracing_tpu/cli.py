"""Command-line interface.

Replaces the reference's single positional argument (total spp,
``src/main.cpp:203-206``) and its compile-time scene/resolution constants
with a real CLI: ``render`` / ``invert`` / ``bench`` subcommands, scenes by
name, checkpoint/resume, sharded execution, profiling.

For reference-compatibility, ``--total-spp N`` mimics the reference semantics
(N is divided by num_subpixels^2, ``src/main.cpp:206``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import RenderConfig, get_scene, scene_names, write_png, write_ppm
from .render import finalize_image
from .utils.checkpoint import render_progressive
from .utils.metrics import ProgressLogger, RenderReport, Timer
from .utils.profiling import maybe_trace


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--scene", default="box_mirror", choices=scene_names())
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=768)
    sp = p.add_mutually_exclusive_group()
    sp.add_argument("--spp", type=int, default=None, help="samples per subpixel cell")
    sp.add_argument(
        "--total-spp", type=int, default=None,
        help="total spp as in the reference CLI (divided by subpixels^2)",
    )
    p.add_argument("--subpixels", type=int, default=2)
    p.add_argument("--max-depth", type=int, default=100)
    p.add_argument("--rr-depth", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--integrator", choices=("auto", "wavefront", "pallas", "batch"), default="auto")
    p.add_argument("--lanes", type=int, default=1 << 19, help="wavefront lane-pool width")
    p.add_argument("--profile-dir", default=None, help="capture a jax.profiler trace here")
    p.add_argument("--mesh", default=None, help="TILESxSAMPLES device mesh, e.g. 4x2")
    # Multi-host process group (parallel/distributed.py); one process/host.
    p.add_argument("--coordinator", default=None, help="process-0 address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--shard-dir", default=None,
        help="zero-collective mode: each host writes its tile shard here",
    )


def _config(args) -> RenderConfig:
    spp = args.spp
    if spp is None:
        total = args.total_spp if args.total_spp is not None else 4
        spp = max(1, total // (args.subpixels * args.subpixels))
    return RenderConfig(
        width=args.width,
        height=args.height,
        spp=spp,
        num_subpixels=args.subpixels,
        max_depth=args.max_depth,
        rr_depth=args.rr_depth,
        seed=args.seed,
        integrator=args.integrator,
        wavefront_lanes=args.lanes,
    )


def _write(path: str, image) -> None:
    if path.endswith(".ppm"):
        write_ppm(path, image)
    else:
        write_png(path, image)


def cmd_render(args) -> int:
    if args.num_processes:
        return _render_multihost(args)
    cfg = _config(args)
    scene = get_scene(args.scene, cfg.width, cfg.height)

    with maybe_trace(args.profile_dir):
        with Timer() as t:
            if args.mesh:
                from .parallel.mesh import make_mesh
                from .parallel.render import render_image_sharded

                n_tiles, n_samples = (int(v) for v in args.mesh.split("x"))
                img = render_image_sharded(scene, cfg, make_mesh(n_tiles, n_samples))
            elif args.tile_cells:
                from .orchestrator import FaultInjector, render_tiled

                injector = (
                    FaultInjector.parse(args.inject_fault) if args.inject_fault else None
                )
                img = render_tiled(
                    scene, cfg,
                    tile_cells=args.tile_cells,
                    checkpoint_path=args.checkpoint,
                    max_retries=args.max_retries,
                    fault_injector=injector,
                    progress=ProgressLogger(cfg.total_spp),
                )
            elif args.checkpoint:
                img = render_progressive(
                    scene, cfg, args.checkpoint, args.flush_every,
                    progress=ProgressLogger(cfg.total_spp),
                )
            else:
                from .render import render_image

                img = render_image(scene, cfg)
            img = jax.block_until_ready(img)

    _write(args.out, np.asarray(img))
    n_rays = cfg.num_cells * cfg.spp
    print(
        f"{args.scene} {cfg.width}x{cfg.height} @ {cfg.total_spp} total spp "
        f"-> {args.out} in {t.seconds:.2f}s ({n_rays / 1e6:.1f}M camera rays)",
        file=sys.stderr,
    )
    return 0


def _render_multihost(args) -> int:
    """Multi-process render: one process per host (parallel/distributed.py).

    Replicated mode (default): the image is all-gathered and process 0 writes
    it.  Shard mode (--shard-dir): zero cross-host collectives — every
    process writes only its own tile shard, then process 0 assembles.
    """
    from .parallel.distributed import (
        assemble_shards,
        global_mesh,
        init_distributed,
        render_image_multihost,
        render_shard_multihost,
        write_shards,
    )

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    cfg = _config(args)
    scene = get_scene(args.scene, cfg.width, cfg.height)
    mesh = global_mesh(n_samples=int(args.mesh.split("x")[1]) if args.mesh else 1)
    pid = jax.process_index()

    with Timer() as t:
        if args.shard_dir:
            shards = render_shard_multihost(scene, cfg, mesh)
            write_shards(args.shard_dir, shards, cfg, pid)
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("shards_written")
            img = assemble_shards(args.shard_dir, cfg) if pid == 0 else None
        else:
            img = jax.block_until_ready(render_image_multihost(scene, cfg, mesh))
    if pid == 0:
        _write(args.out, np.asarray(img))
        print(
            f"[multihost {jax.process_count()} procs x "
            f"{jax.local_device_count()} devices] {args.scene} "
            f"{cfg.width}x{cfg.height} @ {cfg.total_spp} total spp -> "
            f"{args.out} in {t.seconds:.2f}s",
            file=sys.stderr,
        )
    return 0


def cmd_invert(args) -> int:
    import optax

    from .grad import cell_loss, split_params, train_step
    from .render import render_cells

    cfg = _config(args).replace(loop="scan", integrator="batch")
    scene = get_scene(args.scene, cfg.width, cfg.height)
    cell_ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    target = render_cells(scene, cfg, cell_ids)

    fields = tuple(args.fields.split(","))
    params = split_params(scene, fields)
    true_params = params
    rng = np.random.default_rng(args.seed)
    params = jax.tree.map(
        lambda x: x + jnp.asarray(rng.normal(0, args.perturb, x.shape), x.dtype), params
    )
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    for step in range(args.steps):
        params, opt_state, loss = train_step(
            params, opt_state, scene, cfg, optimizer, cell_ids, target
        )
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            errs = jax.tree.map(
                lambda p, tp: float(jnp.abs(p - tp).mean()), params, true_params
            )
            print(json.dumps({"step": step, "loss": float(loss), "mean_abs_err": errs}))
    return 0


def cmd_bench(args) -> int:
    from .ops.wavefront import render_wavefront, render_wavefront_pallas

    cfg = _config(args)
    scene = get_scene(args.scene, cfg.width, cfg.height)
    ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)
    integ = cfg.integrator
    if integ == "auto":
        integ = "pallas" if jax.default_backend() == "tpu" else "wavefront"
    wf = render_wavefront_pallas if integ == "pallas" else render_wavefront
    f = jax.jit(
        lambda s, i: wf(s, cfg, i, 0, cfg.spp, with_stats=True)
    )
    out, stats = f(scene, ids)
    jax.block_until_ready(out)  # compile + warm
    best, segments = None, 0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out, stats = f(scene, ids)
        segments = int(stats["segments"])
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rep = RenderReport(
        scene=args.scene, width=cfg.width, height=cfg.height,
        total_spp=cfg.total_spp, seconds=best, segments=segments,
        camera_rays=cfg.num_cells * cfg.spp,
    )
    print(rep.to_json())
    print(rep.summary(), file=sys.stderr)
    return 0


def main(argv=None) -> int:
    # Make the JAX_PLATFORMS env var authoritative: plugin sitecustomize hooks
    # (e.g. the axon TPU tunnel) set jax_platforms via jax.config, which
    # silently outranks the env var; re-assert the user's choice.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser(prog="cpu_path_tracing_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a scene to PNG/PPM")
    _add_common(pr)
    pr.add_argument("-o", "--out", default="image.png")
    pr.add_argument("--checkpoint", default=None, help="progressive checkpoint path (.npz)")
    pr.add_argument("--flush-every", type=int, default=0, help="samples per checkpoint flush")
    pr.add_argument(
        "--tile-cells", type=int, default=0,
        help="render as independent retried tiles of this many cells "
             "(fault-tolerant path; 0 = single launch)",
    )
    pr.add_argument("--max-retries", type=int, default=2, help="retries per failed tile")
    pr.add_argument(
        "--inject-fault", default=None, metavar="TILE[:TIMES],...",
        help="fault injection: fail these tiles on their first TIMES attempts",
    )
    pr.set_defaults(fn=cmd_render)

    pi = sub.add_parser("invert", help="inverse rendering (recover scene params)")
    _add_common(pi)
    pi.add_argument("--steps", type=int, default=100)
    pi.add_argument("--lr", type=float, default=1e-2)
    pi.add_argument("--fields", default="p0,radius,albedo")
    pi.add_argument("--perturb", type=float, default=0.05)
    pi.set_defaults(fn=cmd_invert)

    pb = sub.add_parser("bench", help="throughput benchmark")
    _add_common(pb)
    pb.add_argument("--repeats", type=int, default=3)
    pb.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
