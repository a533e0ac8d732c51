"""Multi-host distributed rendering (SURVEY.md §5.8, parallel/distributed.py).

Real 2-process integration tests: each test launches two OS processes that
join a jax.distributed process group over a local coordinator (Gloo CPU
collectives — the single-machine rehearsal of a TPU pod-slice launch) and
render a global tile-sharded image.  Verifies both communication modes:

* replicated mode — one final all-gather, process 0 writes the PNG;
* shard mode     — ZERO cross-host collectives; every process writes its own
  tile shard, process 0 assembles.

Both must be bit-identical to the single-process render.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.render import render_image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, SPP, DEPTH = 32, 24, 2, 6


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(nprocs: int, extra, tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PALLAS_AXON_POOL_IPS="",  # keep the TPU-tunnel sitecustomize out
    )
    base = [
        sys.executable, "-m", "cpu_path_tracing_tpu.cli", "render",
        "--scene", "box", "--width", str(W), "--height", str(H),
        "--spp", str(SPP), "--max-depth", str(DEPTH), "--integrator", "batch",
        "--num-processes", str(nprocs), "--coordinator", f"127.0.0.1:{port}",
        "-o", str(tmp_path / "image.png"),
    ] + extra
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(p)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(nprocs)
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"proc failed:\n{out}\n{err}"


@pytest.fixture(scope="module")
def single_png(tmp_path_factory):
    cfg = pt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH, integrator="batch")
    scene = pt.get_scene("box", W, H)
    img = render_image(scene, cfg)
    path = tmp_path_factory.mktemp("single") / "image.png"
    pt.write_png(str(path), np.asarray(img))
    return path.read_bytes()


@pytest.mark.slow
def test_two_process_replicated_matches_single(single_png, tmp_path):
    _launch(2, [], tmp_path)
    assert (tmp_path / "image.png").read_bytes() == single_png


@pytest.mark.slow
def test_two_process_shard_mode_matches_single(single_png, tmp_path):
    shard_dir = tmp_path / "shards"
    _launch(2, ["--shard-dir", str(shard_dir)], tmp_path)
    assert (tmp_path / "image.png").read_bytes() == single_png
    names = sorted(os.listdir(shard_dir))
    assert names == ["shard_00000.npz", "shard_00001.npz"]


def test_assemble_detects_missing_shard(tmp_path):
    from cpu_path_tracing_tpu.parallel.distributed import assemble_shards, write_shards

    cfg = pt.RenderConfig(width=4, height=2, spp=1)
    n = cfg.num_cells
    half = np.zeros((n // 2, 3), np.float32)
    write_shards(str(tmp_path), [(0, n // 2, half)], cfg, 0)
    with pytest.raises(ValueError, match="missing"):
        assemble_shards(str(tmp_path), cfg)
    write_shards(str(tmp_path), [(n // 2, n, half)], cfg, 1)
    img = assemble_shards(str(tmp_path), cfg)
    assert img.shape == (2, 4, 3)
