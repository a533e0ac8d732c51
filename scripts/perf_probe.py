"""Measured machine constants for the PERF.md roofline model.

Measures, on the attached chip, the empirical peaks this framework's
speed-of-light accounting is judged against (SURVEY.md §5.1 "roofline
estimates"; the reference has no analog — its only profiling hook is
clang's compile-time -ftime-trace, CMakeLists.txt:10-15):

  * f32 VPU fma throughput (pallas kernel, register-resident blocks)
  * f32 transcendental throughput (sin; sqrt/rsqrt rate separately)
  * uint32 ALU throughput (the add/rotl/xor mix of one Threefry round)
  * threefry2x32 blocks/s (the production cipher, ops/rng.py)
  * HBM stream bandwidth (read+write of a large f32 array)

Usage: python scripts/perf_probe.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from cpu_path_tracing_tpu.ops.rng import threefry2x32  # noqa: E402

ROWS, LANE = 64, 128  # 8 vregs per (ROWS, LANE) f32 block


def _time(fn, *args, reps=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def _bench_kernel(body, n_arrays, iters, dtype=jnp.float32):
    """grid=(1,) kernel: n_arrays independent (ROWS,LANE) blocks, fori_loop
    of `iters` applications of `body` per block; sums into the output so
    nothing is dead-code eliminated."""

    def kernel(*refs):
        *ins, out = refs
        xs = [r[...] for r in ins]

        def step(i, xs):
            return tuple(body(x, i) for x in xs)

        xs = jax.lax.fori_loop(0, iters, step, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        out[...] = acc

    @jax.jit
    def run(*xs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_arrays,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*xs)

    xs = [jnp.full((ROWS, LANE), 1.0 + 1e-7 * i, dtype) for i in range(n_arrays)]
    if dtype == jnp.uint32:
        xs = [jnp.full((ROWS, LANE), 12345 + i, dtype) for i in range(n_arrays)]
    return _time(run, *xs)


def probe():
    dev = jax.devices()[0]
    out = {"device": str(dev), "platform": dev.platform}

    n_arr, iters = 8, 2048
    elems = n_arr * ROWS * LANE

    # f32 fma peak: x*a+b = 2 flops (1 fma issue)
    t = _bench_kernel(lambda x, i: x * np.float32(1.0000001) + np.float32(1e-9), n_arr, iters)
    out["vpu_f32_fma_gflops"] = round(2 * elems * iters / t / 1e9, 1)
    out["vpu_f32_fma_gops"] = round(elems * iters / t / 1e9, 1)  # fma issues/s

    # pure add chain (1 op)
    t = _bench_kernel(lambda x, i: x + np.float32(1e-9), n_arr, iters)
    out["vpu_f32_add_gops"] = round(elems * iters / t / 1e9, 1)

    # transcendentals
    t = _bench_kernel(lambda x, i: jnp.sin(x), n_arr, 256)
    out["vpu_sin_gops"] = round(elems * 256 / t / 1e9, 2)
    t = _bench_kernel(lambda x, i: jnp.sqrt(x + np.float32(1e-9)), n_arr, 512)
    out["vpu_sqrt_gops"] = round(elems * 512 / t / 1e9, 2)
    t = _bench_kernel(lambda x, i: jax.lax.rsqrt(x + np.float32(1e-9)), n_arr, 512)
    out["vpu_rsqrt_gops"] = round(elems * 512 / t / 1e9, 2)
    t = _bench_kernel(
        lambda x, i: jnp.where(x > np.float32(0.5), x * np.float32(0.9999), x + np.float32(1e-6)),
        n_arr, 1024)
    out["vpu_select_chain_gops"] = round(elems * 1024 / t / 1e9, 2)

    # one threefry round on uint32: x0+=x1; rotl(x1,13); x1^=x0  (~5 issues)
    def tf_round(x, i):
        y = x + jnp.uint32(0x9E3779B9)
        r = (y << 13) | (y >> 19)
        return r ^ x

    t = _bench_kernel(tf_round, n_arr, 1024, dtype=jnp.uint32)
    out["vpu_u32_round_mix_gops"] = round(elems * 1024 / t / 1e9, 2)
    out["vpu_u32_round_mix_g_rounds"] = round(elems * 1024 / t / 1e9, 2)

    # full production cipher rate (elements/s of 2-word blocks)
    def tf_body(x, i):
        a, b = threefry2x32(x, x ^ jnp.uint32(7), x, x + jnp.uint32(i))
        return a ^ b

    t = _bench_kernel(tf_body, 2, 64, dtype=jnp.uint32)
    out["threefry2x32_gblocks_per_s"] = round(2 * ROWS * LANE * 64 / t / 1e9, 3)

    # HBM stream: y = x + 1 over 256 MiB -> 512 MiB moved
    n = 1 << 26
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def stream(x):
        return x + 1.0

    t = _time(stream, x, reps=10)
    out["hbm_stream_gbps"] = round(2 * 4 * n / t / 1e9, 1)

    # HBM copy via pallas grid kernel (blocked): same stream through VMEM
    blk = 1 << 19

    def copy_kernel(i_ref, o_ref):
        o_ref[...] = i_ref[...] * np.float32(2.0)

    @jax.jit
    def pallas_stream(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(n // blk,),
            in_specs=[pl.BlockSpec((blk // LANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk // LANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // LANE, LANE), jnp.float32),
        )(x)

    x2 = x.reshape(n // LANE, LANE)
    t = _time(pallas_stream, x2, reps=10)
    out["hbm_pallas_stream_gbps"] = round(2 * 4 * n / t / 1e9, 1)

    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    res = probe()
    line = json.dumps(res)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
