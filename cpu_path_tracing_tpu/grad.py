"""Differentiable rendering and inverse rendering.

The reference has no analog — this is the capability the TPU build adds on
top of reproducing it (BASELINE.json north star: pixel gradients w.r.t.
sphere centers/radii, albedos and camera parameters through the
re-parameterized bounce loop; inverse rendering on box_scene).

Estimator: the 'scan' integrator path (fixed trip count — reverse-mode
differentiable, unlike lax.while_loop) with detached discrete decisions; see
ops/integrator.py.  The loss lives in linear radiance space on subpixel cells
(before the clamp of src/main.cpp:195-196, which would zero gradients for
bright pixels).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .config import RenderConfig
from .models.scene import Scene
from .render import render_cells_range
from .parallel.mesh import SAMPLE_AXIS, TILE_AXIS

# Scene fields that may be optimized.
OPTIMIZABLE = ("p0", "radius", "albedo", "emission", "camera", "background")


def split_params(scene: Scene, fields=("p0", "radius", "albedo")) -> Dict[str, Any]:
    """Extract an optimizable parameter pytree from a scene."""
    bad = set(fields) - set(OPTIMIZABLE)
    if bad:
        raise ValueError(f"cannot optimize {sorted(bad)}; allowed: {OPTIMIZABLE}")
    return {f: getattr(scene, f) for f in fields}


def merge_params(scene: Scene, params: Dict[str, Any]) -> Scene:
    return dataclasses.replace(scene, **params)


def _diff_cfg(cfg: RenderConfig) -> RenderConfig:
    if cfg.loop == "scan" and cfg.integrator == "batch":
        return cfg
    return cfg.replace(loop="scan", integrator="batch")


def cell_loss(params, scene: Scene, cfg: RenderConfig, cell_ids, target_cells,
              sample_start=0, num_samples=None):
    """Mean squared error between rendered cell radiance and target [B,3]."""
    cfg = _diff_cfg(cfg)
    ns = cfg.spp if num_samples is None else num_samples
    sc = merge_params(scene, params)
    cells = render_cells_range(sc, cfg, cell_ids, sample_start, ns) / ns
    return jnp.mean((cells - target_cells) ** 2)


@partial(jax.jit, static_argnames=("cfg", "optimizer"))
def train_step(params, opt_state, scene: Scene, cfg: RenderConfig, optimizer,
               cell_ids, target_cells):
    """Single-device inverse-rendering step (optax)."""
    loss, grads = jax.value_and_grad(cell_loss)(params, scene, cfg, cell_ids, target_cells)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params, opt_state, loss


def make_sharded_train_step(mesh, cfg: RenderConfig, optimizer):
    """Mesh-parallel training step: cells sharded over 'tiles', samples over
    'samples', scene/optimizer state replicated, gradients psum-reduced over
    both axes (overlappable with the backward pass by XLA).  The inverse-mode
    collective layout of SURVEY.md §5.8.
    """
    cfg = _diff_cfg(cfg)
    n_samp = mesh.shape[SAMPLE_AXIS]
    if cfg.spp % n_samp:
        raise ValueError(f"spp={cfg.spp} not divisible by sample axis {n_samp}")
    spp_local = cfg.spp // n_samp

    def shard_fn(params, opt_state, scene, cell_ids, target_cells):
        # Varying over the sample axis too — see parallel/render.py.
        cell_ids = jax.lax.pcast(cell_ids, SAMPLE_AXIS, to="varying")

        def local_loss(p):
            s0 = jax.lax.axis_index(SAMPLE_AXIS) * spp_local
            sc = merge_params(scene, p)
            cells = render_cells_range(sc, cfg, cell_ids, s0, spp_local)
            cells = jax.lax.psum(cells, SAMPLE_AXIS) / cfg.spp
            return jnp.mean((cells - target_cells) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # Mean over tile shards (each shard's loss is already a mean).
        loss = jax.lax.pmean(loss, TILE_AXIS)
        grads = jax.lax.pmean(grads, TILE_AXIS)
        # Sample-axis grads: local_loss already saw the psum over samples, so
        # each sample shard computes the full gradient; pmean for bitwise
        # agreement across the axis.
        grads = jax.lax.pmean(grads, SAMPLE_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(TILE_AXIS), P(TILE_AXIS)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(fn)
