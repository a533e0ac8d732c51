"""Gradient correctness: jax.grad vs central finite differences
(SURVEY.md §4d; BASELINE.json pixel-gradient parity target).

FD oracles run in float64 through the *same* code path; discrete decisions
(hit ids, RR, dielectric branch) are locally constant at the tested points,
so grad and FD must agree tightly away from visibility edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.grad import cell_loss, merge_params, split_params, train_step

CFG = pt.RenderConfig(width=12, height=8, spp=2, max_depth=8, loop="scan")


def _setup(name="box", fields=("p0", "radius", "albedo")):
    scene = pt.get_scene(name, CFG.width, CFG.height, dtype=jnp.float64)
    cell_ids = jnp.arange(CFG.num_cells, dtype=jnp.int32)
    from cpu_path_tracing_tpu.render import render_cells

    # Same seed as the render inside the loss: common random numbers — the
    # loss is exactly 0 at the true parameters (no Monte-Carlo noise floor).
    target = render_cells(scene, CFG, cell_ids)
    params = split_params(scene, fields)
    return scene, cell_ids, target, params


def _fd(fn, params, leaf, idx, eps):
    flat = params[leaf].reshape(-1)
    up = flat.at[idx].add(eps).reshape(params[leaf].shape)
    dn = flat.at[idx].add(-eps).reshape(params[leaf].shape)
    fp = fn({**params, leaf: up})
    fm = fn({**params, leaf: dn})
    return (fp - fm) / (2 * eps)


@pytest.mark.parametrize("leaf,eps", [("p0", 1e-5), ("radius", 1e-5), ("albedo", 1e-5)])
def test_grad_matches_fd_scene_params(leaf, eps):
    scene, cell_ids, target, params = _setup()

    def loss(p):
        return cell_loss(p, scene, CFG, cell_ids, target)

    g = jax.grad(loss)(params)[leaf]
    g = np.asarray(g).reshape(-1)

    rng = np.random.default_rng(0)
    n_leaf = g.size
    # Probe small spheres' entries (indices 5..8 of the box scene are the
    # light/mirror/glass); wall entries too.
    idxs = rng.choice(n_leaf, size=min(6, n_leaf), replace=False)
    for i in idxs:
        fd = float(_fd(loss, params, leaf, int(i), eps))
        scale = max(abs(fd), abs(g[i]), 1e-3)
        assert abs(fd - g[i]) / scale < 5e-3, (leaf, i, fd, g[i])


def test_grad_camera_params():
    scene, cell_ids, target, _ = _setup()

    def loss_cam(pos):
        cam = jax.tree_util.tree_map(lambda x: x, scene.camera)
        import dataclasses

        cam = dataclasses.replace(cam, position=pos)
        sc = dataclasses.replace(scene, camera=cam)
        from cpu_path_tracing_tpu.render import render_cells_range

        cells = render_cells_range(sc, CFG, cell_ids, 0, CFG.spp) / CFG.spp
        return jnp.mean((cells - target) ** 2)

    pos = scene.camera.position
    g = np.asarray(jax.grad(loss_cam)(pos))
    eps = 1e-6
    for axis in range(3):
        fp = float(loss_cam(pos.at[axis].add(eps)))
        fm = float(loss_cam(pos.at[axis].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        scale = max(abs(fd), abs(g[axis]), 1e-3)
        assert abs(fd - g[axis]) / scale < 5e-3, (axis, fd, g[axis])


def test_inverse_rendering_recovers_albedo():
    """Perturb the box-scene albedos; Adam on pixel MSE must drive both the
    loss and the albedo error down (the BASELINE.json inverse config, shrunk)."""
    import optax

    scene, cell_ids, target, _ = _setup(fields=("albedo",))
    true_albedo = scene.albedo
    params = {"albedo": jnp.clip(true_albedo + 0.15, 0.05, None)}
    optimizer = optax.adam(3e-2)
    opt_state = optimizer.init(params)

    def loss_of(p):
        return float(cell_loss(p, scene, CFG, cell_ids, target))

    l0 = loss_of(params)
    err0 = float(jnp.abs(params["albedo"] - true_albedo).mean())
    for _ in range(30):
        params, opt_state, loss = train_step(
            params, opt_state, scene, CFG, optimizer, cell_ids, target
        )
    l1 = float(loss)
    err1 = float(jnp.abs(params["albedo"] - true_albedo).mean())
    assert l1 < 0.3 * l0, (l0, l1)
    assert err1 < 0.5 * err0, (err0, err1)
