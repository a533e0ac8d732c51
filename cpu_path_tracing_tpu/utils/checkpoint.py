"""Progressive rendering with checkpoint / resume.

The reference keeps the whole image in RAM until the final PPM write
(``src/main.cpp:240-247``) and lists progressive rendering as future work
(``README.md:9``).  Here it is a first-class subsystem (SURVEY.md §5.4):

* radiance *sums* and the completed-sample count are checkpointed every
  ``flush_every`` sample batches;
* the counter-based RNG (ops/rng.py) keys each sample by its global sample
  index, so resuming from ``spp_done`` produces the bit-identical image the
  uninterrupted render would have produced;
* checkpoints are keyed by (scene fingerprint, config fingerprint, seed) and
  refuse to resume across a mismatch.

Format: a single .npz (portable, dependency-free).  Inverse-rendering
checkpoints (``InvertState`` below) store the optimizable params, the optax
optimizer state and the step counter the same way, fingerprint-keyed so a
resumed optimization continues exactly where the preempted one stopped
(``cli.py cmd_invert --checkpoint``).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..models.scene import Scene
from ..render import finalize_image, render_cells_range


def _fingerprint(scene: Scene, cfg: RenderConfig) -> str:
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(scene):
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    # Fields that change the per-sample computation (spp excluded: resuming
    # with a different total is legitimate).
    key = {f: getattr(cfg, f) for f in (
        "width", "height", "num_subpixels", "max_depth", "rr_depth", "seed",
        "epsilon", "inf")}
    h.update(json.dumps(key, sort_keys=True).encode())
    return h.hexdigest()[:16]


@dataclasses.dataclass
class ProgressiveState:
    sums: np.ndarray  # [num_cells, 3] radiance sums over completed samples
    spp_done: int
    fingerprint: str

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        np.savez(tmp, sums=self.sums, spp_done=self.spp_done, fingerprint=self.fingerprint)
        os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)

    @staticmethod
    def load(path: str) -> "ProgressiveState":
        z = np.load(path, allow_pickle=False)
        return ProgressiveState(
            sums=z["sums"], spp_done=int(z["spp_done"]), fingerprint=str(z["fingerprint"])
        )


def _flatten_for_npz(tree) -> dict:
    """Pytree -> {leaf_000: array, ...} (structure supplied at load time)."""
    leaves = jax.tree.leaves(tree)
    return {f"leaf_{i:03d}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}


def _unflatten_from_npz(z, prefix: str, template):
    """Rebuild a pytree with ``template``'s structure from saved leaves."""
    treedef = jax.tree.structure(template)
    t_leaves = jax.tree.leaves(template)
    leaves = []
    for i, tl in enumerate(t_leaves):
        arr = z[f"{prefix}leaf_{i:03d}"]
        leaves.append(jnp.asarray(arr, getattr(tl, "dtype", arr.dtype)))
    return jax.tree.unflatten(treedef, leaves)


@dataclasses.dataclass
class InvertState:
    """Inverse-rendering checkpoint: params + optax state + step (§5.4).

    Saved as one .npz; the pytree *structures* are not serialized — they are
    rebuilt at load time from templates (params from ``split_params``, opt
    state from ``optimizer.init``), which is safe because the fingerprint
    pins scene/config/fields so the structures are identical by construction.
    """

    params: object
    opt_state: object
    step: int
    fingerprint: str

    def save(self, path: str) -> None:
        payload = {f"params_{k}": v for k, v in _flatten_for_npz(self.params).items()}
        payload.update({f"opt_{k}": v for k, v in _flatten_for_npz(self.opt_state).items()})
        tmp = path + ".tmp"
        np.savez(tmp, step=self.step, fingerprint=self.fingerprint, **payload)
        os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)

    @staticmethod
    def load(path: str, params_template, opt_state_template) -> "InvertState":
        z = np.load(path, allow_pickle=False)
        return InvertState(
            params=_unflatten_from_npz(z, "params_", params_template),
            opt_state=_unflatten_from_npz(z, "opt_", opt_state_template),
            step=int(z["step"]),
            fingerprint=str(z["fingerprint"]),
        )


def invert_fingerprint(scene: Scene, cfg: RenderConfig, fields, lr: float,
                       cell_chunk=None, sample_chunk=None, mesh_shape=None) -> str:
    """Fingerprint for inverse-mode checkpoints: the render fingerprint plus
    everything that shapes the optimization trajectory.  The accumulation
    chunk sizes are included because a resume under different chunking
    reorders float accumulation — the continued trajectory is bitwise-exact
    only under unchanged chunking.  The mesh shape is included for the same
    reason: sharded gradient accumulation (psum across shards vs sequential)
    reorders the float sums, so a single-chip checkpoint must not silently
    continue under --mesh (or a different mesh).

    ``mesh_shape``: (n_tiles, n_samples) tuple, or None for single-chip."""
    h = hashlib.sha256()
    h.update(_fingerprint(scene, cfg).encode())
    h.update(json.dumps({"fields": sorted(fields), "lr": lr, "spp": cfg.spp,
                         "cell_chunk": cell_chunk, "sample_chunk": sample_chunk,
                         "mesh": list(mesh_shape) if mesh_shape else None}).encode())
    return h.hexdigest()[:16]


def load_or_init_invert(
    path: Optional[str], fingerprint: str, params, opt_state
) -> InvertState:
    """Resume from ``path`` when it exists and matches, else a fresh state."""
    if path and os.path.exists(path):
        state = InvertState.load(path, params, opt_state)
        if state.fingerprint != fingerprint:
            raise ValueError(
                f"invert checkpoint {path} was written for a different "
                f"scene/config/optimizer (fingerprint {state.fingerprint} != {fingerprint})"
            )
        return state
    return InvertState(params=params, opt_state=opt_state, step=0, fingerprint=fingerprint)


def render_progressive(
    scene: Scene,
    cfg: RenderConfig,
    checkpoint_path: Optional[str] = None,
    flush_every: int = 0,
    progress: Optional[Callable[[int, int], None]] = None,
    preview_path: Optional[str] = None,
):
    """Render cfg.spp samples/cell in batches, checkpointing along the way.

    Resumes from ``checkpoint_path`` if it exists and matches.  Returns the
    final linear image [H,W,3].  ``preview_path``: write the partial image
    there after every flush — encoded on the native writer thread
    (utils/image.write_png_async) so previews overlap with device compute.
    """
    flush_every = flush_every or cfg.checkpoint_every or cfg.spp
    fp = _fingerprint(scene, cfg)
    cell_ids = jnp.arange(cfg.num_cells, dtype=jnp.int32)

    state = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        state = ProgressiveState.load(checkpoint_path)
        if state.fingerprint != fp:
            raise ValueError(
                f"checkpoint {checkpoint_path} was written for a different "
                f"scene/config (fingerprint {state.fingerprint} != {fp})"
            )
    if state is None:
        state = ProgressiveState(
            sums=np.zeros((cfg.num_cells, 3), np.float32), spp_done=0, fingerprint=fp
        )

    from .profiling import annotate

    run = jax.jit(
        lambda sc, ids, start, n: render_cells_range(sc, cfg, ids, start, n),
        static_argnames=("n",),
    )
    while state.spp_done < cfg.spp:
        n = min(flush_every, cfg.spp - state.spp_done)
        with annotate("render_batch"):
            batch = run(scene, cell_ids, state.spp_done, n)
        with annotate("checkpoint_flush"):
            state.sums = state.sums + np.asarray(batch)
            state.spp_done += n
            if checkpoint_path:
                state.save(checkpoint_path)
        if preview_path and state.spp_done < cfg.spp:
            from .image import write_png_async

            with annotate("preview_encode"):
                partial = finalize_image(
                    jnp.asarray(state.sums) / state.spp_done, cfg
                )
                write_png_async(preview_path, np.asarray(partial, np.float32))
        if progress:
            progress(state.spp_done, cfg.spp)

    means = jnp.asarray(state.sums) / cfg.spp
    if preview_path:
        from .image import flush_async_writes

        flush_async_writes()
    return finalize_image(means, cfg)
