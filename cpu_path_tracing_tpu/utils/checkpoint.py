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
optimizer state uses orbax (see cli.py invert).
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

    run = jax.jit(
        lambda sc, ids, start, n: render_cells_range(sc, cfg, ids, start, n),
        static_argnames=("n",),
    )
    while state.spp_done < cfg.spp:
        n = min(flush_every, cfg.spp - state.spp_done)
        batch = run(scene, cell_ids, state.spp_done, n)
        state.sums = state.sums + np.asarray(batch)
        state.spp_done += n
        if checkpoint_path:
            state.save(checkpoint_path)
        if preview_path and state.spp_done < cfg.spp:
            from .image import write_png_async

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
