"""Scene serialization: scenes as data files (SURVEY.md §5.6).

The reference selects scenes at *compile time* by swapping an ``#include``
(``src/main.cpp:23-25``) and editing C++ headers.  Here a scene is a JSON
document — users author/save/load scenes without touching the framework:

    {
      "camera": {"position": [...], "look_at": [...], "vfov": 0.75,
                 "aperture": 0.2, "up": [0,1,0], "focus_distance": null},
      "background": [[1,1,1],[0.5,0.7,1.0]],
      "spheres": [
        {"radius": 0.2, "center": [0,0.1,-1.4], "emission": [9,9,9],
         "albedo": [1.8,1.8,1.8], "material": "diffuse"},
        ...
      ]
    }

``aspect_ratio`` is derived from the render resolution at load time (exactly
like the built-in scene factories).  Round-trip is exact for unit-scale
scenes; giant anchor-parametrized walls re-derive their anchor on load (see
models/scene.py).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraConfig
from .scene import (
    DIFFUSE,
    DIELECTRIC,
    SPECULAR,
    Scene,
    scene_from_spheres,
)

MATERIAL_NAMES = {DIFFUSE: "diffuse", SPECULAR: "specular", DIELECTRIC: "dielectric"}
MATERIAL_IDS = {v: k for k, v in MATERIAL_NAMES.items()}


def scene_to_dict(scene: Scene) -> dict:
    """Scene pytree -> JSON-able dict (float64 NumPy view of the params)."""
    g = lambda x: np.asarray(jax.device_get(x), np.float64)
    centers = g(scene.p0) - g(scene.radius)[:, None] * g(scene.anchor_dir)
    cam = scene.camera
    spheres = [
        {
            "radius": float(g(scene.radius)[i]),
            "center": centers[i].tolist(),
            "emission": g(scene.emission)[i].tolist(),
            "albedo": g(scene.albedo)[i].tolist(),
            "material": MATERIAL_NAMES[int(np.asarray(scene.material)[i])],
            # Anchor of the numerically-stable parametrization (optional on
            # load; preserved so save->load round-trips p0 exactly).
            "anchor_dir": g(scene.anchor_dir)[i].tolist(),
        }
        for i in range(scene.num_spheres)
    ]
    return {
        "camera": {
            "position": g(cam.position).tolist(),
            "look_at": g(cam.look_at).tolist(),
            "up": g(cam.up).tolist(),
            "vfov": float(g(cam.vertical_fov_radians)),
            "aperture": float(g(cam.aperture)),
            "focus_distance": float(g(cam.focus_distance)),
            "origin_advance": float(g(cam.origin_advance)),
        },
        "background": g(scene.background).tolist(),
        "ior": float(scene.ior),
        "spheres": spheres,
    }


def scene_from_dict(d: dict, width: int, height: int, dtype=jnp.float32) -> Scene:
    """JSON dict -> Scene (aspect ratio from the render resolution)."""
    spheres = [
        (
            s["radius"],
            s["center"],
            s.get("emission", (0.0, 0.0, 0.0)),
            s["albedo"],
            MATERIAL_IDS[s.get("material", "diffuse")],
        )
        for s in d["spheres"]
    ]
    c = d["camera"]
    camera = CameraConfig.make(
        position=c["position"],
        look_at=c["look_at"],
        up=tuple(c.get("up", (0.0, 1.0, 0.0))),
        aspect_ratio=width / height,
        vertical_fov_radians=c["vfov"],
        aperture=c.get("aperture", 0.0),
        focus_distance=c.get("focus_distance"),
        origin_advance=c.get("origin_advance", 0.0),
        dtype=dtype,
    )
    background = d.get("background", ((1.0, 1.0, 1.0), (0.5, 0.7, 1.0)))
    anchor_dirs = None
    if all("anchor_dir" in s for s in d["spheres"]) and d["spheres"]:
        anchor_dirs = [s["anchor_dir"] for s in d["spheres"]]
    return scene_from_spheres(spheres, camera, dtype=dtype, background=background,
                              anchor_dirs=anchor_dirs,
                              ior=float(d.get("ior", 2.0)))


def save_scene(path: str, scene: Scene) -> None:
    with open(path, "w") as fh:
        json.dump(scene_to_dict(scene), fh, indent=1)


def load_scene(path: str, width: int, height: int, dtype=jnp.float32) -> Scene:
    with open(path) as fh:
        return scene_from_dict(json.load(fh), width, height, dtype=dtype)
