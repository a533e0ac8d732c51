"""Scratch: golden reconstruction experiments (not committed)."""
import os, sys, json, math
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp, numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.scene import (BLACK_BACKGROUND, SKY_GRADIENT,
    DIFFUSE, SPECULAR, DIELECTRIC, scene_from_spheres)
from cpu_path_tracing_tpu.models.camera import CameraConfig
sys.path.insert(0, "/root/repo/scripts")
from reconstruct import score, load_golden

W,H = 256,192
def render(scene, spp=8, max_depth=60, w=W, h=H):
    cfg = pt.RenderConfig(width=w, height=h, spp=spp, max_depth=max_depth)
    return np.asarray(jax.block_until_ready(pt.render_image(scene, cfg)))

SIMPLE_SPHERES = [
    (100.0, (0.0, -100.5, -1.0), (0.0, 0.0, 0.0), (0.8, 0.8, 0.0), DIFFUSE),
    (0.5, (1.0, 0.0, -1.0), (0.0, 0.0, 0.0), (0.999, 0.999, 0.999), SPECULAR),
    (0.5, (-1.0, 0.0, -1.0), (0.0, 0.0, 0.0), (0.999, 0.999, 0.999), DIELECTRIC),
    (0.5, (0.0, 0.0, -1.0), (0.1, 0.1, 0.9), (0.0, 0.7, 0.1), DIFFUSE),
    (1.0, (1.0, 3.1, -1.0), (30.0, 30.0, 30.0), (0.0, 0.0, 0.0), DIFFUSE),
]

def simple_variant(position=(-2,2,1), look_at=(0,0,-1), vfov=1.2, aperture=0.2,
                   focus=None, bg=BLACK_BACKGROUND, spheres=None):
    cam = CameraConfig.make(position=position, look_at=look_at,
        aspect_ratio=W/H, vertical_fov_radians=vfov, aperture=aperture,
        focus_distance=focus)
    return scene_from_spheres(spheres or SIMPLE_SPHERES, cam, background=bg)

if __name__ == "__main__":
    img = render(simple_variant())
    pt.write_png("/tmp/cand_newcam.png", img)
    print("new_camera:", json.dumps(score(img, "/root/reference/samples/new_camera.png")))
    print("depth_of_field:", json.dumps(score(img, "/root/reference/samples/depth_of_field.png")))
