import os, sys
os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo/scripts")
import importlib
lab = importlib.import_module("_recon_lab")
import numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.scene import DIFFUSE, SPECULAR, DIELECTRIC, scene_from_spheres
from cpu_path_tracing_tpu.models.camera import CameraConfig
W,H = 64,48
big, off, z = 1e6, 0.4, -1.0
walls = [
    (big, (-big-off, 0, z), (0,0,0), (0.9,0.1,0.2), DIFFUSE),
    (big, ( big+off, 0, z), (0,0,0), (0.3,0.1,0.9), DIFFUSE),
    (big, (0,0,z-big),     (0,0,0), (0.9,0.9,0.9), DIFFUSE),
    (big, (0, big+off, z), (0,0,0), (0.3,0.7,0.2), DIFFUSE),
    (big, (0,-big-off, z), (0,0,0), (0.9,0.9,0.9), DIFFUSE),
]
light = [(0.12, (0.0, 0.05, z-0.15), (9.,9.,9.), (1.0,1.0,1.0), DIFFUSE)]
cam = CameraConfig.make(position=(0,0,2.0), look_at=(0,0,z+off*1.5),
    aspect_ratio=W/H, vertical_fov_radians=0.75, aperture=0.2)
for label, spheres in [("walls-only", walls), ("walls+light", walls+light)]:
    sc = scene_from_spheres(spheres, cam)
    img = lab.render(sc, spp=4, max_depth=20, w=W, h=H)
    print(label, "mean", img.mean(), "max", img.max())
# also: box scene sanity at same size
sc = pt.get_scene("box", W, H)
img = lab.render(sc, spp=4, max_depth=20, w=W, h=H)
print("box", "mean", img.mean(), "max", img.max())
