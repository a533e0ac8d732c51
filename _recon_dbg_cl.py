import os, sys, json
os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo/scripts")
import importlib
lab = importlib.import_module("_recon_lab")
import numpy as np
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.scene import DIFFUSE, SPECULAR, DIELECTRIC, scene_from_spheres
from cpu_path_tracing_tpu.models.camera import CameraConfig
sweep2 = importlib.import_module("_recon_sweep2")
sc = sweep2.cl_scene(le=9.0)
print("p0:", np.asarray(sc.p0))
print("radius:", np.asarray(sc.radius))
print("emission:", np.asarray(sc.emission)[:,0])
img = lab.render(sc, spp=4, max_depth=20, w=64, h=48)
print("mean", img.mean(), "max", img.max())
