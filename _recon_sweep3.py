import os, sys, json
os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo/scripts")
import importlib
lab = importlib.import_module("_recon_lab")
from reconstruct import score
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.scene import DIFFUSE, SPECULAR, DIELECTRIC, scene_from_spheres
from cpu_path_tracing_tpu.models.camera import CameraConfig
W,H = lab.W, lab.H
big, off, z = 1e6, 0.4, -1.0

GOLD_GP = "/root/reference/samples/greenish_party.png"
def gp_scene(lR=10.0, cap=0.001, em=(5.,5.,5.), srad=0.16, vfov=0.75,
             mx=-0.12, gx=0.18, mz=-1.0, gz=-0.75):
    spheres = [
        (big, (-big-off, 0, z), (0,0,0), (0.9,0.1,0.2), DIFFUSE),
        (big, ( big+off, 0, z), (0,0,0), (0.3,0.1,0.9), DIFFUSE),
        (big, (0,0,z-big),     (0,0,0), (0.1,0.7,0.2), DIFFUSE),
        (big, (0, big+off, z), (0,0,0), (0.3,0.7,0.2), DIFFUSE),
        (big, (0,-big-off, z), (0,0,0), (0.9,0.9,0.9), DIFFUSE),
        (lR, (0.0, lR+off-cap, z), em, (1.0,1.0,1.0), DIFFUSE),
        (srad, (mx, -off+srad, mz), (0,0,0), (1.0,1.0,1.0), SPECULAR),
        (srad, (gx, -off+srad, gz), (0,0,0), (1.0,1.0,1.0), DIELECTRIC),
    ]
    cam = CameraConfig.make(position=(0,0,2.0), look_at=(0,0,z+off*1.5),
        aspect_ratio=W/H, vertical_fov_radians=vfov, aperture=0.2)
    return scene_from_spheres(spheres, cam, anchor_toward=(0.0,0.0,z+off*1.5))
for em in [(3.,4.,2.),(5.,5.,5.),(8.,10.,6.)]:
    sc = gp_scene(em=em)
    img = lab.render(sc, spp=12, max_depth=40)
    s = score(img, GOLD_GP)
    print(json.dumps({"which":"gp","em": em, **s}), flush=True)
    pt.write_png(f"/tmp/cand_gp2_{em[0]}_{em[1]}_{em[2]}.png", img)

GOLD_CL = "/root/reference/samples/clear_light.png"
def cl_scene(le=9.0, lr=0.16, vfov=0.75):
    spheres = [
        (big, (-big-off, 0, z), (0,0,0), (0.9,0.1,0.2), DIFFUSE),
        (big, ( big+off, 0, z), (0,0,0), (0.3,0.1,0.9), DIFFUSE),
        (big, (0,0,z-big),     (0,0,0), (0.9,0.9,0.9), DIFFUSE),
        (big, (0, big+off, z), (0,0,0), (0.3,0.7,0.2), DIFFUSE),
        (big, (0,-big-off, z), (0,0,0), (0.9,0.9,0.9), DIFFUSE),
        (lr, (0.0, 0.07, -0.8), (le,le,le), (1.0,1.0,1.0), DIFFUSE),
        (0.15, (-0.17, -off+0.15, -1.0), (0,0,0), (1.0,1.0,1.0), SPECULAR),
        (0.17, (0.1, -off+0.17, -0.95), (0,0,0), (0.85,0.25,0.85), SPECULAR),
        (0.18, (0.28, -off+0.18, -0.55), (0,0,0), (1.0,1.0,1.0), DIELECTRIC),
    ]
    cam = CameraConfig.make(position=(0,0,2.0), look_at=(0,0,z+off*1.5),
        aspect_ratio=W/H, vertical_fov_radians=vfov, aperture=0.2)
    return scene_from_spheres(spheres, cam, anchor_toward=(0.0,0.0,z+off*1.5))
for le in [4.0, 9.0]:
    sc = cl_scene(le=le)
    img = lab.render(sc, spp=12, max_depth=40)
    s = score(img, GOLD_CL)
    print(json.dumps({"which":"cl","le": le, **s}), flush=True)
    pt.write_png(f"/tmp/cand_cl2_{le}.png", img)
