import os, sys, json
os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo/scripts")
import importlib
lab = importlib.import_module("_recon_lab")
from reconstruct import score
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.scene import DIFFUSE, SPECULAR, DIELECTRIC, scene_from_spheres, BLACK_BACKGROUND
from cpu_path_tracing_tpu.models.camera import CameraConfig

W,H = lab.W, lab.H
# Best new_camera light so far: r=2.0 at (1,4.5,-1) e=30
NC_SPHERES = list(lab.SIMPLE_SPHERES[:4]) + [(2.0, (1.0, 4.5, -1.0), (30,30,30), (0,0,0), DIFFUSE)]

# depth_of_field: same scene, bigger aperture, slightly zoomed.
GOLD_DOF = "/root/reference/samples/depth_of_field.png"
for vfov, ap in [(1.2,0.4),(1.2,0.7),(1.05,0.7),(1.05,1.0),(1.0,0.5)]:
    sc = lab.simple_variant(vfov=vfov, aperture=ap, spheres=NC_SPHERES)
    img = lab.render(sc, spp=16, max_depth=40)
    s = score(img, GOLD_DOF)
    print(json.dumps({"which":"dof","vfov": vfov, "ap": ap, **s}), flush=True)
    pt.write_png(f"/tmp/cand_dof_v{vfov}_a{ap}.png", img)

# greenish_party: box walls + ceiling light ball + mirror & glass on floor
GOLD_GP = "/root/reference/samples/greenish_party.png"
def gp_scene(lr=0.3, ly=0.68, em=(2.0,2.5,1.5), vfov=0.75, srad=0.18):
    big, off, z = 1e6, 0.4, -1.0
    spheres = [
        (big, (-big-off, 0, z), (0,0,0), (0.9,0.1,0.2), DIFFUSE),
        (big, ( big+off, 0, z), (0,0,0), (0.3,0.1,0.9), DIFFUSE),
        (big, (0,0,z-big),     (0,0,0), (0.1,0.7,0.2), DIFFUSE),
        (big, (0, big+off, z), (0,0,0), (0.3,0.7,0.2), DIFFUSE),
        (big, (0,-big-off, z), (0,0,0), (0.9,0.9,0.9), DIFFUSE),
        (lr, (0.0, ly, z), em, (1.0,1.0,1.0), DIFFUSE),
        (srad, (-0.18, -off+srad, z-0.1), (0,0,0), (1.0,1.0,1.0), SPECULAR),
        (srad, (0.2, -off+srad, z+0.15), (0,0,0), (1.0,1.0,1.0), DIELECTRIC),
    ]
    cam = CameraConfig.make(position=(0,0,2.0), look_at=(0,0,z+off*1.5),
        aspect_ratio=W/H, vertical_fov_radians=vfov, aperture=0.2)
    return scene_from_spheres(spheres, cam)
for em in [(2.0,2.5,1.5),(2.5,2.5,2.5),(1.5,2.5,1.0)]:
    sc = gp_scene(em=em)
    img = lab.render(sc, spp=16, max_depth=40)
    s = score(img, GOLD_GP)
    print(json.dumps({"which":"gp","em": em, **s}), flush=True)
    pt.write_png(f"/tmp/cand_gp_{em[0]}_{em[1]}_{em[2]}.png", img)

# clear_light: modified box: white back+floor, green ceiling; white light ball;
# mirror, magenta-specular, glass
GOLD_CL = "/root/reference/samples/clear_light.png"
def cl_scene(le=9.0, vfov=0.75):
    big, off, z = 1e6, 0.4, -1.0
    spheres = [
        (big, (-big-off, 0, z), (0,0,0), (0.9,0.1,0.2), DIFFUSE),
        (big, ( big+off, 0, z), (0,0,0), (0.3,0.1,0.9), DIFFUSE),
        (big, (0,0,z-big),     (0,0,0), (0.9,0.9,0.9), DIFFUSE),   # back WHITE
        (big, (0, big+off, z), (0,0,0), (0.3,0.7,0.2), DIFFUSE),   # top green
        (big, (0,-big-off, z), (0,0,0), (0.9,0.9,0.9), DIFFUSE),
        (0.12, (0.0, 0.05, z-0.15), (le,le,le), (1.0,1.0,1.0), DIFFUSE),  # clear light
        (0.15, (-0.17, -off+0.15, z), (0,0,0), (1.0,1.0,1.0), SPECULAR),
        (0.17, (0.1, -off+0.17, z-0.25), (0,0,0), (0.85,0.25,0.85), SPECULAR),  # magenta
        (0.18, (0.28, -off+0.18, z+0.45), (0,0,0), (1.0,1.0,1.0), DIELECTRIC),
    ]
    cam = CameraConfig.make(position=(0,0,2.0), look_at=(0,0,z+off*1.5),
        aspect_ratio=W/H, vertical_fov_radians=vfov, aperture=0.2)
    return scene_from_spheres(spheres, cam)
for le in [6.0, 9.0]:
    sc = cl_scene(le=le)
    img = lab.render(sc, spp=16, max_depth=40)
    s = score(img, GOLD_CL)
    print(json.dumps({"which":"cl","le": le, **s}), flush=True)
    pt.write_png(f"/tmp/cand_cl_{le}.png", img)
