import os, sys, json
os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo/scripts")
import importlib
lab = importlib.import_module("_recon_lab")
from reconstruct import score
import cpu_path_tracing_tpu as pt
from cpu_path_tracing_tpu.models.scene import DIFFUSE

GOLD = "/root/reference/samples/new_camera.png"
base = lab.SIMPLE_SPHERES
for rl, ly, e in [(1.0,3.1,30.0),(2.0,3.1,30.0),(2.0,4.5,30.0),(3.0,5.0,30.0),(1.5,3.1,60.0)]:
    spheres = list(base[:4]) + [(rl, (1.0, ly, -1.0), (e,e,e), (0,0,0), DIFFUSE)]
    sc = lab.simple_variant(spheres=spheres)
    img = lab.render(sc, spp=16, max_depth=40)
    s = score(img, GOLD)
    print(json.dumps({"rl": rl, "ly": ly, "e": e, **s}), flush=True)
    pt.write_png(f"/tmp/cand_nc_r{rl}_y{ly}_e{e}.png", img)
