"""Per-op device profile of the DeformNet flow program at bench shapes."""
import glob, gzip, json, collections, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from morig_tpu.core import batch as B
from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.nn import gcu
from morig_tpu.nn.deformnet import DeformNet
from morig_tpu.kernels.edge_fused import check_neighbor_locality

kw = dict(num_points=1024, n_lat=37, n_lon=36)
BT = 40
ds = capsule_pose_dataset(num_models=4, num_frames=6, **kw)
V_raw = ds.models[0].vtx_traj.shape[0]
PAD = ((V_raw + 255) // 256) * 256
entries = [B.build_mesh(m.vtx_traj[:, 0, :], m.tpl_edges, m.geo_edges, PAD,
                        tpl_max_degree=12, geo_max_degree=12)
           for m in ds.models]
mesh = B.stack_meshes([entries[i % 4] for i in range(BT)])
rng = np.random.default_rng(0)
pts = jax.device_put(rng.normal(size=(BT, 1024, 3)).astype(np.float32) * 0.3)
points = B.PointBatch(pts, jnp.ones((BT, 1024), bool))
local = all(check_neighbor_locality(np.asarray(e[k])[None], tile_v=128)
            for e in entries for k in ("tpl_nbr", "geo_nbr"))
gcu.set_edge_tile(128); gcu.set_edge_impl("windowed" if local else "fused")
print("impl", gcu.get_edge_impl(), "local", local)

from morig_tpu.core.compile_cache import setup_compile_cache

setup_compile_cache()
dn = DeformNet()
# eager init on the tunneled backend costs one RTT per op — always jit
dvars = jax.jit(lambda k, m, p: dn.init(k, m, p, False, None))(
    jax.random.key(0), mesh, points)
f = jax.jit(lambda p, m, pt: dn.apply({"params": p}, m, pt, False, None)[0])
out = f(dvars["params"], mesh, points); print("warm", float(out.sum()))

with jax.profiler.trace("/tmp/flowtrace"):
    for i in range(3):
        out = f(dvars["params"], mesh, points)
    print("done", float(out.sum()))

d = sorted(glob.glob("/tmp/flowtrace/plugins/profile/*"))[-1]
path = glob.glob(d + "/*.trace.json.gz")[0]
with gzip.open(path) as fh:
    data = json.load(fh)
ev = data["traceEvents"]
pids = {e["pid"]: e["args"]["name"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dev_pid = [p for p, n in pids.items() if "TPU" in n][0]
agg = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e.get("pid") == dev_pid and e.get("tid") not in (2,):
        agg[e["name"]] += e.get("dur", 0); cnt[e["name"]] += 1
total = sum(agg.values())
print(f"total device op time: {total/1000:.1f} ms over 3 runs")
for n, dsum in agg.most_common(25):
    print(f"{dsum/1000:9.2f} ms  x{cnt[n]:4d}  {n[:80]}")

# map the hot fusion names to their HLO bodies so "fusion.2" becomes an op
hlo = f.lower(dvars["params"], mesh, points).compile().as_text()
defs = {}
for line in hlo.splitlines():
    ls = line.strip()
    for n, _ in agg.most_common(12):
        base = n.split("/")[-1]
        if (" " + base + " = ") in ls or ls.startswith(base + " = "):
            defs.setdefault(n, ls[:300])
print("\n--- hot-op HLO definitions ---")
for n, dsum in agg.most_common(12):
    print(f"[{dsum/1000:8.2f} ms] {n}\n    {defs.get(n, '??')[:280]}")
