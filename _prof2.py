import jax, jax.numpy as jnp, numpy as np, glob, gzip, json, collections
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.lie import se3
from uwslam_tpu.tracking import track_sequence_batched
from uwslam_tpu.utils.synthetic import render_plane_view

cam = PinholeCamera(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
N = 96
poses = [se3.exp(jnp.asarray([0.015*(i%24), 0.006*(i%24), 0.002*(i%24),
                              0.001*(i%24), -0.0015*(i%24), 0.002*(i%24)], jnp.float32))
         for i in range(N)]
stacked = jnp.stack([render_plane_view(cam, T, 2.0).block_until_ready() for T in poses])

def run_chunk(fr):
    T_rel, _, _ = track_sequence_batched(
        fr, cam, mono_z=2.0, levels=5, track_levels=(3,2,1,0),
        num_points=2048, max_iters=(12,8,5,3))
    return T_rel
run = jax.jit(run_chunk)
np.asarray(run(stacked))
with jax.profiler.trace("/tmp/jaxp2"):
    np.asarray(run(stacked + 0.5))

path = sorted(glob.glob("/tmp/jaxp2/plugins/profile/*/vm.trace.json.gz"))[-1]
d = json.load(gzip.open(path))
pids = {}
for e in d["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name","")
tot = collections.Counter(); cnt = collections.Counter()
for e in d["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"),""):
        n = e.get("name","?")
        tot[n] += e.get("dur",0); cnt[n] += 1
for n, us in tot.most_common(25):
    print(f"{us/1e3:9.2f} ms x{cnt[n]:4d}  {n[:100]}")
