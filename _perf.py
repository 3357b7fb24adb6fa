"""End-to-end batched tracking perf harness (96 frames, TPU)."""
import json, time, sys
import jax, jax.numpy as jnp, numpy as np
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.lie import se3
from uwslam_tpu.tracking import track_sequence_batched
from uwslam_tpu.tracking.sequence import compose_trajectory
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
        num_points=2048, max_iters=(12,8,5,3), mode=__import__('os').environ.get('M','fc'))
    return T_rel

run = jax.jit(run_chunk)
t0=time.perf_counter(); out = run(stacked); jax.block_until_ready(out)
comp=time.perf_counter()-t0
passes=8
chunks=[(stacked+0.25*p) for p in range(passes)]
for c in chunks: np.asarray(c[0,0,:2])
t0=time.perf_counter()
outs=[run(chunks[p]) for p in range(passes)]  # pipelined dispatch
for o in outs: np.asarray(o)                  # sync all
dt=time.perf_counter()-t0
est = np.asarray(compose_trajectory(out[:23]))
gt_wc = np.stack([np.linalg.inv(np.asarray(p)) for p in poses[:24]])
d = est[:,:3,3]-gt_wc[:,:3,3]
ate = float(np.sqrt((d**2).sum(axis=1).mean()))
tag = sys.argv[1] if len(sys.argv)>1 else "baseline"
print(json.dumps({"tag":tag,"fps":round(passes*(N-1)/dt,1),
                  "ate24":round(ate,5),"compile_s":round(comp,1)}))
