import time, jax, jax.numpy as jnp, numpy as np, math
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.image import build_pyramid
from uwslam_tpu.lie import se3
from uwslam_tpu.tracking import topk_gradient_points, track
from uwslam_tpu.utils.synthetic import plane_depth, render_plane_view

cam = PinholeCamera(fx=525., fy=525., cx=319.5, cy=239.5, width=640, height=480)
T1 = se3.exp(jnp.asarray([0.02,0.01,0.005,0.002,-0.003,0.001]))
f0 = render_plane_view(cam, jnp.eye(4), 2.0)
f1 = render_plane_view(cam, T1, 2.0)
depth0 = plane_depth(cam, jnp.eye(4), 2.0)
pyr0 = build_pyramid(f0, levels=5); pyr1 = build_pyramid(f1, levels=5)
pts = topk_gradient_points(pyr0.images[0], pyr0.grad_mag[0], cam, num_points=2048)
u = pts.uv[:,0].astype(jnp.int32).clip(0,639); v = pts.uv[:,1].astype(jnp.int32).clip(0,479)
pts = pts._replace(p3d=cam.unproject(pts.uv, depth0[v,u]))

for mode in ("ic","fc"):
    t0=time.perf_counter()
    out = track(pyr0, pyr1, pts, cam, levels=(3,2,1,0), max_iters=10, mode=mode)
    jax.block_until_ready(out.T)
    print(f'track {mode} compile+run: {time.perf_counter()-t0:.1f}s err={float(out.error):.4f}', flush=True)
