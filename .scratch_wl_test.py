import time, jax, jax.numpy as jnp
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.lie import se3
from uwslam_tpu.ops.pallas_track import warp_and_sample

cam = PinholeCamera(fx=525., fy=525., cx=319.5, cy=239.5, width=640, height=480)
img = jax.random.uniform(jax.random.PRNGKey(0), (1, 480, 640))
uv = jax.random.uniform(jax.random.PRNGKey(1), (2048, 2), minval=50., maxval=400.)
p3d = cam.unproject(uv, jnp.full((2048,), 2.0))

def f(img, p3d):
    def body(s):
        T, k = s
        vals, ok = warp_and_sample(img, p3d, T, cam)
        d = 1e-5 * jnp.tanh(vals[0, :6])
        return se3.right_update(T, d), k + 1
    T, k = jax.lax.while_loop(lambda s: s[1] < 10, body, (jnp.eye(4), 0))
    return T

t0 = time.perf_counter()
out = jax.jit(f)(img, p3d)
jax.block_until_ready(out)
print('while_loop + 1 pallas kernel compile: %.1fs' % (time.perf_counter()-t0), flush=True)

# same kernel at a second level shape
img2 = img[:, :240, :320]
cam2 = cam.scaled(1)
p3d2 = p3d
def g(img, img2, p3d):
    def body(s):
        T, k = s
        vals, ok = warp_and_sample(img, p3d, T, cam)
        vals2, ok2 = warp_and_sample(img2, p3d, T, cam2)
        d = 1e-5 * jnp.tanh(vals[0, :6] + vals2[0, :6])
        return se3.right_update(T, d), k + 1
    T, k = jax.lax.while_loop(lambda s: s[1] < 10, body, (jnp.eye(4), 0))
    return T
t0 = time.perf_counter()
out = jax.jit(g)(img, img2, p3d)
jax.block_until_ready(out)
print('while_loop + 2 shapes compile: %.1fs' % (time.perf_counter()-t0), flush=True)
