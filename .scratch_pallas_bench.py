import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.image.pyramid import bilinear_sample_dense
from uwslam_tpu.lie import se3
from uwslam_tpu.ops.pallas_track import warp_and_sample

cam = PinholeCamera(fx=525., fy=525., cx=319.5, cy=239.5, width=640, height=480)
k = jax.random.PRNGKey(0)
img = jax.random.uniform(k, (3, 480, 640), jnp.float32)
uvk = jax.random.uniform(jax.random.PRNGKey(1), (2048, 2), minval=50., maxval=400.)
p3d = cam.unproject(uvk, jnp.full((2048,), 2.0))
T = se3.exp(jnp.asarray([0.02, 0.01, 0.005, 0.003, -0.004, 0.002]))

def xla_path(img, p3d, T):
    p_t = se3.apply(T, p3d)
    uv = cam.project(p_t)
    return bilinear_sample_dense(img, uv)

f_xla = jax.jit(xla_path)
t0=time.perf_counter(); o1 = f_xla(img, p3d, T); jax.block_until_ready(o1)
print('xla compile %.2fs' % (time.perf_counter()-t0), flush=True)
f_pl = jax.jit(lambda img, p3d, T: warp_and_sample(img, p3d, T, cam))
t0=time.perf_counter(); o2 = f_pl(img, p3d, T); jax.block_until_ready(o2)
print('pallas compile %.2fs' % (time.perf_counter()-t0), flush=True)
v1, m1 = o1; v2, m2 = o2
print('max abs diff:', float(jnp.abs(v1 - v2).max()), 'mask match:', bool((m1==m2).all()), flush=True)

for name, f in [('xla', f_xla), ('pallas', f_pl)]:
    jax.block_until_ready(f(img, p3d, T))
    t0 = time.perf_counter()
    outs = [f(img + 0.001*i, p3d, T) for i in range(50)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter()-t0)/50
    print(f'{name}: {dt*1e6:.1f} us/call', flush=True)
