import time, jax, jax.numpy as jnp, numpy as np
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.image.pyramid import bilinear_sample_dense
from uwslam_tpu.lie import se3
from uwslam_tpu.ops.pallas_track import warp_and_sample

cam = PinholeCamera(fx=525., fy=525., cx=319.5, cy=239.5, width=640, height=480)
B, N = 8, 2048
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
imgs = jax.random.uniform(k1, (B, 3, 480, 640), jnp.float32)
uvk = jax.random.uniform(k2, (B, N, 2), minval=50., maxval=400.)
p3d = jax.vmap(lambda uv: cam.unproject(uv, jnp.full((N,), 2.0)))(uvk)
Ts = jnp.stack([se3.exp(0.01 * jax.random.normal(jax.random.PRNGKey(i), (6,))) for i in range(B)])

f = jax.jit(jax.vmap(lambda img, p, T: warp_and_sample(img, p, T, cam)))
t0 = time.perf_counter(); out = f(imgs, p3d, Ts); jax.block_until_ready(out)
print('vmap pallas compile %.2fs' % (time.perf_counter()-t0), flush=True)

def xla_path(img, p3d, T):
    p_t = se3.apply(T, p3d)
    uv = cam.project(p_t)
    return bilinear_sample_dense(img, uv)
g = jax.jit(jax.vmap(xla_path))
o2 = g(imgs, p3d, Ts); jax.block_until_ready(o2)
print('max diff:', float(jnp.abs(out[0]-o2[0]).max()), 'mask:', bool((out[1]==o2[1]).all()), flush=True)
for name, fn in [('xla-vmap', g), ('pallas-vmap', f)]:
    jax.block_until_ready(fn(imgs, p3d, Ts))
    t0 = time.perf_counter()
    outs = [fn(imgs + 0.001*i, p3d, Ts) for i in range(20)]
    jax.block_until_ready(outs)
    print(f'{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/call', flush=True)
