"""Pallas kernel parity tests (run in interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.image import bilinear_sample_dense


def _pallas_sample_interpret(images, uv, tile_n=512):
    """Invoke the kernel in interpreter mode (no TPU needed)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from uwslam_tpu.ops.pallas_sample import _sample_kernel

    C, H, W = images.shape
    N = uv.shape[0]
    img_hcw = jnp.transpose(images, (1, 0, 2)).reshape(H, C * W)
    out = pl.pallas_call(
        functools.partial(_sample_kernel, C=C, W=W),
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
        interpret=True,
    )(uv, img_hcw)
    u, v = uv[:, 0], uv[:, 1]
    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    return jnp.where(valid[None, :], out, 0.0), valid


class TestPallasSample:
    def test_matches_xla_dense(self):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        images = jax.random.uniform(k1, (3, 64, 128), minval=0, maxval=255)
        uv = jnp.stack(
            [
                jax.random.uniform(k2, (512,), minval=-3, maxval=130),
                jax.random.uniform(k3, (512,), minval=-3, maxval=66),
            ],
            axis=1,
        )
        ref, vref = bilinear_sample_dense(images, uv)
        out, v = _pallas_sample_interpret(images, uv, tile_n=512)
        np.testing.assert_allclose(out, ref, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vref))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
