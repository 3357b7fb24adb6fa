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


class TestPallasWarpSample:
    """Parity of the fused warp+project+sample kernel (ops.pallas_track)
    against the unfused XLA reference: warp in jnp, then one-hot sampling.
    Interpreter mode — covers the kernel math on CPU CI."""

    def _reference(self, images, p3d, T, cam):
        from uwslam_tpu.lie import se3

        p_t = se3.apply(T, p3d)
        uv = cam.project(p_t)
        vals, in_img = bilinear_sample_dense(images, uv)
        ok = in_img & (p_t[..., 2] > 1e-3)
        return jnp.where(ok[None, :], vals, 0.0), ok

    def test_matches_unfused_path(self):
        from uwslam_tpu.camera import PinholeCamera
        from uwslam_tpu.lie import se3
        from uwslam_tpu.ops.pallas_track import warp_and_sample

        cam = PinholeCamera(
            fx=120.0, fy=120.0, cx=63.5, cy=31.5, width=128, height=64
        )
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        images = jax.random.uniform(k1, (3, 64, 128), minval=0, maxval=255)
        uv = jnp.stack(
            [
                jax.random.uniform(k2, (512,), minval=2.0, maxval=125.0),
                jax.random.uniform(k3, (512,), minval=2.0, maxval=61.0),
            ],
            axis=1,
        )
        # Mixed depths; some points land outside after the warp, a few
        # behind the camera to exercise the validity contract.
        z = jnp.linspace(0.5, 4.0, 512)
        z = z.at[::97].set(-0.2)
        p3d = cam.unproject(uv, z)
        T = se3.exp(
            jnp.asarray([0.05, -0.02, 0.03, 0.02, -0.01, 0.015])
        )
        ref, vref = self._reference(images, p3d, T, cam)
        out, v = warp_and_sample(images, p3d, T, cam, interpret=True)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vref))
        # bf16 stage-1 matmul: tolerance scales with the 255 image range.
        np.testing.assert_allclose(out, ref, atol=1.5)

    def test_pad_path_masks_dummy_points(self):
        """N not a tile multiple: padded dummy points must not leak."""
        from uwslam_tpu.camera import PinholeCamera
        from uwslam_tpu.lie import se3
        from uwslam_tpu.ops.pallas_track import warp_and_sample

        cam = PinholeCamera(
            fx=100.0, fy=100.0, cx=63.5, cy=31.5, width=128, height=64
        )
        key = jax.random.PRNGKey(4)
        images = jax.random.uniform(key, (1, 64, 128), minval=0, maxval=255)
        uv = jnp.stack(
            [jnp.linspace(5.0, 120.0, 300), jnp.linspace(5.0, 58.0, 300)],
            axis=1,
        )
        p3d = cam.unproject(uv, jnp.full((300,), 2.0))
        T = jnp.eye(4)
        ref, vref = self._reference(images, p3d, T, cam)
        out, v = warp_and_sample(images, p3d, T, cam, interpret=True)
        assert out.shape == (1, 300)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vref))
        np.testing.assert_allclose(out, ref, atol=1.5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
