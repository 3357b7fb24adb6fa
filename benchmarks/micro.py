"""Per-kernel microbenchmarks — achieved throughput vs speed-of-light.

SURVEY.md §7 item 10: each hot op of the tracking stack measured in
isolation on the current device, with a roofline estimate (HBM-bound ops
against ~819 GB/s v5e bandwidth, MXU ops against bf16 matmul peak) so
regressions and headroom are visible per kernel, not just end-to-end.

Methodology: wall-clock through this rig's remote-TPU tunnel carries tens of
milliseconds of dispatch/transfer overhead per call, so each kernel is
measured by DEVICE time instead — one warmed invocation under
jax.profiler.trace, reading the jitted program's duration from the timeline.

Usage: python benchmarks/micro.py  ->  one JSON line per kernel.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# v5e speed-of-light constants (per chip)
HBM_GBS = 819.0          # HBM bandwidth
MXU_BF16_TFLOPS = 197.0  # bf16 matmul peak (f32 inputs at DEFAULT precision
                         # run 1-pass bf16 on the MXU)

B = 96          # frame batch
H, W = 480, 640
N_PTS = 2048


def device_time_s(jitted, args) -> float:
    """One warmed call under jax.profiler.trace; return the program's device
    duration in seconds (largest top-level jit event in the timeline)."""
    out = jitted(*args)
    jax.block_until_ready(out)
    tmp = tempfile.mkdtemp(prefix="uwslam_micro_")
    try:
        with jax.profiler.trace(tmp):
            out = jitted(*args)
            jax.block_until_ready(out)
        traces = sorted(glob.glob(os.path.join(
            tmp, "plugins/profile/*/*.trace.json.gz")))
        if not traces:
            raise RuntimeError(
                "no profiler trace produced — is a TPU device attached?"
            )
        path = traces[-1]
        d = json.load(gzip.open(path))
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        total = collections.Counter()
        for e in d["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
                n = e.get("name", "")
                if n.startswith("jit_"):
                    total[n.split("(")[0]] += e.get("dur", 0)
        if not total:
            raise RuntimeError(
                "no TPU jit events found in the trace — this benchmark "
                "measures device time and requires a TPU backend"
            )
        return max(total.values()) / 1e6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from uwslam_tpu.camera import PinholeCamera
    from uwslam_tpu.image import build_pyramid
    from uwslam_tpu.image.pyramid import bilinear_sample_dense, scharr_gradients
    from uwslam_tpu.lie import se3
    from uwslam_tpu.tracking import topk_gradient_points
    from uwslam_tpu.utils.precision import HIGHEST

    cam = PinholeCamera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                        width=W, height=H)
    k_img, k_u, k_v, k_J, k_H, k_tw = jax.random.split(
        jax.random.PRNGKey(0), 6
    )
    frames = jax.random.uniform(k_img, (B, H, W), jnp.float32) * 255.0
    uv = jnp.stack(
        [jax.random.uniform(k_u, (B, N_PTS)) * (W - 2),
         jax.random.uniform(k_v, (B, N_PTS)) * (H - 2)], axis=-1)
    stacked3 = jnp.stack([frames, frames, frames], axis=1)  # (B, 3, H, W)
    J = jax.random.normal(k_J, (B, N_PTS, 6))
    Hmat = jnp.eye(6) * 10.0 + 0.1 * jax.random.normal(k_H, (B, 6, 6))
    Hmat = Hmat @ jnp.swapaxes(Hmat, -1, -2)
    tw = jax.random.normal(k_tw, (65536, 6)) * 0.1

    px = B * H * W * 4

    # (name, jitted fn, args, work_bytes, work_flops, note)
    cases = [
        (
            "pyramid5+scharr(b96)",
            jax.jit(jax.vmap(lambda im: build_pyramid(im, levels=5))),
            (frames,),
            int(px * (1 + 4 * 1.33)), None,
            "5-level pyramid + Scharr x/y + |grad|, vmapped",
        ),
        (
            "scharr_l0(b96)",
            jax.jit(jax.vmap(scharr_gradients)),
            (frames,),
            px * 3, None, "",
        ),
        (
            "pallas_scharr_l0(b96)",
            jax.jit(
                lambda f: __import__(
                    "uwslam_tpu.ops.pallas_pyramid", fromlist=["x"]
                ).scharr_gradients_batched(f)
            ),
            (frames,),
            px * 4, None,
            "fused gx/gy/|g| in one VMEM pass per frame (round 4)",
        ),
        (
            "pyramid5_batched_pallas(b96)",
            jax.jit(
                lambda f: __import__(
                    "uwslam_tpu.image.pyramid", fromlist=["x"]
                ).build_pyramid_batched(f, levels=5)
            ),
            (frames,),
            int(px * (1 + 4 * 1.33)), None,
            "batched pyramid via the Pallas scharr kernel (round 4)",
        ),
        (
            "sample_dense_c3(b96,n2048)",
            jax.jit(jax.vmap(bilinear_sample_dense)),
            (stacked3, uv),
            None, 2 * B * 3 * N_PTS * H * W,
            "fc hot-loop op: one-hot matmul sampling, 3 channels",
        ),
        (
            "sample_dense_c1(b96,n2048)",
            jax.jit(jax.vmap(bilinear_sample_dense)),
            (frames[:, None], uv),
            None, 2 * B * N_PTS * H * W,
            "ic hot-loop op: intensity only",
        ),
        (
            "normal_eq_6x6(b96,n2048)",
            jax.jit(lambda Jb: (
                jnp.einsum("bni,bnj->bij", Jb, Jb, precision=HIGHEST),
                jnp.einsum("bni,bn->bi", Jb, Jb[..., 0], precision=HIGHEST),
            )),
            (J,),
            B * N_PTS * 6 * 4 * 2, None,
            "HIGHEST precision; HBM-bound at N=2048",
        ),
        (
            "solve_6x6(b96)",
            jax.jit(lambda Hb: jnp.linalg.solve(
                Hb, Hb[..., :1]).squeeze(-1)),
            (Hmat,),
            None, None, "batched LU, latency-bound",
        ),
        (
            "topk_points(b96)",
            jax.jit(jax.vmap(
                lambda im: topk_gradient_points(
                    im, im, cam, num_points=N_PTS, mono_z=2.0, block=8
                ).uv)),
            (frames,),
            px * 2, None, "block argmax + top-K + unproject",
        ),
        (
            "se3_exp_compose_inv(65k)",
            jax.jit(lambda t: se3.compose(
                se3.exp(t), se3.inverse(se3.exp(t)))),
            (tw,),
            65536 * 6 * 4 * 2, None, "geometry backbone, batched",
        ),
    ]

    # Fused-Pallas vs two-einsum XLA warp+sample at the TUM design point —
    # the durable receipt for the measured-negative default
    # (tracking/photometric.py _use_pallas_fused: the XLA path won 2.5x
    # end-to-end; this records the isolated-kernel numbers per JAX version).
    if jax.default_backend() == "tpu":
        from uwslam_tpu.ops.pallas_track import fits_vmem, warp_and_sample
        from uwslam_tpu.tracking.photometric import _warp_sample

        if fits_vmem(3, H, W):
            p3d = cam.unproject(uv[0], jnp.full((N_PTS,), 2.0))
            T = se3.exp(
                jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.004, 0.0], jnp.float32)
            )
            st3 = stacked3[0]
            flops = 2 * 3 * N_PTS * H * W
            cases += [
                (
                    "warp_sample_xla_c3(n2048)",
                    jax.jit(lambda s, p, t: _warp_sample(s, p, t, cam)),
                    (st3, p3d, T),
                    None, flops,
                    "two-einsum XLA path (the measured default)",
                ),
                (
                    "warp_sample_pallas_fused_c3(n2048)",
                    jax.jit(lambda s, p, t: warp_and_sample(s, p, t, cam)),
                    (st3, p3d, T),
                    None, flops,
                    "fused Pallas kernel (UWSLAM_PALLAS_FUSED opt-in)",
                ),
            ]

    records = []
    for name, fn, args, wb, wf, note in cases:
        s = device_time_s(fn, args)
        rec = {"kernel": name, "us_per_op": round(s * 1e6, 1)}
        if wb:
            g = wb / s / 1e9
            rec["GB_s"] = round(g, 1)
            rec["pct_hbm_roofline"] = round(100 * g / HBM_GBS, 1)
        if wf:
            t = wf / s / 1e12
            rec["TFLOP_s"] = round(t, 2)
            rec["pct_mxu_roofline"] = round(100 * t / MXU_BF16_TFLOPS, 1)
        if note:
            rec["note"] = note
        print(json.dumps(rec))
        records.append(rec)

    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        payload = {
            "device": str(jax.devices()[0]),
            "jax": jax.__version__,
            "kernels": records,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
