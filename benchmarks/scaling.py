"""Distributed-BA scaling curve — iters/s at 1/2/4/8 devices, fixed problem.

BASELINE.json's north star asks ">70% scaling efficiency at 2 hosts"; real
multi-chip hardware is not attached to this rig (BENCH runs on ONE v5e chip),
so the curve is measured on an 8-virtual-device CPU mesh
(--xla_force_host_platform_device_count) — the same substrate the driver's
dryrun_multichip validates. That makes it an ALGORITHMIC scaling measurement
(does the landmark-sharded Schur LM keep devices busy as the mesh grows, with
communication O(M^2) per iteration independent of landmark count?) rather
than an ICI-bandwidth one; the honest caveat is recorded in the output.

Problem size: 16 keyframe poses on an arc, 16384 landmarks, ~6 observations
each (~98k total) with pixel noise — the landmark-side work (V/W blocks +
S_red contraction, all sharded) dominates the replicated 96x96 reduced-camera
solve. M is kept moderate because the S_red einsum costs O(L * M^2) per
iteration and this curve runs on CPU.

Usage: python benchmarks/scaling.py [--out SCALING_r03.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Some rigs preload jax at interpreter start (sitecustomize registering a
# TPU plugin), making the env var above too late — force through config too.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

M = 16           # keyframe poses
L = 16384        # landmarks
OBS_PER_LM = 6
MAX_ITERS = 30


def make_problem(seed: int = 0):
    """Synthetic global-BA problem: cameras on a ring looking inward,
    landmarks in the volume, observations perturbed by 0.5 px noise and the
    poses by odometry-like drift (so LM has real work to do)."""
    from uwslam_tpu.ba.schur import BAProblem
    from uwslam_tpu.camera import PinholeCamera
    from uwslam_tpu.lie import se3

    rng = np.random.default_rng(seed)
    cam = PinholeCamera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                        width=640, height=480)
    # Ground-truth poses: ring of radius 4 looking at the origin.
    T_cw_gt = []
    for i in range(M):
        a = 2 * np.pi * i / M * 0.25  # quarter arc: neighbors co-visible
        C = np.array([4 * np.sin(a), 0.2 * np.sin(3 * a), -4 * np.cos(a)])
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)
        T = np.eye(4, dtype=np.float64)
        T[:3, :3] = R_wc.T
        T[:3, 3] = -R_wc.T @ C
        T_cw_gt.append(T)
    T_cw_gt = np.stack(T_cw_gt)

    pts = rng.uniform([-1.5, -1.0, -1.5], [1.5, 1.0, 1.5], (L, 3))

    obs_kf, obs_lm, obs_uv = [], [], []
    for l in range(L):
        base = rng.integers(0, M)
        for k in range(OBS_PER_LM):
            m = (base + k) % M
            pc = T_cw_gt[m][:3, :3] @ pts[l] + T_cw_gt[m][:3, 3]
            if pc[2] < 0.5:
                continue
            u = 525.0 * pc[0] / pc[2] + 319.5 + rng.normal(0, 0.5)
            v = 525.0 * pc[1] / pc[2] + 239.5 + rng.normal(0, 0.5)
            if 0 <= u < 640 and 0 <= v < 480:
                obs_kf.append(m)
                obs_lm.append(l)
                obs_uv.append((u, v))
    O = len(obs_kf)

    # Drifted initialization: noise grows along the trajectory.
    T_cw0 = []
    for i, T in enumerate(T_cw_gt):
        drift = 0.02 * i / M
        xi = np.concatenate([
            rng.normal(0, drift, 3), rng.normal(0, drift * 0.3, 3)
        ]).astype(np.float32)
        T_cw0.append(np.asarray(
            se3.compose(se3.exp(jnp.asarray(xi)), jnp.asarray(T, jnp.float32))
        ))
    pts0 = pts + rng.normal(0, 0.05, pts.shape)

    problem = BAProblem(
        T_cw=jnp.asarray(np.stack(T_cw0), jnp.float32),
        points=jnp.asarray(pts0, jnp.float32),
        obs_kf=jnp.asarray(np.array(obs_kf), jnp.int32),
        obs_lm=jnp.asarray(np.array(obs_lm), jnp.int32),
        obs_uv=jnp.asarray(np.array(obs_uv), jnp.float32),
        obs_valid=jnp.ones(O, bool),
    )
    return problem, cam, O


def main() -> None:
    from uwslam_tpu.parallel import (
        AXIS,
        distributed_bundle_adjust,
        shard_problem,
    )
    from jax.sharding import Mesh

    problem, cam, O = make_problem()
    print(f"problem: {M} poses, {L} landmarks, {O} observations",
          file=sys.stderr)

    rows = []
    t1 = None
    for n_dev in (1, 2, 4, 8):
        devs = np.array(jax.devices()[:n_dev])
        mesh = Mesh(devs, (AXIS,))
        sharded = shard_problem(problem, n_dev)

        def run():
            t0 = time.perf_counter()
            out = distributed_bundle_adjust(
                sharded, cam, mesh, max_iters=MAX_ITERS,
                huber_delta=2.0, num_fixed_poses=2,
            )
            it = int(out.iterations)
            return out, it, time.perf_counter() - t0

        run()                       # compile
        out, iters, dt = run()      # steady state
        ips = iters / max(dt, 1e-9)
        if t1 is None:
            t1 = ips
        eff = ips / (t1 * n_dev) * 100.0
        row = {
            "devices": n_dev,
            "iterations": iters,
            "seconds": round(dt, 3),
            "iters_per_sec": round(ips, 2),
            "speedup_vs_1dev": round(ips / t1, 2),
            "efficiency_pct": round(eff, 1),
            "cost_initial": float(out.initial_cost),
            "cost_final": float(out.cost),
        }
        rows.append(row)
        print(json.dumps(row))

    payload = {
        "note": (
            "8-virtual-device CPU mesh (xla_force_host_platform_device_count)"
            " — ALGORITHMIC scaling of the landmark-sharded Schur LM; real "
            "multi-chip ICI/DCN hardware is not attached to this rig. "
            "Efficiency = iters/s / (n_dev * 1-dev iters/s). Note virtual "
            "CPU devices share the host's cores, so this UNDERSTATES what "
            "independent chips would deliver: at 8 'devices' the same "
            "silicon runs 8 shards plus 8x the collective bookkeeping."
        ),
        "problem": {"poses": M, "landmarks": L, "observations": O,
                    "max_iters": MAX_ITERS},
        "scaling": rows,
    }
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
