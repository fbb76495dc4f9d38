"""Training-step benchmark: step time / FLOPs / MFU for the trainable stages,
plus a data-parallel scaling curve (VERDICT r2 weak #3 / next #6).

  python tools/bench_train.py                 # real chip: corr+deform step time/MFU
  python tools/bench_train.py --dp-scaling    # virtual 8-CPU mesh: dp=1/2/4/8

The dp curve on virtual CPU devices measures the MECHANICS (sharding,
collective insertion, step correctness at scale), not wall-clock speedup —
all shards share one host core.  On real multi-chip hardware the same code
path gives the true curve.

Writes one JSON line per config; aggregate into docs/PARITY.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flops_of(jitted, args_) -> float:
    try:
        cost = jitted.lower(*args_).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_stage(stage_name: str, batch_size: int, n_lat: int, n_lon: int,
                num_points: int, iters: int, peak_tflops: float,
                scan_steps: int = 0) -> dict:
    import jax
    import numpy as np

    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.train.stages import CorrPoseStage, DeformPoseStage

    ds = capsule_pose_dataset(num_models=batch_size, num_frames=4,
                              num_points=num_points, n_lat=n_lat, n_lon=n_lon)
    # degree-12 neighbor tables: the bench.py fixture convention and the
    # hardware-validated envelope of the fused backward kernel (nn/gcu.py
    # _vmem_tile_bwd); the capsule's real degrees are <= 8 except the poles
    from morig_tpu.data.pose import PoseDataset

    ds = PoseDataset(ds.models, tpl_max_degree=12, geo_max_degree=12)
    batch = ds.batch(list(range(batch_size)), 0, 2)
    if stage_name == "corr":
        stage = CorrPoseStage()
        stage.train_vismask = True
    else:
        stage = DeformPoseStage()
    state = stage.init_state(jax.random.key(0), batch)

    rng = jax.random.key(1)
    state, m = stage.train_step(state, batch, rng)       # compile
    float(m["total_loss"])                               # fence (tunnel-safe)
    if scan_steps:
        # device step time free of per-dispatch link latency: scan
        # `scan_steps` steps in ONE program (train/scanned.py style)
        from flax import core as flax_core

        def body(s, k):
            s2, mm = stage.train_step(s, batch, k)
            if type(s2.batch_stats) is not type(s.batch_stats):
                s2 = s2.replace(batch_stats=flax_core.freeze(s2.batch_stats))
            return s2, mm["total_loss"]

        multi = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks),
                        donate_argnums=0)
        import jax.numpy as jnp

        keys = jax.random.split(rng, scan_steps)
        state, losses = multi(state, keys)
        float(losses[-1])                                # compile + fence
        t0 = time.perf_counter()
        state, losses = multi(state, jax.random.split(jax.random.key(2),
                                                      scan_steps))
        loss = float(losses[-1])
        dt = (time.perf_counter() - t0) / scan_steps
    else:
        t0 = time.perf_counter()
        for i in range(iters):
            rng, sub = jax.random.split(rng)
            state, m = stage.train_step(state, batch, sub)
        loss = float(m["total_loss"])                    # forces execution
        dt = (time.perf_counter() - t0) / iters

    step_fn = stage._steps.get("train") or stage._steps.get(("train", True))
    flops = _flops_of(step_fn, (state, batch, rng)) if step_fn is not None else 0.0
    return dict(
        stage=stage_name, batch=batch_size,
        verts_padded=int(batch.mesh.verts.shape[1]),
        points=num_points, step_ms=round(dt * 1000, 2),
        steps_per_sec=round(1.0 / dt, 2),
        flops_per_step_g=round(flops / 1e9, 2),
        mfu_pct=round(100 * flops / dt / (peak_tflops * 1e12), 2),
        final_loss=round(loss, 4),
    )


def dp_scaling(stage_name: str, iters: int) -> list:
    """Weak-scaling curve on the virtual 8-device CPU mesh: per-device batch 1,
    dp = 1/2/4/8."""
    import jax

    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.parallel.sharding import (
        make_device_mesh, shard_batch, shard_state,
    )
    from morig_tpu.train.stages import CorrPoseStage, DeformPoseStage

    out = []
    for dp in (1, 2, 4, 8):
        ds = capsule_pose_dataset(num_models=dp, num_frames=4, num_points=64,
                                  n_lat=9, n_lon=8)
        batch = ds.batch(list(range(dp)), 0, 2)
        stage = CorrPoseStage() if stage_name == "corr" else DeformPoseStage()
        state = stage.init_state(jax.random.key(0), batch)
        mesh = make_device_mesh(dp, model_parallel=1)
        state = shard_state(state, mesh, tensor_parallel=False, reinit_opt=True)
        sb = shard_batch(batch, mesh)
        rng = jax.random.key(1)
        with jax.set_mesh(mesh):
            state, m = stage.train_step(state, sb, rng)
            float(m["total_loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                rng, sub = jax.random.split(rng)
                state, m = stage.train_step(state, sb, sub)
            float(m["total_loss"])
            dt = (time.perf_counter() - t0) / iters
        out.append(dict(stage=stage_name, dp=dp, global_batch=dp,
                        step_ms=round(dt * 1000, 2),
                        samples_per_sec=round(dp / dt, 2)))
        # fresh compile per dp size: clear the stage's step cache
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp-scaling", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scan-steps", type=int, default=0,
                    help="time N steps fused in one scanned program "
                         "(device step time free of link latency)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--edge-impl", default="xla",
                    choices=("xla", "fused", "windowed"),
                    help="edge-message forward for TRAINING (nn/gcu.py "
                         "set_edge_impl); 'fused' runs the Pallas forward")
    ap.add_argument("--edge-bwd", default="pallas",
                    choices=("pallas", "remat_xla"),
                    help="backward used with --edge-impl fused/windowed: "
                         "one-pass Pallas backward kernel vs remat-XLA VJP")
    args = ap.parse_args()

    if args.dp_scaling:
        import os as _os

        flags = _os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
        _os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        for row in dp_scaling("corr", max(2, args.iters // 2)):
            print(json.dumps(row))
        return

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        shapes = dict(n_lat=9, n_lon=8, num_points=64)
        iters = 2
    else:
        from morig_tpu.core.compile_cache import setup_compile_cache

        setup_compile_cache()
        shapes = dict(n_lat=37, n_lon=36, num_points=1024)   # V=1262 -> 1536
        iters = args.iters
    from morig_tpu.nn.gcu import set_edge_bwd, set_edge_impl

    set_edge_impl(args.edge_impl)
    set_edge_bwd(args.edge_bwd)
    for stage_name in ("corr", "deform"):
        row = bench_stage(stage_name, args.batch, iters=iters,
                          peak_tflops=args.peak_tflops,
                          scan_steps=args.scan_steps, **shapes)
        # REQUESTED paths: EdgeMLP's per-layer gates (_fusable/_vmem_tile/
        # _vmem_tile_bwd) may still fall individual layers back to XLA /
        # remat-XLA — compare rows against an --edge-impl xla run before
        # attributing deltas to the kernels
        row["edge_impl_requested"] = args.edge_impl
        if args.edge_impl != "xla":
            row["edge_bwd_requested"] = args.edge_bwd
        print(json.dumps(row))


if __name__ == "__main__":
    main()
