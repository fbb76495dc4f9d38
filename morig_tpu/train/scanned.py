"""Epoch-scanned training: whole epochs fused into one device program.

`trainer.run_epochs` dispatches one device program per batch plus a blocking
metric fetch — on a local chip that overhead is microseconds, but over a
high-latency link (the remote-TPU tunnel of this environment) every dispatch
costs a round trip, and a 4-step epoch spends ~35 s on RTT for <1 s of
compute.  The TPU-idiomatic fix is to make the *epoch loop itself* part of
the compiled program:

  * the whole (tiny) dataset lives on device once (`ScanBatcher.gather` turns
    a schedule of integer indices into a batch with `jnp.take` — no per-step
    host->device transfer);
  * `lax.scan` over the steps of an epoch, `lax.scan` over the epochs of a
    chunk — one dispatch per `chunk_epochs` epochs;
  * best-on-val checkpointing (train_corr_pose.py:223-247 semantics) rides in
    the scan carry: (params, batch_stats) of the best epoch are kept on
    device and fetched at chunk end, so per-epoch validation costs no RTT.

Semantics match `run_epochs` exactly — same rng threading (one
`jax.random.split` per train batch), same schedule rng call order
(`epoch_schedule` is the same code path `epoch_batches` uses), same Meter
averaging, same strict `<` best-on-val rule — verified by
tests/test_scanned_train.py.  One deliberate difference: `model_best.msgpack`
stores the best epoch's (params, batch_stats) with the *chunk-end* opt_state
(the optimizer state of the best epoch is not carried; best checkpoints are
consumed for inference/stage-handoff where only params matter).

Constraint: the stage's traced program must not change across a chunk
(static flags like CorrPoseStage.train_vismask).  Chunks are split at
`stage.vis_branch_start_epoch` when present so the reference's
epoch-triggered branch enabling (train_corr_pose.py:224-226) still works.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.train import trainer


@dataclasses.dataclass
class ScanBatcher:
    """Device-resident dataset + integer-schedule batching.

    gather:          traceable; maps one schedule slice (pytree of int arrays)
                     to a batch pytree.
    schedule:        host fn (epoch, np rng) -> schedule pytree with leading
                     axis K = steps_per_epoch.
    steps_per_epoch: K (constant across epochs; ragged tails are cycled by
                     the underlying dataset schedule).
    val_scheds:      schedule pytree with leading axis n_val (deterministic,
                     built once; val consumes no rng in the datasets).
    n_val:           number of validation batches.
    """

    gather: Callable[[Any], Any]
    schedule: Callable[[int, np.random.Generator], Any]
    steps_per_epoch: int
    val_scheds: Any
    n_val: int


def _stack_sched(scheds: list) -> Any:
    return jax.tree.map(lambda *xs: np.stack(xs), *scheds)


# ---------------------------------------------------------------------------
# batchers
# ---------------------------------------------------------------------------

def pose_scan_batcher(ds, batch_size: int, kind: str, sequential: bool) -> ScanBatcher:
    """Device-resident PoseDataset (single bucket).  Per-frame stacks are
    uploaded once; `gather` assembles PoseSample batches with pure takes
    (PoseDataset.batch semantics, data/pose.py)."""
    assert len(set(ds.bucket_of)) == 1, "pose_scan_batcher needs one bucket"
    V = ds.bucket_of[0]
    M = len(ds.models)
    nf = min(m.num_frames for m in ds.models)
    P = ds.models[0].pts_traj.shape[0]
    assert all(m.pts_traj.shape[0] == P for m in ds.models)
    N = ds.max_corr

    mesh_full = B.stack_meshes([ds._mesh_cache[i] for i in range(M)])
    vtx = np.stack([
        np.stack([B.pad_to(m.vtx_traj[:, t, :].astype(np.float32), V)
                  for t in range(nf)]) for m in ds.models
    ])                                                    # (M, nf, V, 3)
    pts = np.stack([
        np.stack([m.pts_traj[:, t, :].astype(np.float32) for t in range(nf)])
        for m in ds.models
    ])                                                    # (M, nf, P, 3)
    vis = np.stack([
        np.stack([B.pad_to(m.vismask[:, t].astype(np.float32), V)
                  for t in range(nf)]) for m in ds.models
    ])                                                    # (M, nf, V)
    v2p = np.zeros((M, nf, N, 2), np.int32)
    v2pm = np.zeros((M, nf, N), bool)
    p2v = np.zeros((M, nf, N, 2), np.int32)
    p2vm = np.zeros((M, nf, N), bool)
    for i, m in enumerate(ds.models):
        for t in range(nf):
            v2p[i, t], v2pm[i, t] = ds._corr_pad(m.corr_v2p, t)
            p2v[i, t], p2vm[i, t] = ds._corr_pad(m.corr_p2v, t)

    dev = {k: jnp.asarray(v) for k, v in dict(
        vtx=vtx, pts=pts, vis=vis, v2p=v2p, v2pm=v2pm, p2v=p2v, p2vm=p2vm,
    ).items()}
    mesh_dev = mesh_full
    pts_mask = jnp.ones((batch_size, P), bool)

    def gather(sched):
        idx, src, tar = sched["idx"], sched["src"], sched["tar"]
        mesh = B.MeshBatch(
            verts=dev["vtx"][idx, src],
            vert_mask=mesh_dev.vert_mask[idx],
            tpl_nbr=mesh_dev.tpl_nbr[idx], tpl_mask=mesh_dev.tpl_mask[idx],
            geo_nbr=mesh_dev.geo_nbr[idx], geo_mask=mesh_dev.geo_mask[idx],
        )
        return B.PoseSample(
            mesh=mesh,
            points=B.PointBatch(dev["pts"][idx, tar], pts_mask),
            corr=B.CorrBatch(dev["v2p"][idx, tar], dev["v2pm"][idx, tar],
                             dev["p2v"][idx, tar], dev["p2vm"][idx, tar]),
            vismask=dev["vis"][idx, tar],
            gt_flow=dev["vtx"][idx, tar] - dev["vtx"][idx, src],
        )

    def schedule(epoch: int, rng: np.random.Generator):
        sched = ds.epoch_schedule(rng, batch_size, kind, sequential, train=True)
        return dict(
            idx=np.asarray([s[0] for s in sched], np.int32),
            src=np.asarray([s[1] for s in sched], np.int32),
            tar=np.asarray([s[2] for s in sched], np.int32),
        )

    vs = ds.epoch_schedule(np.random.default_rng(0), batch_size, kind,
                           sequential, train=False)
    val_scheds = dict(
        idx=np.asarray([s[0] for s in vs], np.int32),
        src=np.asarray([s[1] for s in vs], np.int32),
        tar=np.asarray([s[2] for s in vs], np.int32),
    )
    K = len(ds.epoch_schedule(np.random.default_rng(0), batch_size, kind,
                              sequential, train=True))
    return ScanBatcher(gather, schedule, K, val_scheds, len(vs))


def with_val_dataset(b_train: ScanBatcher, b_val: ScanBatcher) -> ScanBatcher:
    """Train on one dataset, validate on another (the campaign layout):
    the val gather reads the val dataset's device arrays."""
    b_train.val_scheds = b_val.val_scheds
    b_train.n_val = b_val.n_val
    b_train.val_gather = b_val.gather
    return b_train


def rig_scan_batcher(ds, batch_size: int, val_ds=None) -> ScanBatcher:
    """Device-resident RigDataset: one full-dataset RigSample (B = M) built by
    the existing host path, batches gathered by model index."""
    M = len(ds.models)
    full = ds.batch(list(range(M)))

    def gather(sched):
        return jax.tree.map(lambda a: a[sched["idx"]], full)

    def schedule(epoch: int, rng: np.random.Generator):
        sched = ds.epoch_schedule(rng, batch_size, train=True)
        return dict(idx=np.asarray(sched, np.int32))

    vds = val_ds if val_ds is not None else ds
    vs = vds.epoch_schedule(np.random.default_rng(0), batch_size, train=False)
    val_scheds = dict(idx=np.asarray(vs, np.int32))
    K = len(ds.epoch_schedule(np.random.default_rng(0), batch_size, train=True))
    b = ScanBatcher(gather, schedule, K, val_scheds, len(vs))
    if val_ds is not None:
        vfull = val_ds.batch(list(range(len(val_ds.models))))
        b.val_gather = lambda sched: jax.tree.map(lambda a: a[sched["idx"]], vfull)
    return b


def const_scan_batcher(train_sample, val_sample=None) -> ScanBatcher:
    """Single constant batch per epoch (the skeleton stages: one SkelSample
    covering the dataset, cli.py / tools/campaign.py skel_batches)."""
    val_sample = val_sample if val_sample is not None else train_sample
    train_dev = jax.tree.map(jnp.asarray, train_sample)
    val_dev = jax.tree.map(jnp.asarray, val_sample)

    b = ScanBatcher(
        gather=lambda sched: train_dev,
        schedule=lambda e, rng: dict(i=np.zeros((1,), np.int32)),
        steps_per_epoch=1,
        val_scheds=dict(i=np.zeros((1,), np.int32)),
        n_val=1,
    )
    b.val_gather = lambda sched: val_dev
    return b


# ---------------------------------------------------------------------------
# the scanned epoch runner
# ---------------------------------------------------------------------------

def _chunk_ranges(start: int, epochs: int, chunk: int, boundary: Optional[int]):
    """[start, epochs) split into <=chunk-sized ranges, additionally split at
    `boundary` (a program-changing epoch, e.g. vis_branch_start_epoch)."""
    cuts = {start, epochs}
    if boundary is not None and start < boundary < epochs:
        cuts.add(boundary)
    edges = sorted(cuts)
    out = []
    for a, bnd in zip(edges[:-1], edges[1:]):
        e = a
        while e < bnd:
            out.append((e, min(e + chunk, bnd)))
            e = min(e + chunk, bnd)
    return out


def run_epochs_scanned(
    stage,
    state: trainer.TrainState,
    batcher: ScanBatcher,
    *,
    epochs: int,
    checkpoint_dir: Optional[str] = None,
    logger: Optional[trainer.MetricLogger] = None,
    rng: Optional[jax.Array] = None,
    rng_np: Optional[np.random.Generator] = None,
    start_epoch: int = 0,
    init_lowest: float = float("inf"),
    init_best_epoch: int = -1,
    chunk_epochs: int = 25,
    early_stop_patience: Optional[int] = None,
):
    """Drop-in replacement for `trainer.run_epochs` (minus test_batches):
    same returns (final state, best_epoch), same logs, same checkpoints —
    one device dispatch per `chunk_epochs` epochs.

    early_stop_patience: stop (at a chunk boundary) once the best-on-val
    epoch is more than this many epochs in the past.  Campaign v2's
    deform_seq stage converged by epoch ~10 and spent 129 further epochs
    inside the val-noise band; patience bounds that waste while the
    chunk granularity keeps the check nearly free."""
    from morig_tpu.train import checkpoint as ckpt

    logger = logger or trainer.MetricLogger(None)
    rng = rng if rng is not None else jax.random.key(0)
    rng_np = rng_np if rng_np is not None else np.random.default_rng(0)
    K = batcher.steps_per_epoch
    val_gather = getattr(batcher, "val_gather", batcher.gather)
    val_scheds_dev = jax.tree.map(jnp.asarray, batcher.val_scheds)

    chunk_fns: dict = {}

    def get_chunk_fn(C: int):
        if C in chunk_fns:
            return chunk_fns[C]

        def chunk_fn(st, bp, bb, low, be, scheds, keys, eids):
            def epoch_body(carry, xs):
                st, bp, bb, low, be = carry
                sched_e, keys_e, eid = xs

                def step_body(s, x):
                    sch, key = x
                    b = batcher.gather(sch)
                    s2, m = stage.train_step(s, b, key)
                    # flax mutable-apply returns batch_stats as a plain dict;
                    # the scan carry must keep the input's container type
                    if type(s2.batch_stats) is not type(s.batch_stats):
                        from flax import core as flax_core
                        bs = (flax_core.freeze(s2.batch_stats)
                              if isinstance(s.batch_stats, flax_core.FrozenDict)
                              else flax_core.unfreeze(s2.batch_stats))
                        s2 = s2.replace(batch_stats=bs)
                    return s2, m

                st, tms = jax.lax.scan(step_body, st, (sched_e, keys_e))
                tmean = jax.tree.map(lambda a: a.mean(0), tms)

                def val_body(c, sch):
                    return c, stage.eval_step(st, val_gather(sch))

                _, vms = jax.lax.scan(val_body, 0, val_scheds_dev)
                vmean = jax.tree.map(lambda a: a.mean(0), vms)
                if "total_loss" in vmean:
                    vtot = vmean["total_loss"]
                elif "loss" in vmean:
                    vtot = vmean["loss"]
                else:
                    vtot = jnp.zeros(())
                isb = vtot < low
                bp = jax.tree.map(lambda a, c: jnp.where(isb, a, c), st.params, bp)
                bb = jax.tree.map(lambda a, c: jnp.where(isb, a, c), st.batch_stats, bb)
                low = jnp.where(isb, vtot, low)
                be = jnp.where(isb, eid, be)
                return (st, bp, bb, low, be), (tmean, vmean)

            (st, bp, bb, low, be), logs = jax.lax.scan(
                epoch_body, (st, bp, bb, low, be), (scheds, keys, eids))
            return st, bp, bb, low, be, logs

        fn = jax.jit(chunk_fn, donate_argnums=(0, 1, 2))
        chunk_fns[C] = fn
        return fn

    # distinct buffers: state and best are both donated to the chunk program,
    # so they must not alias (donate-same-buffer-twice is an XLA error)
    best_params = jax.tree.map(lambda x: jnp.array(x, copy=True), state.params)
    best_bstats = jax.tree.map(lambda x: jnp.array(x, copy=True), state.batch_stats)
    lowest = jnp.asarray(init_lowest, jnp.float32)
    # resumed segments must report the *global* best epoch: without this a
    # resume whose val never beats init_lowest ends with best_epoch == -1
    # (campaign_v3 mask/done.json artifact — true best was epoch 210)
    best_epoch = jnp.asarray(init_best_epoch, jnp.int32)
    prev_lowest = float(init_lowest)

    boundary = getattr(stage, "vis_branch_start_epoch", None)
    for e0, e1 in _chunk_ranges(start_epoch, epochs, chunk_epochs, boundary):
        stage.on_epoch(e0)   # static flags as of this chunk (constant inside)
        C = e1 - e0
        scheds = _stack_sched([batcher.schedule(e, rng_np) for e in range(e0, e1)])
        subs = []
        for _ in range(C * K):
            rng, sub = jax.random.split(rng)
            subs.append(sub)
        keys = jnp.stack(subs).reshape(C, K)
        eids = jnp.arange(e0, e1, dtype=jnp.int32)
        scheds_dev = jax.tree.map(jnp.asarray, scheds)

        t_chunk0 = time.time()
        out = get_chunk_fn(C)(state, best_params, best_bstats, lowest,
                              best_epoch, scheds_dev, keys, eids)
        state, best_params, best_bstats, lowest, best_epoch, (tlog, vlog) = out

        tlog = jax.tree.map(np.asarray, tlog)   # blocks: chunk truly done here
        vlog = jax.tree.map(np.asarray, vlog)
        # epochs inside a chunk are homogeneous scan iterations, so the
        # per-epoch completion time is the chunk wall time linearly split —
        # measured at the fetch, not at flush (metrics are usable for
        # throughput analysis; ADVICE r3)
        t_chunk1 = time.time()
        epoch_s = (t_chunk1 - t_chunk0) / C
        for j, e in enumerate(range(e0, e1)):
            t_e = t_chunk0 + (j + 1) * epoch_s
            logger.log(e + 1, "train", {k: float(v[j]) for k, v in tlog.items()},
                       time_s=t_e, epoch_wall_s=round(epoch_s, 4))
            logger.log(e + 1, "val", {k: float(v[j]) for k, v in vlog.items()},
                       time_s=t_e, epoch_wall_s=round(epoch_s, 4))

        low_f = float(lowest)
        if checkpoint_dir:
            if low_f < prev_lowest:   # best improved somewhere in this chunk
                best_state = state.replace(params=best_params,
                                           batch_stats=best_bstats)
                ckpt.save_checkpoint(best_state, checkpoint_dir, is_best=False,
                                     filename="model_best.msgpack",
                                     extra={"epoch": int(best_epoch) + 1,
                                            "lowest_loss": low_f})
            ckpt.save_checkpoint(state, checkpoint_dir, is_best=False,
                                 extra={"epoch": e1, "lowest_loss": low_f})
        prev_lowest = min(prev_lowest, low_f)

        if (early_stop_patience is not None
                and e1 - (int(best_epoch) + 1) >= early_stop_patience):
            print(f"early stop at epoch {e1}: best epoch "
                  f"{int(best_epoch) + 1} is {e1 - int(best_epoch) - 1} "
                  f"epochs old (patience {early_stop_patience})")
            break

    return state, int(best_epoch)
