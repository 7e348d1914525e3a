"""Live multi-host worker: REAL ``jax.distributed`` bring-up (Gloo
collectives on the CPU backend), then the production code path —
``initialize_if_requested`` -> ``make_mesh`` over the 2-process global
device set -> ``build_loaders`` per-host strided streams ->
``place_state`` (DP x TP + FSDP) -> jitted train/eval steps.

Run by tests/test_multihost_live.py as 2 subprocesses x 4 virtual CPU
devices; writes per-step metrics + a global param checksum as JSON so the
test can compare against a single-process 8-device run of the same
program.  This executes the multi-host input-sharding design the
reference lists as a TODO (vggsound/vggsound.yaml:1) with
process_count > 1 for real, not monkeypatched.

Usage: multihost_worker.py <pid> <nproc> <port> <steps> <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# this image's sitecustomize forces the axon TPU platform over env vars;
# config wins (CLAUDE.md) and must be set before backend init
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port, steps, out = (int(sys.argv[1]), int(sys.argv[2]),
                                    sys.argv[3], int(sys.argv[4]),
                                    sys.argv[5])
    from types import SimpleNamespace

    import jax.numpy as jnp
    import numpy as np

    from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset
    from multimodal_clinical_tpu.engine.run import DataBundle, build_loaders
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.engine.steps import (
        make_eval_step, make_train_step,
    )
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet
    from multimodal_clinical_tpu.parallel.distributed import (
        initialize_if_requested,
    )
    from multimodal_clinical_tpu.parallel.mesh import make_mesh
    from multimodal_clinical_tpu.parallel.sharding import place_state

    args = SimpleNamespace(
        dist_coordinator=f"localhost:{port}", dist_num_processes=nproc,
        dist_process_id=pid, batch_size=16, seed=0, num_classes=4,
        learning_rate=1e-2, num_epochs=1, use_scheduler=False,
    )
    multi = initialize_if_requested(args)
    assert multi == (nproc > 1), (jax.process_count(), nproc)
    assert jax.device_count() == 8, jax.devices()

    ds = [make_synthetic_dataset("mimic", 64, 4, seed=i, dirs_seed=0)
          for i in range(3)]
    data = DataBundle(*ds, train_sampler="sequential", synthetic=True)
    mesh = make_mesh({"data": 4, "model": 2})
    train_loader, _, _ = build_loaders(args, data, mesh)

    spec = ModelSpec(module=MimicFusionNet(num_classes=4))
    sample = data.train.gather(np.arange(2))
    state = create_train_state(
        spec, args, jax.random.PRNGKey(0),
        [jnp.asarray(sample["x1"]), jnp.asarray(sample["x2"])],
        steps_per_epoch=4)
    state = place_state(state, mesh, fsdp=True)

    train_step = make_train_step(spec)
    eval_step = make_eval_step(spec)

    losses, accs = [], []
    last_batch = None
    with mesh:
        train_loader.set_epoch(0)
        for i, batch in enumerate(train_loader):
            if i == steps:
                break
            last_batch = batch
            state, metrics = train_step(state, batch)
            losses.append(float(metrics["train_loss"]))
            accs.append(float(metrics["train_acc"]))
        eval_out = eval_step(state, last_batch)
        eval_loss = float(jnp.sum(eval_out["loss"]))

        # checkpoint round-trip with CROSS-PROCESS-sharded (non-addressable)
        # FSDP leaves: _host_fetch allgathers, process 0 writes, every
        # process restores from the shared dir
        from jax.experimental import multihost_utils

        from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer

        ckpt_dir = f"{out}.ckpt"  # same tmp FS for both processes
        ckpt = BestCheckpointer(ckpt_dir, keep_last=1)
        ckpt.save_last(state, epochs_done=0, steps_per_epoch=4)
        ckpt.wait()
        multihost_utils.sync_global_devices("ckpt_committed")
        restored = ckpt.restore_last(state)
        assert restored is not None, "restore_last found no checkpoint"
        assert int(jax.device_get(restored.step)) == int(
            jax.device_get(state.step))
        restored = place_state(restored, mesh, fsdp=True)

        @jax.jit
        def checksum(tree):
            leaves = jax.tree_util.tree_leaves(tree)
            return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                       for x in leaves)

        param_sum = float(checksum(state.params))
        restored_param_sum = float(checksum(restored.params))

    result = {"pid": pid, "process_count": jax.process_count(),
              "losses": losses, "accs": accs, "eval_loss": eval_loss,
              "param_sum": param_sum,
              "restored_param_sum": restored_param_sum}
    with open(f"{out}.{pid}", "w") as f:
        json.dump(result, f)
    print(f"worker {pid} done: {result}", flush=True)


if __name__ == "__main__":
    main()
