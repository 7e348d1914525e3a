"""Loader/sampler/checkpoint plumbing: per-host input sharding through
build_loaders, parallel-gather equivalence, checkpoint GC + async orbax."""

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_clinical_tpu.data.core import ArrayDataset
from multimodal_clinical_tpu.data.loader import Loader
from multimodal_clinical_tpu.data.sampler import RandomSampler, SequentialSampler
from multimodal_clinical_tpu.data.synthetic import make_synthetic_dataset
from multimodal_clinical_tpu.engine.run import DataBundle, build_loaders
from multimodal_clinical_tpu.parallel.mesh import make_mesh


def _args(**overrides):
    base = dict(batch_size=16, seed=0)
    base.update(overrides)
    return SimpleNamespace(**base)


def _bundle(n=64):
    ds = [make_synthetic_dataset("mimic", n, 4, seed=i, dirs_seed=0)
          for i in range(3)]
    return DataBundle(*ds, synthetic=True)


def test_build_loaders_per_host_shards_partition_global_stream(monkeypatch):
    """Two simulated hosts: their train idx streams are disjoint, half-size,
    and interleave back into the single-host stream."""
    data = _bundle(64)
    mesh = make_mesh()

    def streams(pi, pc):
        monkeypatch.setattr(jax, "process_index", lambda: pi)
        monkeypatch.setattr(jax, "process_count", lambda: pc)
        train, _, _ = build_loaders(_args(), data, mesh)
        train.set_epoch(3)
        idx = np.concatenate(
            [np.asarray(b["idx"])[np.asarray(b["valid"]) > 0]
             for b in train._host_batches()])
        return idx

    full = streams(0, 1)
    shard0 = streams(0, 2)
    shard1 = streams(1, 2)
    assert len(shard0) == len(shard1) == len(full) // 2
    recombined = np.empty(len(full), full.dtype)
    recombined[0::2] = shard0
    recombined[1::2] = shard1
    np.testing.assert_array_equal(recombined, full)


def test_build_loaders_per_host_batch_size(monkeypatch):
    """Each host feeds batch_size / process_count rows per step."""
    data = _bundle(64)
    mesh = make_mesh()
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    train, _, _ = build_loaders(_args(batch_size=16), data, mesh)
    batch = next(iter(train._host_batches()))
    assert batch["label"].shape[0] == 8


def test_build_loaders_num_cpus_drives_workers():
    """num_cpus (the reference's 12-worker DataLoader knob,
    cremad/run_trainer.py:41-49) defaults loader workers, capped at host
    cores; loader_workers overrides explicitly."""
    data = _bundle(64)
    mesh = make_mesh()
    host_cores = os.cpu_count() or 1
    train, _, _ = build_loaders(_args(num_cpus=12), data, mesh)
    assert train.workers == min(12, host_cores)
    train, _, _ = build_loaders(_args(num_cpus=12, loader_workers=2),
                                data, mesh)
    assert train.workers == 2
    train, _, _ = build_loaders(_args(), data, mesh)  # no keys at all
    assert train.workers == 1


def test_loader_parallel_gather_matches_sequential():
    rng = np.random.default_rng(0)
    ds = ArrayDataset([rng.normal(size=(40, 6)).astype(np.float32)],
                      (np.arange(40) % 4).astype(np.int32))
    a = Loader(ds, 16, SequentialSampler(40), workers=1)
    b = Loader(ds, 16, SequentialSampler(40), workers=4)
    for ba, bb in zip(a._host_batches(), b._host_batches()):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_checkpoint_gc_keeps_newest(tmp_path):
    import jax.numpy as jnp

    from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer
    from multimodal_clinical_tpu.engine.spec import ModelSpec
    from multimodal_clinical_tpu.engine.state import create_train_state
    from multimodal_clinical_tpu.models.zoo import MimicFusionNet

    args = SimpleNamespace(num_classes=4, batch_size=8, learning_rate=0.1,
                           num_epochs=1, use_scheduler=False, seed=0)
    spec = ModelSpec(module=MimicFusionNet(num_classes=4))
    state = create_train_state(spec, args, jax.random.PRNGKey(0),
                               [jnp.zeros((2, 5)), jnp.zeros((2, 24, 12))],
                               steps_per_epoch=2)
    ck = BestCheckpointer(str(tmp_path), keep_last=2)
    for step in (1, 2, 3):
        ck.save_last(state.replace(step=jnp.asarray(step)))
    ck.wait()
    names = {n.replace(".msgpack", "") for n in os.listdir(str(tmp_path))}
    assert "last-3" in names and "last-2" in names
    assert "last-1" not in names
    restored = ck.restore_last(state)
    assert int(restored.step) == 3


def test_default_backend_is_orbax_when_available(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from multimodal_clinical_tpu.engine.checkpoint import BestCheckpointer

    ck = BestCheckpointer(str(tmp_path))
    assert ck.backend == "orbax"


def test_loader_bf16_transfer_cast():
    """transfer_dtype casts float32 x* features (not waveforms, labels,
    valid) before device_put — half the H2D bytes, math-identical to the
    stem's own cast."""
    import ml_dtypes

    from multimodal_clinical_tpu.data.core import ArrayDataset
    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler

    n = 8
    ds = ArrayDataset([np.random.default_rng(0).normal(size=(n, 4, 3))
                       .astype(np.float32),
                       np.arange(n * 2, dtype=np.float32).reshape(n, 2)],
                      labels=np.arange(n, dtype=np.int32))
    loader = Loader(ds, 4, SequentialSampler(n),
                    transfer_dtype=ml_dtypes.bfloat16)
    batch = next(iter(loader))
    assert str(batch["x1"].dtype) == "bfloat16"
    assert str(batch["x2"].dtype) == "bfloat16"
    assert batch["label"].dtype == jnp.int32
    assert batch["valid"].dtype == jnp.float32
    # values equal the bf16 rounding of the originals
    want = np.asarray(ds.modalities[0][:4]).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(np.asarray(batch["x1"]), want)


def test_loader_waveform_stays_f32():
    import ml_dtypes

    from multimodal_clinical_tpu.data.loader import Loader
    from multimodal_clinical_tpu.data.sampler import SequentialSampler

    class WaveDS:
        labels = np.zeros(4, np.int32)

        def __len__(self):
            return 4

        def gather(self, idx):
            return {"x1_waveform": np.zeros((len(idx), 16), np.float32),
                    "x2": np.zeros((len(idx), 3, 3), np.float32),
                    "label": self.labels[idx]}

    loader = Loader(WaveDS(), 4, SequentialSampler(4),
                    transfer_dtype=ml_dtypes.bfloat16)
    batch = next(iter(loader))
    assert batch["x1_waveform"].dtype == jnp.float32  # Pallas STFT input
    assert str(batch["x2"].dtype) == "bfloat16"


def test_loader_abandoned_iterator_stops_producer():
    """Breaking out of a loader loop must terminate the producer thread
    (it used to block forever on the full prefetch queue, pinning device
    batches and continuing H2D transfers)."""
    import gc
    import threading
    import time

    rng = np.random.default_rng(0)
    ds = ArrayDataset([rng.normal(size=(64, 6)).astype(np.float32)],
                      (np.arange(64) % 4).astype(np.int32))
    loader = Loader(ds, 4, SequentialSampler(64))
    it = iter(loader)
    next(it)  # producer is now running and filling the queue
    del it    # abandon mid-epoch: generator close runs the finally block
    gc.collect()
    deadline = time.time() + 10.0
    while time.time() < deadline:
        if not any(t.name.startswith("loader-producer")
                   for t in threading.enumerate()):
            return
        time.sleep(0.05)
    raise AssertionError("loader producer thread still alive after abandon")


def test_host_shards_equal_length_when_uneven():
    """n % process_count != 0: every host must still get the SAME number
    of indices (wrap padding, DistributedSampler-style) — unequal shards
    would deadlock multi-host collectives on the extra step."""
    from multimodal_clinical_tpu.data.sampler import (
        RandomSampler, SequentialSampler, WeightedSampler,
    )

    n, pc = 9, 2
    for make in (
        lambda pi: SequentialSampler(n, process_index=pi, process_count=pc),
        lambda pi: RandomSampler(n, seed=3, process_index=pi,
                                 process_count=pc),
        lambda pi: WeightedSampler(np.arange(n) % 3, seed=3,
                                   process_index=pi, process_count=pc),
    ):
        shards = [make(pi).indices(epoch=1) for pi in range(pc)]
        assert len(shards[0]) == len(shards[1]) == 5 == len(make(0))
        # the shards cover the global stream; the single wrap-padded
        # duplicate is the stream's first element
        recombined = np.empty(10, np.int64)
        recombined[0::2] = shards[0]
        recombined[1::2] = shards[1]
        single = make(0)
        single.process_count = 1
        full = single.indices(epoch=1)
        np.testing.assert_array_equal(recombined[:9], full)
        assert recombined[9] == full[0]


def test_loader_skip_is_index_level_and_one_shot():
    """Loader.skip(k) (mid-epoch resume): the first k batches are never
    gathered — not merely discarded — and the skip applies to one
    iteration only."""
    base = make_synthetic_dataset("mimic", 64, 4, seed=0, dirs_seed=0)
    gathered = []

    class Spy:
        def __len__(self):
            return len(base)

        def gather(self, idx):
            gathered.append(np.asarray(idx))
            return base.gather(idx)

    loader = Loader(Spy(), 16, SequentialSampler(64))
    loader.skip(2)
    batches = list(loader)
    assert len(batches) == 2  # 4 batches/epoch, first 2 skipped
    seen = np.concatenate(gathered)
    np.testing.assert_array_equal(np.sort(seen), np.arange(32, 64))
    assert np.array_equal(np.asarray(batches[0]["idx"]), np.arange(32, 48))
    # one-shot: the next iteration is full again
    gathered.clear()
    assert len(list(loader)) == 4
    assert len(np.concatenate(gathered)) == 64
