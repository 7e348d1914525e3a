"""Index samplers: sequential, shuffled, and class-balanced weighted.

The weighted sampler is the reference's inverse-frequency
``WeightedRandomSampler`` (cremad/get_data.py:153-158) rebuilt host-side:
weights are 1/class-count per sample, draws are with replacement, one
epoch draws ``len(labels)`` indices.  The heavy path uses the native C++
alias table (utils/native.py, O(1) per draw) with a numpy fallback.

Multi-host: every sampler derives the SAME global per-epoch stream from
``(seed, epoch)``, wrap-pads it to a multiple of ``process_count`` (same
as torch's DistributedSampler, which the reference lists as a TODO,
vggsound/vggsound.yaml:1), and each process takes the strided slice
``stream[process_index::process_count]``.  The padding keeps every
host's shard the same length — unequal shards would give hosts
different step counts and deadlock the collectives on the extra batch.
At most ``process_count - 1`` samples repeat per epoch; single-host
streams are untouched.
"""

from __future__ import annotations

import numpy as np


def _host_shard(stream: np.ndarray, process_index: int,
                process_count: int) -> np.ndarray:
    """Equal-length per-host shard of the global stream (wrap-padded)."""
    if process_count <= 1:
        return stream
    n = len(stream)
    total = -(-n // process_count) * process_count
    if total != n:
        stream = np.concatenate([stream, stream[: total - n]])
    return stream[process_index::process_count]


def _shard_len(n: int, process_count: int) -> int:
    return -(-n // process_count) if process_count > 1 else n


class SequentialSampler:
    """Deterministic 0..n-1 order (eval splits)."""

    def __init__(self, n: int, process_index: int = 0,
                 process_count: int = 1):
        self.n = int(n)
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def __len__(self) -> int:
        return _shard_len(self.n, self.process_count)

    def indices(self, epoch: int = 0) -> np.ndarray:
        return _host_shard(np.arange(self.n, dtype=np.int64),
                           self.process_index, self.process_count)


class RandomSampler:
    """Per-epoch deterministic permutation of 0..n-1."""

    def __init__(self, n: int, seed: int = 0, process_index: int = 0,
                 process_count: int = 1):
        self.n = int(n)
        self.seed = int(seed)
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def __len__(self) -> int:
        return _shard_len(self.n, self.process_count)

    def indices(self, epoch: int = 0) -> np.ndarray:
        rng = np.random.default_rng([self.seed, int(epoch), 103])
        perm = rng.permutation(self.n).astype(np.int64)
        return _host_shard(perm, self.process_index, self.process_count)


class WeightedSampler:
    """Inverse-class-frequency sampling with replacement
    (cremad/get_data.py:153-158 semantics)."""

    def __init__(self, labels: np.ndarray, seed: int = 0,
                 num_samples: int = 0, process_index: int = 0,
                 process_count: int = 1):
        labels = np.asarray(labels).astype(np.int64)
        counts = np.bincount(labels)
        # counts[labels[i]] >= 1 always (sample i counts itself)
        self.weights = 1.0 / counts[labels].astype(np.float64)
        self.n = int(num_samples) or len(labels)
        self.seed = int(seed)
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        self._alias = None
        try:
            from ..utils import native

            if native.available():
                self._alias = native.AliasTable(self.weights)
        except Exception:
            self._alias = None

    def __len__(self) -> int:
        return _shard_len(self.n, self.process_count)

    def indices(self, epoch: int = 0) -> np.ndarray:
        # one global stream per (seed, epoch); wrap-padded per-host shard
        if self._alias is not None:
            draw_seed = (self.seed * 1_000_003 + int(epoch)) & 0x7FFFFFFF
            stream = self._alias.sample(self.n, seed=draw_seed)
        else:
            rng = np.random.default_rng([self.seed, int(epoch), 211])
            p = self.weights / self.weights.sum()
            stream = rng.choice(len(self.weights), size=self.n,
                                replace=True, p=p)
        return _host_shard(np.asarray(stream, np.int64),
                           self.process_index, self.process_count)
