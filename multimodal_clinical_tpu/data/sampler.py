"""Index samplers: sequential, shuffled, and class-balanced weighted.

The weighted sampler is the reference's inverse-frequency
``WeightedRandomSampler`` (cremad/get_data.py:153-158) rebuilt host-side:
weights are 1/class-count per sample, draws are with replacement, one
epoch draws ``len(labels)`` indices.  The heavy path uses the native C++
alias table (utils/native.py, O(1) per draw) with a numpy fallback.

Multi-host: every sampler derives the SAME global per-epoch stream from
``(seed, epoch)`` and each process takes the strided slice
``stream[process_index::process_count]`` — per-host shards partition the
global stream exactly (the jax.distributed analog of torch's
DistributedSampler, which the reference lists as a TODO,
vggsound/vggsound.yaml:1).
"""

from __future__ import annotations

import numpy as np


class SequentialSampler:
    """Deterministic 0..n-1 order (eval splits)."""

    def __init__(self, n: int, process_index: int = 0,
                 process_count: int = 1):
        self.n = int(n)
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def __len__(self) -> int:
        return len(range(self.process_index, self.n, self.process_count))

    def indices(self, epoch: int = 0) -> np.ndarray:
        return np.arange(self.n, dtype=np.int64)[
            self.process_index::self.process_count]


class RandomSampler:
    """Per-epoch deterministic permutation of 0..n-1."""

    def __init__(self, n: int, seed: int = 0, process_index: int = 0,
                 process_count: int = 1):
        self.n = int(n)
        self.seed = int(seed)
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def __len__(self) -> int:
        return len(range(self.process_index, self.n, self.process_count))

    def indices(self, epoch: int = 0) -> np.ndarray:
        rng = np.random.default_rng([self.seed, int(epoch), 103])
        perm = rng.permutation(self.n).astype(np.int64)
        return perm[self.process_index::self.process_count]


class WeightedSampler:
    """Inverse-class-frequency sampling with replacement
    (cremad/get_data.py:153-158 semantics)."""

    def __init__(self, labels: np.ndarray, seed: int = 0,
                 num_samples: int = 0, process_index: int = 0,
                 process_count: int = 1):
        labels = np.asarray(labels).astype(np.int64)
        counts = np.bincount(labels)
        weights = np.zeros(len(labels), np.float64)
        present = counts[labels] > 0
        weights[present] = 1.0 / counts[labels][present]
        self.weights = weights
        self.n = int(num_samples) or len(labels)
        self.seed = int(seed)
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        self._alias = None
        try:
            from ..utils import native

            if native.available():
                self._alias = native.AliasTable(weights)
        except Exception:
            self._alias = None

    def __len__(self) -> int:
        return len(range(self.process_index, self.n, self.process_count))

    def indices(self, epoch: int = 0) -> np.ndarray:
        # one global stream per (seed, epoch); strided per-host shard
        if self._alias is not None:
            draw_seed = (self.seed * 1_000_003 + int(epoch)) & 0x7FFFFFFF
            stream = self._alias.sample(self.n, seed=draw_seed)
        else:
            rng = np.random.default_rng([self.seed, int(epoch), 211])
            p = self.weights / self.weights.sum()
            stream = rng.choice(len(self.weights), size=self.n,
                                replace=True, p=p)
        return np.asarray(stream, np.int64)[
            self.process_index::self.process_count]
