"""Parallel prefetching data loader.

Role of the reference's ``DataLoader(num_workers=12)`` (reference
na_run.py:183-193): a process pool parses/loads structure clusters ahead of
the training step so host-side parsing overlaps device compute. Batches are
collated in the workers and arrive ready to ship to the device.

Engineered for a fast device on a small host (the TPU step outruns a
12-worker torch loader's design point):

* the worker pool is PERSISTENT across epochs — created on first iteration,
  reused by every later one (the reference pays DataLoader worker startup
  per epoch);
* the dataset ships to each worker ONCE at pool init (the naive
  ``pool.submit(fn, dataset, ...)`` re-pickles the examples table per task);
* each worker keeps an LRU cache of PARSED structures — epochs revisit the
  same files, so steady-state loading skips the parser entirely and only
  re-runs the per-visit randomness (assembly choice, noise, crops,
  mutations), which preserves the training-time augmentation semantics
  exactly (dataset.loader is still called per visit).
"""
from __future__ import annotations

import collections
from concurrent.futures import ProcessPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple

# Worker-process globals (set by _worker_init; one dataset per worker).
_WORKER_DATASET = None


def _worker_init(dataset, parse_cache_size):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    dataset.enable_parse_cache(parse_cache_size)


def _load_and_collate(dataset, cluster, pad_batch_multiple, shard=None):
    from ..train.collate import bucket_batch, collate_batch

    if shard is not None:
        # Per-host slice of the global batch (multi-host training feeds
        # each process only its "data"-axis rows; VERDICT r4 item 5). The
        # global batch dim is a pure function of the CLUSTER size — which
        # every host derives identically from the shared batch-order RNG —
        # so hosts agree on B_glob without communicating, even when a
        # parse fails on one host (the failed row simply stays padded).
        p, P = shard
        B_glob = bucket_batch(len(cluster))
        if pad_batch_multiple:
            m = pad_batch_multiple
            B_glob = -(-B_glob // m) * m
        assert B_glob % P == 0, (B_glob, P)
        B_loc = B_glob // P
        local = cluster[p * B_loc:(p + 1) * B_loc]
        structures = [dataset.loader(example, assembly_id)
                      for example, assembly_id in local]
        structures = [s for s in structures if s]
        # Hosts must yield the same number of batches: an all-failed local
        # slice becomes an all-masked batch rather than being dropped.
        return collate_batch(structures, pad_batch_to=B_loc) \
            if structures else _empty_local_batch(dataset, B_loc)

    structures = [dataset.loader(example, assembly_id)
                  for example, assembly_id in cluster]
    structures = [s for s in structures if s]
    pad_b = None
    if structures:
        # Bucket the batch dim (compile count) and round up to the
        # data-parallel divisor when meshed.
        pad_b = bucket_batch(len(structures))
        if pad_batch_multiple:
            m = pad_batch_multiple
            pad_b = -(-pad_b // m) * m
    return collate_batch(structures, pad_batch_to=pad_b)


def _empty_local_batch(dataset, B_loc, L=64):
    """All-masked local slice (every row padded): keeps per-host batch
    counts aligned when this host's slice of a cluster fully fails to
    parse. PAD tokens carry no loss, so the slice is a no-op in training."""
    import numpy as np

    from .. import constants
    from ..train.collate import collate_batch

    ds_cfg = getattr(dataset, "cfg", None) or getattr(dataset, "config", None)
    nA = len(getattr(ds_cfg, "atom_list_to_save", ())) or 16
    s = {
        "X": np.zeros([1, nA, 3], np.float32),
        "X_m": np.zeros([1, nA], np.int32),
        "mask": np.zeros([1], np.int32),
        "S": np.full([1], constants.RESTYPE_TO_INT["PAD"], np.int64),
        "R_idx": np.full([1], -100, np.int32),
        "chain_labels": np.full([1], -1, np.int64),
        "protein_mask": np.zeros([1], np.int32),
        "dna_mask": np.zeros([1], np.int32),
        "rna_mask": np.zeros([1], np.int32),
        "R_polymer_type": np.full([1], constants.POLYTYPE_TO_INT["PAD"],
                                  np.int64),
    }
    return collate_batch([s], pad_to=L, pad_batch_to=B_loc)


def _worker_load(cluster, pad_batch_multiple, shard=None):
    return _load_and_collate(_WORKER_DATASET, cluster, pad_batch_multiple,
                             shard)


class PrefetchLoader:
    """Iterate collated batches with worker-process prefetching.

    clusters: iterable of [(example_dict, assembly_id), ...] lists (the
    output of data.dataset.make_batch_iter). num_workers=0 loads inline
    (deterministic, no processes; an inline parse cache still applies).
    """

    def __init__(self, dataset, clusters: Iterable[List[Tuple]],
                 num_workers: int = 0, prefetch: int = 4,
                 pad_batch_multiple: Optional[int] = None,
                 parse_cache_size: int = 256,
                 shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.clusters = list(clusters)
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.pad_batch_multiple = pad_batch_multiple
        self.parse_cache_size = parse_cache_size
        # shard=(process_index, process_count): parse/collate ONLY this
        # host's contiguous "data"-axis rows of each global batch (multi-host
        # per-host feed — every host derives the same global batch layout
        # from the shared RNG, so no coordination is needed here).
        self.shard = shard
        self._pool = None

    def __len__(self):
        return len(self.clusters)

    def set_clusters(self, clusters: Iterable[List[Tuple]]):
        """Swap the epoch's cluster list without recreating the pool."""
        self.clusters = list(clusters)

    def _ensure_pool(self):
        if self._pool is None:
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                initializer=_worker_init,
                initargs=(self.dataset, self.parse_cache_size))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            if hasattr(self.dataset, "enable_parse_cache"):
                self.dataset.enable_parse_cache(self.parse_cache_size)
            for cluster in self.clusters:
                batch = _load_and_collate(self.dataset, cluster,
                                          self.pad_batch_multiple, self.shard)
                if batch is not None:
                    yield batch
            return

        pool = self._ensure_pool()
        pending = collections.deque()
        it = iter(self.clusters)

        def submit_next():
            try:
                cluster = next(it)
            except StopIteration:
                return False
            pending.append(pool.submit(_worker_load, cluster,
                                       self.pad_batch_multiple, self.shard))
            return True

        for _ in range(self.num_workers + self.prefetch):
            if not submit_next():
                break
        while pending:
            batch = pending.popleft().result()
            submit_next()
            if batch is not None:
                yield batch
