"""Parallel prefetching data loader.

Role of the reference's ``DataLoader(num_workers=12)`` (reference
na_run.py:183-193): a process pool parses/loads structure clusters ahead of
the training step so host-side parsing overlaps device compute. Batches are
collated in the workers and arrive ready to ship to the device.
"""
from __future__ import annotations

import collections
from concurrent.futures import ProcessPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple


def _load_and_collate(dataset, cluster, pad_batch_multiple):
    from ..train.collate import collate_batch

    structures = [dataset.loader(example, assembly_id)
                  for example, assembly_id in cluster]
    structures = [s for s in structures if s]
    pad_b = None
    if pad_batch_multiple and structures:
        m = pad_batch_multiple
        pad_b = -(-len(structures) // m) * m
    return collate_batch(structures, pad_batch_to=pad_b)


class PrefetchLoader:
    """Iterate collated batches with worker-process prefetching.

    clusters: iterable of [(example_dict, assembly_id), ...] lists (the
    output of data.dataset.make_batch_iter). num_workers=0 loads inline
    (deterministic, no processes).
    """

    def __init__(self, dataset, clusters: Iterable[List[Tuple]],
                 num_workers: int = 0, prefetch: int = 4,
                 pad_batch_multiple: Optional[int] = None):
        self.dataset = dataset
        self.clusters = list(clusters)
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.pad_batch_multiple = pad_batch_multiple

    def __len__(self):
        return len(self.clusters)

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for cluster in self.clusters:
                batch = _load_and_collate(self.dataset, cluster,
                                          self.pad_batch_multiple)
                if batch is not None:
                    yield batch
            return

        with ProcessPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            it = iter(self.clusters)

            def submit_next():
                try:
                    cluster = next(it)
                except StopIteration:
                    return False
                pending.append(pool.submit(_load_and_collate, self.dataset,
                                           cluster, self.pad_batch_multiple))
                return True

            for _ in range(self.num_workers + self.prefetch):
                if not submit_next():
                    break
            while pending:
                batch = pending.popleft().result()
                submit_next()
                if batch is not None:
                    yield batch
