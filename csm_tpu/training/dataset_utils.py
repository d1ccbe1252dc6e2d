"""Dataset → batch-stream adaptation for the trainers."""

from __future__ import annotations

from typing import Iterable

from csm_tpu.training.losses import Batch


def as_batches(dataset, batch_size: int, shuffle: bool = True, seed: int = 0) -> Iterable[Batch]:
    """Accepts a CSMDataset, a list of prebuilt ``Batch``es, a callable
    returning an iterable, or any iterable of Batches."""
    if dataset is None:
        return []
    if isinstance(dataset, (list, tuple)):
        return dataset
    from csm_tpu.data.dataset import CSMDataset, batch_iterator

    if isinstance(dataset, CSMDataset):
        return batch_iterator(dataset, batch_size, shuffle=shuffle, seed=seed)
    if callable(dataset):
        return dataset()
    return dataset
