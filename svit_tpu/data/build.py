"""Dataset registry dispatch (reference ``slowfast/datasets/build.py``)."""

from __future__ import annotations

from svit_tpu.models.registry import DATASET_REGISTRY


def build_dataset(dataset_name: str, cfg, split: str):
    """Capitalized name -> registered class (reference build.py:27-31)."""
    name = dataset_name.capitalize()
    return DATASET_REGISTRY.get(name)(cfg, split)
