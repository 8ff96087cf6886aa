"""Multi-host runtime init + host-side collectives.

TPU-native replacement for reference ``slowfast/utils/distributed.py``:
``jax.distributed.initialize`` over DCN replaces the NCCL/gloo process-group
dance; host-side metric gathers (the reference's pickled
``all_gather_unaligned``) map to ``multihost_utils.process_allgather``.
"""

from __future__ import annotations

import jax

from svit_tpu.utils import logging

logger = logging.get_logger(__name__)


def init_distributed(cfg) -> None:
    """Initialize multi-host JAX when NUM_SHARDS > 1 (single-host is a no-op,
    mirroring the reference's degrade-to-direct-call path, misc.py:283-299)."""
    if cfg.NUM_SHARDS <= 1:
        return
    coordinator = cfg.INIT_METHOD.replace("tcp://", "")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=cfg.NUM_SHARDS,
        process_id=cfg.SHARD_ID,
    )
    logger.info(
        "Initialized multi-host: %d/%d @ %s",
        cfg.SHARD_ID, cfg.NUM_SHARDS, coordinator,
    )


def is_master_proc() -> bool:
    return jax.process_index() == 0


def get_world_size() -> int:
    return jax.process_count()


def all_gather_host(obj):
    """Gather an arbitrary pytree of arrays across hosts (outside jit)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(obj)
