"""Model statistics + misc helpers (reference ``slowfast/utils/misc.py``).

``log_model_info`` reports params / activations / FLOPs — the reference uses
fvcore on a dummy input (``misc.py:80-200``); here XLA's own compiled cost
analysis provides FLOPs exactly for the program that will run.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from svit_tpu.utils import logging

logger = logging.get_logger(__name__)


def params_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def get_model_stats(model, params, cfg, mode: str = "flop"):
    """FLOPs (or bytes) of one eval forward at the configured clip shape."""
    S = cfg.DATA.TRAIN_CROP_SIZE
    T = cfg.DATA.NUM_FRAMES
    x = jnp.zeros((1, T, S, S, 3), jnp.float32)
    compiled = jax.jit(
        lambda p, x: model.apply(p, x, deterministic=True)[0]
    ).lower(params, x).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    if mode == "flop":
        return analysis.get("flops", float("nan"))
    if mode == "bytes":
        return analysis.get("bytes accessed", float("nan"))
    raise NotImplementedError(mode)


def log_model_info(model, params, cfg):
    n_params = params_count(params)
    logger.info("Model: %s", cfg.MODEL.MODEL_NAME)
    logger.info("Params: %s", f"{n_params:,}")
    try:
        flops = get_model_stats(model, params, cfg, "flop")
        logger.info("GFLOPs (fwd, 1 clip): %.2f", flops / 1e9)
    except Exception as e:  # cost analysis is backend-dependent
        logger.warning("FLOP analysis unavailable: %s", e)
        flops = float("nan")
    return n_params, flops


def check_nan_losses(loss: float, extra_msg: str = ""):
    """Raise on NaN loss (reference ``misc.py:25-35``)."""
    if math.isnan(loss):
        raise RuntimeError(f"ERROR: Got NaN losses {extra_msg}")


def get_num_classes(cfg):
    """reference ``misc.py:406-410``."""
    if cfg.TRAIN.DATASET == "epickitchens":
        return {"noun": 300, "verb": 97}
    return cfg.MODEL.NUM_CLASSES


def launch_job(cfg, init_method=None, func=None, daemon=False):
    """Run a job entry point (reference ``misc.py:271-299``).

    The reference spawns one process per GPU; on TPU a single process per
    host drives the whole chip mesh, so this initializes the multi-host
    runtime (when NUM_SHARDS > 1) and calls ``func(cfg)`` directly — the
    same degenerate path the reference takes at NUM_GPUS <= 1.
    """
    from svit_tpu.parallel.dist import init_distributed

    if init_method is not None:
        cfg.INIT_METHOD = init_method
    init_distributed(cfg)
    return func(cfg)
