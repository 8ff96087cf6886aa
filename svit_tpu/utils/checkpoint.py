"""Checkpoint subsystem (reference ``slowfast/utils/checkpoint.py``).

Orbax-backed save/load of the full train state with the reference's
policies preserved:

- save every ``CHECKPOINT_PERIOD`` epochs + at the last epoch, master-host
  only (orbax handles multi-host coordination);
- auto-resume from the latest checkpoint in ``OUTPUT_DIR/checkpoints``;
- warm-start from ``TRAIN.CHECKPOINT_FILE_PATH`` with
  ``CHECKPOINT_EPOCH_RESET``;
- test-time priority: TEST path > last checkpoint > TRAIN path
  (reference ``checkpoint.py:511-548``);
- ``.pyth`` (torch) files are converted losslessly on load via
  ``svit_tpu.utils.converter`` — the released SViT checkpoints plug straight
  in.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from svit_tpu.utils import converter, logging

logger = logging.get_logger(__name__)

_DIR = "checkpoints"


def checkpoint_dir(path_to_job: str) -> str:
    return os.path.join(path_to_job, _DIR)


def checkpoint_path(
    path_to_job: str, epoch: int, step_in_epoch: Optional[int] = None
) -> str:
    name = f"checkpoint_epoch_{epoch:05d}"
    if step_in_epoch is not None:
        # Mid-epoch (preemption) save: epoch NOT complete, the first
        # ``step_in_epoch`` iterations of epoch ``epoch`` are done. The plain
        # epoch name is a lexicographic prefix of this one, so the sorted
        # get_last_checkpoint order stays correct.
        name += f"_step_{step_in_epoch:08d}"
    return os.path.join(checkpoint_dir(path_to_job), name)


def get_last_checkpoint(path_to_job: str) -> Optional[str]:
    d = checkpoint_dir(path_to_job)
    if not os.path.isdir(d):
        return None
    names = sorted(n for n in os.listdir(d) if n.startswith("checkpoint_epoch_"))
    return os.path.join(d, names[-1]) if names else None


def has_checkpoint(path_to_job: str) -> bool:
    return get_last_checkpoint(path_to_job) is not None


def is_checkpoint_epoch(cfg, cur_epoch: int) -> bool:
    """reference checkpoint.py:99-121 (no multigrid schedule special-casing)."""
    return (
        cur_epoch + 1
    ) % cfg.TRAIN.CHECKPOINT_PERIOD == 0 or cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH


def save_checkpoint(
    path_to_job: str, state, epoch: int, cfg, step_in_epoch: Optional[int] = None
) -> str:
    """Save {params, opt_state, step, epoch, cfg-dump} via orbax.

    ``step_in_epoch`` marks a mid-epoch (preemption) save: epoch ``epoch`` is
    incomplete with that many leading iterations already applied; resume
    continues inside the same epoch. ``None`` means the epoch completed.
    """
    import orbax.checkpoint as ocp

    if step_in_epoch is None:
        path = checkpoint_path(path_to_job, epoch + 1)
    else:
        path = checkpoint_path(path_to_job, epoch, step_in_epoch)
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": jax.device_get(state.params),
                "opt_state": jax.device_get(state.opt_state),
                "step": int(state.step),
                "epoch": epoch,
                "step_in_epoch": -1 if step_in_epoch is None else step_in_epoch,
            },
        )
    with open(os.path.join(path, "cfg.yaml"), "w") as f:
        f.write(cfg.dump())
    logger.info("Saved checkpoint to %s", path)
    return path


def load_train_state(path: str, abstract_state) -> Tuple[Any, int]:
    """Restore a train state saved by ``save_checkpoint``; returns
    (state_dict, epoch). ``state_dict["step_in_epoch"]`` >= 0 marks a
    mid-epoch save (that many iterations of ``epoch`` already applied)."""
    import orbax.checkpoint as ocp

    template = {
        "params": jax.device_get(abstract_state.params),
        "opt_state": jax.device_get(abstract_state.opt_state),
        "step": 0,
        "epoch": 0,
        "step_in_epoch": -1,
    }
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(os.path.abspath(path), template)
        except BaseException:
            # pre-step-granular checkpoints lack the step_in_epoch leaf
            del template["step_in_epoch"]
            restored = ckptr.restore(os.path.abspath(path), template)
            restored = dict(restored, step_in_epoch=-1)
    return restored, int(restored["epoch"])


def load_params_any(path: str, abstract_params=None, cfg=None):
    """Load parameters from either a torch ``.pyth`` file or an orbax dir.

    Returns a {'params': ...} pytree of numpy arrays.
    """
    if os.path.isfile(path) and (path.endswith(".pyth") or path.endswith(".pt")
                                 or path.endswith(".pth")):
        clear = tuple(cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN) if cfg else ()
        replace = tuple(
            tuple(p) for p in cfg.TRAIN.CHECKPOINT_REPLACE_NAME_PATTERN
        ) if cfg else ()
        state = converter.load_torch_state(path, clear, replace)
        return converter.torch_to_flax(state)
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if abstract_params is not None:
            template = {"params": jax.device_get(abstract_params)}
            try:
                restored = ckptr.restore(os.path.abspath(path), template)
                return restored
            except Exception:
                pass
        restored = ckptr.restore(os.path.abspath(path))
    if "params" in restored:
        return {"params": restored["params"]}
    return {"params": restored}


def shape_filtered_merge(target_params, loaded_params):
    """Merge loaded into target keeping only shape-matching leaves, logging
    misses (reference checkpoint.py:353-372 semantics)."""
    merged_count = [0]
    missed = []

    def walk(dst: dict, src: dict, prefix: str):
        out = {}
        for k, v in dst.items():
            full = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out[k] = walk(v, src.get(k, {}) if isinstance(src, dict) else {}, full)
            else:
                sv = src.get(k) if isinstance(src, dict) else None
                if sv is not None and tuple(np.shape(sv)) == tuple(v.shape):
                    out[k] = np.asarray(sv, dtype=np.asarray(v).dtype)
                    merged_count[0] += 1
                else:
                    missed.append(full)
                    out[k] = v
        return out

    merged = walk(target_params, loaded_params, "")
    if missed:
        logger.warning(
            "checkpoint load: %d params loaded, %d kept at init (e.g. %s)",
            merged_count[0], len(missed), missed[:8],
        )
    else:
        logger.info("checkpoint load: all %d params loaded", merged_count[0])
    return merged


def load_test_checkpoint_path(cfg) -> Optional[str]:
    """Priority: TEST path > last ckpt > TRAIN path (reference :511-548)."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        return cfg.TEST.CHECKPOINT_FILE_PATH
    last = get_last_checkpoint(cfg.OUTPUT_DIR)
    if last:
        return last
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        return cfg.TRAIN.CHECKPOINT_FILE_PATH
    logger.info(
        "Testing with random initialization. Only for debugging."
    )
    return None
