"""Checkpoint subsystem tests: orbax round trip, torch round trip, policies."""

import numpy as np
import pytest

from svit_tpu.config import get_cfg


def test_torch_flax_roundtrip(torch_reference):
    """flax->torch->flax is the identity on a real reference state dict."""
    import torch

    from svit_tpu.utils import converter
    from tests.test_golden_model import _build_pair

    ref_model, model, params, cfg = _build_pair(torch_reference)
    state = converter.flax_to_torch(params)
    params2 = converter.torch_to_flax(state)

    import jax

    leaves1 = jax.tree_util.tree_leaves_with_path(params)
    leaves2_map = {
        tuple(str(k) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(params2)
    }
    assert len(leaves1) == len(leaves2_map)
    for path, leaf in leaves1:
        key = tuple(str(k) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf), leaves2_map[key])


def test_torch_state_loadable_by_reference(torch_reference):
    """Our exported state dict load cleanly into the reference model."""
    import torch

    from svit_tpu.utils import converter
    from tests.test_golden_model import _build_pair

    ref_model, model, params, cfg = _build_pair(torch_reference)
    state = converter.flax_to_torch(params)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()},
        strict=True,
    )
    assert not missing and not unexpected


def test_orbax_save_restore(tmp_path):
    import jax.numpy as jnp

    from svit_tpu.engine import steps
    from svit_tpu.utils import checkpoint as cu

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.CHECKPOINT_PERIOD = 1

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    import optax

    tx = optax.sgd(0.1)
    state = steps.create_train_state(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    cu.save_checkpoint(str(tmp_path), state, epoch=3, cfg=cfg)
    assert cu.has_checkpoint(str(tmp_path))
    last = cu.get_last_checkpoint(str(tmp_path))
    restored, epoch = cu.load_train_state(last, state)
    assert epoch == 3
    assert restored["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.asarray(params["w"]))


def test_checkpoint_epoch_policy():
    from svit_tpu.utils import checkpoint as cu

    cfg = get_cfg()
    cfg.TRAIN.CHECKPOINT_PERIOD = 5
    cfg.SOLVER.MAX_EPOCH = 12
    saves = [e for e in range(12) if cu.is_checkpoint_epoch(cfg, e)]
    assert saves == [4, 9, 11]  # every 5th + the final epoch


def test_shape_filtered_merge_logs_misses():
    from svit_tpu.utils import checkpoint as cu

    target = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}}
    loaded = {"a": np.ones((2, 2)), "b": {"c": np.ones(4)}}  # c mismatched
    merged = cu.shape_filtered_merge(target, loaded)
    np.testing.assert_array_equal(merged["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"]["c"], np.zeros(3))  # kept init


def test_test_checkpoint_priority(tmp_path):
    from svit_tpu.utils import checkpoint as cu

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TEST.CHECKPOINT_FILE_PATH = ""
    cfg.TRAIN.CHECKPOINT_FILE_PATH = "train.pyth"
    assert cu.load_test_checkpoint_path(cfg) == "train.pyth"
    cfg.TEST.CHECKPOINT_FILE_PATH = "test.pyth"
    assert cu.load_test_checkpoint_path(cfg) == "test.pyth"
