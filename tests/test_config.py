import os

import pytest

from svit_tpu.config import CfgNode, assert_and_infer_cfg, get_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_load():
    cfg = get_cfg()
    assert cfg.MVIT.EMBED_DIM == 96
    assert cfg.SVIT.O == 4


def test_merge_ssv2_yaml():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "ssv2.yaml"))
    assert cfg.MODEL.NUM_CLASSES == 174
    assert cfg.MVIT.DEPTH == 16
    # "(3, 7, 7)" string literal decodes to a tuple/list
    assert list(cfg.MVIT.PATCH_KERNEL) == [3, 7, 7]
    assert cfg.SOLVER.BASE_LR == 2e-4
    assert cfg.TRAIN.MIXED_PRECISION is True
    assert_and_infer_cfg(cfg)


def test_merge_from_list_cli_contract():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["TRAIN.BATCH_SIZE", "16", "MVIT.DIM_MUL", "[[1, 2.0]]", "MODEL.MODEL_NAME", "SViT"]
    )
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.MVIT.DIM_MUL == [[1, 2.0]]
    assert cfg.MODEL.MODEL_NAME == "SViT"


def test_unknown_key_rejected():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 1
    cfg.defrost()
    cfg.TRAIN.BATCH_SIZE = 1


def test_dump_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.TRAIN.BATCH_SIZE = 7
    dump = cfg.dump()
    path = tmp_path / "cfg.yaml"
    path.write_text(dump)
    cfg2 = get_cfg()
    cfg2.merge_from_file(str(path))
    assert cfg2.TRAIN.BATCH_SIZE == 7


def test_lr_scaled_by_shards():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR_SCALE_NUM_SHARDS = True
    cfg.NUM_SHARDS = 4
    base = cfg.SOLVER.BASE_LR
    assert_and_infer_cfg(cfg)
    assert cfg.SOLVER.BASE_LR == base * 4


def test_nested_new_cfgnode():
    c = CfgNode({"A": {"B": 1}})
    assert isinstance(c.A, CfgNode)
    assert c.A.B == 1


def test_device_aug_parity_guard(caplog):
    """DEVICE_AUG warns by default and hard-errors under PARITY_STRICT
    (VERDICT r2 item 9: the device policy approximates the reference
    augmentation distribution)."""
    import logging

    cfg = get_cfg()
    cfg.TPU.DEVICE_AUG = True
    with caplog.at_level(logging.WARNING):
        assert_and_infer_cfg(cfg)
    assert any("DEVICE_AUG" in r.message for r in caplog.records)

    cfg = get_cfg()
    cfg.TPU.DEVICE_AUG = True
    cfg.TPU.PARITY_STRICT = True
    with pytest.raises(ValueError, match="PARITY_STRICT"):
        assert_and_infer_cfg(cfg)
