"""Golden parity of the optimizer's weight-decay grouping vs the reference.

The reference groups parameters in ``slowfast/models/optimizer.py:30-62``:
zero-WD for 1-D/bias params (``SOLVER.ZERO_WD_1D_PARAM``) and for any param
whose FULL dotted name from ``named_parameters()`` appears in the bare-name
list ``model.no_weight_decay()`` (``video_model_builder.py:267-289``, gated
on ``MVIT.ZERO_DECAY_POS_CLS``).  Because the list holds bare names, only
model-root params (``cls_token``, ``object_queries``, ``pos_embed_temporal``,
the abs pos-embeds) match; block-nested ``rel_pos_*`` do NOT (their dotted
names never equal a bare name) and are decayed.  These tests pin our
``wd_mask`` to the reference's actual ``param_groups``, not to a reading of
the code.
"""

import numpy as np
import pytest

from tests.conftest import small_cfg_pairs


def _reference_groups(ref_model, ref_cfg):
    """Map torch param name -> True iff the reference applies weight decay."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import slowfast.models.optimizer as ref_optim
    finally:
        sys.path.remove("/root/reference")

    optimizer = ref_optim.construct_optimizer(ref_model, ref_cfg)
    decay_by_id = {}
    for group in optimizer.param_groups:
        for p in group["params"]:
            decay_by_id[id(p)] = group["weight_decay"] != 0.0
    return {
        name: decay_by_id[id(p)] for name, p in ref_model.named_parameters()
    }


def _mask_by_torch_name(model, params, cfg):
    """Our wd_mask, exported to torch names via the checkpoint converter."""
    import jax

    from svit_tpu.models.optimizer import no_weight_decay_names, wd_mask
    from svit_tpu.utils import converter

    inner = params.get("params", params)
    mask = wd_mask(
        inner, cfg.SOLVER.ZERO_WD_1D_PARAM, no_weight_decay_names(cfg)
    )
    # Encode each leaf's mask bit as a constant array of the param's shape so
    # flax_to_torch's layout transposes pass through unchanged.
    coded = jax.tree.map(
        lambda p, m: np.full(p.shape, 1.0 if m else 0.0, np.float32),
        inner,
        mask,
    )
    return {
        name: bool(arr.flat[0])
        for name, arr in converter.flax_to_torch(coded).items()
    }


def _build(torch_reference, **overrides):
    import torch

    ref_builder, _ = torch_reference
    ref_cfg, cfg = small_cfg_pairs(torch_reference, **overrides)
    torch.manual_seed(0)
    ref_model = ref_builder.SViT(ref_cfg)

    from svit_tpu.models import build_model
    from svit_tpu.utils import converter

    model, _ = build_model(cfg)
    state = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = converter.torch_to_flax(state, separate_qkv=cfg.MVIT.SEPARATE_QKV)
    return ref_model, ref_cfg, model, params, cfg


@pytest.mark.parametrize(
    "overrides",
    [
        # Shipped ssv2 recipe: it explicitly sets ZERO_DECAY_POS_CLS: false
        # (configs/ssv2.yaml:164), so the name list is EMPTY in the published
        # training run and only the 1-D/bias rule applies.
        {},
        # The defaults.py default (True) — the case the knob exists for.
        {"MVIT.ZERO_DECAY_POS_CLS": True},
        {"SOLVER.ZERO_WD_1D_PARAM": False},
        {"MVIT.ZERO_DECAY_POS_CLS": True, "SOLVER.ZERO_WD_1D_PARAM": False},
    ],
    ids=["ssv2", "zero_decay_pos_cls", "no_zero_wd_1d", "names_only"],
)
def test_wd_grouping_matches_reference(torch_reference, overrides):
    ref_model, ref_cfg, model, params, cfg = _build(torch_reference, **overrides)
    assert ref_cfg.SOLVER.WEIGHT_DECAY != 0.0  # grouping readable from wd
    ref = _reference_groups(ref_model, ref_cfg)
    ours = _mask_by_torch_name(model, params, cfg)

    assert set(ref) == set(ours)
    mismatch = {n: (ours[n], ref[n]) for n in ref if ours[n] != ref[n]}
    assert not mismatch, f"decay-flag mismatches (ours, ref): {mismatch}"


def test_root_extras_join_zero_group(torch_reference):
    """With MVIT.ZERO_DECAY_POS_CLS on (defaults.py default; the shipped
    ssv2 recipe turns it OFF), cls_token/object_queries/pos_embed_temporal
    are zero-WD (they are ndim>=2, so the 1-D rule alone would decay them)."""
    ref_model, ref_cfg, model, params, cfg = _build(
        torch_reference, **{"MVIT.ZERO_DECAY_POS_CLS": True}
    )
    ours = _mask_by_torch_name(model, params, cfg)
    for name in ("cls_token", "object_queries", "pos_embed_temporal"):
        assert ours[name] is False, name
    # Nested rel-pos params stay DECAYED — the reference's dotted-name match
    # never hits them (see module docstring).
    rel = [n for n in ours if n.endswith(("rel_pos_h", "rel_pos_w", "rel_pos_t"))]
    assert rel, "expected rel-pos params in the ssv2 recipe"
    assert all(ours[n] for n in rel)
