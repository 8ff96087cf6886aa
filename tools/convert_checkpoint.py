#!/usr/bin/env python3
"""Checkpoint converter CLI: PyTorch ``.pyth`` <-> orbax.

    python tools/convert_checkpoint.py --input ckpt.pyth --output out_dir \
        [--to-torch]

Conversion rules documented in ``svit_tpu/utils/converter.py`` (qkv handling,
conv layout transposes, LayerNorm naming).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--to-torch", action="store_true",
        help="convert an orbax checkpoint back to a torch state_dict (.pyth)",
    )
    p.add_argument("--separate-qkv", action="store_true")
    p.add_argument(
        "--input-order", choices=["bgr", "rgb"], default="bgr",
        help="channel order the torch checkpoint was trained with. The "
        "reference pipeline feeds cv2-BGR frames (never converted), so "
        "released .pyth checkpoints are 'bgr' (default): the stem kernel's "
        "input channels are flipped so svit_tpu's RGB pipeline is exact. "
        "Use 'rgb' for checkpoints trained with an RGB pipeline.",
    )
    args = p.parse_args()

    from svit_tpu.utils import converter

    if args.to_torch:
        import orbax.checkpoint as ocp
        import torch

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(args.input))
        params = restored.get("params", restored)
        state = converter.flax_to_torch({"params": params})
        if args.input_order == "bgr":
            # exporting back to the reference's BGR-input convention
            state = converter.flip_input_channels(state)
        torch.save(
            {"model_state": {k: torch.from_numpy(v) for k, v in state.items()}},
            args.output,
        )
        print(f"wrote torch checkpoint: {args.output} ({len(state)} tensors)")
    else:
        import orbax.checkpoint as ocp

        state = converter.load_torch_state(args.input)
        if args.input_order == "bgr":
            state = converter.flip_input_channels(state)
        tree = converter.torch_to_flax(state, separate_qkv=args.separate_qkv)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(args.output), tree)
        n = sum(1 for _ in _leaves(tree))
        print(f"wrote orbax checkpoint: {args.output} ({n} tensors)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
