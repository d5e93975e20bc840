#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) to a native .ckpt.

The eval/demo CLIs load ``.pth`` files directly (converted on the fly);
this tool materializes the conversion once so subsequent loads skip torch:

  python convert_checkpoint.py --ckpt pretrained_models/matterport.pth \
      --out matterport.ckpt --fusion_transformer --transformer_depth 6

The output holds {params, bn_state, step=0} — loadable by demo/eval CLIs
and usable as a ``--ckpt`` warm start for train.py.
"""

import argparse

from rel_pose_tpu.config import add_model_flags, model_config_from_args
from rel_pose_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="input .pth")
    parser.add_argument("--out", required=True, help="output .ckpt")
    add_model_flags(parser, fusion_default=True)
    args = parser.parse_args()

    from rel_pose_tpu.utils.convert import load_torch_checkpoint
    from rel_pose_tpu.train.checkpoint import save_checkpoint

    cfg = model_config_from_args(args)
    params, bn_state = load_torch_checkpoint(args.ckpt, cfg)
    save_checkpoint(args.out, {"params": params, "bn_state": bn_state,
                               "opt_state": {}, "step": 0})
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {args.ckpt} -> {args.out} ({n:,} parameters)")


if __name__ == "__main__":
    main()
