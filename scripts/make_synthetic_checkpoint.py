#!/usr/bin/env python
"""Write a SMALL AsymmetricMASt3R torch checkpoint in the reference's real
on-disk pickle format ({'args': Namespace(model=<ctor string>), 'model':
state_dict} — mast3r/model.py:21-37), so scripts/run_real.sh can smoke-test
its download -> convert -> run -> ATE stitching inside this image where the
real 2.2 GB checkpoint cannot be fetched.

Usage: python scripts/make_synthetic_checkpoint.py <out.pth> [seed]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/MASt3R-SLAM/thirdparty/mast3r"
for p in (REF, f"{REF}/dust3r", f"{REF}/dust3r/croco"):
    if p not in sys.path:
        sys.path.insert(0, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("seed", nargs="?", type=int, default=0)
    args = ap.parse_args()

    import torch

    torch.manual_seed(args.seed)
    from mast3r.model import AsymmetricMASt3R

    # Tiny dims: fast to run under the JAX pipeline, same architecture
    # family (RoPE100, ManyAR patch embed, catmlp+dpt head, two_confs).
    kw = dict(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=4,
    )
    arch = (
        "AsymmetricMASt3R(pos_embed='RoPE100', patch_embed_cls='ManyAR_PatchEmbed', "
        "img_size=(512, 512), head_type='catmlp+dpt', output_mode='pts3d+desc24', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        + ", ".join(f"{k}={v}" for k, v in kw.items())
        + ", two_confs=True, desc_conf_mode=('exp', 0, inf))"
    )
    model = AsymmetricMASt3R(
        pos_embed="RoPE100", patch_embed_cls="ManyAR_PatchEmbed",
        img_size=(512, 512), head_type="catmlp+dpt",
        output_mode="pts3d+desc24", depth_mode=("exp", -float("inf"), float("inf")),
        conf_mode=("exp", 1, float("inf")), two_confs=True,
        desc_conf_mode=("exp", 0, float("inf")), **kw,
    )
    torch.save(
        {"args": argparse.Namespace(model=arch), "model": model.state_dict()},
        args.out,
    )
    n = sum(p.numel() for p in model.parameters())
    print(f"wrote {args.out} ({n/1e6:.2f}M params, real pickle format)")


if __name__ == "__main__":
    main()
