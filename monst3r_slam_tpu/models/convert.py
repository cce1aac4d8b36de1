"""Torch checkpoint -> JAX parameter pytree conversion.

Handles MASt3R / MonST3R / DUSt3R `.pth` checkpoints whose state dict follows
the reference naming (`dust3r/model.py`, `croco/models/*`,
`mast3r/catmlp_dpt_head.py`). The architecture is recovered from the
checkpoint's stored arch string (`dust3r/model.py:27-43` evals it; we parse the
few relevant kwargs instead of eval'ing untrusted code).

Layout transformations:
  * torch Linear (out, in)            -> (in, out)
  * torch Conv2d (O, I, kh, kw)       -> HWIO (kh, kw, I, O)
  * torch ConvTranspose2d (I, O, k, k)-> (k, k, I, O)
  * patch-embed conv (D, 3, P, P)     -> per-patch linear (P*P*3, D) matching
    the (p, p, c) patch flattening order of `croco.patch_embed`.
  * per-block params stacked along a leading depth axis for `lax.scan`.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.models.config import INF, ModelConfig


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _linear(sd, name):
    p = {"w": _t(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def _ln(sd, name):
    return {"w": _t(sd[f"{name}.weight"]), "b": _t(sd[f"{name}.bias"])}


def _conv(sd, name):
    w = _t(sd[f"{name}.weight"])  # (O, I, kh, kw)
    p = {"w": w.transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def _conv_transpose(sd, name):
    w = _t(sd[f"{name}.weight"])  # (I, O, kh, kw)
    return {"w": w.transpose(2, 3, 0, 1), "b": _t(sd[f"{name}.bias"])}


def _patch_embed(sd, name):
    w = _t(sd[f"{name}.weight"])  # (D, 3, P, P)
    d, c, p1, p2 = w.shape
    # croco.patch_embed flattens patches as (p, p, c); conv as (c, p, p)
    w = w.transpose(2, 3, 1, 0).reshape(p1 * p2 * c, d)
    return {"proj": {"w": w, "b": _t(sd[f"{name}.bias"])}}


def _enc_block(sd, pfx):
    return {
        "norm1": _ln(sd, f"{pfx}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{pfx}.attn.qkv"),
            "proj": _linear(sd, f"{pfx}.attn.proj"),
        },
        "norm2": _ln(sd, f"{pfx}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{pfx}.mlp.fc1"),
            "fc2": _linear(sd, f"{pfx}.mlp.fc2"),
        },
    }


def _dec_block(sd, pfx):
    return {
        "norm1": _ln(sd, f"{pfx}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{pfx}.attn.qkv"),
            "proj": _linear(sd, f"{pfx}.attn.proj"),
        },
        "norm2": _ln(sd, f"{pfx}.norm2"),
        "norm3": _ln(sd, f"{pfx}.norm3"),
        "norm_y": _ln(sd, f"{pfx}.norm_y"),
        "cross": {
            "q": _linear(sd, f"{pfx}.cross_attn.projq"),
            "k": _linear(sd, f"{pfx}.cross_attn.projk"),
            "v": _linear(sd, f"{pfx}.cross_attn.projv"),
            "proj": _linear(sd, f"{pfx}.cross_attn.proj"),
        },
        "mlp": {
            "fc1": _linear(sd, f"{pfx}.mlp.fc1"),
            "fc2": _linear(sd, f"{pfx}.mlp.fc2"),
        },
    }


def _stack(blocks_list):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks_list)


def _fusion(sd, pfx):
    return {
        "res1": {
            "conv1": _conv(sd, f"{pfx}.resConfUnit1.conv1"),
            "conv2": _conv(sd, f"{pfx}.resConfUnit1.conv2"),
        },
        "res2": {
            "conv1": _conv(sd, f"{pfx}.resConfUnit2.conv1"),
            "conv2": _conv(sd, f"{pfx}.resConfUnit2.conv2"),
        },
        "out_conv": _conv(sd, f"{pfx}.out_conv"),
    }


def _dpt(sd, pfx):
    acts = [
        {"conv": _conv(sd, f"{pfx}.act_postprocess.0.0"),
         "up": _conv_transpose(sd, f"{pfx}.act_postprocess.0.1")},
        {"conv": _conv(sd, f"{pfx}.act_postprocess.1.0"),
         "up": _conv_transpose(sd, f"{pfx}.act_postprocess.1.1")},
        {"conv": _conv(sd, f"{pfx}.act_postprocess.2.0")},
        {"conv": _conv(sd, f"{pfx}.act_postprocess.3.0"),
         "down": _conv(sd, f"{pfx}.act_postprocess.3.1")},
    ]
    return {
        "act": acts,
        "layer_rn": [_conv(sd, f"{pfx}.scratch.layer{i}_rn") for i in (1, 2, 3, 4)],
        "refine1": _fusion(sd, f"{pfx}.scratch.refinenet1"),
        "refine2": _fusion(sd, f"{pfx}.scratch.refinenet2"),
        "refine3": _fusion(sd, f"{pfx}.scratch.refinenet3"),
        "refine4": _fusion(sd, f"{pfx}.scratch.refinenet4"),
        "head": {
            "conv1": _conv(sd, f"{pfx}.head.0"),
            "conv2": _conv(sd, f"{pfx}.head.2"),
            "conv3": _conv(sd, f"{pfx}.head.4"),
        },
    }


def _head(sd, head_name, has_desc):
    head = {"dpt": _dpt(sd, f"{head_name}.dpt")}
    if has_desc:
        head["local_feat"] = {
            "fc1": _linear(sd, f"{head_name}.head_local_features.fc1"),
            "fc2": _linear(sd, f"{head_name}.head_local_features.fc2"),
        }
    return head


def config_from_arch_string(arch: str) -> ModelConfig:
    """Parse the few architecture kwargs we need out of the checkpoint's
    stored ctor string instead of eval'ing it (dust3r/model.py:31-39)."""

    def _int(name, default):
        m = re.search(rf"{name}\s*=\s*(\d+)", arch)
        return int(m.group(1)) if m else default

    def _mode(name, default):
        m = re.search(rf"(?<![a-z_]){name}\s*=\s*\(\s*'(\w+)'\s*,\s*([^,]+),\s*([^)]+)\)", arch)
        if not m:
            return default

        def num(s):
            s = s.strip()
            if "inf" in s:
                return -INF if s.startswith("-") else INF
            return float(s)

        return (m.group(1), num(m.group(2)), num(m.group(3)))

    desc_dim = None
    m = re.search(r"output_mode\s*=\s*'pts3d\+desc(\d+)'", arch)
    if m:
        desc_dim = int(m.group(1))
    two_confs = "two_confs=True" in arch.replace(" ", "")
    conf_mode = _mode("conf_mode", ("exp", 1.0, INF))
    return ModelConfig(
        patch_size=_int("patch_size", 16),
        enc_depth=_int("enc_depth", 24),
        enc_dim=_int("enc_embed_dim", 1024),
        enc_heads=_int("enc_num_heads", 16),
        dec_depth=_int("dec_depth", 12),
        dec_dim=_int("dec_embed_dim", 768),
        dec_heads=_int("dec_num_heads", 12),
        desc_dim=desc_dim,
        two_confs=two_confs,
        depth_mode=_mode("depth_mode", ("exp", -INF, INF)),
        conf_mode=conf_mode,
        desc_conf_mode=_mode("desc_conf_mode", conf_mode),
    )


def params_from_state_dict(sd: Dict[str, np.ndarray], cfg: ModelConfig):
    """Build the full param pytree from a reference-format state dict."""
    # Second decoder falls back to the first if absent (dust3r/model.py:90-97)
    if not any(k.startswith("dec_blocks2") for k in sd):
        sd = dict(sd)
        for k in list(sd.keys()):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]

    has_desc = cfg.desc_dim is not None
    params = {
        "patch_embed": _patch_embed(sd, "patch_embed.proj"),
        "enc_blocks": _stack(
            [_enc_block(sd, f"enc_blocks.{i}") for i in range(cfg.enc_depth)]
        ),
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "dec_blocks": _stack(
            [_dec_block(sd, f"dec_blocks.{i}") for i in range(cfg.dec_depth)]
        ),
        "dec_blocks2": _stack(
            [_dec_block(sd, f"dec_blocks2.{i}") for i in range(cfg.dec_depth)]
        ),
        "dec_norm": _ln(sd, "dec_norm"),
        "head1": _head(sd, "downstream_head1", has_desc),
        "head2": _head(sd, "downstream_head2", has_desc),
    }
    return _to_jnp(params)


def _to_jnp(tree):
    import jax

    return jax.tree.map(jnp.asarray, tree)


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Cast matmul/conv weights to bf16 for inference (halves weight HBM
    traffic); layernorm/bias parameters stay f32 (they are applied in f32
    inside the blocks anyway).

    The whole cast runs as ONE jitted program when the leaves are device
    arrays: per-leaf `astype` on a remote-dispatch stack costs one tiny
    compile+dispatch per leaf (~minutes for a ViT-L tree); one fused program
    costs one.
    """
    import jax

    def cast(path, leaf):
        name = "/".join(str(getattr(k, "key", "")) for k in path)
        if leaf.ndim >= 2 and name.endswith("w"):
            return leaf.astype(dtype)
        return leaf

    def cast_tree(tree):
        return jax.tree_util.tree_map_with_path(cast, tree)

    leaves = jax.tree_util.tree_leaves(params)
    if leaves and isinstance(leaves[0], jax.Array):
        return jax.jit(cast_tree)(params)
    return cast_tree(params)


def load_checkpoint(path: str, cfg: Optional[ModelConfig] = None):
    """Load a reference torch checkpoint -> (params, cfg).

    Requires torch only at call time (CPU load). The checkpoint layout is
    {'args': Namespace(model=arch_string), 'model': state_dict}.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if cfg is None:
        arch = ckpt["args"].model if "args" in ckpt else ""
        cfg = config_from_arch_string(arch)
    return params_from_state_dict(sd, cfg), cfg
