"""YAML config system with `inherit:` chaining.

Same schema and semantics as the reference `mast3r_slam/config.py:7-54`
(including the scientific-notation float resolver and the recursive merge);
the global `config` dict is module-level since the TPU pipeline is a single
process (no re-broadcast needed).
"""

from __future__ import annotations

import pathlib
import re

import yaml

config: dict = {}

_FLOAT_RE = re.compile(
    """^(?:
        [-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*
        |[-+]?\\.(?:inf|Inf|INF)
        |\\.(?:nan|NaN|NAN))$""",
    re.X,
)


def _loader():
    loader = yaml.SafeLoader
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float", _FLOAT_RE, list("-+0123456789.")
    )
    return loader


def merge_config(parent: dict, child: dict) -> dict:
    for k, v in child.items():
        if isinstance(v, dict):
            parent.setdefault(k, {})
            if isinstance(parent[k], dict):
                merge_config(parent[k], v)
            else:
                parent[k] = v
        else:
            parent[k] = v
    return parent


def load_config(path: str, set_global: bool = True) -> dict:
    """Load a YAML config, resolving `inherit:` parents relative to cwd first
    and then to the config file's directory."""
    path = pathlib.Path(path)
    with open(path) as f:
        cfg = yaml.load(f, Loader=_loader()) or {}
    inherit = cfg.pop("inherit", None)
    if inherit is not None:
        parent_path = pathlib.Path(inherit)
        if not parent_path.exists():
            parent_path = path.parent / pathlib.Path(inherit).name
        parent = load_config(parent_path, set_global=False)
        cfg = merge_config(parent, cfg)
    if set_global:
        set_global_config(cfg)
    return cfg


def set_global_config(cfg: dict) -> dict:
    config.clear()
    config.update(cfg)
    return config
