"""Config system: `inherit:` resolution, deep-merge precedence, global state
(reference mast3r_slam/config.py `load_config` semantics)."""

import copy
import pathlib

from monst3r_slam_tpu.app.config import config, load_config, merge_config


def test_inherit_chain_and_override_precedence(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "a: 1\n"
        "tracking:\n  Q_conf: 1.5\n  C_conf: 0.0\n"
        "nested:\n  keep: base\n  override: base\n"
    )
    (tmp_path / "mid.yaml").write_text(
        "inherit: %s\n"
        "tracking:\n  Q_conf: 2.0\n"
        "nested:\n  override: mid\n" % (tmp_path / "base.yaml")
    )
    (tmp_path / "leaf.yaml").write_text(
        "inherit: %s\nb: 3\n" % (tmp_path / "mid.yaml")
    )
    cfg = load_config(str(tmp_path / "leaf.yaml"))
    assert cfg["a"] == 1 and cfg["b"] == 3  # both ends of the chain
    assert cfg["tracking"]["Q_conf"] == 2.0  # child overrides parent
    assert cfg["tracking"]["C_conf"] == 0.0  # sibling keys survive the merge
    assert cfg["nested"] == {"keep": "base", "override": "mid"}
    # load_config(set_global=True) publishes to the module-level config
    assert config["b"] == 3


def test_inherit_falls_back_to_config_dir(tmp_path):
    """An `inherit:` path that doesn't exist from cwd resolves against the
    config file's own directory (the reference's configs use repo-relative
    paths that must also work when invoked from elsewhere)."""
    (tmp_path / "parent.yaml").write_text("x: 7\n")
    (tmp_path / "child.yaml").write_text(
        "inherit: not/a/real/dir/parent.yaml\ny: 8\n"
    )
    cfg = load_config(str(tmp_path / "child.yaml"))
    assert cfg["x"] == 7 and cfg["y"] == 8


def test_repo_config_family_loads_and_inherits_base():
    repo = pathlib.Path(__file__).parent.parent
    base = load_config(str(repo / "config" / "base.yaml"))
    # intrinsics.yaml is a standalone calibration file (passed via --calib),
    # not an inheriting config — same as the reference
    for name in ("calib", "eval_calib", "eval_no_calib", "eth3d",
                 "dynamic_mask_test"):
        cfg = load_config(str(repo / "config" / f"{name}.yaml"))
        # every member of the family carries the full base schema
        for key in ("tracking", "local_opt", "matching", "retrieval",
                    "single_thread", "use_dynamic_mask"):
            assert key in cfg, (name, key)
        assert isinstance(cfg["tracking"], dict)
    # base round-trips through merge with an empty override (deep copy:
    # merge_config mutates and returns its first argument)
    assert merge_config(copy.deepcopy(base), {}) == base
