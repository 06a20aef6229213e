"""Flag-surface parity against the reference's own argparse definitions.

The reference config classes import only argparse/os, so when the reference
tree is present we can introspect its parsers directly and compare every
flag name and default against ours.
"""

import importlib.util
import os
import sys

import pytest

from multimodal_similarity_tpu.configs import EvalConfig, TrainConfig

REF = "/root/reference/configs"

# reference defaults intentionally not mirrored:
#   ROOT / DATA_ROOT: machine-specific absolute paths
#   gpu: CUDA device selection has no TPU analog
#   num_threads: loader threading is internal here
#   reverse: the reference sets reverse=False (train_config.py:31-33) and
#     then accidentally overrides it to True inside the --weighted block
#     (:39 `set_defaults(reverse=True)`); the intended default (False) is
#     used here (SURVEY.md §7 'reproduce behaviors, not bugs')
SKIP = {"ROOT", "DATA_ROOT", "gpu", "num_threads", "reverse"}


def _load_ref(name):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    # satisfy `from .base_config import BaseConfig` with a package shim
    import types
    pkg = types.ModuleType("refconfigs")
    pkg.__path__ = [REF]
    sys.modules["refconfigs"] = pkg
    for mod in ("base_config", name):
        spec = importlib.util.spec_from_file_location(
            f"refconfigs.{mod}", os.path.join(REF, f"{mod}.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refconfigs.{mod}"] = m
        spec.loader.exec_module(m)
    return sys.modules[f"refconfigs.{name}"]


def _ref_defaults(cfg_obj):
    out = {}
    for action in cfg_obj.parser._actions:
        if action.dest in ("help",):
            continue
        out[action.dest] = action.default
    return out


def test_train_config_flags_match_reference():
    ref_mod = _load_ref("train_config")
    ref = _ref_defaults(ref_mod.TrainConfig())
    ours = TrainConfig()
    missing = [k for k in ref if not hasattr(ours, k) and k not in SKIP]
    assert not missing, f"flags missing here: {missing}"
    mismatched = []
    for k, v in ref.items():
        if k in SKIP or not hasattr(ours, k):
            continue
        ours_v = getattr(ours, k)
        if k == "feat":  # ours may normalize to list later; default is str
            ours_v = ours_v if isinstance(ours_v, str) else ",".join(ours_v)
        if ours_v != v:
            mismatched.append((k, v, ours_v))
    assert not mismatched, f"default mismatches (flag, ref, ours): {mismatched}"


def test_eval_config_flags_match_reference():
    ref_mod = _load_ref("eval_config")
    ref = _ref_defaults(ref_mod.EvalConfig())
    ours = EvalConfig()
    missing = [k for k in ref if not hasattr(ours, k) and k not in SKIP]
    assert not missing, f"flags missing here: {missing}"
    mismatched = [
        (k, v, getattr(ours, k)) for k, v in ref.items()
        if k not in SKIP and hasattr(ours, k) and getattr(ours, k) != v]
    assert not mismatched, f"default mismatches: {mismatched}"
