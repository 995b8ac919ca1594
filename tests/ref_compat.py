"""Import helpers for the torch reference implementation at /root/reference.

Test-only shims: `easydict` and the few diffusers symbols the reference model
files use (ConfigMixin, register_to_config, ModelMixin) are stubbed so the
files import on CPU torch. The `wan` package __init__ (which pulls
distributed/xfuser/generator deps) is bypassed with synthetic package modules
so `wan.modules.causal_model` / `wan.modules.vae` load standalone.

Used only by tests/test_ref_parity.py — nothing in the product package
imports the reference.
"""
from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"


class EasyDict(dict):
    """Minimal attribute-access dict (the pypi easydict contract the
    reference configs rely on)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        for k, v in dict(d or {}, **kwargs).items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, EasyDict):
            value = EasyDict(value)
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(key) from e


def install_stubs() -> None:
    if REF not in sys.path:
        sys.path.append(REF)

    # sinusoidal_embedding_1d hardcodes device=torch.cuda.current_device()
    # (model.py:22); on CPU-only torch redirect it to the CPU device.
    import torch

    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"

    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = EasyDict
        sys.modules["easydict"] = m

    if "diffusers" not in sys.modules:
        import torch.nn as nn

        diff = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            pass

        def register_to_config(fn):
            return fn

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        models_pkg = types.ModuleType("diffusers.models")
        mu = types.ModuleType("diffusers.models.modeling_utils")

        class ModelMixin(nn.Module):
            pass

        mu.ModelMixin = ModelMixin
        diff.configuration_utils = cu
        diff.models = models_pkg
        models_pkg.modeling_utils = mu
        sys.modules.update({
            "diffusers": diff,
            "diffusers.configuration_utils": cu,
            "diffusers.models": models_pkg,
            "diffusers.models.modeling_utils": mu,
        })

    # bypass wan/__init__.py: it imports configs/distributed/image2video which
    # pull deps (xfuser, torchvision pipelines) this environment lacks
    if "wan" not in sys.modules:
        wan = types.ModuleType("wan")
        wan.__path__ = [f"{REF}/wan"]
        mods = types.ModuleType("wan.modules")
        mods.__path__ = [f"{REF}/wan/modules"]
        sys.modules["wan"] = wan
        sys.modules["wan.modules"] = mods


def load(name: str):
    """Import a reference module (e.g. 'wan.modules.causal_model') with the
    shims installed."""
    install_stubs()
    return importlib.import_module(name)
