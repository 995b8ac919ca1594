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
        import dataclasses
        import enum
        import functools
        import inspect

        import torch.nn as nn

        diff = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            def register_to_config(self, **kwargs):
                cfg = getattr(self, "config", None)
                if cfg is None:
                    cfg = EasyDict()
                    object.__setattr__(self, "config", cfg)
                for k, v in kwargs.items():
                    cfg[k] = v

        def register_to_config(init):
            """Functional version of diffusers' decorator: capture the bound
            init kwargs (with defaults) into an attribute-access `self.config`
            BEFORE running init — the vendored fm_solvers read self.config
            and call self.register_to_config() inside __init__."""

            @functools.wraps(init)
            def wrapped(self, *args, **kwargs):
                sig = inspect.signature(init)
                bound = sig.bind(self, *args, **kwargs)
                bound.apply_defaults()
                cfg = {k: v for k, v in list(bound.arguments.items())[1:]}
                cfg.pop("kwargs", None)
                self.config = EasyDict(cfg)
                init(self, *args, **kwargs)

            return wrapped

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        models_pkg = types.ModuleType("diffusers.models")
        mu = types.ModuleType("diffusers.models.modeling_utils")

        class ModelMixin(nn.Module):
            pass

        mu.ModelMixin = ModelMixin

        su_pkg = types.ModuleType("diffusers.schedulers")
        su = types.ModuleType("diffusers.schedulers.scheduling_utils")

        class KarrasDiffusionSchedulers(enum.Enum):
            pass

        class SchedulerMixin:
            order = 1

        @dataclasses.dataclass
        class SchedulerOutput:
            prev_sample: object

        su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
        su.SchedulerMixin = SchedulerMixin
        su.SchedulerOutput = SchedulerOutput

        du = types.ModuleType("diffusers.utils")

        def deprecate(*a, **k):
            return None

        du.deprecate = deprecate
        du.is_scipy_available = lambda: False
        dtu = types.ModuleType("diffusers.utils.torch_utils")

        def randn_tensor(shape, generator=None, device=None, dtype=None):
            import torch

            return torch.randn(shape, generator=generator, device=device, dtype=dtype)

        dtu.randn_tensor = randn_tensor
        du.torch_utils = dtu

        diff.configuration_utils = cu
        diff.models = models_pkg
        models_pkg.modeling_utils = mu
        diff.schedulers = su_pkg
        su_pkg.scheduling_utils = su
        diff.utils = du
        sys.modules.update({
            "diffusers": diff,
            "diffusers.configuration_utils": cu,
            "diffusers.models": models_pkg,
            "diffusers.models.modeling_utils": mu,
            "diffusers.schedulers": su_pkg,
            "diffusers.schedulers.scheduling_utils": su,
            "diffusers.utils": du,
            "diffusers.utils.torch_utils": dtu,
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
