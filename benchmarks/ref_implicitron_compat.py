"""Make the REFERENCE implicitron model zoo constructible in this
environment so it can serve as a same-family torch control
(VERDICT r4 directive #1: voxel / SDF reference controls).

The reference's implicitron config system
(/root/reference/pytorch3d/implicitron/tools/config.py) is built on
omegaconf, which is not installed here and cannot be (no egress).  Our
package already re-implements the SAME config contract on plain dicts
(pytorch3d_tpu/implicitron/tools/config.py) — this module injects that
implementation (extended with the reference's torch-specific hooks:
nn.Module pre-init, `pre_expand`, `create_<x>`/`create_<x>_impl`
overrides, `<x>_tweak_args`) under the reference's module name, plus
tiny stubs for omegaconf / torchvision / visdom, so that
`pytorch3d.implicitron.models.*` import and construct with real
reference math.

Used ONLY by the control benchmarks (train_parity_families ref arm);
never imported by the package itself.
"""

from __future__ import annotations

import contextlib
import sys
import types


def _install_omegaconf_stub() -> None:
    if "omegaconf" in sys.modules:
        return
    m = types.ModuleType("omegaconf")

    class DictConfig(dict):
        """Plain-dict DictConfig: attribute access + .pop/.get of dict."""

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name) from None

        def __setattr__(self, name, value):
            self[name] = value

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            return DictConfig(obj or {})

        @staticmethod
        def to_container(cfg, *, resolve=True):
            return dict(cfg)

        @staticmethod
        def merge(*cfgs):
            out = DictConfig()
            for c in cfgs:
                out.update(c)
            return out

        @staticmethod
        def is_dict(obj):
            return isinstance(obj, dict)

    @contextlib.contextmanager
    def open_dict(cfg):
        yield cfg

    m.DictConfig = DictConfig
    m.OmegaConf = OmegaConf
    m.open_dict = open_dict
    sys.modules["omegaconf"] = m


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return

    class _Raiser:
        def __init__(self, name):
            self._name = name

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Raiser(f"{self._name}.{name}")

        def __call__(self, *a, **k):  # pragma: no cover
            raise RuntimeError(
                f"torchvision stub: {self._name} is unavailable in the "
                "control environment"
            )

    def _module_getattr(name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Raiser(f"models.{name}")

    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so submodule imports resolve
    sys.modules["torchvision"] = tv
    for sub in ("models", "utils", "transforms"):
        m = types.ModuleType(f"torchvision.{sub}")
        m.__getattr__ = _module_getattr
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m


def _build_config_shim():
    """Our config machinery + the reference's torch-specific hooks."""
    import torch

    import pytorch3d_tpu.implicitron.tools.config as ourcfg

    base_expand = ourcfg.expand_args_fields.__wrapped__ if hasattr(
        ourcfg.expand_args_fields, "__wrapped__"
    ) else ourcfg.expand_args_fields
    base_run = getattr(
        ourcfg.run_auto_creation, "__wrapped__", ourcfg.run_auto_creation
    )

    def expand_args_fields(some_class, *, _do_not_process=()):
        already = "_processed_members" in some_class.__dict__
        if not already and "pre_expand" in some_class.__dict__:
            some_class.pre_expand()
        out = base_expand(some_class, _do_not_process=_do_not_process)
        # reference config.py:938 `_fixup_class_init`: dataclass-generated
        # __init__ must run nn.Module.__init__ first so field assignment
        # (which goes through nn.Module.__setattr__) registers modules.
        if (
            isinstance(out, type)
            and issubclass(out, torch.nn.Module)
            and "_dataclass_init" not in out.__dict__
        ):
            dc_init = out.__dict__.get("__init__")
            if dc_init is not None:
                out._dataclass_init = dc_init

                def init(self, *args, _dc_init=dc_init, **kwargs):
                    torch.nn.Module.__init__(self)
                    _dc_init(self, *args, **kwargs)

                out.__init__ = init
        return out

    expand_args_fields.__wrapped__ = base_expand

    def run_auto_creation(self):
        """Reference config.py:489 semantics: per-member `create_x`
        functions with `create_x_impl` / `x_tweak_args` overrides."""
        cls = type(self)
        expand_args_fields(cls)
        for name, (kind, base, is_optional) in cls._processed_members.items():
            create_override = getattr(cls, f"create_{name}", None)
            if create_override is not None:
                create_override(self)
                continue
            impl_fn = getattr(self, f"create_{name}_impl", None)
            if kind == "configurable":
                enabled = (
                    getattr(self, name + ourcfg.ENABLED_SUFFIX, True)
                    if is_optional
                    else True
                )
                args = getattr(self, name + ourcfg.ARGS_SUFFIX, {}) or {}
                if impl_fn is not None:
                    impl_fn(enabled, args)
                elif not enabled:
                    setattr(self, name, None)
                else:
                    setattr(self, name, base(**args))
            else:  # replaceable
                class_type = getattr(
                    self, name + ourcfg.CLASS_TYPE_SUFFIX, None
                )
                if class_type in (None, "", "None"):
                    setattr(self, name, None)
                    continue
                impl = ourcfg.registry.get(base, class_type)
                args = dict(
                    getattr(
                        self,
                        f"{name}_{class_type}{ourcfg.IMPL_SUFFIX}",
                        {},
                    )
                    or {}
                )
                if impl_fn is not None:
                    impl_fn(class_type, args)
                else:
                    expand_args_fields(impl)
                    setattr(self, name, impl(**args))

    run_auto_creation.__wrapped__ = base_run

    # patch in place so the recursive internal calls (expand of nested
    # members) go through the hook-aware versions; our own classes are
    # unaffected (not torch Modules, no reference hooks defined)
    ourcfg.expand_args_fields = expand_args_fields
    ourcfg.run_auto_creation = run_auto_creation

    shim = types.ModuleType("pytorch3d.implicitron.tools.config")
    for name in (
        "Configurable",
        "ReplaceableBase",
        "registry",
        "get_default_args",
        "get_default_args_field",
        "enable_get_default_args",
        "remove_unused_components",
    ):
        setattr(shim, name, getattr(ourcfg, name))
    shim.expand_args_fields = expand_args_fields
    shim.run_auto_creation = run_auto_creation
    return shim


def import_reference_implicitron():
    """Import the reference package with the implicitron config shim in
    place; returns the reference `pytorch3d` module."""
    sys.path.insert(0, "/root/repo/tests")
    from reference_compat import import_reference

    _install_omegaconf_stub()
    _install_torchvision_stub()
    pytorch3d = import_reference()
    shim = _build_config_shim()
    sys.modules["pytorch3d.implicitron.tools.config"] = shim
    # make attribute access (`from ..tools import config`) see the shim too
    import pytorch3d.implicitron.tools as _tools

    _tools.config = shim
    return pytorch3d
