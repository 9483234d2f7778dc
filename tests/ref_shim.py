"""Import helper for the reference implementation at /root/reference.

The reference targets torch 2.0/py3.8 with CUDA extras; on this CPU
image two compat shims are needed before its modules import:

* ``torchvision`` is absent — only ``necks/rpn.py`` (``from
  torchvision.models import resnet``) and the checkpoint model-zoo helper
  touch it, neither on the paths under test, so an empty stub module
  suffices.
* ``from collections import Iterable`` (``solver/fastai_optim.py:1``) was
  removed in py3.10; alias it from ``collections.abc``.
* ``terminaltables`` (checkpoint.py report table), ``yacs`` (hrnet3D_config
  CfgNode), ``numba`` (JIT decorators — a no-op shim runs the kernels as
  plain Python, slow but bit-identical), and ``munch`` (attr-dicts in
  cruw_pose) are absent — tiny pure-Python stand-ins below.

Used by the torch-parity tests only; nothing in rtpose_tpu imports this.
"""

import sys
import types


class _AttrDict(dict):
    """dict with attribute access — covers yacs CfgNode and munch usage."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        import copy
        return copy.deepcopy(self)

    @classmethod
    def fromDict(cls, d, default=None):  # munch.DefaultMunch API
        out = cls()
        for k, v in (d or {}).items():
            out[k] = cls.fromDict(v) if isinstance(v, dict) else v
        return out


def _noop_jit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]
    return lambda f: f


def _install_stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


def import_reference():
    """Install shims and return the reference's det3d package root path."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    tv = _install_stub("torchvision")
    tv_models = _install_stub("torchvision.models")
    tv_models.__path__ = []  # walk_packages in checkpoint.py sees nothing
    _install_stub("torchvision.models.resnet")

    class AsciiTable:
        def __init__(self, rows, title=None):
            self.table = "\n".join(" | ".join(map(str, r)) for r in rows)

    _install_stub("terminaltables", AsciiTable=AsciiTable)
    _install_stub("yacs")
    _install_stub("yacs.config", CfgNode=_AttrDict)
    _install_stub("numba", jit=_noop_jit, njit=_noop_jit, prange=range,
                  cuda=types.SimpleNamespace(jit=_noop_jit))
    _install_stub("munch", DefaultMunch=_AttrDict, Munch=_AttrDict)
    # trainer/checkpoint.py:44-47 imports spconv unconditionally (bare
    # except re-raises); an empty module satisfies it — the spconv weight
    # shim is never exercised by these tests.
    _install_stub("spconv")
    _install_stub("spconv.pytorch")
    _install_stub("addict", Dict=_AttrDict)
    _install_stub("pycocotools")
    _install_stub("pycocotools.mask")

    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    # The iou3d_nms CUDA extension is unbuildable here; pre-registering the
    # module name satisfies `from . import iou3d_nms_cuda`
    # (ops/iou3d_nms/iou3d_nms_utils.py:8) — its symbols are only touched at
    # call time, which these tests never do.
    _install_stub("det3d.ops.iou3d_nms.iou3d_nms_cuda")

    import det3d  # noqa: F401
    # Warm the package roots in dependency order: importing a deep module
    # (e.g. hr_util.hr3d) first trips a circular det3d.ops import.
    import det3d.models  # noqa: F401
    return "/root/reference"
