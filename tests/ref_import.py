"""Import the reference's OWN modules so parity tests can use literal
reference code as the oracle (closing the round-1 circularity gap: the
from-spec oracles in tests/oracle.py and tests/torch_ref.py share a reading
of the reference with the production code; these imports do not).

The reference (/root/reference) depends on torch_geometric / torch_sparse /
muspy / prettytable, none of which are installed. Only `torch` is. The
functions under test — edge builders (data.py:24-121), Decoder thresholding
(model.py:609-623), losses/metrics (training.py:298-496), schedulers
(training.py:19-75), mtp assembly (utils.py:59-79) — never touch those deps
at runtime, so module-level imports are satisfied with inert stubs that are
NEVER exercised by the tested code paths.
"""
from __future__ import annotations

import importlib
import sys
import types

REF_DIR = "/root/reference"
_REF_TOP_LEVEL = ("constants", "data", "model", "training", "utils",
                  "generation_config")
_cache: dict = {}


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package so submodule entries resolve
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    import torch
    from torch import nn

    class Data:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def to(self, device):
            return self

    class Dataset:
        def __init__(self, *a, **kw):
            pass

    class Batch:
        pass

    class SparseTensor:
        pass

    class RGCNConv(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

    class GlobalAttention(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

    class BatchNorm(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

    def _unused(*a, **kw):  # any call into a stub is a test bug
        raise NotImplementedError("stubbed torch_geometric machinery called")

    _module("torch_geometric")
    _module("torch_geometric.data", Data=Data, Dataset=Dataset, Batch=Batch)
    _module("torch_geometric.data.collate", collate=_unused)
    _module("torch_geometric.typing", OptTensor=object, Adj=object)
    _module("torch_geometric.nn")
    _module("torch_geometric.nn.inits", reset=_unused)
    _module("torch_geometric.nn.norm", BatchNorm=BatchNorm)
    _module("torch_geometric.nn.glob", GlobalAttention=GlobalAttention)
    _module("torch_geometric.nn.conv", RGCNConv=RGCNConv)
    _module("torch_sparse", SparseTensor=SparseTensor,
            masked_select_nnz=_unused)
    _module("muspy")
    _module("prettytable", PrettyTable=_unused)
    # Pre-stub generation_config so the reference's own module (which reads
    # generation_config.yaml from the process CWD at import time,
    # generation_config.py:15) never executes.
    _module("generation_config", MIDI_PROGRAMS={}, SOUNDFONT_PATH=None)


def ref_modules() -> dict:
    """{'constants','data','model','training','utils'} -> reference module.

    Imports happen once per process; the reference's top-level module names
    are removed from sys.modules afterwards so they cannot shadow anything.
    """
    if _cache:
        return _cache
    clash = [n for n in _REF_TOP_LEVEL if n in sys.modules]
    assert not clash, f"top-level name collision with reference: {clash}"
    _install_stubs()
    sys.path.insert(0, REF_DIR)
    try:
        for name in ("constants", "data", "model", "utils", "training"):
            _cache[name] = importlib.import_module(name)
    finally:
        sys.path.remove(REF_DIR)
        for name in _REF_TOP_LEVEL:
            sys.modules.pop(name, None)
    return _cache
