"""Drop-in ``caffe`` namespace for ported pycaffe scripts.

The reference's Python package root (python/caffe/__init__.py) exports
Net, the per-type Solver classes, get_solver, NetSpec/layers/params/
to_proto, io, Classifier, Detector and the TRAIN/TEST phase constants.
This module re-exports this framework's equivalents under the same
names so existing scripts need only::

    from mms_answer_selection_tpu import caffe_compat as caffe

    caffe.set_mode_gpu()                       # advisory no-op (XLA)
    net = caffe.Net("deploy.prototxt", caffe.TEST)
    solver = caffe.get_solver("solver.prototxt")

Differences, by design: the device-mode setters are no-ops (JAX/XLA
owns device placement — there is no global mode to flip).  The
``caffe.proto.caffe_pb2`` surface is provided by
:mod:`.utils.caffe_pb2_shim` (message-style Datum/BlobProto/
NetParameter classes over the clean-room wire codec — no protobuf
runtime exists here) and registered as a real importable submodule, so
both spellings work::

    from mms_answer_selection_tpu.caffe_compat.proto import caffe_pb2
    datum = caffe.proto.caffe_pb2.Datum()
"""

from __future__ import annotations

import logging
import sys
import types

from .models import (AdaDeltaSolver, AdaGradSolver, AdamSolver,  # noqa: F401
                     Classifier, Detector, NesterovSolver, RMSPropSolver,
                     SGDSolver, Solver, get_solver)
from .models.graph_net import layer_type_list  # noqa: F401
from .models.pynet import Net as _PyNet
from .utils import caffe_pb2_shim as _caffe_pb2
from .utils import io  # noqa: F401
from .utils.netspec import NetSpec, to_proto  # noqa: F401
from .utils.netspec import L as layers  # noqa: F401
from .utils.netspec import P as params  # noqa: F401

__all__ = [
    "Net", "Classifier", "Detector",
    "SGDSolver", "NesterovSolver", "AdaGradSolver", "RMSPropSolver",
    "AdaDeltaSolver", "AdamSolver", "Solver", "get_solver",
    "NetSpec", "layers", "params", "to_proto", "io", "proto",
    "layer_type_list", "TRAIN", "TEST",
    "set_mode_cpu", "set_mode_gpu", "set_device", "set_random_seed",
]

# `from <pkg>.caffe_compat.proto import caffe_pb2` must resolve like the
# reference's caffe.proto package: register synthetic submodules
proto = types.ModuleType(__name__ + ".proto")
proto.caffe_pb2 = _caffe_pb2
sys.modules[__name__ + ".proto"] = proto
sys.modules[__name__ + ".proto.caffe_pb2"] = _caffe_pb2

# _caffe.cpp exposes Phase as ints; pycaffe code only ever passes these
# through to Net/Solver, so the value just needs to round-trip
TRAIN = "train"
TEST = "test"

_log = logging.getLogger(__name__)


class Net(_PyNet):
    """pycaffe ``Net`` constructor shapes (_caffe.cpp:86-140):
    ``Net(model, phase)``, ``Net(model, weights, phase)``, and the
    modern ``Net(model, phase, weights=...)``."""

    def __init__(self, model_file: str, *args, phase=None, weights=None,
                 **kw):
        pos = list(args)
        if pos and pos[-1] in (TRAIN, TEST):
            phase = pos.pop()
        if pos:
            if weights is not None:
                raise TypeError("weights given twice")
            weights = pos.pop(0)
        if pos:
            raise TypeError(f"unexpected positional args: {pos}")
        super().__init__(model_file, phase=phase or TEST,
                         weights=weights, **kw)


def set_mode_cpu() -> None:
    """Advisory no-op: XLA owns device placement.  Force CPU with
    ``jax.config.update('jax_platforms', 'cpu')`` before first use."""
    _log.info("set_mode_cpu: no-op (JAX/XLA owns device placement)")


def set_mode_gpu() -> None:
    """Advisory no-op: the accelerator backend is already the default
    whenever one is attached."""
    _log.info("set_mode_gpu: no-op (accelerator is the JAX default)")


def set_device(device_id: int) -> None:
    """Advisory no-op: shard over devices with ``jax.sharding.Mesh``
    (see ``parallel.mesh``) instead of a global current-device."""
    _log.info("set_device(%d): no-op (use jax.sharding for multi-chip)",
              device_id)


def set_random_seed(seed: int) -> None:
    """Stored for callers that read it back; this framework threads
    explicit PRNG keys (pass ``seed=`` to Net/Solver constructors)."""
    global _seed
    _seed = int(seed)
    _log.info("set_random_seed(%d): pass seed= to Net/Solver instead "
              "(explicit key threading)", seed)


_seed = 0
