"""pycaffe-style stateful ``Net``: the drop-in scripting surface.

The reference's Python users hold a ``caffe.Net`` with mutable blob
state: ``net.blobs['ip'].data``, ``net.params['conv'][0].data``,
``net.forward(data=x)``, ``net.backward(loss=g)``
(python/caffe/pycaffe.py:22-233, _caffe.cpp:142-345).  This wrapper
gives that working style over the functional core: `GraphNet` stays the
jitted pure path (use it directly for production loops); ``Net`` keeps
(params, state, last blobs) as attributes and re-exposes them the
pycaffe way for interactive work and ported scripts.

Differences, by design (documented, not accidental):

* Blob shapes come from the first ``forward`` (JAX infers under trace);
  the constructor therefore takes no reshape step and pretrained
  weights load lazily at first forward.
* ``net.params[layer]`` is a dict keyed by blob name ("w"/"b"/...)
  in caffe blob order, not a positional list; ``net.param_diffs``
  (filled by ``backward``) mirrors it — the functional reading of
  ``.diff``.
* ``backward`` returns diffs for FLOAT input blobs only (integer id
  inputs have no tangent; the reference likewise propagates nothing
  into Data layers).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import jax
import jax.numpy as jnp

from .graph_net import DATA_TYPES, GraphNet

__all__ = ["Net", "Blob"]


class Blob:
    """pycaffe blob view: ``net.blobs['ip'].data`` reads the array
    (_caffe.cpp:142-179 exposes zero-copy numpy views).  JAX arrays are
    immutable, so ``.data`` hands out a WRITABLE host buffer instead:
    in-place writes (``net.blobs['data'].data[...] = x``) are detected
    and fed into the next ``forward()`` — the standard pycaffe
    input-setting idiom (python/caffe/pycaffe.py:97-104) — and partial
    forwards/backwards seed from the written value too.  Also acts
    array-like (``np.asarray``, ``float()``, indexing), so code that
    forgot ``.data`` works too."""

    __slots__ = ("_a", "_buf", "_digest")

    def __init__(self, a):
        self._a = a
        self._buf = None
        self._digest = None

    @staticmethod
    def _hash(buf):
        import hashlib

        return hashlib.blake2b(buf.tobytes(), digest_size=16).digest()

    @property
    def data(self):
        import numpy as np

        if self._buf is None:
            self._buf = np.array(self._a)  # writable host copy
            self._digest = self._hash(self._buf)
        return self._buf

    def _dirty(self):
        """True iff the user wrote into the ``.data`` buffer since it
        was materialized (detected by content hash — no device
        transfer needed)."""
        return (self._buf is not None
                and self._hash(self._buf) != self._digest)

    def _current(self):
        """The blob's effective value: the user-mutated ``.data``
        buffer if dirty, else the stored device array."""
        return jnp.asarray(self._buf) if self._dirty() else self._a

    @property
    def diff(self):
        raise AttributeError(
            "per-blob diffs are not retained: gradients are computed "
            "exactly by net.backward(...) (returns input diffs, fills "
            "net.param_diffs)")

    @property
    def shape(self):
        return tuple(self._a.shape)

    @property
    def ndim(self):
        return self._a.ndim

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        a = self.data  # the (possibly user-written) host buffer
        return a.astype(dtype) if dtype is not None else a

    def __float__(self):
        # honor a dirty .data buffer like __array__/__getitem__ do
        return float(self._current())

    def __getitem__(self, idx):
        return self.data[idx]

    def __repr__(self):
        return f"Blob{self.shape}"


class Net:
    """``Net(prototxt, phase="test", weights="x.caffemodel")``.

    >>> net = Net(text, phase="test")
    >>> out = net.forward(question=q, answer=a)   # {output blob: array}
    >>> net.blobs["sim_cross"]                    # any intermediate top
    >>> diffs = net.backward(loss=jnp.ones(()))   # {input blob: diff}
    >>> net.param_diffs["conv0"]["w"]
    >>> net.save("trained.caffemodel.h5")
    """

    def __init__(self, prototxt: str, *, phase: str = "test",
                 weights: str | None = None, seed: int = 0):
        text = prototxt
        self._base_dir = "."
        if os.path.exists(prototxt):
            with open(prototxt) as f:
                text = f.read()
            self._base_dir = os.path.dirname(os.path.abspath(prototxt))
        self._net = GraphNet(text, phase=phase)
        self._phase = phase
        self._seed = seed
        self._feed_cache: dict = {}
        self._weights_pending = weights
        self._params = None
        self._state = None
        self._fwd = None
        self._calls = 0
        self._last_inputs = None
        self._last_rng = None
        self.blobs: OrderedDict = OrderedDict()
        self.param_diffs: dict = {}

    # -- pycaffe-surface properties ---------------------------------------
    @property
    def layer_names(self):
        return [n.name for n in self._net.layers]

    @property
    def inputs(self):
        """Blobs no layer produces (the Input/data-layer tops the caller
        must feed) — pycaffe's `net.inputs`."""
        produced = {t for n in self._net.layers for t in n.tops}
        wanted = {b for n in self._net.layers for b in n.bottoms}
        external = sorted(wanted - produced)
        data_tops = [t for n in self._net.layers if n.type in DATA_TYPES
                     for t in n.tops]
        return data_tops + [b for b in external if b not in data_tops]

    @property
    def outputs(self):
        return self._net.output_blob_names()

    @property
    def top_names(self):
        """layer name -> its top blob names (pycaffe.py:307)."""
        return OrderedDict((n.name, list(n.tops))
                           for n in self._net.layers)

    @property
    def bottom_names(self):
        """layer name -> its bottom blob names (pycaffe.py:308)."""
        return OrderedDict((n.name, list(n.bottoms))
                           for n in self._net.layers)

    @property
    def layers(self):
        """pycaffe's ``net.layers`` vector view (_caffe.cpp exposes
        Layer objects with ``.type`` and ``.blobs``): per-layer
        caffe-ordered, caffe-SHAPED parameter blobs (conv OIHW, fc
        (out, in) — the caffemodel_specs layouts).  Read-only
        numpy snapshots; assign through ``self.params`` to mutate."""
        import numpy as np

        self._require_init()
        trees = {"params": self._params, "state": self._state}

        class _LayerView:
            __slots__ = ("name", "type", "blobs")

            def __init__(self, name, type_, blobs):
                self.name, self.type, self.blobs = name, type_, blobs

        by_name = {n.name: n.type for n in self._net.layers}
        out = []
        for layer, rows, _shared in self._net.caffemodel_specs(
                self._params, self._state):
            blobs = []
            for _idx, tree, keypath, to_caffe, _ in rows:
                node = trees[tree]
                for k in keypath:
                    node = node[k]
                blobs.append(to_caffe(np.asarray(node, np.float32)))
            out.append(_LayerView(layer, by_name.get(layer, ""), blobs))
        return out

    @property
    def params(self):
        self._require_init()
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._fwd = None

    @property
    def state(self):
        self._require_init()
        return self._state

    # -- lifecycle --------------------------------------------------------
    def _require_init(self):
        if self._params is None:
            raise RuntimeError(
                "run forward(...) once first: blob shapes (and therefore "
                "parameter shapes) are inferred from the first inputs")

    def _maybe_init(self, inputs):
        if self._params is not None:
            return
        self._params, self._state = self._net.init(
            jax.random.PRNGKey(self._seed), inputs)
        if self._weights_pending:
            self.copy_from(self._weights_pending)
            self._weights_pending = None

    def _rng(self):
        self._calls += 1
        return jax.random.fold_in(jax.random.PRNGKey(self._seed ^ 0xF0),
                                  self._calls)

    # -- data-layer feeds --------------------------------------------------
    def set_input_arrays(self, data, labels):
        """MemoryDataLayer::Reset via pycaffe's ``net.set_input_arrays``
        (pycaffe.py:235-243, memory_data_layer.cpp:77-97): subsequent
        ``forward()`` calls slice successive ``batch_size`` rows from
        these arrays for the MemoryData layer's tops, wrapping around."""
        import numpy as np

        data = np.asarray(data)
        labels = np.asarray(labels).reshape(len(data))
        node = next((n for n in self._net.layers
                     if n.type == "MemoryData"), None)
        if node is None:
            raise ValueError("set_input_arrays needs a MemoryData layer "
                             "(pycaffe.py:238)")
        from .graph_net import _one, _p

        bs = int(_one(_p(node, "memory_data_param").get("batch_size"),
                      len(data)))
        if len(data) % bs:
            raise ValueError(
                f"source array size {len(data)} must be a multiple of "
                f"batch_size {bs} (memory_data_layer.cpp:84)")
        tops = node.tops

        def gen():
            i = 0
            while True:
                yield {tops[0]: data[i:i + bs],
                       tops[1]: labels[i:i + bs]}
                i = (i + bs) % len(data)

        self._feed_cache[node.name] = gen()

    def _feed_missing(self, inputs: dict) -> dict:
        """pycaffe's ``net.forward()`` with no arguments advances the
        net's own data layers; here the prototxt-declared sources
        (HDF5Data / ImageData / PairImageData / WindowData) feed any
        data-layer top the caller did not pass explicitly.  Explicit
        inputs always win."""
        from ..training.graph_solver import _build_feed

        for node in self._net.layers:
            if node.type not in DATA_TYPES or node.type == "Input":
                continue
            if all(t in inputs for t in node.tops):
                continue
            if node.name not in self._feed_cache:
                self._feed_cache[node.name] = _build_feed(
                    node.cfg, self._phase, self._seed, self._base_dir,
                    None)
            feed = self._feed_cache[node.name]
            if feed is None:  # DummyData: generated in-graph
                continue
            for k, v in next(feed).items():
                inputs.setdefault(k, jnp.asarray(v))
        return inputs

    # -- forward / backward ----------------------------------------------
    def forward(self, start: str | None = None, end: str | None = None,
                **inputs):
        """Run the net on the given input blobs; updates ``self.blobs``
        with EVERY top and returns {output blob: array}
        (pycaffe.py:62-110's `_Net_forward`).  Data-layer tops not
        passed explicitly stream from the prototxt's declared sources
        (see `_feed_missing`).

        ``start``/``end`` name layers for a PARTIAL forward
        (pycaffe.py:78-105): the previous forward's blobs seed the
        range's bottoms (explicit inputs override), only [start, end]
        executes, and the return is the end layer's tops."""
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        if start is not None or end is not None:
            return self._forward_range(start, end, inputs)
        # pycaffe idiom: writes into net.blobs[in_].data feed the next
        # forward (pycaffe.py:97-104), and Input-layer blobs PERSIST
        # between forwards like the reference's buffers.  Explicit
        # kwargs win; streaming data-layer tops keep advancing unless
        # the user dirtied their buffer.
        stream_tops = {t for n in self._net.layers
                       if n.type in DATA_TYPES and n.type != "Input"
                       for t in n.tops}
        for name in self.inputs:
            b = self.blobs.get(name)
            if b is None:
                continue
            if name in stream_tops:
                if b._dirty():
                    inputs.setdefault(name, jnp.asarray(b._buf))
            else:
                inputs.setdefault(name, b._current())
        inputs = self._feed_missing(inputs)
        self._maybe_init(inputs)
        if self._fwd is None:
            net, train = self._net, self._phase == "train"

            @jax.jit
            def fwd(p, s, ins, rng):
                return net.apply(p, s, ins, train=train, rng=rng)

            self._fwd = fwd
        rng = self._rng()
        blobs, new_state = self._fwd(self._params, self._state, inputs, rng)
        if self._phase == "train":
            self._state = new_state  # BN EMA updates, like Forward would
        self._last_inputs = inputs
        self._last_rng = rng
        self.blobs = OrderedDict((k, self._refresh_blob(k, v))
                                 for k, v in blobs.items())
        return {k: blobs[k] for k in self.outputs if k in blobs}

    def _refresh_blob(self, name, value):
        """New value for a named blob: REUSE the existing Blob object
        (updating its host buffer in place) when the user materialized
        one — pycaffe's ``.data`` is a persistent view, so scripts hold
        it across forwards and keep writing into it; a fresh object per
        forward would silently orphan those references."""
        import numpy as np

        old = self.blobs.get(name)
        if old is not None and old._buf is not None \
                and old._buf.shape == tuple(value.shape):
            old._a = value
            np.copyto(old._buf, np.asarray(value))
            old._digest = old._hash(old._buf)
            return old
        return Blob(value)

    def _forward_range(self, start, end, inputs):
        """Partial forward over [start, end] (see forward)."""
        if start is not None and self._params is None:
            raise RuntimeError("forward(start=...) needs a prior full "
                               "forward (its blobs seed the range)")
        seeded = {k: b._current() for k, b in self.blobs.items()}
        seeded.update(inputs)
        if self._params is None:
            self._maybe_init(seeded)
        net, train = self._net, self._phase == "train"
        key = (start, end)
        if key not in getattr(self, "_range_jits", {}):
            if not hasattr(self, "_range_jits"):
                self._range_jits = {}

            @jax.jit
            def fwd(p, s, ins, rng):
                return net.apply(p, s, ins, train=train, rng=rng,
                                 start=start, end=end)

            self._range_jits[key] = fwd
        rng = self._rng()
        blobs, new_state = self._range_jits[key](
            self._params, self._state, seeded, rng)
        if train:
            self._state = new_state
        # keep backward()'s replay consistent with THIS forward: the
        # rng that drew this range's dropout masks, and any explicit
        # inputs the range consumed (stale values would silently
        # differentiate a different forward)
        self._last_rng = rng
        if self._last_inputs is None:
            self._last_inputs = {}
        self._last_inputs = {**self._last_inputs, **inputs}
        merged = OrderedDict(self.blobs)
        merged.update((k, self._refresh_blob(k, v))
                      for k, v in blobs.items())
        self.blobs = merged
        if end is not None:
            node = next(n for n in net.layers if n.name == end)
            return {t: blobs[t] for t in node.tops if t in blobs}
        return {k: blobs[k] for k in self.outputs if k in blobs}

    def forward_all(self, **input_batches):
        """pycaffe's `_Net_forward_all` minus the batch rechunking: one
        forward over the full arrays (XLA tiles internally)."""
        return self.forward(**input_batches)

    def backward(self, start: str | None = None, end: str | None = None,
                 **top_diffs):
        """Cotangents for named top blobs -> diffs of FLOAT input blobs;
        parameter gradients land in ``self.param_diffs``
        (`_Net_backward`, pycaffe.py:111-157).

        ``start``/``end`` follow pycaffe's backward orientation: start =
        the LATER layer the cotangents enter at, end = the earlier layer
        to stop after.  Diffs are then taken w.r.t. the float blobs
        FEEDING the [end, start] forward range (the previous forward's
        blobs seed everything outside it)."""
        if self._last_inputs is None:
            raise RuntimeError("backward() needs a prior forward()")
        if not top_diffs:
            raise ValueError("pass at least one top diff, e.g. "
                             "backward(loss=jnp.ones(()))")
        names = sorted(top_diffs)
        net, train = self._net, self._phase == "train"
        if start is not None or end is not None:
            # forward-range view: lo = end (earlier), hi = start (later)
            lo_name, hi_name = end, start
            produced = set()
            lo = 0 if lo_name is None else net.layer_index(lo_name)
            hi = (len(net.layers) - 1 if hi_name is None
                  else net.layer_index(hi_name))
            for node in net.layers[lo:hi + 1]:
                # in-place tops (top == bottom) keep their seed: the
                # range consumes the stored value (pycaffe's in-place
                # buffers have the same final-value caveat)
                produced.update(t for t in node.tops
                                if t not in node.bottoms)
            seeds = {k: b._current() for k, b in self.blobs.items()
                     if k not in produced}
            seeds.update(self._last_inputs)
        else:
            lo_name = hi_name = None
            seeds = dict(self._last_inputs)
        floats = {k: v for k, v in seeds.items()
                  if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)}
        others = {k: v for k, v in seeds.items() if k not in floats}
        state, rng = self._state, self._last_rng

        def f(p, fi):
            blobs, _ = net.apply(p, state, {**others, **fi},
                                 train=train, rng=rng,
                                 start=lo_name, end=hi_name)
            return tuple(blobs[n] for n in names)

        outs, vjp = jax.vjp(f, self._params, floats)
        cots = tuple(jnp.broadcast_to(
            jnp.asarray(top_diffs[n], outs[i].dtype), outs[i].shape)
            for i, n in enumerate(names))
        gp, gi = vjp(cots)
        self.param_diffs = gp
        return gi

    # -- weights IO -------------------------------------------------------
    def save(self, path: str):
        """`net.save(path)`: .caffemodel / .caffemodel.h5 by extension
        (Net::ToProto / ToHDF5)."""
        from ..utils.caffemodel import (save_caffemodel_binaryproto,
                                        save_caffemodel_h5)

        self._require_init()
        specs = self._net.caffemodel_specs(self._params, self._state)
        save = (save_caffemodel_h5 if path.endswith((".h5", ".hdf5"))
                else save_caffemodel_binaryproto)
        return save(path, self._params, self._state, specs=specs)

    def copy_from(self, path: str):
        """`CopyTrainedLayersFrom`: name/shape-checked partial load."""
        from ..utils.caffemodel import (load_caffemodel_binaryproto,
                                        load_caffemodel_h5)

        self._require_init()
        specs = self._net.caffemodel_specs(self._params, self._state)
        load = (load_caffemodel_h5 if path.endswith((".h5", ".hdf5"))
                else load_caffemodel_binaryproto)
        self._params, self._state, report = load(
            path, self._params, self._state, specs=specs)
        self._fwd = None
        return report
