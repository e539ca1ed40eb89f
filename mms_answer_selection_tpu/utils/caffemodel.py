"""Reference-format weight interop: `.caffemodel.h5` <-> our param trees.

The reference snapshots model weights either as NetParameter binaryproto
or as HDF5 (`Net::ToHDF5`, net.cpp:859-913) with layout

    /data/<layer_name>/<param_index>   float datasets (+ optional /diff)

and restores them BY LAYER NAME with shape checks, ignoring unknown
layers (`CopyTrainedLayersFromHDF5`, net.cpp:797-844) -- that name-based
contract is what makes `caffe train -weights` finetuning work.  This
module speaks that HDF5 dialect for the MMS QA nets, so weights trained
in the reference can be loaded here (and vice versa) without conversion
scripts.

Layer names follow the driver's NetSpec (do_trec_qa_clean.py:452-498):
``w2v_q`` (Embed; ``w2v_a`` shares its params, so its group is saved
empty -- "only save params that own themselves"), ``sim_cross`` (blob 0
= (M, D, D) metric, blob 1 = (M, W1, W2) bias, sim_cross_layer.cpp:
24-45), ``conv<i>`` (OIHW -> our HWIO), ``bn<i>`` (4 blobs: scale,
shift, running mean, running var as (1, C, 1, 1), bn_layer.cpp:91-117 --
the stat blobs land in OUR ``state``, not params), ``fc<i>`` ((out, in)
-> our (in, out)).
"""

from __future__ import annotations

import numpy as np


def _layer_specs(params, state):
    """Yields (layer_name, [(param_index, tree, key_path, to_caffe,
    from_caffe), ...]) for every reference layer present in the trees.
    ``tree`` is 'params' or 'state'."""
    t = lambda *axes: (lambda a: np.transpose(a, axes))  # noqa: E731
    ident = lambda a: a  # noqa: E731

    specs = []
    if "embed" in params:
        rows = [(0, "params", ("embed", "w"), ident, ident)]
        if "b" in params["embed"]:
            d = params["embed"]["b"].shape[0]
            rows.append((1, "params", ("embed", "b"),
                         lambda a: np.reshape(a, (1, d)),
                         lambda a: np.reshape(a, (d,))))
        specs.append(("w2v_q", rows))
        specs.append(("w2v_a", []))  # shares w2v_q's params: empty group
    if "sim" in params:
        rows = [(0, "params", ("sim", "w"), ident, ident)]
        if "b" in params["sim"]:
            rows.append((1, "params", ("sim", "b"), ident, ident))
        specs.append(("sim_cross", rows))
    i = 0
    while f"conv{i}" in params:
        specs.append((f"conv{i}", [
            (0, "params", (f"conv{i}", "w"), t(3, 2, 0, 1), t(2, 3, 1, 0)),
            (1, "params", (f"conv{i}", "b"), ident, ident),
        ]))
        if f"bn{i}" in params:
            c = params[f"bn{i}"]["scale"].shape[0]
            wide = lambda a, c=c: np.reshape(a, (1, c, 1, 1))  # noqa: E731
            flat = lambda a, c=c: np.reshape(a, (c,))  # noqa: E731
            specs.append((f"bn{i}", [
                (0, "params", (f"bn{i}", "scale"), wide, flat),
                (1, "params", (f"bn{i}", "shift"), wide, flat),
                (2, "state", (f"bn{i}", "mean"), wide, flat),
                (3, "state", (f"bn{i}", "var"), wide, flat),
            ]))
        i += 1
    for name in ("fc1", "fc2"):
        if name in params:
            specs.append((name, [
                (0, "params", (name, "w"), t(1, 0), t(1, 0)),
                (1, "params", (name, "b"), ident, ident),
            ]))
    return specs


def _get(trees, tree, path):
    node = trees[tree]
    for k in path:
        node = node[k]
    return node


def _set(trees, tree, path, value):
    node = trees[tree]
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def save_caffemodel_h5(path, params, state):
    """Write weights in the reference's Net::ToHDF5 layout."""
    import h5py
    import jax

    params = jax.device_get(params)
    state = jax.device_get(state)
    trees = {"params": params, "state": state}
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for layer, rows in _layer_specs(params, state):
            g = data.create_group(layer)
            for idx, tree, keypath, to_caffe, _ in rows:
                arr = np.asarray(_get(trees, tree, keypath), np.float32)
                g.create_dataset(str(idx), data=to_caffe(arr))
    return path


def load_caffemodel_h5(path, params, state):
    """Name-based, shape-checked weight loading from a reference-layout
    HDF5 file into copies of (params, state).  Reference semantics
    (net.cpp:797-844): source layers our net doesn't have are ignored;
    a missing dataset for a shared-param layer is fine; a shape mismatch
    is an error.  Returns (params, state, report dict)."""
    import h5py
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, jax.device_get(params))
    state = jax.tree.map(lambda x: x, jax.device_get(state))
    trees = {"params": params, "state": state}
    known = {name: rows for name, rows in _layer_specs(params, state)}
    report: dict = {}
    with h5py.File(path, "r") as f:
        data = f["data"]
        for layer in data:
            if layer not in known:
                report[layer] = "ignored (no such layer here)"
                continue
            g = data[layer]
            for idx, tree, keypath, _, from_caffe in known[layer]:
                if str(idx) not in g:
                    # shared-owner layers legitimately omit datasets
                    report[f"{layer}/{idx}"] = "absent (shared param)"
                    continue
                src = from_caffe(np.asarray(g[str(idx)]))
                dst = _get(trees, tree, keypath)
                if tuple(src.shape) != tuple(np.shape(dst)):
                    raise ValueError(
                        f"shape mismatch for {layer}/{idx}: file "
                        f"{src.shape} vs model {np.shape(dst)} "
                        "(net.cpp would CHECK-fail here too)")
                _set(trees, tree, keypath,
                     jnp.asarray(src, jnp.asarray(dst).dtype))
                report[f"{layer}/{idx}"] = "loaded"
    return params, state, report
