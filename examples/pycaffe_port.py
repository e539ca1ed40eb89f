"""A canonical pycaffe training script, running unmodified.

This mirrors the flow every caffe Python tutorial teaches (build a net
with net_spec, write the prototxt, get_solver, step while reading blobs,
save/restore — the examples/01-learning-lenet.ipynb shape): the only
change a ported script needs is the import line.

    python examples/pycaffe_port.py      # hermetic: synthetic data

Reference surface being exercised: python/caffe/__init__.py exports,
net_spec.py, pycaffe.py, _caffe.cpp Solver bindings.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mms_answer_selection_tpu import caffe_compat as caffe  # noqa: E402


def make_data(workdir, n=512, seed=0):
    """A separable 3-class problem written as reference-style HDF5."""
    import h5py

    rng = np.random.default_rng(seed)
    w = rng.normal(size=(8, 3))
    xs = rng.normal(size=(n, 8)).astype(np.float32)
    ys = np.argmax(xs @ w, axis=1).astype(np.float64)
    path = os.path.join(workdir, "train.h5")
    with h5py.File(path, "w") as f:
        f["data"], f["label"] = xs, ys
    listfile = os.path.join(workdir, "train.txt")
    with open(listfile, "w") as f:
        f.write(path + "\n")
    return listfile


def make_net(listfile):
    n = caffe.NetSpec()
    n.data, n.label = caffe.layers.HDF5Data(
        batch_size=64, source=listfile, shuffle=True, ntop=2)
    n.ip1 = caffe.layers.InnerProduct(
        n.data, num_output=32, weight_filler={"type": "xavier"})
    n.relu1 = caffe.layers.ReLU(n.ip1, in_place=True)
    n.ip2 = caffe.layers.InnerProduct(
        n.ip1, num_output=3, weight_filler={"type": "xavier"})
    n.loss = caffe.layers.SoftmaxWithLoss(n.ip2, n.label)
    n.acc = caffe.layers.Accuracy(n.ip2, n.label)
    return str(n.to_proto())  # the pycaffe write-to-file idiom


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pycaffe_port"
    os.makedirs(workdir, exist_ok=True)
    listfile = make_data(workdir)

    with open(os.path.join(workdir, "net.prototxt"), "w") as f:
        f.write(make_net(listfile))
    with open(os.path.join(workdir, "solver.prototxt"), "w") as f:
        f.write(f"""net: "{workdir}/net.prototxt"
base_lr: 0.1
lr_policy: "inv"
gamma: 0.0001
power: 0.75
momentum: 0.9
max_iter: 500
display: 100
snapshot_prefix: "{workdir}/lenet"
snapshot_format: HDF5
random_seed: 7
""")

    caffe.set_mode_gpu()  # advisory no-op: XLA owns placement
    solver = caffe.get_solver(os.path.join(workdir, "solver.prototxt"))

    for _ in range(5):
        solver.step(100)
        print(f"iter {solver.iter}: "
              f"loss={float(solver.net.blobs['loss'].data):.4f} "
              f"acc={float(solver.net.blobs['acc'].data):.3f}")

    model_path, state_path = solver.snapshot()
    print(f"snapshotted {model_path}")

    # the restore round-trip
    solver2 = caffe.get_solver(os.path.join(workdir, "solver.prototxt"))
    solver2.restore(state_path)
    assert solver2.iter == solver.iter
    w1 = np.asarray(solver.net.params["ip1"]["w"])
    np.testing.assert_array_equal(
        w1, np.asarray(solver2.net.params["ip1"]["w"]))

    # deploy-style inference through caffe.Net
    net = caffe.Net(os.path.join(workdir, "net.prototxt"), caffe.TEST,
                    weights=model_path)
    out = net.forward()
    print(f"deploy forward: acc={float(out['acc']):.3f}")
    assert float(out["acc"]) > 0.9
    print("OK")


if __name__ == "__main__":
    main()
