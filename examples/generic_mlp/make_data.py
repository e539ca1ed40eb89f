"""Synthetic separable 3-class dataset in the reference HDF5 layout."""
import os

import h5py
import numpy as np

here = os.path.dirname(os.path.abspath(__file__))
rng = np.random.default_rng(0)
W = rng.normal(size=(6, 3))
for split, n in (("train", 512), ("test", 128)):
    xs = rng.normal(size=(n, 6)).astype(np.float32)
    ys = np.argmax(xs @ W, axis=1).astype(np.float64)
    path = os.path.join(here, f"{split}.h5")
    with h5py.File(path, "w") as f:
        f["data"], f["label"] = xs, ys
    with open(os.path.join(here, f"{split}.txt"), "w") as f:
        f.write(path + "\n")
print("wrote train/test h5 + lists")
