"""Shared test fixtures: synthetic BraTS-like datasets and tiny nets."""

import numpy as np

from nas_3d_unet_tpu.data.preprocess import preprocess_arrays


def write_learnable_h5(out_dir, n_patients=4, shape=(28, 28, 28), seed=0):
    """Deterministic DESIGNED-LEARNABLE task (VERDICT r3 #1, SURVEY.md §4
    integration bullet): tumor signal lives in TWO modalities — t1ce (m=1)
    carries the whole blob plus an extra bump on the enhancing core, flair
    (m=3) carries the whole blob — against low-amplitude noise, so a small
    net must reach high WT dice if (and only if) the stack actually learns.

    Labels follow BraTS semantics: outer shell = 2 (edema, WT only),
    core = 4 (enhancing, so WT ⊇ TC = ET = core).
    """
    import h5py
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    paths = []
    for i in range(n_patients):
        c = [int(rng.integers(2 * s // 5, 3 * s // 5)) for s in shape]
        r = min(shape) // 3
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        blob = (d2 < r * r).astype(np.float32)
        core = (d2 < (r - 3) ** 2).astype(np.float32)
        vols = []
        for m in range(4):
            v = rng.random(shape).astype(np.float32) * 0.2 + 0.1
            if m == 1:          # t1ce: whole tumor + enhancing-core bump
                v = v + 1.0 * blob + 0.5 * core
            elif m == 3:        # flair: whole tumor
                v = v + 0.8 * blob
            v += rng.random(shape).astype(np.float32) * 0.05
            vols.append(v)
        seg = np.zeros(shape, np.uint8)
        seg[blob > 0] = 2
        seg[core > 0] = 4
        rec = preprocess_arrays(vols, seg)
        path = os.path.join(out_dir, f"LEARN_{i}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("image", data=rec["image"])
            f.create_dataset("label", data=rec["label"])
            f.attrs["crop_start"] = rec["crop_start"]
            f.attrs["orig_shape"] = rec["orig_shape"]
            f.attrs["affine"] = np.eye(4, dtype=np.float32)
            f.attrs["patient"] = f"LEARN_{i}"
        paths.append(path)
    return paths


def write_shifted_h5(out_dir, n_patients=4, shape=(20, 20, 20), shift=3, seed=0,
                     noise=False):
    """Search-quality task (VERDICT r3 #2): the label blob is the t1ce blob
    spatially shifted by +`shift` voxels on every axis.  identity/avg/max
    pool candidates are zero-phase (symmetric) operators — no stack of them
    plus the 1×1 head can produce a directional offset — while conv
    candidates can learn asymmetric taps that encode the shift.  With
    ``noise=True`` the label blob is placed INDEPENDENTLY of the image blob
    (unlearnable control): no candidate op helps, so any α movement is
    noise-drift.  The signal/noise pair makes a contrast test: bilevel
    search must keep α mass on conv-family ops and off `none` exactly when
    the task has conv-exploitable signal.
    """
    import h5py
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    paths = []
    for i in range(n_patients):
        # blob center placed so BOTH the blob and its +shift image fit
        c = [int(rng.integers(s // 3, s // 2)) for s in shape]
        r = min(shape) // 4
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        blob = (d2 < r * r)
        if noise:
            cn = [int(rng.integers(r + 1, s - r - 1)) for s in shape]
            d2s = ((zz - cn[0]) ** 2 + (yy - cn[1]) ** 2 + (xx - cn[2]) ** 2)
        else:
            d2s = ((zz - c[0] - shift) ** 2 + (yy - c[1] - shift) ** 2
                   + (xx - c[2] - shift) ** 2)
        sblob = (d2s < r * r)
        score = (d2s < max(1, (r - 2)) ** 2)
        vols = []
        for m in range(4):
            v = rng.random(shape).astype(np.float32) * 0.2 + 0.1
            if m == 1:  # t1ce carries the UNSHIFTED blob
                v = v + 1.0 * blob.astype(np.float32)
            vols.append(v)
        seg = np.zeros(shape, np.uint8)
        seg[sblob] = 2
        seg[score] = 4
        rec = preprocess_arrays(vols, seg)
        path = os.path.join(out_dir, f"SHIFT_{i}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("image", data=rec["image"])
            f.create_dataset("label", data=rec["label"])
            f.attrs["crop_start"] = rec["crop_start"]
            f.attrs["orig_shape"] = rec["orig_shape"]
            f.attrs["affine"] = np.eye(4, dtype=np.float32)
            f.attrs["patient"] = f"SHIFT_{i}"
        paths.append(path)
    return paths


def write_synthetic_h5(out_dir, n_patients=3, shape=(20, 18, 16), seed=0):
    """Deterministic synthetic dataset with a LEARNABLE rule:
    tumor (label 2/4) sits where t1ce intensity is high, so a model can fit
    it quickly (SURVEY.md §4 integration-test strategy)."""
    import h5py
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n_patients):
        vols = []
        base = rng.random(shape).astype(np.float32) * 0.2 + 0.1
        blob = np.zeros(shape, np.float32)
        c = [int(rng.integers(s // 3, max(s // 3 + 1, 2 * s // 3))) for s in shape]
        r = max(2, min(shape) // 5)
        zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
        mask = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 < r ** 2
        blob[mask] = 1.0
        for m in range(4):
            v = base + (blob if m == 1 else 0.0) + rng.random(shape).astype(np.float32) * 0.02
            vols.append(v)
        seg = np.zeros(shape, np.uint8)
        seg[mask] = 2
        inner = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 < (r - 2) ** 2
        seg[inner] = 4
        rec = preprocess_arrays(vols, seg)
        path = os.path.join(out_dir, f"SYN_{i}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("image", data=rec["image"])
            f.create_dataset("label", data=rec["label"])
            f.attrs["crop_start"] = rec["crop_start"]
            f.attrs["orig_shape"] = rec["orig_shape"]
            f.attrs["affine"] = np.eye(4, dtype=np.float32)
            f.attrs["patient"] = f"SYN_{i}"
        paths.append(path)
    return paths
