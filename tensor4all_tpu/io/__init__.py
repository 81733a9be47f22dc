"""I/O: ITensors.jl-compatible HDF5 + orbax-style checkpointing
(ref tensor4all-hdf5; SURVEY.md §5.4)."""

from .hdf5 import (append_itensor, append_mps, load_itensor,
                   load_mps, save_itensor, save_mps)

__all__ = ["append_itensor", "append_mps", "load_itensor",
           "load_mps", "save_itensor", "save_mps"]
