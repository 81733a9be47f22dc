"""Quantics layer: exponentially fine grids, QTT interpolation, and
transform operators (ref tensor4all-quanticstci / -quanticstransform)."""

from .grids import DiscretizedGrid, InherentDiscreteGrid, UnfoldingScheme
from .qtci import (
    QuanticsTensorCI2,
    quantics_from_array,
    quanticscrossinterpolate,
    quanticscrossinterpolate_discrete,
    quanticscrossinterpolate_from_arrays,
)
from .transforms import (
    affine_operator,
    apply_quantics_operator,
    bitflip_operator,
    cumsum_operator,
    difference_kernel_mpo,
    difference_kernel_mpo_from_qtt,
    flip_operator,
    phase_rotation_operator,
    quantics_fourier_operator,
    shift_operator,
    shift_operator_multivar,
    triangle_operator,
)

__all__ = [
    "DiscretizedGrid",
    "InherentDiscreteGrid",
    "UnfoldingScheme",
    "QuanticsTensorCI2",
    "quantics_from_array",
    "quanticscrossinterpolate",
    "quanticscrossinterpolate_discrete",
    "quanticscrossinterpolate_from_arrays",
    "affine_operator",
    "apply_quantics_operator",
    "bitflip_operator",
    "cumsum_operator",
    "difference_kernel_mpo",
    "difference_kernel_mpo_from_qtt",
    "flip_operator",
    "phase_rotation_operator",
    "quantics_fourier_operator",
    "shift_operator",
    "shift_operator_multivar",
    "triangle_operator",
]
