"""ITensorMPS-style layer (ref tensor4all-itensorlike)."""

from .mps import MPS, contract_mpo_mps, linsolve, mpo_operator

__all__ = ["MPS", "contract_mpo_mps", "linsolve", "mpo_operator"]
