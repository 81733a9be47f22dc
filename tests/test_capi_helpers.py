"""In-process tests of the capi helper layer (tensor4all_tpu.capi.helpers).

The C binary (tests/test_capi.py) drives the same functions through the
embedded interpreter; these tests keep the subtle host-side semantics
(smart canonicalization, typed policies, network contraction) covered
by the in-process tracer and debuggable without a C toolchain."""

import jax
import numpy as np
import pytest

from tensor4all_tpu.capi import helpers as H
from tensor4all_tpu.core.decomp import FactorizeAlg
from tensor4all_tpu.core.index import Index
from tensor4all_tpu.core.tensor import Tensor


def _chain3(key):
    """3-node chain CTreeTN with dim-2 sites, rank-2 bonds."""
    ks = jax.random.split(key, 3)
    s = [Index(2, tags=f"s{k},Site") for k in range(3)]
    b01 = Index(2, tags="Link")
    b12 = Index(2, tags="Link")
    h = H.treetn_new()
    H.treetn_set_tensor(h, "v0", Tensor.random(ks[0], (s[0], b01)))
    H.treetn_set_tensor(h, "v1", Tensor.random(ks[1], (b01, s[1], b12)))
    H.treetn_set_tensor(h, "v2", Tensor.random(ks[2], (b12, s[2])))
    return h, s


def test_orthogonalize_form_smart(key):
    h, _ = _chain3(key)
    n0 = H.treetn_norm(h)
    # first call canonicalizes with QR
    H.treetn_orthogonalize_form(h, "v1", 0, 0)
    assert h.net().canonical_form is FactorizeAlg.QR
    # repeated same-form call is a no-op (tensors unchanged)
    before = np.asarray(h.net().tensor("v1").data)
    H.treetn_orthogonalize_form(h, "v1", 0, 0)
    np.testing.assert_array_equal(np.asarray(h.net().tensor("v1").data),
                                  before)
    # switching form without force fails; with force succeeds
    with pytest.raises(ValueError):
        H.treetn_orthogonalize_form(h, "v1", 1, 0)
    H.treetn_orthogonalize_form(h, "v1", 1, 1)
    assert h.net().canonical_form is FactorizeAlg.LU
    assert abs(H.treetn_norm(h) - n0) < 1e-10 * max(n0, 1)
    # stale-marker regression: another path re-canonicalizes with QR,
    # then a same-form QR request must be a true no-op, not an error
    H.treetn_orthogonalize(h, "v0")
    H.treetn_orthogonalize_form(h, "v0", 0, 0)
    with pytest.raises(ValueError):
        H.treetn_orthogonalize_form(h, "v0", 2, 0)
    with pytest.raises(ValueError):
        H.treetn_orthogonalize_form(h, "v0", 7, 1)  # unknown form
    # form change is rejected even when the CENTER also moves (ref
    # canonicalize.rs:70-82: any form change without force errors,
    # independent of center)
    with pytest.raises(ValueError):
        H.treetn_orthogonalize_form(h, "v2", 2, 0)


def test_policy_roundtrip_and_truncate(key):
    h, _ = _chain3(key)
    d0 = H.treetn_to_dense(h, H.treetn_siteinds(h, "v0")
                           + H.treetn_siteinds(h, "v1")
                           + H.treetn_siteinds(h, "v2"))
    H.treetn_truncate_with_policy(h, 1e-12, 0, 0, 0, 2)
    d1 = H.treetn_to_dense(h, H.treetn_siteinds(h, "v0")
                           + H.treetn_siteinds(h, "v1")
                           + H.treetn_siteinds(h, "v2"))
    np.testing.assert_allclose(d1, d0, atol=1e-9)
    with pytest.raises(ValueError):
        H.policy_from_abi(1e-8, 0, 1, 0)  # SquaredValue+PerValue


def test_contract_networks_and_sim_linkinds(key):
    h, _ = _chain3(key)
    fresh = H.treetn_sim_linkinds(h)
    n0 = H.treetn_norm(h)
    for method in (0, 2):  # zipup, naive
        prod = H.treetn_contract_networks(h, fresh, method, 1e-13, 0, 0,
                                          0, 0)
        assert abs(H.treetn_norm(prod) - n0 * n0) < 1e-8 * n0 * n0
    with pytest.raises(ValueError):
        H.treetn_contract_networks(h, fresh, 9, 1e-13, 0, 0, 0, 0)


def test_svd_with_policy_helper(key):
    i, j = Index(4), Index(6)
    t = Tensor.random(key, (i, j))
    u, s, vh = H.svd_with_policy(t, 1, 1e-12, 0, 1, 1, 0)
    # reconstruction through the shared bond
    from tensor4all_tpu.core.contract import contract

    recon = contract([u, s, vh])
    np.testing.assert_allclose(np.asarray(recon.permute((i, j)).data),
                               np.asarray(t.data), atol=1e-10)


def test_qtransform_helpers():
    tt = H.qtransform_flip(3)
    assert len(tt.cores) == 3
    lay = H.qtt_layout_new(4, 2, "interleaved")
    assert lay.R == 4 and lay.d == 2
    ft = H.qtransform_fourier(4, -1, 1e-10, 0)
    assert len(ft.cores) == 4
    af = H.qtransform_affine(4, 3, 1, 1, 1, "periodic")
    assert len(af.cores) == 4
