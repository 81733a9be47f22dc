"""Headline benchmark: TreeTN DMRG, Heisenberg chain N=8, chi=32, 4 sweeps.

Reference: 135.4 ms mean (Rust, 1 thread), energy err 5.3e-15 vs dense
exact — benchmarks/results/2026-06-27-treetn-dmrg-itensornetworks.md.
"""

from __future__ import annotations

import networkx as nx
import numpy as np


def run(median_time):
    import jax

    from tensor4all_tpu.models.spin import dense_heisenberg, heisenberg
    from tensor4all_tpu.treetn.dmrg import DmrgOptions, dmrg
    from tensor4all_tpu.treetn.network import random_treetn

    N = 8
    g = nx.Graph()
    for i in range(N - 1):
        g.add_edge(i, i + 1)
    tn, site_inds = random_treetn(
        jax.random.PRNGKey(0), g, {n: [2] for n in g.nodes}, bond_dim=8
    )
    sites = {n: site_inds[n][0] for n in g.nodes}
    op = heisenberg(g, sites)
    opts = DmrgOptions(nsweeps=4, maxdim=32, cutoff=1e-12)

    result = {}

    def body():
        res = dmrg(op, tn, options=opts)
        result["energy"] = res.energy
        return res

    t = median_time(body, warmup=1, reps=3)
    e0 = np.linalg.eigvalsh(dense_heisenberg(g, list(g.nodes)))[0]
    err = abs(result["energy"] - e0)
    return {
        "metric": "dmrg_chain_N8_chi32_4sweeps_ms",
        "value": t * 1e3,
        "unit": "ms",
        "vs_baseline": 135.4 / (t * 1e3),
        "detail": {"energy_abs_err": err},
    }
