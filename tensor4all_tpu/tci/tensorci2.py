"""TCI2 — two-site tensor cross interpolation of a black-box function.

TPU-native rebuild of tensor4all-tensorci/src/tensorci2.rs
(`TensorCI2` :259, `sweep2site` :605, `sweep1site` :713, `update_pivots`
:1552, `crossinterpolate2` :1279, `TCI2Options` :71).

Architecture (SURVEY.md §3.1, §7): pivot index sets I/J live on host
(IndexSet); the hot loop — filling the Pi matrix with function samples at
every bond (tensorci2.rs:1583-1619) — is ONE batched evaluation per bond
(a single device program for jittable f, or one host callback for Python
black boxes), and pivot selection is the jitted rrLU kernel (ops.rrlu).
Rank growth is data-dependent but all device programs are fixed-shape per
call; only the selected rank syncs back.

Pivot nesting is maintained by construction: forward sweeps choose
``Iset[p+1]`` from ``Iset[p] x s_p`` candidates, backward sweeps choose
``Jset[p]`` from ``s_{p+1} x Jset[p+1]``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.rrlu import rrlu
from ..tt.tensortrain import TensorTrain
from .cached_function import CachedFunction
from .indexset import IndexSet, MultiIndex


@dataclasses.dataclass
class TCI2Options:
    """Ref: TCI2Options (tensorci2.rs:71)."""

    tol: float = 1e-8  # relative to max |f| sample (ref :71-79)
    maxbonddim: Optional[int] = None
    max_iter: int = 20  # half-sweeps
    ncheck_history: int = 3
    n_global_pivots: int = 0  # random-start global pivot searches per check
    global_search_starts: int = 32
    seed: int = 0
    verbosity: int = 0
    final_sweep1site: bool = True


class TensorCI2:
    """TCI2 state: nested pivot sets + cached function."""

    def __init__(
        self,
        func: CachedFunction,
        initial_pivots: Optional[Sequence[Sequence[int]]] = None,
    ):
        self.func = func
        self.local_dims = list(func.local_dims)
        L = len(self.local_dims)
        if L < 2:
            raise ValueError("TCI2 needs at least 2 sites")
        self.L = L
        # Iset[p]: multi-indices over sites [0, p); Jset[p]: over (p, L-1]
        self.Iset: List[IndexSet] = [IndexSet() for _ in range(L)]
        self.Jset: List[IndexSet] = [IndexSet() for _ in range(L)]
        self.f_max: float = 0.0
        self.pivot_errors = np.zeros(L - 1)  # per-bond last pivot error
        if initial_pivots is None:
            initial_pivots = [tuple(0 for _ in range(L))]
        self.add_global_pivots(initial_pivots)

    # ------------------------------------------------------------------
    def add_global_pivots(self, pivots: Sequence[Sequence[int]]) -> None:
        """Insert full multi-index pivots (prefixes into I, suffixes into J).

        Ref: add_global_pivots (tensorci2.rs:1303-1305).
        """
        for piv in pivots:
            piv = tuple(int(v) for v in piv)
            if len(piv) != self.L:
                raise ValueError("pivot length mismatch")
            for v, d in zip(piv, self.local_dims):
                if not 0 <= v < d:
                    raise ValueError(f"pivot {piv} out of range")
            for p in range(self.L):
                self.Iset[p].add(piv[:p])
                self.Jset[p].add(piv[p + 1:])

    @property
    def ranks(self) -> List[int]:
        return [len(self.Iset[p + 1]) for p in range(self.L - 1)]

    # ------------------------------------------------------------------
    # batched evaluation helpers (THE hot loop)
    # ------------------------------------------------------------------
    def _eval_matrix(
        self, rows: List[MultiIndex], cols: List[MultiIndex]
    ) -> np.ndarray:
        """Evaluate f on the cartesian product rows x cols -> (R, C)."""
        R, C = len(rows), len(cols)
        if R == 0 or C == 0:
            return np.zeros((R, C), dtype=self.func.dtype)
        rows_a = np.asarray([list(r) for r in rows], dtype=np.int64)
        cols_a = np.asarray([list(c) for c in cols], dtype=np.int64)
        idx = np.concatenate(
            [
                np.repeat(rows_a, C, axis=0),
                np.tile(cols_a, (R, 1)),
            ],
            axis=1,
        )
        vals = self.func.eval_batch(idx)
        self.f_max = max(self.f_max, float(np.abs(vals).max(initial=0.0)))
        return vals.reshape(R, C)

    def _T_tensor(self, p: int) -> np.ndarray:
        """T_p[i, s, j] = f(Iset[p][i] + (s,) + Jset[p][j]) (ref :887)."""
        rows = [i + (s,) for i in self.Iset[p] for s in range(self.local_dims[p])]
        mat = self._eval_matrix(rows, self.Jset[p].items())
        return mat.reshape(len(self.Iset[p]), self.local_dims[p], len(self.Jset[p]))

    def _P_matrix(self, p: int) -> np.ndarray:
        """P_p[i, j] = f(Iset[p+1][i] + Jset[p][j]) (bond p pivot matrix)."""
        return self._eval_matrix(self.Iset[p + 1].items(), self.Jset[p].items())

    # ------------------------------------------------------------------
    # pivot updates (ref update_pivots, tensorci2.rs:1552)
    # ------------------------------------------------------------------
    def _update_bond(self, p: int, opts: TCI2Options) -> None:
        d_p, d_q = self.local_dims[p], self.local_dims[p + 1]
        I_cand = [i + (s,) for i in self.Iset[p] for s in range(d_p)]
        J_cand = [(s,) + j for s in range(d_q) for j in self.Jset[p + 1]]
        Pi = self._eval_matrix(I_cand, J_cand)
        # tolerance relative to the global max sample (ref normalization)
        atol = opts.tol * self.f_max
        res = rrlu(jnp.asarray(Pi), rtol=0.0, atol=atol,
                   max_rank=opts.maxbonddim)
        rank = max(res.rank, 1)  # keep at least one pivot
        rp = res.row_pivots[:rank] if res.rank else np.array([0])
        cp = res.col_pivots[:rank] if res.rank else np.array([0])
        if res.rank == 0:
            # zero function on candidates: keep a deterministic pivot
            rp, cp = np.array([0]), np.array([0])
        self.Iset[p + 1] = IndexSet([I_cand[i] for i in rp])
        self.Jset[p] = IndexSet([J_cand[j] for j in cp])
        self.pivot_errors[p] = res.last_pivot_error

    def sweep2site(self, direction: str, opts: TCI2Options) -> None:
        """One half-sweep of two-site pivot updates (ref sweep2site :605)."""
        bonds = range(self.L - 1) if direction == "forward" else range(
            self.L - 2, -1, -1
        )
        for p in bonds:
            self._update_bond(p, opts)

    def sweep1site(self, opts: TCI2Options) -> None:
        """One-site cleanup sweep restoring strict nesting (ref :713).

        Re-selects Iset[p+1] among rows of T_p (forward) and Jset[p] among
        cols of T_{p+1} (backward) without increasing ranks.
        """
        # forward: re-pick row pivots from T_p matricized (|I_p| d_p, |J_p|)
        for p in range(self.L - 1):
            rows = [i + (s,) for i in self.Iset[p]
                    for s in range(self.local_dims[p])]
            mat = self._eval_matrix(rows, self.Jset[p].items())
            r = min(len(self.Iset[p + 1]), min(mat.shape))
            res = rrlu(jnp.asarray(mat), rtol=0.0, atol=0.0, max_rank=r)
            if res.rank:
                self.Iset[p + 1] = IndexSet([rows[i] for i in res.row_pivots])
        # backward: re-pick col pivots
        for p in range(self.L - 2, -1, -1):
            cols = [(s,) + j for s in range(self.local_dims[p + 1])
                    for j in self.Jset[p + 1]]
            mat = self._eval_matrix(self.Iset[p + 1].items(), cols)
            r = min(len(self.Jset[p]), min(mat.shape))
            res = rrlu(jnp.asarray(mat), rtol=0.0, atol=0.0, max_rank=r)
            if res.rank:
                self.Jset[p] = IndexSet([cols[j] for j in res.col_pivots])

    # ------------------------------------------------------------------
    def to_tensortrain(self) -> TensorTrain:
        """Materialize the TT: B_p = T_p @ P_p^{-1} (ref to_tensor_train :541).

        Solved as ``B P = T`` per bond — P is the pivot cross matrix, kept
        well-conditioned by the rrLU pivoting.
        """
        cores = []
        for p in range(self.L):
            T = self._T_tensor(p)
            nI, d, nJ = T.shape
            if p == self.L - 1:
                cores.append(jnp.asarray(T.reshape(nI, d, 1)))
                break
            P = self._P_matrix(p)  # (|I_{p+1}|, |J_p|)
            # Host solve: P is a small rank x rank pivot matrix (pivot
            # bookkeeping is host-side anyway) and the TPU backend has no
            # f64 LU ('Only F32 and C64 types are implemented in
            # LuDecomposition' — axon remote compile rejects
            # jnp.linalg.solve on f64).
            Tm = T.reshape(nI * d, nJ).T
            if P.shape[0] != P.shape[1]:
                B = np.linalg.lstsq(P.T, Tm, rcond=None)[0].T
            else:
                B = np.linalg.solve(P.T, Tm).T
            cores.append(jnp.asarray(B.reshape(nI, d, P.shape[0])))
        return TensorTrain(cores)


# ----------------------------------------------------------------------
# global pivot search (ref globalpivot.rs:14-70, globalsearch.rs:1-262)
# ----------------------------------------------------------------------
def find_global_pivots(
    tci: TensorCI2,
    tt: TensorTrain,
    opts: TCI2Options,
    rng: np.random.Generator,
) -> List[MultiIndex]:
    """Random starts + greedy coordinate descent on |f - tt|."""
    L, dims = tci.L, tci.local_dims
    n_starts = opts.global_search_starts
    starts = np.stack(
        [rng.integers(0, d, size=n_starts) for d in dims], axis=1
    )
    fvals = tci.func.eval_batch(starts)
    tvals = np.asarray(tt.evaluate_batch(starts))
    errs = np.abs(fvals - tvals)
    order = np.argsort(-errs)
    found: List[MultiIndex] = []
    threshold = opts.tol * max(tci.f_max, 1e-300)
    for s in order[: opts.n_global_pivots]:
        point = starts[s].copy()
        best = errs[s]
        improved = True
        while improved:
            improved = False
            for site in range(L):
                cand = np.tile(point, (dims[site], 1))
                cand[:, site] = np.arange(dims[site])
                fv = tci.func.eval_batch(cand)
                tv = np.asarray(tt.evaluate_batch(cand))
                e = np.abs(fv - tv)
                j = int(np.argmax(e))
                if e[j] > best * (1 + 1e-12):
                    best = e[j]
                    point = cand[j]
                    improved = True
        if best > threshold:
            found.append(tuple(int(v) for v in point))
    return found


def estimate_true_error(
    tt: TensorTrain, func: CachedFunction, n_samples: int = 1000, seed: int = 1
) -> float:
    """Sampled max |f - tt| (ref estimate_true_error)."""
    rng = np.random.default_rng(seed)
    idx = np.stack(
        [rng.integers(0, d, size=n_samples) for d in func.local_dims], axis=1
    )
    fv = func.eval_batch(idx)
    tv = np.asarray(tt.evaluate_batch(idx))
    return float(np.abs(fv - tv).max())


# ----------------------------------------------------------------------
# driver (ref crossinterpolate2, tensorci2.rs:1279 / optimize :1389)
# ----------------------------------------------------------------------
def crossinterpolate2(
    f: Optional[Callable] = None,
    local_dims: Optional[Sequence[int]] = None,
    initial_pivots: Optional[Sequence[Sequence[int]]] = None,
    options: Optional[TCI2Options] = None,
    batch_f: Optional[Callable] = None,
    dtype=np.float64,
) -> Tuple[TensorCI2, List[int], List[float]]:
    """Cross-interpolate a black-box function into a tensor train.

    Returns ``(tci, ranks_history, errors_history)`` — call
    ``tci.to_tensortrain()`` for the TT (ref returns the same triple).

    Convergence (ref tensorci2.rs:71-120 doc): stop when the normalized
    pivot error < tol AND ranks are stable AND no new global pivots are
    found, for `ncheck_history` consecutive half-sweeps.
    """
    opts = options or TCI2Options()
    func = CachedFunction(f=f, local_dims=local_dims, batch_f=batch_f,
                          dtype=dtype)
    tci = TensorCI2(func, initial_pivots)
    rng = np.random.default_rng(opts.seed)
    ranks_history: List[int] = []
    errors_history: List[float] = []
    stable = 0
    for it in range(opts.max_iter):
        direction = "forward" if it % 2 == 0 else "backward"
        tci.sweep2site(direction, opts)
        err = float(tci.pivot_errors.max()) / max(tci.f_max, 1e-300)
        rank = max(tci.ranks)
        ranks_history.append(rank)
        errors_history.append(err)
        if opts.verbosity:
            print(f"[tci2] iter={it} dir={direction} rank={rank} err={err:.3e}")
        new_pivots: List[MultiIndex] = []
        if opts.n_global_pivots > 0:
            tt = tci.to_tensortrain()
            new_pivots = find_global_pivots(tci, tt, opts, rng)
            if new_pivots:
                tci.add_global_pivots(new_pivots)
        rank_stable = (
            len(ranks_history) >= 2 and ranks_history[-1] == ranks_history[-2]
        )
        if err < opts.tol and rank_stable and not new_pivots:
            stable += 1
            if stable >= opts.ncheck_history:
                break
        else:
            stable = 0
    if opts.final_sweep1site:
        tci.sweep1site(opts)
    return tci, ranks_history, errors_history
