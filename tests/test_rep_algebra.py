"""Tests for the general representation algebra (`models/emlp/rep_algebra`):
algebra laws, known invariant-subspace dimensions, canonicalization/perm
bookkeeping, bilinear weights, consistency with the scoped zoo engine
(`reps.py`), and golden subspace parity against the actual reference torch
engine (/root/reference/algos/emlp_torch/reps/representation.py) when the
reference is mounted."""
import inspect
import os
import sys
import types

import numpy as np
import pytest

from gym_rotor_tpu.models.emlp import groups as G
from gym_rotor_tpu.models.emlp import reps as scoped
from gym_rotor_tpu.models.emlp.rep_algebra import (
    Scalar, SumRep, T, V, bilinear_weights, distribute_product, solcache)

REF_PATH = "/root/reference"
HAS_REF = os.path.isdir(REF_PATH)


def subspace_gap(Qa, Qb):
    """Max |P_a - P_b| of the two orthogonal projectors — 0 iff the bases
    span the same subspace."""
    Pa = Qa @ Qa.conj().T
    Pb = Qb @ Qb.conj().T
    return np.abs(Pa - Pb).max()


# ----------------------------------------------------------------------------
# Known invariant dimensions
# ----------------------------------------------------------------------------
@pytest.mark.parametrize("p,expect", [(1, 0), (2, 1), (3, 1), (4, 3)])
def test_so3_tensor_invariants(p, expect):
    """dim of SO(3)-invariants of V^⊗p: 0, 1 (δ), 1 (ε), 3 (δδ pairings)."""
    Q = T(p, G=G.SO(3)).equivariant_basis()
    assert Q.shape == (3 ** p, expect)


@pytest.mark.parametrize("p,expect", [(1, 1), (2, 2), (3, 5)])
def test_sn_tensor_invariants(p, expect):
    """S(4)-invariants of V^⊗p have dim Bell(p) (orbit-counting)."""
    Q = T(p, G=G.S(4)).equivariant_basis()
    assert Q.shape == (4 ** p, expect)


def test_cyclic_matrix_invariants():
    """Z(5)-equivariant 5x5 matrices = circulants: dim 5."""
    Q = T(2, G=G.Z(5)).equivariant_basis()
    assert Q.shape == (25, 5)


def test_scalar_basis():
    assert Scalar.equivariant_basis().shape == (1, 1)


# ----------------------------------------------------------------------------
# Algebra laws: rho homomorphism, drho linearity, projector equivariance
# ----------------------------------------------------------------------------
@pytest.mark.parametrize("mk", [
    lambda: T(2, G=G.SO(3)),
    lambda: (V + V * V + Scalar)(G.SO(3)),
    lambda: ((V + Scalar) * V)(G.O(3)),
    lambda: T(2, G=G.S(4)),
])
def test_rho_homomorphism(mk):
    rep = mk()
    rng = np.random.default_rng(0)
    g1, g2 = rep.G.sample(), rep.G.sample()
    assert np.abs(rep.rho(g1 @ g2) - rep.rho(g1) @ rep.rho(g2)).max() < 1e-10
    # projector commutes with the group action
    P = rep.equivariant_projector()
    assert np.abs(P @ rep.rho(g1) - rep.rho(g1) @ P).max() < 1e-7
    # basis is in the null space of every Lie-algebra generator
    Q = rep.equivariant_basis()
    for A in rep.G.lie_algebra:
        assert np.abs(rep.drho(A) @ Q).max() < 1e-7
    for h in rep.G.discrete_generators:
        assert np.abs(rep.rho(h) @ Q - Q).max() < 1e-7


def test_sum_perm_bookkeeping():
    """V ⊕ V⊗V ⊕ 1 in user order: rho acts blockwise in *user* coordinates
    even though the canonical layout is sorted (representation.py:405-546)."""
    Grp = G.SO(3)
    rep = (V + V * V + Scalar)(Grp)
    assert rep.size() == 13
    g = Grp.sample()
    R = rep.rho(g)
    # user layout: [V(3) | V2(9) | scalar(1)]
    assert np.abs(R[:3, :3] - g).max() < 1e-12
    assert np.abs(R[3:12, 3:12] - np.kron(g, g)).max() < 1e-12
    assert np.abs(R[12, 12] - 1.0) < 1e-12
    # off-diagonal blocks vanish
    assert np.abs(R[:3, 3:]).max() < 1e-12
    assert np.abs(R[3:12, :3]).max() < 1e-12


def test_product_distributes_over_sum():
    """(V+1)⊗(V+1) = V2 + 2V + 1 with exact perm bookkeeping: rho of the
    product equals the kron of the factors (representation.py:588-632)."""
    Grp = G.SO(3)
    a = (V + Scalar)(Grp)
    prod = a * a
    assert prod.size() == 16
    assert sorted((repr(r), c) for r, c in prod.reps.items()) == [
        ("V", 2), ("V0", 1), ("V2", 1)]
    g = Grp.sample()
    ga = a.rho(g)
    assert np.abs(prod.rho(g) - np.kron(ga, ga)).max() < 1e-12


def test_pow_and_rshift():
    Grp = G.SO(3)
    assert (V ** 3)(Grp).size() == 27
    maps = (V >> V)(Grp)       # linear maps V -> V = V ⊗ V* (self-dual)
    Q = maps.equivariant_basis()
    assert Q.shape == (9, 1)
    # the invariant map is the identity (up to scale)
    M = Q[:, 0].reshape(3, 3)
    assert np.abs(M - M[0, 0] * np.eye(3)).max() < 1e-8


def test_dual_rho_inverse_transpose():
    Grp = G.SO2eR3()
    rep = V(Grp)
    g = Grp.sample()
    assert np.abs(rep.t().rho(g) - np.linalg.inv(rep.rho(g)).T).max() < 1e-10
    # orthogonal groups are self-dual
    assert V(G.SO(3)).t() == V(G.SO(3))


def test_T_pq_constructor():
    rep = T(1, 1, G=G.SO(3))
    assert rep.size() == 9
    assert rep.equivariant_basis().shape == (9, 1)


# ----------------------------------------------------------------------------
# Cross-group DirectProduct
# ----------------------------------------------------------------------------
def test_direct_product_factorizes():
    """Invariants of a G1xG2 rep = inv(G1-rep) ⊗ inv(G2-rep)
    (representation.py:764-824)."""
    dp = T(2, G=G.SO(3)) * V(G.S(4))
    Q = dp.equivariant_basis()
    assert Q.shape == (36, 1)
    Ms = {G.SO(3): G.SO(3).sample(), G.S(4): G.S(4).sample()}
    assert np.abs(dp.rho(Ms) @ Q - Q).max() < 1e-10
    # no invariants when one factor has none
    assert (V(G.SO(3)) * V(G.S(4))).equivariant_basis().shape[1] == 0


# ----------------------------------------------------------------------------
# Deferred reps
# ----------------------------------------------------------------------------
def test_deferred_sum_and_product():
    deferred = V + V * V            # no group bound yet
    assert not deferred.concrete()
    bound = deferred(G.SO(3))
    assert bound.size() == 12
    dp = V * V
    assert dp(G.S(3)).size() == 9


def test_solcache_reuse():
    solcache.clear()
    T(2, G=G.SO(3)).equivariant_basis()
    n = len(solcache)
    # same canonical rep: no new solves
    (V * V)(G.SO(3)).equivariant_basis()
    assert len(solcache) == n


# ----------------------------------------------------------------------------
# Bilinear weights
# ----------------------------------------------------------------------------
def test_bilinear_weights_equivariance():
    """proj(p, ρ_in(g)x) = ρ_out(g) proj(p, x) ρ_in(g)^{-1}
    (representation.py:358-402)."""
    import jax.numpy as jnp
    Grp = G.SO(3)
    rep_in = (3 * V + 2 * Scalar)(Grp)
    rep_out = (2 * V + Scalar)(Grp)
    nparams, proj = bilinear_weights(rep_out, rep_in)
    assert nparams > 0
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(5, rep_in.size())))
    params = jnp.array(rng.normal(size=(nparams,)))
    W = proj(params, x)
    assert W.shape == (5, rep_out.size(), rep_in.size())
    g = Grp.sample()
    rho_in, rho_out = rep_in.rho(g), rep_out.rho(g)
    Wg = np.asarray(proj(params, jnp.array(np.asarray(x) @ rho_in.T)))
    expect = np.einsum("ij,bjk,kl->bil", rho_out, np.asarray(W),
                       np.linalg.inv(rho_in))
    assert np.abs(Wg - expect).max() < 1e-8


def test_diagnostics_bridge():
    """`diagnostics.equivariance_error` accepts general rep_algebra reps:
    the invariant-map basis of V->V scores ~0; a random matrix does not."""
    from gym_rotor_tpu.models.emlp import diagnostics as diag
    Grp = G.SO(3)
    rin, rout = (1 * V)(Grp), (1 * V)(Grp)
    Q = (rin >> rout).equivariant_basis()        # (9, 1): identity map
    err = diag.equivariance_error(Q, rin, rout)
    assert err < 1e-6
    rng = np.random.default_rng(3)
    bad = rng.normal(size=(rout.size(), rin.size()))
    assert diag.equivariance_error(bad, rin, rout) > 1e-2


# ----------------------------------------------------------------------------
# Consistency with the scoped zoo engine (reps.py)
# ----------------------------------------------------------------------------
@pytest.mark.parametrize("grp,p", [
    (G.SO(3), 1), (G.SO(3), 2), (G.Mirror(1), 2), (G.O(3), 2), (G.S(4), 2)])
def test_matches_scoped_engine(grp, p):
    """General-engine invariant vectors of T(p) span the same subspace as
    the scoped engine's `vec_basis` (same solver, different bookkeeping)."""
    Q_general = T(p, G=grp).equivariant_basis()
    Q_scoped = scoped.vec_basis(scoped.Atom(grp, p))
    assert Q_general.shape == Q_scoped.shape
    if Q_general.shape[1]:
        assert subspace_gap(Q_general, Q_scoped) < 1e-8


# ----------------------------------------------------------------------------
# Golden: subspace parity vs the actual reference torch engine
# ----------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_reps():
    """Import /root/reference/algos/emlp_torch with a minimal shim for its
    `plum` multiple-dispatch dependency (only `mul_reps` uses it:
    representation.py:196-211, 554-573 — 4 registrations, first-match in
    registration order reproduces plum's specificity for these signatures)."""
    if not HAS_REF:
        pytest.skip("reference not available")

    class _Dispatcher:
        def __init__(self):
            self._regs = {}

        def _register(self, fn, sigs):
            regs = self._regs.setdefault(fn.__qualname__, [])
            for s in sigs:
                regs.append((s, fn))

            def wrapper(*args, **kw):
                for ts, f in regs:
                    if len(ts) == len(args) and all(
                            isinstance(a, t) for a, t in zip(args, ts)):
                        return f(*args, **kw)
                raise TypeError(f"no dispatch match for {fn.__qualname__}")

            wrapper.__name__ = fn.__name__
            return wrapper

        def __call__(self, fn):
            sig = inspect.signature(fn)
            ts = tuple(object if p.annotation is inspect.Parameter.empty
                       else p.annotation for p in sig.parameters.values())
            return self._register(fn, [ts])

        def multi(self, *sigs):
            return lambda fn: self._register(fn, list(sigs))

    plum = types.ModuleType("plum")
    plum.dispatch = _Dispatcher()
    had_plum = sys.modules.get("plum")
    sys.modules["plum"] = plum
    sys.path.insert(0, REF_PATH)
    old_argv = sys.argv
    sys.argv = ["main.py"]
    try:
        from algos.emlp_torch import groups as ref_groups
        from algos.emlp_torch import reps as ref_reps_mod
        yield ref_groups, ref_reps_mod
    finally:
        sys.argv = old_argv
        sys.path.remove(REF_PATH)
        if had_plum is None:
            sys.modules.pop("plum", None)
        else:
            sys.modules["plum"] = had_plum


def _ref_dense(Q):
    import torch
    if hasattr(Q, "to_dense"):
        Q = Q.to_dense()
    if isinstance(Q, torch.Tensor):
        Q = Q.detach().cpu().numpy()
    return np.asarray(Q)


@pytest.mark.skipif(not HAS_REF, reason="reference not available")
@pytest.mark.parametrize("case", ["so3_t2", "so3_t3", "s4_t2", "z5_t2",
                                  "o3_sum", "so3_prod"])
def test_golden_basis_vs_reference(ref_reps, case):
    """Our dense solver spans the same invariant subspace as the reference's
    lazy-operator solver (float32) for sums, products and tensor powers."""
    ref_groups, ref_mod = ref_reps
    rV, rT, rScalar = ref_mod.V, ref_mod.T, ref_mod.Scalar
    builders = {
        "so3_t2": (lambda: rT(2, G=ref_groups.SO(3)),
                   lambda: T(2, G=G.SO(3))),
        "so3_t3": (lambda: rT(3, G=ref_groups.SO(3)),
                   lambda: T(3, G=G.SO(3))),
        "s4_t2": (lambda: rT(2, G=ref_groups.S(4)),
                  lambda: T(2, G=G.S(4))),
        "z5_t2": (lambda: rT(2, G=ref_groups.Z(5)),
                  lambda: T(2, G=G.Z(5))),
        "o3_sum": (lambda: (rV + rV * rV)(ref_groups.O(3)),
                   lambda: (V + V * V)(G.O(3))),
        "so3_prod": (lambda: ((rV + rScalar) * rV)(ref_groups.SO(3)),
                     lambda: ((V + Scalar) * V)(G.SO(3))),
    }
    mk_ref, mk_ours = builders[case]
    Q_ref = _ref_dense(mk_ref().equivariant_basis())
    Q_ours = mk_ours().equivariant_basis()
    assert Q_ref.shape == Q_ours.shape
    # reference solves in float32 → 1e-5 subspace tolerance
    assert subspace_gap(Q_ref, Q_ours) < 1e-5


# ----------------------------------------------------------------------------
# Iterative (matrix-free) constraint solver — the fallback past
# MAX_DENSE_ENTRIES, mirroring the reference's krylov_constraint_solve
# (/root/reference/algos/emlp_torch/reps/utils.py:94-170, routed from
# representation.py:113-114).
# ----------------------------------------------------------------------------

from gym_rotor_tpu.models.emlp import rep_algebra as ra


@pytest.mark.parametrize("mk", [
    lambda: V(G.SO(3)) ** 3,            # ProductRep → Kronecker-structured ops
    lambda: (V + V * V)(G.O(3)),        # SumRep → per-member default blocks
    lambda: T(2, G=G.Z(5)),             # discrete generators only
], ids=["so3_t3", "o3_sum", "z5_t2"])
def test_constraint_ops_match_dense_blocks(mk):
    """Stacked blockwise applies equal constraint_matrix() @ X, and each
    (apply, applyH) pair is a true adjoint pair — the contract the
    matrix-free solver relies on."""
    canon, _ = mk().canonicalize()
    C = canon.constraint_matrix()
    X = np.random.default_rng(1).standard_normal((canon.size(), 3))
    ops = canon.constraint_ops()
    stacked = np.concatenate([np.asarray(a(X)) for a, _ in ops], axis=0)
    assert np.abs(stacked - C @ X).max() < 1e-12
    for a, aH in ops:
        Y = np.asarray(a(X))
        lhs = np.vdot(Y, Y)                       # <CX, CX>
        rhs = np.vdot(X, np.asarray(aH(Y)))       # <X, Cᴴ(CX)>
        assert abs(lhs - rhs) <= 1e-9 * max(1.0, abs(lhs))


def test_iterative_matches_dense_span_real():
    """SGD-on-‖CW‖² solve recovers the dense SVD null space (T(3), SO(3))."""
    canon, _ = T(3, G=G.SO(3)).canonicalize()
    Qd = ra.orthogonal_complement(canon.constraint_matrix())
    Qi = ra.iterative_constraint_solve(canon)
    assert Qd.shape == Qi.shape
    assert subspace_gap(Qd, Qi) < 1e-4


def test_iterative_matches_dense_span_complex():
    """Complex constraint path (SU(2) has complex generators): the solver
    draws a complex W0 and converges to the same subspace."""
    canon, _ = T(2, G=G.SU(2)).canonicalize()
    Qd = ra.orthogonal_complement(canon.constraint_matrix())
    Qi = ra.iterative_constraint_solve(canon)
    assert np.iscomplexobj(Qi)
    assert Qd.shape == Qi.shape
    assert subspace_gap(Qd, Qi) < 1e-4


def test_iterative_routing_past_cap(monkeypatch):
    """equivariant_basis switches to the iterative solver when the dense
    constraint would exceed MAX_DENSE_ENTRIES (representation.py:113-114)
    and still returns the same subspace, through canonicalization + perm."""
    rep = T(4, G=G.SO(3))
    solcache.clear()
    Qd = rep.equivariant_basis()
    solcache.clear()
    monkeypatch.setattr(ra, "MAX_DENSE_ENTRIES", 1e3)
    Qi = rep.equivariant_basis()
    solcache.clear()
    assert Qd.shape == Qi.shape
    assert subspace_gap(Qd, Qi) < 1e-4


@pytest.mark.skipif(os.environ.get("GYM_ROTOR_SLOW_TESTS") != "1",
                    reason="~4 min; set GYM_ROTOR_SLOW_TESTS=1 to run")
def test_iterative_over_cap_golden_t8_so3():
    """Genuinely past the cap: T(8) over SO(3) is 6561-dim with a
    1.29e8-entry constraint matrix (> 3e7).  The recovered basis dimension
    must equal the Weyl-integration count
    (1/π)∫(1+2cosθ)^8(1-cosθ)dθ = 91.  The measured run is recorded in
    docs/bench/iterative_solver_t8.json."""
    from scipy.integrate import quad
    expected, _ = quad(
        lambda t: (1 + 2 * np.cos(t)) ** 8 * (1 - np.cos(t)) / np.pi,
        0, np.pi)
    assert round(expected) == 91
    canon, _ = T(8, G=G.SO(3)).canonicalize()
    assert canon._constraint_entries() > ra.MAX_DENSE_ENTRIES
    Q = canon.equivariant_basis()
    solcache.clear()
    assert Q.shape == (6561, 91)
    res = max(np.abs(np.asarray(a(Q))).max() for a, _ in canon.constraint_ops())
    assert res < 1e-8
