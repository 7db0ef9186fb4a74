"""EMLP engine diagnostics — library-user tools for verifying and inspecting
equivariant bases (capability port of algos/emlp_torch/reps/utils.py:177-251
and the generic wrappers of emlp_torch/nn.py:195-259).

The tests roll their own equivariance checks; these are the *user-facing*
equivalents, so custom reps can be validated without reading the test suite.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nn import linear_projector
from .reps import SumRep


def _groups_of(rep):
    if not hasattr(rep, "atoms"):      # general rep_algebra.Rep
        from .rep_algebra import groups_of
        return groups_of(rep)
    seen = []
    for a in rep.atoms:
        if all(a.G != G for G in seen):
            seen.append(a.G)
    return seen


def _size_of(rep) -> int:
    """Scoped SumRep exposes ``size`` as a property; general rep_algebra
    reps as a method."""
    return rep.size if isinstance(rep.size, int) else rep.size()


def _rho_of(rep, assign: Dict) -> np.ndarray:
    """Dense rho under a {Group: element} assignment for either engine
    (general reps resolve the dict internally via ``_as_matrix``)."""
    if hasattr(rep, "rho_dense"):      # scoped reps.SumRep
        return rep.rho_dense(assign)
    return rep.rho(assign)


def scale_adjusted_rel_error(t1: np.ndarray, t2: np.ndarray,
                             g: np.ndarray) -> float:
    """Relative error of t1 vs t2, adjusted for the scale of the tensors and
    of the group element (reps/utils.py:231-237)."""
    error = np.sqrt(np.mean(np.abs(t1 - t2) ** 2))
    tscale = (np.sqrt(np.mean(np.abs(t1) ** 2))
              + np.sqrt(np.mean(np.abs(t2) ** 2)))
    gscale = np.sqrt(np.mean(np.abs(g - np.eye(g.shape[-1])) ** 2))
    return float(error / max(max(tscale, gscale), 1e-7))


def equivariance_error(W: np.ndarray, rep_in: SumRep, rep_out: SumRep,
                       n_samples: int = 5, rng=None) -> float:
    """Equivariance relative error rel_err(W rho_in(g), rho_out(g) W) of a
    matrix W (nout, nin) — or a basis Q (nout*nin, r) — over sampled group
    elements (reps/utils.py:240-251).

    Reps may span several groups; one element per group is sampled per draw
    and applied jointly via rho_dense.
    """
    rng = rng or np.random.default_rng(0)
    nin, nout = _size_of(rep_in), _size_of(rep_out)
    W = np.asarray(W)
    if W.ndim == 1:
        W = W[:, None]
    if W.shape[0] == nout * nin:          # basis (nout*nin, r)
        Ws = W.T.reshape(-1, nout, nin)
    else:                                  # single matrix
        Ws = W.reshape(1, nout, nin)

    groups = _groups_of(rep_in) + [G for G in _groups_of(rep_out)
                                   if all(G != H for H in _groups_of(rep_in))]
    errs = []
    for _ in range(n_samples):
        assign: Dict = {G: G.samples(1, rng)[0] for G in groups}
        rin = _rho_of(rep_in, assign)
        rout = _rho_of(rep_out, assign)
        gref = max((g for g in assign.values()),
                   key=lambda g: g.shape[-1])
        errs.append(scale_adjusted_rel_error(Ws @ rin, rout @ Ws, gref))
    return float(np.max(errs))


def equivariant_projection(rep_in: SumRep, rep_out: SumRep):
    """(P(v), r): the dense equivariant projector onto Hom_G(V_in, V_out)
    applied to a vectorized matrix, plus the subspace dimension — the
    user-facing form of the projector the layers bake in
    (nn.linear_projector; reference representation.py:121-126)."""
    Qw, _, mask, _ = linear_projector(rep_in, rep_out)
    mflat = mask.reshape(-1)
    r = int(Qw.shape[1] + mflat.sum())

    def project(v):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        out = jnp.asarray(mflat) * v
        if Qw.shape[1]:
            Q = jnp.asarray(Qw)
            out = out + Q @ (Q.T @ v)
        return out

    return project, r


def equivariant_basis(rep_in: SumRep, rep_out: SumRep) -> np.ndarray:
    """Dense orthonormal basis Q (nout*nin, r) of the equivariant subspace
    (reference's rep.equivariant_basis())."""
    Qw, _, mask, _ = linear_projector(rep_in, rep_out)
    cols = [Qw[:, k] for k in range(Qw.shape[1])]
    mflat = mask.reshape(-1)
    for idx in np.nonzero(mflat)[0]:
        e = np.zeros(mflat.size, np.float32)
        e[idx] = 1.0
        cols.append(e)
    if not cols:
        return np.zeros((rep_out.size * rep_in.size, 0), np.float32)
    return np.stack(cols, axis=1)


def sparsify_basis(Q: np.ndarray, lr: float = 1e-2,
                   iters: int = 3000) -> np.ndarray:
    """Rotate an orthonormal basis toward a +-1/0 pattern for visualization
    (reps/utils.py:177-210): minimize mean|QW^T| + orthogonality and
    log-det penalties over an orthogonal W, then snap.  No convergence
    guarantee — visualization only, exactly like the reference."""
    import optax

    Q = jnp.asarray(Q, jnp.float32)
    r = Q.shape[-1]
    if r == 0:
        return np.asarray(Q)
    key = jax.random.PRNGKey(0)
    W = jnp.linalg.qr(jax.random.normal(key, (r, r)))[0]

    def loss(W):
        return (jnp.abs(Q @ W.T).mean()
                + 0.1 * jnp.abs(W.T @ W - jnp.eye(r)).mean()
                + 0.01 * jnp.linalg.slogdet(W)[1] ** 2)

    opt = optax.adam(lr)
    ost = opt.init(W)

    @jax.jit
    def step(W, ost):
        val, g = jax.value_and_grad(loss)(W)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(W, up), ost, val

    val = jnp.inf
    for i in range(iters):
        W, ost, val = step(W, ost)
        if float(val) > 1e2 and i > 100:  # diverged: retry lower lr
            return sparsify_basis(np.asarray(Q), lr=lr / 3, iters=iters)
    Qs = np.array(Q @ W.T)  # writable copy
    Qs[np.abs(Qs) < 1e-2] = 0.0
    nz = np.abs(Qs) > 1e-2
    Qs[nz] /= np.abs(Qs[nz])
    return Qs


def vis(rep_in: SumRep, rep_out: SumRep, path: Optional[str] = None):
    """Visualize the equivariant basis of maps rep_in -> rep_out as an image
    (reps/utils.py:213-228): project a random vector onto the subspace and
    display the tied-weight pattern.  Returns the (nout, nin) pattern array;
    saves a PNG when ``path`` is given."""
    project, _ = equivariant_projection(rep_in, rep_out)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(rep_out.size * rep_in.size)
    img = np.round(np.asarray(project(v)), 4).reshape(rep_out.size,
                                                      rep_in.size)
    if path is not None:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        plt.imshow(img)
        plt.axis("off")
        plt.savefig(path, bbox_inches="tight")
        plt.close()
    return img


# ----------------------------------------------------------------------
# Generic baseline wrappers (emlp_torch/nn.py:195-259)
# ----------------------------------------------------------------------
import flax.linen as nn  # noqa: E402


class MLP(nn.Module):
    """Standard baseline MLP; reps are used for shapes only
    (nn.py:209-230): [Linear+SiLU] * num_layers + Linear, xavier-normal
    kernels and zero biases (Linear_jax_init, nn.py:196-202)."""
    rep_in: SumRep
    rep_out: SumRep
    ch: int = 384
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        kinit = nn.initializers.xavier_normal()
        for _ in range(self.num_layers):
            x = nn.silu(nn.Dense(self.ch, kernel_init=kinit,
                                 bias_init=nn.initializers.zeros)(x))
        return nn.Dense(self.rep_out.size, kernel_init=kinit,
                        bias_init=nn.initializers.zeros)(x)


def standardize(apply_fn, ds_stats):
    """Wrap a model apply with dataset normalization stats (nn.py:233-259):
    ``(mu_x, sigma_x)`` normalizes inputs; ``(mu_x, sigma_x, mu_y, sigma_y)``
    also unnormalizes outputs."""
    if len(ds_stats) == 2:
        mu_in, s_in = ds_stats

        def wrapped(params, x, *a, **kw):
            return apply_fn(params, (x - mu_in) / s_in, *a, **kw)
    else:
        mu_in, s_in, mu_out, s_out = ds_stats

        def wrapped(params, x, *a, **kw):
            return s_out * apply_fn(params, (x - mu_in) / s_in, *a,
                                    **kw) + mu_out
    return wrapped
