"""Equivariant probabilistic IO interface (reference
algos/emlp_torch/interface.py:10-108 — available but unused by the main
training path, SURVEY.md §2 row 26).

* ``GroupAugmentation`` — symmetrize an arbitrary network by averaging over
  sampled group elements: f_sym(x) = E_g[rho_out(g)^{-1} f(rho_in(g) x)].
* ``batched_gram_schmidt`` — batched orthonormalization of learned frames.
* ``Interface`` — probabilistic learned-frame interface: a small EMLP maps
  (noised) inputs to d x d frames, orthonormalized by Gram-Schmidt, which act
  as input-dependent group elements for symmetrization.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .groups import Group
from .nn import EMLP
from .reps import SumRep, Vector, uniform_rep


def _rho_batch(rep: SumRep, G: Group, gs: np.ndarray) -> np.ndarray:
    """Dense block-diagonal rho for a batch of sampled elements."""
    return np.stack([rep.rho_dense({G: g}) for g in gs])


def group_augmentation(model_fn: Callable, rep_in: SumRep, rep_out: SumRep,
                       G: Group, x, n_samples: int = 1,
                       rng: np.random.Generator = None):
    """Symmetrize model_fn over n_samples sampled group elements
    (interface.py:24-40).  Group sampling happens on host (matrix exp);
    the rho applications run on device."""
    rng = rng or np.random.default_rng(0)
    x_rep = jnp.repeat(x[None], n_samples, axis=0).reshape(
        (-1,) + x.shape[1:])
    gs = G.samples(x_rep.shape[0], rng)
    rho_in = jnp.asarray(_rho_batch(rep_in, G, gs), x.dtype)
    rho_out_inv = jnp.asarray(
        np.linalg.inv(_rho_batch(rep_out, G, gs)), x.dtype)
    y = model_fn(jnp.einsum("bij,bj->bi", rho_in, x_rep))
    y = jnp.einsum("bij,bj->bi", rho_out_inv, y)
    return y.reshape((n_samples, -1) + y.shape[1:]).mean(0)


def batched_projection(bu, bv):
    """Projection of bv onto bu, batched (interface.py:43-45)."""
    return (bv * bu).sum(-1, keepdims=True) / (bu * bu).sum(
        -1, keepdims=True) * bu


def batched_gram_schmidt(bvv):
    """Batched Gram-Schmidt over column frames (..., d, k)
    (interface.py:48-64)."""
    nk = bvv.shape[2]
    cols = [bvv[:, :, 0]]
    for k in range(1, nk):
        bvk = bvv[:, :, k]
        buk = 0
        for j in range(k):
            buk = buk + batched_projection(cols[j], bvk)
        cols.append(bvk - buk)
    cols = [c / jnp.linalg.norm(c, axis=-1, keepdims=True) for c in cols]
    return jnp.stack(cols, axis=2)


class Interface(nn.Module):
    """Learned-frame symmetrization (interface.py:67-108): an EMLP 'io' head
    maps noised inputs to d*d frame vectors; Gram-Schmidt orthonormalizes
    them into per-sample group elements used for input/output conjugation."""
    model: Callable            # the wrapped network apply fn (params bound)
    rep_in: SumRep
    rep_out: SumRep
    group: Group               # an orthogonal group (reference asserts O(n))
    io_ch: int = 384

    @nn.compact
    def __call__(self, x, key):
        G = self.group
        d = G.d
        io_out = Vector(G) * d
        noise_scale = self.param(
            "noise_scale", lambda k, s: jnp.ones(s, jnp.float32),
            (self.rep_in.size,))
        io = EMLP((self.rep_in, uniform_rep(self.io_ch, G)), io_out,
                  name="io")
        z = jax.random.normal(key, (self.rep_in.size,), x.dtype)
        frames = io(x + noise_scale * z)
        frames = frames.reshape(x.shape[0], d, d).transpose(0, 2, 1)
        gs = batched_gram_schmidt(frames)  # (B, d, d) orthonormal
        # conjugate: rho_out(g)^{-1} f(rho_in(g) x) with per-sample frames.
        rho_in = _rho_apply(self.rep_in, gs)
        y = self.model(jnp.einsum("bij,bj->bi", rho_in, x))
        rho_out = _rho_apply(self.rep_out, gs)
        rho_out_inv = jnp.linalg.inv(rho_out)
        return jnp.einsum("bij,bj->bi", rho_out_inv, y)


def _rho_apply(rep: SumRep, gs):
    """Block-diagonal rho(g) for traced per-sample frames: every atom of the
    frame's group transforms by kron powers of g; other groups' atoms get
    identity.  Supports rank <= 2 atoms (the model zoo's range)."""
    B = gs.shape[0]
    d = gs.shape[-1]
    blocks = []
    for a in rep.atoms:
        if a.rank == 0 or a.G.d != d:
            blocks.append(jnp.broadcast_to(jnp.eye(a.size, dtype=gs.dtype),
                                           (B, a.size, a.size)))
        elif a.rank == 1:
            blocks.append(gs)
        elif a.rank == 2:
            blocks.append(jnp.einsum("bij,bkl->bikjl", gs, gs).reshape(
                B, d * d, d * d))
        else:
            raise NotImplementedError("rank > 2 frames")
    n = rep.size
    out = jnp.zeros((B, n, n), gs.dtype)
    off = 0
    for b in blocks:
        s = b.shape[-1]
        out = out.at[:, off:off + s, off:off + s].set(b)
        off += s
    return out
