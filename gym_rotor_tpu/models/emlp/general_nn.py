"""General EMLP over arbitrary `rep_algebra` representations — the
user-facing equivalent of the reference's generic equivariant network
(`algos/emlp_torch/nn.py:13-192`): ``Linear``, ``BiLinear``, gated
nonlinearities, ``uniform_rep`` channel allocation and the ``EMLP`` module,
for *any* group in the zoo and any rep built with the ⊕/⊗/dual algebra.

The performance-scoped zoo engine (`nn.py` + `reps.py`) stays the training
hot path; this module is the capability layer for custom groups/reps.

TPU-first re-design: the reference threads lazy operator chains through every
forward and projects a dense kernel with a lazy (N², N²) projector
(nn.py:22-36).  Here the equivariant subspace is solved **blockwise on the
host** at trace time — one small dense basis Q_t per unique summand type of
the weight rep W = rep_out ⊗ rep_in* — and the forward projects the kernel
per block with two small matmuls (c_t = Q_tᵀ vec(w_t); w_t ← Q_t c_t), all
baked as XLA constants.  The full dense (N², r) basis is never materialized,
so wide layers (uniform_rep(384)) stay cheap in HBM.

Divergences from the reference (documented):

* ``binomial_allocation``'s ragged remainder draws from a seeded generator
  (nn.py:146-147 uses unseeded ``np.random.binomial``) so layer layouts are
  reproducible across processes.
* kernels are initialized orthogonal *then projected* exactly like the
  reference (nn.py:19-20), but our projection happens per-forward on the
  stored dense kernel — identical function space, identical gradient flow
  (Q is orthonormal).
"""
from __future__ import annotations

from functools import reduce
from typing import List, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from scipy.special import binom

from .groups import Group
from .rep_algebra import (Rep, Scalar, SumRep, T, bilinear_weights)


# ----------------------------------------------------------------------------
# Channel allocation heuristics (reference nn.py:102-150)
# ----------------------------------------------------------------------------
def lambertW(ch: int, d: int) -> int:
    """Largest r with (r+1) d^r <= ch (reference nn.py:130-136)."""
    max_rank = 0
    while (max_rank + 1) * d ** max_rank <= ch:
        max_rank += 1
    return max_rank - 1


def binomial_allocation(N: int, rank: int, G: Group,
                        rng: np.random.Generator) -> Union[Rep, int]:
    """Allocate N tensors of total rank r into T(k, r-k) binomially
    (reference nn.py:135-150)."""
    if N == 0:
        return 0
    n_binoms = N // (2 ** rank)
    n_leftover = N % (2 ** rank)
    even_split = sum(n_binoms * int(binom(rank, k)) * T(k, rank - k, G)
                     for k in range(rank + 1))
    ps = rng.binomial(rank, 0.5, n_leftover)
    ragged = sum(T(int(p), rank - int(p), G) for p in ps)
    return even_split + ragged


def uniform_rep(ch: int, G: Group, seed: int = 0) -> SumRep:
    """Distribute ``ch`` channels evenly across tensor ranks
    (reference nn.py:102-127); returns a canonicalized general SumRep."""
    d = G.d
    Ns = np.zeros((lambertW(ch, d) + 1,), np.int64)
    while ch > 0:
        max_rank = lambertW(ch, d)
        Ns[:max_rank + 1] += np.array(
            [d ** (max_rank - r) for r in range(max_rank + 1)], dtype=np.int64)
        ch -= (max_rank + 1) * d ** max_rank
    rng = np.random.default_rng(seed)
    rep = sum(binomial_allocation(int(nr), r, G, rng)
              for r, nr in enumerate(Ns))
    canon, _ = rep.canonicalize()
    return canon


# ----------------------------------------------------------------------------
# Gates (reference nn.py:59-66, 263-280)
# ----------------------------------------------------------------------------
def gated(ch_rep: Rep) -> Rep:
    """Append one scalar 'gate' channel per non-scalar, non-permutation
    summand (reference nn.py:59-66)."""
    if isinstance(ch_rep, SumRep):
        return ch_rep + sum(Scalar(rep.G) for rep in ch_rep
                            if rep != Scalar and not rep.is_permutation)
    if ch_rep.is_permutation:
        return ch_rep
    return ch_rep + Scalar(ch_rep.G)


def gate_indices(ch_rep: Rep) -> np.ndarray:
    """For each of the rep's ``size()`` channels, the index of its gate
    scalar in the gated rep's layout — the channel itself for scalars and
    permutation reps (→ swish), an appended gate otherwise
    (reference nn.py:263-280)."""
    channels = ch_rep.size()
    if not isinstance(ch_rep, SumRep):
        if ch_rep.is_permutation:
            return np.arange(channels)
        return np.full(channels, channels, dtype=np.int64)
    perm = ch_rep.perm
    indices = np.arange(channels)
    num_nonscalars = 0
    i = 0
    for rep in ch_rep:
        if rep != Scalar and not rep.is_permutation:
            indices[perm[i:i + rep.size()]] = channels + num_nonscalars
            num_nonscalars += 1
        i += rep.size()
    return indices


# ----------------------------------------------------------------------------
# Blockwise weight projection
# ----------------------------------------------------------------------------
def _blockwise_projector(rep_in: Rep, rep_out: Rep):
    """Host-side structure for projecting a dense (nout, nin) kernel onto
    the equivariant subspace of W = rep_out ⊗ rep_in* *blockwise*: the
    canonical weight rep is a SumRep {type_t: mult_t}; each type gets one
    small dense basis Q_t (size_t, r_t), solved once and shared across its
    multiplicity (reference representation.py:466-479 semantics, without
    materializing the (N², r) operator).

    Returns (perm, invperm, blocks) with blocks = [(mult, size, Q or None)]
    in canonical chunk order; Q None marks an all-zero block (no equivariant
    maps of that type)."""
    W_rep = rep_out * rep_in.t()
    if not isinstance(W_rep, SumRep):
        W_rep = SumRep(W_rep)
    canon, perm = W_rep.canonicalize()
    invperm = np.argsort(perm)
    blocks = []
    for rep_t, mult in canon.reps.items():
        Q = rep_t.equivariant_basis()
        blocks.append((mult, rep_t.size(),
                       None if Q.shape[1] == 0 else np.asarray(Q, np.float32)))
    return np.asarray(perm), invperm, blocks


def _project_kernel(kernel_flat, perm, invperm, blocks):
    """Apply the blockwise projection to a flat (nout*nin,) kernel inside
    jit: reorder to canonical, per-type c = Qᵀw then w ← Qc, reorder back."""
    wc = kernel_flat[perm]
    out_chunks = []
    i = 0
    for mult, size, Q in blocks:
        chunk = wc[i:i + mult * size]
        i += mult * size
        if Q is None:
            out_chunks.append(jnp.zeros_like(chunk))
            continue
        Qj = jnp.asarray(Q)
        w_t = chunk.reshape(mult, size)
        coeffs = jnp.matmul(w_t, Qj, precision="highest")
        out_chunks.append(jnp.matmul(coeffs, Qj.T,
                                     precision="highest").reshape(-1))
    return jnp.concatenate(out_chunks)[invperm]


class GeneralEquivLinear(nn.Module):
    """Equivariant linear layer rep_in -> rep_out over general reps
    (reference nn.py:13-36): orthogonal-init kernel and uniform bias,
    projected onto the equivariant subspace every forward."""
    rep_in: Rep
    rep_out: Rep

    @nn.compact
    def __call__(self, x):
        nin, nout = self.rep_in.size(), self.rep_out.size()
        kernel = self.param("kernel", nn.initializers.orthogonal(),
                            (nout, nin))
        bias = self.param("bias",
                          nn.initializers.uniform(scale=1.0 / np.sqrt(nout)),
                          (nout,))
        perm, invperm, blocks = _blockwise_projector(self.rep_in,
                                                     self.rep_out)
        W = _project_kernel(kernel.reshape(-1), jnp.asarray(perm),
                            jnp.asarray(invperm), blocks).reshape(nout, nin)
        Qb = np.asarray(self.rep_out.equivariant_basis(), np.float32)
        if Qb.shape[1]:
            Qbj = jnp.asarray(Qb)
            b = Qbj @ jnp.matmul(Qbj.T, bias, precision="highest")
        else:
            b = jnp.zeros_like(bias)
        return jnp.matmul(x, W.T, precision="highest") + b


class GeneralBiLinear(nn.Module):
    """Bilinear layer built from `rep_algebra.bilinear_weights`
    (reference nn.py:39-56): W(x) assembled from x's own type components,
    out = 0.1 * W(x) x."""
    rep_in: Rep
    rep_out: Rep

    @nn.compact
    def __call__(self, x):
        Wdim, weight_proj = bilinear_weights(self.rep_out, self.rep_in)
        bi_params = self.param("bi_params", nn.initializers.normal(1.0),
                               (max(Wdim, 1),))
        if Wdim == 0:
            return jnp.zeros(x.shape[:-1] + (self.rep_out.size(),), x.dtype)
        W = weight_proj(bi_params, x)
        return 0.1 * jnp.squeeze(
            jnp.matmul(W, x[..., None], precision="highest"), -1)


class GeneralGatedNonlinearity(nn.Module):
    """sigmoid(gate) * value per channel; swish on scalar/permutation
    channels (reference nn.py:69-84)."""
    rep: Rep

    @nn.compact
    def __call__(self, values):
        idx = gate_indices(self.rep)
        gates = values[..., jnp.asarray(idx)]
        return nn.sigmoid(gates) * values[..., :self.rep.size()]


class GeneralEMLPBlock(nn.Module):
    """G-Linear into the gated rep, + BiLinear residual, + gated
    nonlinearity (reference nn.py:87-104)."""
    rep_in: Rep
    rep_out: Rep

    @nn.compact
    def __call__(self, x):
        grep = gated(self.rep_out)
        lin = GeneralEquivLinear(self.rep_in, grep, name="linear")(x)
        preact = GeneralBiLinear(grep, grep, name="bilinear")(lin) + lin
        return GeneralGatedNonlinearity(self.rep_out, name="nonlinearity")(
            preact)


class GeneralEMLP(nn.Module):
    """Equivariant MLP for arbitrary reps/groups (reference nn.py:152-192).

    ``ch`` may be an int (uniform_rep heuristic), a Rep, or a sequence of
    ints/Reps — exactly the reference's hidden-layer parsing."""
    rep_in: Rep
    rep_out: Rep
    group: Group
    ch: Union[int, Rep, Sequence] = 384
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        G = self.group
        rin, rout = self.rep_in(G), self.rep_out(G)
        if isinstance(self.ch, int):
            middle: List[Rep] = self.num_layers * [uniform_rep(self.ch, G)]
        elif isinstance(self.ch, Rep):
            middle = self.num_layers * [self.ch(G)]
        else:
            middle = [c(G) if isinstance(c, Rep) else uniform_rep(c, G)
                      for c in self.ch]
        reps = [rin] + middle
        for i, (ra, rb) in enumerate(zip(reps, reps[1:])):
            x = GeneralEMLPBlock(ra, rb, name=f"block_{i}")(x)
        return GeneralEquivLinear(reps[-1], rout, name="head")(x)
