"""Equivariant network layers (EMLP) as flax modules.

Layer semantics mirror the reference (algos/emlp_torch/nn.py):

* ``EquivLinear``      — nn.py:13-36: an unconstrained (nout, nin) kernel +
  bias projected onto the equivariant subspace on every forward, so the
  optimizer state lives in the full space exactly like the reference.  The
  projection here is *blockwise*: coordinates are permuted into type groups
  and each (type_out, type_in) block is projected through its cached
  orthonormal pair basis — two small einsums per type pair instead of the
  reference's chains of lazy Kron/Perm matvecs (representation.py:429-437).
* ``EquivBiLinear``    — nn.py:39-55 + bilinear_weights
  (representation.py:358-402): data-dependent equivariant weight built from
  learned mixtures of sampled input tensors, output scaled by 0.1.
* ``gated``/``GatedNonlinearity`` — nn.py:58-82: one extra gate scalar per
  non-scalar non-permutation atom; scalars and permutation reps get
  sigmoid(x)*x (SiLU), others sigmoid(gate)*x.
* ``EMLPBlock``/``EMLP`` — nn.py:85-99, 153-193.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .reps import (Atom, Scalar, SumRep, group_by_type, pair_basis,
                   product_type_key, vec_basis)

BILINEAR_SEED = 2024  # fixed rng for the bilinear input sampling


_GATHER_CACHE = {}


def fixed_gather(x, idx, n):
    """``x[..., idx]`` with a scatter-free backward.

    The autodiff transpose of a gather is a scatter-add — the costliest op
    class on TPU (measured: agent-1's Mirror-tower critic BACKWARD was
    2.8x its forward purely from the duplicate-index gathers' transposes,
    scripts/unit_cost_probe.py).  This custom-vjp gather keeps the cheap
    forward and rewrites the backward as:

    * an inverse-permutation gather when ``idx`` permutes 0..n-1 (the
      type-major assembly in EquivBiLinear), or
    * one (J, n) 0/1 matmul otherwise (duplicates sum on the MXU, which is
      exactly what the scatter-add computed serially).

    ``idx``: static numpy int array of source columns; ``n``: source width.
    """
    key = (idx.tobytes(), int(n))
    fn = _GATHER_CACHE.get(key)
    if fn is None:
        idx_c = np.asarray(idx)
        is_perm = (idx_c.size == n
                   and np.array_equal(np.sort(idx_c), np.arange(n)))
        if is_perm:
            inv = np.argsort(idx_c)
        else:
            route = np.zeros((idx_c.size, n), np.float32)
            route[np.arange(idx_c.size), idx_c] = 1.0

        @jax.custom_vjp
        def g(x):
            return x[..., idx_c]

        def g_fwd(x):
            return x[..., idx_c], None

        def g_bwd(_, ct):
            if is_perm:
                return (ct[..., inv],)
            return (ct @ jnp.asarray(route, ct.dtype),)

        g.defvjp(g_fwd, g_bwd)
        fn = _GATHER_CACHE[key] = g
    return fn(x)


def gated(rep: SumRep) -> SumRep:
    """Append one gate scalar per non-scalar, non-permutation atom
    (nn.py:58-65)."""
    gates = [Atom(a.G, 0, 0) for a in rep.atoms
             if not a.is_scalar and not a.is_permutation]
    return SumRep(rep.atoms + gates)


def gate_indices(rep: SumRep) -> np.ndarray:
    """Per-coordinate gate source index into the gated vector
    (nn.py:262-280): non-gated coords point at themselves (=> SiLU)."""
    size = rep.size
    idx = np.arange(size)
    off = 0
    gate_pos = size
    for a in rep.atoms:
        if not a.is_scalar and not a.is_permutation:
            idx[off:off + a.size] = gate_pos
            gate_pos += 1
        off += a.size
    return idx


def _bias_init(nout):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, 0.0,
                                  1.0 / math.sqrt(nout))
    return init


class EquivLinear(nn.Module):
    """Equivariant linear layer rep_in -> rep_out (nn.py:13-36).

    ``project=True`` (default) reproduces the reference exactly: the raw
    kernel is projected onto the equivariant subspace on *every* forward
    (reference nn.py:26-36).  ``project=False`` is the folded fast path: the
    kernel/bias params are assumed already projected (see ``make_fold_fn``);
    the forward is then a plain dense layer.  Folding once per loss/use-site
    and fanning the folded weights out to k forwards is bitwise-identical on
    the forward path and mathematically identical on the backward path
    (P is linear: sum-then-project == project-then-sum up to fp summation
    order), which SURVEY §7.5 prescribes for closing the per-forward
    projection overhead."""
    rep_in: SumRep
    rep_out: SumRep
    project: bool = True

    @nn.compact
    def __call__(self, x):
        nin, nout = self.rep_in.size, self.rep_out.size
        kernel = self.param(
            "kernel",
            lambda k, s: nn.initializers.orthogonal()(k, s, jnp.float32),
            (nout, nin))
        bias = self.param("bias", _bias_init(nout), (nout,))
        if self.project:
            W_eff, b_eff = project_linear(self.rep_in, self.rep_out,
                                          kernel, bias)
        else:
            W_eff, b_eff = kernel, bias
        return x @ W_eff.T + b_eff


_LINEAR_PROJ_CACHE = {}


def linear_projector(rep_in: SumRep, rep_out: SumRep):
    """Dense orthonormal bases (Qw, Qb) of the equivariant weight/bias
    subspaces, assembled on host from the cached per-atom-pair bases.

    Qw: (nout*nin, r) with disjoint block supports, so P = Qw Qwᵀ is the
    exact equivariant projector the reference applies lazily
    (representation.py:121-126); here the projection is two dense matmuls
    on device — MXU-friendly and constant-folded by XLA."""
    ck = (hash(rep_in), hash(rep_out))
    if ck in _LINEAR_PROJ_CACHE:
        return _LINEAR_PROJ_CACHE[ck]
    nin, nout = rep_in.size, rep_out.size
    # 1x1 blocks project to either 0 or themselves (their basis is [+-1]),
    # so they live in a dense pass-through mask instead of Q columns — this
    # keeps Q tiny even for d=1 rank towers like uniform_rep(ch, Mirror(1)).
    mask = np.zeros((nout, nin))
    cols = []
    r_off = 0
    for ao in rep_out.atoms:
        c_off = 0
        for ai in rep_in.atoms:
            B = pair_basis(ao, ai)
            if ao.size == 1 and ai.size == 1:
                if B.shape[1]:
                    mask[r_off, c_off] = 1.0
            else:
                for k in range(B.shape[1]):
                    blk = B[:, k].reshape(ao.size, ai.size)
                    col = np.zeros((nout, nin))
                    col[r_off:r_off + ao.size, c_off:c_off + ai.size] = blk
                    cols.append(col.reshape(-1))
            c_off += ai.size
        r_off += ao.size
    Qw = (np.stack(cols, axis=1) if cols
          else np.zeros((nout * nin, 0)))

    bmask = np.zeros(nout)
    bcols = []
    r_off = 0
    for ao in rep_out.atoms:
        Bv = vec_basis(ao)
        if ao.size == 1:
            if Bv.shape[1]:
                bmask[r_off] = 1.0
        else:
            for k in range(Bv.shape[1]):
                col = np.zeros(nout)
                col[r_off:r_off + ao.size] = Bv[:, k]
                bcols.append(col)
        r_off += ao.size
    Qb = (np.stack(bcols, axis=1) if bcols else np.zeros((nout, 0)))
    out = (Qw.astype(np.float32), Qb.astype(np.float32),
           mask.astype(np.float32), bmask.astype(np.float32))
    _LINEAR_PROJ_CACHE[ck] = out
    return out


def project_linear(rep_in: SumRep, rep_out: SumRep, kernel, bias):
    """Equivariant projection of (kernel, bias):
    W_eff = mask * W + Qw Qwᵀ vec(W)   (disjoint supports)."""
    nout, nin = kernel.shape
    Qw, Qb, mask, bmask = linear_projector(rep_in, rep_out)
    W_eff = jnp.asarray(mask, kernel.dtype) * kernel
    if Qw.shape[1]:
        Qw = jnp.asarray(Qw, kernel.dtype)
        W_eff = W_eff + (Qw @ (Qw.T @ kernel.reshape(-1))).reshape(nout, nin)
    b_eff = jnp.asarray(bmask, bias.dtype) * bias
    if Qb.shape[1]:
        Qb = jnp.asarray(Qb, bias.dtype)
        b_eff = b_eff + Qb @ (Qb.T @ bias)
    return W_eff, b_eff


def _bilinear_struct(rep: SumRep):
    """Static structure of the bilinear layer for in_rep == out_rep == rep.

    The sampled input-mixing indices are drawn ONCE per product type and
    shared by every (type_out, type_in) pair of that type — the reference's
    ``reduced_indices_dict`` (representation.py:374-377; the general engine,
    rep_algebra.py:1099-1102, does the same).  Beyond faithfulness, the
    shared draw is what makes the scalar-tower regime (uniform_rep over d=1
    groups like Mirror(1)) factorizable: with one shared gate coordinate per
    product type, a (type_out, type_in) family is ``gate * (x_in @ W)`` — a
    scalar-gated matmul — instead of a per-slot gather.  Before this the
    flat path materialized (batch, ~9.4k-slot) gather intermediates in the
    MODUL2 critic, which made the whole EMLP train step HBM-bound (measured
    ~24 GB accessed per update, ~38 ms/update on a v5e).

    Four compute regimes, all reading the SAME parameter layout (row-major
    (mult_out, mult_in[, n]) blocks in (type_out, type_in) loop order).
    NOTE: the layout predates this factorization, so pre-change checkpoints
    *load* shape-compatibly but are NOT functionally equivalent — the shared
    per-type index draw changed the sampled gate/sel coordinates vs the old
    interleaved per-pair RNG stream, so loaded pre-change params compute
    different bilinear outputs:

    * ``pairs``  — multi-dimensional product types -> one einsum per pair;
    * ``big``    — scalar-type pairs with mult_out>=2 and mult_in>=2 -> one
      scalar-gated matmul per pair (the 62x62 block of the MODUL2 critic);
    * ``col_groups`` — scalar pairs with mult_in==1, grouped by type_out ->
      one stacked matmul per output type: Z[:, j] = gate_j * x_col_j,
      out += Z @ W_stack;
    * ``row_groups`` — scalar pairs with mult_out==1, mult_in>=2, grouped by
      type_in -> one matmul per input type, gated and scattered to rows;
    * ``s1``     — the residual mult_out==mult_in==1 slots -> flat
      gather/scatter (small once the groups above absorb the wide types).
    """
    tg = group_by_type(rep)
    x_types = {t.key: t for t in tg if t.atom.rank >= 1}
    rng = np.random.default_rng(BILINEAR_SEED)
    # shared per-type reduced indices: n = min(mult, d_tau) samples with
    # replacement, like torch.randint (representation.py:374-378)
    bids = {t.key: rng.integers(0, t.mult, size=min(t.mult, t.atom.size))
            for t in tg if t.atom.rank >= 1}
    pairs = []
    big = []
    col_groups: dict = {}
    row_groups: dict = {}
    s1_ios, s1_cols, s1_sels, s1_pidx = [], [], [], []
    wdim = 0
    tau_io = {t.key: j for j, t in enumerate(tg)}
    for io, to in enumerate(tg):
        for ii, ti in enumerate(tg):
            tau = product_type_key(to.atom, ti.atom)
            if tau not in x_types:
                continue
            xt = x_types[tau]
            d_tau = xt.atom.size
            if to.atom.size == 1 and ti.atom.size == 1 and d_tau == 1:
                # scalar product type: n == 1, one shared gate coordinate
                gate = int(xt.indices[bids[tau][0]])
                mo, mi = to.mult, ti.mult
                off = wdim
                wdim += mo * mi
                if mo >= 2 and mi >= 2:
                    big.append(dict(io=io, ii=ii, off=off, gate=gate))
                elif mo >= 2:  # mi == 1
                    col_groups.setdefault(io, []).append(
                        dict(off=off, col=int(ti.indices[0]), gate=gate))
                elif mi >= 2:  # mo == 1
                    row_groups.setdefault(ii, []).append(
                        dict(off=off, io=io, gate=gate))
                else:
                    s1_ios.append(io)
                    s1_cols.append(int(ti.indices[0]))
                    s1_sels.append(gate)
                    s1_pidx.append(off)
                continue
            n = min(xt.mult, d_tau)
            slots = to.mult * ti.mult
            pairs.append(dict(io=io, ii=ii, tau=tau, tau_io=tau_io[tau],
                              n=n, sel=bids[tau], offset=wdim, slots=slots))
            wdim += slots * n
    s1 = None
    if s1_ios:
        s1 = dict(
            ios=np.asarray(s1_ios), cols=np.asarray(s1_cols),
            sels=np.asarray(s1_sels), pidx=np.asarray(s1_pidx),
        )
    # Type-major assembly map: concatenating per-type output blocks in tg
    # order yields the output up to a static coordinate permutation;
    # out = out_tm[:, pos] where pos[c] = position of coordinate c.
    cat_idx = np.concatenate([t.indices for t in tg])
    pos = np.empty_like(cat_idx)
    pos[cat_idx] = np.arange(cat_idx.size)
    return tg, dict(pairs=pairs, big=big, col_groups=col_groups,
                    row_groups=row_groups, s1=s1, pos=pos), wdim


class EquivBiLinear(nn.Module):
    """Cheap equivariant bilinear layer (nn.py:39-55): W(x) @ x * 0.1."""
    rep: SumRep

    @nn.compact
    def __call__(self, x):
        tg, st, wdim = _bilinear_struct(self.rep)
        if wdim == 0:
            return jnp.zeros_like(x)
        params = self.param(
            "bi_params",
            lambda k, s: nn.initializers.normal(1.0)(k, s, jnp.float32),
            (wdim,))
        bshape = x.shape[:-1]
        xf = x.reshape((-1, x.shape[-1]))
        B = xf.shape[0]
        # Scatter-free assembly: every path adds its contribution to a
        # per-output-type accumulator (plain adds on (B, mult*d) blocks);
        # the output is the type-major concatenation re-ordered by ONE
        # static permutation gather (st["pos"]).  The previous formulation
        # scatter-added each block into the rep-ordered output — on TPU a
        # scatter is far costlier than a gather, and rank-3 scatters under
        # vmap (the stacked twin-critic path, algos/td3.py) are costlier
        # still; measured as the dominant per-update overhead.
        acc = {}

        def add(io, val):
            acc[io] = acc[io] + val if io in acc else val

        nin = xf.shape[-1]
        if st["pairs"]:
            # group x by type
            xg = {t.key: fixed_gather(xf, t.indices, nin)
                  .reshape(B, t.mult, t.atom.size) for t in tg}
            for p in st["pairs"]:
                to, ti = tg[p["io"]], tg[p["ii"]]
                do, mo = to.atom.size, to.mult
                di, mi = ti.atom.size, ti.mult
                x_tau = xg[p["tau"]][:, p["sel"], :]        # (B, n, d_tau)
                w = params[p["offset"]:p["offset"] + p["slots"] * p["n"]]
                w = w.reshape(mo * mi, p["n"])
                blocks = jnp.einsum("kn,bnd->bkd", w, x_tau)
                blocks = blocks.reshape(B, mo, mi, do, di)
                y = jnp.einsum("bomde,bme->bod", blocks, xg[ti.key])
                add(p["io"], y.reshape(B, mo * do))
        for p in st["big"]:
            # scalar-gated matmul: out_to += x_gate * (x_ti @ W^T)
            to, ti = tg[p["io"]], tg[p["ii"]]
            W = params[p["off"]:p["off"] + to.mult * ti.mult]
            W = W.reshape(to.mult, ti.mult)
            add(p["io"],
                (fixed_gather(xf, ti.indices, nin) @ W.T)
                * fixed_gather(xf, np.asarray([p["gate"]]), nin))
        for io, grp in st["col_groups"].items():
            # stacked mult_in==1 pairs: Z[:, j] = gate_j * x_col_j
            to = tg[io]
            cols = np.asarray([g["col"] for g in grp])
            gates = np.asarray([g["gate"] for g in grp])
            Ws = jnp.stack(
                [params[g["off"]:g["off"] + to.mult] for g in grp])  # (J,mo)
            Z = (fixed_gather(xf, gates, nin)
                 * fixed_gather(xf, cols, nin))                      # (B,J)
            add(io, Z @ Ws)
        # row_groups + s1 target size-1 type blocks (one tm coordinate
        # each); their columns are joined and routed by ONE static 0/1
        # matmul instead of per-entry adds (agent-1's Mirror tower has
        # ~1.8k s1 entries — per-entry anything is off the table)
        tm_off = np.concatenate(
            [[0], np.cumsum([t.mult * t.atom.size for t in tg])])
        small_cols, small_coords = [], []
        for ii, grp in st["row_groups"].items():
            # stacked mult_out==1 pairs: Y[:, j] = gate_j * (x_ti . w_j)
            ti = tg[ii]
            gates = np.asarray([g["gate"] for g in grp])
            Wr = jnp.stack(
                [params[g["off"]:g["off"] + ti.mult] for g in grp],
                axis=1)                                              # (mi,J)
            Y = (fixed_gather(xf, ti.indices, nin) @ Wr) \
                * fixed_gather(xf, gates, nin)                       # (B,J)
            small_cols.append(Y)
            small_coords.append(np.asarray([tm_off[g["io"]] for g in grp]))
        s1 = st["s1"]
        if s1 is not None:
            w1 = params[s1["pidx"]]                            # (P,)
            contrib = (w1 * fixed_gather(xf, s1["sels"], nin)
                       * fixed_gather(xf, s1["cols"], nin))
            small_cols.append(contrib)
            small_coords.append(tm_off[s1["ios"]])
        out_tm = jnp.concatenate(
            [acc[io] if io in acc
             else jnp.zeros((B, t.mult * t.atom.size), xf.dtype)
             for io, t in enumerate(tg)], axis=-1)
        if small_cols:
            Yall = jnp.concatenate(small_cols, axis=-1)       # (B, Jtot)
            coords = np.concatenate(small_coords)
            route = np.zeros((coords.size, int(tm_off[-1])), np.float32)
            route[np.arange(coords.size), coords] = 1.0
            out_tm = out_tm + Yall @ jnp.asarray(route, xf.dtype)
        out = fixed_gather(out_tm, st["pos"], out_tm.shape[-1])
        return (0.1 * out).reshape(bshape + (x.shape[-1],))


class GatedNonlinearity(nn.Module):
    """Gated nonlinearity (nn.py:69-82)."""
    rep: SumRep

    def __call__(self, values):
        idx = gate_indices(self.rep)
        gate_scalars = fixed_gather(values, idx, values.shape[-1])
        return jax.nn.sigmoid(gate_scalars) * values[..., :self.rep.size]


class EMLPBlock(nn.Module):
    """G-Linear -> (+ BiLinear) -> gated nonlinearity (nn.py:85-99)."""
    rep_in: SumRep
    rep_out: SumRep
    project: bool = True

    @nn.compact
    def __call__(self, x):
        grep = gated(self.rep_out)
        lin = EquivLinear(self.rep_in, grep, name="linear",
                          project=self.project)(x)
        preact = EquivBiLinear(grep, name="bilinear")(lin) + lin
        return GatedNonlinearity(self.rep_out, name="nonlinearity")(preact)


class EMLP(nn.Module):
    """Equivariant MLP: EMLPBlocks + final EquivLinear (nn.py:153-193).

    ``reps`` = [rep_in, hidden..., ]; output layer maps hidden[-1]->rep_out.
    """
    reps: Tuple[SumRep, ...]
    rep_out: SumRep
    project: bool = True

    @nn.compact
    def __call__(self, x):
        for i, (rin, rout) in enumerate(zip(self.reps, self.reps[1:])):
            x = EMLPBlock(rin, rout, name=f"block{i}",
                          project=self.project)(x)
        return EquivLinear(self.reps[-1], self.rep_out, name="head",
                           project=self.project)(x)


# ----------------------------------------------------------------------------
# Projection folding (SURVEY §7.5): fold W -> P(W) once per use-site instead
# of on every forward.
# ----------------------------------------------------------------------------
def collect_linear_specs(module_def, *sample_args, method=None):
    """Record every EquivLinear in ``module_def`` as (params-path, rep_in,
    rep_out) by abstractly tracing ``init`` under a flax method interceptor.
    Host-side, no FLOPs (eval_shape), no backend init."""
    specs = []

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (isinstance(m, EquivLinear)
                and context.method_name == "__call__"
                and not any(m.path == p for p, _, _ in specs)):
            specs.append((m.path, m.rep_in, m.rep_out))
        return next_fun(*args, **kwargs)

    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    with nn.intercept_methods(interceptor):
        if method is None:
            jax.eval_shape(module_def.init, key, *sample_args)
        else:
            jax.eval_shape(
                lambda k, *a: module_def.init(k, *a, method=method),
                key, *sample_args)
    return specs


def _update_path(tree, path, fn):
    if not path:
        return fn(tree)
    new = dict(tree)
    new[path[0]] = _update_path(tree[path[0]], path[1:], fn)
    return new


def make_fold_fn(module_def, *sample_args):
    """Build ``fold(params) -> params`` replacing every EquivLinear's raw
    (kernel, bias) with its equivariant projection.  Applying the folded
    params through the ``project=False`` twin of ``module_def`` is bitwise
    identical to applying the raw params through the projecting module (both
    compute x @ W_eff.T + b_eff with the same W_eff).  Pure and jittable;
    differentiate through it to keep the reference's full-space optimizer
    semantics (reference nn.py:26-36: optimizer state lives in the
    unprojected space)."""
    specs = collect_linear_specs(module_def, *sample_args)

    def fold(params):
        wrapped = isinstance(params, dict) and "params" in params
        tree = params["params"] if wrapped else params
        for path, rin, rout in specs:
            def proj(leaf, rin=rin, rout=rout):
                W, b = project_linear(rin, rout, leaf["kernel"], leaf["bias"])
                out = dict(leaf)
                out["kernel"] = W
                out["bias"] = b
                return out
            tree = _update_path(tree, path, proj)
        return {**params, "params": tree} if wrapped else tree

    return fold


def fast_twin(module_def):
    """The ``project=False`` twin of an EMLP-family module definition."""
    return module_def.clone(project=False)


def spectral_weights(params) -> Tuple[List, List]:
    """Raw weight matrices + bilinear params for spectral-norm
    regularization, matching the reference's traversal (EMLPBlock.linear
    weight + bilinear bi_params, final Linear weight —
    spectral_norm_regularization.py:39-45)."""
    ws, extras = [], []

    def visit(tree):
        if not isinstance(tree, dict):
            return
        for k in sorted(tree.keys()):
            v = tree[k]
            if k == "log_std_linear":
                # plain Dense head outside the equivariant network — the
                # reference regularizes only self.network
                # (sac_emlp.py:63, spectral_norm_regularization.py:39-45)
                continue
            if k == "kernel":
                ws.append(v)
            elif k == "bi_params":
                extras.append(v)
            elif isinstance(v, dict):
                visit(v)

    visit(params["params"] if "params" in params else params)
    return ws, extras
