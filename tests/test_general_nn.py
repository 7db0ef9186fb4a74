"""Tests for the general EMLP built on the rep algebra
(`models/emlp/general_nn`): channel allocation, gates, and end-to-end
equivariance of the full network over several groups — the capability-layer
mirror of reference algos/emlp_torch/nn.py:13-192."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.models.emlp import general_nn as gnn
from gym_rotor_tpu.models.emlp import groups as G
from gym_rotor_tpu.models.emlp.rep_algebra import Scalar, T, V


@pytest.mark.parametrize("ch", [24, 96, 384])
def test_uniform_rep_size(ch):
    rep = gnn.uniform_rep(ch, G.SO(3))
    assert rep.size() == ch


def test_uniform_rep_deterministic():
    a = gnn.uniform_rep(100, G.SO(3))
    b = gnn.uniform_rep(100, G.SO(3))
    assert repr(a) == repr(b) and a.size() == b.size() == 100


def test_gated_and_gate_indices():
    Grp = G.SO(3)
    rep = (2 * V + 3 * Scalar)(Grp)
    grep = gnn.gated(rep)
    # two vector summands -> two gate scalars appended
    assert grep.size() == rep.size() + 2
    idx = gnn.gate_indices(rep)
    assert idx.shape == (rep.size(),)
    # scalar channels gate themselves (swish); vector channels share a gate
    scal = [i for i in range(rep.size()) if idx[i] == i]
    assert len(scal) == 3
    gates = sorted(set(idx[i] for i in range(rep.size())) - set(scal))
    assert gates == [rep.size(), rep.size() + 1]


def test_gate_indices_permutation_group():
    """Regular (permutation) reps gate themselves — no extra scalars."""
    rep = (1 * V)(G.S(4))
    assert gnn.gated(rep).size() == rep.size()
    assert (gnn.gate_indices(rep) == np.arange(4)).all()


def _network_equivariance(model, params, rep_in_b, rep_out_b, x):
    y = model.apply(params, x)
    g = rep_in_b.G.sample()
    rho_in = jnp.asarray(rep_in_b.rho(g), jnp.float32)
    rho_out = jnp.asarray(rep_out_b.rho(g), jnp.float32)
    y_g = model.apply(params, x @ rho_in.T)
    return float(jnp.abs(y_g - y @ rho_out.T).max()
                 / (jnp.abs(y).max() + 1e-8))


def test_equiv_linear_equivariance():
    Grp = G.O(3)
    rin, rout = (2 * V + Scalar)(Grp), (V + 2 * Scalar)(Grp)
    layer = gnn.GeneralEquivLinear(rin, rout)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, rin.size())),
                    jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    assert _network_equivariance(layer, params, rin, rout, x) < 1e-5


@pytest.mark.parametrize("grp,din", [(G.SO(3), 3), (G.S(4), 4),
                                     (G.Mirror(2), 2)])
def test_general_emlp_equivariance(grp, din):
    """A random-init GeneralEMLP V->V is equivariant end to end (gates,
    bilinear residual, head) for continuous, permutation and reflection
    groups."""
    model = gnn.GeneralEMLP(rep_in=V, rep_out=V, group=grp, ch=24,
                            num_layers=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, din)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    rin, rout = (1 * V)(grp), (1 * V)(grp)
    assert _network_equivariance(model, params, rin, rout, x) < 1e-4


def test_general_emlp_ch_parsing():
    """ch as an int, a Rep, or a mixed list — reference nn.py:170-178."""
    Grp = G.SO(3)
    hidden = (4 * V + 6 * Scalar)
    for ch in [20, hidden, [20, hidden]]:
        model = gnn.GeneralEMLP(rep_in=V, rep_out=T(0), group=Grp, ch=ch,
                                num_layers=2)
        x = jnp.ones((2, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 1)


def test_invariant_output():
    """V -> Scalar network output is exactly invariant."""
    Grp = G.SO(3)
    model = gnn.GeneralEMLP(rep_in=V, rep_out=T(0), group=Grp, ch=16,
                            num_layers=1)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x)
    y = model.apply(params, x)
    g = Grp.sample()
    yg = model.apply(params, x @ jnp.asarray(g, jnp.float32).T)
    assert float(jnp.abs(yg - y).max() / (jnp.abs(y).max() + 1e-8)) < 1e-5
