"""Equivariance engine tests (SURVEY.md §4: equivariance error < 1e-5 under
sampled group elements, mirroring the reference's equivariance_error
semantics, reps/utils.py:240-251)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.models.emlp import groups as G
from gym_rotor_tpu.models.emlp import nn as enn
from gym_rotor_tpu.models.emlp import reps as R
from gym_rotor_tpu.models.emlp import zoo
from gym_rotor_tpu.utils.config import Config

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------- groups
def test_group_flags():
    so2 = G.SO2eR3()
    assert so2.is_orthogonal and not so2.is_permutation
    m = G.Mirror(1)
    assert m.is_orthogonal and not m.is_permutation
    t = G.Trivial(3)
    assert t.is_orthogonal and t.is_permutation
    s = G.S(4)
    assert s.is_permutation
    assert G.SO2eR3() == G.SO2eR3()
    assert G.Trivial(1) != G.Trivial(3)


def test_group_samples_are_valid():
    for grp in [G.SO(3), G.O(2), G.SO2eR3(), G.Mirror(2), G.C(5), G.D(4),
                G.Z(4), G.S(4), G.Sp(2), G.SO13p(), G.SO11p()]:
        gs = grp.samples(4, np.random.default_rng(1))
        assert gs.shape == (4, grp.d, grp.d)
        assert np.isfinite(gs).all()
    # orthogonal groups produce orthogonal samples
    for grp in [G.SO(3), G.SO2eR3(), G.D(4), G.S(5)]:
        for g in grp.samples(4, np.random.default_rng(2)):
            np.testing.assert_allclose(g.T @ g, np.eye(grp.d), atol=1e-9)


def test_direct_product():
    dp = G.DirectProduct(G.SO(2), G.Trivial(2))
    assert dp.d == 4
    assert len(dp.lie_algebra) == 1


# ---------------------------------------------------------------- reps
def test_uniform_rep_allocations():
    so2 = G.SO2eR3()
    r16 = R.uniform_rep(16, so2)
    ranks = [a.rank for a in r16.atoms]
    assert ranks.count(0) == 10 and ranks.count(1) == 2  # 10 + 2*3 = 16
    assert r16.size == 16
    r62 = R.uniform_rep(62, so2)
    ranks = [a.rank for a in r62.atoms]
    assert ranks.count(0) == 23 and ranks.count(1) == 7 and ranks.count(2) == 2
    assert r62.size == 62
    r4m = R.uniform_rep(4, G.Mirror(1))
    assert [a.rank for a in r4m.atoms] == [0, 1, 2, 3]
    assert r4m.size == 4


@pytest.mark.parametrize("case,expected_dim", [
    (("V_so2", "V_so2"), 3),     # commutant of z-rotations: I_xy, J_xy, e33
    (("V_so2", "S"), 1),         # only e3 direction survives
    (("S", "V_so2"), 1),
    (("V_m", "V_m"), 1),         # sign * sign = invariant
    (("V_m", "S"), 0),           # odd map must vanish
    (("V_t3", "V_so2"), 3),      # columns 1,2 killed, col 3 free: a (x) e3^T
    (("S", "S"), 1),
])
def test_pair_basis_dims(case, expected_dim):
    so2, m, t3, t1 = G.SO2eR3(), G.Mirror(1), G.Trivial(3), G.Trivial(1)
    atoms = {
        "V_so2": R.Atom(so2, 1), "V_m": R.Atom(m, 1),
        "V_t3": R.Atom(t3, 1), "S": R.Atom(t1, 0),
    }
    B = R.pair_basis(atoms[case[0]], atoms[case[1]])
    assert B.shape[1] == expected_dim


def test_pair_basis_equivariance():
    """Every basis element must satisfy rho_out(g) W = W rho_in(g)."""
    so2 = G.SO2eR3()
    for (ao, ai) in [(R.Atom(so2, 1), R.Atom(so2, 1)),
                     (R.Atom(so2, 2), R.Atom(so2, 1)),
                     (R.Atom(so2, 2), R.Atom(so2, 2))]:
        B = R.pair_basis(ao, ai)
        assert B.shape[1] > 0
        for g in so2.samples(5, RNG):
            ro, ri = ao.rho(g), ai.rho(g)
            for k in range(B.shape[1]):
                W = B[:, k].reshape(ao.size, ai.size)
                np.testing.assert_allclose(ro @ W, W @ ri, atol=1e-8)


# ---------------------------------------------------------------- layers
def _equivariance_error(rep_in, rep_out, fn, groups_involved, n=5):
    x = jnp.asarray(RNG.normal(size=(3, rep_in.size)), jnp.float32)
    y = fn(x)
    err = 0.0
    for grp in groups_involved:
        for g in grp.samples(n, RNG):
            rho_in = rep_in.rho_dense({grp: g})
            rho_out = rep_out.rho_dense({grp: g})
            y_g = fn(x @ jnp.asarray(rho_in.T, jnp.float32))
            err = max(err, float(jnp.abs(
                y_g - y @ jnp.asarray(rho_out.T, jnp.float32)).max()))
    return err


def test_equiv_linear_equivariance():
    so2, t1, t3 = G.SO2eR3(), G.Trivial(1), G.Trivial(3)
    rep_in = R.Vector(so2) * 2 + R.Scalar(t1) + R.Vector(t3)
    rep_out = R.uniform_rep(16, so2)
    layer = enn.EquivLinear(rep_in, rep_out)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((1, rep_in.size)))
    err = _equivariance_error(rep_in, rep_out,
                              lambda x: layer.apply(params, x), [so2])
    assert err < 1e-5


def test_emlp_block_equivariance():
    so2 = G.SO2eR3()
    rep_in = R.Vector(so2) * 3 + R.Scalar(G.Trivial(1))
    rep_out = R.uniform_rep(16, so2)
    block = enn.EMLPBlock(rep_in, rep_out)
    params = block.init(jax.random.PRNGKey(1), jnp.zeros((1, rep_in.size)))
    err = _equivariance_error(rep_in, rep_out,
                              lambda x: block.apply(params, x), [so2])
    assert err < 1e-5


@pytest.mark.parametrize("framework,agent_id", [
    ("MONO", 0), ("MODUL", 0), ("MODUL", 1),
])
def test_emlp_actor_core_equivariance(framework, agent_id):
    """Pre-tanh actor networks are exactly equivariant."""
    cfg = Config(framework=framework)
    rep_in, hidden, rep_out = zoo.actor_reps(cfg, framework, agent_id)
    net = enn.EMLP((rep_in, hidden, hidden), rep_out)
    params = net.init(jax.random.PRNGKey(2), jnp.zeros((1, rep_in.size)))
    gs = ({a.G for a in rep_in.atoms} | {a.G for a in rep_out.atoms})
    err = _equivariance_error(rep_in, rep_out,
                              lambda x: net.apply(params, x), list(gs))
    assert err < 1e-5, f"equivariance error {err}"


def test_mirror_hidden_equivariance():
    m = G.Mirror(1)
    rep_in = R.Vector(m) * 3
    rep_out = R.Vector(m)
    net = enn.EMLP((rep_in, R.uniform_rep(4, m), R.uniform_rep(4, m)), rep_out)
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 3)))
    x = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
    y = net.apply(params, x)
    y_neg = net.apply(params, -x)
    np.testing.assert_allclose(np.asarray(y_neg), -np.asarray(y), atol=1e-5)


# ---------------------------------------------------------------- zoo
@pytest.mark.parametrize("framework,training", [
    ("MONO", "DTDE"), ("MODUL", "CTDE"),
])  # MODUL-DTDE models are exercised by test_td3_emlp_training_step
def test_all_emlp_model_defs_build_and_run(framework, training):
    cfg = Config(framework=framework, module_training=training,
                 use_equiv=True)
    for algo_models in (zoo.td3_models, zoo.sac_models, zoo.ppo_models):
        for i in range(cfg.n_agents):
            defs = algo_models(cfg, i)
            obs = jnp.zeros((2, cfg.obs_dim_n[i]), jnp.float32)
            act = jnp.zeros((2, cfg.action_dim_n[i]), jnp.float32)
            ap = defs.actor_def.init(jax.random.PRNGKey(0), obs)
            out = defs.actor_def.apply(ap, obs)
            if algo_models is zoo.td3_models:
                assert out.shape == (2, cfg.action_dim_n[i])
                assert float(jnp.abs(out).max()) <= 1.0
            else:
                mean, log_std = out
                assert mean.shape == (2, cfg.action_dim_n[i])
            # critics
            if algo_models is zoo.ppo_models:
                cdim = (sum(cfg.obs_dim_n)
                        if training == "CTDE" and framework == "MODUL"
                        else cfg.obs_dim_n[i])
                cobs = jnp.zeros((2, cdim), jnp.float32)
                cp = defs.critic_def.init(jax.random.PRNGKey(1), cobs)
                v = defs.critic_def.apply(cp, cobs)
                assert v.shape == (2, 1)
            else:
                if training == "CTDE" and framework == "MODUL":
                    cobs = jnp.zeros((2, sum(cfg.obs_dim_n)), jnp.float32)
                    cact = jnp.zeros((2, sum(cfg.action_dim_n)), jnp.float32)
                else:
                    cobs, cact = obs, act
                cp = defs.critic_def.init(jax.random.PRNGKey(1), cobs, cact)
                q1, q2 = defs.critic_def.apply(cp, cobs, cact)
                assert q1.shape == (2, 1) and q2.shape == (2, 1)
            # spectral extraction works
            ws, extras = defs.actor_spectral(ap)
            assert len(ws) >= 2


def test_td3_emlp_training_step():
    """TD3 with equivariant models: one full jitted update runs."""
    from gym_rotor_tpu.algos import td3 as td3_lib
    from gym_rotor_tpu.algos.replay import Batch

    cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=True)
    agents = [td3_lib.TD3Agent(cfg, i, zoo.td3_models(cfg, i))
              for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    n = 16
    rng = np.random.default_rng(3)
    batch = Batch(
        obs=tuple(jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
                  for d in cfg.obs_dim_n),
        act=tuple(jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
                  for d in cfg.action_dim_n),
        rwd=tuple(jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32)
                  for _ in range(2)),
        next_obs=tuple(jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
                       for d in cfg.obs_dim_n),
        done=tuple(jnp.zeros((n, 1), jnp.float32) for _ in range(2)),
    )
    step = jax.jit(lambda st, b, k: td3_lib.train_step(cfg, agents, st, b, k))
    for it in range(3):
        states, metrics = step(states, batch, jax.random.PRNGKey(it))
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["agent1/critic_loss"]))


# ---------------------------------------------------------------- interface
def test_batched_gram_schmidt_orthonormal():
    from gym_rotor_tpu.models.emlp.interface import batched_gram_schmidt

    rng = np.random.default_rng(0)
    bvv = jnp.asarray(rng.normal(size=(5, 3, 3)), jnp.float32)
    q = batched_gram_schmidt(bvv)
    qtq = jnp.einsum("bik,bil->bkl", q, q)
    np.testing.assert_allclose(np.asarray(qtq),
                               np.broadcast_to(np.eye(3), (5, 3, 3)),
                               atol=1e-5)


def test_group_augmentation_of_equivariant_fn_is_exact():
    """Symmetrizing an already-equivariant map must not change it."""
    from gym_rotor_tpu.models.emlp.interface import group_augmentation

    so2 = G.SO2eR3()
    rep = R.Vector(so2)
    # rotation about z commutes with any diag(a, a, b) linear map
    W = jnp.asarray(np.diag([2.0, 2.0, 5.0]), jnp.float32)
    fn = lambda x: x @ W.T
    x = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
    y = group_augmentation(fn, rep, rep, so2, x, n_samples=3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(fn(x)), atol=1e-5)


def test_interface_module_runs():
    from gym_rotor_tpu.models.emlp.interface import Interface

    grp = G.O(3)
    rep = R.Vector(grp) * 2
    model = lambda x: x  # identity over the rep
    iface = Interface(model=model, rep_in=rep, rep_out=rep, group=grp,
                      io_ch=24)
    x = jnp.asarray(RNG.normal(size=(3, 6)), jnp.float32)
    params = iface.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    y = iface.apply(params, x, jax.random.PRNGKey(2))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_extended_group_zoo():
    """Cube/RubiksCube permutation groups, complex U/SU, GCNN semidirect."""
    c = G.Cube()
    assert c.is_permutation and c.d == 6
    r = G.RubiksCube()
    assert r.is_permutation and r.d == 48
    for h in r.discrete_generators:
        np.testing.assert_allclose(np.linalg.matrix_power(h, 4), np.eye(48))
    u = G.U(2)
    for A in u.lie_algebra:
        np.testing.assert_allclose(A + A.conj().T, 0, atol=1e-12)
    su = G.SU(3)
    assert len(su.lie_algebra) == 8  # dim su(3)
    z = G.ZksZnxZn(4, 3)
    assert z.d == 36 and z.is_permutation
    # complex constraint solve: U(1) fundamental has no invariant vectors
    assert R.vec_basis(R.Atom(G.U(1), 1)).shape[1] == 0


def test_sac_emlp_training_step():
    """SAC with equivariant models: one jitted update runs (MONO)."""
    from gym_rotor_tpu.algos import sac as sac_lib
    from gym_rotor_tpu.algos.replay import Batch

    cfg = Config(framework="MONO", use_equiv=True)
    agents = [sac_lib.SACAgent(cfg, 0, zoo.sac_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    n = 8
    rng = np.random.default_rng(4)
    batch = Batch(
        obs=(jnp.asarray(rng.normal(size=(n, 23)), jnp.float32),),
        act=(jnp.asarray(rng.uniform(-1, 1, (n, 4)), jnp.float32),),
        rwd=(jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32),),
        next_obs=(jnp.asarray(rng.normal(size=(n, 23)), jnp.float32),),
        done=(jnp.zeros((n, 1), jnp.float32),),
    )
    step = jax.jit(lambda st, b, k: sac_lib.train_step(cfg, agents, st, b, k))
    states, metrics = step(states, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["agent0/actor_loss"]))


def test_ppo_emlp_training_step():
    """PPO with equivariant models: one jitted K-epoch update runs (MONO,
    tiny horizon)."""
    from gym_rotor_tpu.algos import ppo as ppo_lib

    cfg = Config(framework="MONO", use_equiv=True, T_horizon=32, K_epochs=1,
                 actor_batch_size=16, critic_batch_size=16)
    agents = [ppo_lib.PPOAgent(cfg, 0, zoo.ppo_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    T = cfg.T_horizon
    rng = np.random.default_rng(5)
    data = ppo_lib.Horizon(
        obs=(jnp.asarray(rng.normal(size=(T, 23)), jnp.float32),),
        act=(jnp.asarray(rng.uniform(-1, 1, (T, 4)), jnp.float32),),
        rwd=(jnp.asarray(rng.uniform(0, 1, (T, 1)), jnp.float32),),
        next_obs=(jnp.asarray(rng.normal(size=(T, 23)), jnp.float32),),
        done=(jnp.zeros((T, 1), jnp.float32),),
        logprob=(jnp.asarray(rng.normal(size=(T, 4)) * 0.1, jnp.float32),),
    )
    step = jax.jit(lambda st, d, k: ppo_lib.train_step(cfg, agents, st, d, k))
    states, metrics = step(states, data, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["agent0/actor_loss"]))
    assert np.isfinite(float(metrics["agent0/critic_loss"]))


# ---------------------------------------------------------------- diagnostics
def test_diagnostics_equivariance_error():
    """User-facing equivariance_error (reps/utils.py:240-251): ~0 for a
    projected matrix, large for a random one."""
    from gym_rotor_tpu.models.emlp import diagnostics as diag

    so2 = G.SO2eR3()
    rep_in = R.SumRep([R.Atom(so2, 1)] * 3)
    rep_out = R.SumRep([R.Atom(so2, 1)] * 2 + [R.Atom(so2, 0)])
    rng = np.random.default_rng(3)
    W = rng.standard_normal((rep_out.size, rep_in.size)).astype(np.float32)
    project, r = diag.equivariant_projection(rep_in, rep_out)
    W_eq = np.asarray(project(W.reshape(-1))).reshape(W.shape)
    assert diag.equivariance_error(W_eq, rep_in, rep_out) < 1e-5
    assert diag.equivariance_error(W, rep_in, rep_out) > 1e-2

    # basis form (nout*nin, r) is accepted too
    Q = diag.equivariant_basis(rep_in, rep_out)
    assert Q.shape == (rep_out.size * rep_in.size, r)
    np.testing.assert_allclose(Q.T @ Q, np.eye(r), atol=1e-5)
    assert diag.equivariance_error(Q, rep_in, rep_out) < 1e-5


def test_diagnostics_sparsify_and_vis(tmp_path):
    from gym_rotor_tpu.models.emlp import diagnostics as diag

    m = G.Mirror(1)
    rep = R.SumRep([R.Atom(m, 1)] * 2 + [R.Atom(m, 0)] * 2)
    Q = diag.equivariant_basis(rep, rep)
    Qs = diag.sparsify_basis(Q, iters=600)
    assert Qs.shape == Q.shape
    # snapped to {-1, 0, 1}
    assert np.all(np.isin(np.round(Qs, 6), [-1.0, 0.0, 1.0]))
    # each sparsified column is still an equivariant map
    assert diag.equivariance_error(Qs, rep, rep) < 1e-5

    img = diag.vis(rep, rep, path=str(tmp_path / "basis.png"))
    assert img.shape == (rep.size, rep.size)
    assert (tmp_path / "basis.png").exists()


def test_generic_mlp_and_standardize():
    from gym_rotor_tpu.models.emlp import diagnostics as diag

    so2 = G.SO2eR3()
    rep_in = R.SumRep([R.Atom(so2, 1)] * 2)
    rep_out = R.SumRep([R.Atom(so2, 1)])
    m = diag.MLP(rep_in=rep_in, rep_out=rep_out, ch=32, num_layers=2)
    x = jnp.ones((4, rep_in.size))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (4, rep_out.size)

    wrapped = diag.standardize(m.apply, (1.0, 2.0, 0.5, 3.0))
    y2 = wrapped(params, x)
    np.testing.assert_allclose(
        np.asarray(y2),
        3.0 * np.asarray(m.apply(params, (x - 1.0) / 2.0)) + 0.5, atol=1e-6)


def test_fixed_gather_vjp_matches_native_autodiff():
    """EquivBiLinear's scatter-free gather (enn.fixed_gather) must be a
    gradient-exact replacement for plain advanced indexing in all three
    backward regimes: inverse-permutation, duplicate-index 0/1-matmul, and
    single-column.  (The duplicate case sums cotangents in a different —
    matmul — order, hence the loose f32 tolerance.)"""
    rng = np.random.default_rng(0)
    cases = [
        ("perm", rng.permutation(16)),
        ("dups", rng.integers(0, 16, size=40)),
        ("one", np.asarray([7])),
    ]
    x = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    for name, idx in cases:
        w = jnp.arange(1.0, idx.size + 1)

        def f_fixed(x):
            return (enn.fixed_gather(x, idx, 16) ** 2 * w).sum()

        def f_plain(x):
            return ((x[..., idx]) ** 2 * w).sum()

        np.testing.assert_allclose(float(f_fixed(x)), float(f_plain(x)),
                                   rtol=1e-6, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(jax.grad(f_fixed)(x)), np.asarray(jax.grad(f_plain)(x)),
            atol=1e-4, err_msg=name)
