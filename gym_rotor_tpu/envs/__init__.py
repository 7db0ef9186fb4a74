from . import batch, dynamics, integrals, oracle, params, quad, state, trajectory
from .batch import (BatchedEnvState, BatchedStepOut, Transition,
                    batched_reset, batched_step, rollout)
from .params import QuadParams, nominal, randomize
from .quad import (StepOut, initial_obs, reset, reset_state,
                   set_goal, step)
from .state import EnvState, Goal, pack_state, unpack_state
from .trajectory import TrajState, get_desired, mark_traj_start


def state_from_oracle(cfg, o, dtype=None):
    """Build an EnvState from a NumPy OracleEnv (parity harness: lets the
    oracle's reference-ordered RNG stream drive the JAX env)."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    p = params_from_oracle(o.p, dtype)
    return EnvState(
        x=jnp.asarray(o.x, dtype), v=jnp.asarray(o.v, dtype),
        R=jnp.asarray(o.R, dtype), W=jnp.asarray(o.W, dtype),
        eIx=jnp.asarray(o.eIx, dtype),
        eIx_integrand=jnp.asarray(o.eIx_int, dtype),
        eIb1=jnp.asarray(o.eIb1, dtype),
        eIb1_integrand=jnp.asarray(o.eIb1_int, dtype),
        f_total=jnp.asarray(o.p.m * 9.81, dtype),
        M=jnp.zeros(3, dtype),
        goal=Goal(
            xd=jnp.asarray(o.xd, dtype), vd=jnp.asarray(o.vd, dtype),
            b1d=jnp.asarray(o.b1d, dtype),
            b1d_dot=jnp.asarray(o.b1d_dot, dtype),
            Wd=jnp.asarray(o.Wd, dtype),
        ),
        params=p,
        t=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )


def params_from_oracle(op, dtype):
    from . import params as params_lib

    return params_lib.from_values(
        op.m, op.d, op.J[0], op.J[2], op.c_tf, op.c_tw, dtype
    )


__all__ = [
    "EnvState", "Goal", "QuadParams", "StepOut", "dynamics", "initial_obs",
    "nominal", "oracle", "pack_state", "params", "quad", "randomize",
    "reset", "reset_state", "set_goal", "state", "state_from_oracle", "step",
    "unpack_state",
]
