"""Quadrotor physical parameters as a JAX pytree.

Nominal values and the uniform-domain-randomization (UDM) scheme replicate
reference gym_rotor/envs/quad.py:27-57 and :359-406.  Unlike the reference —
which mutates instance attributes on every reset — parameters here are an
immutable pytree carried inside the env state, so per-env randomized params
batch naturally under vmap (SURVEY.md §7 "auto-reset semantics").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

G_STD = 9.81            # standard gravity (quad.py:33)
M_NOMINAL = 2.15        # mass [kg] (quad.py:28)
D_NOMINAL = 0.23        # arm length [m] (quad.py:29)
J_NOMINAL = (0.022, 0.022, 0.035)   # inertia diag [kg m^2] (quad.py:30)
C_TF_NOMINAL = 0.0135   # torque-to-thrust coefficient (quad.py:31)
C_TW_NOMINAL = 2.2      # thrust-to-weight coefficient (quad.py:32)
MIN_FORCE = 0.5         # minimum per-motor thrust [N] (quad.py:39)


@struct.dataclass
class QuadParams:
    """Physical parameters + derived force/mixing quantities (all jnp scalars
    or small arrays; supports leading batch dims)."""
    m: jnp.ndarray          # mass [kg]
    d: jnp.ndarray          # arm length [m]
    J: jnp.ndarray          # (..., 3) inertia diagonal
    c_tf: jnp.ndarray       # torque-to-thrust coefficient
    c_tw: jnp.ndarray       # thrust-to-weight coefficient
    # Derived (quad.py:389-404):
    hover_force: jnp.ndarray    # m g / 4
    min_force: jnp.ndarray      # 0.5
    max_force: jnp.ndarray      # c_tw * hover_force
    avrg_act: jnp.ndarray       # (min + max)/2
    scale_act: jnp.ndarray      # max - avrg
    forces_to_fM: jnp.ndarray   # (..., 4, 4) motor forces -> (f, M)
    fM_to_forces: jnp.ndarray   # (..., 4, 4) inverse mixing


def _derive(m, d, J, c_tf, c_tw, dtype):
    """Derived force limits and mixing matrices (quad.py:389-404)."""
    hover_force = m * G_STD / 4.0
    min_force = jnp.full_like(m, MIN_FORCE)
    max_force = c_tw * hover_force
    avrg_act = (min_force + max_force) / 2.0
    scale_act = max_force - avrg_act
    z = jnp.zeros_like(d)
    o = jnp.ones_like(d)
    forces_to_fM = jnp.stack(
        [
            jnp.stack([o, o, o, o], axis=-1),
            jnp.stack([z, -d, z, d], axis=-1),
            jnp.stack([d, z, -d, z], axis=-1),
            jnp.stack([-c_tf, c_tf, -c_tf, c_tf], axis=-1),
        ],
        axis=-2,
    ).astype(dtype)
    # Closed-form inverse of the plus-configuration mixing matrix (avoids a
    # batched LU on TPU):  f_i = f/4 ± M1/(2d) ± M2/(2d) ± M3/(4 c_tf).
    q = 0.25 * o
    hd = 1.0 / (2.0 * d)
    qc = 1.0 / (4.0 * c_tf)
    fM_to_forces = jnp.stack(
        [
            jnp.stack([q, z, hd, -qc], axis=-1),
            jnp.stack([q, -hd, z, qc], axis=-1),
            jnp.stack([q, z, -hd, -qc], axis=-1),
            jnp.stack([q, hd, z, qc], axis=-1),
        ],
        axis=-2,
    ).astype(dtype)
    return QuadParams(
        m=m, d=d, J=J, c_tf=c_tf, c_tw=c_tw,
        hover_force=hover_force, min_force=min_force, max_force=max_force,
        avrg_act=avrg_act, scale_act=scale_act,
        forces_to_fM=forces_to_fM, fM_to_forces=fM_to_forces,
    )


def nominal(dtype=jnp.float32) -> QuadParams:
    """Nominal (eval / no-UDM) parameters (quad.py:361-366)."""
    m = jnp.asarray(M_NOMINAL, dtype)
    d = jnp.asarray(D_NOMINAL, dtype)
    J = jnp.asarray(J_NOMINAL, dtype)
    c_tf = jnp.asarray(C_TF_NOMINAL, dtype)
    c_tw = jnp.asarray(C_TW_NOMINAL, dtype)
    return _derive(m, d, J, c_tf, c_tw, dtype)


def randomize(key: jax.Array, udm_percentage: float = 10.0,
              dtype=jnp.float32) -> QuadParams:
    """Uniform domain randomization around nominal (quad.py:368-387):
    m, d, J1(=J2), J3, c_tf ~ U(±p%), c_tw ~ U(±p/2 %).

    Draw order (m, d, J1, J3, c_tf, c_tw) matches the reference so an oracle
    driven by a shared uniform stream reproduces it; here each value gets an
    independent PRNG split.
    """
    u = udm_percentage / 100.0
    nom = jnp.asarray(
        [M_NOMINAL, D_NOMINAL, J_NOMINAL[0], J_NOMINAL[2],
         C_TF_NOMINAL, C_TW_NOMINAL], dtype)
    frac = jnp.asarray([u, u, u, u, u, u / 2.0], dtype)
    z = jax.random.uniform(key, (6,), dtype, -1.0, 1.0)
    vals = nom + nom * frac * z
    m, d, J1, J3, c_tf, c_tw = (vals[i] for i in range(6))
    J = jnp.stack([J1, J1, J3], axis=-1)
    return _derive(m, d, J, c_tf, c_tw, dtype)


def from_values(m, d, J1, J3, c_tf, c_tw, dtype=jnp.float64) -> QuadParams:
    """Build params from externally drawn values (parity harness: lets the
    NumPy oracle's RNG stream drive the JAX env)."""
    m = jnp.asarray(m, dtype)
    d = jnp.asarray(d, dtype)
    J = jnp.stack([jnp.asarray(J1, dtype), jnp.asarray(J1, dtype),
                   jnp.asarray(J3, dtype)], axis=-1)
    return _derive(m, d, J, jnp.asarray(c_tf, dtype), jnp.asarray(c_tw, dtype),
                   dtype)
