"""Trapezoidal integrator / finite-difference helpers.

Functional equivalents of the reference's stateful utility classes
(quad_utils.py:38-77): state is an explicit (value, memory) pair instead of
instance attributes, so the helpers compose with vmap/scan.  The env core
inlines the same update (quad.py:447-451); these standalone versions exist
for API parity and for external controllers/analysis code.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class IntegralState(NamedTuple):
    """(error, integrand) pair — IntegralError/IntegralErrorVec3
    (quad_utils.py:38-63).  Works for scalars and vectors alike."""
    error: jnp.ndarray
    integrand: jnp.ndarray

    @classmethod
    def zero(cls, shape=(), dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return cls(error=z, integrand=z)


def integrate(state: IntegralState, current_integrand, dt) -> IntegralState:
    """Trapezoidal update: error += (integrand + current) * dt / 2
    (quad_utils.py:43-45)."""
    error = state.error + ((state.integrand + current_integrand) * dt) / 2.0
    return IntegralState(error=error, integrand=current_integrand)


class DerivativeState(NamedTuple):
    """(y_dot, previous_y) pair — TimeDerivativeVec3
    (quad_utils.py:66-77)."""
    y_dot: jnp.ndarray
    previous_y: jnp.ndarray

    @classmethod
    def zero(cls, shape=(3,), dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return cls(y_dot=z, previous_y=z)


def derivative(state: DerivativeState, current_y, dt) -> DerivativeState:
    """Backward finite difference: y_dot = (y - y_prev) / dt
    (quad_utils.py:71-73)."""
    return DerivativeState(y_dot=(current_y - state.previous_y) / dt,
                           previous_y=current_y)
