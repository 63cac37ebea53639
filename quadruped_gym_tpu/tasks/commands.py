"""High-level velocity/heading command abstraction.

Functional re-derivation of the reference's ``VelocityHeadingControls``
(``/root/reference/src/envs/control_inputs.py:3-116``): a local velocity, a
unit heading, and the heading-rotated global velocity, plus randomized
sampling with the same options dict semantics (min_speed/max_speed/
fixed_heading_angle/fixed_velocity_angle/fixed_speed).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Command(NamedTuple):
    velocity: jnp.ndarray  # (3,) local [vx, vy, 0]
    heading: jnp.ndarray  # (3,) unit [cos t, sin t, 0]
    global_velocity: jnp.ndarray  # (3,) heading-rotated velocity, z = 0


class SampleOptions(NamedTuple):
    """Sampling options (control_inputs.py:85-93). NaN means 'not fixed'."""

    min_speed: float = 0.0
    max_speed: float = 1.0
    fixed_heading_angle: float = float("nan")
    fixed_velocity_angle: float = float("nan")
    fixed_speed: float = float("nan")

    @classmethod
    def from_dict(cls, options: Optional[dict]) -> "SampleOptions":
        options = options or {}
        g = lambda k, dflt: float(options.get(k, dflt) if options.get(k) is not None else dflt)
        nan = float("nan")
        return cls(
            min_speed=g("min_speed", 0.0),
            max_speed=g("max_speed", 1.0),
            fixed_heading_angle=g("fixed_heading_angle", nan),
            fixed_velocity_angle=g("fixed_velocity_angle", nan),
            fixed_speed=g("fixed_speed", nan),
        )


def _rotate(velocity: jnp.ndarray, heading: jnp.ndarray) -> jnp.ndarray:
    v0, v1 = velocity[0], velocity[1]
    h0, h1 = heading[0], heading[1]
    return jnp.stack([h0 * v0 - h1 * v1, h1 * v0 + h0 * v1, jnp.zeros_like(v0)])


def make(velocity_xy: jnp.ndarray, heading_theta: jnp.ndarray) -> Command:
    vel = jnp.concatenate([velocity_xy, jnp.zeros_like(velocity_xy[:1])])
    heading = jnp.stack(
        [jnp.cos(heading_theta), jnp.sin(heading_theta), jnp.zeros_like(heading_theta)]
    )
    return Command(velocity=vel, heading=heading, global_velocity=_rotate(vel, heading))


def from_speed_alpha(speed, alpha, heading_theta) -> Command:
    """set_velocity_speed_alpha + set_orientation semantics."""
    vxy = jnp.stack([speed * jnp.cos(alpha), speed * jnp.sin(alpha)])
    return make(vxy, jnp.asarray(heading_theta, dtype=vxy.dtype))


def zero(dtype=jnp.float32) -> Command:
    z3 = jnp.zeros(3, dtype=dtype)
    return Command(velocity=z3, heading=z3, global_velocity=z3)


def sample(key: jax.Array, opts: SampleOptions, dtype=jnp.float32) -> Command:
    """Randomized command (control_inputs.py:74-116): heading and velocity
    angles ~ U(-pi, pi), speed ~ U(min, max); fixed values override."""
    k1, k2, k3 = jax.random.split(key, 3)
    pi = jnp.asarray(jnp.pi, dtype)
    theta = jax.random.uniform(k1, (), dtype, -pi, pi)
    alpha = jax.random.uniform(k2, (), dtype, -pi, pi)
    speed = jax.random.uniform(
        k3, (), dtype, jnp.asarray(opts.min_speed, dtype), jnp.asarray(opts.max_speed, dtype)
    )
    theta = jnp.where(
        jnp.isnan(opts.fixed_heading_angle), theta,
        jnp.asarray(opts.fixed_heading_angle, dtype),
    )
    alpha = jnp.where(
        jnp.isnan(opts.fixed_velocity_angle), alpha,
        jnp.asarray(opts.fixed_velocity_angle, dtype),
    )
    speed = jnp.where(
        jnp.isnan(opts.fixed_speed), speed, jnp.asarray(opts.fixed_speed, dtype)
    )
    return from_speed_alpha(speed, alpha, theta)


def heading_theta(cmd: Command) -> jnp.ndarray:
    return jnp.arctan2(cmd.heading[1], cmd.heading[0])


def velocity_speed_alpha(cmd: Command):
    speed = jnp.linalg.norm(cmd.velocity[:2])
    alpha = jnp.arctan2(cmd.velocity[1], cmd.velocity[0])
    return speed, alpha


def global_velocity_speed_alpha(cmd: Command):
    speed = jnp.linalg.norm(cmd.global_velocity[:2])
    alpha = jnp.arctan2(cmd.global_velocity[1], cmd.global_velocity[0])
    return speed, alpha
