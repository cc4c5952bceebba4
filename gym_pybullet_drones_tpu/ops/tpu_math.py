"""Inverse-trig built from Pallas-TPU-supported primitives.

The Mosaic TPU lowering implements sin/cos/sqrt/exp/rsqrt but not
atan/asin/atan2 (probed empirically). These implementations use only
elementwise arithmetic + sqrt + select, so they lower inside Pallas kernels
and match `jnp.arctan2`/`jnp.arcsin` to ~1e-7 in float32 (verified in
tests/test_soa.py), which is below the float32 noise floor of the physics.

`atan` uses the classic octant range reduction (x > tan(3pi/8) -> invert;
x > tan(pi/8) -> shift by pi/4) followed by a degree-9 odd minimax polynomial
on the reduced interval — the standard single-precision construction.
"""

import jax.numpy as jnp

_TAN_3PI_8 = 2.414213562373095
_TAN_PI_8 = 0.4142135623730950
_PI = 3.141592653589793
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483


def atan(x):
    """Elementwise arctangent, float32-accurate (~1e-7)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)

    big = ax > _TAN_3PI_8
    mid = (~big) & (ax > _TAN_PI_8)

    # Range-reduced argument and additive constant per region
    safe_ax = jnp.where(big, ax, 1.0)  # > 2.414 where big, else exactly 1.0
    x_big = -1.0 / safe_ax
    x_mid = (ax - 1.0) / (ax + 1.0)
    xr = jnp.where(big, x_big, jnp.where(mid, x_mid, ax))
    y0 = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))

    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return sign * (y0 + poly)


def atan2(y, x):
    """Elementwise two-argument arctangent with full quadrant handling.

    Deviation from IEEE/jnp.arctan2 at SIGNED-ZERO edges (Mosaic offers no
    cheap signbit, and no in-repo caller can produce a -0.0 operand — the x
    inputs are of the form 1 - 2(y^2+z^2)): atan2(+-0.0, -0.0) returns 0
    instead of +-pi, and atan2(-0.0, x<0) returns +pi instead of -pi.
    Everywhere else parity with jnp.arctan2 is ~1e-7 (float32)."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = atan(y / safe_x)
    out = jnp.where(
        x > 0.0, base,
        jnp.where(
            x < 0.0,
            jnp.where(y >= 0.0, base + _PI, base - _PI),
            # x == 0: +-pi/2 by the sign of y (0 when both are 0)
            jnp.where(y > 0.0, _PI_2, jnp.where(y < 0.0, -_PI_2, 0.0)),
        ),
    )
    return out


def asin(x):
    """Elementwise arcsine via asin(x) = atan2(x, sqrt(1 - x^2))."""
    x = jnp.clip(x, -1.0, 1.0)
    return atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))
