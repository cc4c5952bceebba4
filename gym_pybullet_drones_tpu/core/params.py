"""Per-model physical parameters as a JAX pytree.

The reference stores all physical coefficients in custom ``<properties>`` tags of
its URDF files and parses them positionally at runtime
(BaseAviary._parseURDFParameters, BaseAviary.py:985-1017). Here each drone model is
a first-class parameter pytree with the same numeric values (sourced from
assets/cf2x.urdf:5,11-12, assets/cf2p.urdf:5,12, assets/racer.urdf:5,11-12), plus
the derived constants of BaseAviary.__init__ (BaseAviary.py:117-128). A URDF
import path is provided for user-supplied vehicles (``from_urdf``).

Everything is a plain array leaf, so ``DroneParams`` can be passed through
jit/vmap/shard_map, donated, or batched (e.g. a fleet of heterogeneous drones via
``jax.vmap`` over a stacked DroneParams).
"""

import xml.etree.ElementTree as etxml
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gym_pybullet_drones_tpu.envs.spec import DroneModel

G = 9.8  # gravitational acceleration used throughout the reference (BaseAviary.py:74)


# Raw per-model property tables. Keys mirror the URDF <properties> attributes plus
# inertial/collision data. ``prop_offsets`` are the propeller link inertial-frame
# origins (cf2x.urdf:42-89, cf2p.urdf:42-80, racer.urdf:36-74); in PYB-mode physics
# the per-prop thrust is applied at these body-frame points, which is where
# roll/pitch torques come from in the reference's force-level pipeline.
_MODEL_TABLE: dict[DroneModel, dict[str, Any]] = {
    DroneModel.CF2X: dict(
        m=0.027,
        arm=0.0397,
        kf=3.16e-10,
        km=7.94e-12,
        thrust2weight=2.25,
        max_speed_kmh=30.0,
        gnd_eff_coeff=11.36859,
        prop_radius=2.31348e-2,
        drag_coeff_xy=9.1785e-7,
        drag_coeff_z=10.311e-7,
        dw_coeff_1=2267.18,
        dw_coeff_2=0.16,
        dw_coeff_3=-0.11,
        ixx=1.4e-5,
        iyy=1.4e-5,
        izz=2.17e-5,
        collision_h=0.025,
        collision_r=0.06,
        collision_z_offset=0.0,
        prop_offsets=[
            [0.028, -0.028, 0.0],
            [-0.028, -0.028, 0.0],
            [-0.028, 0.028, 0.0],
            [0.028, 0.028, 0.0],
        ],
    ),
    DroneModel.CF2P: dict(
        m=0.027,
        arm=0.0397,
        kf=3.16e-10,
        km=7.94e-12,
        thrust2weight=2.25,
        max_speed_kmh=30.0,
        gnd_eff_coeff=11.36859,
        prop_radius=2.31348e-2,
        drag_coeff_xy=9.1785e-7,
        drag_coeff_z=10.311e-7,
        dw_coeff_1=2267.18,
        dw_coeff_2=0.16,
        dw_coeff_3=-0.11,
        ixx=2.3951e-5,
        iyy=2.3951e-5,
        izz=3.2347e-5,
        collision_h=0.025,
        collision_r=0.06,
        collision_z_offset=0.0,
        prop_offsets=[
            [0.0397, 0.0, 0.0],
            [0.0, 0.0397, 0.0],
            [-0.0397, 0.0, 0.0],
            [0.0, -0.0397, 0.0],
        ],
    ),
    DroneModel.RACE: dict(
        m=0.830,
        arm=0.109,
        kf=8.47e-9,
        km=2.13e-11,
        thrust2weight=4.17,
        max_speed_kmh=200.0,
        gnd_eff_coeff=11.36859,
        prop_radius=12.7e-2,
        drag_coeff_xy=9.1785e-7,
        drag_coeff_z=10.311e-7,
        dw_coeff_1=2267.18,
        dw_coeff_2=0.16,
        dw_coeff_3=-0.11,
        ixx=0.003113,
        iyy=0.003113,
        izz=0.003113,
        collision_h=0.025,
        collision_r=0.06,
        collision_z_offset=0.0,
        prop_offsets=[
            [0.0850, 0.0675, 0.0],
            [-0.0850, 0.0675, 0.0],
            [-0.0850, -0.0675, 0.0],
            [0.0850, -0.0675, 0.0],
        ],
    ),
}

# Torque-sign / mixer conventions that are Python-level (static) per model:
# yaw torque sign flip for RACE (BaseAviary._physics, BaseAviary.py:695-697) and
# the x/y torque arm formula of the explicit dynamics (BaseAviary.py:846-856).
_MODEL_INDEX = {DroneModel.CF2X: 0, DroneModel.CF2P: 1, DroneModel.RACE: 2}


@struct.dataclass
class DroneParams:
    """All per-vehicle physical constants, as jnp scalars/arrays.

    ``model_index`` encodes CF2X=0 / CF2P=1 / RACE=2 for the (rare) value-level
    branches; the x/y torque geometry itself is carried numerically in
    ``dyn_torque_arm_x/y`` and ``prop_offsets`` so the step function has no
    model branching at all.
    """

    m: jax.Array
    arm: jax.Array
    kf: jax.Array
    km: jax.Array
    thrust2weight: jax.Array
    max_speed_kmh: jax.Array
    gnd_eff_coeff: jax.Array
    prop_radius: jax.Array
    drag_coeff: jax.Array  # (3,) [xy, xy, z]
    dw_coeff_1: jax.Array
    dw_coeff_2: jax.Array
    dw_coeff_3: jax.Array
    J: jax.Array  # (3, 3)
    J_inv: jax.Array  # (3, 3)
    collision_h: jax.Array
    collision_r: jax.Array
    collision_z_offset: jax.Array
    prop_offsets: jax.Array  # (4, 3) body-frame prop positions
    # Explicit-dynamics torque mixing: tau_xy = dyn_xy_mix @ forces
    # (reference BaseAviary.py:846-856), yaw sign in yaw_sign.
    dyn_xy_mix: jax.Array  # (2, 4)
    yaw_sign: jax.Array  # +1 or -1 (RACE flips reaction torque sign)
    # Derived constants (BaseAviary.py:117-128)
    gravity: jax.Array  # m * g
    hover_rpm: jax.Array
    max_rpm: jax.Array
    max_thrust: jax.Array
    max_xy_torque: jax.Array
    max_z_torque: jax.Array
    gnd_eff_h_clip: jax.Array
    g: jax.Array
    model_index: jax.Array


def _dyn_xy_mix(model: DroneModel, L: float) -> np.ndarray:
    """(2,4) matrix mapping per-motor forces to x/y torques in DYN mode."""
    if model == DroneModel.CF2X:
        a = L / np.sqrt(2.0)
        return np.array([[-a, -a, a, a], [-a, a, a, -a]])
    if model == DroneModel.CF2P:
        return np.array([[0.0, L, 0.0, -L], [-L, 0.0, L, 0.0]])
    # RACE (X config, but positive x_torque sign: BaseAviary.py:847-849)
    a = L / np.sqrt(2.0)
    return np.array([[a, a, -a, -a], [-a, a, a, -a]])


def _build(table: dict[str, Any], model: DroneModel, dtype) -> DroneParams:
    t = {k: np.asarray(v, dtype=np.float64) for k, v in table.items()}
    m, kf, km = float(t["m"]), float(t["kf"]), float(t["km"])
    t2w = float(t["thrust2weight"])
    gravity = G * m
    hover_rpm = np.sqrt(gravity / (4.0 * kf))
    max_rpm = np.sqrt((t2w * gravity) / (4.0 * kf))
    max_thrust = 4.0 * kf * max_rpm**2
    L = float(t["arm"])
    if model == DroneModel.CF2P:
        max_xy_torque = L * kf * max_rpm**2
    else:
        max_xy_torque = (2.0 * L * kf * max_rpm**2) / np.sqrt(2.0)
    max_z_torque = 2.0 * km * max_rpm**2
    prop_radius = float(t["prop_radius"])
    gnd_eff_coeff = float(t["gnd_eff_coeff"])
    gnd_eff_h_clip = 0.25 * prop_radius * np.sqrt(
        (15.0 * max_rpm**2 * kf * gnd_eff_coeff) / max_thrust
    )
    J = np.diag([float(t["ixx"]), float(t["iyy"]), float(t["izz"])])
    arr = lambda v: jnp.asarray(v, dtype=dtype)
    return DroneParams(
        m=arr(m),
        arm=arr(L),
        kf=arr(kf),
        km=arr(km),
        thrust2weight=arr(t2w),
        max_speed_kmh=arr(t["max_speed_kmh"]),
        gnd_eff_coeff=arr(gnd_eff_coeff),
        prop_radius=arr(prop_radius),
        drag_coeff=arr(
            [float(t["drag_coeff_xy"]), float(t["drag_coeff_xy"]), float(t["drag_coeff_z"])]
        ),
        dw_coeff_1=arr(t["dw_coeff_1"]),
        dw_coeff_2=arr(t["dw_coeff_2"]),
        dw_coeff_3=arr(t["dw_coeff_3"]),
        J=arr(J),
        J_inv=arr(np.linalg.inv(J)),
        collision_h=arr(t["collision_h"]),
        collision_r=arr(t["collision_r"]),
        collision_z_offset=arr(t["collision_z_offset"]),
        prop_offsets=arr(t["prop_offsets"]),
        dyn_xy_mix=arr(_dyn_xy_mix(model, L)),
        yaw_sign=arr(-1.0 if model == DroneModel.RACE else 1.0),
        gravity=arr(gravity),
        hover_rpm=arr(hover_rpm),
        max_rpm=arr(max_rpm),
        max_thrust=arr(max_thrust),
        max_xy_torque=arr(max_xy_torque),
        max_z_torque=arr(max_z_torque),
        gnd_eff_h_clip=arr(gnd_eff_h_clip),
        g=arr(G),
        model_index=jnp.asarray(_MODEL_INDEX[model], dtype=jnp.int32),
    )


def drone_params(model: DroneModel = DroneModel.CF2X, dtype=jnp.float32) -> DroneParams:
    """Build the parameter pytree for a built-in drone model."""
    return _build(_MODEL_TABLE[model], model, dtype)


def from_urdf(path: str, model: DroneModel = DroneModel.CF2X, dtype=jnp.float32) -> DroneParams:
    """Compatibility loader for reference-style URDFs.

    Reads the custom ``<properties>`` attributes, base inertial values, collision
    cylinder, and propeller link offsets the same way the reference does
    (BaseAviary._parseURDFParameters, BaseAviary.py:985-1017), but by tag/attribute
    name rather than positional child indexing. ``model`` selects the static
    torque-sign conventions (X vs + mixing, racer yaw flip).
    """
    root = etxml.parse(path).getroot()
    props = root.find("properties").attrib
    links = root.findall("link")
    base = links[0]
    inertial = base.find("inertial")
    inertia = inertial.find("inertia").attrib
    cyl = base.find("collision/geometry/cylinder").attrib
    col_origin = base.find("collision/origin").attrib.get("xyz", "0 0 0").split()
    prop_offsets = []
    for link in links:
        if link.get("name", "").startswith("prop"):
            xyz = link.find("inertial/origin").attrib.get("xyz", "0 0 0").split()
            prop_offsets.append([float(v) for v in xyz])
    table = dict(
        m=float(inertial.find("mass").attrib["value"]),
        arm=float(props["arm"]),
        kf=float(props["kf"]),
        km=float(props["km"]),
        thrust2weight=float(props["thrust2weight"]),
        max_speed_kmh=float(props["max_speed_kmh"]),
        gnd_eff_coeff=float(props["gnd_eff_coeff"]),
        prop_radius=float(props["prop_radius"]),
        drag_coeff_xy=float(props["drag_coeff_xy"]),
        drag_coeff_z=float(props["drag_coeff_z"]),
        dw_coeff_1=float(props["dw_coeff_1"]),
        dw_coeff_2=float(props["dw_coeff_2"]),
        dw_coeff_3=float(props["dw_coeff_3"]),
        ixx=float(inertia["ixx"]),
        iyy=float(inertia["iyy"]),
        izz=float(inertia["izz"]),
        collision_h=float(cyl["length"]),
        collision_r=float(cyl["radius"]),
        collision_z_offset=float(col_origin[2]),
        prop_offsets=prop_offsets,
    )
    return _build(table, model, dtype)


# Fractional-jitter spec keys -> the base PLANT fields they scale.
RANDOMIZABLE = ("m", "kf", "km", "inertia", "drag", "gnd_eff_coeff",
                "dw_coeff_1")


def randomize_params(key: jax.Array, params: DroneParams, num_envs: int,
                     spec: dict) -> DroneParams:
    """Domain randomization: a (num_envs,)-batched DroneParams pytree.

    ``spec`` maps a key from ``RANDOMIZABLE`` to a fractional half-width f:
    the field is scaled by an independent per-env factor ~ U(1-f, 1+f).
    "inertia" scales the J diagonal, "drag" the (3,) drag_coeff vector; the
    rest scale the matching scalar field. Geometry (arm, prop offsets,
    collision shape) is never randomized — it would change the mixer/spawn
    grid, which the reference derives from the URDF at load time.

    Only the TRUE PLANT is perturbed. The derived actuator/software constants
    — hover_rpm, max_rpm, thrust/torque caps, gnd_eff_h_clip, gravity — stay
    NOMINAL on purpose: they parameterize the software side (the normalized
    action de-normalization `hover_rpm*(1+0.05a)` of BaseRLAviary.py:192/224
    and the RPM clip), i.e. the flight stack's *calibration*, which in a
    sim2real setting does not know the perturbed plant. Recomputing them from
    the perturbed m/kf would exactly cancel the perturbation for the
    RPM-normalized action types (accel = 4*kf*hover_rpm'^2*(1+0.05a)^2/m - g
    = g*((1+0.05a)^2 - 1) regardless of m', kf'), silently turning the
    randomization into a no-op. For the same reason controllers keep nominal
    ctrl_params. The reference has no equivalent (PyBullet bodies load fixed
    URDF constants).

    The result vmaps directly over the leading axis (`runtime/rollout`
    auto-detects it).
    """
    unknown = set(spec) - set(RANDOMIZABLE)
    if unknown:
        raise ValueError(f"unknown randomization keys {sorted(unknown)}; "
                         f"supported: {RANDOMIZABLE}")
    E = num_envs
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + jnp.shape(x)), params)

    keys = dict(zip(sorted(spec), jax.random.split(key, max(len(spec), 1))))

    def mult(name):
        f = float(spec[name])
        return 1.0 + f * jax.random.uniform(
            keys[name], (E,), dtype=params.m.dtype, minval=-1.0, maxval=1.0)

    rep = {}
    for field in ("m", "kf", "km", "gnd_eff_coeff", "dw_coeff_1"):
        if field in spec:
            rep[field] = getattr(params, field) * mult(field)
    if "inertia" in spec:
        j_mult = mult("inertia")
        rep.update(J=params.J * j_mult[:, None, None],
                   J_inv=params.J_inv / j_mult[:, None, None])
    if "drag" in spec:
        rep.update(drag_coeff=params.drag_coeff * mult("drag")[:, None])

    return batched.replace(**rep) if rep else batched
