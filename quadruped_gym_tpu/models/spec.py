"""MJCF ingestion: compile the robot model on the host and extract a static
``PhysicsModel`` consumed by the pure-JAX dynamics engine.

The reference framework delegates physics to the MuJoCo C engine
(``/root/reference/src/envs/quadruped.py:59-60,165``). Here MuJoCo is used
*only at model-build time on the host* — as an MJCF compiler — to produce
exact kinematic/inertial/actuation/contact parameters (including mesh-derived
inertias and convex hulls). Simulation itself is re-derived in JAX
(see ``quadruped_gym_tpu.physics``), never calls into MuJoCo, and runs
batched on TPU.

Design notes (TPU-first):
  * ``PhysicsModel`` is a frozen host-side object, treated as a *static
    closure constant* by the engine. Its arrays become XLA constants, which
    lets the compiler constant-fold the kinematic tree.
  * Quantities that are randomized per-scenario (mass, friction, gains) are
    overridden at trace time through ``DomainParams`` — a real pytree that is
    threaded through jit/vmap as data.
"""

from __future__ import annotations

import dataclasses
import os
import typing
from typing import Optional, Tuple

import numpy as np

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "assets")
DEFAULT_SCENE = os.path.join(ASSETS_DIR, "scene.xml")

# MuJoCo sensor type enum values we support (mjtSensor).
SENSOR_JOINTPOS = 9
SENSOR_ACCELEROMETER = 1
SENSOR_GYRO = 3
SENSOR_FRAMEPOS = 26
SENSOR_FRAMELINVEL = 31
SENSOR_FRAMEXAXIS = 28
SENSOR_FRAMEZAXIS = 30
SENSOR_VELOCIMETER = 2

# mjtJoint
JNT_FREE = 0
JNT_BALL = 1
JNT_SLIDE = 2
JNT_HINGE = 3


@dataclasses.dataclass(frozen=True)
class SensorEntry:
    kind: int
    objid: int  # joint id for jointpos, site id otherwise
    adr: int  # offset into the sensordata vector
    dim: int


@dataclasses.dataclass(frozen=True)
class PhysicsModel:
    """Static model description. All arrays are host numpy (float64/int)."""

    # sizes
    nq: int
    nv: int
    nu: int
    na: int
    nbody: int
    njnt: int
    nsensordata: int

    # options
    timestep: float
    gravity: np.ndarray  # (3,)
    solver_iterations: int
    solver_tolerance: float
    ls_iterations: int
    ls_tolerance: float
    impratio: float

    # bodies (index 0 is the world)
    body_parentid: Tuple[int, ...]
    body_jntadr: Tuple[int, ...]
    body_jntnum: Tuple[int, ...]
    body_dofadr: Tuple[int, ...]
    body_dofnum: Tuple[int, ...]
    body_pos: np.ndarray  # (nbody, 3) frame offset in parent
    body_quat: np.ndarray  # (nbody, 4)
    body_ipos: np.ndarray  # (nbody, 3) inertial frame in body
    body_iquat: np.ndarray  # (nbody, 4)
    body_mass: np.ndarray  # (nbody,)
    body_inertia: np.ndarray  # (nbody, 3) principal moments

    # joints
    jnt_type: Tuple[int, ...]
    jnt_qposadr: Tuple[int, ...]
    jnt_dofadr: Tuple[int, ...]
    jnt_bodyid: Tuple[int, ...]
    jnt_axis: np.ndarray  # (njnt, 3) in body frame
    jnt_pos: np.ndarray  # (njnt, 3) anchor in body frame
    jnt_range: np.ndarray  # (njnt, 2)
    jnt_limited: Tuple[bool, ...]
    jnt_solref: np.ndarray  # (njnt, 2)
    jnt_solimp: np.ndarray  # (njnt, 5)
    jnt_margin: np.ndarray  # (njnt,)

    # dofs
    dof_damping: np.ndarray  # (nv,)
    dof_armature: np.ndarray  # (nv,)
    dof_jntid: Tuple[int, ...]
    dof_invweight0: np.ndarray  # (nv,) compile-time inverse weights
    body_invweight0: np.ndarray  # (nbody, 2) [translational, rotational]

    # actuators (all joint-transmission position servos in this robot)
    actuator_trnid: Tuple[int, ...]  # joint id per actuator
    actuator_gear: np.ndarray  # (nu,) scalar gear on the hinge axis
    actuator_dyntype: Tuple[int, ...]  # 3 == filterexact
    actuator_dynprm: np.ndarray  # (nu, 3) [timeconst, ...]
    actuator_gainprm: np.ndarray  # (nu, 3) [kp, 0, 0]
    actuator_biasprm: np.ndarray  # (nu, 3) [0, -kp, -kv]
    actuator_ctrlrange: np.ndarray  # (nu, 2)
    actuator_forcerange: np.ndarray  # (nu, 2)

    # collision: plane (floor) vs convex mesh geoms
    plane_pos: np.ndarray  # (3,)
    plane_normal: np.ndarray  # (3,) world
    col_geom_bodyid: Tuple[int, ...]  # per collidable mesh geom
    col_geom_pos: np.ndarray  # (ncol, 3) geom offset in body
    col_geom_quat: np.ndarray  # (ncol, 4)
    col_geom_names: Tuple[str, ...]
    col_hull_verts: Tuple[np.ndarray, ...]  # per geom (V_i, 3) hull vertices
    col_friction: np.ndarray  # (ncol, 3) combined tan/torsion (condim 3)
    col_solref: np.ndarray  # (ncol, 2) combined
    col_solimp: np.ndarray  # (ncol, 5) combined
    col_margin: np.ndarray  # (ncol,) combined margin
    col_gap: np.ndarray  # (ncol,)
    col_condim: Tuple[int, ...]
    # Multi-contact selection thresholds, calibrated per mesh against the
    # CPU-MuJoCo oracle (see scripts/calibrate_contacts.py). MuJoCo's exact
    # plane-convex extra-point selection depends on qhull internals; the
    # deepest (support) contact is reproduced exactly, extra points follow
    # a farthest-point rule gated by these distances (~95% count agreement).
    col_theta2: np.ndarray  # (ncol,) min planar distance for a 2nd contact
    col_theta3: np.ndarray  # (ncol,) min line distance for a 3rd contact

    # sensors
    sensors: Tuple[SensorEntry, ...]
    site_bodyid: int
    site_pos: np.ndarray  # (3,) site offset in body frame
    site_quat: np.ndarray  # (4,)

    # reset state
    qpos0: np.ndarray  # (nq,)

    # names for lookups
    joint_names: Tuple[str, ...]
    actuator_names: Tuple[str, ...]
    sensor_names: Tuple[str, ...]
    sensor_adr_by_name: Tuple[Tuple[str, int], ...]

    def sensor_adr(self, name: str) -> int:
        """Start offset of a named sensor in the 33-dim sensordata vector.

        Mirrors the reference's name-based sensor lookup
        (``walking_quad.py:19-29``)."""
        for n, adr in self.sensor_adr_by_name:
            if n == name:
                return adr
        raise KeyError(name)


# Calibrated against CPU MuJoCo 3.10 on the robot meshes
# (scripts/calibrate_contacts.py): minimal separation distances that make a
# 2nd / 3rd plane-convex contact point appear. Unknown meshes fall back to
# 0.5 * rbound.
_CONTACT_THETA2 = {
    "FOOT": 0.034314,
    "SERVO": 0.028481,
    "FEMA": 0.019995,
    "SHIN": 0.053983,
    "FRAME": 0.030,
}
_CONTACT_THETA3 = {
    "FOOT": 0.010964,
    "SERVO": 1.0,  # effectively single/dual-point
    "FEMA": 1.0,
    "SHIN": 1.0,
    "FRAME": 1.0,
}


def build_physics_model(
    xml_path: str = DEFAULT_SCENE,
    collision_geom_prefixes: Optional[Tuple[str, ...]] = None,
) -> PhysicsModel:
    """Compile the MJCF scene and extract the static physics model.

    ``collision_geom_prefixes`` restricts the collidable geom set (e.g.
    ``("foot", "shin", "ankle_servo")``) — an MPC-speed variant: walking
    gaits only ground-contact through the lower leg, and pruning the other
    hulls removes ~90% of collision vertex work per step. The full set is
    the parity-exact default.
    """
    import mujoco  # host-side only

    m = mujoco.MjModel.from_xml_path(xml_path)

    # --- floor plane ---
    plane_ids = [i for i in range(m.ngeom) if m.geom_type[i] == mujoco.mjtGeom.mjGEOM_PLANE]
    assert len(plane_ids) == 1, "expected exactly one ground plane"
    pid = plane_ids[0]
    assert m.geom_bodyid[pid] == 0, "ground plane must be on the world body"
    plane_pos = m.geom_pos[pid].copy()
    plane_quat = m.geom_quat[pid].copy()
    # plane normal is the local +z axis of the plane geom
    rot = np.zeros(9)
    mujoco.mju_quat2Mat(rot, plane_quat)
    plane_normal = rot.reshape(3, 3)[:, 2].copy()

    # --- collidable mesh geoms (everything that can hit the floor) ---
    col_ids = []
    for g in range(m.ngeom):
        if g == pid:
            continue
        if m.geom_type[g] != mujoco.mjtGeom.mjGEOM_MESH:
            continue
        # contype/conaffinity compatibility with the plane
        if (m.geom_contype[g] & m.geom_conaffinity[pid]) or (
            m.geom_contype[pid] & m.geom_conaffinity[g]
        ):
            if collision_geom_prefixes is not None and not any(
                m.geom(g).name.startswith(p) for p in collision_geom_prefixes
            ):
                continue
            col_ids.append(g)

    hulls = []
    for g in col_ids:
        mid = m.geom_dataid[g]
        adr = m.mesh_graphadr[mid]
        vadr = m.mesh_vertadr[mid]
        vnum = m.mesh_vertnum[mid]
        verts = m.mesh_vert[vadr : vadr + vnum]
        if adr >= 0:
            graph = m.mesh_graph
            numvert = int(graph[adr])
            # graph layout: numvert, numface, vert_edgeadr[numvert],
            # vert_globalid[numvert], ...
            gid_start = adr + 2 + numvert
            globalid = graph[gid_start : gid_start + numvert]
            hull = verts[np.asarray(globalid, dtype=int)]
        else:
            hull = verts
        hulls.append(np.asarray(hull, dtype=np.float64))

    ncol = len(col_ids)
    col_friction = np.zeros((ncol, 3))
    col_solref = np.zeros((ncol, 2))
    col_solimp = np.zeros((ncol, 5))
    col_margin = np.zeros(ncol)
    col_gap = np.zeros(ncol)
    for k, g in enumerate(col_ids):
        p1, p2 = m.geom_priority[pid], m.geom_priority[g]
        if p1 == p2:
            # solmix-weighted mixing; friction is the element-wise max
            s1, s2 = m.geom_solmix[pid], m.geom_solmix[g]
            w1 = s1 / max(s1 + s2, 1e-12) if (s1 + s2) > 0 else 0.5
            w2 = 1.0 - w1
            # negative solref entries use min (direct spec); positive mix
            if m.geom_solref[pid][0] > 0 and m.geom_solref[g][0] > 0:
                col_solref[k] = w1 * m.geom_solref[pid] + w2 * m.geom_solref[g]
            else:
                col_solref[k] = np.minimum(m.geom_solref[pid], m.geom_solref[g])
            col_solimp[k] = w1 * m.geom_solimp[pid] + w2 * m.geom_solimp[g]
            col_friction[k] = np.maximum(m.geom_friction[pid], m.geom_friction[g])
        else:
            src = pid if p1 > p2 else g
            col_solref[k] = m.geom_solref[src]
            col_solimp[k] = m.geom_solimp[src]
            col_friction[k] = m.geom_friction[src]
        col_margin[k] = max(m.geom_margin[pid], m.geom_margin[g])
        col_gap[k] = max(m.geom_gap[pid], m.geom_gap[g])

    col_theta2 = np.zeros(ncol)
    col_theta3 = np.zeros(ncol)
    for k, g in enumerate(col_ids):
        mesh_name = m.mesh(m.geom_dataid[g]).name
        col_theta2[k] = _CONTACT_THETA2.get(mesh_name, 0.5 * m.geom_rbound[g])
        col_theta3[k] = _CONTACT_THETA3.get(mesh_name, 1.0)

    # --- sensors ---
    sensors = []
    for s in range(m.nsensor):
        sensors.append(
            SensorEntry(
                kind=int(m.sensor_type[s]),
                objid=int(m.sensor_objid[s]),
                adr=int(m.sensor_adr[s]),
                dim=int(m.sensor_dim[s]),
            )
        )
    assert m.nsite == 1, "engine assumes the single FRAME imu site"

    names = lambda obj, n: tuple(obj(i).name for i in range(n))

    return PhysicsModel(
        nq=m.nq,
        nv=m.nv,
        nu=m.nu,
        na=m.na,
        nbody=m.nbody,
        njnt=m.njnt,
        nsensordata=m.nsensordata,
        timestep=float(m.opt.timestep),
        gravity=np.asarray(m.opt.gravity, dtype=np.float64).copy(),
        solver_iterations=int(m.opt.iterations),
        solver_tolerance=float(m.opt.tolerance),
        ls_iterations=int(m.opt.ls_iterations),
        ls_tolerance=float(m.opt.ls_tolerance),
        impratio=float(m.opt.impratio),
        body_parentid=tuple(int(x) for x in m.body_parentid),
        body_jntadr=tuple(int(x) for x in m.body_jntadr),
        body_jntnum=tuple(int(x) for x in m.body_jntnum),
        body_dofadr=tuple(int(x) for x in m.body_dofadr),
        body_dofnum=tuple(int(x) for x in m.body_dofnum),
        body_pos=m.body_pos.copy(),
        body_quat=m.body_quat.copy(),
        body_ipos=m.body_ipos.copy(),
        body_iquat=m.body_iquat.copy(),
        body_mass=m.body_mass.copy(),
        body_inertia=m.body_inertia.copy(),
        jnt_type=tuple(int(x) for x in m.jnt_type),
        jnt_qposadr=tuple(int(x) for x in m.jnt_qposadr),
        jnt_dofadr=tuple(int(x) for x in m.jnt_dofadr),
        jnt_bodyid=tuple(int(x) for x in m.jnt_bodyid),
        jnt_axis=m.jnt_axis.copy(),
        jnt_pos=m.jnt_pos.copy(),
        jnt_range=m.jnt_range.copy(),
        jnt_limited=tuple(bool(x) for x in m.jnt_limited),
        jnt_solref=m.jnt_solref.copy(),
        jnt_solimp=m.jnt_solimp.copy(),
        jnt_margin=m.jnt_margin.copy(),
        dof_damping=m.dof_damping.copy(),
        dof_armature=m.dof_armature.copy(),
        dof_jntid=tuple(int(x) for x in m.dof_jntid),
        dof_invweight0=m.dof_invweight0.copy(),
        body_invweight0=m.body_invweight0.copy(),
        actuator_trnid=tuple(int(x) for x in m.actuator_trnid[:, 0]),
        actuator_gear=m.actuator_gear[:, 0].copy(),
        actuator_dyntype=tuple(int(x) for x in m.actuator_dyntype),
        actuator_dynprm=m.actuator_dynprm[:, :3].copy(),
        actuator_gainprm=m.actuator_gainprm[:, :3].copy(),
        actuator_biasprm=m.actuator_biasprm[:, :3].copy(),
        actuator_ctrlrange=m.actuator_ctrlrange.copy(),
        actuator_forcerange=m.actuator_forcerange.copy(),
        plane_pos=plane_pos,
        plane_normal=plane_normal,
        col_geom_bodyid=tuple(int(m.geom_bodyid[g]) for g in col_ids),
        col_geom_pos=np.stack([m.geom_pos[g] for g in col_ids]),
        col_geom_quat=np.stack([m.geom_quat[g] for g in col_ids]),
        col_geom_names=tuple(m.geom(g).name for g in col_ids),
        col_hull_verts=tuple(hulls),
        col_friction=col_friction,
        col_solref=col_solref,
        col_solimp=col_solimp,
        col_margin=col_margin,
        col_gap=col_gap,
        col_condim=tuple(int(m.geom_condim[g]) for g in col_ids),
        col_theta2=col_theta2,
        col_theta3=col_theta3,
        sensors=tuple(sensors),
        site_bodyid=int(m.site_bodyid[0]),
        site_pos=m.site_pos[0].copy(),
        site_quat=m.site_quat[0].copy(),
        qpos0=m.qpos0.copy(),
        joint_names=names(m.joint, m.njnt),
        actuator_names=names(m.actuator, m.nu),
        sensor_names=names(m.sensor, m.nsensor),
        sensor_adr_by_name=tuple(
            (m.sensor(i).name, int(m.sensor_adr[i])) for i in range(m.nsensor)
        ),
    )


_MODEL_CACHE: dict = {}


def get_model(
    xml_path: str = DEFAULT_SCENE,
    collision_geom_prefixes: Optional[Tuple[str, ...]] = None,
) -> PhysicsModel:
    """Cached model build (host-side MJCF compilation is not free)."""
    key = (os.path.abspath(xml_path), collision_geom_prefixes)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = build_physics_model(
            xml_path, collision_geom_prefixes=collision_geom_prefixes
        )
    return _MODEL_CACHE[key]


# lower-leg collision set for MPC-speed models (feet + ankle servos + shins)
MPC_COLLISION_PREFIXES = ("foot", "shin", "ankle_servo")

# feet-only set for the fastest planning models (lane engine / bench): in
# nominal gaits only feet touch ground; shin/ankle contacts matter for the
# plant, not the planner's lookahead.
FEET_COLLISION_PREFIXES = ("foot",)


def decimate_hulls(
    m: PhysicsModel,
    n_directions: int = 128,
    per_geom_directions: Optional[dict] = None,
) -> PhysicsModel:
    """Planning-model hull decimation: keep only vertices that are argmax
    support points along ``n_directions`` Fibonacci-sphere directions.

    The plane-convex contact only ever touches hull *support* vertices, so
    this preserves contact geometry up to the support-function error of the
    dropped directions (sub-mm for these ~cm-scale feet). Intended for the
    throughput planner; the oracle-parity engine keeps full hulls.

    ``per_geom_directions`` maps geom-name prefixes to coarser direction
    counts (e.g. ``{"shin": 32}``): secondary contact geoms — which only
    ground-contact in falls and slope extremes — can be decimated harder
    than the feet, shrinking the unrolled vertex loops of the Mosaic
    kernels where the vertex count is pure VPU time."""
    # Fibonacci sphere
    i = np.arange(n_directions) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n_directions)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    dirs = np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=1,
    )
    def hull_dirs(k):
        if per_geom_directions is None:
            return dirs
        nd = None
        for prefix, n in per_geom_directions.items():
            if m.col_geom_names[k].startswith(prefix):
                nd = n
        if nd is None or nd >= n_directions:
            return dirs
        return dirs[np.linspace(0, n_directions - 1, nd).astype(int)]

    new_hulls = []
    for k, verts in enumerate(m.col_hull_verts):
        v = np.asarray(verts)
        keep = np.unique(np.argmax(hull_dirs(k) @ v.T, axis=1))
        new_hulls.append(v[keep])
    return dataclasses.replace(m, col_hull_verts=tuple(new_hulls))


class DomainParams(typing.NamedTuple):
    """Per-sample physics overrides for domain randomization.

    ``PhysicsModel`` is a static closure constant; these are the
    *traced* per-scenario quantities (BASELINE configs 3/5: randomized
    friction / payload / gains at 4k-65k scenario scale). Each field is
    either None (nominal model value) or a lane array broadcastable
    against the batch-minor engines' lanes ((B,) for ``ops.leg_engine``;
    folded automatically by ``ops.pallas_engine``):

      * ``friction``: tangential friction coefficient of the foot-ground
        contacts (replaces ``col_friction[:, 0]``; the constraint
        impedance reference weights stay nominal, as MuJoCo computes
        them at compile time).
      * ``gain_scale``: scales the position-servo stiffness kp (both the
        gain and its bias coupling; the damping kv stays nominal).
      * ``base_mass_scale``: payload model — scales the free base body's
        mass and rotational inertia together (uniform density).
      * ``tilt_x`` / ``tilt_y``: terrain slope — per-scenario ground
        slope: the plane becomes z = tilt_x*x + tilt_y*y through the
        nominal plane point (|tilt| < ~2; the contact tangent frame
        follows the tilted normal).
      * ``terrain_amp`` / ``terrain_freq``: rough terrain — a smooth
        analytic bump field on top of the slope:
        ``z(x, y) = tilt_x*x + tilt_y*y + amp*sin(freq*x)*sin(freq*y)``
        (amp in meters, freq in rad/m). Contact resolves each geom
        against the surface's local tangent plane at the geom center —
        exact for pure slope, first-order in surface curvature otherwise,
        so keep the wavelength 2*pi/freq a few times the foot size
        (validated vs a sampled MuJoCo heightfield in
        tests/test_terrain.py). ``terrain_amp`` and ``terrain_freq``
        must be given together.

    Supported by ``ops.leg_engine`` / ``ops.pallas_engine`` and threaded
    through ``solvers.rollout.lane_batched_rollout_cost(dp=...)``.
    """

    friction: typing.Any = None
    gain_scale: typing.Any = None
    base_mass_scale: typing.Any = None
    tilt_x: typing.Any = None
    tilt_y: typing.Any = None
    terrain_amp: typing.Any = None
    terrain_freq: typing.Any = None


def sample_domain_params(
    key,
    batch: int,
    friction_range: Optional[Tuple[float, float]] = (0.4, 0.8),
    gain_range: Optional[Tuple[float, float]] = (0.8, 1.2),
    mass_range: Optional[Tuple[float, float]] = (0.9, 1.5),
    tilt_range: Optional[Tuple[float, float]] = None,
    terrain_amp_range: Optional[Tuple[float, float]] = None,
    terrain_freq_range: Tuple[float, float] = (15.0, 30.0),
):
    """Uniformly sampled ``DomainParams`` lanes for ``batch`` scenarios.

    Pass None for a range to keep that quantity nominal. Terrain bumps
    (``terrain_amp_range``, e.g. ``(0.0, 0.02)`` for up-to-2cm bumps)
    sample amplitude and spatial frequency together; the default
    frequency band keeps wavelengths 0.2-0.4 m, a few foot lengths."""
    import jax

    ks = jax.random.split(key, 7)

    def u(k, rng):
        if rng is None:
            return None
        return jax.random.uniform(k, (batch,), minval=rng[0], maxval=rng[1])

    return DomainParams(
        friction=u(ks[0], friction_range),
        gain_scale=u(ks[1], gain_range),
        base_mass_scale=u(ks[2], mass_range),
        tilt_x=u(ks[3], tilt_range),
        tilt_y=u(ks[4], tilt_range),
        terrain_amp=u(ks[5], terrain_amp_range),
        terrain_freq=(
            None if terrain_amp_range is None
            else u(ks[6], terrain_freq_range)
        ),
    )


def get_planning_model(n_directions: int = 128) -> PhysicsModel:
    """Feet-only, decimated-hull model for maximum-throughput planning."""
    key = ("planning", n_directions)
    if key not in _MODEL_CACHE:
        base = get_model(collision_geom_prefixes=FEET_COLLISION_PREFIXES)
        _MODEL_CACHE[key] = decimate_hulls(base, n_directions)
    return _MODEL_CACHE[key]


def get_fast_plant_model(
    n_directions: int = 128, n_secondary: Optional[int] = 64
) -> PhysicsModel:
    """Full lower-leg collision set (feet + shins + ankle servos) with
    decimated hulls: the plant-fidelity configuration for the leg/Pallas
    engines. The raw foot hulls have ~440 vertices — fine for the
    gather-based engines but ruinous for the Mosaic kernels, whose
    vertex selection unrolls; support-direction decimation keeps contact
    geometry to sub-mm while shrinking every hull to <= ~n_directions
    support vertices.

    ``n_secondary`` decimates the shin/ankle-servo hulls harder than the
    feet (they only touch ground in falls and slope extremes, and their
    vertex loops are pure VPU time in the fused kernel); pass None to
    decimate everything at ``n_directions``."""
    key = ("fast_plant", n_directions, n_secondary)
    if key not in _MODEL_CACHE:
        base = get_model(collision_geom_prefixes=MPC_COLLISION_PREFIXES)
        per_geom = (
            None if n_secondary is None
            else {"shin": n_secondary, "ankle_servo": n_secondary}
        )
        _MODEL_CACHE[key] = decimate_hulls(
            base, n_directions, per_geom_directions=per_geom
        )
    return _MODEL_CACHE[key]
