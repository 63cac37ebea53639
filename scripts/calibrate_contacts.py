"""Calibrate the multi-contact selection thresholds against CPU MuJoCo.

Provenance for ``_CONTACT_THETA2`` / ``_CONTACT_THETA3`` in
``quadruped_gym_tpu/models/spec.py`` (cited from ``physics/collision.py``).

MuJoCo's mjc_PlaneConvex emits 1-3 contact points per plane-convex pair;
which *extra* points appear depends on qhull adjacency internals that have
no closed form. The TPU engine instead uses a branch-free
farthest-point-then-farthest-from-line rule (``physics/collision.py:92-124``)
gated by two per-mesh acceptance distances:

  * ``theta2`` — minimum in-plane distance of the farthest low candidate
    vertex from the support vertex for a 2nd contact to be emitted;
  * ``theta3`` — minimum distance from the support->second line for a 3rd.

This script drops each robot mesh onto the plane in thousands of random
orientations, runs the CPU-MuJoCo oracle (mj_forward -> mj_collision),
computes the engine's candidate features for the same pose, and picks the
thresholds that maximize contact-*count* agreement with the oracle. It
prints the calibrated dicts to paste into ``models/spec.py`` plus the
agreement each committed value achieves (``tests/test_calibration.py``
asserts the committed constants stay inside the calibrated band).

Run:  python scripts/calibrate_contacts.py [--samples 4000] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quadruped_gym_tpu.models import spec  # noqa: E402

ASSETS = os.path.join(os.path.dirname(spec.__file__), "assets")
MESHES = ("FOOT", "SERVO", "FEMA", "SHIN", "FRAME")
MARGIN = 0.001  # robot default, quadruped.xml:8


def _mini_model(mesh: str):
    """Plane + one free mesh body, same contact params as the robot geoms."""
    import mujoco

    xml = f"""
    <mujoco>
      <compiler meshdir="{ASSETS}/mesh"/>
      <asset><mesh name="M" file="{mesh}.obj"/></asset>
      <worldbody>
        <geom name="floor" type="plane" size="2 2 0.1"/>
        <body pos="0 0 0.5">
          <freejoint/>
          <geom name="g" type="mesh" mesh="M" margin="{MARGIN}"
                friction="0.6" mass="0.05"/>
        </body>
      </worldbody>
    </mujoco>
    """
    return mujoco.MjModel.from_xml_string(xml)


def _hull_verts(m) -> np.ndarray:
    """Convex-hull vertices of mesh 0 (same graph walk as
    spec.build_physics_model, models/spec.py:237-253)."""
    adr = m.mesh_graphadr[0]
    verts = m.mesh_vert[m.mesh_vertadr[0] : m.mesh_vertadr[0] + m.mesh_vertnum[0]]
    if adr < 0:
        return np.asarray(verts, np.float64)
    graph = m.mesh_graph
    numvert = int(graph[adr])
    gid = graph[adr + 2 + numvert : adr + 2 + 2 * numvert]
    return np.asarray(verts[np.asarray(gid, int)], np.float64)


def _quat_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def sample_mesh(mesh: str, n_samples: int, rng: np.random.Generator):
    """Returns per-sample (d1, c2, mj_count): the engine's 2nd/3rd-point
    features and the oracle's contact count for identical poses."""
    import mujoco

    m = _mini_model(mesh)
    # mesh geoms get recentered by the compiler: the runtime frame offset is
    # geom_pos of the compiled geom (hull verts are expressed in that frame)
    d = mujoco.MjData(m)
    hull = _hull_verts(m)
    gpos_off = m.geom_pos[1].copy()
    gquat_off = m.geom_quat[1].copy()
    rows = []
    for _ in range(n_samples):
        u = rng.random(3)
        quat = np.array(
            [
                np.sqrt(1 - u[0]) * np.sin(2 * np.pi * u[1]),
                np.sqrt(1 - u[0]) * np.cos(2 * np.pi * u[1]),
                np.sqrt(u[0]) * np.sin(2 * np.pi * u[2]),
                np.sqrt(u[0]) * np.cos(2 * np.pi * u[2]),
            ]
        )
        body_mat = _quat_mat(quat)
        gmat = body_mat @ _quat_mat(gquat_off)
        gz = body_mat @ gpos_off
        # world vertex heights for body z = 0, then shift so the support
        # vertex sits at a random depth inside the contact band
        h_rel = hull @ gmat[2] + gz[2]
        depth = rng.uniform(-0.8 * MARGIN, 0.9 * MARGIN)
        z = depth - h_rel.min()
        h = h_rel + z

        mujoco.mj_resetData(m, d)
        d.qpos[:3] = [0.0, 0.0, z]
        d.qpos[3:7] = quat
        mujoco.mj_forward(m, d)
        mj_count = int(
            sum(
                1
                for c in range(d.ncon)
                if {d.contact.geom1[c], d.contact.geom2[c]} == {0, 1}
            )
        )

        # engine features (physics/collision.py:92-124)
        i0 = int(np.argmin(h))
        h0 = h[i0]
        cand = h < 2.0 * MARGIN
        dv2 = np.sum((hull - hull[i0]) ** 2, axis=1)
        dplan = np.sqrt(np.maximum(dv2 - (h - h0) ** 2, 0.0))
        dm = np.where(cand, dplan, -1.0)
        i1 = int(np.argmax(dm))
        d1 = dm[i1]
        # third-point feature: distance from support->second in-plane line
        n = np.array([0.0, 0.0, 1.0])
        u1 = gmat @ (hull[i1] - hull[i0])
        t = (u1 - (h[i1] - h0) * n) / max(d1, 1e-12)
        perp = np.cross(n, t)
        g = gmat.T @ perp
        cm = np.where(cand, np.abs(hull @ g - hull[i0] @ g), -1.0)
        c2 = float(np.max(cm))
        rows.append((float(d1), c2, mj_count))
    return np.asarray(rows)


def best_threshold(feature: np.ndarray, label: np.ndarray):
    """Threshold on ``feature`` that best predicts boolean ``label``
    (predict True iff feature >= theta). Returns (theta, agreement)."""
    cuts = np.unique(np.concatenate([feature, [feature.max() + 1.0]]))
    best = (cuts[0], -1.0)
    for theta in cuts:
        agree = np.mean((feature >= theta) == label)
        if agree > best[1]:
            best = (float(theta), float(agree))
    # midpoint of the flat optimum region for robustness
    lo = best[0]
    hi = lo
    for theta in cuts[cuts > lo]:
        if np.mean((feature >= theta) == label) >= best[1] - 1e-12:
            hi = float(theta)
        else:
            break
    below = feature[feature < lo]
    anchor = below.max() if below.size else lo
    return 0.5 * (anchor + lo), best[1]


def calibrate(n_samples: int = 4000, seed: int = 0, meshes=MESHES):
    rng = np.random.default_rng(seed)
    out = {}
    for mesh in meshes:
        rows = sample_mesh(mesh, n_samples, rng)
        d1, c2, count = rows[:, 0], rows[:, 1], rows[:, 2]
        multi = count >= 2
        if multi.any() and (~multi).any():
            theta2, agree2 = best_threshold(d1, multi)
        else:
            # degenerate: oracle always (or never) multi-contact
            theta2 = 0.0 if multi.all() else float(d1.max() + 1.0)
            agree2 = 1.0
        # theta3 is conditioned on the engine emitting a 2nd point
        mask = d1 >= theta2
        triple = count[mask] >= 3
        if triple.any() and (~triple).any():
            theta3, agree3 = best_threshold(c2[mask], triple)
        else:
            theta3 = 0.0 if (triple.size and triple.all()) else 1.0
            agree3 = 1.0
        # overall count agreement of the full predicted pipeline
        pred = 1 + (d1 >= theta2).astype(int) + ((d1 >= theta2) & (c2 >= theta3)).astype(int)
        out[mesh] = dict(
            theta2=float(theta2),
            theta3=float(theta3),
            agree2=float(agree2),
            agree3=float(agree3),
            count_agreement=float(np.mean(pred == np.minimum(count, 3))),
            rows=rows,
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    res = calibrate(args.samples, args.seed)
    print(f"{'mesh':8} {'theta2':>10} {'theta3':>10} {'agree2':>7} "
          f"{'agree3':>7} {'count_agree':>11}  committed(t2,t3)")
    for mesh, r in res.items():
        print(
            f"{mesh:8} {r['theta2']:10.6f} {r['theta3']:10.6f} "
            f"{r['agree2']:7.3f} {r['agree3']:7.3f} {r['count_agreement']:11.3f}"
            f"  ({spec._CONTACT_THETA2[mesh]:.6f}, {spec._CONTACT_THETA3[mesh]:.6f})"
        )
    print("\n_CONTACT_THETA2 = {")
    for mesh, r in res.items():
        print(f'    "{mesh}": {r["theta2"]:.6f},')
    print("}\n_CONTACT_THETA3 = {")
    for mesh, r in res.items():
        print(f'    "{mesh}": {r["theta3"]:.6f},')
    print("}")


if __name__ == "__main__":
    main()
