#!/usr/bin/env python
"""Generate the checked-in reference problem instances (interchange v1).

NUMPY-ONLY — deliberately independent of ``aligator_tpu``: the archives are
produced straight from the published reference problem definitions, so the
loader test (``tests/test_interchange.py``) exercises a genuine external
producer rather than a round-trip through the framework's own classes.

Instances (parameters transcribed verbatim, reference file:line cited):

* ``ref_lqr.npz``          — /root/reference/examples/lqr.py:33-60
  (nx=nu=3, A with ±0.2 couplings, B=[I; 0.4 row], c=(0,0,0.1),
  Q=R=1e-2·I, N=1e-5·I, Qf=I, x0=(0.2,0.3,-0.1), nsteps=20)
* ``ref_lqr_bounded.npz``  — same + u ∈ [−0.18, 0.18] box
  (lqr.py:62-67)
* ``ref_lqr_term_cstr.npz``— same + terminal equality to 0.1·1, Qf=0
  (lqr.py:50-51,77-80)
* ``ref_se2_car.npz``      — /root/reference/examples/se2-car.hpp:63-103
  (SE(2) unicycle, dt=0.05, w_x=0.01·I·dt, w_u=I·dt, w_term=0.1·I,
  x0=(0.7,−0.1,θ=0.15355), nsteps=50)

Usage: python tools/make_reference_instances.py [outdir=tests/data]
"""

import json
import pathlib
import sys

import numpy as np


def write_instance(path, manifest, arrays):
    np.savez(path, manifest=np.asarray(json.dumps(manifest)), **arrays)
    print(f"wrote {path} ({len(arrays)} arrays)")


def lqr_instance(bounds=False, term_cstr=False):
    """examples/lqr.py:33-80 parameters."""
    nx = nu = 3
    A = np.eye(nx)
    A[0, 1] = -0.2
    A[1, 0] = 0.2
    B = np.eye(nx)[:, :nu].copy()
    B[2, :] = 0.4
    c = np.zeros(nx)
    c[:] = (0.0, 0.0, 0.1)
    Q = 1e-2 * np.eye(nx)
    R = 1e-2 * np.eye(nu)
    N = 1e-5 * np.eye(nx, nu)
    Qf = np.eye(nx)
    if term_cstr:
        Qf = 0.0 * Qf
    x0 = np.array([0.2, 0.3, -0.1])

    arrays = {
        "A": A, "B": B, "c": c,
        "Q": Q, "R": R, "N": N,
        "q": np.zeros(nx), "r": np.zeros(nu), "c0": np.zeros(()),
        "Qf": Qf, "Nf": np.zeros((nx, nu)),
        "qf": np.zeros(nx), "rf": np.zeros(nu), "cf": np.zeros(()),
        "x0": x0,
    }
    manifest = {
        "format": "aligator-interchange-v1",
        "nsteps": 20,
        "nu": nu,
        "space": {"type": "vector", "n": nx},
        "x0": "@x0",
        "dynamics": {
            "type": "linear_discrete", "A": "@A", "B": "@B", "c": "@c"
        },
        "cost": [
            {
                "type": "quadratic",
                "Q": "@Q", "R": "@R", "N": "@N",
                "q": "@q", "r": "@r", "c": "@c0",
            }
        ],
        "term_cost": [
            {
                "type": "quadratic",
                "Q": "@Qf", "R": "@R", "N": "@Nf",
                "q": "@qf", "r": "@rf", "c": "@cf",
            }
        ],
        "constraints": [],
        "term_constraints": [],
    }
    if bounds:
        arrays["u_lo"] = -0.18 * np.ones(nu)
        arrays["u_hi"] = +0.18 * np.ones(nu)
        arrays["u_ref"] = np.zeros(nu)
        manifest["constraints"] = [
            {
                "function": {"type": "control_error", "target": "@u_ref"},
                "set": {"type": "box", "lower": "@u_lo", "upper": "@u_hi"},
            }
        ]
    if term_cstr:
        arrays["xtar2"] = 0.1 * np.ones(nx)
        manifest["term_constraints"] = [
            {
                "function": {"type": "state_error", "target": "@xtar2"},
                "set": {"type": "equality"},
            }
        ]
    return manifest, arrays


def se2_car_instance(nsteps=50):
    """examples/se2-car.hpp:63-103 parameters."""
    ndx, nu = 3, 2
    timestep = 0.05
    theta0 = 0.15355
    x0 = np.array([0.7, -0.1, np.cos(theta0), np.sin(theta0)])
    x_target = np.array([0.0, 0.0, 1.0, 0.0])  # SE2 neutral
    w_x = 0.01 * np.eye(ndx)
    w_term = 10.0 * w_x
    w_u = np.eye(nu)

    arrays = {
        "x0": x0,
        "xtar": x_target,
        "wx": w_x * timestep,
        "wu": w_u * timestep,
        "utar": np.zeros(nu),
        "wterm": w_term,
    }
    manifest = {
        "format": "aligator-interchange-v1",
        "nsteps": nsteps,
        "nu": nu,
        "space": {"type": "se2"},
        "x0": "@x0",
        "dynamics": {"type": "se2_car_euler", "timestep": timestep},
        "cost": [
            {"type": "quad_state", "target": "@xtar", "weights": "@wx"},
            {"type": "quad_control", "target": "@utar", "weights": "@wu"},
        ],
        "term_cost": [
            {"type": "quad_state", "target": "@xtar", "weights": "@wterm"}
        ],
        "constraints": [],
        "term_constraints": [],
    }
    return manifest, arrays


def main():
    outdir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "tests/data")
    outdir.mkdir(parents=True, exist_ok=True)
    write_instance(outdir / "ref_lqr.npz", *lqr_instance())
    write_instance(outdir / "ref_lqr_bounded.npz", *lqr_instance(bounds=True))
    write_instance(
        outdir / "ref_lqr_term_cstr.npz", *lqr_instance(term_cstr=True)
    )
    write_instance(outdir / "ref_se2_car.npz", *se2_car_instance())


if __name__ == "__main__":
    main()
