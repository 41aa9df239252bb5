"""Grid-convergence study: Bouzidi curved-wall vs staircase bounce-back
drag on the confined cylinder at Re = 20 (steady twin-vortex regime).

The voxelized cylinder's effective diameter wobbles by O(1) cell as the
grid coarsens; the Bouzidi closure pins the wall to the analytic circle,
so its C_D should converge faster and sit closer to the fine-grid value
at every resolution. Writes docs/validation/bouzidi_convergence.csv and
(with matplotlib) bouzidi_convergence.png.

Run: python scripts/bouzidi_convergence.py [--quick]
(CPU-friendly: jax tier; ~tens of minutes for the full ladder on a
laptop-class core — the curved-wall mode runs on the jax tier by design.)
"""
import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def run_case(ny, bc, re=20.0, u=0.05, radius_frac=0.08, steps=None):
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpulbm.config import SimulationParams
    from tpulbm.models import make_problem
    from tpulbm.ops import forces as forces_mod
    from tpulbm.ops.bouzidi import link_q
    from tpulbm.ops.step_jax import make_step_rolled

    r = int(radius_frac * ny)
    d = 2 * r
    nu = u * d / re
    tau = 0.5 + 3.0 * nu
    params = SimulationParams(nx=4 * ny, ny=ny, tau=tau, inlet_velocity=u,
                              cylinder_radius=radius_frac, cylinder_x=0.25,
                              precision="f32", obstacle_bc=bc)
    pr = make_problem(params)
    step = jax.jit(make_step_rolled(pr))
    ffn = jax.jit(forces_mod.forces_fn(pr))
    steps = steps or 60 * ny             # diffusive settling scales with ny
    f = jnp.asarray(pr.initial_state())
    f = lax.fori_loop(0, steps, lambda i, x: step(x), f)
    q = jnp.asarray(link_q(pr)) if bc == "bouzidi" else None
    force = np.asarray(ffn(f, q) if q is not None else ffn(f))
    cd, cl = forces_mod.force_coefficients(pr, force)
    return cd, cl, d, tau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="drop the finest grid (CI-speed smoke)")
    ap.add_argument("--out", default="docs/validation")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    sizes = [50, 100] if args.quick else [50, 100, 200]
    rows = []
    for ny in sizes:
        for bc in ("bounce_back", "bouzidi"):
            cd, cl, d, tau = run_case(ny, bc)
            rows.append(dict(ny=ny, diameter=d, tau=round(tau, 4), bc=bc,
                             cd=round(cd, 4), cl=round(cl, 5)))
            print(f"ny={ny:4d} D={d:3d} {bc:>11s}: C_D={cd:.4f} "
                  f"C_L={cl:+.5f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "bouzidi_convergence.csv")
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axp = plt.subplots(figsize=(6, 4))
        for bc, marker in (("bounce_back", "s"), ("bouzidi", "o")):
            pts = [(r_["ny"], r_["cd"]) for r_ in rows if r_["bc"] == bc]
            axp.plot([p[0] for p in pts], [p[1] for p in pts],
                     marker=marker, label=bc)
        axp.set_xlabel("grid height ny (D = 0.16 ny)")
        axp.set_ylabel("C_D at Re = 20")
        axp.set_xscale("log")
        axp.legend()
        axp.set_title("Confined cylinder drag: staircase vs Bouzidi")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "bouzidi_convergence.png"),
                    dpi=130)
        print("wrote figure")
    except Exception as e:                      # matplotlib optional
        print(f"figure skipped ({e})")


if __name__ == "__main__":
    main()
