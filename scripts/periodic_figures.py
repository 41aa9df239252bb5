"""Validation figures for the periodic model families (docs/validation):

* taylor_green_decay.png — measured kinetic-energy decay of the 2-D
  Taylor-Green vortex on top of the exact exp(-2 nu k^2 t) line, with the
  fitted nu_eff printed (the sharpest viscosity gate the suite has).
* shear_layer_rollup.png — vorticity of the Minion-Brown double shear
  layer at Re = 30,000 under the regularized operator (BGK diverges
  here), the classic roll-up figure.

Run: python scripts/periodic_figures.py [--out docs/validation]
CPU-friendly (jax tier).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def taylor_green_decay(out):
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpulbm import physics
    from tpulbm.config import SimulationParams
    from tpulbm.lattice import D2Q9
    from tpulbm.models import make_problem

    n, tau = 128, 0.8
    params = SimulationParams(nx=n, ny=n, tau=tau, problem="taylor-green",
                              inlet_velocity=0.04, periodic_x=True,
                              cylinder_radius=0.0, precision="f64")
    pr = make_problem(params)
    step = jax.jit(pr_step(pr))
    f = jnp.asarray(pr.initial_state())

    def energy(fv):
        rho, u = physics.moments(D2Q9, fv)
        return float(jnp.sum(rho * (u[0] ** 2 + u[1] ** 2)))

    ts, es = [0.0], [energy(f)]
    for k in range(30):
        f = lax.fori_loop(0, 200, lambda i, x: step(x), f)
        ts.append((k + 1) * 200.0)
        es.append(energy(f))
    ts, es = np.asarray(ts), np.asarray(es)
    k2 = 2.0 * (2.0 * np.pi / n) ** 2
    nu = params.nu()
    slope = np.polyfit(ts, np.log(es), 1)[0]
    nu_eff = -slope / (2.0 * k2)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axp = plt.subplots(figsize=(6, 4))
    axp.semilogy(ts, es / es[0], "o", ms=4, label="simulated")
    axp.semilogy(ts, np.exp(-2.0 * nu * k2 * ts), "-",
                 label=r"exact $e^{-2\nu k^2 t}$")
    axp.set_xlabel("timestep")
    axp.set_ylabel("kinetic energy / E(0)")
    axp.set_title(f"Taylor-Green decay, {n}$^2$, $\\tau$={tau}: "
                  f"$\\nu_{{eff}}$={nu_eff:.6f} vs $\\nu$={nu:.6f} "
                  f"({abs(nu_eff / nu - 1) * 100:.3f}%)")
    axp.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out, "taylor_green_decay.png"), dpi=130)
    print(f"taylor-green: nu_eff={nu_eff:.6f} nu={nu:.6f} "
          f"rel={abs(nu_eff / nu - 1):.2e}")


def pr_step(pr):
    from tpulbm.ops.step_jax import make_step_rolled
    return make_step_rolled(pr)


def shear_layer_rollup(out):
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpulbm import physics
    from tpulbm.config import PRESETS
    from tpulbm.lattice import D2Q9
    from tpulbm.models import make_problem

    params = PRESETS["shear-layer"].replace(precision="f32")
    pr = make_problem(params)
    step = jax.jit(pr_step(pr))
    f = jnp.asarray(pr.initial_state())
    # ~1 convective time: t* = t u0 / L; roll-up shows around t* ~ 1
    n = params.nx
    t_snap = int(1.0 * n / params.inlet_velocity)
    f = lax.fori_loop(0, t_snap, lambda i, x: step(x), f)
    rho, u = physics.moments(D2Q9, f)
    ux, uy = np.asarray(u[0]), np.asarray(u[1])
    # periodic-aware central-difference vorticity
    vort = (0.5 * (np.roll(uy, -1, 1) - np.roll(uy, 1, 1))
            - 0.5 * (np.roll(ux, -1, 0) - np.roll(ux, 1, 0)))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axp = plt.subplots(figsize=(5.4, 5))
    m = np.abs(vort).max()
    im = axp.imshow(vort, origin="lower", cmap="RdBu_r", vmin=-m, vmax=m)
    axp.set_title(f"Double shear layer, Re=30k, {n}$^2$, regularized BGK\n"
                  f"vorticity at $t^*\\approx$1 (BGK diverges here)")
    fig.colorbar(im, ax=axp, shrink=0.85)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "shear_layer_rollup.png"), dpi=130)
    print(f"shear-layer: snapshot at t={t_snap}, |vort|max={m:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/validation")
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)
    taylor_green_decay(args.out)
    shear_layer_rollup(args.out)


if __name__ == "__main__":
    main()
