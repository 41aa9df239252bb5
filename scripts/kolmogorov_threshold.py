"""Kolmogorov-flow band-instability threshold: growth rate vs Re.

The laminar profile u_x = u0·cos(κy) driven by F_x = F0·cos(κy) is
linearly unstable to a large-scale transverse mode q (q ≪ κ) when the
Kolmogorov Reynolds number Re = u0/(νκ) exceeds the Meshalkin–Sinai
threshold Re_c = √2 (the q/κ → 0 asymptote; finite q shifts it up by
O(q²/κ²)). This script measures the exponential growth/decay rate λ of
the transverse kinetic energy E_perp(t) ∝ e^{2λt} for a sweep of Re on
a small periodic box and locates the zero crossing — a quantitative
bifurcation check of the whole forced-periodic machinery (force
calibration, periodic halos, BGK viscosity).

Writes <out>/threshold.csv (Re, rate per step, nu, tau) and, when
matplotlib is available, <out>/threshold.png with the measured crossing
vs the √2 line.

New capability — the reference has no forcing and no stability analysis
tooling (scripts/: a lift-peak counter and a field plotter).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def growth_rate(re: float, nx: int = 128, ny: int = 128, n_bands: int = 8,
                u0: float = 0.02, steps: int = 24000, sample: int = 500,
                verbose: bool = False) -> tuple[float, float, float]:
    """(rate, nu, tau): least-squares slope of ½·log E_perp(t) over the
    exponential window — samples are dropped once E_perp leaves the
    linear regime (> (0.2·u0)², perturbation no longer small) and the
    first 2000 steps are discarded (fast non-modal transients)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpulbm.config import SimulationParams
    from tpulbm.models import make_problem
    from tpulbm.models.periodic2d import kolmogorov_kappa
    from tpulbm.ops.step_jax import make_step_rolled

    kappa = 2.0 * np.pi * n_bands / ny
    nu = u0 / (re * kappa)
    tau = 0.5 + 3.0 * nu
    # f32 is ample: near-threshold rates are ~1e-6/step measured as a
    # Δ(½ log E) ≈ 0.02 over a 20k-step window, ~1e5 × the f32 roundoff
    # of the energy samples.
    params = SimulationParams(nx=nx, ny=ny, problem="kolmogorov",
                              kolmogorov_n=n_bands, tau=tau,
                              inlet_velocity=u0, periodic_x=True,
                              cylinder_radius=0.0, precision="f32")
    assert abs(kolmogorov_kappa(params) - kappa) < 1e-12
    pr = make_problem(params)
    step = jax.jit(make_step_rolled(pr))

    c = jnp.asarray(pr.lattice.c, jnp.float32)        # (Q, 2) [cx, cy]

    def e_perp(f):
        rho = jnp.sum(f, axis=0)
        my = jnp.tensordot(c[:, 1], f, axes=(0, 0))
        return 0.5 * jnp.mean((my / rho) ** 2)

    def run(f, k):
        return lax.fori_loop(0, k, lambda i, x: step(x), f)

    f = jnp.asarray(pr.initial_state())
    f = run(f, 2000)
    ts, es = [], []
    t = 2000
    cap = (0.2 * u0) ** 2 * 0.5
    while t < steps:
        ts.append(t)
        es.append(float(e_perp(f)))
        if es[-1] > cap:
            break
        f = run(f, sample)
        t += sample
    ts, es = np.asarray(ts, np.float64), np.asarray(es, np.float64)
    keep = es < cap
    ts, es = ts[keep], es[keep]
    if len(ts) < 4:
        raise RuntimeError(f"Re={re}: too few samples in the linear regime")
    # E ∝ e^{2λt}  →  λ = slope(½ log E)
    lam = np.polyfit(ts, 0.5 * np.log(es), 1)[0]
    if verbose:
        print(f"  Re={re:5.2f}  nu={nu:.4f} tau={tau:.4f} "
              f"rate={lam:+.3e}/step  ({len(ts)} samples)")
    return float(lam), nu, tau


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/kolmogorov_threshold")
    ap.add_argument("--re", type=float, nargs="*",
                    default=[1.0, 1.2, 1.4, 1.6, 1.8, 2.2])
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--ny", type=int, default=128)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax platform (before backend init)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for re in args.re:
        lam, nu, tau = growth_rate(re, nx=args.nx, ny=args.ny,
                                   n_bands=args.bands, steps=args.steps,
                                   verbose=True)
        rows.append((re, lam, nu, tau))
    path = os.path.join(args.out, "threshold.csv")
    with open(path, "w") as fh:
        fh.write("Re,rate_per_step,nu,tau\n")
        for r in rows:
            fh.write(f"{r[0]:.4f},{r[1]:.6e},{r[2]:.6f},{r[3]:.6f}\n")
    print(f"wrote {path}")

    arr = np.asarray(rows)
    # linear interpolation of the zero crossing
    sgn = np.sign(arr[:, 1])
    re_c = None
    for i in range(len(arr) - 1):
        if sgn[i] < 0 <= sgn[i + 1]:
            x0, x1 = arr[i, 0], arr[i + 1, 0]
            y0, y1 = arr[i, 1], arr[i + 1, 1]
            re_c = x0 - y0 * (x1 - x0) / (y1 - y0)
            break
    if re_c is not None:
        print(f"measured Re_c = {re_c:.3f}  (Meshalkin-Sinai q->0 "
              f"asymptote: sqrt(2) = {np.sqrt(2):.3f}; finite "
              f"q/kappa = {args.ny / (args.bands * args.nx):.3f} shifts "
              f"it up by O(q^2/kappa^2))")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5.4, 3.6))
        ax.axhline(0.0, color="0.6", lw=0.8)
        ax.axvline(np.sqrt(2), color="0.6", lw=0.8, ls="--",
                   label=r"$\sqrt{2}$ (analytic, $q/\kappa\to 0$)")
        ax.plot(arr[:, 0], arr[:, 1], "o-", color="#1f77b4",
                label="measured")
        if re_c is not None:
            ax.plot([re_c], [0.0], "s", color="#d62728",
                    label=f"crossing: Re_c = {re_c:.2f}")
        ax.set_xlabel(r"Re = $u_0/(\nu\kappa)$")
        ax.set_ylabel(r"growth rate $\lambda$ [1/step]")
        ax.set_title("Kolmogorov band instability threshold "
                     f"({args.nx}x{args.ny}, n={args.bands})")
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "threshold.png"), dpi=140)
        print(f"wrote {os.path.join(args.out, 'threshold.png')}")
    except Exception as e:  # matplotlib optional
        print(f"(no figure: {e})")


if __name__ == "__main__":
    main()
