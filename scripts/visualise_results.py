#!/usr/bin/env python
"""4-panel flow-analysis figure from velocity_field.csv.

Behavior-compatible rebuild of the reference visualization
(scripts/visualise_results.py): velocity magnitude, streamlines, vorticity
(np.gradient curl), and pressure (ρ−ρ̄)/3 panels → cylinder_flow_analysis.png.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tpulbm.utils.analysis import pressure_deviation, read_params_csv, vorticity


def load_field(path: str, ny: int, nx: int) -> dict:
    data = np.genfromtxt(path, delimiter=",", names=True)
    return {name: data[name].reshape(ny, nx) for name in data.dtype.names}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".", help="directory with the CSVs")
    ap.add_argument("--out", default=None, help="output PNG path")
    args = ap.parse_args()

    try:
        params = read_params_csv(os.path.join(args.dir, "simulation_params.csv"))
        nx, ny = int(params["nx"]), int(params["ny"])
        field = load_field(os.path.join(args.dir, "velocity_field.csv"), ny, nx)
    except OSError as e:
        print(f"Error loading data: {e}. Run the solver first.", file=sys.stderr)
        return 1

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x, y = field["x"], field["y"]
    ux, uy = field["ux"], field["uy"]
    mag = field["velocity_magnitude"]
    rho = field.get("rho", np.ones((ny, nx)))
    vort = vorticity(ux, uy)
    pres = pressure_deviation(rho)

    cyl = (int(params["cylinder_x"]), int(params["cylinder_y"]),
           int(params["cylinder_radius"]))
    re = params.get("reynolds_number", float("nan"))

    def draw_cylinder(ax):
        if cyl[2] > 0:
            ax.add_artist(plt.Circle(cyl[:2], cyl[2], color="black", zorder=10))

    fig, axes = plt.subplots(2, 2, figsize=(18, 10))
    fig.suptitle(f"LBM Cylinder Flow Analysis (Re ≈ {re:.1f})",
                 fontsize=20, fontweight="bold")

    ax = axes[0, 0]
    cf = ax.contourf(x, y, mag, levels=100, cmap="viridis")
    fig.colorbar(cf, ax=ax, label="Velocity Magnitude")
    ax.set_title("Velocity Magnitude Field")
    draw_cylinder(ax)

    ax = axes[0, 1]
    step = max(1, ny // 40)
    ax.streamplot(x[::step, ::step], y[::step, ::step],
                  ux[::step, ::step], uy[::step, ::step],
                  color=mag[::step, ::step], cmap="autumn",
                  density=2.0, linewidth=1.0, arrowsize=1.0)
    ax.set_title("Flow Streamlines")
    ax.set_facecolor("lightgray")
    draw_cylinder(ax)

    ax = axes[1, 0]
    vlim = np.abs(vort).max() * 0.5 or 1.0
    cf = ax.contourf(x, y, vort, levels=100, cmap="RdBu_r",
                     vmin=-vlim, vmax=vlim)
    fig.colorbar(cf, ax=ax, label="Vorticity (ω)")
    ax.set_title("Vorticity Field")
    draw_cylinder(ax)

    ax = axes[1, 1]
    plim = np.abs(pres).max() or 1.0
    cf = ax.contourf(x, y, pres, levels=100, cmap="coolwarm",
                     vmin=-plim, vmax=plim)
    fig.colorbar(cf, ax=ax, label="Pressure (p - p_avg)")
    ax.set_title("Pressure Field")
    draw_cylinder(ax)

    for ax in axes.flat:
        ax.set_xlabel("x-coordinate")
        ax.set_ylabel("y-coordinate")
        ax.set_aspect("equal")
        ax.margins(x=0, y=0)

    plt.tight_layout(rect=[0, 0, 1, 0.95])
    out = args.out or os.path.join(args.dir, "cylinder_flow_analysis.png")
    plt.savefig(out, dpi=150)
    print(f"Generated comprehensive analysis plot: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
