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


def load_field_3d(path: str, axis: str, index: int | None):
    """Mid-plane (or given-index) slice of a 3-D run's fields3d.npz as the
    2-D field dict the panels expect, plus (params, slice_label).

    axis 'z' → (ny, nx) slice of (ux, uy); 'y' → (nz, nx) of (ux, uz);
    'x' → (nz, ny) of (uy, uz). In-plane coordinates keep lattice units.
    """
    import json

    with np.load(path) as d:
        params = json.loads(bytes(d["params"]).decode()) if "params" in d \
            else {}
        ax_i = {"z": 0, "y": 1, "x": 2}[axis]
        n_ax = d["rho"].shape[ax_i]
        k = n_ax // 2 if index is None else index
        sel = tuple(k if i == ax_i else slice(None) for i in range(3))
        rho = d["rho"][sel]
        u_in_plane = {
            "z": ("ux", "uy"), "y": ("ux", "uz"), "x": ("uy", "uz"),
        }[axis]
        u1 = d[u_in_plane[0]][sel]
        u2 = d[u_in_plane[1]][sel]
    n2, n1 = rho.shape
    yy, xx = np.mgrid[0:n2, 0:n1].astype(float)
    mag = np.sqrt(u1 * u1 + u2 * u2)
    field = {"x": xx, "y": yy, "ux": u1, "uy": u2,
             "velocity_magnitude": mag, "rho": rho}
    return field, params, f"{axis}={k}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".", help="directory with the CSVs")
    ap.add_argument("--out", default=None, help="output PNG path")
    ap.add_argument("--slice", choices=["z", "y", "x"], default="z",
                    help="slicing axis for 3-D runs (fields3d.npz)")
    ap.add_argument("--slice-index", type=int, default=None,
                    help="slice position for 3-D runs (default: mid-plane)")
    ap.add_argument("--force-2d", action="store_true",
                    help="ignore fields3d.npz even if present")
    args = ap.parse_args()

    slice_label = None
    npz = os.path.join(args.dir, "fields3d.npz")
    csv = os.path.join(args.dir, "velocity_field.csv")
    # A directory reused for a later 2-D run still holds the old 3-D npz;
    # prefer whichever artifact is newer so stale data never wins silently.
    use_3d = (not args.force_2d and os.path.exists(npz)
              and (not os.path.exists(csv)
                   or os.path.getmtime(npz) >= os.path.getmtime(csv)))
    try:
        if use_3d:
            field, p3, slice_label = load_field_3d(npz, args.slice,
                                                   args.slice_index)
            ny, nx = field["rho"].shape
            # overlay circle: the slicing plane's cut through the sphere
            nx3, ny3, nz3 = (int(p3.get(k, 0)) for k in ("nx", "ny", "nz"))
            cx = int(p3.get("cylinder_x", 0.2) * nx3)
            cy = int(p3.get("cylinder_y", 0.5) * ny3)
            cz = nz3 // 2
            r = int(p3.get("cylinder_radius", 0.05) * ny3)
            centers = {"z": ((cx, cy), cz), "y": ((cx, cz), cy),
                       "x": ((cy, cz), cx)}[args.slice]
            k = {"z": nz3, "y": ny3, "x": nx3}[args.slice] // 2 \
                if args.slice_index is None else args.slice_index
            d2 = r * r - (k - centers[1]) ** 2
            params = {"nx": nx, "ny": ny,
                      "cylinder_x": centers[0][0], "cylinder_y": centers[0][1],
                      "cylinder_radius": int(np.sqrt(d2)) if d2 > 0 else 0,
                      "reynolds_number": float("nan")}
        else:
            params = read_params_csv(os.path.join(args.dir,
                                                  "simulation_params.csv"))
            nx, ny = int(params["nx"]), int(params["ny"])
            field = load_field(os.path.join(args.dir, "velocity_field.csv"),
                               ny, nx)
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

    # thermal runs (rayleigh-benard) also write temperature_field.csv —
    # show T instead of the pressure panel (new capability, no reference
    # analog)
    temp = None
    tpath = os.path.join(args.dir, "temperature_field.csv")
    if slice_label is None and os.path.exists(tpath):
        tdata = np.genfromtxt(tpath, delimiter=",", names=True)
        temp = tdata["temperature"].reshape(ny, nx)

    def draw_cylinder(ax):
        if cyl[2] > 0:
            ax.add_artist(plt.Circle(cyl[:2], cyl[2], color="black", zorder=10))

    fig, axes = plt.subplots(2, 2, figsize=(18, 10))
    if slice_label:
        title = f"LBM Sphere Flow Analysis (slice {slice_label})"
    elif temp is not None:
        title = "LBM Thermal Convection Analysis (Rayleigh-Bénard)"
    else:
        title = f"LBM Cylinder Flow Analysis (Re ≈ {re:.1f})"
    fig.suptitle(title, fontsize=20, fontweight="bold")

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
    if temp is not None:
        cf = ax.contourf(x, y, temp, levels=100, cmap="coolwarm")
        fig.colorbar(cf, ax=ax, label="Temperature")
        ax.set_title("Temperature Field")
    else:
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
