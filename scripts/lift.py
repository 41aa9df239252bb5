#!/usr/bin/env python
"""Lift-coefficient plot + Strouhal-number extraction from forces.csv.

Behavior-compatible rebuild of the reference analysis (scripts/lift.py):
same inputs (forces.csv, simulation_params.csv), same outputs
(lift_coefficient_plot.png + a printed Strouhal table), same method
(C_L peak spacing for t >= 30000, prominence 0.5) — with a CLI for the
thresholds the reference hard-codes.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tpulbm.utils.analysis import (read_forces_csv, read_params_csv,
                                   strouhal_number)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".", help="directory with the CSVs")
    ap.add_argument("--start", type=int, default=30000,
                    help="steady-state start timestep")
    ap.add_argument("--prominence", type=float, default=0.5)
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--signal", choices=["forces", "probe"],
                    default="forces",
                    help="shedding signal: the lift coefficient from "
                         "forces.csv, or the cross-stream velocity of the "
                         "first probe in probes.csv (--probe wake rake)")
    ap.add_argument("--probe-index", type=int, default=0,
                    help="which probe column to use with --signal probe")
    args = ap.parse_args()

    params_path = os.path.join(args.dir, "simulation_params.csv")
    try:
        if args.signal == "probe":
            import csv as _csv
            with open(os.path.join(args.dir, "probes.csv")) as fh:
                rows = list(_csv.DictReader(fh))
            t = np.array([float(r["timestep"]) for r in rows])
            cl = np.array([float(r[f"p{args.probe_index}_uy"])
                           for r in rows])
        else:
            forces = read_forces_csv(os.path.join(args.dir, "forces.csv"))
            t = forces["timestep"]
            cl = forces["lift_coeff"]
        params = read_params_csv(params_path)
    except OSError as e:
        print(f"Error: {e}\nRun the solver first to produce the CSVs.",
              file=sys.stderr)
        return 1
    U = params["inlet_velocity"]
    D = 2.0 * params["cylinder_radius"]
    reynolds = params.get("reynolds_number")

    if not args.no_plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.figure(figsize=(12, 7))
            plt.plot(t, cl, label="Calculated $C_L$")
            title = "Lift Coefficient ($C_L$) vs. Timestep"
            if reynolds is not None:
                title += f" (Re $\\approx$ {reynolds:.1f})"
            plt.title(title, fontsize=16)
            plt.xlabel("Timestep")
            plt.ylabel("Lift Coefficient ($C_L$)")
            if t.max() > args.start:
                plt.xlim(left=args.start)
            plt.legend()
            plt.grid(True, alpha=0.4)
            plt.tight_layout()
            out = os.path.join(args.dir, "lift_coefficient_plot.png")
            plt.savefig(out, dpi=300, bbox_inches="tight")
            print(f"Saved plot to {out}")
        except ImportError:
            print("matplotlib unavailable; skipping plot", file=sys.stderr)

    result = strouhal_number(t, cl, U, D, start=args.start,
                             prominence=args.prominence)
    if result is None:
        print(f"Could not find >= 2 C_L peaks after t={args.start}; "
              f"try --start/--prominence.", file=sys.stderr)
        return 1

    print("\nStrouhal Number Calculation:")
    print("--------------------------------")
    print(f"  Inlet Velocity (U): {U:.4f} (lattice units)")
    print(f"  Cylinder Diameter (D): {D:.1f} (lattice units)")
    print(f"  Steady-state analysis from timestep: {args.start}")
    print(f"  Number of peaks found: {result['n_peaks']}")
    print(f"  Average Period (T): {result['avg_period']:.2f} (timesteps)")
    print(f"  Shedding Frequency (f): {result['frequency']:.6f} (cycles/timestep)")
    print("--------------------------------")
    print(f"  Strouhal Number (St = f*D/U): {result['strouhal']:.4f}")
    print("--------------------------------")
    print("\nFor Re ~ 200 the expected Strouhal number is ~0.19-0.21.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
