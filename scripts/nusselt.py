#!/usr/bin/env python
"""Nusselt-number trace analysis for thermal (Rayleigh-Bénard) runs.

The thermal analog of scripts/lift.py: reads nusselt.csv (written every
output interval by the runner), plots Nu(t), and prints the steady-state
Nusselt number (mean over the converged tail) with its fluctuation. New
capability — the reference is isothermal and has no such trace.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".", help="directory with nusselt.csv")
    ap.add_argument("--tail", type=float, default=0.25,
                    help="fraction of the trace treated as steady state")
    ap.add_argument("--no-plot", action="store_true")
    args = ap.parse_args()

    path = os.path.join(args.dir, "nusselt.csv")
    try:
        data = np.genfromtxt(path, delimiter=",", names=True)
    except OSError as e:
        print(f"Error loading {path}: {e}. Run a thermal preset first.",
              file=sys.stderr)
        return 1
    t = np.atleast_1d(data["timestep"])
    nu = np.atleast_1d(data["nusselt"])
    k = max(1, int(len(nu) * args.tail))
    tail = nu[-k:]
    print(f"Samples: {len(nu)} (t = {int(t[0])} .. {int(t[-1])})")
    print(f"Steady-state Nusselt number (last {k} samples): "
          f"{tail.mean():.4f} ± {tail.std():.4f}")
    print(f"Peak Nu: {nu.max():.4f} at t = {int(t[np.argmax(nu)])}")

    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 5))
        ax.plot(t, nu, lw=1.5)
        ax.axhline(tail.mean(), color="crimson", ls="--",
                   label=f"steady Nu = {tail.mean():.3f}")
        ax.set_xlabel("timestep")
        ax.set_ylabel("Nusselt number")
        ax.set_title("Rayleigh-Bénard heat-transport history")
        ax.legend()
        out = os.path.join(args.dir, "nusselt_history.png")
        fig.savefig(out, dpi=150, bbox_inches="tight")
        print(f"Generated Nu(t) plot: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
