"""Kinetic-energy spectra and turbulence statistics from run artifacts.

Sources (auto-detected in --dir, newest preferred):
* fields3d.npz            — final 3-D instantaneous fields
* velocity_field.csv      — final 2-D instantaneous fields
* stats_fields.npz        — the --stats-from artifact; with --mean the
  spectrum is of the TIME-MEAN velocity field, and the per-cell
  turbulent kinetic energy ½⟨u_i'u_i'⟩ summary is printed either way.

Outputs spectrum.csv (k, E) in --dir and, when matplotlib is available,
spectrum.png (log-log E(k) with a k^-5/3 guide line for 3-D runs).

New capability — the reference has no spectral analysis; its offline
post-processing is a lift-peak counter and a field plotter
(scripts/lift.py, scripts/visualise_results.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tpulbm.utils.analysis import (energy_spectrum,  # noqa: E402
                                   turbulent_kinetic_energy)


def load_velocity(dirpath: str, use_mean: bool):
    """(u, label) from the newest matching artifact in dirpath."""
    stats = os.path.join(dirpath, "stats_fields.npz")
    if use_mean:
        if not os.path.exists(stats):
            raise FileNotFoundError(f"--mean needs {stats} (run with "
                                    "--stats-from)")
        z = np.load(stats)
        comps = [z[f"mean_u{a}"] for a in "xyz" if f"mean_u{a}" in z]
        return np.stack(comps), f"mean field ({int(z['n_samples'])} samples)"
    cands = []
    npz = os.path.join(dirpath, "fields3d.npz")
    if os.path.exists(npz):
        cands.append((os.path.getmtime(npz), npz))
    csv = os.path.join(dirpath, "velocity_field.csv")
    if os.path.exists(csv):
        cands.append((os.path.getmtime(csv), csv))
    if not cands:
        raise FileNotFoundError(
            f"no fields3d.npz / velocity_field.csv in {dirpath}")
    path = max(cands)[1]
    if path.endswith(".npz"):
        z = np.load(path)
        return np.stack([z["ux"], z["uy"], z["uz"]]), "final 3-D field"
    data = np.genfromtxt(path, delimiter=",", names=True)
    nx = int(data["x"].max()) + 1
    ny = int(data["y"].max()) + 1
    ux = data["ux"].reshape(ny, nx)
    uy = data["uy"].reshape(ny, nx)
    return np.stack([ux, uy]), "final 2-D field"


def load_scalar(dirpath: str):
    """(T, label) from temperature_field.csv (thermal / passive-scalar)."""
    path = os.path.join(dirpath, "temperature_field.csv")
    if not os.path.exists(path):
        raise FileNotFoundError(f"--scalar needs {path} (thermal or "
                                "passive-scalar run)")
    data = np.genfromtxt(path, delimiter=",", names=True)
    nx = int(data["x"].max()) + 1
    ny = int(data["y"].max()) + 1
    return data["temperature"].reshape(ny, nx), "scalar field"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dir", default=".", help="run output directory")
    ap.add_argument("--mean", action="store_true",
                    help="spectrum of the time-mean field (stats_fields.npz)")
    ap.add_argument("--scalar", action="store_true",
                    help="scalar-variance spectrum E_T(k) of "
                         "temperature_field.csv instead of the velocity "
                         "(writes scalar_spectrum.csv/png)")
    ap.add_argument("--no-plot", action="store_true")
    args = ap.parse_args(argv)

    if args.scalar:
        from tpulbm.utils.analysis import scalar_spectrum
        T, label = load_scalar(args.dir)
        k, E = scalar_spectrum(T)
        print(f"source: {label}  shape={T.shape}")
        print(f"scalar half-variance 0.5<T'^2> = {E.sum():.6e}")
        peak = int(np.argmax(E[1:]) + 1) if len(E) > 1 else 0
        print(f"peak shell: k={k[peak]:.4f} (E_T={E[peak]:.3e})")
        out_csv = os.path.join(args.dir, "scalar_spectrum.csv")
        with open(out_csv, "w") as fh:
            fh.write("k,E_T\n")
            fh.writelines(f"{kk:.8e},{ee:.8e}\n" for kk, ee in zip(k, E))
        print(f"wrote {out_csv}")
        if not args.no_plot:
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
            except ImportError:
                print("matplotlib unavailable; skipping scalar_spectrum.png")
                return
            fig, ax = plt.subplots(figsize=(6, 4.5))
            pos = (k > 0) & (E > 0)
            ax.loglog(k[pos], E[pos], "o-", ms=3, lw=1,
                      label=r"$E_T(k)$, " + label)
            ax.set_xlabel("k (lattice units)")
            ax.set_ylabel(r"$E_T(k)$")
            ax.legend()
            fig.tight_layout()
            out_png = os.path.join(args.dir, "scalar_spectrum.png")
            fig.savefig(out_png, dpi=120)
            print(f"wrote {out_png}")
        return

    u, label = load_velocity(args.dir, args.mean)
    k, E = energy_spectrum(u)
    ke = float(E.sum())
    print(f"source: {label}  shape={u.shape[1:]}  D={u.shape[0]}")
    print(f"mean kinetic energy 0.5<|u|^2> = {ke:.6e}")
    peak = int(np.argmax(E[1:]) + 1) if len(E) > 1 else 0
    print(f"peak shell: k={k[peak]:.4f} (E={E[peak]:.3e})")

    out_csv = os.path.join(args.dir, "spectrum.csv")
    with open(out_csv, "w") as fh:
        fh.write("k,E\n")
        fh.writelines(f"{kk:.8e},{ee:.8e}\n" for kk, ee in zip(k, E))
    print(f"wrote {out_csv}")

    stats = os.path.join(args.dir, "stats_fields.npz")
    if os.path.exists(stats):
        z = np.load(stats)
        try:
            tke = turbulent_kinetic_energy(z)
            print(f"TKE (from Reynolds stresses): mean={tke.mean():.6e} "
                  f"max={tke.max():.6e}")
        except KeyError:
            pass

    if not args.no_plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping spectrum.png")
            return
        fig, ax = plt.subplots(figsize=(6, 4.5))
        pos = (k > 0) & (E > 0)
        ax.loglog(k[pos], E[pos], "o-", ms=3, lw=1, label=f"E(k), {label}")
        if u.shape[0] == 3 and pos.sum() > 3:
            kref = k[pos]
            eref = E[pos][0] * (kref / kref[0]) ** (-5.0 / 3.0)
            ax.loglog(kref, eref, "k--", lw=0.8, label=r"$k^{-5/3}$")
        ax.set_xlabel("k (lattice units)")
        ax.set_ylabel("E(k)")
        ax.legend()
        fig.tight_layout()
        out_png = os.path.join(args.dir, "spectrum.png")
        fig.savefig(out_png, dpi=120)
        print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
