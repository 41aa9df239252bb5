"""Post-processing analysis: Strouhal number, vorticity, pressure.

Behavior-compatible with the reference's offline scripts
(scripts/lift.py:59-113 and scripts/visualise_results.py:45-53) but exposed
as library functions so the physics gates in tests/ can call them directly.
"""
from __future__ import annotations

import numpy as np


def find_peaks_1d(x: np.ndarray, prominence: float = 0.0) -> np.ndarray:
    """Indices of local maxima with at least the given prominence.

    Uses scipy when available (matching the reference's
    scipy.signal.find_peaks, lift.py:79); otherwise a self-contained
    implementation with the same prominence definition.
    """
    try:
        from scipy.signal import find_peaks
        peaks, _ = find_peaks(x, prominence=prominence)
        return peaks
    except ImportError:
        pass
    peaks = [i for i in range(1, len(x) - 1)
             if x[i] > x[i - 1] and x[i] >= x[i + 1]]
    if prominence <= 0:
        return np.asarray(peaks, dtype=int)
    out = []
    for i in peaks:
        # prominence: height above the higher of the two bounding minima,
        # where each bound extends to the nearest higher peak or the edge.
        left = x[:i + 1]
        higher_left = np.where(left > x[i])[0]
        lo = higher_left[-1] if len(higher_left) else 0
        right = x[i:]
        higher_right = np.where(right > x[i])[0]
        hi = i + (higher_right[0] if len(higher_right) else len(right) - 1)
        base = max(x[lo:i + 1].min(), x[i:hi + 1].min())
        if x[i] - base >= prominence:
            out.append(i)
    return np.asarray(out, dtype=int)


def strouhal_number(timesteps: np.ndarray, lift_coeff: np.ndarray,
                    inlet_velocity: float, diameter: float,
                    start: int = 30000, prominence: float = 0.5
                    ) -> dict | None:
    """St = f·D/U from the mean spacing of C_L peaks after `start`
    (reference lift.py:59-113: same defaults, same peak-spacing method).

    Returns a dict of intermediate values, or None if fewer than 2 peaks.
    """
    timesteps = np.asarray(timesteps)
    lift_coeff = np.asarray(lift_coeff)
    sel = timesteps >= start
    t, cl = timesteps[sel], lift_coeff[sel]
    if len(t) < 3:
        return None
    peaks = find_peaks_1d(cl, prominence=prominence)
    if len(peaks) < 2:
        return None
    periods = np.diff(t[peaks])
    avg_period = float(periods.mean())
    frequency = 1.0 / avg_period
    return {
        "strouhal": frequency * diameter / inlet_velocity,
        "frequency": frequency,
        "avg_period": avg_period,
        "n_peaks": int(len(peaks)),
        "peak_timesteps": t[peaks],
    }


def vorticity(ux: np.ndarray, uy: np.ndarray) -> np.ndarray:
    """ω = ∂uy/∂x − ∂ux/∂y via np.gradient on (ny, nx) grids
    (reference visualise_results.py:47-49)."""
    dudy, _dudx = np.gradient(ux)
    _dvdy, dvdx = np.gradient(uy)
    return dvdx - dudy


def pressure_deviation(rho: np.ndarray) -> np.ndarray:
    """p − p̄ = (ρ − ρ̄)/3, c_s² = 1/3 (reference visualise_results.py:51-53)."""
    return (rho - rho.mean()) / 3.0


def energy_spectrum(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Isotropic shell-binned kinetic-energy spectrum of a velocity field
    on a fully periodic box (lattice units, dx = 1).

    u: (D, *spatial) with spatial axes ordered like the solver state
    ((ny, nx) in 2-D, (nz, ny, nx) in 3-D; axis order does not matter for
    an isotropic binning). Returns (k, E): shell-center wavenumbers
    k_s = s·κ0 with κ0 = 2π/max(n_i) (the largest resolved scale), and
    shell energies normalized so that sum(E) equals the mean kinetic
    energy 0.5·⟨|u|²⟩ exactly (discrete Parseval; gated in
    tests/test_spectra.py). For a cubic box the shells coincide with the
    usual integer-mode shells |m| ≈ s.

    New capability — the reference has no turbulence statistics or
    spectral analysis at all (its post-processing is lift.py's peak
    finder and a field plotter).
    """
    u = np.asarray(u)
    D = u.shape[0]
    spatial = u.shape[1:]
    if len(spatial) != D:
        raise ValueError(f"u must be (D, *spatial) with D spatial axes; "
                         f"got shape {u.shape}")
    return _shell_binned(list(u), spatial)


def scalar_spectrum(T: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Isotropic shell-binned scalar-variance spectrum E_T(k) of a
    periodic scalar field (the passive-scalar / thermal analog of
    energy_spectrum): sum(E_T) = ½⟨T'²⟩ exactly, with the mean removed
    so shell 0 vanishes to roundoff (the Obukhov–Corrsin spectrum's
    discrete form)."""
    T = np.asarray(T, np.float64)
    return _shell_binned([T - T.mean()], T.shape)


def _shell_binned(comps, spatial) -> tuple[np.ndarray, np.ndarray]:
    """Shared isotropic shell binning: ½ Σ_c |ĉ_k|² per shell."""
    n_cells = int(np.prod(spatial))
    # Physical wavenumbers per axis: κ_i = 2π m_i / n_i (dx = 1).
    kappa0 = 2.0 * np.pi / max(spatial)
    axes = [2.0 * np.pi * np.fft.fftfreq(n) for n in spatial]  # = κ_i
    grids = np.meshgrid(*axes, indexing="ij")
    kmag = np.sqrt(sum(g * g for g in grids))
    shell = np.rint(kmag / kappa0).astype(int)

    # 0.5 Σ_k |û_k|² with û = FFT/N ⇒ Σ shells = 0.5·mean(|u|²).
    e_density = np.zeros(spatial)
    for c in comps:
        uhat = np.fft.fftn(c) / n_cells
        e_density += 0.5 * np.abs(uhat) ** 2
    n_shells = int(shell.max()) + 1
    E = np.bincount(shell.ravel(), weights=e_density.ravel(),
                    minlength=n_shells)
    k = kappa0 * np.arange(n_shells)
    return k, E


def turbulent_kinetic_energy(stats_npz) -> np.ndarray:
    """Per-cell TKE = ½⟨u_i'u_i'⟩ from a stats_fields.npz mapping
    (the --stats-from artifact): sums the diagonal Reynolds-stress
    components re_uxux [+ re_uyuy [+ re_uzuz]]."""
    tke = None
    for key in ("re_uxux", "re_uyuy", "re_uzuz"):
        if key in stats_npz:
            comp = np.asarray(stats_npz[key])
            tke = comp.copy() if tke is None else tke + comp
    if tke is None:
        raise KeyError("no re_u*u* diagonal components found "
                       "(not a stats_fields.npz artifact?)")
    return 0.5 * tke


def read_params_csv(path: str) -> dict:
    """Parse simulation_params.csv into {parameter: float}."""
    out = {}
    with open(path) as fh:
        next(fh)  # header
        for line in fh:
            key, val = line.strip().split(",", 1)
            out[key] = float(val)
    return out


def read_forces_csv(path: str) -> dict:
    data = np.genfromtxt(path, delimiter=",", names=True)
    data = np.atleast_1d(data)
    return {name: data[name] for name in data.dtype.names}
