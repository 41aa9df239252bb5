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
