"""Thermal (double-population) step — jax tier.

One step of the coupled Boussinesq system on the stacked state
s = [f (Q_f planes); g (Q_g planes)] (see models/base.ThermalConfig):

  1. moments: rho, u from f; T = Σ g
  2. collide f: BGK (or +Smagorinsky) toward equilibrium(rho, u), plus the
     per-cell buoyancy source S_i = 3 w_i c_iy · F_y, F_y = buoyancy·(T −
     t_ref) — the same post-relaxation source convention as physics.collide
     (injects exactly F per step, tau-independent)
  3. collide g: BGK toward the advection-diffusion equilibrium
     w_i T (1 + 3 c·u) at rate 1/tau_g
  4. pull-stream all planes (x periodic; y pulls that cross a wall read
     frozen ghost values: rest equilibrium for f, w_i·T_wall for g)
  5. BCs on the wall rows: bounce-back for f (no-slip), anti-bounce-back
     Dirichlet for g (boundaries.apply_thermal_wall)

No reference analog — the reference is strictly isothermal. The step is
shape-generic over (ny, nx); sharded execution reuses the generic halo
machinery (the state is one array, so rings/ppermute see one extra group
of planes).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from .. import physics
from ..models.base import Problem
from . import boundaries


def _thermal_parts(problem: Problem):
    lat, th = problem.lattice, problem.thermal
    if th is None:
        raise ValueError("step_thermal needs problem.thermal")
    return lat, th.lattice, th


def collide_thermal(problem: Problem, s: jnp.ndarray) -> jnp.ndarray:
    """Post-collision stacked state (pointwise; safe on halo cells)."""
    lat, lg, th = _thermal_parts(problem)
    Qf = lat.Q
    f, g = s[:Qf], s[Qf:]
    inv_tau = 1.0 / problem.params.tau
    rho, u = physics.moments(lat, f)
    T = jnp.sum(g, axis=0)

    feq = physics.equilibrium(lat, rho, u)
    if problem.smagorinsky:
        devs = f - feq
        inv_t = physics.smagorinsky_inv_tau(lat, 1.0 / rho, devs,
                                            inv_tau, problem.smagorinsky)
        f_post = f - inv_t[None] * devs
    else:
        f_post = f - inv_tau * (f - feq)
    # Boussinesq buoyancy along th.buoyancy_axis (1 = y for Rayleigh-
    # Bénard, 0 = x for the side-heated cavity):
    # S_i = 3 w_i c_i,axis · buoyancy·(T − t_ref)
    if th.buoyancy:
        fy = th.buoyancy * (T - th.t_ref)
        ca = lat.c[:, th.buoyancy_axis]
        planes = []
        for i in range(Qf):
            cia = int(ca[i])
            if cia == 0:
                planes.append(f_post[i])
            else:
                planes.append(f_post[i]
                              + (3.0 * float(lat.w[i]) * cia) * fy)
        f_post = jnp.stack(planes)

    geq = physics.thermal_equilibrium(lg, T, u)
    g_post = g - (1.0 / th.tau_g) * (g - geq)
    return jnp.concatenate([f_post, g_post], axis=0)


def _ghost_rows(problem: Problem):
    """Frozen ghost values pulled through the y walls, per plane:
    rest equilibrium for f (resting walls), w_i·T_wall for g."""
    lat, lg, th = _thermal_parts(problem)
    dt = problem.dtype
    f_ghost = physics.rest_equilibrium(lat, dt)
    g_bottom = (lg.w * th.t_bottom).astype(dt)
    g_top = (lg.w * th.t_top).astype(dt)
    bottom = np.concatenate([f_ghost, g_bottom])
    top = np.concatenate([f_ghost, g_top])
    return bottom, top


def make_step_thermal(problem: Problem) -> Callable[[jnp.ndarray],
                                                    jnp.ndarray]:
    """Single-device oracle step on the unpadded global stacked state."""
    lat, lg, th = _thermal_parts(problem)
    Qf = lat.Q
    ny, nx = problem.spatial_shape
    walls_x = problem.walls_x
    if not problem.periodic_x and not walls_x:
        raise NotImplementedError("thermal models are periodic in x or "
                                  "x-walled (side-heated cavity)")
    c_all = np.concatenate([lat.c, lg.c], axis=0)
    ghost_bottom, ghost_top = _ghost_rows(problem)

    # Fully periodic scalar transport (walls_y=False + periodic_y, the
    # passive-scalar problems): jnp.roll already wraps every pull, so the
    # wall machinery below (frozen ghost rows, bounce-back, Dirichlet) is
    # simply skipped — the scalar advects/diffuses through the seams.
    walls_y = problem.walls_y
    if not walls_y and not problem.periodic_y:
        raise NotImplementedError("thermal models need y walls or "
                                  "periodic_y")

    def step(s: jnp.ndarray) -> jnp.ndarray:
        s_post = collide_thermal(problem, s)
        yy = jnp.arange(ny)[:, None]
        xx = jnp.arange(nx)[None, :]
        planes = []
        for i in range(problem.state_q):
            cix, ciy = int(c_all[i, 0]), int(c_all[i, 1])
            plane = jnp.roll(s_post[i], (ciy, cix), (0, 1))
            # pulls that crossed a wall read the frozen ghost row
            if walls_y and ciy > 0:
                plane = jnp.where(yy == 0,
                                  jnp.asarray(ghost_bottom[i], plane.dtype),
                                  plane)
            elif walls_y and ciy < 0:
                plane = jnp.where(yy == ny - 1,
                                  jnp.asarray(ghost_top[i], plane.dtype),
                                  plane)
            planes.append(plane)
        f_planes = planes[:Qf]
        g_planes = planes[Qf:]
        if walls_x:
            # adiabatic, no-slip x walls (side-heated cavity): BOTH f and g
            # take exact-mass full-way bounce-back — the node's own
            # post-collision outward values return, so the wall-normal
            # momentum AND heat flux vanish identically (the g version IS
            # the zero-flux/adiabatic closure). D2Q5 has no diagonals, so
            # the Dirichlet y rows and these columns touch disjoint g
            # populations at the corners; for f the corner double-write is
            # consistent (both walls assign the same opposite).
            opp_all = np.concatenate([lat.opposite, Qf + lg.opposite])
            for i in range(problem.state_q):
                cix = int(c_all[i, 0])
                tgt = f_planes if i < Qf else g_planes
                k = i if i < Qf else i - Qf
                if cix > 0:
                    tgt[k] = jnp.where(xx == 0, s_post[int(opp_all[i])],
                                       tgt[k])
                elif cix < 0:
                    tgt[k] = jnp.where(xx == nx - 1, s_post[int(opp_all[i])],
                                       tgt[k])
        # No-slip walls for f: full-way bounce-back with the node's OWN
        # post-collision outward values (what actually streamed out
        # through the wall comes straight back), which conserves mass at
        # the wall EXACTLY — unlike the reference-parity on-node
        # reflection of post-stream opposites (boundaries.apply_walls),
        # whose systematic y-gradient imbalance was measured here at
        # +2.6e-6 mass/step (it would swamp a long Nu measurement).
        if walls_y:
            opp = lat.opposite
            for i in range(Qf):
                ciy = int(lat.c[i, 1])
                if ciy > 0:
                    f_planes[i] = jnp.where(yy == 0, s_post[int(opp[i])],
                                            f_planes[i])
                elif ciy < 0:
                    f_planes[i] = jnp.where(yy == ny - 1,
                                            s_post[int(opp[i])],
                                            f_planes[i])
            # fixed-T (anti-bounce-back) walls for g — heat flux through
            # the walls is physical (that IS the Nusselt number)
            boundaries.apply_thermal_wall(lg, g_planes, yy == 0, 1, +1,
                                          th.t_bottom, None)
            boundaries.apply_thermal_wall(lg, g_planes, yy == ny - 1, 1, -1,
                                          th.t_top, None)
        return jnp.stack(f_planes + g_planes)

    return step


def make_local_step_padded_thermal(problem: Problem,
                                   local_shape: tuple[int, ...] | None = None):
    """Thermal step on a halo-padded local block — same contract as
    step_jax.make_local_step_padded (step(spad, solid_local, offsets,
    solid_pad) -> spad_new), so the generic sharded chunk body
    (parallel/sharded_step.body_jax: ring refresh via ppermute + scan)
    carries over unchanged; the stacked state just has Q_f + Q_g planes.
    """
    lat, lg, th = _thermal_parts(problem)
    Qf, Qs = lat.Q, problem.state_q
    shape = local_shape or problem.spatial_shape
    nyl, nxl = shape
    p = problem.params
    walls_x = problem.walls_x
    if not problem.periodic_x and not walls_x:
        raise NotImplementedError("thermal models are periodic in x or "
                                  "x-walled (side-heated cavity)")
    c_all = np.concatenate([lat.c, lg.c], axis=0)
    ghost_bottom, ghost_top = _ghost_rows(problem)
    opp_f = lat.opposite
    opp_all = np.concatenate([lat.opposite, Qf + lg.opposite])

    # Fully periodic scalar transport: the generic ring refresh already
    # wraps the halo rims (halo.refresh_ring periodic_y), so no shard is
    # ever a physical y wall — all wall selects below fold away.
    phys_y = problem.walls_y
    if not phys_y and not problem.periodic_y:
        raise NotImplementedError("thermal models need y walls or "
                                  "periodic_y")

    def step(spad, solid_local, offsets, solid_pad=None):
        dt = spad.dtype
        y0 = offsets[-2]
        is_bottom = jnp.logical_and(y0 == 0, phys_y)
        is_top = jnp.logical_and(y0 + nyl == p.ny, phys_y)
        s_post = collide_thermal(problem, spad)
        # physical y rims: frozen ghost rows (per-wall values for g)
        gb = jnp.broadcast_to(jnp.asarray(ghost_bottom, dt)[:, None],
                              (Qs, nxl + 2))
        gt = jnp.broadcast_to(jnp.asarray(ghost_top, dt)[:, None],
                              (Qs, nxl + 2))
        s_post = s_post.at[:, 0, :].set(
            jnp.where(is_bottom, gb, s_post[:, 0, :]))
        s_post = s_post.at[:, -1, :].set(
            jnp.where(is_top, gt, s_post[:, -1, :]))
        planes = []
        for i in range(Qs):
            cix, ciy = int(c_all[i, 0]), int(c_all[i, 1])
            slicer = (slice(1 - ciy, 1 - ciy + nyl),
                      slice(1 - cix, 1 - cix + nxl))
            planes.append(s_post[(i,) + slicer])
        # wall BCs on the physical wall rows (masked by shard position):
        # f — exact-mass full-way bounce-back (the node's own
        # post-collision outward values); g — anti-bounce-back Dirichlet
        bot = jnp.zeros((nyl, 1), bool).at[0, 0].set(is_bottom)
        top = jnp.zeros((nyl, 1), bool).at[-1, 0].set(is_top)
        center = (slice(1, -1), slice(1, -1))
        for i in range(Qf):
            ciy = int(lat.c[i, 1])
            if ciy > 0:
                planes[i] = jnp.where(bot, s_post[int(opp_f[i])][center],
                                      planes[i])
            elif ciy < 0:
                planes[i] = jnp.where(top, s_post[int(opp_f[i])][center],
                                      planes[i])
        if walls_x:
            # adiabatic, no-slip x walls (side-heated cavity): exact-mass
            # full-way bounce-back for BOTH f and g on the physical x-edge
            # columns (see make_step_thermal); disjoint from the g
            # Dirichlet rows below (D2Q5 has no diagonals)
            x0 = offsets[-1]
            is_left, is_right = x0 == 0, x0 + nxl == p.nx
            lft = jnp.zeros((1, nxl), bool).at[0, 0].set(is_left)
            rgt = jnp.zeros((1, nxl), bool).at[0, -1].set(is_right)
            for i in range(Qs):
                cix = int(c_all[i, 0])
                if cix > 0:
                    planes[i] = jnp.where(lft, s_post[int(opp_all[i])][center],
                                          planes[i])
                elif cix < 0:
                    planes[i] = jnp.where(rgt, s_post[int(opp_all[i])][center],
                                          planes[i])
        g_planes = planes[Qf:]
        boundaries.apply_thermal_wall(lg, g_planes, bot, 1, +1,
                                      th.t_bottom, None)
        boundaries.apply_thermal_wall(lg, g_planes, top, 1, -1,
                                      th.t_top, None)
        out = jnp.stack(planes[:Qf] + g_planes)
        return spad.at[:, 1:-1, 1:-1].set(out)

    return step


def temperature(problem: Problem, s: jnp.ndarray) -> jnp.ndarray:
    """T field from the stacked state."""
    return jnp.sum(s[problem.lattice.Q:], axis=0)


def scalar_variance(problem: Problem, s: jnp.ndarray) -> jnp.ndarray:
    """Scalar variance ⟨(T − ⟨T⟩)²⟩ — the mixing measure for periodic
    passive-scalar problems (monotonically destroyed by diffusion at rate
    2α⟨|∇T|²⟩; stirring steepens gradients and accelerates it). The
    periodic analog of the Nu(t) trace."""
    T = temperature(problem, s)
    return jnp.mean((T - jnp.mean(T)) ** 2)


def nusselt(problem: Problem, s: jnp.ndarray) -> jnp.ndarray:
    """Instantaneous Nusselt number: total vertical heat flux over the
    conductive flux, volume-averaged over the interior rows:

        Nu = 1 + <u_y T> / (alpha ΔT / H)

    (= 1 identically in the conductive state; > 1 once convection sets in).
    """
    from ..models.rayleigh_benard import effective_height
    lat, lg, th = _thermal_parts(problem)
    f = s[:lat.Q]
    rho, u = physics.moments(lat, f)
    T = temperature(problem, s)
    h = effective_height(problem.params)
    dt_wall = th.t_bottom - th.t_top
    adv = jnp.mean(u[1] * T)
    return 1.0 + adv * h / (th.alpha * dt_wall)
