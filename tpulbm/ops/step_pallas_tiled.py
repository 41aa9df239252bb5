"""x-tiled fused collide-stream Pallas kernel (N-step temporal blocking).

Generalizes the full-width slab pipeline (step_pallas.py) to a 2-D tile
grid, removing its two limits (VERDICT r1 #2):

  * the pallas backend's mesh-(N,1) restriction — x-sharded shards get
    their x-halo columns as side inputs (parallel/halo.ring_cols) stitched
    into the tile buffers, so any (my, mx) decomposition runs the fast path
    (the reference supports arbitrary Cartesian grids, LBMGrid.h:347-392);
  * the VMEM ceiling on wide rows — slabs are (Q, Ty, Tx + 2H) instead of
    full-width, so deep temporal blocking (N=3/4) fits at any nx.

Design: overlapped ("trapezoid") tiling. Each tile fetches H = 128 halo
columns per side along with its Tx owned columns (three DMA pieces — halo
offsets stay 128-lane aligned, the Mosaic requirement). An N-step cascade
consumes one halo column per side per substep; the remaining H - N columns
decay into garbage that is never written back (the out DMA stores only the
center). Physical x edges don't decay — the per-substep ghost sanitize +
Zou-He reconstruction pins validity at the edge column (reference ghost
semantics, LBMGrid.h:448-466), exactly as in the full-width kernels, just
at buffer column H instead of 0. y-halo rows arrive extended across the
x-halo regions (halo.ring_rows_ext) so the ghost-row chains see correct
corner data (two-phase exchange; fixes reference deviation #1).

Cost model: DMA reads (1 + 2H/Tx)× of f and writes 1× per N steps — at
Tx = 2048 that is ~2.1 passes per N steps vs 2.0 for full-width N-blocking,
while full-width N≥3 simply does not fit VMEM at nx ≥ 4096. VPU work grows
by the same (1 + 2H/Tx) factor.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import Problem
from .step_pallas import (_VMEM_BUDGET, _apply_bcs, _bc_row_values,
                          _collide_rows, _physics_cfg_fields, _stream_rows,
                          _Cfg)


@dataclasses.dataclass(frozen=True)
class _TileCfg:
    Tx: int
    Ty: int
    H: int
    n_tx: int
    n_ty: int
    W: int


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def _choose_tiles(nyl: int, nxl: int, N: int, Q: int, has_solid: bool,
                  interpret: bool, pad_x: int = 0,
                  bz_planes: int = 0) -> _TileCfg | None:
    """Pick (Tx, Ty) maximizing Tx (smallest halo-overlap fraction), then Ty,
    subject to the VMEM budget. Returns None if nothing fits. pad_x > 0:
    the last tile must contain the whole pad region (Tx > pad_x), so the
    physical-east-edge column xr_col = H + Tx - 1 - pad_x stays inside it."""
    H = 128 if not interpret else 8
    if not interpret and nxl % 128:
        return None

    def usage(ty: int, W: int) -> int:
        S = 6 if N == 1 else 4 + 3 * (N - 1) + 2        # f slab rings + out
        M = N + 2
        u = S * Q * ty * W                               # slabs
        u += 2 * Q * N * W                               # y-ring row scratch
        if has_solid:
            u += M * ty * W + 2 * N * W                  # mask slabs + rings
        if bz_planes:
            u += 4 * bz_planes * ty * W                  # bouzidi q slots
        if N > 1:
            u += (N - 1) * Q * N * W                     # top ghost chains
        return u * 4

    tx_env = os.environ.get("TPULBM_TILE_X")
    txs = ([int(tx_env)] if tx_env else
           sorted((d for d in _divisors(nxl)
                   if (interpret or d % 128 == 0) and d > pad_x),
                  reverse=True))
    for Tx in txs:
        W = Tx + 2 * H
        tys = sorted((t for t in _divisors(nyl)
                      if (interpret or t % 8 == 0)
                      and nyl // t >= N + 1
                      and usage(t, W) <= _VMEM_BUDGET), reverse=True)
        if tys:
            return _TileCfg(Tx=Tx, Ty=tys[0], H=H, n_tx=nxl // Tx,
                            n_ty=nyl // tys[0], W=W)
    return None


def make_local_step_tiled(problem: Problem, local_shape: tuple[int, ...],
                          n_sub: int, interpret: bool | None = None,
                          pad_x: int = 0):
    """Build step(f, rb, rt, rl, rr, flags, mask, mrb, mrt, ml, mr, sflags)
    advancing n_sub timesteps per HBM round trip on an x-tiled pipeline.

    pad_x > 0: local_shape is lane-PADDED ((nyl, nxl_real + pad_x), aligned)
    so any real local width runs fused on x-sharded meshes too. The pad
    columns live at the end of the LAST tile; on shards with an east
    neighbor they carry live shadow copies of that neighbor's first pad_x
    columns (re-stitched every step by the wrapper from
    halo.ring_cols_padded's fill output, so the owned column nxl_real-1
    streams from correct data through every substep), while on the
    physical-east shard they are dead and pinned to the frozen ghost
    equilibrium each substep (_apply_bcs, fr-gated), exactly like the
    full-width kernels' pad. The Zou-He outlet column moves to
    xr_col = H + Tx - 1 - pad_x.

      f:      (Q, nyl, nxl) local block
      rb/rt:  (Q, n_sub, nxl + 2H) extended y-ring rows (halo.ring_rows_ext)
      rl/rr:  (Q, nyl, H) x-ring columns (halo.ring_cols)
      flags:  (4,) int32 [is_bottom, is_top, is_left, is_right] — *physical*
              domain edges of this shard
      mask:   (nyl, nxl) f32 solid mask (None when the problem has none)
      mrb/mrt:(n_sub, nxl + 2H) mask ring rows; ml/mr: (nyl, H) mask columns
      sflags: (n_ty,) int32 per-y-slab solid-intersection flags

    Returns None when no tile size fits VMEM or the block is too short for
    the cascade (n_ty < n_sub + 1).
    """
    assert 1 <= n_sub <= 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    fields = _physics_cfg_fields(problem)
    if fields["bz"] and n_sub > 1:
        # bouzidi fuses at depth 1 only (same restriction as the full-width
        # kernels: the rewrite needs the post-collision pre-stream slab of
        # the SAME substep; deeper cascades recycle those slots) — the
        # dispatcher falls through to the depth-1 tiled attempt
        return None
    nyl, nxl = local_shape
    Q = fields["Q"]
    has_solid = fields["has_solid"]
    tiles = _choose_tiles(nyl, nxl, n_sub, Q, has_solid, interpret, pad_x,
                          bz_planes=fields["bz_planes"])
    if tiles is None:
        return None
    if (min(tiles.Ty, tiles.Tx) < 2
            and (fields["clean_corners"] or fields["walls_x"])):
        return None  # corner closures read slab row Ty-2 / tile col xl+1
    Tx, Ty, H, n_tx, n_ty, W = (tiles.Tx, tiles.Ty, tiles.H, tiles.n_tx,
                                tiles.n_ty, tiles.W)
    cfg = _Cfg(**fields, Ty=Ty, nxl=W, n_ty=n_ty,
               xl_col=H, xr_col=H + Tx - 1 - pad_x, pad_x=pad_x)
    N = n_sub
    M = N + 2                      # mask slot ring
    bounce_back = cfg.bounce_back

    def kernel(flags_ref, sflags_ref, f_ref, rb_ref, rt_ref, rl_ref, rr_ref,
               mask_ref, mrb_ref, mrt_ref, ml_ref, mr_ref, *refs):
        if cfg.bz:
            bzq_ref, out_ref, fa, *rest = refs
        else:
            bzq_ref = None
            out_ref, fa, *rest = refs
        gs = list(rest[:N - 1])                     # stages 1..N-1
        (ob, msl, rbs, rts, mrbs, mrts, t_scr,
         sem_fc, sem_fl, sem_fr, sem_ob, sem_mc, sem_ml, sem_mr,
         sem_r, *bz_scr) = rest[N - 1:]
        qsl, sem_q = bz_scr if cfg.bz else (None, None)
        fb, ft, fl, fr = (flags_ref[k] for k in range(4))
        tx = pl.program_id(0)
        # Spatially varying force (cfg.force_fn): flags[4]/flags[5] carry
        # the shard's global (y, x) offsets. Buffer column b of tile tx is
        # global x = flags[5] + tx*Tx - H + b (west halo columns sit at the
        # unwrapped -H..-1 offsets on the west-edge shard; lane-pad shadow
        # columns continue linearly into the east neighbor — both are what
        # the jax tier computes, periodic force_fns wrap analytically).
        if cfg.force_fn is not None:
            y_at = lambda r: flags_ref[4] + r           # noqa: E731
            x_k = flags_ref[5] + tx * Tx - H
        else:
            y_at = lambda r: None                       # noqa: E731
            x_k = None
        # All x offsets are multiples of the 128-lane tiling (Tx and H are);
        # Mosaic cannot always prove that through the arithmetic, so annotate.
        xa = pl.multiple_of(tx * Tx, 128 if not interpret else 1)
        xa_l = pl.multiple_of(tx * Tx - H, 128 if not interpret else 1)
        xa_r = pl.multiple_of(tx * Tx + Tx, 128 if not interpret else 1)
        # tile-level physical-edge flags: the sanitize/Zou-He code in
        # _apply_bcs/_bc_row_values fires on == 1
        flt = jnp.where(jnp.logical_and(tx == 0, fl == 1), 1, 0)
        frt = jnp.where(jnp.logical_and(tx == n_tx - 1, fr == 1), 1, 0)

        # ---- per-tile ring rows (sliced from the extended arrays; the
        # extended coordinate of buffer column b is xa + b) ----
        ring_copies = [
            pltpu.make_async_copy(rb_ref.at[:, :, pl.ds(xa, W)], rbs,
                                  sem_r.at[0]),
            pltpu.make_async_copy(rt_ref.at[:, :, pl.ds(xa, W)], rts,
                                  sem_r.at[1]),
        ]
        if has_solid:
            ring_copies += [
                pltpu.make_async_copy(mrb_ref.at[:, pl.ds(xa, W)], mrbs,
                                      sem_r.at[2]),
                pltpu.make_async_copy(mrt_ref.at[:, pl.ds(xa, W)], mrts,
                                      sem_r.at[3]),
            ]
        for cp in ring_copies:
            cp.start()
        for cp in ring_copies:
            cp.wait()

        # ---- three-piece tile DMAs (center + left/right halo columns;
        # shard-edge tiles take the halo from the ring-column inputs) ----
        def fc_dma(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), pl.ds(xa, Tx)],
                fa.at[t % 4, :, :, H:H + Tx], sem_fc.at[t % 4])

        # Halo-piece descriptor builders. `ring` and `inner` variants copy
        # identical byte counts into the same destination/semaphore, so the
        # matching wait can use either — only the started one runs.
        def fl_ring(t):
            return pltpu.make_async_copy(
                rl_ref.at[:, pl.ds(t * Ty, Ty), :],
                fa.at[t % 4, :, :, 0:H], sem_fl.at[t % 4])

        def fl_inner(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), pl.ds(xa_l, H)],
                fa.at[t % 4, :, :, 0:H], sem_fl.at[t % 4])

        def fr_ring(t):
            return pltpu.make_async_copy(
                rr_ref.at[:, pl.ds(t * Ty, Ty), :],
                fa.at[t % 4, :, :, H + Tx:W], sem_fr.at[t % 4])

        def fr_inner(t):
            return pltpu.make_async_copy(
                f_ref.at[:, pl.ds(t * Ty, Ty), pl.ds(xa_r, H)],
                fa.at[t % 4, :, :, H + Tx:W], sem_fr.at[t % 4])

        def mc_dma(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), pl.ds(xa, Tx)],
                msl.at[t % M, :, H:H + Tx], sem_mc.at[t % M])

        def ml_ring(t):
            return pltpu.make_async_copy(
                ml_ref.at[pl.ds(t * Ty, Ty), :],
                msl.at[t % M, :, 0:H], sem_ml.at[t % M])

        def ml_inner(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), pl.ds(xa_l, H)],
                msl.at[t % M, :, 0:H], sem_ml.at[t % M])

        def mr_ring(t):
            return pltpu.make_async_copy(
                mr_ref.at[pl.ds(t * Ty, Ty), :],
                msl.at[t % M, :, H + Tx:W], sem_mr.at[t % M])

        def mr_inner(t):
            return pltpu.make_async_copy(
                mask_ref.at[pl.ds(t * Ty, Ty), pl.ds(xa_r, H)],
                msl.at[t % M, :, H + Tx:W], sem_mr.at[t % M])

        if cfg.bz:
            # Bouzidi q tile: CENTER columns only — the cut-link rewrite is
            # pointwise at owned cells and halo-column results are never
            # written back at depth 1, so the halo columns of every q slot
            # are pinned to -1 (no cut link) once per tile and the DMA
            # (riding the mask's per-slab skip — sflags is widened by one
            # row for cut links in parallel/sharded_step) fills the center
            neg_h = jnp.full((4, cfg.bz_planes, Ty, H), -1.0, jnp.float32)
            qsl[:, :, :, 0:H] = neg_h
            qsl[:, :, :, H + Tx:W] = neg_h

        def q_dma(t):
            return pltpu.make_async_copy(
                bzq_ref.at[:, pl.ds(t * Ty, Ty), pl.ds(xa, Tx)],
                qsl.at[t % 4, :, :, H:H + Tx], sem_q.at[t % 4])

        def _start_pieces(t, center, lring, linner, rring, rinner):
            center(t).start()
            pl.when(tx == 0)(lambda: lring(t).start())
            pl.when(tx > 0)(lambda: linner(t).start())
            pl.when(tx == n_tx - 1)(lambda: rring(t).start())
            pl.when(tx < n_tx - 1)(lambda: rinner(t).start())

        def mask_op(t, fn):
            if not has_solid:
                return
            if cfg.slab_skip:
                pl.when(sflags_ref[t] == 1)(fn)
            else:
                fn()

        def start_in(t):
            _start_pieces(t, fc_dma, fl_ring, fl_inner, fr_ring, fr_inner)
            mask_op(t, lambda: _start_pieces(t, mc_dma, ml_ring, ml_inner,
                                             mr_ring, mr_inner))
            if cfg.bz:
                mask_op(t, lambda: q_dma(t).start())

        def wait_in(t):
            fc_dma(t).wait()
            fl_ring(t).wait()
            fr_ring(t).wait()

            def _wait_masks():
                mc_dma(t).wait()
                ml_ring(t).wait()
                mr_ring(t).wait()
                if cfg.bz:
                    q_dma(t).wait()

            mask_op(t, _wait_masks)

        def out_dma(t):
            return pltpu.make_async_copy(
                ob.at[t % 2, :, :, H:H + Tx],
                out_ref.at[:, pl.ds(t * Ty, Ty), pl.ds(xa, Tx)],
                sem_ob.at[t % 2])

        def slab_flag(t):
            return (sflags_ref[t] == 1) if cfg.slab_skip else None

        def stage_ref(k):
            return (fa, 4) if k == 0 else (gs[k - 1], 3)

        def collide_a(t):
            slot = t % 4
            fw = [fa[slot, i] for i in range(Q)]
            solid_rows = (msl[t % M] > 0.5) if bounce_back else None
            fp = _collide_rows(cfg, fw, solid_rows, y_at(t * Ty), x_k)
            for i in range(Q):
                fa[slot, i] = fp[i]

        eq_row = [jnp.full((1, W), cfg.eq_in[i], jnp.float32)
                  for i in range(Q)]
        # Solid-free problems get dummy (1, 128) mask scratch; never slice it
        # (ghost-chain consumers take None and skip the mask entirely).
        if has_solid:
            mrb_rows = {r: mrbs[N + r:N + r + 1, :] for r in range(-N, 0)}
            mrt_rows = {r: mrts[r - 1:r, :] for r in range(1, N + 1)}
        else:
            mrb_rows = {r: None for r in range(-N, 0)}
            mrt_rows = {r: None for r in range(1, N + 1)}

        def collide_row_vals(planes, mask_row, y0=None):
            solid = (mask_row > 0.5) if bounce_back else None
            return _collide_rows(cfg, planes, solid, y0, x_k)

        def stream_row(below, cur, above):
            planes = []
            for i in range(Q):
                cx, cy = cfg.c[i]
                row = cur[i] if cy == 0 else (below[i] if cy > 0 else above[i])
                if cx:
                    row = pltpu.roll(row, cx % W, axis=1)
                planes.append(row)
            return planes

        # ---- bottom ghost chains (stage-k collided ghost rows, values) ----
        B = [dict() for _ in range(N)]
        for r in range(-N, 0):
            planes = [rbs[i, N + r:N + r + 1, :] for i in range(Q)]
            B[0][r] = collide_row_vals(planes, mrb_rows[r], y_at(r))

        for j in range(N):
            start_in(j)
        for j in range(N):
            wait_in(j)
            collide_a(j)

        def make_stage_slab(k, idx, below, above, is_bottom, is_top,
                            collide_after=True):
            srcref, m_src = stage_ref(k - 1)
            tgt, m_tgt = (ob, 2) if k == N else stage_ref(k)
            tslot = idx % m_tgt
            for i in range(Q):
                tgt[tslot, i] = _stream_rows(cfg, i, srcref[idx % m_src, i],
                                             below[i], above[i])
            bz = None
            if cfg.bz:
                # depth 1 only: srcref == fa holds the post-collision
                # pre-stream tile of this substep; q slot rotation matches
                # the raw slab rotation (both mod 4)
                src_slot = idx % m_src
                bz = ((lambda j: qsl[idx % 4, j]),
                      (lambda i: srcref[src_slot, i]))
            _apply_bcs(cfg, tgt, tslot, msl if has_solid else None, idx % M,
                       is_bottom, is_top, flt, frt, solid_flag=slab_flag(idx),
                       bz=bz)
            if collide_after:
                fw = [tgt[tslot, i] for i in range(Q)]
                solid_rows = (msl[idx % M] > 0.5) if bounce_back else None
                fp = _collide_rows(cfg, fw, solid_rows, y_at(idx * Ty), x_k)
                for i in range(Q):
                    tgt[tslot, i] = fp[i]

        false_ = jnp.asarray(False, jnp.bool_)

        for k in range(1, N):
            srcref, m_src = stage_ref(k - 1)
            for r in range(-(N - k), 0):
                below = B[k - 1][r - 1]
                cur = B[k - 1][r]
                if r == -1:
                    above = [srcref[0, i, 0:1, :] for i in range(Q)]
                else:
                    above = B[k - 1][r + 1]
                planes = stream_row(below, cur, above)
                planes = _bc_row_values(
                    cfg, planes, mrb_rows[r] if has_solid else None, flt, frt)
                planes = collide_row_vals(planes, mrb_rows[r], y_at(r))
                B[k][r] = [jnp.where(fb == 1, eq_row[i], planes[i])
                           for i in range(Q)]
            for j in range(N - k):
                if j == 0:
                    below = B[k - 1][-1]
                else:
                    below = [srcref[(j - 1) % m_src, i, Ty - 1:Ty, :]
                             for i in range(Q)]
                above = [srcref[(j + 1) % m_src, i, 0:1, :] for i in range(Q)]
                make_stage_slab(k, j, below, above,
                                (fb == 1) if j == 0 else false_, false_)

        if n_ty > N:
            start_in(N)

        T0 = {}
        for r in range(1, N + 1):
            planes = [rts[i, r - 1:r, :] for i in range(Q)]
            T0[r] = collide_row_vals(planes, mrt_rows[r], y_at(nyl + r - 1))

        def t_prev(k, r):
            if k == 1:
                return T0[r]
            return [t_scr[k - 2, i, r - 1:r, :] for i in range(Q)]

        def compute_t_chain(k):
            srcref, m_src = stage_ref(k - 1)
            for r in range(1, N - k + 1):
                if r == 1:
                    below = [srcref[(n_ty - 1) % m_src, i, Ty - 1:Ty, :]
                             for i in range(Q)]
                else:
                    below = t_prev(k, r - 1)
                cur = t_prev(k, r)
                above = t_prev(k, r + 1)
                planes = stream_row(below, cur, above)
                planes = _bc_row_values(
                    cfg, planes, mrt_rows[r] if has_solid else None, flt, frt)
                planes = collide_row_vals(planes, mrt_rows[r],
                                          y_at(nyl + r - 1))
                for i in range(Q):
                    t_scr[k - 1, i, r - 1:r, :] = jnp.where(
                        ft == 1, eq_row[i], planes[i])

        def loop(s, carry):
            @pl.when(s + N < n_ty)
            def _():
                wait_in(s + N)
                collide_a(s + N)

            @pl.when(s + N + 1 < n_ty)
            def _():
                start_in(s + N + 1)

            for k in range(1, N):
                idx = s + (N - k)

                @pl.when(idx < n_ty)
                def _(k=k, idx=idx):
                    srcref, m_src = stage_ref(k - 1)
                    below = [srcref[(idx - 1) % m_src, i, Ty - 1:Ty, :]
                             for i in range(Q)]
                    is_last = idx == n_ty - 1
                    above = [jnp.where(is_last, t_prev(k, 1)[i],
                                       srcref[(idx + 1) % m_src, i, 0:1, :])
                             for i in range(Q)]
                    make_stage_slab(k, idx, below, above, false_,
                                    jnp.logical_and(is_last, ft == 1))

            for k in range(1, N):
                @pl.when(s == n_ty - 2 - N + k)
                def _(k=k):
                    compute_t_chain(k)

            @pl.when(s >= 2)
            def _():
                out_dma(s - 2).wait()

            srcref, m_src = stage_ref(N - 1)
            is_last = s == n_ty - 1
            below = [jnp.where(s == 0, B[N - 1][-1][i] if N > 1 else B[0][-1][i],
                               srcref[(s - 1) % m_src, i, Ty - 1:Ty, :])
                     for i in range(Q)]
            above = [jnp.where(is_last, t_prev(N, 1)[i],
                               srcref[(s + 1) % m_src, i, 0:1, :])
                     for i in range(Q)]
            make_stage_slab(N, s, below, above,
                            jnp.logical_and(s == 0, fb == 1),
                            jnp.logical_and(is_last, ft == 1),
                            collide_after=False)
            out_dma(s).start()
            return carry

        lax.fori_loop(0, n_ty, loop, 0, unroll=False)
        if n_ty >= 2:
            out_dma(n_ty - 2).wait()
        out_dma(n_ty - 1).wait()

    scratch_shapes = (
        [pltpu.VMEM((4, Q, Ty, W), jnp.float32)]               # raw/stage-0
        + [pltpu.VMEM((3, Q, Ty, W), jnp.float32)
           for _ in range(N - 1)]                              # stages 1..N-1
        + [pltpu.VMEM((2, Q, Ty, W), jnp.float32),             # out slabs
           (pltpu.VMEM((M, Ty, W), jnp.float32) if has_solid
            else pltpu.VMEM((1, 8, 128), jnp.float32)),                 # mask slabs
           pltpu.VMEM((Q, N, W), jnp.float32),                 # rb tile slice
           pltpu.VMEM((Q, N, W), jnp.float32),                 # rt tile slice
           (pltpu.VMEM((N, W), jnp.float32) if has_solid
            else pltpu.VMEM((1, 128), jnp.float32)),  # mrb tile slice
           (pltpu.VMEM((N, W), jnp.float32) if has_solid
            else pltpu.VMEM((1, 128), jnp.float32)),  # mrt tile slice
           pltpu.VMEM((max(N - 1, 1), Q, N, W), jnp.float32),  # top chains
           pltpu.SemaphoreType.DMA((4,)),                      # f center
           pltpu.SemaphoreType.DMA((4,)),                      # f left
           pltpu.SemaphoreType.DMA((4,)),                      # f right
           pltpu.SemaphoreType.DMA((2,)),                      # out
           pltpu.SemaphoreType.DMA((M,)),                      # mask center
           pltpu.SemaphoreType.DMA((M,)),                      # mask left
           pltpu.SemaphoreType.DMA((M,)),                      # mask right
           pltpu.SemaphoreType.DMA((4,))]                      # ring slices
        + ([pltpu.VMEM((4, cfg.bz_planes, Ty, W), jnp.float32),  # bouzidi q
            pltpu.SemaphoreType.DMA((4,))] if cfg.bz else [])
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_tx,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # flags (4,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sflags (n_ty,)
            pl.BlockSpec(memory_space=pl.ANY),       # f
            pl.BlockSpec(memory_space=pl.ANY),       # rb ext
            pl.BlockSpec(memory_space=pl.ANY),       # rt ext
            pl.BlockSpec(memory_space=pl.ANY),       # rl
            pl.BlockSpec(memory_space=pl.ANY),       # rr
            pl.BlockSpec(memory_space=pl.ANY),       # mask
            pl.BlockSpec(memory_space=pl.ANY),       # mrb ext
            pl.BlockSpec(memory_space=pl.ANY),       # mrt ext
            pl.BlockSpec(memory_space=pl.ANY),       # ml
            pl.BlockSpec(memory_space=pl.ANY),       # mr
        ] + ([pl.BlockSpec(memory_space=pl.ANY)]     # bouzidi q table
             if cfg.bz else []),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, nyl, nxl), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 3 * 1024 * 1024),
        interpret=interpret,
    )

    zero_mask = np.zeros((nyl, nxl), np.float32)
    zero_ring = np.zeros((N, nxl + 2 * H), np.float32)
    zero_cols = np.zeros((nyl, H), np.float32)
    ones_sflags = np.ones((n_ty,), np.int32)

    def step(f, rb, rt, rl, rr, flags, mask=None, mrb=None, mrt=None,
             ml=None, mr=None, sflags=None, bzq=None):
        if has_solid and mask is None:
            raise ValueError("pallas backend needs the solid mask")
        mask = jnp.asarray(zero_mask) if mask is None else mask
        mrb = jnp.asarray(zero_ring) if mrb is None else mrb
        mrt = jnp.asarray(zero_ring) if mrt is None else mrt
        ml = jnp.asarray(zero_cols) if ml is None else ml
        mr = jnp.asarray(zero_cols) if mr is None else mr
        sflags = jnp.asarray(ones_sflags) if sflags is None else sflags
        if cfg.bz:
            if bzq is None:
                raise ValueError("bouzidi pallas kernel needs the q table")
            return call(flags, sflags, f, rb, rt, rl, rr, mask, mrb, mrt,
                        ml, mr, bzq)
        return call(flags, sflags, f, rb, rt, rl, rr, mask, mrb, mrt, ml, mr)

    step.tile_height = Ty
    step.n_ty = n_ty
    step.n_tx = n_tx
    step.tile_width = Tx
    step.halo_width = H
    step.depth = N
    step.pad_x = pad_x
    step.slab_skip = cfg.slab_skip
    return step
