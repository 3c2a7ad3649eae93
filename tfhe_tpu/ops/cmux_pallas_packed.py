"""Packed-layout fused blind-rotate kernel for SMALL batches (latency path).

The main kernel (cmux_pallas.py) lays polynomials along sublanes and the batch
along lanes — ideal at batch >= 128, but a batch of 2 wastes 126/128 lanes and
still costs ~58 ms, which makes *serial* circuits (ripple adders, comparisons,
division — the reference's Tables V/VII workloads) latency-bound.

This variant packs each polynomial as a full 2-D tile grid: coefficient
n = h*128 + l sits at (sublane h, lane l), so one [H=N/128, 128] slab is fully
dense regardless of batch size, and the batch rides the LEADING axis
([(k+1)*B, H, 128]). Every butterfly stage is the roll-select form on either
the sublane axis (t >= 128) or the lane axis (t < 128); the negacyclic
rotation ladder splits its bits the same way. At B<=32 this cuts the
per-bootstrap-call latency by roughly an order of magnitude, which is what the
reference's low-latency GPU_1 adder path needs (taskLevelParallelAdd_bitwise,
gpuParallel/main.cu:821-890).

Exact integer math, bit-identical to the XLA path and the lane-layout kernel.
"""
from __future__ import annotations

import functools
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ntt

# Grid-unroll factor, read ONCE at import (jit caches by shape, so a
# trace-time env read would silently keep the first compile's value).
# unroll=2 speeds isolated tiny-batch gates ~15% but sharply slows programs
# containing several kernels (the fused adder stages); default 1.
from ..config import packed_unroll as _packed_unroll
PACKED_UNROLL = _packed_unroll()
from ..params import TfheParams
from .cmux_pallas import _shoup, _addm, _subm, _crt, _ntt_forward_np

LANE = 128


def _stage_plan(N: int):
    """Forward/inverse stage lists: (t, axis, shift, size) per stage."""
    H = N // LANE
    fwd, inv = [], []
    m, t = 1, N
    while m < N:
        t //= 2
        if t >= LANE:
            fwd.append((t, 1, t // LANE, H))
        else:
            fwd.append((t, 2, t, LANE))
        m *= 2
    t, m = 1, N
    while m > 2:
        h = m // 2
        if t >= LANE:
            inv.append((t, 1, t // LANE, H))
        else:
            inv.append((t, 2, t, LANE))
        t *= 2
        m = h
    return fwd, inv


@functools.lru_cache(maxsize=None)
def _twiddle_planes(N: int, half_bg: int):
    """uint32[P, NPLANES, H, 128] identity-padded twiddle planes.

    Plane order per prime: for each forward stage (TW, TW_shoup), for each
    inverse stage (TW, TW_shoup), then the offset-correction plane
    NTT(half_bg * ones) reshaped to [H, 128]."""
    H = N // LANE
    fwd, inv = _stage_plan(N)
    n_idx = np.arange(N)
    out = []
    for p in ntt.PRIMES:
        tabs = ntt.ntt_tables(N, p)
        planes = []
        for t, _, _, _ in fwd:
            m = N // (2 * t)
            tw = np.where((n_idx // t) % 2 == 1,
                          tabs["psi_br"][m + n_idx // (2 * t)], 1).astype(np.uint32)
            planes.append(tw)
            planes.append(ntt.shoup(tw, p))
        for t, _, _, _ in inv:
            h = N // (2 * t)
            tw = np.where((n_idx // t) % 2 == 1,
                          tabs["ipsi_br"][h + n_idx // (2 * t)], 1).astype(np.uint32)
            planes.append(tw)
            planes.append(ntt.shoup(tw, p))
        planes.append(_ntt_forward_np(np.full(N, half_bg % p, np.uint64), N, p))
        out.append(np.stack([pl_.reshape(H, LANE) for pl_ in planes]))
    return np.stack(out)  # [P, NPLANES, H, 128]


def _butterfly_roll(x, tw, tws, axis, sh, size, mask_u, p):
    """Forward roll-select butterfly on the given axis."""
    wv = _shoup(x, tw, tws, p)
    wv_up = pltpu.roll(wv, size - sh, axis=axis)
    x_dn = pltpu.roll(x, sh, axis=axis)
    return jnp.where(mask_u, _addm(x, wv_up, p), _subm(x_dn, wv, p))


def _ibutterfly_roll(x, tw, tws, axis, sh, size, mask_u, p):
    """Inverse roll-select butterfly: u' = u+v; v' = (u-v)*s."""
    x_up = pltpu.roll(x, size - sh, axis=axis)
    x_dn = pltpu.roll(x, sh, axis=axis)
    summed = _addm(x, x_up, p)
    diffed = _shoup(_subm(x_dn, x, p), tw, tws, p)
    return jnp.where(mask_u, summed, diffed)


def _masks(H: int):
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    return iota_h, iota_l


def _fwd_packed(x, planes, plane_off, fwd_plan, H, p):
    iota_h, iota_l = _masks(H)
    si = plane_off
    for t, axis, sh, size in fwd_plan:
        tw = planes[si][None]
        tws = planes[si + 1][None]
        si += 2
        iota = iota_h if axis == 1 else iota_l
        mask_u = (iota // sh) % 2 == 0
        x = _butterfly_roll(x, tw, tws, axis, sh, size, mask_u, p)
    return x


def _inv_packed(x, planes, plane_off, inv_plan, H, p, tabs):
    iota_h, iota_l = _masks(H)
    si = plane_off
    for t, axis, sh, size in inv_plan:
        tw = planes[si][None]
        tws = planes[si + 1][None]
        si += 2
        iota = iota_h if axis == 1 else iota_l
        mask_u = (iota // sh) % 2 == 0
        x = _ibutterfly_roll(x, tw, tws, axis, sh, size, mask_u, p)
    # final stage (m == 2): halves split on the sublane axis, N^-1 folded in
    half = H // 2
    x_up = pltpu.roll(x, half, axis=1)          # x_up[h] = x[h-half]
    x_dn = pltpu.roll(x, H - half, axis=1)      # x_dn[h] = x[h+half]
    lo = _shoup(_addm(x, x_dn, p), jnp.uint32(int(tabs["n_inv"])),
                jnp.uint32(int(tabs["n_inv_shoup"])), p)
    hi = _shoup(_subm(x_up, x, p), jnp.uint32(int(tabs["ipsi1_ninv"])),
                jnp.uint32(int(tabs["ipsi1_ninv_shoup"])), p)
    return jnp.where(iota_h < half, lo, hi)


def _rotate_packed(acc, bits_mask_fn, N, H):
    """Negacyclic X^a rotation of packed slabs [S, H, 128]; per-slab rotation
    amounts delivered as boolean masks by bits_mask_fn(kb) -> [S, 1, 1]."""
    iota_h, iota_l = _masks(H)
    rot = acc
    # lane bits (sh < 128)
    for kb in range(0, 7):
        sh = 1 << kb
        base = pltpu.roll(rot, sh, axis=2)
        fixed = pltpu.roll(base, 1, axis=1)
        fixed = jnp.where(iota_h == 0, -fixed, fixed)
        rolled = jnp.where(iota_l < sh, fixed, base)
        rot = jnp.where(bits_mask_fn(kb), rolled, rot)
    # sublane bits (sh = 128 .. N/2)
    nbits = N.bit_length() - 1
    for kb in range(7, nbits):
        sh_sub = 1 << (kb - 7)
        rolled = pltpu.roll(rot, sh_sub, axis=1)
        rolled = jnp.where(iota_h < sh_sub, -rolled, rolled)
        rot = jnp.where(bits_mask_fn(kb), rolled, rot)
    # a >= N: global negate (X^N == -1)
    rot = jnp.where(bits_mask_fn(nbits), -rot, rot)
    return rot


def _cmux_iter(params: TfheParams, B: int, acc, a_slab, bk_u, bksh_u, tw_ref):
    """One CMux iteration body on packed slabs.

    acc: int32[(k+1)*B, H, 128]; a_slab: int32[S, 1, 1];
    bk_u/bksh_u: uint32[P, kpl, k+1, H, 128] (this iteration's BK slice)."""
    N, k, l, kpl = params.N, params.k, params.bk_l, params.kpl
    H = N // LANE

    def bits_mask(kb):
        return ((a_slab >> kb) & 1) != 0                    # [S, 1, 1]

    rot = _rotate_packed(acc, bits_mask, N, H)
    diff = rot - acc                                        # [(k+1)*B, H, 128]

    # offset gadget decomposition -> [kpl*B, H, 128], row order (c*l + p, b)
    u = jax.lax.bitcast_convert_type(diff, jnp.uint32) + jnp.uint32(params.decomp_offset)
    u = u.reshape(k + 1, B, H, LANE)
    rows = []
    for c in range(k + 1):
        for pd in range(l):
            shift = 32 - (pd + 1) * params.bk_Bgbit
            rows.append((u[c] >> jnp.uint32(shift)) & jnp.uint32(params.maskMod))
    dec = jnp.concatenate(rows, axis=0)                     # [kpl*B, H, 128]

    fwd_plan, inv_plan = _stage_plan(N)
    n_fwd_planes = 2 * len(fwd_plan)
    n_inv_planes = 2 * len(inv_plan)
    residues = []
    for pi, p in enumerate(ntt.PRIMES):
        tabs = ntt.ntt_tables(N, p)
        planes = tw_ref[pi]
        dhat = _fwd_packed(dec, planes, 0, fwd_plan, H, p)
        ones_hat = planes[n_fwd_planes + n_inv_planes][None]
        dhat = _subm(dhat, ones_hat, p)
        dhat = dhat.reshape(kpl, B, H, LANE)
        # pointwise multiply-accumulate against this iteration's BK slice
        outs = []
        for c in range(k + 1):
            s = None
            for r in range(kpl):
                w = bk_u[pi, r, c][None]                    # [1, H, 128]
                wsh = bksh_u[pi, r, c][None]
                term = _shoup(dhat[r], w, wsh, p)
                s = term if s is None else _addm(s, term, p)
            outs.append(s)
        prod = jnp.concatenate(outs, axis=0)                # [(k+1)*B, H, 128]
        residues.append(_inv_packed(prod, planes, n_fwd_planes, inv_plan, H, p, tabs))
    delta = _crt(residues[0], residues[1])
    return acc + jax.lax.bitcast_convert_type(delta, jnp.int32)


def _scan_kernel_packed(params: TfheParams, B: int, last_j: int, unroll: int,
                        bara_ref, bk_ref, bksh_ref, tw_ref, acc0_ref,
                        out_ref, acc_scr):
    """`unroll` CMux iterations per grid step on packed slabs (amortizes the
    fixed per-step cost: grid sequencing + DMA waits dominate at tiny batch).

    bara_ref: int32[unroll, S, 1, 1] (rotation amounts replicated per slab);
    bk_ref/bksh_ref: uint32[unroll, P, kpl, k+1, H, 128];
    tw_ref: uint32[P, NPLANES, H, 128]; acc/out: int32[(k+1)*B, H, 128]."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = acc0_ref[...]

    acc = acc_scr[...]
    for u in range(unroll):
        acc = _cmux_iter(params, B, acc, bara_ref[u], bk_ref[u], bksh_ref[u], tw_ref)
    acc_scr[...] = acc

    @pl.when(j == last_j)
    def _():
        out_ref[...] = acc


def blind_rotate_fused_packed(acc_p: jnp.ndarray, bara: jnp.ndarray,
                              bk_ntt: jnp.ndarray, bk_ntt_shoup: jnp.ndarray,
                              params: TfheParams,
                              interpret: bool = False) -> jnp.ndarray:
    """Whole blind rotate on packed slabs, one kernel launch.

    acc_p: int32[(k+1)*B, H, 128] (leading axis order (channel, batch));
    bara: int32[n, B]; bk_ntt/bk_ntt_shoup: uint32[n, P, kpl, k+1, N].
    """
    N, kpl, k = params.N, params.kpl, params.k
    assert N % LANE == 0 and N >= 2 * LANE, "packed kernel needs N >= 256"
    H = N // LANE
    n, B = bara.shape
    P = bk_ntt.shape[1]
    unroll = PACKED_UNROLL
    if n % unroll != 0:
        warnings.warn(f"TFHE_PACKED_UNROLL={unroll} does not divide n={n}; using 1")
        unroll = 1
    bk6 = bk_ntt.reshape(n, P, kpl, k + 1, H, LANE)
    bksh6 = bk_ntt_shoup.reshape(n, P, kpl, k + 1, H, LANE)
    tw = jnp.asarray(_twiddle_planes(N, params.halfBg))
    NP = tw.shape[1]
    steps = n // unroll
    kern = functools.partial(_scan_kernel_packed, params, B, steps - 1, unroll)
    call = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((unroll, (k + 1) * B, 1, 1), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, P, kpl, k + 1, H, LANE), lambda j: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, P, kpl, k + 1, H, LANE), lambda j: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NP, H, LANE), lambda j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(((k + 1) * B, H, LANE), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(((k + 1) * B, H, LANE), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((k + 1) * B, H, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM(((k + 1) * B, H, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )
    bara_slab = jnp.broadcast_to(
        bara[:, None, :], (n, k + 1, B)).reshape(n, (k + 1) * B)[..., None, None]
    return call(bara_slab, bk6, bksh6, tw, acc_p)
