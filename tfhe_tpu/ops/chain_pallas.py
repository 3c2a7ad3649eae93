"""Whole-serial-circuit fused kernel: a ripple full-adder CHAIN in ONE launch.

Round-3 measurement: a 16-bit ripple add spends ~12 ms per full-adder stage
although a lone chained gate program costs ~3.5 ms — roughly 2/3 of serial-
circuit latency is per-program glue (dispatch RTT, output relayout, re-entry
into the next program). This kernel removes ALL of it: the entire nbits-stage
carry chain — every blind rotate, sample extract, key switch and the affine
that feeds the next stage — runs inside ONE Pallas launch with
grid = (nbits, n). Nothing touches HBM between stages except the streamed
bootstrapping-key slices.

The two pieces that made in-kernel key switching possible (the round-3
blocker) are layout tricks, not new math:

- **No in-kernel sample-extract flip.** Extraction maps acc coefficient m to
  a_ext index (0 if m == 0 else N-m) with a sign flip (ref
  tLweExtractLweSampleIndex, lwe.cu:40-56). Instead of reversing lanes (a
  relayout Mosaic blocks), the KS TABLE's rows are pre-permuted into
  acc-native coefficient order (`chain_ks_table`), and the flip becomes an
  elementwise negate under an iota mask.
- **No lane->sublane one-hot.** With the table rows grouped as
  (digit j, value h) planes over native coefficients, each plane's one-hot
  is an elementwise compare on the SAME [H, 128] tile as the accumulator,
  and the key-switch contraction is t*(base-1) sublane-batched
  [IMG,H,128] x [H,128,C] dot_generals on the MXU (f32 accumulation is
  exact: |partial sums| <= 24576*128 < 2^24).

Per-iteration rotation amounts for the *next* stage are produced in-kernel
(mod-switch of the affine image) and stored in a VMEM scratch; each CMux
iteration extracts its scalar with an iota==j mask-reduce — no dynamic lane
indexing, no transposes.

Reference counterpart: the reference has none — its fastest adder launches
5 gate kernels per bit with host round-trips between them
(taskLevelParallelAdd_bitwise, gpuParallel/main.cu:821-890;
boot-gates.cu:2864-2867 host sync per gate).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ntt
from ..params import TfheParams
from ..core.lwe import LweCiphertext
from .cmux_pallas_packed import (LANE, _cmux_iter, _rotate_packed,
                                 _twiddle_planes)

MU = 1 << 29


# ------------------------------------------------------------- the KS table

_CHAIN_TABLE_CACHE: dict = {}


def chain_ks_table(cloud) -> jnp.ndarray:
    """Reorder the cloud's KS limb table for in-kernel key switching.

    cloud.ks_table rows are (i, j, h-1) C-order over EXTRACTED coefficients i
    (keys.ks_to_limb_table). The chain kernel consumes the accumulator
    directly, so rows are regrouped as (j, h-1) planes over NATIVE acc
    coefficients m (i = 0 if m==0 else N-m):

        int8[t*(base-1), 4, H, 128, C]  (limb axis LEADING so every in-kernel
        slice only indexes leading axes and the tiled (sublane=128, lane=C)
        layout never relays)
    """
    key = id(cloud.ks_table)
    hit = _CHAIN_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    re = _chain_rows(cloud)             # [t*bm1, n_ext, 4, C]
    TB, n_ext, _, C = re.shape
    out = jnp.asarray(np.ascontiguousarray(
        re.transpose(0, 2, 1, 3).reshape(TB, 4, n_ext // LANE, LANE, C)))
    _CHAIN_TABLE_CACHE.clear()          # one cloud key at a time is typical
    _CHAIN_TABLE_CACHE[key] = out
    return out


def _chain_rows(cloud) -> np.ndarray:
    """KS limb table rows permuted to native acc order: [t*bm1, n_ext, 4, C]."""
    from ..core.keys import ks_perm_rows
    p: TfheParams = cloud.params
    assert p.k == 1, "chain kernel supports k=1 (the reference's only k)"
    if cloud.ks_table_perm is not None and not isinstance(
            cloud.ks_table_perm, jax.core.Tracer):
        TB, n_ext, C4 = cloud.ks_table_perm.shape
        return np.asarray(cloud.ks_table_perm).reshape(TB, n_ext, 4, C4 // 4)
    return ks_perm_rows(np.asarray(cloud.ks_table), p)


def lane_ks_table(cloud) -> jnp.ndarray:
    """The permuted table for the LANE-layout kernel's KS epilogue
    (cmux_pallas.blind_rotate_ks_fused): int8[t*(base-1), n_ext, 4*C] with
    native coefficients along the sublane (contraction) axis.

    Normally just the cloud key's precomputed `ks_table_perm` field — that
    path stays valid when the cloud key is a TRACED pytree (gate programs jit
    over it). The host-side rebuild below only serves keys deserialized by
    older snapshots that lack the field."""
    if cloud.ks_table_perm is not None:
        return cloud.ks_table_perm
    key = ("lane", id(cloud.ks_table))
    hit = _CHAIN_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    re = _chain_rows(cloud)                          # [TB, n_ext, 4, C]
    TB, n_ext, _, C = re.shape
    out = jnp.asarray(np.ascontiguousarray(re.reshape(TB, n_ext, 4 * C)))
    _CHAIN_TABLE_CACHE[key] = out
    return out


# ------------------------------------------------------------- kernel pieces

def _iota3(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _images_setup(params: TfheParams, u, acc_scr, ams_scr):
    """From a batch of bootstrap-input images u (int32[IMG, C]): store their
    per-iteration rotation amounts and initialize the accumulator to the
    rotated ±1/8 test vectors."""
    N = params.N
    H = N // LANE
    n = params.n
    IMG = u.shape[0]
    # mod-switch every lane to [0, 2N) (numeric.mod_switch_from_torus32)
    shift = 32 - (2 * N).bit_length() + 1
    half = jnp.uint32(1 << (shift - 1))
    ams = jax.lax.bitcast_convert_type(
        ((jax.lax.bitcast_convert_type(u, jnp.uint32) + half)
         >> jnp.uint32(shift)) % jnp.uint32(2 * N), jnp.int32)      # [IMG, C]
    ams_scr[...] = ams
    # barb: lane n, per image
    lane_c = _iota3(ams.shape, 1)
    barb = jnp.sum(jnp.where(lane_c == n, ams, 0), axis=1, keepdims=True)
    amt = (jnp.int32(2 * N) - barb) & jnp.int32(2 * N - 1)          # [IMG, 1]
    # test vector: +MU for all rows; rows that want a negated output (the FA
    # sum's free NOT) are negated AFTER the key switch (exactly
    # gates._fa3_jit's lwe_negate — negating before KS would change the
    # nonlinear digit rounding and break bit-equality with the gate layer)
    tv = jnp.full((IMG, H, LANE), jnp.int32(MU))
    amt3 = amt[:, :, None]                                           # [IMG,1,1]

    def bits(kb):
        return ((amt3 >> kb) & 1) != 0

    tvb = _rotate_packed(tv, bits, N, H)
    acc_scr[...] = jnp.concatenate(
        [jnp.zeros((IMG, H, LANE), jnp.int32), tvb], axis=0)


def _stage_setup(params: TfheParams, B: int, u_c, acc_scr, ams_scr):
    """FA stage: images are the carry affine u_c = a + b + carry (int32[B,C])
    and the sum affine 2*u_c."""
    _images_setup(params, jnp.concatenate([u_c, jnp.int32(2) * u_c], axis=0),
                  acc_scr, ams_scr)


def _keyswitch(params: TfheParams, IMG: int, acc, tchain_ref, ks_loop: bool,
               negate_from: int | None = None):
    """In-kernel key switch of the IMG bootstrapped samples held in `acc`
    ([2*IMG, H, 128], channel-major).

    Returns int32[IMG, C]: lanes [0, n) the switched a, lane n the switched
    b, last lane the per-sample nonzero-digit count (for exact cv accounting
    outside — ref lweKeySwitchTranslate_fromArray per-digit variance,
    lwe-keyswitch-functions.cu:119-125). Rows >= negate_from are negated
    post-KS (the FA sum's free NOT)."""
    N, n = params.N, params.n
    H = N // LANE
    t, bm1 = params.ks_t, params.ks_base - 1
    C = tchain_ref.shape[-1]
    acc0 = acc[:IMG]                                                # [IMG, H, 128]
    # b_ext: channel-1 coefficient 0 of each image. Two single-axis reductions
    # (never a rank-1 intermediate: Mosaic's layout inference aborts on
    # reshapes of 1-D vectors — layout.h `arr.size() >= layout_rank` check).
    b_ext = jnp.sum(jnp.sum(
        jnp.where((_iota3((IMG, H, LANE), 1) == 0)
                  & (_iota3((IMG, H, LANE), 2) == 0), acc[IMG:], 0),
        axis=2), axis=1, keepdims=True)                             # [IMG, 1]
    # native-order extract: x[m] = acc0[0] if m==0 else -acc0[m]
    m0 = (_iota3(acc0.shape, 1) == 0) & (_iota3(acc0.shape, 2) == 0)
    x = jnp.where(m0, acc0, -acc0)
    u = (jax.lax.bitcast_convert_type(x, jnp.uint32)
         + jnp.uint32(params.ks_prec_offset))
    r_limb = [jnp.zeros((IMG, C), jnp.float32) for _ in range(4)]
    nnz = jnp.zeros((IMG, 1), jnp.int32)
    for jd in range(t):
        dig = (u >> jnp.uint32(32 - (jd + 1) * params.ks_basebit)) \
            & jnp.uint32(params.ks_base - 1)
        nnz = nnz + jnp.sum(jnp.sum((dig != 0).astype(jnp.int32), axis=2),
                            axis=1, keepdims=True)
        for h in range(1, bm1 + 1):
            mask = (dig == h).astype(jnp.float32)                   # [IMG,H,128]
            for lb in range(4):
                rhs = tchain_ref[jd * bm1 + (h - 1), lb] \
                    .astype(jnp.float32)                            # [H,128,C]
                if ks_loop:
                    acc_l = r_limb[lb]
                    for hs in range(H):
                        acc_l = acc_l + jnp.dot(
                            mask[:, hs, :], rhs[hs],
                            preferred_element_type=jnp.float32)
                    r_limb[lb] = acc_l
                else:
                    part = jax.lax.dot_general(
                        mask, rhs, (((2,), (1,)), ((1,), (0,))),
                        preferred_element_type=jnp.float32)         # [H,IMG,C]
                    r_limb[lb] = r_limb[lb] + jnp.sum(part, axis=0)
    r = (r_limb[0].astype(jnp.int32)
         + (r_limb[1].astype(jnp.int32) << 8)
         + (r_limb[2].astype(jnp.int32) << 16)
         + (r_limb[3].astype(jnp.int32) << 24))                     # [IMG, C]
    lane_c = _iota3(r.shape, 1)
    out = jnp.where(lane_c < n, -r, jnp.where(lane_c == n, b_ext - r, 0))
    if negate_from is not None:
        out = jnp.where((_iota3(r.shape, 0) >= negate_from) & (lane_c <= n),
                        -out, out)
    return jnp.where(lane_c == C - 1, nnz, out)


# Static per-chain-type "microcode": each stage bootstraps len(imgs) images
# per number, image i = const + ca*a_s + cb*b_s + cc*carry (the b-lane gets
# the const). Row 0's switched sample is the next stage's carry; rows with
# neg=True are negated post-KS (a free NOT). This one shape covers every
# linear-scan circuit of the reference's Cipher API:
#   FA    — ripple add/sub chains (Cipher.cpp:342; main.cu:821-890)
#   TWOS  — two's-complement / add_sign reach-scan (Cipher.cpp:300-311)
#   CMP   — comparator carry MAJ(a, NOT b, cin) (Cipher.cpp:335-340)
_1_4 = 1 << 30
CHAIN_FA = (((0, 1, 1, 1), False),        # carry = sign(a+b+c)
            ((0, 2, 2, 2), True))         # sum = NOT sign(2(a+b+c))
CHAIN_TWOS = (((MU, 1, 0, 1), False),     # reach' = OR(reach, a)
              ((_1_4, 2, 0, 2), False))   # out = XOR(a, reach)
CHAIN_CMP = (((0, 1, -1, 1), False),)     # cin' = MAJ(a, NOT b, cin)


def _chain_kernel(params: TfheParams, B: int, S: int, spec, ks_loop: bool,
                  ab0_ref, abn_ref, carry0_ref,
                  bk_ref, bksh_ref, tw_ref, tchain_ref,
                  out_ref, acc_scr, ams_scr):
    n = params.n
    IMGK = len(spec)
    IMG = IMGK * B
    C = ams_scr.shape[-1]
    s = pl.program_id(0)
    j = pl.program_id(1)
    neg_rows = [i for i, (_, neg) in enumerate(spec) if neg]
    assert neg_rows in ([], [IMGK - 1]), "only the last image slot may negate"

    def _setup(a_s, b_s, carry):
        lane_c = _iota3((B, C), 1)
        imgs = []
        for (const, ca, cb, cc), _ in spec:
            u = (jnp.int32(ca) * a_s + jnp.int32(cb) * b_s
                 + jnp.int32(cc) * carry)
            if const:
                u = u + jnp.where(lane_c == n, jnp.int32(const), 0)
            imgs.append(u)
        _images_setup(params, jnp.concatenate(imgs, axis=0), acc_scr, ams_scr)

    @pl.when((s == 0) & (j == 0))
    def _():
        _setup(ab0_ref[0], ab0_ref[1], carry0_ref[...])

    # one CMux iteration: rotation amounts from the scratch, iota-extracted
    ams = ams_scr[...]
    sel = (_iota3(ams.shape, 1) == j).astype(jnp.int32)
    bara_j = jnp.sum(ams * sel, axis=1, keepdims=True)              # [IMG, 1]
    a_slab = jnp.concatenate([bara_j, bara_j], axis=0)[:, :, None]  # [SLAB,1,1]
    acc = _cmux_iter(params, IMG, acc_scr[...], a_slab,
                     bk_ref[0], bksh_ref[0], tw_ref)
    acc_scr[...] = acc

    @pl.when(j == n - 1)
    def _():
        sample = _keyswitch(params, IMG, acc, tchain_ref, ks_loop,
                            negate_from=(IMG - B) if neg_rows else None)
        out_ref[0] = sample                                         # [IMG, C]
        # next stage: carry = switched rows [0, B); nnz lane masked out
        lane_c = _iota3((B, C), 1)
        carry = jnp.where(lane_c == C - 1, 0, sample[:B])
        _setup(abn_ref[0, 0], abn_ref[0, 1], carry)


def bit_chain(spec, a: LweCiphertext, b: LweCiphertext,
              carry0: LweCiphertext, cloud, interpret: bool = False):
    """Run a whole linear bit-scan circuit in ONE kernel launch.

    spec: one of CHAIN_FA / CHAIN_TWOS / CHAIN_CMP (or any static microcode
    tuple). a, b: LweCiphertext [B, nbits] (key-switched domain); carry0:
    [B]. Returns (outs [B, nbits] — the LAST image slot's samples per stage,
    or the carries for 1-image chains — and carry_out [B]), exact per-digit
    cv. TFHE_CHAIN_KS selects the key-switch contraction: "loop" (default;
    per-sublane-row 2-D MXU dots) or "dot" (one batched dot_general per limb
    — Mosaic currently REJECTS it: "Not Implemented: batch dims must be
    equal", the lhs batch axis sits at dim 1 while the rhs batch is dim 0,
    and transposing the mask tile in-kernel is itself an unsupported
    relayout; kept for re-probing on future toolchains)."""
    import os
    interpret = interpret or jax.default_backend() != "tpu"
    params: TfheParams = cloud.params
    N, n = params.N, params.n
    assert params.k == 1 and N % LANE == 0 and N >= 2 * LANE
    B, S = a.batch_shape[0], a.batch_shape[-1]
    IMG = len(spec) * B
    H = N // LANE
    C = cloud.ks_pad_cols
    ks_loop = os.environ.get("TFHE_CHAIN_KS", "loop") != "dot"

    def pack(ct: LweCiphertext, lead) -> jnp.ndarray:
        """[..., n]-sample -> int32[..., C] rows (a | b | zeros)."""
        buf = jnp.zeros(lead + (C,), jnp.int32)
        buf = buf.at[..., :n].set(ct.a)
        return buf.at[..., n].set(ct.b)

    ab = jnp.stack([pack(a, (B, S)), pack(b, (B, S))], axis=0)      # [2,B,S,C]
    ab = ab.transpose(2, 0, 1, 3)                                   # [S,2,B,C]
    ab0 = ab[0]
    abn = jnp.concatenate([ab, jnp.zeros((1, 2, B, C), jnp.int32)], axis=0)
    carry0_p = pack(carry0, (B,))
    # BK slices in packed-slab form (as blind_rotate_fused_packed)
    P = cloud.bk_ntt.shape[1]
    kpl, k1 = params.kpl, params.k + 1
    bk6 = cloud.bk_ntt.reshape(n, P, kpl, k1, H, LANE)
    bksh6 = cloud.bk_ntt_shoup.reshape(n, P, kpl, k1, H, LANE)
    tw = jnp.asarray(_twiddle_planes(N, params.halfBg))
    NP = tw.shape[1]
    tchain = chain_ks_table(cloud)
    TB = tchain.shape[0]

    kern = functools.partial(_chain_kernel, params, B, S, spec, ks_loop)
    call = pl.pallas_call(
        kern,
        grid=(S, n),
        in_specs=[
            pl.BlockSpec((2, B, C), lambda s, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, C), lambda s, j: (s + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda s, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, kpl, k1, H, LANE), lambda s, j: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, kpl, k1, H, LANE), lambda s, j: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NP, H, LANE), lambda s, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4, H, LANE, C), lambda s, j: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, IMG, C), lambda s, j: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, IMG, C), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k1 * IMG, H, LANE), jnp.int32),
                        pltpu.VMEM((IMG, C), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )
    out = call(ab0, abn, carry0_p, bk6, bksh6, tw, tchain)          # [S,IMG,C]

    # unpack + exact cv (the in-kernel nnz rides the last lane); outs = the
    # LAST image slot per stage (for 1-image chains that's the carry itself)
    outs = _unpack_samples(out[:, IMG - B:IMG].transpose(1, 0, 2), params)
    carry_out = _unpack_samples(out[S - 1, :B], params)
    return outs, carry_out


def fa_chain(a: LweCiphertext, b: LweCiphertext, carry0: LweCiphertext,
             cloud, interpret: bool = False):
    """Full ripple adder (sums, carry-out) = a + b + carry0 in ONE kernel."""
    return bit_chain(CHAIN_FA, a, b, carry0, cloud, interpret=interpret)


def _unpack_samples(rows, params: TfheParams) -> LweCiphertext:
    from ..core.bootstrap import _bootstrap_variance
    n = params.n
    C = rows.shape[-1]
    nnz = rows[..., C - 1].astype(jnp.float32)
    cv = (jnp.float32(_bootstrap_variance(params))
          + nnz * jnp.float32(params.ks_stdev ** 2))
    return LweCiphertext(rows[..., :n], rows[..., n], cv)


# ------------------------------------------------------- restoring division

def _div_kernel(params: TfheParams, nb: int, ks_loop: bool,
                regs0_ref, bk_ref, bksh_ref, tw_ref, tchain_ref,
                out_ref, regs_scr, acc_fa, ams_fa, acc_mux, ams_mux):
    """Restoring-division inner loop, grid = (nb rounds, nb+1 stages, n).

    Register file regs_scr rows: [0,nb) PA-high | [nb,2nb) temp (the round's
    PA-high + (-|b|) sum) | [2nb,3nb) -|b| (loop-invariant) | [3nb,4nb) |a|
    bits | 4nb the ripple carry. Stages s<nb are FA stages on bit s (2
    bootstrap images, small accumulator); stage s==nb is the restoring MUX
    (2nb images, one combined key switch), writing round r's quotient bit.
    Mirrors arith.div / ref divInternal (Cipher.cpp:526-558) with the
    loop-invariant two's complement hoisted.
    """
    n = params.n
    C = ams_fa.shape[-1]
    W = 4 * nb + 1
    r = pl.program_id(0)
    s = pl.program_id(1)
    j = pl.program_id(2)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 1)

    def row_dyn(idx):
        """[1, C] register extraction at a (possibly traced) row index."""
        m = iw == idx
        return jnp.sum(jnp.where(m, regs_scr[...], 0), axis=0, keepdims=True)

    @pl.when((r == 0) & (s == 0) & (j == 0))
    def _():
        regs_scr[...] = regs0_ref[...]
        # the output block is the whole [nb, C] array (a (1, C) row block
        # would violate Mosaic's sublane-divisibility rule); rows land by
        # masked read-modify-write at each round's end
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((s == 0) & (j == 0))
    def _():
        # round start: PA <<= 1 (pa_hi[0] <- |a| bit nb-1-r) + fresh carry-in
        alo_row = row_dyn(3 * nb + (nb - 1 - r))
        pa = regs_scr[0:nb]
        pa_shift = pltpu.roll(pa, 1, axis=0)
        i_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, C), 0)
        regs_scr[0:nb] = jnp.where(i_nb == 0, alo_row, pa_shift)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        regs_scr[4 * nb:4 * nb + 1] = jnp.where(
            lane1 == n, jnp.int32(-MU), 0)                  # trivial FALSE

    @pl.when((s < nb) & (j == 0))
    def _():
        u_c = (row_dyn(s) + row_dyn(2 * nb + s)
               + regs_scr[4 * nb:4 * nb + 1])
        _stage_setup(params, 1, u_c, acc_fa, ams_fa)

    @pl.when((s == nb) & (j == 0))
    def _():
        neg = regs_scr[2 * nb - 1:2 * nb]                   # temp sign bit
        c18 = jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, (nb, C), 1) == n, jnp.int32(-MU), 0)
        u1 = neg + regs_scr[0:nb] + c18                     # AND(neg, pa_hi)
        u2 = -neg + regs_scr[nb:2 * nb] + c18               # AND(~neg, temp)
        _images_setup(params, jnp.concatenate([u1, u2], axis=0),
                      acc_mux, ams_mux)

    def _iter(acc_scr_c, ams_scr_c, img):
        ams = ams_scr_c[...]
        sel = (_iota3(ams.shape, 1) == j).astype(jnp.int32)
        bara_j = jnp.sum(ams * sel, axis=1, keepdims=True)
        a_slab = jnp.concatenate([bara_j, bara_j], axis=0)[:, :, None]
        acc = _cmux_iter(params, img, acc_scr_c[...], a_slab,
                         bk_ref[0], bksh_ref[0], tw_ref)
        acc_scr_c[...] = acc
        return acc

    @pl.when(s < nb)
    def _():
        acc = _iter(acc_fa, ams_fa, 2)

        @pl.when(j == n - 1)
        def _():
            sw = _keyswitch(params, 2, acc, tchain_ref, ks_loop,
                            negate_from=1)                  # [2, C]
            regs = regs_scr[...]
            regs = jnp.where(iw == nb + s, sw[1:2], regs)   # temp[s] = sum
            regs = jnp.where(iw == 4 * nb, sw[0:1], regs)   # carry
            regs_scr[...] = regs

    @pl.when(s == nb)
    def _():
        acc = _iter(acc_mux, ams_mux, 2 * nb)

        @pl.when(j == n - 1)
        def _():
            # MUX recombine BEFORE the key switch (gates._mux_jit): both AND
            # halves' accumulators sum, +(0, 1/8) on the b channel
            H = params.N // LANE
            c0 = acc[0:nb] + acc[nb:2 * nb]
            c1 = acc[2 * nb:3 * nb] + acc[3 * nb:4 * nb]
            m0 = ((_iota3((nb, H, LANE), 1) == 0)
                  & (_iota3((nb, H, LANE), 2) == 0))
            c1 = c1 + jnp.where(m0, jnp.int32(MU), 0)
            sw = _keyswitch(params, nb,
                            jnp.concatenate([c0, c1], axis=0),
                            tchain_ref, ks_loop)            # [nb, C]
            regs_scr[0:nb] = sw                             # pa_hi = MUX out
            # quotient bit of this round: NOT(neg) — free negation; keep the
            # nnz lane positive for exact cv outside
            negrow = regs_scr[2 * nb - 1:2 * nb]
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            row = jnp.where(lane1 <= n, -negrow, negrow)            # [1, C]
            io = jax.lax.broadcasted_iota(jnp.int32, (nb, C), 0)
            out_ref[...] = jnp.where(io == r, row, out_ref[...])


def div_chain(abs_a: LweCiphertext, neg_b: LweCiphertext, cloud,
              interpret: bool = False) -> LweCiphertext:
    """Quotient of |a| / |b| with the WHOLE restoring-division loop — nb
    rounds of (shift, nb-stage ripple add, restoring MUX), every bootstrap
    and key switch included — as ONE kernel launch (grid nb*(nb+1)*n).

    abs_a: LweCiphertext [nb] (|a| bits); neg_b: [nb] (two's complement of
    |b|). Returns the quotient bits [nb]. The sign fixup (arith.add_sign)
    stays outside, as in ref operator/ (Cipher.cpp:508-524).
    """
    import os
    interpret = interpret or jax.default_backend() != "tpu"
    params: TfheParams = cloud.params
    N, n = params.N, params.n
    assert params.k == 1 and N % LANE == 0 and N >= 2 * LANE
    nb = abs_a.batch_shape[-1]
    assert abs_a.batch_shape == (nb,), "div_chain is single-number (B=1)"
    H = N // LANE
    C = cloud.ks_pad_cols
    W = 4 * nb + 1
    ks_loop = os.environ.get("TFHE_CHAIN_KS", "loop") != "dot"

    def pack(ct: LweCiphertext) -> np.ndarray:
        buf = jnp.zeros(ct.batch_shape + (C,), jnp.int32)
        buf = buf.at[..., :n].set(ct.a)
        return buf.at[..., n].set(ct.b)

    regs0 = jnp.zeros((W, C), jnp.int32)
    false_row = jnp.zeros((C,), jnp.int32).at[n].set(jnp.int32(-MU))
    regs0 = regs0.at[0:nb].set(false_row[None])          # pa_hi = enc(0) bits
    regs0 = regs0.at[2 * nb:3 * nb].set(pack(neg_b))
    regs0 = regs0.at[3 * nb:4 * nb].set(pack(abs_a))

    P = cloud.bk_ntt.shape[1]
    kpl, k1 = params.kpl, params.k + 1
    bk6 = cloud.bk_ntt.reshape(n, P, kpl, k1, H, LANE)
    bksh6 = cloud.bk_ntt_shoup.reshape(n, P, kpl, k1, H, LANE)
    tw = jnp.asarray(_twiddle_planes(N, params.halfBg))
    NP = tw.shape[1]
    tchain = chain_ks_table(cloud)
    TB = tchain.shape[0]

    kern = functools.partial(_div_kernel, params, nb, ks_loop)
    call = pl.pallas_call(
        kern,
        grid=(nb, nb + 1, n),
        in_specs=[
            pl.BlockSpec((W, C), lambda r, s, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, kpl, k1, H, LANE),
                         lambda r, s, j: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, kpl, k1, H, LANE),
                         lambda r, s, j: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NP, H, LANE), lambda r, s, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4, H, LANE, C), lambda r, s, j: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, C), lambda r, s, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, C), jnp.int32),
        scratch_shapes=[pltpu.VMEM((W, C), jnp.int32),
                        pltpu.VMEM((2 * k1, H, LANE), jnp.int32),
                        pltpu.VMEM((2, C), jnp.int32),
                        pltpu.VMEM((2 * nb * k1, H, LANE), jnp.int32),
                        pltpu.VMEM((2 * nb, C), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )
    out = call(regs0, bk6, bksh6, tw, tchain)               # [nb, C]
    # round r's bit lands at quotient position nb-1-r
    return _unpack_samples(out[::-1], params)
