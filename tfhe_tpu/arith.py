"""Encrypted integer arithmetic circuits (batched, LSB-first, two's complement).

Ports every circuit of the reference's arithmetic layer to batched TPU gates:
- bitwise ripple adder        <- taskLevelParallelAdd_bitwise (main.cu:821-890)
- number-wise carry-save add  <- taskLevelParallelAdd (main.cu:619-652)
- two's complement            <- twosComplement (cpuParallel/Cipher.cpp:300-311)
- subtraction                 <- operator- (Cipher.cpp:342-345)
- shift-and-add multiplier    <- multiplyLweSamples (main.cu:1483-1579), with the
                                 iBits^2 AND matrix in ONE bootstrap batch and the
                                 log-tree reduction (paper section V-B2)
- comparison (>, <=, ==)      <- Cipher.cpp:597-644
- minimum / compare_bit       <- Cipher.cpp:313-340
- absolute                    <- Cipher.cpp:483-505
- division (restoring)        <- divInternal / operator/ (Cipher.cpp:508-558)
- addSign (cond. negate)      <- Cipher.cpp:560-577
- shifts                      <- leftShift/innerRightShift etc.

An n-bit integer is an LweCiphertext batch with trailing axis nbits (bit i =
2^i). All circuits accept arbitrary leading batch shapes, so "vector ops" are
the same circuits on a bigger batch (the reference's `_vector` variants).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import gates
from .core.lwe import LweCiphertext, lwe_concat, lwe_stack
from .core.crypt import lwe_encrypt, lwe_phase
from .numeric import mod_switch_to_torus32
from .params import TfheParams

_1_8 = gates._1_8


# --------------------------------------------------------------- encode / io

def encrypt_int(sk, value, nbits: int, seed: int = 0) -> LweCiphertext:
    """Encrypt integers as nbits LSB-first encrypted bits
    (ref convertNumberToBits, main.cu:524-548). value: int or int array."""
    value = np.asarray(value, np.int64)
    bits = (value[..., None] >> np.arange(nbits)) & 1
    from .core.crypt import encrypt_bits
    return encrypt_bits(sk, bits.astype(np.int32), seed=seed)


def decrypt_int(sk, ct: LweCiphertext, signed: bool = True) -> np.ndarray:
    """Decrypt an integer ciphertext (ref decryptCheck, main.cu:2203-2222)."""
    from .core.crypt import decrypt_bits
    bits = decrypt_bits(sk, ct).astype(np.int64)
    nbits = bits.shape[-1]
    val = np.sum(bits * (1 << np.arange(nbits)), axis=-1)
    if signed:
        val = val - (bits[..., -1] << nbits)
    return val


def trivial_bits(bits, n: int, batch_shape=None) -> LweCiphertext:
    """Noiseless trivial encryption of constant bits (default: keep shape)."""
    bits = jnp.asarray(bits, jnp.int32)
    if batch_shape is None:
        batch_shape = bits.shape
    bits = jnp.broadcast_to(bits, batch_shape)
    return gates.CONSTANT(bits, n, bits.shape)


def zero_like_bits(x: LweCiphertext, batch_shape) -> LweCiphertext:
    return gates.CONSTANT(jnp.zeros(batch_shape, jnp.int32), x.n, batch_shape)


# --------------------------------------------------------------- adders

import jax


def _fa_stage(ai, bi, carry, cloud):
    """One full-adder stage in 4 bootstraps (vs the reference's 5-gate form,
    paper section V-A3 / main.cu:821-890):

        t   = a XOR b                      (1 bootstrap)
        sum = t XOR cin                    (1)
        cout= MUX(t, cin, a) = maj(a,b,cin)  (2 bootstraps, 1 key switch)

    20% fewer bootstraps than XORXOR/AND/XORXOR; dominates every adder-heavy
    workload (adds, multiplier trees, matrix multiplies)."""
    t = gates.XOR(ai, bi, cloud)
    si = gates.XOR(t, carry, cloud)
    carry = gates.MUX(t, carry, ai, cloud)
    return si, carry


@jax.jit
def _fa_stage_jit(ai, bi, carry, cloud):
    """_fa_stage as ONE program with the second round FUSED: the sum's XOR
    image and the carry-MUX's two AND images ride ONE bootstrap batch, then
    one combined key switch — 2 kernel launches / 2 KS per bit instead of 3,
    which is what the serial carry chain's latency is made of."""
    import jax.numpy as jnp
    from .core import bootstrap as bs
    from .core.lwe import lwe_concat as cat

    B = 1
    for s in ai.batch_shape:
        B *= s
    af, bf, cf = ai.reshape(B), bi.reshape(B), carry.reshape(B)
    t = gates.gate2("XOR", af, bf, cloud)                      # round 1

    xor_c, xor_a, xor_b = gates.GATE_TABLE["XOR"]
    and_c, and_a, and_b = gates.GATE_TABLE["AND"]
    ny_c, ny_a, ny_b = gates.GATE_TABLE["ANDNY"]
    s_img = gates._affine2(t, cf, jnp.int32(xor_c), jnp.int32(xor_a), jnp.int32(xor_b))
    m1 = gates._affine2(t, cf, jnp.int32(and_c), jnp.int32(and_a), jnp.int32(and_b))
    m2 = gates._affine2(t, af, jnp.int32(ny_c), jnp.int32(ny_a), jnp.int32(ny_b))
    u = cat([s_img, m1, m2], axis=0)
    Bp = gates._bucket(3 * B)
    u = gates._pad_flat(u, Bp)
    a_ext, b_ext, cv = bs.bootstrap_woks(u, jnp.int32(gates.MU), cloud)
    # sum rows pass through; carry rows = MUX tail u1+u2+(0,1/8) (gates._mux_jit)
    a_c = a_ext[B:2 * B] + a_ext[2 * B:3 * B]
    b_c = jnp.int32(gates._1_8) + b_ext[B:2 * B] + b_ext[2 * B:3 * B]
    cv_c = cv[B:2 * B] + cv[2 * B:3 * B]
    out = bs.key_switch(jnp.concatenate([a_ext[:B], a_c]),
                        jnp.concatenate([b_ext[:B], b_c]),
                        cloud.ks_table,
                        jnp.concatenate([cv[:B], cv_c]), cloud.params)
    return (out[:B].reshape(ai.batch_shape),
            out[B:].reshape(ai.batch_shape))


def add(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Bitwise ripple-carry adder, the reference's fastest (GPU_1)
    (taskLevelParallelAdd_bitwise, main.cu:821-890). 3 bootstrap rounds per bit,
    each batched over all leading axes and fused into one program per bit;
    result has the same nbits (overflow dropped, matching the reference)."""
    nbits = a.batch_shape[-1]
    # fuse the stage into one program only while every bootstrap inside fits a
    # single chunk (the fused stage's batch is bucket(3*flat) <= 4*flat;
    # otherwise the traced program would contain dozens of kernels, which the
    # device tunnel's AOT compiler cannot handle)
    flat = 1
    for s in a.batch_shape[:-1]:
        flat *= s
    fused = 4 * flat <= gates.GATE_CHUNK
    # bit 0: sum = XOR, carry = AND, one compound bootstrap
    c0, s0 = gates.gate2_pair("AND", "XOR", a[..., 0], b[..., 0], a[..., 0], b[..., 0], cloud)
    sums = [s0]
    carry = c0
    for i in range(1, nbits):
        ai, bi = a[..., i], b[..., i]
        if fused:
            si, carry = _fa_stage_jit(ai, bi, carry, cloud)
        else:
            si, carry = _fa_stage(ai, bi, carry, cloud)
        sums.append(si)
    return lwe_stack(sums, axis=-1)


@jax.jit
def _gpun_stage_jit(result, tempb, cloud):
    """One carry-save iteration (compound ANDXOR + carry shift) as one program."""
    and_out, xor_out = gates.gate2_pair("AND", "XOR", result, tempb, result, tempb, cloud)
    # tempb = and_out << 1 with encrypted FALSE at bit 0 (main.cu:656-700)
    zero = gates.CONSTANT(jnp.zeros(result.batch_shape[:-1] + (1,), jnp.int32),
                          result.a.shape[-1], result.batch_shape[:-1] + (1,))
    return xor_out, lwe_concat([zero, and_out[..., :-1]], axis=-1)


def add_numberwise(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Number-wise carry-save adder (GPU_n, taskLevelParallelAdd main.cu:619-652):
    nbits iterations of one compound ANDXOR bootstrap over all bits, each
    iteration fused into one program (when it fits one gate chunk)."""
    nbits = a.batch_shape[-1]
    flat = 1
    for s in a.batch_shape:
        flat *= s
    fused = 2 * flat <= gates.GATE_CHUNK
    result = a
    tempb = b
    for _ in range(nbits):
        if fused:
            result, tempb = _gpun_stage_jit(result, tempb, cloud)
        else:
            and_out, xor_out = gates.gate2_pair("AND", "XOR", result, tempb, result, tempb, cloud)
            zero = zero_like_bits(a, a.batch_shape[:-1] + (1,))
            tempb = lwe_concat([zero, and_out[..., :-1]], axis=-1)
            result = xor_out
    return result


def twos_complement(a: LweCiphertext, cloud) -> LweCiphertext:
    """-a (ref twosComplement, Cipher.cpp:300-311): scan with a reach-one signal,
    one compound (XOR, OR) bootstrap per bit."""
    nbits = a.batch_shape[-1]
    reach = zero_like_bits(a, a.batch_shape[:-1])
    outs = []
    for i in range(nbits):
        out_i, reach = gates.gate2_pair("XOR", "OR", a[..., i], reach, reach, a[..., i], cloud)
        outs.append(out_i)
    return lwe_stack(outs, axis=-1)


def sub(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """a - b = a + twos_complement(b) (ref Cipher.cpp:342-345)."""
    return add(a, twos_complement(b, cloud), cloud)


def left_shift(a: LweCiphertext, k: int) -> LweCiphertext:
    """a << k with trivial FALSE fill (ref leftShift..., main.cu:1359-1481)."""
    if k == 0:
        return a
    zero = zero_like_bits(a, a.batch_shape[:-1] + (k,))
    return lwe_concat([zero, a[..., :-k]], axis=-1)


def right_shift_arith(a: LweCiphertext, k: int, cloud=None) -> LweCiphertext:
    """Arithmetic right shift, sign-extended (ref innerRightShift,
    Cipher.cpp:455-481).

    With `cloud` given, also applies the reference's negative-rounding
    correction (Cipher.cpp:470-480): add `sign ? 1 : 0` so negative operands
    shift like positives ("keeping the negative numbers like positive
    numbers"); the MUX also refreshes the replicated sign bit's noise.
    Without `cloud` the shift is the bootstrap-free sign extension only
    (floor semantics — the reference's first loop, Cipher.cpp:461-466).
    """
    if k == 0:
        return a
    nbits = a.batch_shape[-1]
    sign = a[..., nbits - 1:nbits]
    exts = lwe_concat([sign] * k, axis=-1)
    shifted = lwe_concat([a[..., k:], exts], axis=-1)
    if cloud is None:
        return shifted
    one = gates.CONSTANT(1, a.n, sign.batch_shape)
    zero = gates.CONSTANT(0, a.n, sign.batch_shape)
    lsb = gates.MUX(sign, one, zero, cloud)               # sign ? 1 : 0
    to_add = lwe_concat(
        [lsb, zero_like_bits(a, a.batch_shape[:-1] + (nbits - 1,))], axis=-1)
    return add(shifted, to_add, cloud)


# --------------------------------------------------------------- multiplier

def mul(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Shift-and-add multiplication, nbits-bit truncated result
    (ref multiplyLweSamples, main.cu:1483-1579):

    1. all nbits^2 partial-product ANDs in ONE bootstrap batch,
    2. shifted partial products padded with trivial zeros,
    3. log2-tree reduction with the batched ripple adder (paper Fig. 4).
    """
    nbits = a.batch_shape[-1]
    lead = a.batch_shape[:-1]
    # partial products: pp[i, j] = b_i AND a_j  -> batch [..., nbits, nbits]
    arow = lwe_stack([a] * nbits, axis=-2)                 # [..., i, j] = a_j
    bcol = lwe_stack([b[..., i] for i in range(nbits)], axis=-1)
    bmat = lwe_stack([bcol] * nbits, axis=-1)              # [..., i, j] = b_i
    pp = gates.AND(arow, bmat, cloud)                      # [..., nbits, nbits]
    # shift row i left by i (truncated to nbits)
    rows = []
    for i in range(nbits):
        row = pp[..., i, :]
        rows.append(left_shift(row, i) if i else row)
    # tree reduction (main.cu:1547-1569)
    while len(rows) > 1:
        nxt = []
        half = len(rows) // 2
        lhs = lwe_stack(rows[:half], axis=-2)
        rhs = lwe_stack(rows[half:2 * half], axis=-2)
        summed = add(lhs, rhs, cloud)                      # batched over the pair axis
        nxt = [summed[..., i, :] for i in range(half)]
        if len(rows) % 2:
            nxt.append(rows[-1])
        rows = nxt
    return rows[0]


def mul_mux(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """MUX-based shift-and-add multiplier — the reference CPU framework's
    alternative `mul` (ref mulBinary path inside Cipher::mul,
    cpuParallel/Cipher.cpp:126-176): partial product i is
    MUX(b_i, a << i, 0) (one batched MUX for all rows), then the same
    log-tree reduction as `mul`."""
    nbits = a.batch_shape[-1]
    shifted = lwe_stack([left_shift(a, i) for i in range(nbits)], axis=-2)
    bcol = lwe_stack([b[..., i] for i in range(nbits)], axis=-1)
    sel = lwe_stack([bcol] * nbits, axis=-1)               # [..., i, j] = b_i
    zeros = zero_like_bits(a, shifted.batch_shape)
    rows_ct = gates.MUX(sel, shifted, zeros, cloud)        # [..., nbits, nbits]
    rows = [rows_ct[..., i, :] for i in range(nbits)]
    while len(rows) > 1:
        half = len(rows) // 2
        lhs = lwe_stack(rows[:half], axis=-2)
        rhs = lwe_stack(rows[half:2 * half], axis=-2)
        summed = add(lhs, rhs, cloud)
        nxt = [summed[..., i, :] for i in range(half)]
        if len(rows) % 2:
            nxt.append(rows[-1])
        rows = nxt
    return rows[0]


def mul_full(a: LweCiphertext, b: LweCiphertext, cloud, out_bits: int) -> LweCiphertext:
    """Shift-and-add multiply with an explicit output width (zero-extends
    inputs; used by Karatsuba for full-width half-products)."""
    nbits = a.batch_shape[-1]
    pad = out_bits - nbits
    if pad > 0:
        za = zero_like_bits(a, a.batch_shape[:-1] + (pad,))
        a = lwe_concat([a, za], axis=-1)
        b = lwe_concat([b, za], axis=-1)
    return mul(a, b, cloud)


def mul_karatsuba(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Karatsuba multiplication (ref karatMasterSuba, main.cu:1867-2089;
    cpuParallel OMP-task variant cloud.cpp:77-131; paper section V-B2).

    Splits nbits = 2h, batches the three half-multiplies (a0*b0, a1*b1,
    (a0+a1)*(b0+b1)) as ONE vector multiply - the reference's key trick of
    concatenating them into a single coalesced multiply - then recombines:
    result = d1*2^2h + (d2-d1-d0)*2^h + d0, truncated to nbits.
    """
    nbits = a.batch_shape[-1]
    assert nbits % 2 == 0, "karatsuba needs even bit width"
    h = nbits // 2
    w = nbits + 2                      # width that fits (a0+a1)*(b0+b1)
    a0, a1 = a[..., :h], a[..., h:]
    b0, b1 = b[..., :h], b[..., h:]

    def zext(x, width):
        pad = width - x.batch_shape[-1]
        return lwe_concat([x, zero_like_bits(x, x.batch_shape[:-1] + (pad,))], axis=-1)

    sa = add(zext(a0, h + 1), zext(a1, h + 1), cloud)      # a0 + a1, h+1 bits
    sb = add(zext(b0, h + 1), zext(b1, h + 1), cloud)
    # one batched multiply for all three products (leading axis 3)
    lhs = lwe_stack([zext(a0, w), zext(a1, w), zext(sa, w)], axis=-2)
    rhs = lwe_stack([zext(b0, w), zext(b1, w), zext(sb, w)], axis=-2)
    prods = mul(lhs, rhs, cloud)                           # [..., 3, w]
    d0, d1, d2 = prods[..., 0, :], prods[..., 1, :], prods[..., 2, :]
    mid = sub(sub(d2, d1, cloud), d0, cloud)               # d2 - d1 - d0
    # result (mod 2^nbits) = d0 + mid<<h + d1<<2h; 2h >= nbits so d1 drops out
    out = add(d0[..., :nbits],
              left_shift(mid[..., :nbits], h)[..., :nbits] if h else mid[..., :nbits],
              cloud)
    return out


# --------------------------------------------------------------- comparisons

@jax.jit
def _compare_bit_jit(result, ai, bi, cloud):
    t = gates.XNOR(ai, bi, cloud)
    return gates.MUX(t, result, ai, cloud)


def compare_bit(result, ai, bi, cloud):
    """One comparator stage (ref Cipher::compare_bit, Cipher.cpp:335-340):
    result' = MUX(XNOR(a,b), result, a) — fused into one program when small."""
    flat = 1
    for s in ai.batch_shape:
        flat *= s
    if 2 * flat <= gates.GATE_CHUNK:
        return _compare_bit_jit(result, ai, bi, cloud)
    t = gates.XNOR(ai, bi, cloud)
    return gates.MUX(t, result, ai, cloud)


def minimum(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Minimum of two (positive) numbers (ref minimum, Cipher.cpp:313-333)."""
    nbits = a.batch_shape[-1]
    cmp = zero_like_bits(a, a.batch_shape[:-1])
    for i in range(nbits):
        cmp = compare_bit(cmp, a[..., i], b[..., i], cloud)
    # cmp == 1 iff b larger? (ref: 0 if a larger, 1 if b larger) -> out = MUX(cmp, b, a)
    cmps = lwe_stack([cmp] * nbits, axis=-1)
    return gates.MUX(cmps, b, a, cloud)


@jax.jit
def _gt_stage_jit(ai, bi, cin, cloud):
    """One comparator stage as one program: cin' = MUX(a^b, a, cin)
    (3 bootstraps; equivalent to ref compareBit_g's a ^ ((a^cin) & (b^cin)),
    Cipher.cpp:620-631, which needs 4)."""
    t = gates.XOR(ai, bi, cloud)
    return gates.MUX(t, ai, cin, cloud)


def gt(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Signed a > b -> 1-bit ciphertext (ref Cipher::operator>, Cipher.cpp:597-608)."""
    nbits = a.batch_shape[-1]
    flat = 1
    for s in a.batch_shape[:-1]:
        flat *= s
    fused = 2 * flat <= gates.GATE_CHUNK
    cin = zero_like_bits(a, a.batch_shape[:-1])
    for i in range(nbits):
        if fused:
            cin = _gt_stage_jit(a[..., i], b[..., i], cin, cloud)
        else:
            t1, t2 = gates.gate2_pair("XOR", "XOR", a[..., i], cin, b[..., i], cin, cloud)
            t = gates.AND(t1, t2, cloud)
            cin = gates.XOR(a[..., i], t, cloud)
    sign = gates.XOR(a[..., nbits - 1], b[..., nbits - 1], cloud)
    return gates.XOR(sign, cin, cloud)


def le(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """a <= b (ref Cipher::operator<=, Cipher.cpp:610-614)."""
    return gates.NOT(gt(a, b, cloud))


def eq(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """a == b (ref Cipher::operator==, Cipher.cpp:633-644), with a log-depth
    OR tree instead of the reference's sequential OR chain."""
    x = gates.XOR(a, b, cloud)                             # [..., nbits]
    bits = [x[..., i] for i in range(x.batch_shape[-1])]
    while len(bits) > 1:
        half = len(bits) // 2
        lhs = lwe_stack(bits[:half], axis=-1)
        rhs = lwe_stack(bits[half:2 * half], axis=-1)
        ored = gates.OR(lhs, rhs, cloud)
        nxt = [ored[..., i] for i in range(half)]
        if len(bits) % 2:
            nxt.append(bits[-1])
        bits = nxt
    return gates.NOT(bits[0])


# --------------------------------------------------------------- signed ops

def absolute(a: LweCiphertext, cloud) -> LweCiphertext:
    """|a| (ref absolute, Cipher.cpp:483-505): (a + sign_mask) ^ sign_mask."""
    nbits = a.batch_shape[-1]
    sign = a[..., nbits - 1]
    mask = lwe_stack([sign] * nbits, axis=-1)
    res = add(mask, a, cloud)
    return gates.XOR(res, mask, cloud)


def add_sign(x: LweCiphertext, sign, cloud) -> LweCiphertext:
    """Conditionally negate x when sign==1 (ref addSign, Cipher.cpp:560-577)."""
    nbits = x.batch_shape[-1]
    reach = zero_like_bits(x, x.batch_shape[:-1])
    result = []
    for i in range(nbits - 1):
        r_i = gates.XOR(x[..., i], reach, cloud)
        reach = gates.OR(reach, x[..., i], cloud)
        result.append(r_i)
    result.append(gates.XOR(x[..., nbits - 1], reach, cloud))
    res = lwe_stack(result, axis=-1)
    signs = lwe_stack([sign] * nbits, axis=-1)
    return gates.MUX(signs, res, x, cloud)


def div(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Signed division via restoring division on absolutes
    (ref operator/ + divInternal, Cipher.cpp:508-558)."""
    nbits = a.batch_shape[-1]
    abs_a = absolute(a, cloud)
    abs_b = absolute(b, cloud)
    # -|b| hoisted out of the loop (the reference's divInternal recomputes the
    # subtraction's complement every round, Cipher.cpp:526-558; it is loop
    # invariant — hoisting halves the per-iteration bootstrap count)
    neg_b = twos_complement(abs_b, cloud)
    # PA register: [remainder(nbits) | quotient-in-progress], LSB half = abs_a
    pa_lo = abs_a                                  # bits [0, nbits)
    pa_hi = zero_like_bits(a, a.batch_shape)       # bits [nbits, 2nbits)
    for _ in range(nbits):
        # PA <<= 1 across the 2*nbits register
        pa_hi = lwe_concat([pa_lo[..., nbits - 1:nbits], pa_hi[..., :-1]], axis=-1)
        zero1 = zero_like_bits(a, a.batch_shape[:-1] + (1,))
        pa_lo = lwe_concat([zero1, pa_lo[..., :-1]], axis=-1)
        temp_p = add(pa_hi, neg_b, cloud)
        neg = temp_p[..., nbits - 1]               # 1 if tempP < 0
        bit = gates.NOT(neg)
        pa_lo = lwe_concat([bit.reshape(bit.batch_shape + (1,)), pa_lo[..., 1:]], axis=-1)
        negs = lwe_stack([neg] * nbits, axis=-1)
        pa_hi = gates.MUX(negs, pa_hi, temp_p, cloud)
    quotient = pa_lo
    sign = gates.XOR(a[..., nbits - 1], b[..., nbits - 1], cloud)
    return add_sign(quotient, sign, cloud)
