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
from .core.lwe import LweCiphertext, lwe_concat, lwe_stack, lwe_take
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


def add(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Bitwise ripple-carry adder, the reference's fastest (GPU_1)
    (taskLevelParallelAdd_bitwise, main.cu:821-890), rebuilt on the 2-bootstrap
    full adder (gates.full_adder): per bit, ONE batched bootstrap kernel (sum
    + carry images) and one key switch — vs the reference's 5 gates / 3
    sequential bootstraps per bit. Result has the same nbits (overflow
    dropped, matching the reference)."""
    nbits = a.batch_shape[-1]
    # bit 0: sum = XOR, carry = AND, one compound bootstrap
    c0, s0 = gates.gate2_pair("AND", "XOR", a[..., 0], b[..., 0], a[..., 0], b[..., 0], cloud)
    sums = [s0]
    carry = c0
    for i in range(1, nbits):
        si, carry = gates.full_adder(a[..., i], b[..., i], carry, cloud)
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
    """a - b (ref Cipher.cpp:342-345 computes a + twos_complement(b); here
    the identity a - b = a + not(b) + 1 folds the complement into the ripple
    chain's carry-in — the NOT is a free negation, halving the bootstrap
    count vs the reference's circuit while computing the same function."""
    nbits = a.batch_shape[-1]
    nb = gates.NOT(b)
    carry = gates.CONSTANT(jnp.ones(a.batch_shape[:-1], jnp.int32), a.n,
                           a.batch_shape[:-1])
    sums = []
    for i in range(nbits):
        si, carry = gates.full_adder(a[..., i], nb[..., i], carry, cloud)
        sums.append(si)
    return lwe_stack(sums, axis=-1)


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
    # partial products, TRUNCATION-AWARE: row i shifted left by i only
    # contributes bits j < nbits - i of a, so only the nbits*(nbits+1)/2
    # triangle pairs are bootstrapped (136 vs 256 ANDs at 16 bits) — the
    # reference computes the full iBits^2 matrix (main.cu:1524-1526).
    # Assembly is all single-gather ops (lwe_take), not per-slice loops.
    pairs = [(i, j) for i in range(nbits) for j in range(nbits - i)]
    P = len(pairs)
    lhs = lwe_take(a, np.array([j for (_, j) in pairs]), axis=-1)   # [..., P]
    rhs = lwe_take(b, np.array([i for (i, _) in pairs]), axis=-1)   # [..., P]
    pp = gates.AND(lhs, rhs, cloud)                                 # [..., P]
    # scatter into the pre-shifted row matrix via one gather from pp ++ [0]:
    # rows[i, k] = pp[pos(i, k-i)] for k >= i, else the trivial-zero slot P
    pos = np.full((nbits, nbits), P, np.int32)
    off = 0
    for i in range(nbits):
        for j in range(nbits - i):
            pos[i, i + j] = off + j
        off += nbits - i
    ppz = lwe_concat([pp, zero_like_bits(a, lead + (1,))], axis=-1)
    rows = lwe_take(ppz, pos.reshape(-1), axis=-1).reshape(lead + (nbits, nbits))
    return _tree_sum_rows(rows, add, cloud)


def _tree_sum_rows(rows: LweCiphertext, add_fn, cloud) -> LweCiphertext:
    """Log-tree reduction over axis -2 (main.cu:1547-1569), keeping the rows
    as ONE tensor (halved by slicing each level — no per-row stack loops)."""
    R = rows.batch_shape[-2]
    while R > 1:
        half = R // 2
        summed = add_fn(rows[..., :half, :], rows[..., half:2 * half, :], cloud)
        if R % 2:
            rows = lwe_concat([summed, rows[..., 2 * half:, :]], axis=-2)
        else:
            rows = summed
        R = (R + 1) // 2
    return rows[..., 0, :]


def mul_mux(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """MUX-based shift-and-add multiplier — the reference CPU framework's
    alternative `mul` (ref mulBinary path inside Cipher::mul,
    cpuParallel/Cipher.cpp:126-176): partial product i is
    MUX(b_i, a << i, 0) (one batched MUX for all rows), then the same
    log-tree reduction as `mul`."""
    nbits = a.batch_shape[-1]
    lead = a.batch_shape[:-1]
    # shifted[i, k] = a[k - i] for k >= i else trivial zero: one gather
    az = lwe_concat([a, zero_like_bits(a, lead + (1,))], axis=-1)
    pos = np.full((nbits, nbits), nbits, np.int32)
    for i in range(nbits):
        pos[i, i:] = np.arange(nbits - i)
    shifted = lwe_take(az, pos.reshape(-1), axis=-1).reshape(lead + (nbits, nbits))
    sel = lwe_take(b, np.repeat(np.arange(nbits), nbits), axis=-1) \
        .reshape(lead + (nbits, nbits))                    # [..., i, j] = b_i
    zeros = zero_like_bits(a, shifted.batch_shape)
    rows = gates.MUX(sel, shifted, zeros, cloud)           # [..., nbits, nbits]
    return _tree_sum_rows(rows, add, cloud)


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

def compare_bit(result, ai, bi, cloud):
    """One comparator stage (ref Cipher::compare_bit, Cipher.cpp:335-340):
    result' = MUX(XNOR(a,b), result, a), which equals MAJ(a, not b, result)
    — ONE bootstrap instead of the reference's XNOR+MUX (3)."""
    return gates.MAJ(ai, gates.NOT(bi), result, cloud)


def minimum(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Minimum of two (positive) numbers (ref minimum, Cipher.cpp:313-333)."""
    nbits = a.batch_shape[-1]
    cmp = zero_like_bits(a, a.batch_shape[:-1])
    for i in range(nbits):
        cmp = compare_bit(cmp, a[..., i], b[..., i], cloud)
    # cmp == 1 iff b larger? (ref: 0 if a larger, 1 if b larger) -> out = MUX(cmp, b, a)
    cmps = lwe_stack([cmp] * nbits, axis=-1)
    return gates.MUX(cmps, b, a, cloud)


def gt(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """Signed a > b -> 1-bit ciphertext (ref Cipher::operator>,
    Cipher.cpp:597-608, whose stage a ^ ((a^cin) & (b^cin)) needs 4 gates).
    Here each stage is cin' = MUX(a^b, a, cin) == MAJ(a, not b, cin) — ONE
    bootstrap — and the signed fixup (a_msb ^ b_msb) ^ cin is one XOR3."""
    nbits = a.batch_shape[-1]
    cin = zero_like_bits(a, a.batch_shape[:-1])
    for i in range(nbits):
        cin = gates.MAJ(a[..., i], gates.NOT(b[..., i]), cin, cloud)
    return gates.XOR3(a[..., nbits - 1], b[..., nbits - 1], cin, cloud)


def le(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """a <= b (ref Cipher::operator<=, Cipher.cpp:610-614)."""
    return gates.NOT(gt(a, b, cloud))


def eq(a: LweCiphertext, b: LweCiphertext, cloud) -> LweCiphertext:
    """a == b (ref Cipher::operator==, Cipher.cpp:633-644), with a log-depth
    OR tree instead of the reference's sequential OR chain."""
    x = gates.XOR(a, b, cloud)                             # [..., nbits]
    R = x.batch_shape[-1]
    while R > 1:
        half = R // 2
        ored = gates.OR(x[..., :half], x[..., half:2 * half], cloud)
        x = lwe_concat([ored, x[..., 2 * half:]], axis=-1) if R % 2 else ored
        R = (R + 1) // 2
    return gates.NOT(x[..., 0])


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
