"""Byte-SWAR segmented scans: 4 edge-axis rows packed per int32 word.

Mosaic v5e has no int8/int16 lane rolls, so narrow-dtype scans cannot run
natively — but the fused BFS level only scans VALUES THAT FIT A BYTE
(frontier bits 0/1, levels <= 126). These helpers run the log-step ladders
of ops/scan_kernels.py on int32 words whose four bytes are four flat rows
of the [R, 128] block ("plane-contiguous": byte b of word (pr, l) holds
flat row (R/4)*b + pr, lane l). Lane rolls act on each byte-plane
independently, so the lane ladder is ordinary int32 rolls on a quarter of
the data; combines become byte-masked selects (3-5 ops), a ~3x VPU saving
over full-width int32 scans.

All functions are written for use INSIDE Pallas TPU kernels (they use
pltpu.roll); test via interpret-mode pallas_call.

Reference parity: these replace CUB BlockScan inside the reference's hot
advance kernel (advance/block_mapped.hxx:84-87) — at byte density.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128
_REP = 0x01010101              # byte replication multiplier


def _shr(x, k):
    return jax.lax.shift_right_logical(x, k)


def pack4(x):
    """[4R, 128] int32 (byte-range values) -> [R, 128] packed words.
    Plane-contiguous: byte b <- rows [R*b, R*(b+1))."""
    r4 = x.shape[0]
    t = x.reshape(4, r4 // 4, LANES)
    return t[0] | (t[1] << 8) | (t[2] << 16) | (t[3] << 24)


def unpack4(xp):
    """[R, 128] packed -> [4R, 128] int32 (bytes zero-extended)."""
    m = jnp.int32(0xFF)
    return jnp.concatenate(
        [xp & m, _shr(xp, 8) & m, _shr(xp, 16) & m, _shr(xp, 24)], axis=0)


def byte_mask(f):
    """0/1 bytes -> 0x00/0xFF bytes (per-byte select mask)."""
    return (f << 8) - f


def bsel(m, a, b):
    """Bytewise select: a where mask byte 0xFF, else b (3 ops)."""
    return b ^ ((a ^ b) & m)


def replicate_byte(s):
    """Replicate the low byte of scalar/array s into all four bytes."""
    return (s & 0xFF) * _REP


def eq_bytes(x, v):
    """0/1 bytes: 1 where byte of x == byte of v (exact; v int32 word or
    python int replicated). Bit 0 of each output byte is borrow-safe: the
    OR-reduction tree only ever reads same-byte bits into bit 0."""
    d = x ^ (v if isinstance(v, jax.Array) else jnp.int32((v & 0xFF) * _REP))
    t = d | _shr(d, 4)
    t = t | _shr(t, 2)
    t = t | _shr(t, 1)
    return ~t & _REP


def ge_bytes_const(x, v):
    """0/1 bytes: 1 where byte of x >= v, for byte values 0..127 and
    1 <= v <= 128. Bit 7 is pre-set per byte so the SWAR subtraction
    never borrows across bytes."""
    d = (x | jnp.int32(0x80808080 - 0x100000000)) - jnp.int32(v * _REP)
    return _shr(d, 7) & _REP


def _shift_lanes_r(x, k, lane):
    """Shift right by k along lanes (pull from lower lanes), zero-fill."""
    from jax.experimental.pallas import tpu as pltpu
    r = pltpu.roll(x, k, 1)
    return jnp.where(lane < k, 0, r)


def _shift_lanes_l(x, k, lane):
    """Shift left by k along lanes (pull from higher lanes), zero-fill."""
    from jax.experimental.pallas import tpu as pltpu
    r = pltpu.roll(x, LANES - k, 1)
    return jnp.where(lane >= LANES - k, 0, r)


def _shift_rows_r(x, k):
    from jax.experimental.pallas import tpu as pltpu
    rows = x.shape[0]
    r = pltpu.roll(x, k, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < k, 0, r)


def _shift_rows_l(x, k):
    from jax.experimental.pallas import tpu as pltpu
    rows = x.shape[0]
    r = pltpu.roll(x, rows - k, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= rows - k, 0, r)


def fill_from_starts(v, f, carry_rep):
    """Forward segmented fill on packed bytes: every flat position takes
    the value at the latest start-flagged position at or before it.

    v, f: [R, 128] packed (f bytes 0/1 start flags; v valid at starts).
    carry_rep: replicated-byte int32 word — the fill value crossing in
    from the previous block. Returns (fill, new_carry_rep)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    rows = v.shape[0]
    k = 1
    while k < LANES:
        sv = _shift_lanes_r(v, k, lane)
        sf = _shift_lanes_r(f, k, lane)
        m = byte_mask(f)
        v = bsel(m, v, sv)
        f = f | sf
        k *= 2
    # per-flat-row summaries at lane 127
    rv = v[:, LANES - 1:LANES]
    rf = f[:, LANES - 1:LANES]
    # exclusive prefix over pr within each byte-plane
    pv = _shift_rows_r(rv, 1)
    pf = _shift_rows_r(rf, 1)
    k = 1
    while k < rows:
        sv = _shift_rows_r(pv, k)
        sf = _shift_rows_r(pf, k)
        m = byte_mask(pf)
        pv = bsel(m, pv, sv)
        pf = pf | sf
        k *= 2
    # inclusive whole-plane aggregates (scalar word: byte b = plane b)
    am = byte_mask(rf[rows - 1:rows, :])
    av = bsel(am, rv[rows - 1:rows, :], pv[rows - 1:rows, :])
    af = rf[rows - 1:rows, :] | pf[rows - 1:rows, :]
    # exclusive prefix across the four planes (byte ladder on the scalar)
    ev = av << 8
    ef = af << 8
    for kb in (8, 16):
        m = byte_mask(ef)
        ev = bsel(m, ev, ev << kb)
        ef = ef | (ef << kb)
    # plane prefix + within-plane prefix -> full flat-row prefix
    m = byte_mask(pf)
    Pv = bsel(m, pv, ev)
    Pf = pf | ef
    m = byte_mask(f)
    v = bsel(m, v, Pv)
    f = f | Pf
    m = byte_mask(f)
    fill = bsel(m, v, carry_rep)
    # new carry: fill at the block's LAST flat position = byte 3 of
    # word (rows-1, 127)
    last = fill[rows - 1:rows, LANES - 1:LANES]
    new_carry = replicate_byte(_shr(last, 24))
    return fill, new_carry


def suffix_or(z, end, carry_rep):
    """Suffix segmented OR on packed 0/1 bytes: s[p] = OR of z over
    [p .. segment end]; ``end`` marks segment-END positions.

    carry_rep: replicated 0/1 byte word — the suffix value at the first
    flat position of the block to the right. Returns (s, new_carry_rep).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    rows = z.shape[0]
    v = z
    f = end
    k = 1
    while k < LANES:
        sv = _shift_lanes_l(v, k, lane)
        sf = _shift_lanes_l(f, k, lane)
        v = v | (sv & ~byte_mask(f))
        f = f | sf
        k *= 2
    rv = v[:, 0:1]                 # whole-row suffix aggregate at lane 0
    rf = f[:, 0:1]
    pv = _shift_rows_l(rv, 1)      # suffix over HIGHER pr, exclusive
    pf = _shift_rows_l(rf, 1)
    k = 1
    while k < rows:
        sv = _shift_rows_l(pv, k)
        sf = _shift_rows_l(pf, k)
        pv = pv | (sv & ~byte_mask(pf))
        pf = pf | sf
        k *= 2
    # inclusive whole-plane aggregates (at pr = 0)
    av = rv[0:1, :] | (pv[0:1, :] & ~byte_mask(rf[0:1, :]))
    af = rf[0:1, :] | pf[0:1, :]
    # suffix across planes: byte b needs planes > b (shift bytes DOWN)
    ev = _shr(av, 8)
    ef = _shr(af, 8)
    for kb in (8, 16):
        ev = ev | (_shr(ev, kb) & ~byte_mask(ef))
        ef = ef | _shr(ef, kb)
    Pv = pv | (ev & ~byte_mask(pf))
    Pf = pf | ef
    v = v | (Pv & ~byte_mask(f))
    f = f | Pf
    v = v | (carry_rep & ~byte_mask(f))
    new_carry = replicate_byte(v[0:1, 0:1])
    return v, new_carry


def end_flags(start, carry_start_bit, rows):
    """Packed END flags from packed START flags: end(p) = start(p+1); the
    block's last flat position takes ``carry_start_bit`` (0/1 scalar int32
    — the first start flag of the block to the right).

    Returns (end, new_carry_start_bit = start at this block's first flat
    position)."""
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, start.shape, 1)
    r = pltpu.roll(start, LANES - 1, 1)       # lane l <- lane l+1
    col0 = start[:, 0:1]
    # next flat row's lane-0 flag, per byte-plane: (b, pr+1); at pr=rows-1
    # it is (b+1, 0) = byte b+1 of col0[0], and plane 3 takes the carry
    fill_word = _shr(col0[0:1, :], 8) | (carry_start_bit << 24)
    n = _shift_rows_l(col0, 1)
    n = jnp.where(jax.lax.broadcasted_iota(jnp.int32, n.shape, 0)
                  == rows - 1, fill_word, n)
    end = jnp.where(lane == LANES - 1, n, r)
    new_carry = col0[0:1, 0:1] & 0xFF
    return end, new_carry
