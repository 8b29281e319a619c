"""Sample generators: the reference's sampler plugin family
(mitsuba/src/samplers/{independent,stratified,ldsampler,halton,
hammersley,sobol}.cpp) recast for wavefront rendering.

A Mitsuba sampler is stateful (next1D/next2D advance a per-path cursor).
In the wavefront each lane needs the d-th dimension of the s-th sample
of pixel p as a PURE function value(p, s, d) — so every sampler here is
a counter-based deterministic map, and the integrator assigns a static
dimension index to every decision (camera jitter, per-bounce BSDF /
guiding / NEE / RR draws), mirroring how QMC dimension assignment works
in the reference's samplers.

Deviation from the reference (documented): Mitsuba's halton/sobol
enumerate sample indices globally over the image plane (faure
permutations / matrix scrambles so each pixel owns a subsequence); here
each pixel gets the SAME low-discrepancy sequence decorrelated by an
Owen/Cranley-Patterson scramble keyed on (pixel, dim). The per-pixel
stratification properties match; exact sample values differ (they also
differ between Mitsuba versions).

All returns are float32 in [0, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

KINDS = ("independent", "stratified", "ldsampler", "halton", "hammersley",
         "sobol")

_U32 = jnp.uint32
_INV32 = np.float32(1.0 / 4294967296.0)


def _hash(x, seed):
    """pcg-style integer hash (u32 -> u32)."""
    x = x.astype(_U32) + seed.astype(_U32) * _U32(0x9E3779B9)
    x ^= x >> 16
    x *= _U32(0x21F0AAAD)
    x ^= x >> 15
    x *= _U32(0x735A2D97)
    x ^= x >> 15
    return x


def _to_float(u):
    return (u >> 8).astype(jnp.float32) * np.float32(1.0 / 16777216.0)


def _reverse_bits(v):
    v = ((v << 16) | (v >> 16)).astype(_U32)
    v = ((v & _U32(0x00FF00FF)) << 8) | ((v & _U32(0xFF00FF00)) >> 8)
    v = ((v & _U32(0x0F0F0F0F)) << 4) | ((v & _U32(0xF0F0F0F0)) >> 4)
    v = ((v & _U32(0x33333333)) << 2) | ((v & _U32(0xCCCCCCCC)) >> 2)
    v = ((v & _U32(0x55555555)) << 1) | ((v & _U32(0xAAAAAAAA)) >> 1)
    return v


def _laine_karras(x, seed):
    """Owen-equivalent hash scramble of a bit-reversed index
    (Laine & Karras 2011 / Burley 2020)."""
    x = x.astype(_U32)
    x += seed.astype(_U32)
    x ^= x * _U32(0x6C50B47C)
    x ^= x * _U32(0xB82F1E52)
    x ^= x * _U32(0xC7AFE638)
    x ^= x * _U32(0x8D22F6E6)
    return x


def _owen(v, seed):
    """Owen scramble in base 2: reverse, hash-scramble, reverse."""
    return _reverse_bits(_laine_karras(_reverse_bits(v), seed))


# --- Sobol' direction numbers (first 64 dims, Joe & Kuo style) -------------

def _sobol_directions(n_dims=64):
    """Direction numbers from small primitive polynomials (Joe-Kuo
    new-joe-kuo-6 initialisation for the first dimensions)."""
    # (degree, coef a, m_i initial values) for dims 1.. ; dim 0 = van der Corput
    JK = [
        (1, 0, [1]), (2, 1, [1, 3]), (3, 1, [1, 3, 1]), (3, 2, [1, 1, 1]),
        (4, 1, [1, 1, 3, 3]), (4, 4, [1, 3, 5, 13]), (5, 2, [1, 1, 5, 5, 17]),
        (5, 4, [1, 1, 5, 5, 5]), (5, 7, [1, 1, 7, 11, 19]),
        (5, 11, [1, 1, 5, 1, 1]), (5, 13, [1, 1, 1, 3, 11]),
        (5, 14, [1, 3, 5, 5, 31]), (6, 1, [1, 3, 3, 9, 7, 49]),
        (6, 13, [1, 1, 1, 15, 21, 21]), (6, 16, [1, 3, 1, 13, 27, 49]),
        (6, 19, [1, 1, 1, 15, 7, 5]), (6, 22, [1, 3, 1, 15, 13, 25]),
        (6, 25, [1, 1, 5, 5, 19, 61]), (7, 1, [1, 3, 7, 11, 23, 15, 103]),
        (7, 4, [1, 3, 7, 13, 13, 15, 69]), (7, 7, [1, 1, 3, 13, 7, 35, 63]),
        (7, 8, [1, 3, 5, 9, 1, 25, 53]), (7, 14, [1, 3, 1, 13, 9, 35, 107]),
        (7, 19, [1, 3, 1, 5, 27, 61, 31]), (7, 21, [1, 1, 5, 11, 19, 41, 61]),
        (7, 28, [1, 3, 5, 3, 3, 13, 69]), (7, 31, [1, 1, 7, 13, 1, 19, 1]),
        (7, 32, [1, 3, 7, 5, 13, 19, 59]), (7, 37, [1, 1, 3, 9, 25, 29, 41]),
        (7, 41, [1, 3, 5, 13, 23, 1, 55]), (7, 42, [1, 3, 7, 3, 13, 59, 17]),
        (7, 50, [1, 3, 1, 3, 5, 53, 69]), (7, 55, [1, 1, 5, 5, 23, 33, 13]),
        (7, 56, [1, 1, 7, 7, 1, 61, 123]), (7, 59, [1, 1, 7, 9, 13, 61, 49]),
        (7, 62, [1, 3, 3, 5, 3, 55, 33]), (8, 14, [1, 3, 1, 15, 31, 13, 49, 245]),
        (8, 21, [1, 3, 5, 15, 31, 59, 76, 125]),
        (8, 22, [1, 1, 7, 11, 11, 41, 103, 182]),
        (8, 38, [1, 3, 7, 12, 9, 17, 16, 41]),
        (8, 47, [1, 1, 5, 3, 15, 59, 23, 117]),
        (8, 49, [1, 3, 3, 9, 9, 37, 123, 13]),
        (8, 50, [1, 1, 7, 15, 1, 51, 66, 83]),
        (8, 52, [1, 1, 1, 5, 23, 53, 118, 225]),
        (8, 56, [1, 3, 7, 9, 13, 1, 34, 145]),
        (8, 67, [1, 1, 3, 7, 7, 61, 18, 117]),
        (8, 70, [1, 1, 1, 9, 23, 57, 83, 217]),
        (8, 84, [1, 3, 3, 5, 11, 61, 106, 123]),
        (8, 97, [1, 1, 5, 9, 17, 61, 86, 153]),
        (8, 103, [1, 1, 5, 13, 29, 27, 54, 185]),
        (8, 115, [1, 3, 1, 3, 27, 25, 34, 63]),
        (8, 122, [1, 3, 7, 9, 5, 63, 105, 247]),
        (9, 8, [1, 1, 1, 3, 13, 33, 65, 19, 403]),
        (9, 13, [1, 3, 5, 11, 27, 55, 103, 247, 379]),
        (9, 16, [1, 3, 1, 7, 3, 37, 61, 195, 289]),
        (9, 22, [1, 3, 7, 1, 15, 17, 17, 131, 357]),
        (9, 25, [1, 1, 5, 5, 1, 63, 89, 123, 141]),
        (9, 44, [1, 1, 7, 11, 23, 1, 51, 23, 381]),
        (9, 47, [1, 3, 5, 13, 29, 9, 39, 201, 131]),
        (9, 52, [1, 1, 1, 9, 5, 25, 117, 103, 75]),
        (9, 55, [1, 1, 7, 1, 1, 45, 51, 77, 141]),
        (9, 59, [1, 3, 5, 9, 17, 63, 85, 135, 261]),
        (9, 62, [1, 3, 1, 15, 29, 47, 65, 45, 329]),
    ]
    V = np.zeros((n_dims, 32), np.uint32)
    # dim 0: van der Corput
    for k in range(32):
        V[0, k] = np.uint32(1) << (31 - k)
    for d in range(1, n_dims):
        deg, a, m_init = JK[(d - 1) % len(JK)]
        m = list(m_init)
        for k in range(deg, 32):
            new = m[k - deg] ^ (m[k - deg] << deg)
            for i in range(1, deg):
                if (a >> (deg - 1 - i)) & 1:
                    new ^= m[k - i] << i
            m.append(new)
        for k in range(32):
            V[d, k] = np.uint32(m[k]) << (31 - k)
    return V


_SOBOL_V = None


def _sobol_table():
    global _SOBOL_V
    if _SOBOL_V is None:
        _SOBOL_V = jnp.asarray(_sobol_directions())
    return _SOBOL_V


def _sobol_u32(idx, dim):
    """Sobol' sample (u32) of `idx` for dimension `dim` (traced ok)."""
    tab = _sobol_table()
    v = tab[jnp.asarray(dim, jnp.int32) % tab.shape[0]]  # [32]
    out = jnp.zeros_like(idx, dtype=_U32)
    for k in range(32):
        out = out ^ jnp.where((idx >> k) & 1 == 1, v[k], _U32(0))
    return out


# --- primes for Halton -----------------------------------------------------

def _primes(n):
    ps, c = [], 2
    while len(ps) < n:
        if all(c % p for p in ps):
            ps.append(c)
        c += 1
    return ps


_PRIMES = _primes(256)


def _radical_inverse(idx, base, seed):
    """Scrambled radical inverse in `base` (traced ok): per-digit
    permutation via hashing, the counterpart of Mitsuba's Faure-permuted
    Halton."""
    base = jnp.asarray(base, _U32)
    inv_base = 1.0 / base.astype(jnp.float32)
    x = jnp.zeros(idx.shape, jnp.float32)
    inv = jnp.float32(1.0)
    i = idx.astype(_U32)
    for k in range(24):  # base >= 2: 24 digits cover u32 well past 2^24
        digit = i % base
        # affine digit permutation (base prime -> bijection) keyed on
        # (seed, digit position): d -> a*d + c mod base, a in [1, base)
        h = _hash(seed, _U32(k * 131 + 7))
        a = 1 + (h % (base - 1))
        c = (h >> 16) % base
        perm = (a * digit + c) % base
        inv = inv * inv_base
        x = x + perm.astype(jnp.float32) * inv
        i = i // base
    return x


# --- public API -------------------------------------------------------------

_PRIMES_J = None


def draw(kind, pixel_ids, sample_idx, dim, key, shape):
    """One [*, n] batch of samples.

    kind        static sampler name
    pixel_ids   [L] i32 pixel index (decorrelation key)
    sample_idx  [L] or scalar i32: per-pixel sample counter
    dim         first dimension index (python int or traced scalar);
                shape[-1] consecutive dimensions are drawn
    key         jax PRNG key (used only by the independent sampler)
    """
    global _PRIMES_J
    L = shape[0]
    n = shape[1] if len(shape) > 1 else 1
    if kind == "independent":
        return jax.random.uniform(key, shape)

    pid = jnp.broadcast_to(jnp.asarray(pixel_ids, jnp.int32), (L,)).astype(_U32)
    sidx = jnp.broadcast_to(
        jnp.asarray(sample_idx, jnp.int32), (L,)).astype(_U32)
    dim = jnp.asarray(dim, jnp.int32)
    cols = []
    for j in range(n):
        d = (dim + j).astype(_U32)
        seed = _hash(pid, d * _U32(0x51633E2D) + _U32(0x68BC21EB))
        if kind == "stratified":
            # hashed-independent stand-in beyond the camera dims, like the
            # reference's stratified sampler past its dimension budget
            u = _to_float(_hash(sidx * _U32(0x9E3779B9) + seed, d + 1))
            cols.append(u)
        elif kind == "ldsampler":
            # Owen-scrambled (0,2)-sequence pairs (ldsampler.cpp)
            v0 = _owen(_reverse_bits(sidx), seed)
            v1 = _owen(_sobol_u32(sidx, 1), seed)
            v = jnp.where((d % 2) == 0, v0, v1)
            cols.append(v.astype(jnp.float32) * _INV32)
        elif kind in ("halton", "hammersley"):
            if _PRIMES_J is None:
                _PRIMES_J = jnp.asarray(_PRIMES, jnp.int32)
            base = _PRIMES_J[(dim + j) % len(_PRIMES)]
            u = _radical_inverse(sidx, base, seed)
            if kind == "hammersley":
                # dim 0 uses i/N-style van der Corput (hammersley.cpp)
                u = jnp.where(d == 0,
                              _reverse_bits(sidx).astype(jnp.float32) * _INV32,
                              u)
            cols.append(u)
        elif kind == "sobol":
            v = _owen(_sobol_u32(sidx, d), seed)
            cols.append(v.astype(jnp.float32) * _INV32)
        else:
            raise ValueError(f"unknown sampler kind {kind!r}")
    out = jnp.stack(cols, -1) if len(shape) > 1 else cols[0]
    return jnp.clip(out.reshape(shape), 0.0, 1.0 - 1e-7)
