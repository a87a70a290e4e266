"""Per-lane stateless samplers (counter-based RNG + low-discrepancy).

TPU-native counterpart of mitsuba3 src/render/sampler.cpp +
src/samplers/{independent,stratified,multijitter,ldsampler}.cpp
(SURVEY.md §2.3 "Sampler framework", §2.4 "Samplers").

Design (TPU-first, replay-exact): the reference seeds one PCG32 per lane and
draws a *sequence*; here every random number is a pure hash of
(seed, lane_id, dimension_index) — no mutable RNG state crosses the bounce
loop, so path-replay backprop (SURVEY.md §3.2) reproduces the primal
sampling decisions bit-exactly by construction (SURVEY.md §7.3 item 3).

The dimension index splits into a *traced* base (set per bounce inside
lax.scan via `with_dim(base)` — e.g. base = CAMERA_DIMS + bounce * STRIDE)
plus a *static* Python offset advanced by next_1d/next_2d call sites. The
static part keeps call-site structure identical between primal and replay
traces; the traced part lets one scan body serve every bounce. Bases must
be even so the Sobol pair-parity stays static.
"""

from __future__ import annotations

import jax.numpy as jnp

from mitsuba_customization_tpu.core.qmc import (
    hash_combine,
    hash_u32,
    sobol_owen_2d,
)

_U32 = jnp.uint32


def _uniform_from_bits(bits):
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


class Sampler:
    """Base: deterministic per-(lane, dim) sample streams.

    lane: uint32 array of lane ids (pixel*spp flattened); seed: uint32
    scalar (render seed); base_dim: traced uint32 dimension base (even);
    dim: static Python offset within the base.
    """

    def __init__(self, seed, lane, dim=0, base_dim=0):
        self.seed = jnp.asarray(seed, dtype=_U32)
        self.lane = jnp.asarray(lane, dtype=_U32)
        self.base_dim = jnp.asarray(base_dim, dtype=_U32)
        self.dim = dim

    def clone(self):
        return type(self)(self.seed, self.lane, self.dim, self.base_dim)

    def with_dim(self, base_dim):
        """Sampler repositioned at a (possibly traced) dimension base."""
        return type(self)(self.seed, self.lane, 0, base_dim)

    def _dim_value(self, offset):
        return self.base_dim + _U32(offset)

    def next_1d(self):
        u = self._draw(self.dim)
        self.dim += 1
        return u

    def next_2d(self):
        u = jnp.stack([self._draw(self.dim), self._draw(self.dim + 1)], axis=-1)
        self.dim += 2
        return u

    def _draw(self, dim):  # pragma: no cover - abstract
        raise NotImplementedError


class IndependentSampler(Sampler):
    """Counter-based uniform sampler — the reference's `independent` plugin.

    PCG32-per-lane in the reference becomes a stateless avalanche hash of
    (seed, lane, dim): identical statistical contract (independent uniforms),
    zero carried state.
    """

    def _draw(self, dim):
        bits = hash_combine(
            hash_combine(self.seed, self.lane), self._dim_value(dim)
        )
        return _uniform_from_bits(bits)


class SobolSampler(Sampler):
    """Owen-scrambled Sobol (0,2)-sequence sampler — replaces `ldsampler`.

    The lane id is split as lane = pixel * spp + sample_index by
    `from_pixel`; consecutive 2-D dimension pairs use independently
    scrambled copies of the (0,2)-sequence (the standard "padded Sobol"
    construction). Requires even dimension bases (see module docstring).
    """

    def __init__(self, seed, lane, dim=0, base_dim=0, pixel=None,
                 sample_index=None):
        super().__init__(seed, lane, dim, base_dim)
        self.pixel = lane if pixel is None else jnp.asarray(pixel, dtype=_U32)
        self.sample_index = (
            jnp.zeros_like(self.lane)
            if sample_index is None
            else jnp.asarray(sample_index, dtype=_U32)
        )

    @staticmethod
    def from_pixel(seed, pixel, sample_index, spp):
        lane = pixel.astype(_U32) * _U32(spp) + sample_index.astype(_U32)
        return SobolSampler(seed, lane, 0, 0, pixel=pixel,
                            sample_index=sample_index)

    def clone(self):
        return SobolSampler(
            self.seed, self.lane, self.dim, self.base_dim, self.pixel,
            self.sample_index,
        )

    def with_dim(self, base_dim):
        return SobolSampler(
            self.seed, self.lane, 0, base_dim, self.pixel, self.sample_index
        )

    def _pair(self, pair_offset):
        pair_dim = (self.base_dim >> 1) + _U32(pair_offset)
        scramble = hash_combine(
            hash_combine(self.seed, self.pixel), pair_dim
        )
        return sobol_owen_2d(self.sample_index, scramble)

    def _draw(self, dim):
        pair = self._pair(dim // 2)
        return pair[..., dim % 2]

    def next_2d(self):
        if self.dim % 2 == 0:
            pair = self._pair(self.dim // 2)
            self.dim += 2
            return pair
        return super().next_2d()


class StratifiedSampler(Sampler):
    """Jittered-stratified sampler — the reference's `stratified` plugin.

    Stratifies each dimension over the spp index with a per-(pixel, dim)
    cyclic permutation (a true bijection: every stratum hit exactly once),
    jittered by the hash stream.
    """

    def __init__(self, seed, lane, dim=0, base_dim=0, sample_index=None,
                 spp=1):
        super().__init__(seed, lane, dim, base_dim)
        self.spp = int(spp)
        self.sample_index = (
            jnp.zeros_like(self.lane)
            if sample_index is None
            else jnp.asarray(sample_index, dtype=_U32)
        )

    @staticmethod
    def from_pixel(seed, pixel, sample_index, spp):
        lane = pixel.astype(_U32) * _U32(spp) + sample_index.astype(_U32)
        return StratifiedSampler(
            seed, lane, 0, 0, sample_index=sample_index, spp=spp
        )

    def clone(self):
        return StratifiedSampler(
            self.seed, self.lane, self.dim, self.base_dim,
            self.sample_index, self.spp,
        )

    def with_dim(self, base_dim):
        return StratifiedSampler(
            self.seed, self.lane, 0, base_dim, self.sample_index, self.spp
        )

    def _draw(self, dim):
        d = self._dim_value(dim)
        jitter_bits = hash_combine(hash_combine(self.seed, self.lane), d)
        jitter = _uniform_from_bits(jitter_bits)
        pixel = self.lane // _U32(self.spp)
        offset = hash_combine(
            hash_combine(self.seed ^ _U32(0xA511E9B3), pixel), d
        )
        stratum = ((self.sample_index + offset) % _U32(self.spp)).astype(
            jnp.float32
        )
        return (stratum + jitter) / jnp.float32(self.spp)


SAMPLERS = {
    "independent": IndependentSampler,
    "stratified": StratifiedSampler,
    "sobol": SobolSampler,
    "ldsampler": SobolSampler,  # reference name for its low-discrepancy sampler
    "multijitter": StratifiedSampler,  # capability-equivalent stratification
    "orthogonal": StratifiedSampler,
}


def make_sampler(name, seed, pixel, sample_index, spp):
    """Instantiate a sampler by reference plugin name (SURVEY.md §2.4)."""
    cls = SAMPLERS[name]
    if cls is IndependentSampler:
        lane = pixel.astype(_U32) * _U32(spp) + sample_index.astype(_U32)
        return IndependentSampler(seed, lane)
    return cls.from_pixel(seed, pixel, sample_index, spp)
