"""Batched RANSAC pair sampling.

Replaces the reference's sequential sampling protocol
(/root/reference/include/impl/scene.hpp:131-166, 266-297): the outer loop
(sample first points from unconsumed edge points) and inner loop (shuffled
radius-neighborhood second points, gated) become one batched draw per round:

* firsts: B1 distinct indices via Gumbel top-k over the eligibility mask —
  the `vw::sample(left, outer_bound)` analog.
* seconds: B2 draws per first from the first's k-NN neighborhood (the
  radius-search pool, impl/scene.hpp:273,284-288), gated by the same
  edge/consumed/distance-band/parallel rules.

Deterministic under a jax PRNG key (the reference seeds from the clock by
default — impl/scene.hpp:122-128 — which we deliberately fix, SURVEY §7.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FirstSamples(NamedTuple):
    idx: jax.Array  # [B1] int32 scene indices
    valid: jax.Array  # [B1] bool


def sample_firsts(key, eligible: jax.Array, b1: int) -> FirstSamples:
    """B1 distinct indices from the eligibility mask (Gumbel top-k)."""
    n = eligible.shape[0]
    g = jax.random.gumbel(key, (n,))
    scores = jnp.where(eligible, g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, b1)
    return FirstSamples(idx.astype(jnp.int32), eligible[idx])


class SecondSamples(NamedTuple):
    idx: jax.Array  # [B1, B2] int32 scene indices
    valid: jax.Array  # [B1, B2] bool


def sample_seconds(
    key,
    firsts: FirstSamples,
    nbr_idx: jax.Array,
    nbr_in_radius: jax.Array,
    second_eligible: jax.Array,
    b2: int,
) -> SecondSamples:
    """B2 second points per first, drawn uniformly from its neighborhood.

    nbr_idx/nbr_in_radius: [B1, K] neighborhood of each first point.
    second_eligible: [N] bool (edge & unconsumed & valid).
    Draws are with replacement; invalid draws are masked, mirroring the
    reference's skip-and-continue gates (impl/scene.hpp:290).
    """
    b1, k = nbr_idx.shape
    slots = jax.random.randint(key, (b1, b2), 0, k)
    idx = jnp.take_along_axis(nbr_idx, slots, axis=1)
    in_r = jnp.take_along_axis(nbr_in_radius, slots, axis=1)
    valid = (
        firsts.valid[:, None]
        & in_r
        & second_eligible[idx]
        & (idx != firsts.idx[:, None])
    )
    return SecondSamples(idx, valid)
