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

    The reference walks a *shuffled* neighborhood and skips ineligible
    points (impl/scene.hpp:284-290) — i.e. it takes distinct uniform draws
    from the eligible subset.  Gumbel top-B2 over eligible slots is the
    batched equivalent (distinct, uniform over eligible, no wasted draws).
    """
    b1, k = nbr_idx.shape
    eligible = (
        nbr_in_radius
        & second_eligible[nbr_idx]
        & (nbr_idx != firsts.idx[:, None])
        & firsts.valid[:, None]
    )  # [B1, K]
    g = jax.random.gumbel(key, (b1, k))
    scores = jnp.where(eligible, g, -jnp.inf)
    top, slots = jax.lax.top_k(scores, b2)  # [B1, B2]
    idx = jnp.take_along_axis(nbr_idx, slots, axis=1)
    valid = jnp.take_along_axis(eligible, slots, axis=1) & jnp.isfinite(top)
    return SecondSamples(idx, valid)
