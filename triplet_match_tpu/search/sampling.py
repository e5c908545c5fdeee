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


def hash_uniform(key, idx: jax.Array, salt: int = 0) -> jax.Array:
    """Per-element uniform [0,1) priorities from (key, GLOBAL index, salt).

    Shard-invariant by construction: the value depends only on the element's
    global index, not on array shape or device layout — so a scene sharded
    over an ``sp`` mesh axis draws EXACTLY the same samples as a replicated
    one (a shaped ``jax.random.uniform`` draw would not).  Mixing is the
    murmur3 finalizer over the key data, run twice.
    """
    kd = jax.random.key_data(jax.random.fold_in(key, salt)).astype(jnp.uint32)
    kd = kd.reshape(-1)
    x = idx.astype(jnp.uint32) ^ kd[0]

    def fmix(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        return x

    x = fmix(x)
    x = fmix(x ^ kd[-1])
    return x.astype(jnp.float32) * jnp.float32(2.0**-32)


class FirstSamples(NamedTuple):
    idx: jax.Array  # [B1] int32 scene indices
    valid: jax.Array  # [B1] bool


def sample_firsts(key, eligible: jax.Array, b1: int,
                  offset: int | jax.Array = 0) -> FirstSamples:
    """B1 distinct uniform indices from the eligibility mask.

    Priorities are hash_uniform over GLOBAL indices (local index +
    ``offset``), so sharded and replicated runs sample identically; the
    returned indices are local.
    """
    n = eligible.shape[0]
    gidx = jnp.arange(n, dtype=jnp.int32) + offset
    pr = jnp.where(eligible, hash_uniform(key, gidx, salt=1), jnp.inf)
    # scenes smaller than B1 must not crash top_k — take what exists and
    # pad back to the static [B1] shape with invalid slots
    k = min(b1, n)
    _, idx = jax.lax.top_k(-pr, k)
    idx = idx.astype(jnp.int32)
    valid = eligible[idx]
    if k < b1:
        idx = jnp.concatenate([idx, jnp.zeros((b1 - k,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((b1 - k,), bool)])
    return FirstSamples(idx, valid)


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
