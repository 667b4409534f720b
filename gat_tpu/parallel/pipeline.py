"""GPipe-style pipeline parallelism over the `model` mesh axis.

SURVEY §2.4 planned DP + TP + SP and documented PP as not-required at
this model scale; this module supplies it anyway as a working,
exactness-tested demonstration so the parallel layer covers the full
dp/tp/sp/pp vocabulary. The recipe is the standard TPU one (see the
public "How to Scale Your Model" pipelining chapter): each device owns
one stage's weights, microbatches march through the pipeline, and the
inter-stage hop is a `lax.ppermute` over the `model` axis inside a
`lax.scan` — compiler-friendly control flow, no host round trips, and
reverse-mode AD differentiates straight through (ppermute's transpose
is the inverted permutation), so one `jax.grad` trains the whole
pipeline.

Schedule: with S stages and M microbatches the scan runs M + S - 1
ticks; device d computes its stage every tick (bubble ticks process
garbage that never surfaces: tick t's last-stage output is microbatch
t-(S-1), and only ticks S-1 … M+S-2 are collected). Stage weights are
stacked (S, F, F) and sharded one-stage-per-device by shard_map's
in_specs — the (1, F, F) local block IS the device's stage.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import MODEL

__all__ = ["pipeline_apply", "stage_forward", "init_pipeline_params"]


def stage_forward(w: jax.Array, b: jax.Array, x: jax.Array) -> jax.Array:
    """One pipeline stage: dense + tanh. (B, F) @ (F, F) + (F,) → (B, F).
    Kept deliberately simple — the pipeline plumbing, not the stage
    body, is what this module demonstrates; any jit-able stage works."""
    return jnp.tanh(x @ w + b)


def init_pipeline_params(rng, n_stages: int, feat: int):
    """Stacked stage params: w (S, F, F), b (S, F)."""
    kw, kb = jax.random.split(rng)
    w = jax.random.normal(kw, (n_stages, feat, feat)) / jnp.sqrt(feat)
    b = 0.01 * jax.random.normal(kb, (n_stages, feat))
    return w.astype(jnp.float32), b.astype(jnp.float32)


def pipeline_apply(w: jax.Array, b: jax.Array, xs: jax.Array,
                   mesh: Mesh):
    """Run (M, B, F) microbatches through the S-stage pipeline laid out
    over the mesh's `model` axis; returns (M, B, F) final-stage outputs.

    Differentiable end-to-end: jax.grad of a loss over the result
    produces the same gradients as the sequential composition (tested
    on the virtual CPU mesh). Microbatch inputs are replicated — only
    stage 0 reads them; outputs surface on the last device and are
    broadcast with a psum (every other device contributes zeros).
    """
    n_stages = mesh.shape[MODEL]
    m = xs.shape[0]

    def per_device(wd, bd, xs_rep):
        # wd: (1, F, F) — this device's stage; xs_rep: (M, B, F)
        d = jax.lax.axis_index(MODEL)
        batch, feat = xs_rep.shape[1], xs_rep.shape[2]
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(act, t):
            # stage 0 injects microbatch t; everyone else computes on
            # the activation the previous tick's ppermute delivered
            inject = xs_rep[jnp.minimum(t, m - 1)]
            x_in = jnp.where(d == 0, inject, act)
            y = stage_forward(wd[0], bd[0], x_in)
            out_t = jnp.where(d == n_stages - 1, y, jnp.zeros_like(y))
            act_next = jax.lax.ppermute(y, MODEL, perm)
            return act_next, out_t

        act0 = jax.lax.pvary(jnp.zeros((batch, feat), xs_rep.dtype),
                             (MODEL,))  # carry is device-varying
        _, outs = jax.lax.scan(tick, act0, jnp.arange(m + n_stages - 1))
        outs = outs[n_stages - 1:]          # tick t ↦ microbatch t-(S-1)
        return jax.lax.psum(outs, MODEL)    # broadcast last stage's rows

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P(MODEL), P(MODEL), P()),
                   out_specs=P())
    return fn(w, b, xs)


def sequential_apply(w: jax.Array, b: jax.Array, xs: jax.Array):
    """Reference: the same stage composition with a plain loop — the
    pipeline must match this bit of math exactly (up to fp reorder)."""
    def one(x):
        for s in range(w.shape[0]):
            x = stage_forward(w[s], b[s], x)
        return x
    return jax.vmap(one)(xs)
