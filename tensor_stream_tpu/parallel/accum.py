"""Gradient accumulation: large effective batches without the HBM.

`accumulate_gradients(loss_fn, n_accum)` turns a per-microbatch loss
into a function returning grads (and the mean aux) over an
`[n_accum * mb, ...]` batch, scanning microbatches under `lax.scan`
(one compiled body, activations for only ONE microbatch live at a
time). The standard way to push effective batch past device memory —
composes with dp sharding (each device scans its own shard) and with
pipeline microbatching (accumulate across pp rounds).

    grad_fn = accumulate_gradients(loss_fn, n_accum=4)
    (loss, aux), grads = grad_fn(params, big_batch, labels)
    # == jax.value_and_grad(loss_fn)(params, big_batch, labels)
    #    to reduction-order tolerance, at 1/4 the activation memory.
"""
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def accumulate_gradients(loss_fn: Callable, n_accum: int):
    """loss_fn(params, *batch_args) -> loss  (or (loss, aux)); every
    batch arg must have the same leading axis, divisible by n_accum.
    Returns grad_fn(params, *batch_args) -> ((loss, aux), grads) with
    loss/aux/grads averaged over the n_accum microbatches."""
    if n_accum < 1:
        raise ValueError(f"n_accum must be >= 1, got {n_accum}")

    def split(x):
        b = x.shape[0]
        if b % n_accum:
            raise ValueError(f"batch {b} not divisible by "
                             f"n_accum={n_accum}")
        return x.reshape((n_accum, b // n_accum) + x.shape[1:])

    def wrapped(params, batch_args):
        out = loss_fn(params, *batch_args)
        if isinstance(out, tuple):
            return out
        return out, jnp.zeros(())

    vg = jax.value_and_grad(wrapped, has_aux=True)

    def grad_fn(params, *batch_args):
        micro = jax.tree_util.tree_map(split, batch_args)
        mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
        (l0, a0), g0 = vg(params, mb0)
        if n_accum == 1:
            return (l0, a0), g0

        def body(acc, mb):
            acc_loss, acc_aux, acc_g = acc
            (loss, aux), grads = vg(params, mb)
            acc_g = jax.tree_util.tree_map(jnp.add, acc_g, grads)
            acc_aux = jax.tree_util.tree_map(jnp.add, acc_aux, aux)
            return (acc_loss + loss, acc_aux, acc_g), None

        rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
        (loss, aux, grads), _ = jax.lax.scan(body, (l0, a0, g0), rest)
        inv = 1.0 / n_accum

        def scale(t):
            return jax.tree_util.tree_map(lambda x: x * inv, t)
        return (loss * inv, scale(aux)), scale(grads)

    return grad_fn
