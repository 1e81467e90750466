"""Exit-criterion functions on raw logits, as jnp ops.

Semantics match the reference (EE/models/EE_modules.py:149-165) but are
implemented in a numerically stable shifted form so they are safe under
bfloat16/float32 on TPU.  The reference's entropy

    H(x) = log(sum exp(x)) - sum(x * exp(x)) / sum(exp(x))

is the Shannon entropy of softmax(x); shifting x by max(x) leaves it
invariant and avoids overflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def entropy(x: jax.Array) -> jax.Array:
    """Predictive entropy of softmax(x) along the last axis. Lower ⇒ exit."""
    x = x.astype(jnp.float32)
    x = x - jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    exp_x = jnp.exp(x)
    a = jnp.sum(exp_x, axis=-1)
    b = jnp.sum(x * exp_x, axis=-1)
    return jnp.log(a) - b / a


def max_confidence(x: jax.Array) -> jax.Array:
    """Maximum softmax probability along the last axis. Higher ⇒ exit."""
    x = x.astype(jnp.float32)
    return jnp.max(jax.nn.softmax(x, axis=-1), axis=-1)


def lte(x: jax.Array) -> jax.Array:
    """Learning-to-exit: the LTE head's sigmoid output *is* the criterion.

    The reference leaves this unimplemented (EE_modules.py:163-165); here the
    identity is the correct behavior because the EE model computes the LTE
    score separately and threads it through as the criterion value.
    """
    return x
