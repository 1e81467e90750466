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


def patience_counts(logit_store: jax.Array) -> jax.Array:
    """PABEE patience criterion over a per-exit logit store.

    The reference names this criterion with a PABEE citation but raises
    NotImplementedError (EE/models/EE_modules.py:116-146).  Implemented here
    per the paper (Zhou et al. 2020, arXiv:2006.04152): a counter of
    consecutive exits whose top-1 prediction is unchanged; a sample exits
    when the counter reaches the patience threshold ``t`` (sign is ``>=``).

    Unlike ``entropy``/``max_confidence`` this criterion is *stateful across
    exits*, so it takes the whole ``(E, B, K)`` prediction-logit store along
    axis 0 and returns ``(E, B)`` counts: ``counts[0] = 0``;
    ``counts[j] = counts[j-1] + 1`` if ``argmax`` at exit j equals exit j-1,
    else 0.
    """
    preds = jnp.argmax(logit_store.astype(jnp.float32), axis=-1)  # (E, B)
    same = preds[1:] == preds[:-1]
    c0 = jnp.zeros(preds.shape[1:], jnp.float32)

    def body(c, s):
        c = jnp.where(s, c + 1.0, 0.0)
        return c, c

    _, counts = jax.lax.scan(body, c0, same)
    return jnp.concatenate([c0[None], counts], axis=0)
