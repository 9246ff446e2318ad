"""Loss and metric primitives (replaces tux loss/metric helpers,
reference train.py:177-181, 219-222, 376)."""

import jax
import jax.numpy as jnp


def cross_entropy_loss_and_accuracy(logits, tokens, valid=None):
    """Masked mean cross-entropy + accuracy.

    logits: [..., seq, vocab] (any float dtype; CE computed in fp32)
    tokens: [..., seq] int targets
    valid:  [..., seq] float mask (1.0 = contributes to loss), or None.
    """
    if valid is None:
        valid = jnp.ones(tokens.shape[:2], dtype=jnp.float32)
    valid = valid.astype(jnp.float32)
    valid_text_length = jnp.maximum(jnp.sum(valid, axis=-1), 1e-10)

    logits = logits.astype(jnp.float32)
    token_log_prob = jnp.squeeze(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1),
            jnp.expand_dims(tokens, -1),
            axis=-1,
        ),
        -1,
    )
    token_log_prob = jnp.where(valid > 0.0, token_log_prob, jnp.array(0.0))
    loss = -jnp.mean(jnp.sum(token_log_prob, axis=-1) / valid_text_length)
    correct = jnp.where(
        valid > 0.0, jnp.argmax(logits, axis=-1) == tokens, jnp.array(False)
    )
    accuracy = jnp.mean(jnp.sum(correct, axis=-1) / valid_text_length)
    return loss, accuracy


def global_norm(tree):
    """L2 norm over all leaves of a pytree."""
    squared = jax.tree_util.tree_map(lambda x: jnp.sum(jnp.square(x)), tree)
    flattened, _ = jax.flatten_util.ravel_pytree(squared)
    return jnp.sqrt(jnp.sum(flattened))


def average_metrics(metrics):
    """Mean over a list of metric dicts (eval loop aggregation)."""
    return jax.tree_util.tree_map(
        lambda *args: jnp.mean(jnp.stack(args)), *metrics
    )
