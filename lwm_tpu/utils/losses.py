"""Loss and metric primitives (replaces tux loss/metric helpers,
reference train.py:177-181, 219-222, 376)."""

import jax
import jax.numpy as jnp


def cross_entropy_loss_and_accuracy(logits, tokens, valid=None, chunk_size=None):
    """Masked mean cross-entropy + accuracy.

    logits: [..., seq, vocab] (any float dtype; CE computed in fp32)
    tokens: [..., seq] int targets
    valid:  [..., seq] float mask (1.0 = contributes to loss), or None.
    chunk_size: when set, the sequence is processed in rematted chunks so
      the fp32 logits (and their scatter-add gradient) never materialize at
      full length — required for long-context training (a [64K, 32K-vocab]
      fp32 logits pair alone is ~16GB).
    """
    if valid is None:
        valid = jnp.ones(tokens.shape[:2], dtype=jnp.float32)
    valid = valid.astype(jnp.float32)
    valid_text_length = jnp.maximum(jnp.sum(valid, axis=-1), 1e-10)

    def chunk_stats(logits_c, tokens_c, valid_c):
        logits_c = logits_c.astype(jnp.float32)
        token_log_prob = jnp.squeeze(
            jnp.take_along_axis(
                jax.nn.log_softmax(logits_c, axis=-1),
                jnp.expand_dims(tokens_c, -1),
                axis=-1,
            ),
            -1,
        )
        token_log_prob = jnp.where(valid_c > 0.0, token_log_prob, 0.0)
        correct = jnp.where(
            valid_c > 0.0, jnp.argmax(logits_c, axis=-1) == tokens_c, False
        )
        return jnp.sum(token_log_prob, axis=-1), jnp.sum(correct, axis=-1)

    seq = tokens.shape[1]
    if chunk_size is None or chunk_size >= seq or seq % chunk_size != 0:
        log_prob_sum, correct_sum = chunk_stats(logits, tokens, valid)
    else:
        n = seq // chunk_size
        b = tokens.shape[0]
        logits_c = logits.reshape(b, n, chunk_size, -1).swapaxes(0, 1)
        tokens_c = tokens.reshape(b, n, chunk_size).swapaxes(0, 1)
        valid_c = valid.reshape(b, n, chunk_size).swapaxes(0, 1)

        body = jax.checkpoint(
            chunk_stats, policy=jax.checkpoint_policies.nothing_saveable
        )

        def scan_body(carry, xs):
            lp, cs = carry
            lp_c, c_c = body(*xs)
            return (lp + lp_c, cs + c_c.astype(jnp.float32)), None

        (log_prob_sum, correct_sum), _ = jax.lax.scan(
            scan_body,
            (jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32)),
            (logits_c, tokens_c, valid_c),
        )

    loss = -jnp.mean(log_prob_sum / valid_text_length)
    accuracy = jnp.mean(correct_sum / valid_text_length)
    return loss, accuracy


def global_norm(tree):
    """L2 norm over all leaves of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def average_metrics(metrics):
    """Mean over a list of metric dicts (eval loop aggregation)."""
    return jax.tree_util.tree_map(
        lambda *args: jnp.mean(jnp.stack(args)), *metrics
    )


def fused_lm_cross_entropy(hidden, lm_kernel, tokens, valid=None,
                           chunk_size=2048):
    """Cross-entropy computed straight from final hidden states: the lm_head
    projection runs per rematted sequence chunk, so the [seq, vocab] logits
    tensor NEVER materializes (forward or backward) — the memory wall for
    long-context training. Gradients flow to both hidden and lm_kernel.

    hidden: [b, s, H] (any float dtype); lm_kernel: [H, V];
    tokens/valid: [b, s]. Returns (loss, accuracy) like
    cross_entropy_loss_and_accuracy.
    """
    b, seq, _ = hidden.shape
    if valid is None:
        valid = jnp.ones((b, seq), dtype=jnp.float32)
    valid = valid.astype(jnp.float32)
    valid_text_length = jnp.maximum(jnp.sum(valid, axis=-1), 1e-10)

    def chunk_stats(h_c, lm_kernel, tokens_c, valid_c):
        logits_c = jnp.einsum(
            "bch,hv->bcv", h_c.astype(jnp.float32),
            lm_kernel.astype(jnp.float32),
        )
        token_log_prob = jnp.squeeze(
            jnp.take_along_axis(
                jax.nn.log_softmax(logits_c, axis=-1),
                jnp.expand_dims(tokens_c, -1),
                axis=-1,
            ),
            -1,
        )
        token_log_prob = jnp.where(valid_c > 0.0, token_log_prob, 0.0)
        correct = jnp.where(
            valid_c > 0.0, jnp.argmax(logits_c, axis=-1) == tokens_c, False
        )
        return jnp.sum(token_log_prob, axis=-1), jnp.sum(correct, axis=-1)

    chunk_size = min(chunk_size, seq)
    if seq % chunk_size != 0:
        chunk_size = seq
    n = seq // chunk_size
    hidden_c = hidden.reshape(b, n, chunk_size, -1).swapaxes(0, 1)
    tokens_c = tokens.reshape(b, n, chunk_size).swapaxes(0, 1)
    valid_c = valid.reshape(b, n, chunk_size).swapaxes(0, 1)

    body = jax.checkpoint(
        chunk_stats, policy=jax.checkpoint_policies.nothing_saveable
    )

    def scan_body(carry, xs):
        lp, cs = carry
        h_c, t_c, v_c = xs
        lp_c, c_c = body(h_c, lm_kernel, t_c, v_c)
        return (lp + lp_c, cs + c_c.astype(jnp.float32)), None

    (log_prob_sum, correct_sum), _ = jax.lax.scan(
        scan_body,
        (jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32)),
        (hidden_c, tokens_c, valid_c),
    )
    loss = -jnp.mean(log_prob_sum / valid_text_length)
    accuracy = jnp.mean(correct_sum / valid_text_length)
    return loss, accuracy
