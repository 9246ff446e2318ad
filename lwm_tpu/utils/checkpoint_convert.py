"""Checkpoint interop: lwm_tpu flax trees ↔ HF torch LlamaForCausalLM, and
scanned ↔ unscanned layer stacking.

Released LWM text models ship both as jax streaming checkpoints and HF
torch models (reference README.md:74-88, 158-159; scripts/sample_pyt.py).
These converters make both loadable here.

Rotary convention note: this package (like the original LWM) applies RoPE
to adjacent pairs (x0,x1), (x2,x3), ... via complex multiply, while HF's
torch Llama rotates half-split (first half vs second half). The q/k
projection rows must therefore be permuted interleave↔split when crossing
formats — the standard LLaMA conversion permutation.
"""

from __future__ import annotations

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def unscan_params(params, num_layers, scan_axis=0, scan_key="scan_decoder"):
    """Stacked scan params [L, ...] → per-layer dicts {'0': ..., '1': ...}."""
    flat = flatten_dict(params)
    out = {}
    for key, val in flat.items():
        if scan_key in key:
            idx = key.index(scan_key)
            for layer in range(num_layers):
                new_key = key[:idx] + (str(layer),) + key[idx + 1 :]
                out[new_key] = np.take(np.asarray(val), layer, axis=scan_axis)
        else:
            out[key] = np.asarray(val)
    return unflatten_dict(out)


def scan_params(params, num_layers, scan_axis=0, scan_key="scan_decoder"):
    """Per-layer dicts → stacked scan params on `scan_axis`."""
    flat = flatten_dict(params)
    grouped, passthrough = {}, {}
    for key, val in flat.items():
        layer_positions = [i for i, part in enumerate(key) if part.isdigit()]
        if layer_positions:
            i = layer_positions[0]
            layer = int(key[i])
            new_key = key[:i] + (scan_key,) + key[i + 1 :]
            grouped.setdefault(new_key, {})[layer] = np.asarray(val)
        else:
            passthrough[key] = np.asarray(val)
    out = dict(passthrough)
    for key, layers in grouped.items():
        assert len(layers) == num_layers, (key, sorted(layers))
        out[key] = np.stack(
            [layers[i] for i in range(num_layers)], axis=scan_axis
        )
    return unflatten_dict(out)


def _permute_rotary(w, n_heads, dim1, dim2, inverse=False):
    """Permute a [dim1, dim2]-shaped torch q/k weight between HF half-split
    and interleaved-pair rotary layouts. w is torch-layout [out, in]."""
    head = dim1 // n_heads
    if not inverse:
        # interleaved → half-split (flax→torch)
        return (
            w.reshape(n_heads, head // 2, 2, dim2)
            .transpose(0, 2, 1, 3)
            .reshape(dim1, dim2)
        )
    # half-split → interleaved (torch→flax)
    return (
        w.reshape(n_heads, 2, head // 2, dim2)
        .transpose(0, 2, 1, 3)
        .reshape(dim1, dim2)
    )


def flax_to_torch_llama(params, config):
    """lwm_tpu flax param tree (unscanned or scanned) → HF torch
    LlamaForCausalLM state_dict (numpy arrays; wrap with torch.from_numpy).
    """
    if "params" in params:
        params = params["params"]
    flat = flatten_dict(params)
    if any("scan_decoder" in k for k in flat):
        params = unscan_params(
            params, config.num_hidden_layers, scan_axis=config.param_scan_axis
        )
    n_heads = config.num_attention_heads
    n_kv_heads = getattr(config, "num_key_value_heads", None) or n_heads
    hidden = config.hidden_size
    kv_dim = hidden // n_heads * n_kv_heads  # GQA: k/v project to fewer heads

    def t(x):  # flax Dense kernel [in, out] → torch Linear weight [out, in]
        return np.asarray(x).T

    tree = params
    sd = {
        "model.embed_tokens.weight": np.asarray(
            tree["transformer"]["wte"]["embedding"]
        ),
        "model.norm.weight": np.asarray(tree["transformer"]["ln_f"]["kernel"]),
        "lm_head.weight": t(tree["lm_head"]["kernel"]),
    }
    for layer in range(config.num_hidden_layers):
        block = tree["transformer"]["h"][str(layer)]
        prefix = f"model.layers.{layer}."
        sd[prefix + "self_attn.q_proj.weight"] = _permute_rotary(
            t(block["attention"]["wq"]["kernel"]), n_heads, hidden, hidden
        )
        sd[prefix + "self_attn.k_proj.weight"] = _permute_rotary(
            t(block["attention"]["wk"]["kernel"]), n_kv_heads, kv_dim, hidden
        )
        sd[prefix + "self_attn.v_proj.weight"] = t(block["attention"]["wv"]["kernel"])
        sd[prefix + "self_attn.o_proj.weight"] = t(block["attention"]["wo"]["kernel"])
        sd[prefix + "mlp.gate_proj.weight"] = t(block["feed_forward"]["w1"]["kernel"])
        sd[prefix + "mlp.down_proj.weight"] = t(block["feed_forward"]["w2"]["kernel"])
        sd[prefix + "mlp.up_proj.weight"] = t(block["feed_forward"]["w3"]["kernel"])
        sd[prefix + "input_layernorm.weight"] = np.asarray(
            block["attention_norm"]["kernel"]
        )
        sd[prefix + "post_attention_layernorm.weight"] = np.asarray(
            block["ffn_norm"]["kernel"]
        )
    return sd


def torch_llama_to_flax(state_dict, config, scan_layers=None, param_scan_axis=None):
    """HF torch LlamaForCausalLM state_dict → lwm_tpu flax param tree
    (scanned per config unless overridden)."""
    scan_layers = config.scan_layers if scan_layers is None else scan_layers
    param_scan_axis = (
        config.param_scan_axis if param_scan_axis is None else param_scan_axis
    )
    n_heads = config.num_attention_heads
    n_kv_heads = getattr(config, "num_key_value_heads", None) or n_heads
    hidden = config.hidden_size
    kv_dim = hidden // n_heads * n_kv_heads  # GQA: k/v project to fewer heads

    def a(x):
        return np.asarray(x)

    def k(x):  # torch Linear weight [out, in] → flax kernel [in, out]
        return np.asarray(x).T

    tree = {
        "transformer": {
            "wte": {"embedding": a(state_dict["model.embed_tokens.weight"])},
            "ln_f": {"kernel": a(state_dict["model.norm.weight"])},
            "h": {},
        },
        "lm_head": {"kernel": k(state_dict["lm_head.weight"])},
    }
    for layer in range(config.num_hidden_layers):
        prefix = f"model.layers.{layer}."
        tree["transformer"]["h"][str(layer)] = {
            "attention": {
                "wq": {
                    "kernel": _permute_rotary(
                        a(state_dict[prefix + "self_attn.q_proj.weight"]),
                        n_heads, hidden, hidden, inverse=True,
                    ).T
                },
                "wk": {
                    "kernel": _permute_rotary(
                        a(state_dict[prefix + "self_attn.k_proj.weight"]),
                        n_kv_heads, kv_dim, hidden, inverse=True,
                    ).T
                },
                "wv": {"kernel": k(state_dict[prefix + "self_attn.v_proj.weight"])},
                "wo": {"kernel": k(state_dict[prefix + "self_attn.o_proj.weight"])},
            },
            "feed_forward": {
                "w1": {"kernel": k(state_dict[prefix + "mlp.gate_proj.weight"])},
                "w2": {"kernel": k(state_dict[prefix + "mlp.down_proj.weight"])},
                "w3": {"kernel": k(state_dict[prefix + "mlp.up_proj.weight"])},
            },
            "attention_norm": {
                "kernel": a(state_dict[prefix + "input_layernorm.weight"])
            },
            "ffn_norm": {
                "kernel": a(state_dict[prefix + "post_attention_layernorm.weight"])
            },
        }
    if scan_layers:
        tree = scan_params(
            tree, config.num_hidden_layers, scan_axis=param_scan_axis
        )
    return tree
