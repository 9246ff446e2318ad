"""Dtype helpers (replaces tux.get_float_dtype_by_name / float_tensor_to_dtype)."""

import jax.numpy as jnp

_FLOAT_DTYPES = {
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp16": jnp.float16,
    "float16": jnp.float16,
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "fp64": jnp.float64,
    "float64": jnp.float64,
}


def get_float_dtype_by_name(name):
    if not isinstance(name, str):
        return name
    return _FLOAT_DTYPES[name]


def float_tensor_to_dtype(tensor, dtype):
    """Cast float tensors (only) to dtype; leave ints/bools untouched."""
    if dtype is None or dtype == "":
        return tensor
    dtype = get_float_dtype_by_name(dtype)
    float_dtypes = (jnp.bfloat16, jnp.float16, jnp.float32, jnp.float64)
    if getattr(tensor, "dtype", None) in float_dtypes:
        tensor = tensor.astype(dtype)
    return tensor
