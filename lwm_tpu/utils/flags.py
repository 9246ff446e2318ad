"""Config/flag system: absl flags with ConfigDict expansion.

Replaces tux.define_flags_with_default (SURVEY.md §5.6): a ConfigDict default
becomes a dot-notation nested CLI flag tree, e.g.
``--optimizer.adamw_optimizer.lr=8e-5``.
"""

from __future__ import annotations

import inspect
import pprint

from absl import flags, logging
from ml_collections import ConfigDict
from ml_collections.config_dict.config_dict import placeholder
from ml_collections.config_flags import config_flags


def define_flags_with_default(**kwargs):
    for key, val in kwargs.items():
        if isinstance(val, tuple) and len(val) == 2 and val[0] == "placeholder":
            # ('placeholder', str) spelling for typed optional flags
            val = placeholder(val[1])
        if isinstance(val, ConfigDict):
            config_flags.DEFINE_config_dict(key, val)
        elif isinstance(val, bool):
            flags.DEFINE_bool(key, val, key)
        elif isinstance(val, int):
            flags.DEFINE_integer(key, val, key)
        elif isinstance(val, float):
            flags.DEFINE_float(key, val, key)
        elif isinstance(val, str):
            flags.DEFINE_string(key, val, key)
        else:
            raise ValueError(f"unsupported flag default for {key}: {val!r}")
    return flags.FLAGS, kwargs


def flatten_config_dict(config, prefix=None):
    output = {}
    for key, val in config.items():
        if isinstance(val, (ConfigDict, dict)):
            output.update(flatten_config_dict(val, prefix=f"{prefix}.{key}" if prefix else key))
        else:
            output[f"{prefix}.{key}" if prefix else key] = val
    return output


def get_user_flags(flags_holder, flags_def):
    output = {}
    for key in flags_def:
        val = getattr(flags_holder, key)
        if isinstance(val, ConfigDict):
            output.update(flatten_config_dict(val, prefix=key))
        else:
            output[key] = val
    return output


def user_flags_to_config_dict(flags_holder, flags_def):
    output = ConfigDict()
    for key in flags_def:
        output[key] = getattr(flags_holder, key)
    return output


def print_flags(flags_holder, flags_def):
    logging.info(
        "Running with flags:\n%s",
        pprint.pformat(get_user_flags(flags_holder, flags_def)),
    )


def function_args_to_config(fn, none_arg_types=None, exclude_args=None, override_args=None):
    """Build a ConfigDict from a callable's keyword defaults
    (replaces tux.function_args_to_config, reference llama.py:192-199)."""
    config = ConfigDict()
    arg_spec = inspect.getfullargspec(fn)
    n_args = len(arg_spec.defaults or ())
    arg_names = arg_spec.args[-n_args:] if n_args else []
    defaults = arg_spec.defaults or ()
    for name, value in zip(arg_names, defaults):
        if exclude_args is not None and name in exclude_args:
            continue
        if value is None and none_arg_types is not None and name in none_arg_types:
            value = placeholder(none_arg_types[name])
        config[name] = value
    if override_args is not None:
        for key, value in override_args.items():
            config[key] = value
    return config
