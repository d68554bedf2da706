"""Config system: ConfigDict-per-component composed into absl flags.

Mirrors the reference's uniform pattern (every component exposes
``get_default_config() -> ConfigDict``; ``define_flags_with_default`` maps
ConfigDicts to ``config_flags.DEFINE_config_dict`` so CLI overrides nest, e.g.
``--model.transfer_type=m3ae_vit_b16``).  Reference: arp_dt/utils.py:208-266.
"""

from __future__ import annotations

import absl.flags
from ml_collections import ConfigDict
from ml_collections.config_flags import config_flags


def update_config(config: ConfigDict, updates) -> ConfigDict:
    """Apply a (possibly None) update dict/ConfigDict to a default config."""
    if updates is not None:
        config.update(ConfigDict(updates).copy_and_resolve_references())
    return config


def define_flags_with_default(**kwargs):
    """Auto-register absl flags from a dict of defaults.

    ConfigDict values become nested config flags; scalars become typed flags.
    Returns the defaults dict (used later by :func:`get_user_flags`).
    Reference semantics: arp_dt/utils.py:208-227.
    """
    for key, val in kwargs.items():
        if isinstance(val, ConfigDict):
            config_flags.DEFINE_config_dict(key, val)
        elif isinstance(val, bool):
            absl.flags.DEFINE_bool(key, val, "automatically defined flag")
        elif isinstance(val, int):
            absl.flags.DEFINE_integer(key, val, "automatically defined flag")
        elif isinstance(val, float):
            absl.flags.DEFINE_float(key, val, "automatically defined flag")
        elif isinstance(val, str):
            absl.flags.DEFINE_string(key, val, "automatically defined flag")
        elif isinstance(val, (list, tuple)) and val and isinstance(val[0], int):
            absl.flags.DEFINE_multi_integer(key, val, "automatically defined flag")
        elif isinstance(val, (list, tuple)) and val and isinstance(val[0], str):
            absl.flags.DEFINE_multi_string(key, val, "automatically defined flag")
        else:
            raise ValueError(f"Incorrect value type for flag {key}: {type(val)}")
    return kwargs


def flatten_config_dict(config, prefix=None):
    """Flatten a nested ConfigDict to dotted keys (for experiment tracking)."""
    output = {}
    for key, val in config.items():
        dotted = f"{prefix}.{key}" if prefix is not None else key
        if isinstance(val, ConfigDict):
            output.update(flatten_config_dict(val, prefix=dotted))
        else:
            output[dotted] = val
    return output


def get_user_flags(flags, flags_def):
    """Collect current values of all auto-defined flags, flattened."""
    output = {}
    for key in flags_def:
        val = getattr(flags, key)
        if isinstance(val, ConfigDict):
            output.update(flatten_config_dict(val, prefix=key))
        else:
            output[key] = val
    return output


def prefix_metrics(metrics, prefix):
    return {f"{prefix}/{key}": value for key, value in metrics.items()}
