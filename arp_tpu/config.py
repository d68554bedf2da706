"""Config system: ConfigDict-per-component composed into absl flags.

Provides the same CLI surface as the reference's uniform pattern (every
component exposes ``get_default_config() -> ConfigDict``; nested configs are
registered so CLI overrides nest, e.g. ``--model.transfer_type=m3ae_vit_b16``).
Behavioral reference: arp_dt/utils.py:208-266.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import absl.flags
from ml_collections import ConfigDict
from ml_collections.config_flags import config_flags


def update_config(config: ConfigDict, updates) -> ConfigDict:
    """Apply a (possibly None) update dict/ConfigDict to a default config."""
    if updates is not None:
        config.update(ConfigDict(updates).copy_and_resolve_references())
    return config


# scalar flag definers, ordered: bool must precede int (bool < int in Python)
_SCALAR_DEFINERS = (
    (bool, absl.flags.DEFINE_bool),
    (int, absl.flags.DEFINE_integer),
    (float, absl.flags.DEFINE_float),
    (str, absl.flags.DEFINE_string),
)
_MULTI_DEFINERS = {
    int: absl.flags.DEFINE_multi_integer,
    float: absl.flags.DEFINE_multi_float,
    str: absl.flags.DEFINE_multi_string,
}


def _flag_definer(value: Any) -> Optional[Callable[[str, Any], None]]:
    """Return a ``definer(name, default)`` callable for this value's type."""
    if isinstance(value, ConfigDict):
        return config_flags.DEFINE_config_dict
    for typ, define in _SCALAR_DEFINERS:
        if isinstance(value, typ):
            return lambda name, default, _d=define, _t=typ: _d(
                name, default, f"auto-registered {_t.__name__} flag"
            )
    if isinstance(value, (list, tuple)) and not value:
        raise ValueError(
            "empty list/tuple default: the element type cannot be inferred — "
            "use a typed non-empty default or a comma-separated string flag"
        )
    if isinstance(value, (list, tuple)) and value:
        define = _MULTI_DEFINERS.get(type(value[0]))
        if define is not None:
            return lambda name, default, _d=define: _d(
                name, list(default), "auto-registered multi flag"
            )
    return None


def define_flags_with_default(**defaults):
    """Auto-register one absl flag per (name, default) pair.

    ConfigDict defaults become nested ``--name.sub=...`` config flags; scalars
    and homogeneous int/str lists become typed flags.  Returns ``defaults``
    unchanged so callers can later pass it to :func:`get_user_flags`.
    """
    for name, default in defaults.items():
        define = _flag_definer(default)
        if define is None:
            raise ValueError(f"no flag type for {name!r}: {type(default)}")
        define(name, default)
    return defaults


def flatten_config_dict(config: ConfigDict, prefix: Optional[str] = None) -> Dict[str, Any]:
    """Flatten nested ConfigDicts into a single dict with dotted keys."""
    flat: Dict[str, Any] = {}
    pending = [(prefix, config)]
    while pending:
        path, node = pending.pop()
        for key, value in node.items():
            dotted = key if path is None else f"{path}.{key}"
            if isinstance(value, ConfigDict):
                pending.append((dotted, value))
            else:
                flat[dotted] = value
    return flat


def get_user_flags(flags, flags_def) -> Dict[str, Any]:
    """Snapshot current values of all auto-registered flags, flattened."""
    snapshot: Dict[str, Any] = {}
    for name in flags_def:
        value = getattr(flags, name)
        if isinstance(value, ConfigDict):
            snapshot.update(flatten_config_dict(value, prefix=name))
        else:
            snapshot[name] = value
    return snapshot


def prefix_metrics(metrics, prefix):
    return {f"{prefix}/{key}": value for key, value in metrics.items()}
