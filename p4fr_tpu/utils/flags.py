"""YAML configuration -> attribute-access namespace.

API-compatible rebuild of the reference ``Flags`` system
(``/root/reference/utils/flags.py``): nested dicts become nested
namespaces, and string leaves are coerced to Python values when they parse
(so ``"5e-4"`` -> 5e-4, ``"[1,2]"`` -> list). Unlike the reference we use
``ast.literal_eval`` + numeric parsing instead of bare ``eval`` — same
observable behavior for config-shaped data, no arbitrary code execution.

``Flags(path_or_dict).get()`` returns the namespace; namespaces round-trip
back to plain dicts via ``to_dict`` so checkpoints stay self-describing
(reference embeds the raw config dict in every .pth).
"""

from __future__ import annotations

import ast
import os
from typing import Any, Dict, Union

import yaml


def _coerce(value: str) -> Any:
    """Best-effort parse of a string leaf; returns the string on failure."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        pass
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)  # handles "5e-4"
    except ValueError:
        return value


class ConfigNode:
    """Immutable-ish attribute namespace over a nested dict."""

    def __init__(self, d: Dict[str, Any]):
        object.__setattr__(self, "_raw", {})
        for k, v in d.items():
            if k == "prefix" and isinstance(v, str):
                v = os.path.join("./", v)
            if isinstance(v, dict):
                v = ConfigNode(v)
            elif isinstance(v, str):
                v = _coerce(v)
            self._raw[k] = v

    def __getattr__(self, name: str) -> Any:
        try:
            return self._raw[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self._raw[name] = value

    def __contains__(self, name: str) -> bool:
        return name in self._raw

    def get(self, name: str, default: Any = None) -> Any:
        return self._raw.get(name, default)

    def keys(self):
        return self._raw.keys()

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self._raw.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out

    def __repr__(self) -> str:
        return f"ConfigNode({self._raw!r})"


class Flags:
    """Load a YAML file path or an already-parsed dict (checkpoint configs)."""

    def __init__(self, config: Union[str, Dict[str, Any]]):
        if isinstance(config, str):
            with open(config, "r") as f:
                d = yaml.safe_load(f)
        else:
            d = config
        self.flags = ConfigNode(d)

    def get(self) -> ConfigNode:
        return self.flags
