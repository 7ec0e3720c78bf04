"""Config system: YAML -> attribute-access dict, with defaults and merging.

Plays the role of the reference's yaml+EasyDict loader
(reference: utils/misc.py:23-25) without the easydict dependency. The training
config is embedded into checkpoints and re-read at sampling time, preserving
the reference's contract (reference: scripts/train_diffusion.py:222-228,
scripts/sample_diffusion.py:136-141).
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any, Mapping

import yaml


class Config(dict):
    """Nested dict with attribute access. Immutable-ish by convention."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        src = dict(*args, **kwargs)
        for k, v in src.items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            else:
                return default
        return node

    def to_dict(self) -> dict:
        return _unwrap(self)

    def merged(self, other: Mapping) -> "Config":
        """Deep-merge `other` on top of self, returning a new Config."""
        out = self.to_dict()
        _deep_update(out, _unwrap(other))
        return Config(out)


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Mapping):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


def _deep_update(dst: dict, src: Mapping) -> None:
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = _unwrap(v)


def load_config(path_or_stream) -> Config:
    if isinstance(path_or_stream, (str, os.PathLike)):
        with open(path_or_stream, "r") as f:
            raw = yaml.safe_load(f)
    elif isinstance(path_or_stream, io.IOBase):
        raw = yaml.safe_load(path_or_stream)
    else:
        raw = yaml.safe_load(str(path_or_stream))
    return Config(raw or {})


def dump_config(cfg: Mapping, path: str | None = None) -> str:
    text = yaml.safe_dump(_unwrap(cfg), sort_keys=False)
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
