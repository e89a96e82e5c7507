"""Hyper-parameter / config system.

Capability parity with the reference config system (see
/root/reference/utils/hparams.py:9-147): a YAML or JSON experiment file is
loaded into a nested, attribute-accessible `HParams` tree; dotted-path CLI
overrides (``-p a.b.c=value``) are parsed with :func:`ast.literal_eval`; the
config is snapshotted into the run directory with an overwrite guard. The
shipped reference YAML configs load unmodified.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import shutil
from typing import Any, Dict, Iterator, List, Optional, Tuple

import yaml


class HParams:
    """Nested attribute-style view over a dict (recursively).

    Supports both attribute access (``hp.train.batch_size``) and mapping
    access (``hp["train"]["batch_size"]``), plus ``in``, ``keys``,
    ``values``, ``items``, ``get``, and conversion back to a plain dict.
    """

    def __init__(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            self[k] = v

    # -- mapping interface -------------------------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, dict):
            value = HParams(**value)
        self.__dict__[key] = value

    def __getitem__(self, key: str) -> Any:
        return self.__dict__[key]

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __len__(self) -> int:
        return len(self.__dict__)

    def __iter__(self) -> Iterator[str]:
        return iter(self.__dict__)

    def keys(self):
        return self.__dict__.keys()

    def values(self):
        return self.__dict__.values()

    def items(self):
        return self.__dict__.items()

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self.__dict__:
            self[key] = default
        return self.__dict__[key]

    # -- attribute interface ----------------------------------------------
    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __repr__(self) -> str:
        return f"HParams({self.__dict__!r})"

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, HParams) else v
        return out

    def copy(self) -> "HParams":
        return HParams(**self.to_dict())


def load_config(path: str) -> HParams:
    """Load a YAML (or JSON) config file into an HParams tree."""
    with open(path, "r") as f:
        text = f.read()
    if path.endswith(".json"):
        data = json.loads(text)
    else:
        data = yaml.safe_load(text)
    if data is None:
        data = {}
    return HParams(**data)


def _parse_value(raw: str) -> Any:
    """Parse an override value: python literal when possible, else string."""
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def update_params(hp: HParams, overrides: Optional[List[str]]) -> HParams:
    """Apply dotted-path overrides of the form ``a.b.c=value`` in place.

    Intermediate nodes are created when missing, mirroring the reference's
    permissive behavior (utils/hparams.py:57-82).
    """
    if not overrides:
        return hp
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override must look like key=value, got: {item!r}")
        path, raw = item.split("=", 1)
        keys = path.strip().split(".")
        node = hp
        for key in keys[:-1]:
            if key not in node or not isinstance(node[key], HParams):
                node[key] = HParams()
            node = node[key]
        node[keys[-1]] = _parse_value(raw)
    return hp


def save_config_snapshot(hp: HParams, run_dir: str, force: bool = False) -> str:
    """Snapshot the resolved config into the run dir (overwrite guard).

    Mirrors utils/hparams.py:134-142: refuse to silently clobber an existing
    snapshot unless ``force`` is set.
    """
    os.makedirs(run_dir, exist_ok=True)
    dst = os.path.join(run_dir, "config.yaml")
    if os.path.exists(dst) and not force:
        raise FileExistsError(
            f"{dst} already exists. Pass force=True (-f) to overwrite.")
    with open(dst, "w") as f:
        yaml.safe_dump(hp.to_dict(), f, sort_keys=False)
    return dst


def get_hparams(args: Optional[List[str]] = None,
                base_dir: str = "logs") -> Tuple[HParams, argparse.Namespace]:
    """CLI entry: ``-n NAME -c CONFIG [-p a.b=v ...] [-f]``.

    Returns the resolved HParams (with ``model_dir`` attached) and the parsed
    argparse namespace. Resuming an existing run without ``-c`` loads the
    snapshotted config from the run dir.
    """
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--name", type=str, required=True,
                        help="experiment/run name (run dir is {base}/{name})")
    parser.add_argument("-c", "--config", type=str, default=None,
                        help="path to the YAML/JSON config")
    parser.add_argument("-p", "--params", nargs="*", default=None,
                        help="dotted overrides: a.b.c=value")
    parser.add_argument("-f", "--force", action="store_true",
                        help="overwrite an existing config snapshot")
    parser.add_argument("-b", "--base_dir", type=str, default=base_dir)
    ns = parser.parse_args(args)

    run_dir = os.path.join(ns.base_dir, ns.name)
    snapshot = os.path.join(run_dir, "config.yaml")
    if ns.config is None:
        if not os.path.exists(snapshot):
            raise FileNotFoundError(
                f"No -c given and no snapshot at {snapshot}")
        hp = load_config(snapshot)
    else:
        hp = load_config(ns.config)
        os.makedirs(run_dir, exist_ok=True)
        if os.path.abspath(ns.config) != os.path.abspath(snapshot):
            if os.path.exists(snapshot) and not ns.force:
                raise FileExistsError(
                    f"{snapshot} exists; pass -f to overwrite")
            shutil.copyfile(ns.config, snapshot)
    update_params(hp, ns.params)
    hp.model_dir = run_dir
    return hp, ns
