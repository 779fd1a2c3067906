"""Config system: YAML + CLI merge.

Equivalent of the reference's update_namespace_from_yaml
(utils/general_utils.py:62-69) — flat key-value YAML merged into an
argparse namespace — plus what the reference lacks: individual keys can be
overridden on the command line with --set key=value.
"""
from __future__ import annotations

import argparse
import ast
from typing import Any, Dict

import yaml

__all__ = ["load_yaml_config", "update_namespace_from_yaml", "apply_overrides"]


def load_yaml_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def update_namespace_from_yaml(args: argparse.Namespace, yaml_path: str):
    for key, value in load_yaml_config(yaml_path).items():
        setattr(args, key, value)
    return args


def apply_overrides(args: argparse.Namespace, overrides: list[str]):
    """--set key=value pairs; values parsed as python literals when
    possible, with YAML-style booleans/null accepted ('--set flag=false'
    must NOT become the truthy string \"false\")."""
    _YAML_WORDS = {"true": True, "false": False,
                   "null": None, "none": None}
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        if raw.strip().lower() in _YAML_WORDS:
            val = _YAML_WORDS[raw.strip().lower()]
        else:
            try:
                val = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                val = raw
        setattr(args, key.strip(), val)
    return args
