"""Config system: YAML files + dotted CLI overrides.

Mirrors the capability of the reference config loader
(/root/reference/src/utils/utils.py:17-131): a nested YAML document whose
every (arbitrarily deep) key can be overridden from the command line as
``--parent.child.grandchild=value``.

Differences from the reference (deliberate fixes, see SURVEY.md §7):
* values are parsed safely with ``yaml.safe_load`` / ``ast.literal_eval``
  — never ``eval`` (the reference ``eval``'s ``prototype_shape``,
  model_builder.py:18);
* override depth is unlimited (reference caps at 4 levels);
* unknown override keys raise instead of being silently ignored.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import yaml

__all__ = [
    "load_config",
    "updated_config",
    "parse_value",
    "apply_overrides",
    "flatten_config",
    "dump_config",
    "parse_prototype_shape",
]


def parse_value(raw: str) -> Any:
    """Parse a CLI override string into a python value, safely.

    Handles bools ("true"/"True"), null/none, numbers, YAML lists,
    python tuples like "(40, 256, 1, 1, 1)", and falls back to str.
    """
    s = raw.strip()
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none", "~"):
        return None
    # Tuple literals (YAML doesn't parse those natively).
    if s.startswith("(") and s.endswith(")"):
        try:
            return ast.literal_eval(s)
        except (ValueError, SyntaxError):
            return s
    try:
        val = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    # yaml parses bare words to str, numbers to int/float, lists to list
    return val


def flatten_config(cfg: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested dict into {"a.b.c": value} form."""
    out: Dict[str, Any] = {}
    for k, v in cfg.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_config(v, prefix=key + "."))
        else:
            out[key] = v
    return out


def _set_dotted(cfg: Dict[str, Any], dotted: str, value: Any, strict: bool = True) -> None:
    import logging

    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            if strict:
                raise KeyError(f"Unknown config section {p!r} in override --{dotted}")
            logging.warning(f"override --{dotted} creates NEW config section "
                            f"{p!r} (possible typo?)")
            node[p] = {}
        node = node[p]
    if parts[-1] not in node:
        if strict:
            raise KeyError(f"Unknown config key {parts[-1]!r} in override --{dotted}")
        if len(parts) > 1:  # new top-level flags are normal CLI surface
            logging.warning(f"override --{dotted} sets a key absent from the "
                            f"config file (possible typo?)")
    node[parts[-1]] = value


def apply_overrides(
    cfg: Dict[str, Any], overrides: Iterable[str], strict: bool = True
) -> Dict[str, Any]:
    """Apply a list of ``--a.b.c=value`` / ``a.b.c=value`` strings to cfg."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        item = ov.lstrip("-")
        if "=" not in item:
            raise ValueError(f"Override {ov!r} must have the form --key.subkey=value")
        key, _, raw = item.partition("=")
        _set_dotted(cfg, key.strip(), parse_value(raw), strict=strict)
    return cfg


def parse_prototype_shape(shape: Any) -> Tuple[int, ...]:
    """Parse a prototype_shape config entry (tuple, list, or string form)."""
    if isinstance(shape, (tuple, list)):
        return tuple(int(s) for s in shape)
    if isinstance(shape, str):
        val = ast.literal_eval(shape)
        return tuple(int(s) for s in val)
    raise TypeError(f"Cannot parse prototype_shape from {shape!r}")


def load_config(config_path: str) -> Dict[str, Any]:
    """Load a YAML config file into a nested dict."""
    with open(config_path, "r") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"Config at {config_path} must be a mapping")
    cfg["config_path"] = config_path
    return cfg


def updated_config(
    argv: Optional[Sequence[str]] = None,
    default_config_path: Optional[str] = None,
) -> Dict[str, Any]:
    """CLI-facing config resolution (parity with reference updated_config).

    Recognized top-level flags (everything else must be a dotted override):
      --config_path=...  --run_name=...  --save_dir=...
      --eval_only=bool --eval_data_type=val|test --push_only=bool
      --explain_locally=bool --explain_globally=bool
    """
    import sys

    args = list(argv if argv is not None else sys.argv[1:])
    # First pass: find config_path
    config_path = default_config_path
    rest: List[str] = []
    for a in args:
        item = a.lstrip("-")
        if item.startswith("config_path="):
            config_path = item.partition("=")[2]
        else:
            rest.append(a)
    if config_path is None:
        raise ValueError("--config_path=... is required")
    cfg = load_config(config_path)

    # Top-level flags that may not exist in the YAML yet.
    defaults = {
        "run_name": cfg.get("run_name", os.path.splitext(os.path.basename(config_path))[0]),
        "save_dir": cfg.get("save_dir", "logs"),
        "eval_only": cfg.get("eval_only", False),
        "eval_data_type": cfg.get("eval_data_type", "val"),
        "push_only": cfg.get("push_only", False),
        "explain_locally": cfg.get("explain_locally", False),
        "explain_globally": cfg.get("explain_globally", False),
    }
    for k, v in defaults.items():
        cfg.setdefault(k, v)

    cfg = apply_overrides(cfg, rest, strict=False)
    return cfg


def dump_config(cfg: Dict[str, Any], path: str) -> None:
    # Crash-atomic: serialize first (safe_dump raises mid-stream on
    # non-YAML-safe values), write to a temp file, then rename — a kill
    # or ENOSPC mid-write can never leave a partial config_*.yml for
    # serve.load_trained_agent's glob to consume as the real thing.
    text = yaml.safe_dump(cfg, default_flow_style=False, sort_keys=False)
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{os.path.basename(path)}.tmp.{os.getpid()}")
    try:
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
