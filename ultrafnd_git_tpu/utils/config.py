"""YAML config loading with the same public surface as the reference.

Parity target: reference `src/utils/config_utils.py:23-86` — a ConfigManager
whose `load_config(path, defaults)` resolves paths relative to the repo root,
caches per absolute path, merges defaults under the file's values, and returns
an empty dict on any failure (missing file, bad YAML, no PyYAML).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

try:
    import yaml

    _HAS_YAML = True
except Exception:  # pragma: no cover - PyYAML is in the base image
    _HAS_YAML = False


def _repo_root() -> Path:
    # this file lives at <root>/ultrafnd_git_tpu/utils/config.py
    return Path(__file__).resolve().parents[2]


def _coerce_dict(value: Any) -> Dict[str, Any]:
    return value if isinstance(value, dict) else {}


# Cache is MODULE-level: every `from_config` call site constructs a fresh
# ConfigManager (the reference's config-path-in-constructor pattern), so a
# per-instance dict would never be reused and every model construction
# would re-read its YAML.
_SHARED_CACHE: Dict[str, Dict[str, Any]] = {}


class ConfigManager:
    """Dependency-tolerant YAML loader with caching and safe fallbacks."""

    def __init__(self) -> None:
        self._cache = _SHARED_CACHE

    def load_config(
        self, path: str, defaults: Optional[Dict[str, Any]] = None
    ) -> Dict[str, Any]:
        p = Path(path)
        if not p.exists():
            alt = _repo_root() / path
            if alt.exists():
                p = alt

        key = str(p.resolve()) if p.exists() else str(Path(path))
        if key not in self._cache:
            cfg: Dict[str, Any] = {}
            if p.is_file() and _HAS_YAML:
                try:
                    with open(p, "r", encoding="utf-8") as fh:
                        cfg = _coerce_dict(yaml.safe_load(fh))
                except Exception:
                    cfg = {}
            self._cache[key] = cfg

        # Always hand out a copy: the cache is shared process-wide, so a
        # caller mutating its returned config must not poison every later
        # load of the same YAML (with `defaults` the merge already built a
        # fresh dict; the no-defaults path previously aliased the cache).
        return self._merge_defaults(dict(self._cache[key]), defaults)

    @staticmethod
    def _merge_defaults(
        cfg: Dict[str, Any], defaults: Optional[Dict[str, Any]]
    ) -> Dict[str, Any]:
        if not defaults:
            return cfg
        merged = dict(defaults)
        merged.update(cfg or {})
        return merged


def load_yaml(path: str, defaults: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """One-shot convenience wrapper around ConfigManager."""
    return ConfigManager().load_config(path, defaults=defaults)
