"""Memoized, offline-safe HuggingFace model loading.

All encoder fallback ladders route their "try the HF model" step through
here so that:
  * a failed load (cold cache / offline) is attempted only ONCE per process
    per model name — repeated encoder construction stays cheap;
  * loads always use local_files_only=True (zero-egress environments fall
    back instantly instead of retrying the network);
  * `ULTRAFND_DISABLE_HF=1` disables the HF rung everywhere (hermetic tests).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

_MEMO: Dict[str, Optional[Any]] = {}


def hf_disabled() -> bool:
    return os.environ.get("ULTRAFND_DISABLE_HF", "0") == "1"


def load_once(key: str, loader: Callable[[], Any]) -> Optional[Any]:
    """Run `loader` once per key; memoize the result or the failure (None)."""
    if hf_disabled():
        return None
    if key not in _MEMO:
        try:
            _MEMO[key] = loader()
        except Exception:
            _MEMO[key] = None
    return _MEMO[key]


def try_build_device_rung(label: str, builder: Callable[[], Any]):
    """Shared build step of the device-rung ladders (BERT/CLIP/W2V2):
    run the builder once, warn-and-None on any failure so the caller's
    host torch forward takes over."""
    try:
        return builder()
    except Exception as exc:  # broken accelerator/tunnel/layout etc.
        print(
            f"⚠️  device {label} rung unavailable ({exc!r}); "
            "using host torch forward"
        )
        return None


def reset_memo() -> None:  # test hook
    _MEMO.clear()
