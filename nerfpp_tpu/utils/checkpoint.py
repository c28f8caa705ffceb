"""Orbax-backed checkpointing of one train-state pytree.

Replaces the reference's six per-module LibTorch archives
(NeRFExecutor.h:1055-1070: embedder/model/lang_embedder/lang_model/start/
optimizer *.pt) with a single versioned pytree {params, opt_state, step};
restore-latest mirrors the reference's automatic resume in Initialize
(h:541-566).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _step_dirs(base: Path):
    """Checkpoint dirs under base, sorted oldest-first by (mtime, step).

    Recency-primary ordering mirrors the reference's resume semantics: its
    saves overwrite fixed filenames (NeRFExecutor.h:1055-1070), so "the last
    thing saved" always wins. A pure highest-step order would let a STALE
    long run shadow a fresh shorter one sharing the base_dir (restore-latest
    would pick the old step_199 over the new step_119). Step number breaks
    mtime ties (saves within one run can land in the same mtime quantum)."""
    if not base.exists():
        return []
    dirs = [(d.stat().st_mtime, int(d.name.split("_")[1]), d)
            for d in base.iterdir()
            if d.is_dir() and d.name.startswith("step_")
            and d.name.split("_")[1].isdigit()]
    return [(step, d) for _, step, d in sorted(dirs)]


def save(base: Path, state: Any, step: int) -> Path:
    """Write state under base/step_<step>."""
    import orbax.checkpoint as ocp
    base = Path(base).resolve()
    base.mkdir(parents=True, exist_ok=True)
    path = base / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_latest(base: Path, like: Any) -> Optional[Any]:
    """Restore the highest-step checkpoint under base, or None."""
    import orbax.checkpoint as ocp
    base = Path(base).resolve()
    dirs = _step_dirs(base)
    if not dirs:
        return None
    _, path = dirs[-1]
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, jax.device_get(like))
    return ckptr.restore(path, target)
