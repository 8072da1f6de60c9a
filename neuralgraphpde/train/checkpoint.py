"""Checkpoint / resume (SURVEY §5.4): Orbax persistence of
``(params, opt_state, step)`` pytrees. Graphs are data, not checkpointed."""
from __future__ import annotations

import os
from typing import Any, Optional


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(os.path.join(path, f"step_{step}"), payload, force=True)
    ckptr.wait_until_finished()


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(path: str, template: Any,
                       step: Optional[int] = None) -> Any:
    """``template`` is a pytree of the same structure (e.g. freshly-inited
    params/opt_state dict) used for shape/dtype restoration."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f"step_{step}"), template)
