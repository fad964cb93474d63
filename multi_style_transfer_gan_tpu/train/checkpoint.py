"""Native checkpoint/resume via orbax (SURVEY.md §5.4).

The reference checkpoints periodically and resumes model+optimizer+
scheduler+epoch (pretrain.py:208-216, pretrain_resume.py:134-157). Our
train states are plain pytrees, so orbax handles them whole — including
optimizer moments and spectral-norm buffers, which the .pth export path
(train.cyclegan.save_models / train.pretrain.save_pretrain_checkpoint)
intentionally leaves out for PyTorch-compatibility.

Layout: ``{dir}/step_{N}/`` orbax checkpoints + the torch-compatible .pth
exports next to them; ``latest_step`` finds the resume point.
"""

from __future__ import annotations

import os
import re

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(state, directory, step: int):
    """Save a full train-state pytree (any NamedTuple/dict of arrays)."""
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    os.makedirs(directory, exist_ok=True)
    ckptr = _ckptr()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for d in os.listdir(directory)
             if (m := re.fullmatch(r"step_(\d+)", d))]
    return max(steps) if steps else None


def restore_train_state(directory, step: int | None, template):
    """Restore into the structure of ``template`` (an abstract or concrete
    state pytree of the right shapes/dtypes)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    ckptr = _ckptr()
    restored = ckptr.restore(path, template)
    return restored, step
