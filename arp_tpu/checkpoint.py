"""Checkpointing via Orbax.

Replaces the reference's cloudpickle-of-replicated-TrainState
(main_procgen.py:815-829, utils.py:182-190): async-capable, sharded-aware
save/restore of {step, epoch, variant, state} plus best-model tracking.
RNG and data-loader epoch state are saved too — the reference loses them on
resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with the framework's checkpoint layout."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
            item_handlers={
                "state": ocp.StandardCheckpointHandler(),
                "metadata": ocp.JsonCheckpointHandler(),
            },
        )
        self.best_score = -np.inf
        # survive resume: without this, the first post-restart eval would
        # overwrite a genuinely better saved best model
        best_meta_dir = self._best_item_dir("metadata")
        if best_meta_dir is not None:
            try:
                meta = ocp.Checkpointer(ocp.JsonCheckpointHandler()).restore(best_meta_dir)
                self.best_score = float(meta.get("score", -np.inf))
            except Exception:  # unreadable best metadata only costs the score
                pass

    def _best_item_dir(self, item: str) -> Optional[str]:
        """Resolve the current best-model item dir via the atomic CURRENT
        pointer; falls back to the legacy flat layout (pre-r3 checkpoints)."""
        best_dir = os.path.join(self.directory, "best")
        ptr = os.path.join(best_dir, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                vdir = os.path.join(best_dir, f.read().strip(), item)
            return vdir if os.path.isdir(vdir) else None
        legacy = os.path.join(best_dir, item)
        return legacy if os.path.isdir(legacy) else None

    def best_state_dir(self) -> Optional[str]:
        """Directory of the current best model state (for external loaders)."""
        return self._best_item_dir("state")

    def save(self, step: int, state, metadata: Optional[dict] = None, wait: bool = False):
        """Save train state + json-able metadata at `step` (async by default)."""
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            metadata=ocp.args.JsonSave(metadata or {}),
        )
        self._mngr.save(step, args=args)
        if wait:
            self._mngr.wait_until_finished()

    def save_best(self, step: int, state, score: float, metadata: Optional[dict] = None):
        """Track the best eval score; saves under a 'best' subdir when improved.

        Crash-consistent: state+metadata land in a fresh version dir and only
        become "the best" when the CURRENT pointer file is atomically
        replaced — a crash mid-save can never pair a new state with a stale
        score (or vice versa).
        """
        if score <= self.best_score:
            return False
        self.best_score = score
        best_dir = os.path.join(self.directory, "best")
        vname = f"v{step}"
        vdir = os.path.join(best_dir, vname)
        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        ckptr.save(os.path.join(vdir, "state"), state, force=True)
        meta = dict(metadata or {}, step=step, score=float(score))
        ocp.Checkpointer(ocp.JsonCheckpointHandler()).save(
            os.path.join(vdir, "metadata"), meta, force=True
        )
        ptr_tmp = os.path.join(best_dir, f".CURRENT.tmp.{os.getpid()}")
        with open(ptr_tmp, "w") as f:
            f.write(vname)
        os.replace(ptr_tmp, os.path.join(best_dir, "CURRENT"))
        # prune superseded versions (and the legacy flat layout), best-effort
        import shutil

        for d in os.listdir(best_dir):
            if (d.startswith("v") and d != vname) or d in ("state", "metadata"):
                shutil.rmtree(os.path.join(best_dir, d), ignore_errors=True)
        return True

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore (state, metadata); state_template provides structure/sharding."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["metadata"]

    def restore_params(self, step: Optional[int] = None):
        """Restore only the params subtree — no optimizer template needed.

        For consumers like the inference server that do not know (or care)
        which optax chain trained the checkpoint.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        state = restored["state"]
        params = state["params"] if isinstance(state, dict) and "params" in state else state
        return params, restored["metadata"]

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()


def save_pickle(obj: Any, path: str) -> None:
    """Legacy-compatible pickle save (reference checkpoints are cloudpickle)."""
    import cloudpickle

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        cloudpickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    import cloudpickle

    with open(path, "rb") as f:
        return cloudpickle.load(f)


def load_reference_checkpoint(path: str):
    """Load a reference-format pickle checkpoint ({step, epoch, variant, state}).

    Reference policy param trees (auto-named: policy/Block_i/..., single
    deduped ensemble head) are converted to the arp_tpu tree automatically.
    """
    data = load_pickle(path)
    state = data.get("state") if isinstance(data, dict) else None
    params = getattr(state, "params", None) if state is not None else None
    if params is not None and _looks_like_reference_policy(params):
        from .models.policy.convert import convert_reference_policy_params

        converted = convert_reference_policy_params(params)
        import flax

        data["state"] = state.replace(params=flax.core.unfreeze(converted)["params"])
    return data


def save_reference_checkpoint(
    path: str,
    params,
    *,
    step: int = 0,
    epoch: int = 0,
    variant: Optional[dict] = None,
    ensemble_mode: str = "require_tied",
    learning_rate: float = 5e-4,
    weight_decay: float = 5e-5,
    clip_gradient: float = 10.0,
) -> None:
    """Export arp_tpu policy params as a reference-format pickle checkpoint.

    Writes the exact ``{"step", "epoch", "variant", "state": TrainState}``
    schema the reference saves (main_procgen.py:815-829) and its eval driver
    consumes via ``checkpoint_data["state"].params``
    (local_run_procgen.py:285-308), with the param tree renamed to the
    reference's auto-generated module names (see
    models/policy/convert.export_reference_policy_params, incl. the
    ``ensemble_mode`` collapse of diverged ensemble heads).

    The TrainState carries a fresh optax chain matching the reference's
    defaults (clip_by_global_norm + adamw, main_procgen.py:498-507) with
    freshly initialized optimizer state: evaluation is exact; resuming
    *training* from an export restarts optimizer momentum (documented
    limitation — our orbax states and the reference's pickles do not share
    an optimizer wire format).
    """
    import flax
    import optax
    from flax.training.train_state import TrainState

    from .models.policy.convert import export_reference_policy_params

    exported = export_reference_policy_params(params, ensemble_mode=ensemble_mode)
    exported = flax.core.unfreeze(exported)
    tx = optax.chain(
        optax.clip_by_global_norm(clip_gradient),
        optax.adamw(learning_rate=learning_rate, weight_decay=weight_decay, b1=0.9, b2=0.999),
    )
    state = TrainState.create(apply_fn=None, params=exported, tx=tx)
    save_pickle(
        {"step": int(step), "epoch": int(epoch), "variant": dict(variant or {}), "state": state},
        path,
    )


def _looks_like_reference_policy(params) -> bool:
    try:
        keys = set(params.keys())
    except AttributeError:
        return False
    return "action_outputs_0" in keys or (
        "policy" in keys and any(k.startswith("Block_") for k in params["policy"].keys())
    )
