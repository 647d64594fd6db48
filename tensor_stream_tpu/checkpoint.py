"""Sharded training checkpoint/resume (orbax) joined to the loader cursors.

The stream side of checkpoint/resume is native (`FrameLoader.checkpoint()`
/ `ClipLoader.state()` resume bit-exactly; the reference's Parser::Reset
was unimplemented, so it had nothing comparable). This module adds the
model side the TPU way: `orbax` writes each device's shards of the
sharded train state (params + optimizer) in parallel, and restore can
RE-SHARD — a checkpoint saved on one mesh layout restores onto another
(or onto a single device) by passing a template with the target
shardings, which is how real fleets survive topology changes.

    ckpt = TrainCheckpointer("/ckpts", max_to_keep=3)
    ckpt.save(step, {"params": params, "opt": opt_state},
              loader_state=loader.state())
    ...
    step, state, loader_state = ckpt.restore(template={"params": ...})
    loader = ClipLoader(loader_state["stream_url"], ...,
                        epoch=loader_state["epoch"],
                        start_clip=loader_state["start_clip"])

The loader state is a small JSON dict stored alongside the tensor
state, so one checkpoint directory resumes BOTH the model and the exact
position in the (shuffled) video corpus.
"""
import os
from typing import Any, Optional, Tuple

import jax


class TrainCheckpointer:
    """Step-managed checkpoints of (sharded) train state + loader cursor.

    Thin, opinionated wrapper over orbax's CheckpointManager: tensor
    state via StandardSave (per-shard parallel IO, zarr), loader cursor
    via JsonSave. `max_to_keep` prunes old steps.
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               enable_async_checkpointing=False)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory), options=options)

    def save(self, step: int, state: Any, loader_state: Optional[dict] = None,
             force: bool = False) -> bool:
        """Writes `state` (any pytree of jax.Arrays, sharded or not) and
        an optional JSON-serializable loader cursor at `step`."""
        ocp = self._ocp
        if step in self._mgr.all_steps():
            return False  # idempotent: that step is already on disk
        items = {"state": ocp.args.StandardSave(state)}
        if loader_state is not None:
            items["loader"] = ocp.args.JsonSave(loader_state)
        ok = self._mgr.save(step, args=ocp.args.Composite(**items),
                            force=force)
        self._mgr.wait_until_finished()
        return ok

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Tuple[int, Any, Optional[dict]]:
        """(step, state, loader_state or None).

        `template` drives placement: a pytree matching the saved state
        whose leaves are jax.Arrays or jax.ShapeDtypeStructs carrying the
        TARGET shardings — restore reshards to them, so a checkpoint
        written on one mesh restores onto another. With template=None the
        state comes back on the default device (fine for single-chip)."""
        ocp = self._ocp
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoint steps found")
        abstract = None
        if template is not None:
            abstract = jax.tree_util.tree_map(
                _to_abstract, template)
        saved = set(self._mgr.item_metadata(step) or ())
        items = {"state": ocp.args.StandardRestore(abstract)}
        if "loader" in saved:
            items["loader"] = ocp.args.JsonRestore()
        out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        return step, out["state"], (out.get("loader")
                                    if "loader" in saved else None)

    def close(self):
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _to_abstract(x):
    """jax.Array / ShapeDtypeStruct -> ShapeDtypeStruct with sharding."""
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                sharding=getattr(x, "sharding", None))
