"""Checkpoint save/restore (Orbax).

Replicates the reference's per-trainer checkpoint policy (SURVEY.md §5):
payload {step/epoch, params, batch_stats, opt_state, best_val_loss,
config}; `best` + `last` always, periodic `epoch_N` every save_freq
(train_gating_network.py:160-175,323-336); resume modes 'model' (weights
only) vs 'full' (weights + optimizer + schedule position)
(train_bdd100k_ddp.py:536-545). Layout: <root>/<component>/<run_name>/
{best,last,epoch_N}. Writes happen on process 0 only (the rank-0 guard).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, root: str, component: str, run_name: str,
                 save_freq: int = 0, async_save: bool = False,
                 keep: int = 0):
        """async_save: overlap the checkpoint's disk write with training.
        `StandardCheckpointer` is an AsyncCheckpointer — the device→host
        snapshot in `_payload` is taken synchronously either way (no torn
        state), but with async_save the serialization/write continues in
        a background thread while the train loop runs on. Consecutive
        saves serialize (each `_write` waits for the previous one), so
        the win is hiding the LAST write of an epoch behind the next
        epoch's steps. `wait()` (called at the end of Trainer.fit, and
        before any restore) is the completion barrier — reading a
        checkpoint path some OTHER process/tool wrote needs no wait,
        reading one THIS manager wrote mid-run does."""
        self.dir = Path(root) / component / run_name
        self.save_freq = save_freq
        self.async_save = async_save
        # retention for periodic epoch_N checkpoints: keep the newest
        # `keep` (0 = keep all); best/last/step are never GC'd
        self.keep = keep
        self.best_val = float("inf")
        self.last_restore_loaded = False  # set by restore()
        self._ckptr = ocp.StandardCheckpointer()
        if jax.process_index() == 0:
            self.dir.mkdir(parents=True, exist_ok=True)

    def wait(self) -> None:
        """Block until every pending async save has landed on disk."""
        self._ckptr.wait_until_finished()

    # -- save ---------------------------------------------------------------

    def _payload(self, state, epoch: int, config: Optional[Dict]) -> Dict[str, Any]:
        payload = {
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
            "opt_state": _to_host(state.opt_state),
            "best_val_loss": np.asarray(self.best_val, np.float64),
        }
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = _to_host(state.ema_params)
        return payload

    @staticmethod
    def _sync(tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _write(self, name: str, payload: Dict[str, Any], config: Optional[Dict]):
        """EVERY process must call this in multi-host runs: orbax's save
        participates in cross-process barriers (process 0 writes, the rest
        sync) — a rank-0-only call deadlocks process 0 in the barrier."""
        path = (self.dir / name).resolve()
        # serialize against any in-flight async save BEFORE clearing the
        # target (the pending save may be writing this very path)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0 and path.exists():
            import shutil

            shutil.rmtree(path)
        self._sync(f"ckpt-pre-{name}")
        self._ckptr.save(path, payload)
        if not self.async_save:
            self._ckptr.wait_until_finished()
        if config is not None and jax.process_index() == 0:
            (self.dir / "config.json").write_text(json.dumps(config, indent=2))

    def save_epoch(
        self,
        state,
        epoch: int,
        val_loss: float,
        config: Optional[Dict] = None,
    ) -> bool:
        """Save 'last' (+periodic), and 'best' when val improves.
        Returns is_best. Call from EVERY process: the val_loss is globally
        aggregated (identical on all processes, train/loop.py), so the
        is-best decision can't diverge, and orbax's multi-host save
        barriers need all processes to participate (process 0 writes)."""
        is_best = val_loss < self.best_val
        if is_best:
            self.best_val = float(val_loss)
        payload = self._payload(state, epoch, config)
        self._write("last", payload, config)
        if is_best:
            self._write("best", payload, None)
        if self.save_freq and (epoch + 1) % self.save_freq == 0:
            self._write(f"epoch_{epoch + 1}", payload, None)
            if self.keep > 0 and jax.process_index() == 0:
                # GC older periodic checkpoints (the newest write has
                # already serialized against any in-flight save, so only
                # strictly older directories are removed here)
                import shutil

                olds = sorted(
                    (p for p in self.dir.glob("epoch_*") if p.is_dir()),
                    key=lambda p: int(p.name.split("_")[1]),
                )
                for p in olds[:-self.keep]:
                    shutil.rmtree(p)
        # the epoch is complete: any mid-epoch 'step' checkpoint is stale
        # now (restoring it would retrain this epoch's tail and roll back
        # best_val) — drop it; restore(which='step') falls back to 'last'.
        step_dir = (self.dir / "step").resolve()
        if jax.process_index() == 0 and step_dir.exists():
            import shutil

            shutil.rmtree(step_dir)
        return is_best

    def save_step(
        self,
        state,
        epoch: int,
        batch_index: int,
        config: Optional[Dict] = None,
    ) -> None:
        """Mid-epoch 'step' checkpoint: the epoch payload plus the number
        of batches already consumed this epoch, so resume can fast-forward
        the (deterministically reshuffled) loader. The reference resumes
        at epoch granularity only (train_bdd100k_ddp.py:536-545) — this is
        the finer-grained production variant. Call from every process
        (same orbax barrier requirement as save_epoch; all processes save
        at the same consumed-batch boundaries since shards are
        equal-length)."""
        payload = self._payload(state, epoch, config)
        payload["batch_index"] = np.asarray(batch_index)
        self._write("step", payload, config)

    # -- restore ------------------------------------------------------------

    def _disk_has(self, path, key: str) -> bool:
        """Whether the checkpoint's saved tree has a top-level `key`.

        A metadata read that FAILS (orbax API drift, transient FS error)
        is warned about, not swallowed silently: answering False for a
        checkpoint that does contain `key` makes the subsequent
        StandardCheckpointer restore fail with a confusing
        template/disk-tree mismatch — the warning names the real cause."""
        try:
            tree = self._ckptr.metadata(path).item_metadata.tree
            return key in tree
        except Exception as e:  # noqa: BLE001 — diagnosed via warning
            import warnings

            warnings.warn(
                f"checkpoint metadata read failed for {path} ({e!r}); "
                f"assuming no '{key}' in the saved tree — if the restore "
                "below fails with a tree mismatch, this is why",
                stacklevel=2,
            )
            return False

    def restore(
        self, state, which: str = "best", mode: str = "full"
    ):
        """mode='model': params+batch_stats only; 'full': + optimizer/step.
        Returns (state, epoch); for which='step' checkpoints, returns
        (state, epoch, batch_index) so the caller can skip the batches the
        saved epoch already consumed. If no 'step' checkpoint exists (the
        last epoch completed cleanly and superseded it), falls back to
        'last' — so a supervisor can always relaunch with
        --resume-from step regardless of where the crash landed."""
        self._ckptr.wait_until_finished()  # a pending save may be `which`
        path = (self.dir / which).resolve()
        if which == "step" and not path.exists():
            if not (self.dir / "last").exists():
                # crashed before ANY checkpoint landed: a supervisor
                # relaunch with --resume-from step must start fresh, not
                # crash-loop on a missing 'last'. last_restore_loaded lets
                # callers (e.g. the gating CLI's expert-ckpt graft) know
                # nothing was actually restored.
                self.last_restore_loaded = False
                return state, 0, 0
            state, epoch = self.restore(state, which="last", mode=mode)
            return state, epoch + 1, 0
        template = {
            "step": np.asarray(state.step),
            "epoch": np.asarray(0),
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
            "opt_state": _to_host(state.opt_state),
            "best_val_loss": np.asarray(0.0, np.float64),
        }
        # EMA presence may differ between the checkpoint and this run
        # (orbax's StandardCheckpointer requires template ≡ disk tree):
        #   disk has ema, run doesn't  → restore it into a throwaway slot
        #   run wants ema, disk hasn't → seed the EMA at the restored
        #     params (EMA semantics: initialized AT params, train/state.py)
        has_ema = getattr(state, "ema_params", None) is not None
        disk_has_ema = self._disk_has(path, "ema_params")
        if disk_has_ema:
            template["ema_params"] = _to_host(
                state.ema_params if has_ema else state.params
            )
        if which == "step":
            template["batch_index"] = np.asarray(0)
        payload = self._ckptr.restore(path, template)
        self.last_restore_loaded = True
        self.best_val = float(payload["best_val_loss"])
        epoch = int(payload["epoch"])
        ema_kw = {}
        if has_ema:
            ema_kw["ema_params"] = (
                payload["ema_params"] if disk_has_ema else payload["params"]
            )
        if mode == "model":
            state = state.replace(
                params=payload["params"], batch_stats=payload["batch_stats"],
                **ema_kw,
            )
        else:
            state = state.replace(
                step=payload["step"],
                params=payload["params"],
                batch_stats=payload["batch_stats"],
                opt_state=payload["opt_state"],
                **ema_kw,
            )
        if which == "step":
            return state, epoch, int(payload["batch_index"])
        return state, epoch


def load_variables(
    path: str, template: Dict[str, Any], *, prefer_ema: bool = False,
    on_missing: str = "warn",
) -> Dict[str, Any]:
    """Restore only {params, batch_stats} from a checkpoint dir (for eval /
    expert-loading into AutoMoE). The checkpoint also stores
    step/opt_state/epoch/best_val_loss, which this template deliberately
    omits — PyTreeRestore(partial_restore=True) restores the subset.

    partial_restore is directional: checkpoint keys absent from the
    template are skipped ON PURPOSE, but template keys absent from the
    checkpoint are silently left at their template (typically INIT)
    values — a layout mismatch "succeeds" with untrained weights. The
    r5 nuScenes-2D remap bug shipped exactly that way (ckpt/compose.py).
    `on_missing` controls the guard, checked against checkpoint METADATA
    (no tensor loads): "warn" (default) prints the missing paths to
    stderr, "raise" errors, "ignore" for callers whose template is a
    deliberate superset (e.g. compose's expected-partial 2D remap).

    prefer_ema=True loads the EMA weights (checkpoints written by a run
    with --ema-decay) into the 'params' slot — the deploy-side weights.
    Raises KeyError if the checkpoint has no 'ema_params'."""
    key = "ema_params" if prefer_ema else "params"
    host_t = {
        key: _to_host(template["params"]),
        "batch_stats": _to_host(template.get("batch_stats", {})),
    }
    resolved = Path(path).resolve()
    if on_missing != "ignore":
        missing = _template_paths_missing_from_ckpt(resolved, host_t)
        if missing:
            msg = (
                f"load_variables({path}): {len(missing)} template leaves "
                f"have no counterpart in the checkpoint and would keep "
                f"their template (init) values: {missing[:5]}"
                + (" ..." if len(missing) > 5 else "")
            )
            if on_missing == "raise":
                raise KeyError(msg)
            print(f"WARNING: {msg}", file=sys.stderr, flush=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            resolved,
            args=ocp.args.PyTreeRestore(item=host_t, partial_restore=True),
        )
    return {"params": restored[key], "batch_stats": restored["batch_stats"]}


def _leaf_paths(tree, prefix=()):
    """Flatten a nested-dict tree into tuple paths of its non-dict leaves
    (empty dicts contribute nothing, matching orbax's storage)."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_leaf_paths(v, prefix + (str(k),)))
        return out
    return [prefix]


def _template_paths_missing_from_ckpt(path, host_t) -> list:
    """Template leaf paths with no counterpart in the checkpoint's stored
    tree, read from orbax metadata. Returns [] when the metadata is
    unreadable (old/foreign layouts) — the guard then stays silent
    rather than blocking a restore that may be fine."""
    try:
        with ocp.PyTreeCheckpointer() as ckptr:
            md = ckptr.metadata(path)
        tree = getattr(md, "item_metadata", md)
        tree = {k: tree[k] for k in tree.keys()}  # dict-like -> dict
        ckpt_paths = {
            p for top in ("params", "ema_params", "batch_stats")
            if isinstance(tree.get(top), dict)
            for p in _leaf_paths(tree[top], (top,))
        }
        if not ckpt_paths:
            return []
        # batch_stats may be absent from stat-less checkpoints; only
        # template sections the checkpoint stores at all are checked.
        tops_present = {p[0] for p in ckpt_paths}
        return sorted(
            "/".join(p)
            for p in _leaf_paths(host_t)
            if p[0] in tops_present and p not in ckpt_paths
        )
    except Exception:
        return []
