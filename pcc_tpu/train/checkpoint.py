"""Checkpoint save/resume with the reference's naming schemes.

The reference dumps step-suffixed pickles every step_window steps and
resumes from the highest step found (train.py:70-108), but its compress CLI
loads un-suffixed `ae.pkl`/`prob.pkl` (compress.py:58-59) — a mismatch that
forces a manual rename. We keep the step-suffixed scheme for resume AND
export the un-suffixed inference names on every dump, fixing the mismatch
(SURVEY.md §7 known-defects list).
"""

from __future__ import annotations

import os
import pickle
import re

import jax
import numpy as np


def _to_numpy(tree):
    # start all device->host copies before materializing any: fetching leaf
    # by leaf pays a full round trip per array on remote-attached devices
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree.map(np.asarray, tree)


def _dump(obj, path):
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(obj) if not isinstance(obj, int) else obj, f)


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _model_vars(state, name: str):
    """Full flax variable dict for one model. IPDAE states hold init-style
    {'params': ...} dicts directly; BN-carrying states (PPPF/PPPE) keep
    trainable params and batch_stats in separate fields."""
    v = state.params[name]
    stats = getattr(state, "batch_stats", None)
    if stats is not None:
        return {"params": v, "batch_stats": stats[name]}
    return v


def save_checkpoint(folder: str, state, global_step: int | str = ""):
    """Step-suffixed dump (train.py:104-108) + inference-name export."""
    os.makedirs(folder, exist_ok=True)
    _dump(_model_vars(state, "ae"), os.path.join(folder, f"ae_step{global_step}.pkl"))
    _dump(_model_vars(state, "prob"), os.path.join(folder, f"prob_step{global_step}.pkl"))
    _dump(state.opt_state, os.path.join(folder, f"optimizer_step{global_step}.pkl"))
    _dump(int(state.step), os.path.join(folder, f"global_step{global_step}.pkl"))
    export_inference_params(folder, state)


def export_inference_params(folder: str, state):
    """Write the un-suffixed names compress/decompress load
    (compress.py:58-59)."""
    os.makedirs(folder, exist_ok=True)
    _dump(_model_vars(state, "ae"), os.path.join(folder, "ae.pkl"))
    _dump(_model_vars(state, "prob"), os.path.join(folder, "prob.pkl"))


def find_latest_checkpoint(folder: str, prefix: str) -> str | None:
    """Highest-step `{prefix}_step{N}.pkl` in folder (train.py:71-80)."""
    if not os.path.isdir(folder):
        return None
    best, best_step = None, -1
    pat = re.compile(rf"^{re.escape(prefix)}_step(\d+)\.pkl$")
    for f in os.listdir(folder):
        m = pat.match(f)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(folder, f)
    return best


def load_latest_checkpoint(folder: str, state):
    """Resume params/optimizer/step from the latest dump; returns
    (state, start_step). Missing files are skipped (train.py:83-101)."""
    start_step = 0
    ae_p = find_latest_checkpoint(folder, "ae")
    prob_p = find_latest_checkpoint(folder, "prob")
    opt_p = find_latest_checkpoint(folder, "optimizer")
    step_p = find_latest_checkpoint(folder, "global")
    params = dict(state.params)
    has_stats = getattr(state, "batch_stats", None) is not None
    stats = dict(state.batch_stats) if has_stats else None
    for name, path in (("ae", ae_p), ("prob", prob_p)):
        if not path:
            continue
        loaded = _load(path)
        if has_stats and isinstance(loaded, dict) and "batch_stats" in loaded:
            params[name] = loaded["params"]
            stats[name] = loaded["batch_stats"]
        else:
            params[name] = loaded
    state = state.replace(params=params)
    if has_stats:
        state = state.replace(batch_stats=stats)
    if opt_p:
        state = state.replace(opt_state=_load(opt_p))
    if step_p:
        start_step = int(_load(step_p)) + 1
        state = state.replace(step=start_step)
    return state, start_step


def save_pppe_checkpoint(folder: str, state, global_step: int, best: bool = False):
    """PPPE fixed-name scheme: {ae,prob,optimizer,global}_{latest,best}.pkl
    (train_pppe_pcd_ae.py:84-89). The prob model is a submodule of the AE
    (train_pppe:47), so its pickle stores the same variables for API parity."""
    os.makedirs(folder, exist_ok=True)
    suffix = "best" if best else "latest"
    ae_vars = _model_vars(state, "ae")
    _dump(ae_vars, os.path.join(folder, f"ae_{suffix}.pkl"))
    _dump(ae_vars, os.path.join(folder, f"prob_{suffix}.pkl"))
    _dump(state.opt_state, os.path.join(folder, f"optimizer_{suffix}.pkl"))
    _dump(int(global_step), os.path.join(folder, f"global_{suffix}.pkl"))


def load_pppe_checkpoint(folder: str, state, best: bool = False):
    """Resume from the fixed-name scheme; returns (state, start_step)
    (train_pppe_pcd_ae.py:61-82)."""
    suffix = "best" if best else "latest"
    ae_p = os.path.join(folder, f"ae_{suffix}.pkl")
    opt_p = os.path.join(folder, f"optimizer_{suffix}.pkl")
    step_p = os.path.join(folder, f"global_{suffix}.pkl")
    if os.path.exists(ae_p):
        loaded = _load(ae_p)
        params = dict(state.params)
        params["ae"] = loaded["params"] if "params" in loaded else loaded
        state = state.replace(params=params)
        if "batch_stats" in loaded and getattr(state, "batch_stats", None) is not None:
            state = state.replace(batch_stats={"ae": loaded["batch_stats"]})
    if os.path.exists(opt_p):
        state = state.replace(opt_state=_load(opt_p))
    start_step = 0
    if os.path.exists(step_p):
        start_step = int(_load(step_p)) + 1
        state = state.replace(step=start_step)
    return state, start_step


def load_inference_params(folder: str):
    """Load `ae.pkl`/`prob.pkl` (compress.py:58-66). Returns (ae, prob) or
    (None, None) if absent."""
    ae_p = os.path.join(folder, "ae.pkl")
    prob_p = os.path.join(folder, "prob.pkl")
    if os.path.exists(ae_p) and os.path.exists(prob_p):
        return _load(ae_p), _load(prob_p)
    return None, None
