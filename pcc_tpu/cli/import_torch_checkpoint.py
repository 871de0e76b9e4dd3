"""Convert reference torch checkpoints into this framework's format.

The reference saves `torch.save(module.state_dict())` pickles
(train.py:104-108) which compress.py loads as `ae.pkl`/`prob.pkl`
(compress.py:58-66). This framework's checkpoints keep the same filenames
but hold flax variable dicts, so reference-trained weights cannot be used
directly (PARITY.md checkpoint row). This CLI closes that gap: it maps the
reference AE / ConditionalProbabilityModel state_dicts (AE.py:12-55,87-123)
onto PatchAE / ConditionalProbabilityModel parameter trees.

Layout translation: the reference's 1x1 Conv2d weights are [out, in, 1, 1]
and nn.Linear weights are [out, in]; flax Dense kernels are [in, out] —
each weight is squeezed and transposed, biases pass through. The module
graphs are isomorphic (models/ipdae.py mirrors AE.py layer for layer), so
the conversion is a pure relabeling; tests/test_torch_import.py checks
numerical equality of full forward passes between a torch replica and the
converted flax model.

Usage:
  python -m pcc_tpu.cli.import_torch_checkpoint REF_MODEL_DIR OUT_DIR
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _np(t) -> np.ndarray:
    # works for torch tensors and numpy arrays alike
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_kernel(w) -> np.ndarray:
    """[out, in, 1, 1] 1x1-Conv2d weight -> [in, out] Dense kernel."""
    w = _np(w)
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _linear_kernel(w) -> np.ndarray:
    """[out, in] Linear weight -> [in, out] Dense kernel."""
    return np.ascontiguousarray(_np(w).T)


def _dense(kernel: np.ndarray, bias) -> dict:
    return {"linear": {"kernel": kernel, "bias": _np(bias)}}


def convert_ae_state_dict(sd: dict) -> dict:
    """Reference AE state_dict (AE.py:12-32) -> PatchAE variables."""
    params = {}
    # sa: conv0..conv2 (pn_kit.py:159-161) -> sa/mlp/dense_{i}
    params["sa"] = {"mlp": {
        f"dense_{i}": _dense(_conv_kernel(sd[f"sa.conv{i}.weight"]),
                             sd[f"sa.conv{i}.bias"])
        for i in range(3)
    }}
    # pn: mlp_Modules.{i}.0 Conv2d (pn_kit.py:104-121) -> pn/mlp/dense_{i}
    n_pn = len({k.split(".")[2] for k in sd if k.startswith("pn.mlp_Modules.")})
    params["pn"] = {"mlp": {
        f"dense_{i}": _dense(_conv_kernel(sd[f"pn.mlp_Modules.{i}.0.weight"]),
                             sd[f"pn.mlp_Modules.{i}.0.bias"])
        for i in range(n_pn)
    }}
    # inv_pool: Sequential Linear at indices 0,2,4 (AE.py:19-26)
    for j, idx in enumerate((0, 2, 4)):
        params[f"inv_pool_{j}"] = _dense(
            _linear_kernel(sd[f"inv_pool.{idx}.weight"]),
            sd[f"inv_pool.{idx}.bias"])
    # inv_mlp: MLP mlp_Modules.{i}.0 Conv2d (AE.py:27)
    n_inv = len({k.split(".")[2] for k in sd if k.startswith("inv_mlp.mlp_Modules.")})
    params["inv_mlp"] = {
        f"dense_{i}": _dense(_conv_kernel(sd[f"inv_mlp.mlp_Modules.{i}.0.weight"]),
                             sd[f"inv_mlp.mlp_Modules.{i}.0.bias"])
        for i in range(n_inv)
    }
    return {"params": params}


def convert_prob_state_dict(sd: dict) -> dict:
    """Reference ConditionalProbabilityModel state_dict (AE.py:87-106) ->
    flax ConditionalProbabilityModel variables."""
    n_pn = len({k.split(".")[2] for k in sd
                if k.startswith("model_pn.mlp_Modules.")})
    params = {"model_pn": {"mlp": {
        f"dense_{i}": _dense(
            _conv_kernel(sd[f"model_pn.mlp_Modules.{i}.0.weight"]),
            sd[f"model_pn.mlp_Modules.{i}.0.bias"])
        for i in range(n_pn)
    }}}
    # model_mlp: Sequential Conv2d at indices 0,2,4 (AE.py:98-106)
    params["model_mlp"] = {
        f"dense_{j}": _dense(_conv_kernel(sd[f"model_mlp.{idx}.weight"]),
                             sd[f"model_mlp.{idx}.bias"])
        for j, idx in enumerate((0, 2, 4))
    }
    return {"params": params}


def _load_state_dict(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="import_torch_checkpoint.py",
        description="Convert reference torch ae.pkl/prob.pkl checkpoints "
                    "into this framework's flax format.")
    p.add_argument("ref_folder", help="Folder holding the reference torch "
                   "ae.pkl and prob.pkl (compress.py:58-59 names)")
    p.add_argument("out_folder", help="Destination folder for the converted "
                   "ae.pkl/prob.pkl")
    args = p.parse_args(argv)

    os.makedirs(args.out_folder, exist_ok=True)
    for name, convert in (("ae", convert_ae_state_dict),
                          ("prob", convert_prob_state_dict)):
        src = os.path.join(args.ref_folder, f"{name}.pkl")
        if not os.path.exists(src):
            raise SystemExit(f"missing {src}")
        tree = convert(_load_state_dict(src))
        with open(os.path.join(args.out_folder, f"{name}.pkl"), "wb") as f:
            pickle.dump(tree, f)
        n = sum(int(np.prod(x.shape)) for x in _leaves(tree))
        print(f"{name}.pkl: {n} parameters converted")
    print(f"wrote flax checkpoints to {args.out_folder}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
