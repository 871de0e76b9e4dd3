"""Convert reference torch checkpoints into this framework's format.

The reference saves `torch.save(module.state_dict())` pickles
(train.py:104-108) which compress.py loads as `ae.pkl`/`prob.pkl`
(compress.py:58-66). This framework's checkpoints keep the same filenames
but hold flax variable dicts, so reference-trained weights cannot be used
directly (PARITY.md checkpoint row). This CLI closes that gap for all
three model families:

- IPDAE (default): AE / ConditionalProbabilityModel state_dicts
  (AE.py:12-55,87-123) -> PatchAE / ConditionalProbabilityModel trees.
- PPPF-AE (`--model PPPF-AE`, trained via reference train.py:56-68):
  PPPF_AE / PN++ ConditionalProbabilityModel state_dicts
  (PPPF_AE.py:114-150,181-228, pointnet_sa_module.py:38-56) ->
  models/pppf.py trees, BatchNorm running stats included.
- PPPE (`--model PPPE`, trained via reference train_pppe_pcd_ae.py:43-49):
  PointCloudAE state_dict (pppe_pcd_ae.py:843-877, encoder+decoder+prob in
  one module) -> models/pppe.py tree, saved under the `ae_{latest,best}`
  naming both sides use (train_pppe_pcd_ae.py:86-89).

Layout translation: the reference's 1x1 Conv2d weights are [out, in, 1, 1],
Conv1d weights are [out, in, 1], and nn.Linear weights are [out, in]; flax
Dense kernels are [in, out] — each weight is squeezed and transposed,
biases pass through. torch BatchNorm{1,2}d (weight, bias, running_mean,
running_var) maps onto flax BatchNorm (scale, bias) params plus
(mean, var) batch_stats; both default to eps=1e-5. The module graphs are
isomorphic per family, so the conversion is a pure relabeling;
tests/test_torch_import.py checks numerical equality of full forward
passes between torch replicas and the converted flax models.

Usage:
  python -m pcc_tpu.cli.import_torch_checkpoint REF_MODEL_DIR OUT_DIR \\
      [--model {IPDAE,PPPF-AE,PPPE}] [--best]
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


def _conv1d_kernel(w) -> np.ndarray:
    """[out, in, 1] 1x1-Conv1d weight -> [in, out] Dense kernel."""
    w = _np(w)
    return np.ascontiguousarray(w[:, :, 0].T)


def _bn(sd: dict, prefix: str):
    """torch BatchNorm{1,2}d params at `prefix` -> (flax params, stats)."""
    return ({"scale": _np(sd[f"{prefix}.weight"]),
             "bias": _np(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])})


def _sa_mlp(sd: dict, prefix: str, n_layers: int, bn_off: int = 1,
            stride: int = 3, has_bias: bool = True):
    """Conv+BN+ReLU Sequential stack -> PointwiseMLP params + batch_stats.

    The reference interleaves [Conv2d, BatchNorm2d, ReLU] flat in one
    Sequential (pointnet_sa_module.py:49-56: conv at index stride*i, BN at
    stride*i + bn_off). PPPE's conv2d_bn_relu nests each triple instead
    (pppe_pcd_ae.py:555-568: `mlp_stack.{i}.0` conv / `.1` BN, bias=False).
    """
    params, stats = {}, {}
    for i in range(n_layers):
        if stride == 3:
            conv_key, bn_key = f"{prefix}.{3 * i}", f"{prefix}.{3 * i + 1}"
        else:
            conv_key, bn_key = f"{prefix}.{i}.0", f"{prefix}.{i}.1"
        kernel = _conv_kernel(sd[f"{conv_key}.weight"])
        bias = (sd[f"{conv_key}.bias"] if has_bias
                else np.zeros(kernel.shape[1], np.float32))
        params[f"dense_{i}"] = _dense(kernel, bias)
        bn_p, bn_s = _bn(sd, bn_key)
        params[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    return params, stats


def _pnpp_encoder(sd: dict, prefix: str, stage_layers=(4, 4, 4)):
    """Reference PointNetPP (PPPF_AE.py:9-46: sa1/sa2/sa3 PointnetSAModule
    stacks) -> models/pppf.py::PointNetPP params + batch_stats."""
    params, stats = {}, {}
    for j, n in enumerate(stage_layers, start=1):
        mlp_p, mlp_s = _sa_mlp(sd, f"{prefix}sa{j}.mlp", n)
        params[f"sa{j}"] = {"mlp": mlp_p}
        stats[f"sa{j}"] = {"mlp": mlp_s}
    return params, stats


def convert_pppf_ae_state_dict(sd: dict) -> dict:
    """Reference PPPF_AE state_dict (PPPF_AE.py:114-126) -> flax PPPF_AE
    variables (models/pppf.py). Encoder stages carry 4 conv+BN layers each
    (sa1's `[3] + sa1_mlp` list includes the leading 3->3 conv)."""
    enc_p, enc_s = _pnpp_encoder(sd, "encoder.")
    params = {"encoder": enc_p}
    stats = {"encoder": enc_s}
    # FoldingNet: two Conv1d stacks at Sequential indices 0,2,4
    # (PPPF_AE.py:65-80), no BN
    params["decoder"] = {
        mlp: {f"dense_{i}": _dense(
            _conv1d_kernel(sd[f"decoder.{mlp}.{idx}.weight"]),
            sd[f"decoder.{mlp}.{idx}.bias"])
            for i, idx in enumerate((0, 2, 4))}
        for mlp in ("mlp1", "mlp2")
    }
    for proj in ("enc_proj", "dec_proj"):
        params[proj] = _dense(_linear_kernel(sd[f"{proj}.weight"]),
                              sd[f"{proj}.bias"])
    return {"params": params, "batch_stats": stats}


def convert_pppf_prob_state_dict(sd: dict) -> dict:
    """Reference PN++ ConditionalProbabilityModel state_dict
    (PPPF_AE.py:181-228) -> flax PPPFConditionalProbabilityModel variables.
    Backbone stages: sa1 [3,64,64,128] (4 layers), sa2 [128,128,256] (3),
    sa3 [256,512,1024]+[feature_dim] (4)."""
    pnpp_p, pnpp_s = _pnpp_encoder(sd, "model_pnpp.", stage_layers=(4, 3, 4))
    params = {"model_pnpp": pnpp_p,
              "model_mlp": {
                  f"dense_{j}": _dense(
                      _conv_kernel(sd[f"model_mlp.{idx}.weight"]),
                      sd[f"model_mlp.{idx}.bias"])
                  for j, idx in enumerate((0, 2, 4))}}
    return {"params": params, "batch_stats": {"model_pnpp": pnpp_s}}


def convert_pppe_ae_state_dict(sd: dict) -> dict:
    """Reference PointCloudAE state_dict (pppe_pcd_ae.py:843-877) -> flax
    PointCloudAE variables (models/pppe.py). One file holds encoder,
    decoder and prob (the reference's separate prob_{latest}.pkl duplicates
    ae.prob — train_pppe_pcd_ae.py:47,87)."""
    params, stats = {}, {}

    # encoder.sa_modules.0: MSG with two branches of 3 conv+BN layers each
    # (pppe_pcd_ae.py:617-632,641-645); convs are bias-free (conv2d_bn_relu)
    sa1_p, sa1_s = {}, {}
    for b in range(2):
        p, s = _sa_mlp(sd, f"encoder.sa_modules.0.branches.{b}.mlp_stack",
                       3, stride=1, has_bias=False)
        sa1_p[f"branch_{b}"] = {"mlp": p}
        sa1_s[f"branch_{b}"] = {"mlp": s}
    enc_p = {"sa1": sa1_p}
    enc_s = {"sa1": sa1_s}
    for j, mod in ((2, 1), (3, 2)):
        p, s = _sa_mlp(sd, f"encoder.sa_modules.{mod}.mlp_stack", 3,
                       stride=1, has_bias=False)
        enc_p[f"sa{j}"] = {"mlp": p}
        enc_s[f"sa{j}"] = {"mlp": s}

    # global_conv: Conv1d(bias=False) + BN1d + ReLU + Conv1d
    # (pppe_pcd_ae.py:661-666) -> gc0 (bias-free Dense) / gc_bn / gc1
    enc_p["gc0"] = {"linear": {
        "kernel": _conv1d_kernel(sd["encoder.global_conv.0.weight"])}}
    gc_bn_p, gc_bn_s = _bn(sd, "encoder.global_conv.1")
    enc_p["gc_bn"] = gc_bn_p
    enc_s["gc_bn"] = gc_bn_s
    enc_p["gc1"] = _dense(_conv1d_kernel(sd["encoder.global_conv.3.weight"]),
                          sd["encoder.global_conv.3.bias"])
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    # decoder: two Linear pairs (pppe_pcd_ae.py:695-705)
    dec_map = (("fc0", "decoder.fc_coarse.0"), ("fc1", "decoder.fc_coarse.2"),
               ("exp0", "decoder.expansion_mlp.0"),
               ("exp1", "decoder.expansion_mlp.2"))
    params["decoder"] = {
        ours: _dense(_linear_kernel(sd[f"{theirs}.weight"]),
                     sd[f"{theirs}.bias"])
        for ours, theirs in dec_map}

    # prob: Linear cond_proj + Conv1d combine + three Conv1d heads
    # (pppe_pcd_ae.py:757-772)
    prob_map = (("cond0", "prob.cond_proj.0", _linear_kernel),
                ("cond1", "prob.cond_proj.2", _linear_kernel),
                ("comb0", "prob.combine.0", _conv1d_kernel),
                ("comb1", "prob.combine.2", _conv1d_kernel),
                ("mean", "prob.mean_head", _conv1d_kernel),
                ("scale", "prob.scale_head", _conv1d_kernel),
                ("pmf", "prob.pmf_head", _conv1d_kernel))
    params["prob"] = {
        ours: _dense(kfn(sd[f"{theirs}.weight"]), sd[f"{theirs}.bias"])
        for ours, theirs, kfn in prob_map}

    return {"params": params, "batch_stats": stats}


def _load_state_dict(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="import_torch_checkpoint.py",
        description="Convert reference torch checkpoints into this "
                    "framework's flax format.")
    p.add_argument("ref_folder", help="Folder holding the reference torch "
                   "checkpoints (ae.pkl/prob.pkl for IPDAE and PPPF-AE — "
                   "compress.py:58-59 names; ae_{latest,best}.pkl for PPPE "
                   "— train_pppe_pcd_ae.py:86)")
    p.add_argument("out_folder", help="Destination folder for the converted "
                   "checkpoints (same filenames)")
    p.add_argument("--model", default="IPDAE",
                   choices=("IPDAE", "PPPF-AE", "PPPE"),
                   help="Reference model family the checkpoints belong to")
    p.add_argument("--best", action="store_true",
                   help="PPPE only: convert ae_best.pkl instead of "
                        "ae_latest.pkl")
    args = p.parse_args(argv)

    os.makedirs(args.out_folder, exist_ok=True)
    if args.model == "PPPE":
        suffix = "best" if args.best else "latest"
        # one reference file holds the whole PointCloudAE; write it under
        # both names our loader pair expects (train/checkpoint.py:121-122)
        jobs = [(f"ae_{suffix}", convert_pppe_ae_state_dict,
                 (f"ae_{suffix}", f"prob_{suffix}"))]
    elif args.model == "PPPF-AE":
        jobs = [("ae", convert_pppf_ae_state_dict, ("ae",)),
                ("prob", convert_pppf_prob_state_dict, ("prob",))]
    else:
        jobs = [("ae", convert_ae_state_dict, ("ae",)),
                ("prob", convert_prob_state_dict, ("prob",))]

    for name, convert, out_names in jobs:
        src = os.path.join(args.ref_folder, f"{name}.pkl")
        if not os.path.exists(src):
            raise SystemExit(f"missing {src}")
        tree = convert(_load_state_dict(src))
        for out_name in out_names:
            with open(os.path.join(args.out_folder, f"{out_name}.pkl"),
                      "wb") as f:
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
