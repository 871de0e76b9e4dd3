"""Torch-checkpoint import: converted reference weights must reproduce the
reference computation.

Builds a torch replica of the reference AE / ConditionalProbabilityModel
architectures (AE.py:12-55,87-123 — same module tree, so state_dict keys
match the reference's), converts its state_dict with
cli/import_torch_checkpoint, and asserts the flax models produce the same
numbers. This simultaneously validates the converter's weight relabeling
and the flax models' semantic parity with the torch graph.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcc_tpu.cli.import_torch_checkpoint import (  # noqa: E402
    convert_ae_state_dict,
    convert_prob_state_dict,
    main as import_main,
)
from pcc_tpu.config import CodecConfig  # noqa: E402
from pcc_tpu.models.ipdae import ConditionalProbabilityModel, PatchAE  # noqa: E402

K, k, d, L, SA_KNN = 32, 16, 8, 7, 8


def _torch_knn_group(xyz, knn):
    """[B, N, 3] -> centered neighbor groups [B, 3, knn, N]."""
    dist = torch.cdist(xyz, xyz)
    idx = dist.topk(knn, largest=False).indices            # [B, N, knn]
    B, N, _ = xyz.shape
    gathered = torch.stack([xyz[b][idx[b]] for b in range(B)])  # [B, N, knn, 3]
    centered = gathered - xyz.unsqueeze(2)
    return centered.permute(0, 3, 2, 1)


class _SA(tnn.Module):
    """Reference SetAbstraction with npoint == N (pn_kit.py:146-211)."""

    def __init__(self):
        super().__init__()
        self.conv0 = tnn.Conv2d(3, 32, 1)
        self.conv1 = tnn.Conv2d(32, 64, 1)
        self.conv2 = tnn.Conv2d(64, 128, 1)

    def forward(self, patches):                            # [B, K, 3]
        g = _torch_knn_group(patches, SA_KNN)              # [B, 3, knn, K]
        g = F.relu(self.conv0(g))
        g = F.relu(self.conv1(g))
        g = F.relu(self.conv2(g))
        return g.max(dim=2).values                         # [B, 128, K]


def _conv_stack(dims, relu):
    mods = tnn.ModuleList()
    for i in range(len(dims) - 1):
        layers = [tnn.Conv2d(dims[i], dims[i + 1], 1)]
        if relu[i]:
            layers.append(tnn.ReLU())
        mods.append(tnn.Sequential(*layers))
    return mods


class _PN(tnn.Module):
    """Reference PointNet (pn_kit.py:98-144): conv stack + max over points."""

    def __init__(self, dims, relu):
        super().__init__()
        self.mlp_Modules = _conv_stack(dims, relu)

    def forward(self, x):                                  # [B, C, N]
        x = x.unsqueeze(-1)
        for m in self.mlp_Modules:
            x = m(x)
        return x.max(dim=2).values.squeeze(-1)             # [B, D]


class _MLP(tnn.Module):
    """Reference MLP (pn_kit.py:263-305): pointwise conv stack."""

    def __init__(self, dims, relu):
        super().__init__()
        self.mlp_Modules = _conv_stack(dims, relu)

    def forward(self, x):                                  # [B, C, N]
        x = x.unsqueeze(-1)
        for m in self.mlp_Modules:
            x = m(x)
        return x.squeeze(-1)


class TorchAE(tnn.Module):
    """Reference AE graph (AE.py:12-55) with matching state_dict keys."""

    def __init__(self):
        super().__init__()
        self.sa = _SA()
        self.pn = _PN([3 + 128, 128, 256, 512, d], [True, True, True, False])
        self.inv_pool = tnn.Sequential(
            tnn.Linear(d, 256), tnn.ReLU(),
            tnn.Linear(256, 1024), tnn.ReLU(),
            tnn.Linear(1024, k * 128), tnn.ReLU(),
        )
        self.inv_mlp = _MLP([d + 128, 128, 64, 32, 3], [True, True, True, False])

    def encode(self, patches):                             # [B, K, 3]
        feats = self.sa(patches)                           # [B, 128, K]
        latent = self.pn(torch.cat([patches.transpose(2, 1), feats], dim=1))
        spread = L - 0.2
        return torch.sigmoid(latent) * spread - spread / 2

    def decode(self, latent_q):                            # [B, d]
        B = latent_q.shape[0]
        x = self.inv_pool(latent_q).view(B, -1, k)         # [B, 128, k]
        tiled = latent_q.unsqueeze(-1).repeat(1, 1, k)     # [B, d, k]
        out = self.inv_mlp(torch.cat([x, tiled], dim=1))   # [B, 3, k]
        return out.transpose(2, 1)


class TorchProb(tnn.Module):
    """Reference ConditionalProbabilityModel graph (AE.py:87-123)."""

    def __init__(self):
        super().__init__()
        self.model_pn = _PN([3, 64, 128, 256], [True, True, True])
        self.model_mlp = tnn.Sequential(
            tnn.Conv2d(3 + 256, 512, 1), tnn.ReLU(),
            tnn.Conv2d(512, 512, 1), tnn.ReLU(),
            tnn.Conv2d(512, d * L, 1),
        )

    def forward(self, sampled_xyz):                        # [B, S, 3]
        B, S, _ = sampled_xyz.shape
        feature = self.model_pn(sampled_xyz.transpose(1, 2))
        mlp_in = torch.cat(
            [sampled_xyz, feature.repeat(1, S).view(B, S, -1)], dim=2)
        out = self.model_mlp(mlp_in.unsqueeze(-1).transpose(1, 2))
        return F.softmax(out.transpose(1, 2).reshape(B, S, d, L), dim=3)


@pytest.fixture(scope="module")
def torch_models():
    torch.manual_seed(7)
    return TorchAE().eval(), TorchProb().eval()


def test_encoder_parity(rng, torch_models):
    tae, _ = torch_models
    params = convert_ae_state_dict(tae.state_dict())
    ae = PatchAE(K=K, k=k, d=d, L=L, sa_knn=SA_KNN)
    patches = rng.random((4, K, 3)).astype(np.float32)

    with torch.no_grad():
        want = tae.encode(torch.from_numpy(patches)).numpy()
    got = np.asarray(ae.apply(params, jnp.asarray(patches),
                              method=PatchAE.encode))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_decoder_parity(rng, torch_models):
    tae, _ = torch_models
    params = convert_ae_state_dict(tae.state_dict())
    ae = PatchAE(K=K, k=k, d=d, L=L, sa_knn=SA_KNN)
    latent_q = rng.integers(-3, 4, size=(4, d)).astype(np.float32)

    with torch.no_grad():
        want = tae.decode(torch.from_numpy(latent_q)).numpy()
    got = np.asarray(ae.apply(params, jnp.asarray(latent_q),
                              method=PatchAE.decode))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_prob_parity(rng, torch_models):
    _, tprob = torch_models
    params = convert_prob_state_dict(tprob.state_dict())
    prob = ConditionalProbabilityModel(d=d, L=L)
    xyz = rng.random((2, 24, 3)).astype(np.float32)

    with torch.no_grad():
        want = tprob(torch.from_numpy(xyz)).numpy()
    got = np.asarray(prob.apply(params, jnp.asarray(xyz)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cli_roundtrip(tmp_path, torch_models, rng):
    """torch.save -> CLI -> load_inference_params -> usable by the codec."""
    tae, tprob = torch_models
    ref_dir, out_dir = tmp_path / "ref", tmp_path / "out"
    ref_dir.mkdir()
    torch.save(tae.state_dict(), ref_dir / "ae.pkl")
    torch.save(tprob.state_dict(), ref_dir / "prob.pkl")

    import_main([str(ref_dir), str(out_dir)])

    from pcc_tpu.train.checkpoint import load_inference_params
    ae_params, prob_params = load_inference_params(str(out_dir))
    assert ae_params is not None and prob_params is not None

    from pcc_tpu.codec import Codec
    cfg = CodecConfig(N=k * 8, N0=64, ALPHA=2, K=K, d=d, L=L, sa_knn=SA_KNN)
    codec = Codec(cfg, ae_params, prob_params, batch_size=1)
    pc = rng.random((cfg.N, 3)).astype(np.float32) * 2 - 1
    p, s, c = codec.compress(pc)
    out = codec.decompress(p, s, c)
    assert out.shape == (cfg.S * cfg.k, 3)
    assert np.isfinite(out).all()
