"""Torch-checkpoint import for the PPPF and PPPE families (VERDICT r3
item 5): converted reference weights must reproduce the reference
computation.

Same strategy as tests/test_torch_import.py: build torch replicas of the
reference module graphs with matching state_dict keys — PPPF_AE / the PN++
ConditionalProbabilityModel (PPPF_AE.py:114-150,181-228 +
pointnet_sa_module.py:38-93) and PointCloudAE (pppe_pcd_ae.py:843-877) —
convert their state_dicts with cli/import_torch_checkpoint, and assert the
flax models produce the same numbers.

Selection semantics note: the replicas pin THIS framework's deterministic
point selection — FPS from index 0 (skipped when npoint == N) and
nearest-K-within-radius ball query — because the reference's own inference
is nondeterministic (random FPS start, pn_kit.py:321) and its
first-K-in-radius grouping is a CUDA-kernel artifact (PARITY.md). The
weight relabeling under test is independent of which points get selected;
using one deterministic selection on both sides isolates it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pcc_tpu.cli.import_torch_checkpoint import (  # noqa: E402
    convert_pppe_ae_state_dict,
    convert_pppf_ae_state_dict,
    convert_pppf_prob_state_dict,
    main as import_main,
)

# ---------------------------------------------------------------------------
# deterministic selection ops (this framework's semantics, in torch)
# ---------------------------------------------------------------------------


def _fps(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """ops/fps.py::farthest_point_sample with start index 0."""
    B, N, _ = xyz.shape
    idx = torch.zeros(B, npoint, dtype=torch.long)
    distance = torch.full((B, N), 1e10)
    farthest = torch.zeros(B, dtype=torch.long)
    for i in range(npoint):
        idx[:, i] = farthest
        centroid = xyz[torch.arange(B), farthest][:, None, :]
        dist = ((xyz - centroid) ** 2).sum(-1)
        distance = torch.minimum(distance, dist)
        farthest = distance.argmax(1)
    return idx


def _gather(points: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """[B, N, C] at [B, S] or [B, S, K] (ops/knn.py::index_points)."""
    return torch.stack([points[b][idx[b]] for b in range(points.shape[0])])


def _knn_idx(query: torch.Tensor, points: torch.Tensor, K: int):
    """ops/knn.py::knn_points selection: expanded-form distances + topk."""
    q2 = (query * query).sum(-1, keepdim=True)
    p2 = (points * points).sum(-1)[:, None, :]
    d = (q2 - 2.0 * torch.bmm(query, points.transpose(1, 2)) + p2).clamp(min=0)
    return d.topk(K, largest=False).indices


def _ball_idx(query, points, K, radius):
    """ops/knn.py::ball_query: nearest-K, out-of-radius slots -> index 0,
    with the radius test on exactly recomputed distances."""
    idx = _knn_idx(query, points, K)
    nn = _gather(points, idx)
    d = ((nn - query[:, :, None, :]) ** 2).sum(-1)
    return torch.where(d <= radius * radius, idx, torch.zeros_like(idx))


# ---------------------------------------------------------------------------
# PPPF replicas (PPPF_AE.py + pointnet_sa_module.py state_dict keys)
# ---------------------------------------------------------------------------


class _SAModule(tnn.Module):
    """pointnet_sa_module.py:38-93 (uncentered groups, features-first cat)."""

    def __init__(self, npoint, radius, nsample, mlp, in_channels=0):
        super().__init__()
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        last = in_channels + 3
        layers = []
        for out in mlp:
            layers += [tnn.Conv2d(last, out, 1), tnn.BatchNorm2d(out),
                       tnn.ReLU()]
            last = out
        self.mlp = tnn.Sequential(*layers)

    def forward(self, xyz, features=None):
        if self.npoint == xyz.shape[1]:
            new_xyz = xyz
        else:
            new_xyz = _gather(xyz, _fps(xyz, self.npoint))
        idx = _ball_idx(new_xyz, xyz, self.nsample, self.radius)
        grouped_xyz = _gather(xyz, idx)                     # [B, S, ns, 3]
        if features is not None:
            grouped = torch.cat([_gather(features, idx), grouped_xyz], -1)
        else:
            grouped = grouped_xyz
        out = self.mlp(grouped.permute(0, 3, 1, 2))         # [B, C, S, ns]
        return new_xyz, out.max(dim=3).values.permute(0, 2, 1)  # [B, S, C]


class _PointNetPP(tnn.Module):
    """PPPF_AE.py:9-46 with reference attribute names sa1/sa2/sa3."""

    def __init__(self, points=512, sa1_mlp=(64, 64, 128),
                 sa2_mlp=(128, 128, 128, 256), sa3_mlp=(256, 256, 512),
                 feature_dim=1024):
        super().__init__()
        self.sa1 = _SAModule(points, 0.2, 32, (3,) + tuple(sa1_mlp))
        self.sa2 = _SAModule(128, 0.4, 64, tuple(sa2_mlp), in_channels=128)
        self.sa3 = _SAModule(32, 0.8, 128, tuple(sa3_mlp) + (feature_dim,),
                             in_channels=sa2_mlp[-1])

    def forward(self, xyz):
        xyz, feat = self.sa1(xyz)
        xyz, feat = self.sa2(xyz, feat)
        xyz, feat = self.sa3(xyz, feat)
        return xyz, feat.max(dim=1).values                  # [B, feature_dim]


class TorchPPPF(tnn.Module):
    """PPPF_AE.py:114-150 graph with matching state_dict keys."""

    def __init__(self, K, d, L, dim):
        super().__init__()
        self.L = L
        self.encoder = _PointNetPP(points=K, feature_dim=dim)
        grid = d
        self.decoder = _Folding(points=K, grid_size=grid, feature_dim=dim)
        self.enc_proj = tnn.Linear(dim, d)
        self.dec_proj = tnn.Linear(d, dim)

    def encode(self, xyz):
        _, latent = self.encoder(xyz)
        spread = self.L - 0.2
        latent = torch.sigmoid(latent) * spread - spread / 2
        return self.enc_proj(latent)

    def decode(self, latent_q):
        return self.decoder(self.dec_proj(latent_q))


class _Folding(tnn.Module):
    """PPPF_AE.py:50-109 FoldingNet."""

    def __init__(self, points, grid_size, feature_dim):
        super().__init__()
        self.grid_size, self.num_points = grid_size, grid_size * grid_size
        self.mlp1 = tnn.Sequential(
            tnn.Conv1d(feature_dim + 2, points, 1), tnn.ReLU(),
            tnn.Conv1d(points, points, 1), tnn.ReLU(),
            tnn.Conv1d(points, 3, 1))
        self.mlp2 = tnn.Sequential(
            tnn.Conv1d(feature_dim + 3, 128, 1), tnn.ReLU(),
            tnn.Conv1d(128, 128, 1), tnn.ReLU(),
            tnn.Conv1d(128, 3, 1))

    def forward(self, latent):
        B = latent.shape[0]
        line = torch.linspace(-1, 1, self.grid_size)
        gx, gy = torch.meshgrid(line, line, indexing="ij")
        grid = torch.stack([gx, gy], -1).reshape(1, -1, 2).repeat(B, 1, 1)
        tiled = latent[:, None, :].repeat(1, self.num_points, 1)
        x = torch.cat([grid, tiled], -1).transpose(2, 1)
        coarse = self.mlp1(x)
        fine = self.mlp2(torch.cat([coarse, tiled.transpose(2, 1)], 1))
        return fine.transpose(2, 1)


class TorchPPPFProb(tnn.Module):
    """PPPF_AE.py:181-228 PN++ conditional probability model."""

    def __init__(self, d, L):
        super().__init__()
        self.d, self.L = d, L
        self.model_pnpp = _PointNetPP(
            sa1_mlp=(64, 64, 128), sa2_mlp=(128, 128, 256),
            sa3_mlp=(256, 512, 1024))
        self.model_mlp = tnn.Sequential(
            tnn.Conv2d(3 + 1024, 512, 1), tnn.ReLU(),
            tnn.Conv2d(512, 512, 1), tnn.ReLU(),
            tnn.Conv2d(512, d * L, 1))

    def forward(self, sampled_xyz):
        B, S, _ = sampled_xyz.shape
        _, feature = self.model_pnpp(sampled_xyz)
        mlp_in = torch.cat(
            [sampled_xyz, feature[:, None, :].repeat(1, S, 1)], 2)
        out = self.model_mlp(mlp_in.unsqueeze(-1).transpose(1, 2))
        return F.softmax(out.transpose(1, 2).reshape(B, S, self.d, self.L),
                         dim=3)


# ---------------------------------------------------------------------------
# PPPE replica (pppe_pcd_ae.py live-class state_dict keys)
# ---------------------------------------------------------------------------


def _conv_bn_stack(in_c, mlp):
    layers = tnn.ModuleList()
    last = in_c + 3
    for out in mlp:
        layers.append(tnn.Sequential(
            tnn.Conv2d(last, out, 1, bias=False), tnn.BatchNorm2d(out),
            tnn.ReLU()))
        last = out
    return layers


class _PPPESA(tnn.Module):
    """pppe_pcd_ae.py:573-614 (centered groups, xyz-first cat, KNN)."""

    def __init__(self, npoint, K, in_channel, mlp):
        super().__init__()
        self.npoint, self.K = npoint, K
        self.mlp_stack = _conv_bn_stack(in_channel, mlp)

    def forward(self, xyz, points=None):
        B, N, _ = xyz.shape
        if self.npoint == N:
            new_xyz = xyz
        else:
            new_xyz = _gather(xyz, _fps(xyz, self.npoint))
        idx = _knn_idx(new_xyz, xyz, self.K)
        grouped = _gather(xyz, idx) - new_xyz[:, :, None, :]
        if points is not None:
            grouped = torch.cat([grouped, _gather(points, idx)], -1)
        x = grouped.permute(0, 3, 2, 1)                    # (B, C, K, S)
        for layer in self.mlp_stack:
            x = layer(x)
        return new_xyz, x.max(dim=2).values.permute(0, 2, 1)   # [B, S, C]


class _PPPEMSG(tnn.Module):
    def __init__(self, npoint, scales, in_channel):
        super().__init__()
        self.branches = tnn.ModuleList(
            [_PPPESA(npoint, sc["K"], in_channel, sc["mlp"])
             for sc in scales])

    def forward(self, xyz, points=None):
        outs, new_xyz = [], None
        for b in self.branches:
            new_xyz, feat = b(xyz, points)
            outs.append(feat)
        return new_xyz, torch.cat(outs, -1)


class TorchPPPE(tnn.Module):
    """pppe_pcd_ae.py:843-877 PointCloudAE with matching state_dict keys
    (encoder.sa_modules / global_conv, decoder.fc_coarse / expansion_mlp,
    prob.cond_proj / combine / *_head)."""

    def __init__(self, latent_dim, latent_bins, npoints):
        super().__init__()
        self.latent_bins = latent_bins
        enc = tnn.Module()
        enc.sa_modules = tnn.ModuleList([
            _PPPEMSG(512, ({"K": 16, "mlp": (32, 32, 64)},
                           {"K": 32, "mlp": (64, 64, 128)}), 0),
            _PPPESA(128, 32, 64 + 128, (128, 128, 256)),
            _PPPESA(32, 32, 256, (256, 256, 512)),
        ])
        enc.global_conv = tnn.Sequential(
            tnn.Conv1d(512, 512, 1, bias=False), tnn.BatchNorm1d(512),
            tnn.ReLU(), tnn.Conv1d(512, latent_dim, 1))
        self.encoder = enc
        dec = tnn.Module()
        dec.fc_coarse = tnn.Sequential(
            tnn.Linear(latent_dim, 512), tnn.ReLU(),
            tnn.Linear(512, 512 * 3))
        dec.expansion_mlp = tnn.Sequential(
            tnn.Linear(512 * 3 + latent_dim, 1024), tnn.ReLU(),
            tnn.Linear(1024, npoints * 3))
        self.decoder = dec
        prob = tnn.Module()
        prob.cond_proj = tnn.Sequential(
            tnn.Linear(512, 128), tnn.ReLU(), tnn.Linear(128, 128))
        prob.combine = tnn.Sequential(
            tnn.Conv1d(latent_dim + 128, 128, 1), tnn.ReLU(),
            tnn.Conv1d(128, 128, 1))
        prob.mean_head = tnn.Conv1d(128, latent_dim, 1)
        prob.scale_head = tnn.Conv1d(128, latent_dim, 1)
        prob.pmf_head = tnn.Conv1d(128, latent_bins, 1)
        self.prob = prob
        self.npoints = npoints
        self.latent_dim = latent_dim

    def forward(self, x):
        B, N, _ = x.shape
        xyz, points = x, None
        for sa in self.encoder.sa_modules:
            xyz, points = sa(xyz, points)
        global_feat = points.max(dim=1).values              # (B, 512)
        latent = self.encoder.global_conv(
            global_feat.unsqueeze(-1)).squeeze(-1)          # (B, d)
        y = latent.unsqueeze(-1).repeat(1, 1, N)
        q_min, q_max = 0.0, self.latent_bins - 1.0
        scaled = (y.clamp(q_min, q_max) - q_min) / (
            q_max - q_min + 1e-9) * (self.latent_bins - 1)
        y_q = scaled.round().clamp(0, self.latent_bins - 1)
        y_deq = (y_q / (self.latent_bins - 1)) * (q_max - q_min) + q_min
        y_global = y_deq.mean(dim=2)
        coarse = self.decoder.fc_coarse(y_global).view(B, 512, 3)
        fine = self.decoder.expansion_mlp(
            torch.cat([coarse.view(B, -1), y_global], 1)
        ).view(B, self.npoints, 3)
        return coarse, fine, global_feat, y_q

    def prob_forward(self, y_q, cond_feats):
        N = y_q.shape[2]
        cond = self.prob.cond_proj(cond_feats)[:, :, None].repeat(1, 1, N)
        h = self.prob.combine(torch.cat([y_q, cond], 1))
        mean = self.prob.mean_head(h)
        scale = F.softplus(self.prob.scale_head(h)) + 1e-6
        pmf = F.softmax(self.prob.pmf_head(h), dim=1).clamp(min=1e-9)
        return mean, scale, pmf


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

K, D, L, DIM = 256, 4, 7, 64


def _warm_bn(module, feed):
    """Populate BatchNorm running stats with a couple of train-mode passes
    so the import test exercises nontrivial (mean, var) conversion."""
    module.train()
    with torch.no_grad():
        for _ in range(2):
            feed()
    module.eval()


@pytest.fixture(scope="module")
def pppf_models():
    torch.manual_seed(11)
    g = np.random.default_rng(21)
    ae = TorchPPPF(K=K, d=D, L=L, dim=DIM)
    prob = TorchPPPFProb(d=D, L=L)
    pts = torch.from_numpy(g.random((2, K, 3)).astype(np.float32))
    sk = torch.from_numpy(g.random((2, 512, 3)).astype(np.float32))
    _warm_bn(ae, lambda: ae.encode(pts))
    _warm_bn(prob, lambda: prob(sk))
    return ae, prob


def test_pppf_encoder_parity(rng, pppf_models):
    from pcc_tpu.models.pppf import PPPF_AE

    tae, _ = pppf_models
    variables = convert_pppf_ae_state_dict(tae.state_dict())
    ae = PPPF_AE(K=K, d=D, L=L, dim=DIM)
    xyz = rng.random((2, K, 3)).astype(np.float32)

    with torch.no_grad():
        want = tae.encode(torch.from_numpy(xyz)).numpy()
    got = np.asarray(ae.apply(variables, jnp.asarray(xyz),
                              method=PPPF_AE.encode))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pppf_decoder_parity(rng, pppf_models):
    from pcc_tpu.models.pppf import PPPF_AE

    tae, _ = pppf_models
    variables = convert_pppf_ae_state_dict(tae.state_dict())
    ae = PPPF_AE(K=K, d=D, L=L, dim=DIM)
    latent_q = rng.integers(-3, 4, size=(2, D)).astype(np.float32)

    with torch.no_grad():
        want = tae.decode(torch.from_numpy(latent_q)).numpy()
    got = np.asarray(ae.apply(variables, jnp.asarray(latent_q),
                              method=PPPF_AE.decode))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pppf_prob_parity(rng, pppf_models):
    from pcc_tpu.models.pppf import PPPFConditionalProbabilityModel

    _, tprob = pppf_models
    variables = convert_pppf_prob_state_dict(tprob.state_dict())
    prob = PPPFConditionalProbabilityModel(d=D, L=L)
    # S=512 skeleton: sa1's npoint==S keeps selection trivially equal on
    # both sides; deeper stages exercise FPS + ball query + BN conversion
    xyz = rng.random((2, 512, 3)).astype(np.float32)

    with torch.no_grad():
        want = tprob(torch.from_numpy(xyz)).numpy()
    got = np.asarray(prob.apply(variables, jnp.asarray(xyz)))
    np.testing.assert_allclose(got, want, atol=5e-5)


@pytest.fixture(scope="module")
def pppe_model():
    torch.manual_seed(13)
    g = np.random.default_rng(23)
    m = TorchPPPE(latent_dim=16, latent_bins=16, npoints=512)
    pts = torch.from_numpy(g.random((2, 512, 3)).astype(np.float32))
    _warm_bn(m, lambda: m(pts))
    return m


def test_pppe_forward_parity(rng, pppe_model):
    from pcc_tpu.models.pppe import PointCloudAE

    variables = convert_pppe_ae_state_dict(pppe_model.state_dict())
    model = PointCloudAE(latent_dim=16, latent_bins=16, npoints=512)
    xyz = rng.random((2, 512, 3)).astype(np.float32)

    with torch.no_grad():
        coarse_t, fine_t, cond_t, yq_t = pppe_model(torch.from_numpy(xyz))
    coarse, fine, cond, y_q = model.apply(variables, jnp.asarray(xyz))

    np.testing.assert_allclose(np.asarray(cond), cond_t.numpy(), atol=5e-5)
    # y_q is a hard round of independently-computed f32 latents: a value
    # landing within float-noise of a .5 boundary may legitimately flip one
    # bin between the two frameworks — bound the flip rate, not exact bits
    flips = (np.asarray(y_q) != yq_t.numpy()).mean()
    assert flips < 1e-3, f"quantized-latent flip rate {flips:.4f}"
    if flips == 0.0:
        np.testing.assert_allclose(np.asarray(coarse), coarse_t.numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(fine), fine_t.numpy(),
                                   atol=5e-5)


def test_pppe_decoder_parity(rng, pppe_model):
    """Decoder parity on a controlled dequantized-global latent — no
    rounding between the compared stages, so tolerances stay tight."""
    from pcc_tpu.models.pppe import PointCloudAE

    variables = convert_pppe_ae_state_dict(pppe_model.state_dict())
    model = PointCloudAE(latent_dim=16, latent_bins=16, npoints=512)
    y_global = rng.random((2, 16)).astype(np.float32) * 15.0

    with torch.no_grad():
        yg = torch.from_numpy(y_global)
        coarse_t = pppe_model.decoder.fc_coarse(yg).view(2, 512, 3)
        fine_t = pppe_model.decoder.expansion_mlp(
            torch.cat([coarse_t.view(2, -1), yg], 1)).view(2, 512, 3)
    coarse, fine = model.apply(variables, jnp.asarray(y_global),
                               method=lambda m, z: m.decoder(z))
    np.testing.assert_allclose(np.asarray(coarse), coarse_t.numpy(),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(fine), fine_t.numpy(), atol=5e-5)


def test_pppe_prob_parity(rng, pppe_model):
    from pcc_tpu.models.pppe import PointCloudAE

    variables = convert_pppe_ae_state_dict(pppe_model.state_dict())
    model = PointCloudAE(latent_dim=16, latent_bins=16, npoints=512)
    y_q = rng.integers(0, 16, (2, 16, 64)).astype(np.float32)
    cond = rng.random((2, 512)).astype(np.float32)

    with torch.no_grad():
        mean_t, scale_t, pmf_t = pppe_model.prob_forward(
            torch.from_numpy(y_q), torch.from_numpy(cond))
    mean, scale, pmf = model.apply(variables, jnp.asarray(y_q),
                                   jnp.asarray(cond),
                                   method=lambda m, a, b: m.prob(a, b))
    np.testing.assert_allclose(np.asarray(mean), mean_t.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(scale), scale_t.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(pmf), pmf_t.numpy(), atol=5e-5)


def test_cli_roundtrip_pppf(tmp_path, pppf_models):
    tae, tprob = pppf_models
    ref_dir, out_dir = tmp_path / "ref", tmp_path / "out"
    ref_dir.mkdir()
    torch.save(tae.state_dict(), ref_dir / "ae.pkl")
    torch.save(tprob.state_dict(), ref_dir / "prob.pkl")

    import_main([str(ref_dir), str(out_dir), "--model", "PPPF-AE"])

    from pcc_tpu.train.checkpoint import load_inference_params
    ae_params, prob_params = load_inference_params(str(out_dir))
    assert ae_params is not None and prob_params is not None
    assert "batch_stats" in ae_params and "batch_stats" in prob_params


def test_cli_roundtrip_pppe(tmp_path, pppe_model):
    ref_dir, out_dir = tmp_path / "ref", tmp_path / "out"
    ref_dir.mkdir()
    torch.save(pppe_model.state_dict(), ref_dir / "ae_latest.pkl")

    import_main([str(ref_dir), str(out_dir), "--model", "PPPE"])

    import pickle
    for name in ("ae_latest.pkl", "prob_latest.pkl"):
        with open(out_dir / name, "rb") as f:
            tree = pickle.load(f)
        assert "params" in tree and "batch_stats" in tree
