"""Numerical validation of the FID stack against torch-side references:

1. The flax InceptionV3-pool3 extractor + tools/convert_inception_weights.py
   (BN fold) vs a torch replica of the FID inception network
   (pt_inception-2015-12-05 / torchmetrics NoTrainInceptionV3 architecture:
   BasicConv2d with BN eps=1e-3, avg-pool branches with
   count_include_pad=False, Mixed_7c max-pool branch) with random weights.
   The replica's state_dict keys are exactly the pt_inception checkpoint
   keys, so the real converter CLI runs on it unmodified.
2. preprocess_fid_input's TF1 asymmetric bilinear resize vs a direct
   per-pixel numpy implementation of torch-fidelity's
   interpolate_bilinear_2d_like_tensorflow1x.
3. frechet_distance (eigh-based sqrtm) vs the scipy.linalg.sqrtm route used
   by pytorch-fid / torchmetrics.

FID is implementation-sensitive; together these pin the whole rFID path of
the reference (model.py:497,536-541) except the weight download itself.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# torch replica of the FID InceptionV3 (random weights)
# ---------------------------------------------------------------------------

def build_fid_inception(torch):
    nn, F = torch.nn, torch.nn.functional

    class BasicConv2d(nn.Module):
        def __init__(self, i, o, **kw):
            super().__init__()
            self.conv = nn.Conv2d(i, o, bias=False, **kw)
            self.bn = nn.BatchNorm2d(o, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avg_pool_fid(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class InceptionA(nn.Module):
        def __init__(self, in_ch, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(in_ch, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(avg_pool_fid(x))
            return torch.cat([b1, b5, b3, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, in_ch):
            super().__init__()
            self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = torch.nn.functional.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class InceptionC(nn.Module):
        def __init__(self, in_ch, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(avg_pool_fid(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, in_ch):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            bp = torch.nn.functional.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, b7, bp], 1)

    class InceptionE(nn.Module):
        def __init__(self, in_ch, pool="avg"):
            super().__init__()
            self.pool = pool
            self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            if self.pool == "avg":
                bp = avg_pool_fid(x)
            else:
                bp = torch.nn.functional.max_pool2d(x, 3, stride=1, padding=1)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class FIDInception(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280, "avg")
            self.Mixed_7c = InceptionE(2048, "max")

        def forward(self, x):
            F = torch.nn.functional
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"]:
                x = getattr(self, name)(x)
            return x.mean((2, 3))  # pool3

    return FIDInception()


def _randomize(torch, model, seed):
    """Kaiming conv weights + non-trivial BN stats (exercises the fold)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight, generator=g)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return model.eval()


@pytest.fixture(scope="module")
def torch_fid(tmp_path_factory):
    torch = pytest.importorskip("torch")
    model = _randomize(torch, build_fid_inception(torch), seed=11)

    # export through the real converter CLI (BN fold happens there)
    tmp = tmp_path_factory.mktemp("fid_weights")
    pth = tmp / "pt_inception_random.pth"
    torch.save(model.state_dict(), pth)
    npz = tmp / "inception_fid.npz"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_inception_weights.py"),
         "--pth", str(pth), "--out", str(npz)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": str(REPO)})
    assert out.returncode == 0, out.stderr
    return torch, model, npz


def test_pool3_features_match_torch(torch_fid):
    """Same 299x299 uint8 input -> same 2048-d features (no resize in play)."""
    torch, model, npz = torch_fid
    from vqvae_tpu.eval.inception import make_pool3_extractor

    extract = make_pool3_extractor(npz)
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (2, 299, 299, 3), np.uint8)

    feats_jax = np.asarray(extract(imgs))

    x = torch.from_numpy(imgs.transpose(0, 3, 1, 2).astype(np.float32))
    with torch.no_grad():
        feats_t = model((x - 128.0) / 128.0).numpy()

    assert feats_jax.shape == (2, 2048)
    scale = np.abs(feats_t).mean()
    assert scale > 1e-4  # non-degenerate
    np.testing.assert_allclose(feats_jax, feats_t, rtol=2e-3,
                               atol=2e-4 * scale)


def test_tf1_resize_matches_direct_implementation():
    """preprocess_fid_input vs a per-pixel numpy TF1 bilinear (asymmetric
    coords, edge clamp) — the torch-fidelity resize convention."""
    from vqvae_tpu.eval.inception import preprocess_fid_input

    rs = np.random.RandomState(1)
    imgs = rs.randint(0, 256, (2, 64, 48, 3), np.uint8)

    def tf1_resize_1d(arr, axis, out_size):
        in_size = arr.shape[axis]
        coords = np.arange(out_size) * (in_size / out_size)
        lo = np.floor(coords).astype(int)
        hi = np.minimum(lo + 1, in_size - 1)
        w = coords - lo
        a_lo = np.take(arr, lo, axis=axis)
        a_hi = np.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_size
        w = w.reshape(shape)
        return a_lo * (1 - w) + a_hi * w

    ref = imgs.astype(np.float64)
    ref = tf1_resize_1d(ref, 1, 299)
    ref = tf1_resize_1d(ref, 2, 299)
    ref = (ref - 128.0) / 128.0

    got = np.asarray(preprocess_fid_input(imgs))
    assert got.shape == (2, 299, 299, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_frechet_distance_matches_scipy():
    """eigh-based matrix sqrt vs the scipy.linalg.sqrtm route of
    pytorch-fid/torchmetrics."""
    scipy_linalg = pytest.importorskip("scipy.linalg")
    from vqvae_tpu.eval.fid import FIDAccumulator, frechet_distance

    rs = np.random.RandomState(2)
    d = 16
    feats_r = rs.randn(200, d) @ rs.randn(d, d) * 0.3 + rs.randn(d)
    feats_f = rs.randn(180, d) @ rs.randn(d, d) * 0.4 + rs.randn(d) * 0.5

    acc_r, acc_f = FIDAccumulator(d), FIDAccumulator(d)
    acc_r.update(feats_r)
    acc_f.update(feats_f)
    mu1, cov1 = acc_r.stats()
    mu2, cov2 = acc_f.stats()

    got = frechet_distance(mu1, cov1, mu2, cov2)

    # pytorch-fid calculate_frechet_distance (scipy route)
    diff = mu1 - mu2
    covmean = scipy_linalg.sqrtm(cov1 @ cov2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    want = diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean)

    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    # streaming stats must equal the batch formulas torchmetrics uses
    np.testing.assert_allclose(mu1, feats_r.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov1, np.cov(feats_r, rowvar=False), rtol=1e-8)
