"""Numerical parity of the flax LPIPS against the ACTUAL reference LPIPS code
(reference vqvae/modules/loss/lpips_pytorch/), exercising
tools/convert_lpips_weights.py end-to-end for all three backbones.

torchvision is not installed in this environment, so each torchvision
backbone (`.features` of vgg16 / alexnet / squeezenet1_1) is replicated here
as a plain torch Sequential with the exact module layout (same indices, same
hyperparameters — verified against torchvision's published architecture) and
random weights. A fake ``torchvision`` module is injected into sys.modules so
the reference's networks.py (networks.py:67-97) builds against the replicas,
and the reference LPIPS forward (lpips.py:31-38) runs unmodified.

The replica state_dicts — whose keys are exactly the torchvision
``.features.state_dict()`` keys — then flow through the real converter CLI
(tools/convert_lpips_weights.py --backbone_pth/--lin_pth) into
``init_lpips``, and the two implementations must agree to ~1e-5. This pins:
the tap placement (enumerate-from-1 target_layers semantics), the z-score
buffers, normalize_activation, pool geometry (incl. squeezenet's
ceil_mode=True), the lin-head math, AND the converter's conv-index tables /
transposes — the full pretrained-weight path minus the download itself.
"""

import os
import subprocess
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# torch replicas of the torchvision backbones (random weights)
# ---------------------------------------------------------------------------

def make_vgg16_features(torch):
    """torchvision vgg16().features: cfg 'D', 31 modules, pools at 4/9/16/23/30."""
    nn = torch.nn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU()]
            in_ch = v
    return nn.Sequential(*layers)


def make_alexnet_features(torch):
    nn = torch.nn
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2),
    )


def make_squeezenet_features(torch):
    nn = torch.nn

    class Fire(nn.Module):
        # attribute names match torchvision.models.squeezenet.Fire so the
        # state_dict keys ('<idx>.squeeze.weight', …) are identical
        def __init__(self, in_ch, squeeze, expand):
            super().__init__()
            self.squeeze = nn.Conv2d(in_ch, squeeze, 1)
            self.expand1x1 = nn.Conv2d(squeeze, expand, 1)
            self.expand3x3 = nn.Conv2d(squeeze, expand, 3, padding=1)
            self.relu = nn.ReLU()

        def forward(self, x):
            x = self.relu(self.squeeze(x))
            return torch.cat([self.relu(self.expand1x1(x)),
                              self.relu(self.expand3x3(x))], dim=1)

    return nn.Sequential(
        nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(64, 16, 64), Fire(128, 16, 64),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(128, 32, 128), Fire(256, 32, 128),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(256, 48, 192), Fire(384, 48, 192),
        Fire(384, 64, 256), Fire(512, 64, 256),
    )


_MAKERS = {"vgg": make_vgg16_features, "alex": make_alexnet_features,
           "squeeze": make_squeezenet_features}
_N_LIN = {"vgg": 5, "alex": 5, "squeeze": 7}


@pytest.fixture(scope="module")
def ref_lpips(reference_path):
    """(torch, reference networks module, replicas dict) with fake torchvision
    injected so the reference code imports cleanly."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    replicas = {net: _MAKERS[net](torch).eval() for net in _MAKERS}

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        models.vgg16 = lambda weights=None, **kw: types.SimpleNamespace(
            features=replicas["vgg"])
        models.alexnet = lambda pretrained=None, **kw: types.SimpleNamespace(
            features=replicas["alex"])
        models.squeezenet1_1 = lambda pretrained=None, **kw: types.SimpleNamespace(
            features=replicas["squeeze"])
        models.VGG16_Weights = types.SimpleNamespace(DEFAULT="default")
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models

    sys.path.insert(0, reference_path)
    from vqvae.modules.loss.lpips_pytorch.modules import networks as ref_networks
    from vqvae.modules.loss.lpips_pytorch.modules import lpips as ref_lpips_mod
    return torch, ref_networks, ref_lpips_mod, replicas


def _build_reference_lpips(torch, ref_networks, ref_lpips_mod, net_type, seed):
    """Reference LPIPS instance wired up without the weight download:
    the real BaseNet forward + the real LPIPS.forward math."""
    net = ref_networks.get_network(net_type)
    lin = ref_networks.LinLayers(net.n_channels_list)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for layer in lin:
            layer[1].weight.uniform_(0.05, 1.0, generator=g)
    lp = ref_lpips_mod.LPIPS.__new__(ref_lpips_mod.LPIPS)
    torch.nn.Module.__init__(lp)
    lp.net = net
    lp.lin = lin
    return lp


@pytest.mark.parametrize("net_type", ["vgg", "alex", "squeeze"])
def test_lpips_matches_reference_via_converter(ref_lpips, net_type,
                                               tmp_path, monkeypatch):
    torch, ref_networks, ref_lpips_mod, replicas = ref_lpips
    lp_ref = _build_reference_lpips(torch, ref_networks, ref_lpips_mod,
                                    net_type, seed=7)

    size = 64
    rs = np.random.RandomState(3)
    x = rs.uniform(-1, 1, (2, 3, size, size)).astype(np.float32)
    y = np.clip(x + rs.uniform(-0.3, 0.3, x.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        d_ref = float(lp_ref(torch.from_numpy(x), torch.from_numpy(y)))

    # --- export through the real converter CLI -----------------------------
    backbone_pth = tmp_path / "backbone.pth"
    lin_pth = tmp_path / "lin.pth"
    torch.save(replicas[net_type].state_dict(), backbone_pth)
    torch.save(lp_ref.lin.state_dict(), lin_pth)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_lpips_weights.py"),
         "--net", net_type, "--out", str(tmp_path),
         "--backbone_pth", str(backbone_pth), "--lin_pth", str(lin_pth)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": str(REPO)})
    assert out.returncode == 0, out.stderr
    assert (tmp_path / f"lpips_{net_type}.npz").exists()

    # --- load through init_lpips and compare -------------------------------
    monkeypatch.setenv("VQVAE_TPU_LPIPS_WEIGHTS_DIR", str(tmp_path))
    import warnings

    from vqvae_tpu.models.lpips import init_lpips

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # random-init fallback would warn
        module, params = init_lpips(net_type, image_size=size)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    y_nhwc = jnp.asarray(y.transpose(0, 2, 3, 1))
    d_jax = float(module.apply({"params": params}, x_nhwc, y_nhwc))

    assert d_ref > 1e-4  # non-degenerate comparison
    np.testing.assert_allclose(d_jax, d_ref, rtol=1e-4, atol=1e-6)

    # per-sample (reduce=False) path must average to the same distance
    d_per = module.apply({"params": params}, x_nhwc, y_nhwc, reduce=False)
    np.testing.assert_allclose(float(jnp.mean(d_per)), d_ref,
                               rtol=1e-4, atol=1e-6)
