"""Converter + graph parity proof for the FID-Inception and LPIPS backbones
using RANDOM torch weights.

The env cannot download the pretrained files (pt_inception-2015-12-05,
lpips-alexnet), so these tests prove the ONLY missing link is a weight
file: the reference's own FID inception code
(/root/reference/metric/fid/inception.py, executed against a minimal
torchvision stub providing torchvision's exact inception module structure)
and a faithful torch replica of the lpips-alexnet stack are instantiated
with random weights, the weights converted with our shipped converters,
and the produced FEATURES / DISTANCES asserted equal to our JAX graphs.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from pdae_tpu.metrics.inception import (convert_inception_state_dict,
                                        inception_pool3)
from pdae_tpu.metrics.lpips import lpips_distance
from pdae_tpu.utils.torch_convert import convert_lpips_state_dict

HERE = os.path.dirname(os.path.abspath(__file__))


def _randomize_state_dict(model, seed):
    """Plausible random weights: scaled convs, positive BN running_var."""
    rs = np.random.RandomState(seed)
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        shape = tuple(v.shape)
        if k.endswith("running_var"):
            arr = 0.5 + rs.rand(*shape).astype(np.float32)
        elif k.endswith("running_mean"):
            arr = 0.1 * rs.randn(*shape).astype(np.float32)
        elif k.endswith("num_batches_tracked"):
            new[k] = v
            continue
        elif k.endswith("bn.weight"):
            arr = 0.5 + rs.rand(*shape).astype(np.float32)
        elif k.endswith("bn.bias"):
            arr = 0.3 * rs.randn(*shape).astype(np.float32)
        else:  # conv / fc weights
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            arr = (rs.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)
        new[k] = torch.from_numpy(arr)
    return new


# --------------------------------------------------------------------- #
# FID InceptionV3
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def ref_inception_module():
    from _torchvision_stub import install
    install()
    spec = importlib.util.spec_from_file_location(
        "ref_fid_inception", "/root/reference/metric/fid/inception.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fid_inception_feature_parity(ref_inception_module, tmp_path):
    """Reference fid_inception_v3 path (their patch code, their wrapper,
    random weights) vs our inception_pool3 on the converted weights."""
    ref = ref_inception_module
    torch.manual_seed(0)
    # donor with torchvision structure + FID patches = what the downloaded
    # pt_inception file deserializes into
    donor = ref._inception_v3(num_classes=1008, aux_logits=False,
                              weights=None)
    donor.Mixed_5b = ref.FIDInceptionA(192, pool_features=32)
    donor.Mixed_5c = ref.FIDInceptionA(256, pool_features=64)
    donor.Mixed_5d = ref.FIDInceptionA(288, pool_features=64)
    donor.Mixed_6b = ref.FIDInceptionC(768, channels_7x7=128)
    donor.Mixed_6c = ref.FIDInceptionC(768, channels_7x7=160)
    donor.Mixed_6d = ref.FIDInceptionC(768, channels_7x7=160)
    donor.Mixed_6e = ref.FIDInceptionC(768, channels_7x7=192)
    donor.Mixed_7b = ref.FIDInceptionE_1(1280)
    donor.Mixed_7c = ref.FIDInceptionE_2(2048)
    sd = _randomize_state_dict(donor, seed=42)
    weights_file = str(tmp_path / "fid_random.pth")
    torch.save(sd, weights_file)

    # the reference's full load path: fid_inception_v3(path) + wrapper
    model = ref.InceptionV3(resize_input=True, normalize_input=True,
                            output_blocks=[3], use_fid_inception=True,
                            inception_path=weights_file).eval()

    rs = np.random.RandomState(1)
    imgs_uint8 = rs.randint(0, 256, (2, 64, 64, 3), np.uint8)
    x01 = torch.from_numpy(
        imgs_uint8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    with torch.no_grad():
        want = model(x01)[0].squeeze(-1).squeeze(-1).numpy()  # [N, 2048]

    params = convert_inception_state_dict(sd)
    got = np.asarray(inception_pool3(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(imgs_uint8)))

    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_converter_drops_fc_and_transposes(ref_inception_module, tmp_path):
    ref = ref_inception_module
    donor = ref._inception_v3(num_classes=1008, aux_logits=False,
                              weights=None)
    sd = donor.state_dict()
    params = convert_inception_state_dict(sd)
    assert not any(k.startswith("fc.") for k in params)
    w = params["Conv2d_1a_3x3.conv.weight"]
    assert w.shape == (3, 3, 3, 32)  # HWIO from torch OIHW (32,3,3,3)


# --------------------------------------------------------------------- #
# LPIPS (AlexNet backbone)
# --------------------------------------------------------------------- #

class TorchLPIPSAlex(nn.Module):
    """Faithful replica of ``lpips.LPIPS(net='alex')``: torchvision-alexnet
    feature slices, unit-normalized per-channel features at the 5 ReLU
    taps, squared diff, learned 1x1 heads, spatial mean, sum over taps
    (reference uses the lpips package, metric/lpips_metric.py:11).
    State-dict keys mirror the lpips package (net.sliceK.<orig_idx>.*,
    linK.model.1.weight) so the shipped converter is exercised as-is."""

    SHIFT = [-0.030, -0.088, -0.188]
    SCALE = [0.458, 0.448, 0.450]

    def __init__(self):
        super().__init__()
        convs = {
            "0": nn.Conv2d(3, 64, 11, stride=4, padding=2),
            "3": nn.Conv2d(64, 192, 5, padding=2),
            "6": nn.Conv2d(192, 384, 3, padding=1),
            "8": nn.Conv2d(384, 256, 3, padding=1),
            "10": nn.Conv2d(256, 256, 3, padding=1),
        }
        net = nn.Module()
        slices = [("slice1", ["0"]), ("slice2", ["3"]), ("slice3", ["6"]),
                  ("slice4", ["8"]), ("slice5", ["10"])]
        for name, idxs in slices:
            seq = nn.Module()
            for i in idxs:
                seq.add_module(i, convs[i])
            setattr(net, name, seq)
        self.net = net
        self._convs = convs
        for i, ch in enumerate([64, 192, 384, 256, 256]):
            lin = nn.Module()
            lin.add_module(
                "model", nn.Sequential(
                    nn.Dropout(), nn.Conv2d(ch, 1, 1, bias=False)))
            setattr(self, f"lin{i}", lin)

    def _features(self, x):
        feats = []
        h = x
        for i, key in enumerate(["0", "3", "6", "8", "10"]):
            h = F.relu(self._convs[key](h))
            feats.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, stride=2)
        return feats

    @staticmethod
    def _unit(x, eps=1e-10):
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + eps)

    def forward(self, a, b):
        shift = torch.tensor(self.SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(self.SCALE).view(1, 3, 1, 1)
        fa = self._features((a - shift) / scale)
        fb = self._features((b - shift) / scale)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            d = (self._unit(x) - self._unit(y)) ** 2
            lin = getattr(self, f"lin{i}").model[1]
            total = total + lin(d).mean(dim=[2, 3]).squeeze(1)
        return total


def test_inception_converter_cli_end_to_end(ref_inception_module, tmp_path):
    """The exact command a user runs the day the weight file arrives:
    ``convert_torch_checkpoint.py <pt> <ckpt> --inception``, output loaded
    through the production path ``metrics.fid.inception_feature_fn`` and
    feature-parity-checked against the reference's own load path
    (/root/reference/metric/fid/inception.py:198-223, random weights)."""
    ref = ref_inception_module
    torch.manual_seed(7)
    donor = ref._inception_v3(num_classes=1008, aux_logits=False,
                              weights=None)
    donor.Mixed_5b = ref.FIDInceptionA(192, pool_features=32)
    donor.Mixed_5c = ref.FIDInceptionA(256, pool_features=64)
    donor.Mixed_5d = ref.FIDInceptionA(288, pool_features=64)
    donor.Mixed_6b = ref.FIDInceptionC(768, channels_7x7=128)
    donor.Mixed_6c = ref.FIDInceptionC(768, channels_7x7=160)
    donor.Mixed_6d = ref.FIDInceptionC(768, channels_7x7=160)
    donor.Mixed_6e = ref.FIDInceptionC(768, channels_7x7=192)
    donor.Mixed_7b = ref.FIDInceptionE_1(1280)
    donor.Mixed_7c = ref.FIDInceptionE_2(2048)
    sd = _randomize_state_dict(donor, seed=11)
    pt_file = str(tmp_path / "pt_inception_random.pth")
    torch.save(sd, pt_file)

    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))
    try:
        import convert_torch_checkpoint as cli
    finally:
        sys.path.pop(0)
    out_file = str(tmp_path / "inception.ckpt")
    cli.main([pt_file, out_file, "--inception"])

    from pdae_tpu.metrics.fid import inception_feature_fn
    features = inception_feature_fn(out_file)

    model = ref.InceptionV3(resize_input=True, normalize_input=True,
                            output_blocks=[3], use_fid_inception=True,
                            inception_path=pt_file).eval()
    rs = np.random.RandomState(5)
    imgs_uint8 = rs.randint(0, 256, (2, 64, 64, 3), np.uint8)
    x01 = torch.from_numpy(
        imgs_uint8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    with torch.no_grad():
        want = model(x01)[0].squeeze(-1).squeeze(-1).numpy()
    got = features(imgs_uint8)
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_lpips_converter_cli_end_to_end(tmp_path):
    """``convert_torch_checkpoint.py <pt> <ckpt> --lpips`` on a
    random-weight lpips-package state dict, output loaded through
    ``metrics.lpips.load_params``/``lpips_distance`` and parity-checked
    (reference loads the lpips package, metric/lpips_metric.py:11)."""
    torch.manual_seed(9)
    tm = TorchLPIPSAlex().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    for k in list(sd):
        if ".model.1.weight" in k:
            sd[k] = np.abs(sd[k])
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    pt_file = str(tmp_path / "lpips_alex_random.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pt_file)

    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))
    try:
        import convert_torch_checkpoint as cli
    finally:
        sys.path.pop(0)
    out_file = str(tmp_path / "lpips.ckpt")
    cli.main([pt_file, out_file, "--lpips"])

    from pdae_tpu.metrics.lpips import load_params
    params = load_params(out_file)

    rs = np.random.RandomState(6)
    a = np.clip(rs.randn(2, 3, 64, 64), -1, 1).astype(np.float32)
    b = np.clip(rs.randn(2, 3, 64, 64), -1, 1).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(lpips_distance(
        params, jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_distance_parity():
    torch.manual_seed(3)
    tm = TorchLPIPSAlex().eval()
    keys = set(tm.state_dict().keys())
    assert "net.slice1.0.weight" in keys and "lin4.model.1.weight" in keys

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # lpips linear heads are non-negative in the shipped weights; use abs
    for k in list(sd):
        if ".model.1.weight" in k:
            sd[k] = np.abs(sd[k])
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()})
    params = convert_lpips_state_dict(sd)

    rs = np.random.RandomState(4)
    a = np.clip(rs.randn(3, 3, 64, 64), -1, 1).astype(np.float32)
    b = np.clip(rs.randn(3, 3, 64, 64), -1, 1).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(lpips_distance(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
