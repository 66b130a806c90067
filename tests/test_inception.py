"""Structural test of the FID InceptionV3 graph: random weights with the
torchvision channel table, check feature shape/finiteness and the weight
converter's key handling."""

import numpy as np
import pytest

from pdae_tpu.metrics.inception import (convert_inception_state_dict,
                                        inception_pool3)


def _bc(spec, name, cin, cout, kh, kw):
    spec[f"{name}.conv.weight"] = (kh, kw, cin, cout)
    for suffix in ("weight", "bias", "running_mean", "running_var"):
        spec[f"{name}.bn.{suffix}"] = (cout,)


def inception_weight_spec():
    s = {}
    _bc(s, "Conv2d_1a_3x3", 3, 32, 3, 3)
    _bc(s, "Conv2d_2a_3x3", 32, 32, 3, 3)
    _bc(s, "Conv2d_2b_3x3", 32, 64, 3, 3)
    _bc(s, "Conv2d_3b_1x1", 64, 80, 1, 1)
    _bc(s, "Conv2d_4a_3x3", 80, 192, 3, 3)
    # InceptionA x3
    for name, cin, pool in [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                            ("Mixed_5d", 288, 64)]:
        _bc(s, f"{name}.branch1x1", cin, 64, 1, 1)
        _bc(s, f"{name}.branch5x5_1", cin, 48, 1, 1)
        _bc(s, f"{name}.branch5x5_2", 48, 64, 5, 5)
        _bc(s, f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        _bc(s, f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        _bc(s, f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        _bc(s, f"{name}.branch_pool", cin, pool, 1, 1)
    # InceptionB
    _bc(s, "Mixed_6a.branch3x3", 288, 384, 3, 3)
    _bc(s, "Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1)
    _bc(s, "Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3)
    _bc(s, "Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)
    # InceptionC x4
    for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160),
                     ("Mixed_6d", 160), ("Mixed_6e", 192)]:
        _bc(s, f"{name}.branch1x1", 768, 192, 1, 1)
        _bc(s, f"{name}.branch7x7_1", 768, c7, 1, 1)
        _bc(s, f"{name}.branch7x7_2", c7, c7, 1, 7)
        _bc(s, f"{name}.branch7x7_3", c7, 192, 7, 1)
        _bc(s, f"{name}.branch7x7dbl_1", 768, c7, 1, 1)
        _bc(s, f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        _bc(s, f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        _bc(s, f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        _bc(s, f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
        _bc(s, f"{name}.branch_pool", 768, 192, 1, 1)
    # InceptionD
    _bc(s, "Mixed_7a.branch3x3_1", 768, 192, 1, 1)
    _bc(s, "Mixed_7a.branch3x3_2", 192, 320, 3, 3)
    _bc(s, "Mixed_7a.branch7x7x3_1", 768, 192, 1, 1)
    _bc(s, "Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    _bc(s, "Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    _bc(s, "Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)
    # InceptionE x2
    for name, cin in [("Mixed_7b", 1280), ("Mixed_7c", 2048)]:
        _bc(s, f"{name}.branch1x1", cin, 320, 1, 1)
        _bc(s, f"{name}.branch3x3_1", cin, 384, 1, 1)
        _bc(s, f"{name}.branch3x3_2a", 384, 384, 1, 3)
        _bc(s, f"{name}.branch3x3_2b", 384, 384, 3, 1)
        _bc(s, f"{name}.branch3x3dbl_1", cin, 448, 1, 1)
        _bc(s, f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
        _bc(s, f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        _bc(s, f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        _bc(s, f"{name}.branch_pool", cin, 192, 1, 1)
    return s


def random_params(seed=0):
    rs = np.random.RandomState(seed)
    params = {}
    for k, shape in inception_weight_spec().items():
        if k.endswith("running_var"):
            params[k] = np.abs(rs.randn(*shape)).astype(np.float32) + 0.5
        else:
            params[k] = (rs.randn(*shape) * 0.05).astype(np.float32)
    return params


def test_inception_graph_shapes():
    import jax.numpy as jnp
    params = {k: jnp.asarray(v) for k, v in random_params().items()}
    imgs = np.random.RandomState(1).randint(0, 255, (2, 64, 64, 3), np.uint8)
    feats = inception_pool3(params, imgs)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_inception_converter_keys():
    # fake a torch-style state dict (OIHW conv weights) and convert
    sd = {}
    for k, shape in inception_weight_spec().items():
        if k.endswith(".conv.weight"):
            kh, kw, ci, co = shape
            sd[k] = np.zeros((co, ci, kh, kw), np.float32)
        else:
            sd[k] = np.zeros(shape, np.float32)
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    out = convert_inception_state_dict(sd)
    assert "fc.weight" not in out
    assert not any(k.startswith("AuxLogits") for k in out)
    assert out["Conv2d_1a_3x3.conv.weight"].shape == (3, 3, 3, 32)
