"""Reverse migration: our checkpoints -> reference-loadable torch state
dicts.  Roundtrip (torch -> flax -> torch) must be bitwise, and the
reference models must load the exported dicts with strict=True and
produce the same outputs they did with the original weights.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from pdae_tpu.utils.torch_convert import (
    convert_encoder_state_dict, convert_mlp_skip_net_state_dict,
    convert_unet_state_dict, export_encoder_state_dict,
    export_mlp_skip_net_state_dict, export_unet_state_dict,
    export_classifier_state_dict, convert_classifier_state_dict)

UNET_CFG = dict(
    input_channel=3, base_channel=32, channel_multiplier=[1, 2],
    num_residual_blocks_of_a_block=2, attention_resolutions=[2],
    num_heads=2, head_channel=-1, use_new_attention_order=False, dropout=0.0)


def _np_sd(m):
    return {k: v.numpy() for k, v in m.state_dict().items()}


def _assert_sd_equal(got, want):
    assert sorted(got) == sorted(want), (
        set(got) ^ set(want))
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_unet_roundtrip_bitwise():
    from model.unet import UNet as TorchUNet
    tm = TorchUNet(**UNET_CFG, num_class=5)
    sd = _np_sd(tm)
    back = export_unet_state_dict(convert_unet_state_dict(sd))
    _assert_sd_equal(back, sd)
    # strict load + identical forward
    tm2 = TorchUNet(**UNET_CFG, num_class=5)
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()}, strict=True)
    tm.eval(), tm2.eval()
    x, t = torch.randn(2, 3, 16, 16), torch.tensor([3, 700])
    c = torch.tensor([1, 4])
    with torch.no_grad():
        np.testing.assert_array_equal(tm(x, t, c).numpy(),
                                      tm2(x, t, c).numpy())


def test_shift_unet_roundtrip_bitwise():
    from model.shift_unet import ShiftUNet as TorchShiftUNet
    tm = TorchShiftUNet(latent_dim=16, **UNET_CFG)
    sd = _np_sd(tm)
    back = export_unet_state_dict(convert_unet_state_dict(sd))
    _assert_sd_equal(back, sd)
    tm2 = TorchShiftUNet(latent_dim=16, **UNET_CFG)
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()}, strict=True)
    tm.eval(), tm2.eval()
    x, t, z = (torch.randn(2, 3, 16, 16), torch.tensor([3, 700]),
               torch.randn(2, 16))
    with torch.no_grad():
        a_eps, a_g = tm(x, t, z)
        b_eps, b_g = tm2(x, t, z)
    np.testing.assert_array_equal(a_eps.numpy(), b_eps.numpy())
    np.testing.assert_array_equal(a_g.numpy(), b_g.numpy())


@pytest.mark.parametrize("stages,cls_path", [
    (4, "model.representation_learning.encoder.celeba64.CELEBA64Encoder"),
    (5, "model.representation_learning.encoder.ffhq.FFHQEncoder"),
])
def test_encoder_roundtrip_bitwise(stages, cls_path):
    mod_path, cls_name = cls_path.rsplit(".", 1)
    import importlib
    TorchEnc = getattr(importlib.import_module(mod_path), cls_name)
    tm = TorchEnc(latent_dim=32)
    sd = _np_sd(tm)
    back = export_encoder_state_dict(
        convert_encoder_state_dict(sd, num_stages=stages), num_stages=stages)
    _assert_sd_equal(back, sd)


def test_mlp_roundtrip_bitwise():
    from model.mlp_skip_net import MLPSkipNet as TorchMLP
    tm = TorchMLP(input_channel=32, model_channel=64, num_layers=4,
                  time_emb_channel=16, use_norm=True, dropout=0.0)
    sd = _np_sd(tm)
    back = export_mlp_skip_net_state_dict(
        convert_mlp_skip_net_state_dict(sd))
    _assert_sd_equal(back, sd)   # incl. duplicated cond_layers.1 keys
    tm2 = TorchMLP(input_channel=32, model_channel=64, num_layers=4,
                   time_emb_channel=16, use_norm=True, dropout=0.0)
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()}, strict=True)
    tm.eval(), tm2.eval()
    z, t = torch.randn(3, 32), torch.tensor([0, 400, 999])
    with torch.no_grad():
        np.testing.assert_array_equal(tm(z, t).numpy(), tm2(z, t).numpy())


def test_classifier_roundtrip_bitwise():
    tm = torch.nn.Linear(512, 40)
    sd = _np_sd(tm)
    back = export_classifier_state_dict(convert_classifier_state_dict(sd))
    _assert_sd_equal(back, sd)


def test_export_cli_roundtrip(tmp_path):
    """Full CLI roundtrip: reference .pt -> ours .ckpt -> exported .pt with
    bitwise-equal tensors under the same logical keys."""
    sys.path.insert(0, "/root/repo/scripts")
    import convert_torch_checkpoint as cli
    from model.unet import UNet as TorchUNet

    tm = TorchUNet(**UNET_CFG)
    src = str(tmp_path / "ref.pt")
    torch.save({"step": 1234, "ema_denoise_fn": tm.state_dict()}, src)
    ours = str(tmp_path / "ours.ckpt")
    cli.main([src, ours])
    exported = str(tmp_path / "back.pt")
    cli.main([ours, exported, "--export"])
    a = torch.load(src, weights_only=False)
    b = torch.load(exported, weights_only=False)
    assert int(b["step"]) == 1234
    _assert_sd_equal({k: v.numpy() for k, v in b["ema_denoise_fn"].items()},
                     {k: v.numpy() for k, v in a["ema_denoise_fn"].items()})
