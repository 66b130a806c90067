"""Value parity of the 10 shared training configs vs the reference YAMLs.

The reference's configs ARE the experiment definitions (SURVEY.md #27);
silent drift in a model/optimizer section changes what gets trained and
breaks checkpoint grafting (this caught bedroom/horse latent configs with
the wrong num_layers and optimizer).  Paths and file extensions are OUR
artifact conventions and excluded; every numeric/semantic section must
match the reference exactly.
"""

import os

import pytest
import yaml

REF = "/root/reference/config"
OURS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

SHARED = [
    "mnist_regular", "celeba64_representation_learning",
    "ffhq_representation_learning", "horse_representation_learning",
    "bedroom_representation_learning", "celeba64_latent", "ffhq_latent",
    "horse_latent", "bedroom_latent", "celebahq_manipulation",
]

# sections whose VALUES define the experiment (paths excluded)
SECTIONS = ["diffusion_config", "denoise_fn_config", "encoder_config",
            "decoder_config", "latent_denoise_fn_config",
            "classifier_config", "optimizer_config", "dataloader_config",
            "runner_config"]

# documented structural differences (keys, not values):
#   dims: reference's conv_nd dimensionality knob (always 2 for every
#     shipped config; our models are 2-D only, so the key is omitted)
#   latent_dim: our dataset configs carry the latent size explicitly
#   steps_per_dispatch: our dispatch-amortization knob (K steps scanned
#     into one XLA program, training/base.py); no reference counterpart
IGNORED_KEYS = {"dims", "latent_dim", "steps_per_dispatch"}


def _norm(v):
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items() if k not in IGNORED_KEYS}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, str):
        s = v.replace(" ", "")
        try:
            return float(s)
        except ValueError:
            return s
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


@pytest.mark.parametrize("name", SHARED)
def test_config_values_match_reference(name):
    ours = yaml.safe_load(open(os.path.join(OURS, f"{name}.yml")))
    ref = yaml.safe_load(open(os.path.join(REF, f"{name}.yml")))
    for section in SECTIONS:
        if section not in ref:
            continue
        assert section in ours, (name, section)
        assert _norm(ours[section]) == _norm(ref[section]), (name, section)
    # dataset sections: compare everything except data paths.  Our
    # TPU-native dataset extensions (no reference counterpart) are
    # allowlisted explicitly -- any OTHER added key still fails, and
    # every reference key must match exactly.
    ours_only = {"transfer_uint8", "device_resident", "preload",
                 "fast_decode"}
    for section in ("train_dataset_config", "eval_dataset_config"):
        if section not in ref:
            continue
        o = {k: v for k, v in (ours.get(section) or {}).items()
             if "path" not in k and k not in ours_only}
        r = {k: v for k, v in (ref.get(section) or {}).items()
             if "path" not in k}
        assert _norm(o) == _norm(r), (name, section)


def test_apply_overrides_unit():
    """utils.apply_overrides: dotted paths, literal parsing, empty YAML
    sections (None), and malformed input (shared by both CLIs' --set)."""
    import pytest

    from pdae_tpu.utils import apply_overrides

    cfg = {"runner_config": None, "a": {"b": 1}}
    apply_overrides(cfg, ["runner_config.param_sharding=fsdp",
                          "a.b=2", "a.c=[1, 2]", "name=dpm20",
                          "flag=True"])
    assert cfg["runner_config"] == {"param_sharding": "fsdp"}
    assert cfg["a"] == {"b": 2, "c": [1, 2]}
    assert cfg["name"] == "dpm20" and cfg["flag"] is True

    # non-dotted mode: the key is literal even if it contains a dot
    cfg = {}
    apply_overrides(cfg, ["x.y=3"], dotted=False)
    assert cfg == {"x.y": 3}

    with pytest.raises(SystemExit, match="key=value"):
        apply_overrides({}, ["oops"])
    with pytest.raises(SystemExit, match="not a mapping"):
        apply_overrides({"a": 5}, ["a.b=1"])
