"""Every named preset must build and hash as a jit static arg."""
import pytest

from unet_tpu.pipeline import PRESETS, get_preset


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_builds_and_hashes(name):
    cfg = get_preset(name)
    assert cfg.name == name
    hash(cfg)  # frozen dataclasses must be hashable (jit static arg)
    assert cfg.segment.num_classes >= 2


def test_unknown_preset():
    with pytest.raises(KeyError):
        get_preset("nope")


def test_two_stage_sensitivities():
    lo = get_preset("two_stage", sensitivity="low")
    hi = get_preset("two_stage", sensitivity="high")
    assert lo.burr.min_area == 50 and hi.burr.min_area == 20
    assert hi.burr.max_area == 1000
