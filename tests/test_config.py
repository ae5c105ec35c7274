import os

import pytest

from mega_pytorch_tpu.config import PRESETS, get_default_cfg, get_preset


def test_defaults_freeze_and_clone():
    cfg = get_default_cfg()
    assert cfg.MODEL.RPN.ANCHOR_SIZES == (32, 64, 128, 256, 512)
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.RPN_ONLY = True
    c2 = cfg.clone()
    c2.MODEL.RPN_ONLY = True  # clones are mutable
    assert not cfg.MODEL.RPN_ONLY


def test_merge_from_list():
    cfg = get_default_cfg()
    cfg.merge_from_list(
        ["MODEL.ROI_BOX_HEAD.NUM_CLASSES", "31", "MODEL.RPN.ANCHOR_SIZES", "(64, 128)"]
    )
    assert cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES == 31
    assert cfg.MODEL.RPN.ANCHOR_SIZES == (64, 128)
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NOT_A_KEY", "1"])


def test_merge_from_yaml(tmp_path):
    # yacs-style yaml with tuple strings must parse
    f = tmp_path / "c.yaml"
    f.write_text(
        "MODEL:\n"
        "  VID:\n"
        "    METHOD: 'mega'\n"
        "  RPN:\n"
        "    ANCHOR_SIZES: (64, 128, 256, 512)\n"
        "SOLVER:\n"
        "  STEPS: (80000, )\n"
    )
    cfg = get_default_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.VID.METHOD == "mega"
    assert cfg.MODEL.RPN.ANCHOR_SIZES == (64, 128, 256, 512)
    assert cfg.SOLVER.STEPS == (80000,)


def test_all_presets_build():
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES == 31
        assert cfg.MODEL.RPN.POST_NMS_TOP_N_TEST == 300
        cfg.freeze()


def test_mega_preset_values():
    cfg = get_preset("mega_R_101")
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNNMEGA"
    assert cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE == 3
    assert cfg.MODEL.VID.MEGA.ALL_FRAME_INTERVAL == 25
    assert cfg.MODEL.VID.RPN.REF_POST_NMS_TOP_N == 75
    assert not cfg.MODEL.VID.ROI_BOX_HEAD.REDUCE_CHANNEL
    cfg50 = get_preset("mega_R_50")
    assert cfg50.MODEL.VID.ROI_BOX_HEAD.REDUCE_CHANNEL
    assert cfg50.MODEL.VID.MEGA.GLOBAL.RES_STAGE == 0


REFERENCE_CONFIGS = "/root/reference/configs"
SHIPPED_CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _yaml_tree(root):
    out = []
    for dirpath, _, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files if f.endswith(".yaml"))
    return sorted(out)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIGS), reason="no reference checkout")
def test_every_reference_yaml_merges():
    """Every yaml the reference ships (80 files incl. official_configs) must
    merge cleanly onto our defaults — locks in the key-space parity that lets
    users carry reference configs over unchanged."""
    paths = _yaml_tree(REFERENCE_CONFIGS)
    assert len(paths) >= 14
    for path in paths:
        cfg = get_default_cfg()
        cfg.merge_from_file(path)


def test_shipped_yaml_stacks_match_presets():
    """configs/BASE_RCNN_Ngpu.yaml + method yaml == the built-in preset."""
    stacks = {
        "base_R_101": ("BASE_RCNN_1gpu.yaml", "vid_R_101_C4_1x.yaml"),
        "base_R_50": ("BASE_RCNN_1gpu.yaml", "vid_R_50_C4_1x.yaml"),
        "dff_R_101": ("BASE_RCNN_1gpu.yaml", "DFF/vid_R_101_C4_DFF_1x.yaml"),
        "fgfa_R_101": ("BASE_RCNN_1gpu.yaml", "FGFA/vid_R_101_C4_FGFA_1x.yaml"),
        "rdn_base_R_101": ("BASE_RCNN_1gpu.yaml", "RDN/vid_R_101_C4_RDN_base_1x.yaml"),
        "mega_R_101": ("BASE_RCNN_1gpu.yaml", "MEGA/vid_R_101_C4_MEGA_1x.yaml"),
        "mega_R_50": ("BASE_RCNN_1gpu.yaml", "MEGA/vid_R_50_C4_MEGA_1x.yaml"),
    }
    for preset_name, files in stacks.items():
        cfg = get_default_cfg()
        for f in files:
            cfg.merge_from_file(os.path.join(SHIPPED_CONFIGS, f))
        preset = get_preset(preset_name)
        mismatches = _diff_cfg(cfg, preset)
        # presets may set extra defaults (e.g. WEIGHT empty); only keys the
        # yaml stack touches must agree
        assert not mismatches, (preset_name, mismatches)


def _diff_cfg(a, b, prefix=""):
    """Keys where a and b disagree (a is the yaml stack, b the preset)."""
    out = []
    for k in a.keys():
        va, vb = a[k], b[k]
        if hasattr(va, "keys"):
            out.extend(_diff_cfg(va, vb, prefix + k + "."))
        elif va != vb and k != "WEIGHT":  # presets resolve weights lazily
            out.append((prefix + k, va, vb))
    return out


def test_all_shipped_yamls_merge():
    for path in _yaml_tree(SHIPPED_CONFIGS):
        cfg = get_default_cfg()
        cfg.merge_from_file(path)
        cfg.freeze()
