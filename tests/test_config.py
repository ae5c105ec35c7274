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
