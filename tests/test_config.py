import pytest

from vision_instance_seg_tpu.config import CfgNode, get_cfg


def test_defaults_build_and_clone():
    cfg = get_cfg()
    assert cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES == 100
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 5e-5
    assert cfg.SOLVER.BASE_LR == 1e-4


def test_freeze_blocks_writes():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_merge_from_list_coerces_types():
    cfg = get_cfg()
    cfg.merge_from_list([
        "SOLVER.BASE_LR", "5e-5",
        "SOLVER.MAX_ITER", "500",
        "SOLVER.AMP.ENABLED", "False",
        "INPUT.MIN_SIZE_TRAIN", "[320, 352]",
    ])
    assert cfg.SOLVER.BASE_LR == 5e-5
    assert cfg.SOLVER.MAX_ITER == 500
    assert cfg.SOLVER.AMP.ENABLED is False
    assert cfg.INPUT.MIN_SIZE_TRAIN == [320, 352]


def test_merge_rejects_unknown_key_unless_allowed():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_other_cfg(CfgNode({"NOPE": 1}))
    cfg.set_new_allowed(True)  # evaluate.py:62 set_new_allowed(True) behavior
    cfg.merge_from_other_cfg(CfgNode({"NOPE": 1}))
    assert cfg.NOPE == 1


def test_yaml_roundtrip(tmp_path):
    cfg = get_cfg()
    p = tmp_path / "cfg.yaml"
    p.write_text(cfg.dump())
    cfg2 = get_cfg()
    cfg2.merge_from_file(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_base_yaml_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text("SOLVER:\n  BASE_LR: 0.5\n")
    (tmp_path / "child.yaml").write_text(
        "_BASE_: base.yaml\nSOLVER:\n  MAX_ITER: 7\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(tmp_path / "child.yaml"))
    assert cfg.SOLVER.BASE_LR == 0.5
    assert cfg.SOLVER.MAX_ITER == 7
