"""Training-CLI surface smoke: arg parsing + default configs validate.

Guards the CLI wiring against config-contract drift (config/validate.py
runs inside build_model, so a CLI whose assembled defaults leave the
implemented envelope must fail HERE, not mid-training).
"""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent

CLIS = [
    "training/maskdino/train_original.py",
    "training/maskdino/train_full.py",
    "training/maskdino/train_experiments.py",
    "training/maskdino/evaluate.py",
    "training/maskdino/visualize.py",
    "training/train_template.py",
]


def test_maskdino_default_cfg_validates():
    sys.path.insert(0, str(ROOT / "training" / "maskdino"))
    try:
        from common import setup_cfg
    finally:
        sys.path.pop(0)
    from vision_instance_seg_tpu.config.validate import validate_cfg

    validate_cfg(setup_cfg())


def test_bench_default_cfg_validates():
    sys.path.insert(0, str(ROOT))
    from bench import bench_infer  # noqa: F401 — import parses fine
    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.config.validate import validate_cfg

    cfg = get_cfg()
    cfg.MODEL.SWIN.WINDOW_SIZE = 8      # bench.py flagship override
    validate_cfg(cfg)


@pytest.mark.slow
@pytest.mark.parametrize("cli", CLIS)
def test_cli_help_parses(cli):
    r = subprocess.run([sys.executable, str(ROOT / cli), "--help"],
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-800:]
    assert "usage" in r.stdout.lower()
