"""Config parser against the reference's own YAML files."""

import os

import pytest

from orbslam2_tpu.config import RGBD, STEREO, SlamConfig

REF_CFG = "/root/reference/Config"


def test_defaults():
    cfg = SlamConfig()
    assert cfg.orb.n_features == 1000
    assert cfg.optimizer.huber_2d == 5.99
    assert cfg.tracking.keyframes_limit == 80
    assert cfg.orb.n_features_padded % 256 == 0


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_parse_reference_realsense_yaml():
    cfg = SlamConfig.from_yaml(
        os.path.join(REF_CFG, "RealSense-D435i-IRD.yaml"), sensor=RGBD)
    assert abs(cfg.camera.fx - 379.895904541016) < 1e-6
    assert cfg.orb.n_features == 800
    assert cfg.orb.ini_th_fast == 18
    assert cfg.camera.th_depth == 800.0
    assert cfg.loop.covisibility_consistency_threshold == 2
    assert cfg.loop.detection_threshold == 40
    assert cfg.optimizer.huber_3d == 7.815
    assert cfg.tracking.pnp_ransac_max_iterations == 300
    assert cfg.map_file == "map.bin"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_parse_all_reference_configs():
    n = 0
    for name in os.listdir(REF_CFG):
        if name.endswith(".yaml"):
            cfg = SlamConfig.from_yaml(os.path.join(REF_CFG, name),
                                       sensor=STEREO)
            assert cfg.camera.fx > 0
            assert cfg.orb.n_features > 0
            n += 1
    assert n >= 15


def test_absent_key_falls_back():
    cfg = SlamConfig.from_yaml_str("%YAML:1.0\nCamera.fx: 100.0\n")
    assert cfg.camera.fx == 100.0
    assert cfg.tracking.searching_radius == 7.0  # default
