"""Config loading tests — the REFERENCE's own YAML profiles must parse with the
same effective values (SURVEY.md section 5.6 parity requirement)."""

import numpy as np
import pytest

from pin_slam_tpu.config import Config

KITTI_YAML = """
setting:
  name: "test_kitti"
  output_root: "./experiments"
  kitti_correct: True
  correct_deg: 0.195
process:
  min_range_m: 3.0
  max_range_m: 80.0
  vox_down_m: 0.08
  min_z_m: -3.5
sampler:
  surface_sample_range_m: 0.25
  surface_sample_n: 4
  free_front_sample_n: 2
neuralpoints:
  voxel_size_m: 0.4
  feature_dim: 8
  query_nn_k: 6
  search_alpha: 0.5
  weighted_first: False
decoder:
  freeze_after_frame: 30
loss:
  main_loss_type: bce
  sigma_sigmoid_m: 0.08
  loss_weight_on: True
continual:
  batch_size_new_sample: 2000
  pool_capacity: 2e7
tracker:
  source_vox_down_m: 0.8
  iter_n: 100
  GM_grad: 0.1
  GM_dist: 0.2
pgo:
  map_context: True
  pgo_freq_frame: 20
  virtual_side_count: 6
  context_cosdist: 0.25
optimizer:
  iters: 15
  batch_size: 16384
eval:
  silence_log: True
  mesh_min_nn: 15
  save_map: True
"""


@pytest.fixture
def kitti_cfg(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(KITTI_YAML)
    return Config().load(str(p))


def test_reference_yaml_keys_map(kitti_cfg):
    c = kitti_cfg
    assert c.name == "test_kitti"
    assert c.kitti_correction_on and abs(c.correction_deg - 0.195) < 1e-9
    assert c.min_range == 3.0 and c.max_range == 80.0 and c.min_z == -3.5
    assert c.surface_sample_n == 4 and c.free_front_n == 2
    assert c.voxel_size_m == 0.4 and c.search_alpha == 0.5
    assert c.weighted_first is False
    assert c.freeze_after_frame == 30
    assert c.sigma_sigmoid_m == 0.08 and c.loss_weight_on
    assert c.bs_new_sample == 2000 and c.pool_capacity == int(2e7)
    assert c.reg_iter_n == 100 and c.reg_GM_grad == 0.1 and c.reg_GM_dist_m == 0.2
    assert c.pgo_on and c.global_loop_on and c.pgo_freq == 20
    assert c.context_virtual_side_count == 6
    assert abs(c.context_cosdist_threshold - 0.25) < 1e-9
    assert c.bs == 16384 and c.iters == 15
    assert c.silence and c.mesh_min_nn == 15 and c.save_map


def test_derived_params(kitti_cfg):
    """(reference utils/config.py:568-586)."""
    c = kitti_cfg
    assert c.infer_bs == c.bs * 64
    assert c.window_radius == max(c.max_range, 6.0)
    assert c.local_map_radius == c.max_range + 2.0
    assert c.mc_res_m == c.voxel_size_m  # not set in eval -> voxel size


def test_sdf_scale():
    c = Config()
    assert abs(c.sdf_scale - 0.55 * 0.1) < 1e-12
    c.main_loss_type = "l2"
    assert c.sdf_scale == 1.0


def test_defaults_match_reference():
    """Spot-check defaults against reference utils/config.py:11-325."""
    c = Config()
    assert c.voxel_size_m == 0.3
    assert c.query_nn_k == 6
    assert c.num_nei_cells == 2 and c.search_alpha == 0.2
    assert c.feature_dim == 8 and c.feature_std == 0.0
    assert c.buffer_size == int(5e7)
    assert c.surface_sample_n == 3 and c.free_front_n == 2 and c.free_behind_n == 1
    assert c.bs == 16384 and c.lr == 0.01 and c.adam_eps == 1e-15
    assert c.iters == 15 and c.init_iter_ratio == 40
    assert c.reg_iter_n == 50 and c.reg_lm_lambda == 1e-4
    assert c.reg_term_thre_deg == 0.01 and c.reg_term_thre_m == 0.0005
    assert c.logistic_gaussian_ratio == 0.55
    assert c.context_shape == [20, 60]


def test_empty_yaml(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("")
    c = Config().load(str(p))
    assert c.bs == 16384
