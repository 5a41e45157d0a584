"""Head-to-head accuracy anchor: run the ACTUAL PyTorch reference
(/root/reference) odometry+mapping core on the same synthetic square-loop
sequence as tests/test_full_slam.py, and print its per-frame/endpoint errors.

The full reference entry point cannot run here (open3d/gtsam/skimage/evo wheels
are absent), so this harness stubs the heavy deps (the same technique as
tests/test_reference_parity.py) and drives the reference's own SLAMDataset,
Tracker, Mapper, NeuralPoints and Decoder through the per-frame loop of
/root/reference/pin_slam.py:96-269 (stages I, II, IV; no PGO / mesh / vis).

Usage: python experiments/ref_headtohead.py [scene_seed] [n_frames]
The measured numbers anchor tests/test_full_slam.py's accuracy gates.
"""

import os
import sys
import tempfile
import time
import types
from unittest import mock

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# tests/test_full_slam imports pin_slam_tpu (-> jax); force CPU before any
# device use so this torch-side harness never touches the TPU tunnel
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REF = "/root/reference"


def _stub_module(name):
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def install_stubs():
    for name in ("open3d", "wandb", "roma", "pypose", "laspy", "pyquaternion"):
        if name not in sys.modules:
            mm = mock.MagicMock(name=name)
            mm.__spec__ = _stub_module(name).__spec__
            sys.modules[name] = mm
    # functional stubs: these are actually CALLED on our code path
    tqdm_mod = _stub_module("tqdm")
    tqdm_mod.tqdm = lambda x=None, **k: x
    sys.modules.setdefault("tqdm", tqdm_mod)
    natsort = _stub_module("natsort")
    natsort.natsorted = sorted          # zero-padded filenames -> plain sort ok
    sys.modules.setdefault("natsort", natsort)
    # evo: imported by eval.eval_traj_utils at module level; our path only
    # calls absolute/relative error helpers which are pure numpy
    for name in ("evo", "evo.core", "evo.core.metrics", "evo.core.trajectory",
                 "evo.tools", "evo.tools.plot"):
        mm = mock.MagicMock(name=name)
        mm.__spec__ = _stub_module(name).__spec__
        sys.modules.setdefault(name, mm)


def main():
    scene_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    n_limit = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9

    from test_full_slam import make_square_dataset

    rng = np.random.default_rng(scene_seed)
    root = tempfile.mkdtemp(prefix=f"square_ref_{scene_seed}_")
    n_frames = min(make_square_dataset(root, rng), n_limit)
    print(f"scene seed {scene_seed}: {n_frames} frames at {root}", flush=True)

    install_stubs()
    import torch

    torch.set_default_dtype(torch.float32)
    sys.path.insert(0, REF)
    from utils.config import Config as RefConfig
    import utils.tools as ref_tools

    ref_tools.get_time = time.time          # torch.cuda.synchronize-free
    import model.neural_points as ref_np_mod

    ref_np_mod.get_time = time.time
    from model.decoder import Decoder
    from model.neural_points import NeuralPoints
    from utils.mapper import Mapper
    from utils.tracker import Tracker
    import utils.tracker as ref_trk_mod

    ref_trk_mod.get_time = time.time
    from dataset.slam_dataset import SLAMDataset
    import dataset.slam_dataset as ref_ds_mod

    ref_ds_mod.get_time = time.time

    config = RefConfig()
    config.name = "ref_h2h"
    config.output_root = tempfile.mkdtemp(prefix="ref_out_")
    config.pc_path = f"{root}/velodyne"
    config.pose_path = f"{root}/poses.txt"
    config.device = "cpu"
    config.min_range, config.max_range = 2.0, 20.0
    config.batch_size_new_sample = 2048
    config.bs = 8192
    config.iters = 15
    config.reg_iter_n = 100
    config.silence = True
    config.track_on = True
    config.pgo_on = False
    config.o3d_vis_on = False
    config.wandb_vis_on = False
    config.save_map = config.save_mesh = config.save_merged_pc = False
    config.kitti_correction_on = False
    config.deskew = False
    config.run_path = config.output_root
    # mirror Config.load's derived-param step (utils/config.py:568-586)
    config.infer_bs = config.bs * 64
    config.consistency_count = int(config.bs / 4)
    config.window_radius = max(config.max_range, 6.0)
    config.local_map_radius = config.max_range + 2.0
    config.vis_frame_axis_len = config.max_range / 50.0
    config.loop_with_feature = False

    torch.manual_seed(config.seed)
    np.random.seed(config.seed)

    geo_mlp = Decoder(config, config.geo_mlp_hidden_dim, config.geo_mlp_level, 1)
    neural_points = NeuralPoints(config)
    dataset = SLAMDataset(config)
    tracker = Tracker(config, neural_points, geo_mlp, None, None)
    mapper = Mapper(config, dataset, neural_points, geo_mlp, None, None)

    errs = []
    t_start = time.time()
    for frame_id in range(n_frames):
        dataset.read_frame(frame_id)
        dataset.preprocess_frame(frame_id)
        if frame_id > 0:
            cur_pose_torch, cur_odom_cov, _, valid_flag = tracker.tracking(
                dataset.cur_source_points, dataset.cur_pose_guess_torch,
                dataset.cur_source_colors, dataset.cur_source_normals)
            dataset.lose_track = not valid_flag
            mapper.lose_track = not valid_flag
            dataset.update_odom_pose(cur_pose_torch)
        neural_points.travel_dist = torch.tensor(
            np.array(dataset.travel_dist), device=config.device, dtype=config.dtype)
        if not mapper.lose_track and not dataset.stop_status:
            mapper.process_frame(dataset.cur_point_cloud_torch,
                                 dataset.cur_sem_labels_torch,
                                 dataset.cur_pose_torch, frame_id,
                                 (config.dynamic_filter_on and frame_id > 0))
        else:
            neural_points.reset_local_map(dataset.cur_pose_torch[:3, 3], None,
                                          frame_id)
            mapper.static_mask = None
        cur_iter = config.iters * config.init_iter_ratio if frame_id == 0 else config.iters
        mapper.mapping(cur_iter)
        dataset.processed_frame += 1

        gt = dataset.gt_poses[frame_id]
        est = dataset.odom_poses[frame_id]
        err = np.linalg.norm(np.asarray(est)[:3, 3] - np.asarray(gt)[:3, 3])
        errs.append(err)
        if frame_id % 10 == 0 or frame_id == n_frames - 1:
            print(f"frame {frame_id:3d}: err={err:.3f} m  "
                  f"({(time.time()-t_start)/(frame_id+1):.1f} s/frame)", flush=True)

    errs = np.array(errs)
    print(f"\nREFERENCE on square loop (seed {scene_seed}, {n_frames} frames):")
    print(f"  endpoint error: {errs[-1]:.3f} m")
    print(f"  max error:      {errs.max():.3f} m @ frame {errs.argmax()}")
    print(f"  mean error:     {errs.mean():.3f} m")


if __name__ == "__main__":
    main()
