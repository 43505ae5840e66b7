"""Single-person path (BASELINE config #2: one person, frozen-pose-style
short optimization) — exercises P=1 edge cases end to end."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from multiply_tpu.config import load_config
from multiply_tpu.data.synthetic import make_scene
from multiply_tpu.data.synthetic_sequence import SyntheticSequence
from multiply_tpu.engine.sam_stage import PriorSegmenter
from multiply_tpu.engine.trainer import Trainer

CONF_PATH = os.path.join(os.path.dirname(__file__), "..", "confs", "synthetic_base.yaml")


def test_single_person_training_and_stages(tmp_path):
    run_dir = str(tmp_path)
    conf = load_config(
        CONF_PATH,
        overrides={
            "model": {
                "implicit_network": {"dims": [32, 32], "skip_in": [], "multires": 2,
                                     "feature_vector_size": 32, "number_person": 1},
                "rendering_network": {"dims": [32], "feature_vector_size": 32},
                "bg_implicit_network": {"dims": [32, 32], "multires": 2,
                                        "feature_vector_size": 32},
                "bg_rendering_network": {"dims": [16], "feature_vector_size": 32},
                "ray_sampler": {"N_samples": 8, "N_samples_eval": 16,
                                "N_samples_extra": 4, "beta_iters": 3,
                                "max_total_iters": 2, "N_samples_inverse_sphere": 4},
                "dim_frame_encoding": 8,
                "depth_epoch": [],
                "cano_grid_res": 12,
                "cano_mesh_res_up": 1,
                "num_training_frames": 2,
            },
            "dataset": {"train": {"num_sample": 48, "end_frame": 2, "num_person": 1,
                                  "height": 28, "width": 36}},
        },
    )
    scene = make_scene(num_frames=2, num_persons=1, height=28, width=36)
    seq = SyntheticSequence(scene, num_sample=48, run_dir=run_dir)
    assert seq.num_person == 1

    from train import build_servers

    servers = build_servers(conf, seq)
    tr = Trainer(conf, seq, servers, run_dir=run_dir, segmenter=PriorSegmenter())

    logs = tr.train_epoch()
    assert np.isfinite(logs["loss"])

    tr.instance_mask_stage()
    tr.sam_stage()
    sam = np.load(
        glob.glob(os.path.join(run_dir, "stage_sam_mask", "*", "sam_opt_mask.npy"))[-1]
    )
    assert sam.shape[1] == 1  # (F, P=1, H, W)

    # SAM prompt building with a single person must not crash (no partners)
    from multiply_tpu.engine.instance_masks import build_sam_prompts

    masks = np.load(
        glob.glob(os.path.join(run_dir, "stage_instance_mask", "*", "all_person_smpl_mask.npy"))[-1]
    )
    kps = np.load(
        glob.glob(os.path.join(run_dir, "stage_instance_mask", "*", "2d_keypoint.npy"))[-1]
    )
    prompts = build_sam_prompts(masks[0], kps[0], np.random.default_rng(0))
    assert len(prompts) == 1
    assert (prompts[0]["labels"] == 1).sum() >= 1
