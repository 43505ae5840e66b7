"""SAM architecture tests (tiny random-weight variant): shapes, predictor
round trip, prompt chaining, and the SAM refinement stage plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiply_tpu.models.sam import (
    IMG_SIZE,
    Sam,
    SamPredictor,
    window_partition,
    window_unpartition,
)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((10, 13, 4)).astype(np.float32))
    wnd, pad_hw = window_partition(x, 7)
    back = window_unpartition(wnd, 7, pad_hw, (10, 13))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


@pytest.fixture(scope="module")
def tiny_sam():
    model = Sam(variant="vit_test")
    img = jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3))
    pts = jnp.zeros((8, 2))
    lbl = jnp.zeros((8,), jnp.int32)
    mask = jnp.zeros((256, 256))
    params = model.init(jax.random.PRNGKey(0), img, pts, lbl, mask)
    return model, params


def test_sam_shapes(tiny_sam):
    model, params = tiny_sam
    emb = model.apply(params, jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3)), method=Sam.encode_image)
    assert emb.shape == (1, 64, 64, 256)
    masks, iou = model.apply(
        params,
        emb[0],
        jnp.asarray([[512.0, 512.0]]),
        jnp.asarray([1], jnp.int32),
        jnp.zeros((256, 256)),
        method=Sam.decode,
    )
    assert masks.shape == (4, 256, 256)
    assert iou.shape == (4,)
    assert np.isfinite(np.asarray(masks)).all()


def test_predictor_roundtrip_and_chaining(tiny_sam):
    model, params = tiny_sam
    pred = SamPredictor(model, params)
    img = (np.random.default_rng(1).random((100, 150, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    logits = pred.predict(
        point_coords=np.asarray([[75.0, 50.0]]),
        point_labels=np.asarray([1]),
        box=np.asarray([10.0, 10.0, 140.0, 90.0]),
    )
    assert logits.shape == (256, 256)
    # chain: feed logits back as mask input
    logits2 = pred.predict(
        point_coords=np.asarray([[75.0, 50.0]]),
        point_labels=np.asarray([1]),
        box=np.asarray([10.0, 10.0, 140.0, 90.0]),
        mask_input_logits=logits,
    )
    assert logits2.shape == (256, 256)
    full = pred.logits_to_full_res(logits2)
    assert full.shape == (100, 150)


def test_sam_stage_with_mock_predictor(tmp_path):
    """SamSegmenter writes (F,P,H,W) logits from instance-mask prompts."""
    from multiply_tpu.engine.sam_stage import SamSegmenter

    run_dir = str(tmp_path)
    F, P, H, W = 2, 2, 40, 52
    rng = np.random.default_rng(0)
    masks = np.zeros((F, P, H, W), bool)
    masks[:, 0, 10:25, 10:25] = True
    masks[:, 1, 15:35, 30:48] = True
    kps = np.zeros((F, P, 27, 2), np.int32)
    kps[:, 0] = [17, 17]
    kps[:, 1] = [39, 25]
    import os

    stage = os.path.join(run_dir, "stage_instance_mask", "00000")
    os.makedirs(stage)
    np.save(os.path.join(stage, "all_person_smpl_mask.npy"), masks)
    np.save(os.path.join(stage, "2d_keypoint.npy"), kps)

    class MockPredictor:
        def __init__(self):
            self.calls = 0

        def set_image(self, img):
            assert img.shape == (H, W, 3)

        def predict(self, point_coords, point_labels, box, mask_input_logits):
            self.calls += 1
            assert mask_input_logits.shape == (256, 256)
            assert (point_labels[: 1]).max() == 1  # has positive points
            return mask_input_logits  # identity refinement

    mock = MockPredictor()
    images = [np.zeros((H, W, 3), np.uint8) for _ in range(F)]
    seg = SamSegmenter(mock, images)
    out = seg(0, run_dir=run_dir)
    assert out.shape == (F, P, H, W)
    assert mock.calls == F * P * 3  # three chained predictions each
    # identity refinement keeps the prompts' mask support
    assert (out[0, 0] > 0)[12, 12]
    assert not (out[0, 0] > 0)[35, 50]
