"""SAM at PRODUCTION geometry (IMG_SIZE=1024) — VERDICT round-2 missing item
4: the 1024-input path (64x64 token grid, 14x14 windows with padding, the
get_rel_pos interpolation branch, vit_b-width attention) had only ever run at
a monkeypatched IMG_SIZE=128.

Uses the `vit_b2` variant: vit_b's exact embed_dim/num_heads/window/grid at
the real 1024 input, truncated to one windowed + one global block (the
remaining 10 vit_b blocks repeat those two geometries — porting a real
`sam_vit_h_4b8939.pth` is a file path away, reference sam_model.py:46-55).
Numerics are validated against the torch oracle (tests/_torch_sam.py) in the
official state-dict key naming.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import multiply_tpu.models.sam as sam_mod

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _torch_sam as oracle  # noqa: E402

CFG = sam_mod.VIT_CONFIGS["vit_b2"]
IMG = sam_mod.IMG_SIZE  # 1024 — NOT monkeypatched
GRID = IMG // sam_mod.PATCH  # 64


@pytest.fixture(scope="module")
def ported(tmp_path_factory):
    assert sam_mod.IMG_SIZE == 1024, "production geometry must not be patched"
    t = oracle.make_state_dict(CFG, IMG, seed=0)
    path = str(tmp_path_factory.mktemp("sam") / "sam_vit_b2.pth")
    torch.save(t, path)
    params = sam_mod.port_torch_checkpoint(path, "vit_b2")
    model = sam_mod.Sam(variant="vit_b2")
    return model, params, t


def test_window_partition_padding_at_grid64():
    """64 % 14 = 8: the 64x64 grid pads to 70x70 -> 25 windows, and
    unpartition inverts exactly (reference windowed-attention path)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((GRID, GRID, 8)), jnp.float32)
    windows, pad_hw = sam_mod.window_partition(x, 14)
    assert windows.shape == (25, 14, 14, 8)
    assert pad_hw == (70, 70)
    back = sam_mod.window_unpartition(windows, 14, pad_hw, (GRID, GRID))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_get_rel_pos_interpolation_matches_torch():
    """A checkpoint rel_pos of the wrong length (model fine-tuned at another
    input size) hits the resize branch (sam.py:57-66); must match torch
    F.interpolate linear."""
    rng = np.random.default_rng(1)
    for src_len, q in ((63, GRID), (127, GRID), (27, 14), (19, 14)):
        rel = rng.standard_normal((src_len, 64)).astype(np.float32)
        ours = sam_mod.get_rel_pos(q, q, jnp.asarray(rel))
        theirs = oracle._get_rel_pos(q, q, torch.from_numpy(rel))
        assert ours.shape == (q, q, 64)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5
        )


def test_encoder_production_geometry_matches_torch(ported):
    """Full 1024 input through patch-embed 64x64 grid, windowed block (with
    70x70 padding), global block (4096 tokens, rel-pos at 127), neck."""
    model, params, t = ported
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)

    ours = model.apply(params, jnp.asarray(x), method=sam_mod.Sam.encode_image)
    assert ours.shape == (1, GRID, GRID, 256)

    theirs = oracle.encode_image(t, torch.from_numpy(x), CFG)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-3, rtol=2e-3
    )


def test_rel_pos_interpolation_in_full_encoder(ported, tmp_path):
    """Swap the GLOBAL block's rel_pos for a mismatched length (63 vs the
    127 the 64-grid wants) in the checkpoint: both implementations must
    interpolate and still agree."""
    model, params, t = ported
    t2 = dict(t)
    g = torch.Generator().manual_seed(9)
    hd = CFG["embed_dim"] // CFG["num_heads"]
    t2["image_encoder.blocks.1.attn.rel_pos_h"] = torch.randn(63, hd, generator=g) * 0.1
    t2["image_encoder.blocks.1.attn.rel_pos_w"] = torch.randn(63, hd, generator=g) * 0.1
    path = str(tmp_path / "sam_vit_b2_short_rel.pth")
    torch.save(t2, path)
    params2 = sam_mod.port_torch_checkpoint(path, "vit_b2")

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    ours = model.apply(params2, jnp.asarray(x), method=sam_mod.Sam.encode_image)
    theirs = oracle.encode_image(t2, torch.from_numpy(x), CFG)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), atol=2e-3, rtol=2e-3
    )


def test_full_predict_path_at_scale(ported):
    """set_image -> predict on a realistic 540x960 frame: resize to the 1024
    long side, pad, encode, prompt-encode, decode — the exact path
    SamSegmenter drives in training (reference sam_model.py:57-239)."""
    model, params, t = ported
    predictor = sam_mod.SamPredictor(model, params)

    rng = np.random.default_rng(4)
    img = (rng.random((540, 960, 3)) * 255).astype(np.uint8)
    predictor.set_image(img)
    assert predictor._embed.shape == (GRID, GRID, 256)

    low = predictor.predict(
        point_coords=np.array([[480.0, 270.0], [100.0, 60.0]]),
        point_labels=np.array([1, 0]),
        box=np.array([200.0, 100.0, 760.0, 440.0]),
    )
    assert low.shape == (sam_mod.LOW_RES, sam_mod.LOW_RES)
    assert np.isfinite(low).all()
    # chain like SAMServer's three predicts, then up to full res
    low2 = predictor.predict(
        point_coords=np.array([[480.0, 270.0]]),
        point_labels=np.array([1]),
        mask_input_logits=low,
    )
    full = predictor.logits_to_full_res(low2)
    assert full.shape == (540, 960)
    assert np.isfinite(full).all()
