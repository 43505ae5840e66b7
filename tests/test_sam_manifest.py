"""Official-checkpoint readiness for the SAM port (VERDICT r3 item 6).

The real `sam_vit_h_4b8939.pth` can't be downloaded here, so the state-dict
contract (key naming + shapes of the published architecture at 1024px) is
frozen in tests/data/sam_manifests/*.json and asserted three ways:

1. the torch oracle's state-dict generator still matches the frozen manifest
   (guards against silent drift in the oracle itself);
2. `port_torch_checkpoint` consumes EVERY manifest key (strict mode) on a
   full-shape checkpoint — first-contact KeyError/shape surprises show here;
3. the ported tree is shape-identical to the flax model's own init tree
   (via jax.eval_shape — no 2.5 GB allocation for vit_h).

Reference consumer: /root/reference/code/lib/model/sam_model.py:46-55.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from multiply_tpu.models import sam as sam_mod  # noqa: E402

from _torch_sam import make_state_dict  # noqa: E402

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "data", "sam_manifests")
VARIANTS = ("vit_b", "vit_l", "vit_h")


def _load_manifest(variant):
    with open(os.path.join(MANIFEST_DIR, f"{variant}.json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


@pytest.mark.parametrize("variant", VARIANTS)
def test_oracle_matches_frozen_manifest(variant):
    manifest = _load_manifest(variant)
    cfg = dict(sam_mod.VIT_CONFIGS[variant])
    sd = make_state_dict(cfg, sam_mod.IMG_SIZE)
    got = {k: tuple(v.shape) for k, v in sd.items()}
    assert got == manifest


@pytest.mark.parametrize("variant", VARIANTS)
def test_port_consumes_every_key_and_matches_init_shapes(variant, tmp_path):
    manifest = _load_manifest(variant)
    # zeros checkpoint at exact manifest shapes (vit_h: ~2.5 GB, fits RAM)
    sd = {k: torch.zeros(shape) for k, shape in manifest.items()}
    path = tmp_path / f"{variant}.pth"
    torch.save(sd, path)
    del sd

    # strict=True raises if any checkpoint key goes unconsumed
    params = sam_mod.port_torch_checkpoint(str(path), variant)

    # shape-compare against the model's own init tree without allocating it
    model = sam_mod.Sam(variant=variant)
    grid = sam_mod.IMG_SIZE // sam_mod.PATCH
    init_shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, sam_mod.IMG_SIZE, sam_mod.IMG_SIZE, 3), np.float32),
        jax.ShapeDtypeStruct((sam_mod.MAX_POINTS, 2), np.float32),
        jax.ShapeDtypeStruct((sam_mod.MAX_POINTS,), np.int32),
        jax.ShapeDtypeStruct((grid * 4, grid * 4), np.float32),
    )
    got = jax.tree.map(lambda x: np.shape(x), params)
    want = jax.tree.map(lambda x: tuple(x.shape), init_shapes)
    flat_got, tree_got = jax.tree_util.tree_flatten_with_path(got)
    flat_want, tree_want = jax.tree_util.tree_flatten_with_path(want)
    assert {jax.tree_util.keystr(k) for k, _ in flat_got} == {
        jax.tree_util.keystr(k) for k, _ in flat_want
    }
    want_by_key = {jax.tree_util.keystr(k): v for k, v in flat_want}
    for k, shape in flat_got:
        ks = jax.tree_util.keystr(k)
        assert shape == want_by_key[ks], f"{variant} {ks}: {shape} != {want_by_key[ks]}"


def test_strict_flags_unconsumed_keys(tmp_path):
    manifest = _load_manifest("vit_b")
    sd = {k: torch.zeros(shape) for k, shape in manifest.items()}
    sd["image_encoder.extra_tensor"] = torch.zeros(3)
    path = tmp_path / "extra.pth"
    torch.save(sd, path)
    with pytest.raises(ValueError, match="not consumed"):
        sam_mod.port_torch_checkpoint(str(path), "vit_b")
    # non-strict tolerates it
    sam_mod.port_torch_checkpoint(str(path), "vit_b", strict=False)
