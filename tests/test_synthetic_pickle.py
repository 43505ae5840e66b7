"""Synthetic MPI-format SMPL pickle: roundtrip through BOTH loaders.

1. ours: body/smpl.py load_smpl_model recovers the exact arrays;
2. reference: the vendored smplx SMPL class (lib/smpl/body_models.py)
   constructs from the same pickle and its forward matches our lbs — the
   foundation for the end-to-end process-parity runs (VERDICT r3 item 3).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from multiply_tpu.body.smpl import (  # noqa: E402
    lbs,
    load_smpl_model,
    synthetic_body_model,
)
from multiply_tpu.body.synthetic_pickle import write_synthetic_smpl_dir  # noqa: E402

REF = "/root/reference/code"


@pytest.fixture(scope="module")
def smpl_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("smpl_model"))
    # small vert count keeps the test fast; 6890 is exercised in the parity
    # driver where the reference's fixed vertex ids require it
    write_synthetic_smpl_dir(out, num_verts=386, seed=0)
    return out


def test_roundtrip_our_loader(smpl_dir):
    model = synthetic_body_model(num_verts=386, seed=0)
    loaded = load_smpl_model(smpl_dir, gender="male")
    np.testing.assert_allclose(
        np.asarray(loaded.v_template), np.asarray(model.v_template), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loaded.posedirs), np.asarray(model.posedirs), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(loaded.shapedirs), np.asarray(model.shapedirs), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(loaded.joint_regressor),
        np.asarray(model.joint_regressor),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(loaded.lbs_weights), np.asarray(model.lbs_weights), atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(loaded.faces), np.asarray(model.faces))


def test_reference_smpl_consumes_pickle(smpl_dir):
    """The vendored smplx loads our pickle and its LBS matches ours."""
    sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from lib.smpl.body_models import SMPL

        # VertexJointSelector indexes fixed vertex ids (<=6787); clamp them
        # for this 386-vert fast test (full-size parity uses 6890 verts)
        import lib.smpl.vertex_ids as vids

        patched = {k: min(v, 385) for k, v in vids.vertex_ids["smplh"].items()}
        old_ids = vids.vertex_ids["smplh"]
        vids.vertex_ids["smplh"] = patched
        try:
            ref = SMPL(
                model_path=smpl_dir,
                gender="male",
                batch_size=1,
                use_hands=False,
                use_feet_keypoints=False,
                dtype=torch.float32,
            )
        finally:
            vids.vertex_ids["smplh"] = old_ids

        rng = np.random.default_rng(3)
        betas = rng.normal(0, 1, size=(10,)).astype(np.float32)
        pose = rng.normal(0, 0.3, size=(72,)).astype(np.float32)
        out_ref = ref.forward(
            betas=torch.from_numpy(betas)[None],
            body_pose=torch.from_numpy(pose[3:])[None],
            global_orient=torch.from_numpy(pose[:3])[None],
            transl=torch.zeros(1, 3),
            return_verts=True,
        )
        ours = lbs(
            synthetic_body_model(num_verts=386, seed=0),
            jnp.asarray(betas),
            jnp.asarray(pose),
        )
        np.testing.assert_allclose(
            np.asarray(ours["verts"]),
            out_ref.vertices[0].detach().numpy(),
            atol=2e-5,
        )
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REF)
