"""Write a synthetic body model as an MPI-format SMPL pickle.

The real SMPL pickles are license-gated; this emits the same on-disk format
(the dict layout `lib/smpl/body_models.py:125-250` consumes: v_template,
shapedirs (V,3,NB), posedirs (V,3,(J-1)*9), J_regressor (J,V), weights (V,J),
kintree_table (2,J), f) from our synthetic capsule body, so BOTH this
framework's loader (`body/smpl.py:load_smpl_model`) and the reference's
vendored smplx can consume one identical model — the enabler for end-to-end
numeric parity runs against the reference process without the licensed
download.

The default 6890 vertices matches real SMPL so the reference's
VertexJointSelector (fixed vertex ids up to 6787, lib/smpl/vertex_ids.py)
and its `assert smpl_verts.shape[1] == 6890` paths work unmodified.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from .smpl import NUM_JOINTS, SMPL_PARENTS, BodyModel, synthetic_body_model

GENDERS = ("male", "female", "neutral")


def body_model_to_mpi_dict(model: BodyModel) -> dict:
    """Invert load_smpl_model's read transforms back to the pickle layout."""
    V = int(model.v_template.shape[0])
    posedirs = np.asarray(model.posedirs, np.float64)  # ((J-1)*9, V*3)
    posedirs = posedirs.T.reshape(V, 3, (NUM_JOINTS - 1) * 9)
    kintree = np.stack(
        [
            np.asarray(SMPL_PARENTS, np.int64),
            np.arange(NUM_JOINTS, dtype=np.int64),
        ]
    )
    kintree[0, 0] = -1
    return {
        "v_template": np.asarray(model.v_template, np.float64),
        "shapedirs": np.asarray(model.shapedirs, np.float64),
        "posedirs": posedirs,
        "J_regressor": np.asarray(model.joint_regressor, np.float64),
        "weights": np.asarray(model.lbs_weights, np.float64),
        "kintree_table": kintree,
        "f": np.asarray(model.faces, np.uint32),
    }


def write_mpi_pickle(model: BodyModel, path: str) -> str:
    with open(path, "wb") as f:
        pickle.dump(body_model_to_mpi_dict(model), f, protocol=2)
    return path


def write_synthetic_smpl_dir(
    out_dir: str, num_verts: int = 6890, seed: int = 0
) -> str:
    """Create SMPL_{MALE,FEMALE,NEUTRAL}.pkl (one shared synthetic body) in
    `out_dir`, mirroring the lib/smpl/smpl_model directory layout."""
    os.makedirs(out_dir, exist_ok=True)
    model = synthetic_body_model(num_verts=num_verts, seed=seed)
    for g in GENDERS:
        write_mpi_pickle(model, os.path.join(out_dir, f"SMPL_{g.upper()}.pkl"))
    return out_dir
