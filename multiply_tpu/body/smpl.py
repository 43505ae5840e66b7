"""SMPL body model as pure JAX functions over an array pytree.

Behavioral parity with the reference's vendored smplx fork
(reference: code/lib/smpl/lbs.py:136-229, code/lib/smpl/body_models.py:278-365):
shape blend shapes, pose blend shapes, Rodrigues, kinematic-chain rigid
transforms, linear blend skinning returning per-joint absolute transforms `A`,
per-vertex transforms `T`, and skinning weights `W`. Unlike the reference this
is a functional pytree + `lbs()` — batching is `jax.vmap`, persons are a
stacked leading axis, and everything traces under `jit`.
"""

from __future__ import annotations

import io
import os
import pickle
import sys
import types
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# SMPL kinematic tree (24 joints). Static python data: the chain walk is
# unrolled at trace time, so `parents` never needs to be a traced array.
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)
NUM_JOINTS = 24
NUM_BETAS = 10

# Face/feet keypoint vertex ids (SMPL-H topology == SMPL topology); the
# reference instantiates its vertex-joint selector with use_hands=False,
# use_feet_keypoints=False (code/lib/model/smpl.py:12-17) so only the five
# face keypoints extend the 24 joints.
FACE_VERTEX_IDS = {"nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583}


class BodyModel(NamedTuple):
    """Array bundle for one SMPL-topology body model (a JAX pytree)."""

    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, NB)
    posedirs: jnp.ndarray  # ((J-1)*9, V*3)
    joint_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    faces: jnp.ndarray  # (F, 3) int32
    extra_joint_idxs: jnp.ndarray  # (E,) int32 — vertex-keypoint joints

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches the reference batch_rodrigues (code/lib/smpl/lbs.py:276-307)
    including its +1e-8 norm regularizer, so zero poses are exact identity up
    to the same epsilon.
    """
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))

    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def _rigid_transform_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compose per-joint rotations down the kinematic tree.

    rot_mats: (J, 3, 3), joints: (J, 3) rest joints.
    Returns (posed_joints (J,3), rel_transforms A (J,4,4)) where A maps
    rest-pose-centered points of each joint to world, matching
    code/lib/smpl/lbs.py:323-377.
    """
    parents = SMPL_PARENTS
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros((1, 3), joints.dtype), joints[parents[1:]]], axis=0
    )

    def make_tf(R, t):
        top = jnp.concatenate([R, t[:, None]], axis=1)
        bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)
        return jnp.concatenate([top, bottom], axis=0)

    local_tfs = jax.vmap(make_tf)(rot_mats, rel_joints)  # (J,4,4)

    # Unrolled chain walk: J=24 static iterations under jit.
    chain = [local_tfs[0]]
    for j in range(1, NUM_JOINTS):
        chain.append(chain[parents[j]] @ local_tfs[j])
    transforms = jnp.stack(chain, axis=0)  # (J,4,4)

    posed_joints = transforms[:, :3, 3]

    # Subtract the transformed rest joint so A acts on rest-space points.
    correction = jnp.einsum("jab,jb->ja", transforms[:, :3, :3], joints)
    A = transforms.at[:, :3, 3].add(-correction)
    return posed_joints, A


def lbs(
    model: BodyModel,
    betas: jnp.ndarray,
    full_pose: jnp.ndarray,
    v_template: jnp.ndarray | None = None,
    pose_blend: bool = True,
) -> dict:
    """Linear blend skinning for one body (unbatched; vmap for batches).

    Args:
      betas: (NB,) shape coefficients.
      full_pose: (J*3,) axis-angle pose incl. global orient.
      v_template: optional (V,3) personalized template overriding shape blend.
    Returns dict with verts (V,3), joints (J,3), all_joints (J+E,3),
      A (J,4,4) per-joint absolute transforms, T (V,4,4) per-vertex
      transforms, W (V,J) skinning weights, v_posed (V,3).
    """
    if v_template is None:
        v_shaped = model.v_template + jnp.einsum("l,mkl->mk", betas, model.shapedirs)
    else:
        # Reference zeroes betas when a personal template is given
        # (code/lib/model/smpl.py:65-66).
        v_shaped = v_template

    joints = model.joint_regressor @ v_shaped  # (J,3)

    rot_mats = rodrigues(full_pose.reshape(NUM_JOINTS, 3))  # (J,3,3)

    if pose_blend:
        ident = jnp.eye(3, dtype=v_shaped.dtype)
        pose_feature = (rot_mats[1:] - ident).reshape(-1)  # ((J-1)*9,)
        pose_offsets = (pose_feature @ model.posedirs).reshape(-1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, A = _rigid_transform_chain(rot_mats, joints)

    W = model.lbs_weights  # (V,J)
    T = jnp.einsum("vj,jab->vab", W, A)  # (V,4,4)

    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]

    all_joints = jnp.concatenate([posed_joints, verts[model.extra_joint_idxs]], axis=0)

    return {
        "verts": verts,
        "joints": posed_joints,
        "all_joints": all_joints,
        "A": A,
        "T": T,
        "W": W,
        "v_posed": v_posed,
    }


# ---------------------------------------------------------------------------
# Loading real SMPL pickles (chumpy-free) and synthesizing test models.
# ---------------------------------------------------------------------------


class _ChumpyStubUnpickler(pickle.Unpickler):
    """Unpickle MPI SMPL .pkl files without chumpy installed.

    The shipped pickles reference `chumpy.ch.Ch`; we substitute a stub whose
    reconstruction yields the raw numpy array.
    """

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            class _Ch:
                def __setstate__(self, state):
                    self.__dict__.update(state)

                @property
                def r(self):
                    return np.asarray(self.__dict__.get("x"))

            return _Ch
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "r"):
        x = x.r
    if hasattr(x, "toarray"):  # scipy sparse J_regressor
        x = x.toarray()
    return np.asarray(x)


def load_smpl_model(model_path: str, gender: str = "neutral", num_betas: int = NUM_BETAS) -> BodyModel:
    """Load an MPI SMPL pickle (v1.x) into a BodyModel.

    `model_path` may be a directory containing SMPL_{GENDER}.pkl (the layout
    the reference uses, code/lib/smpl/body_models.py:118-135) or a direct
    file path.
    """
    if os.path.isdir(model_path):
        fname = f"SMPL_{gender.upper()}.pkl"
        path = os.path.join(model_path, fname)
    else:
        path = model_path
    with open(path, "rb") as f:
        data = _ChumpyStubUnpickler(io.BytesIO(f.read()), encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"])[:, :, :num_betas].astype(np.float32)
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # ((J-1)*9, V*3)
    j_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data["f"]).astype(np.int32)

    extra = np.array(
        [FACE_VERTEX_IDS[k] for k in ("nose", "reye", "leye", "rear", "lear")],
        dtype=np.int32,
    )
    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        joint_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(weights),
        faces=jnp.asarray(faces),
        extra_joint_idxs=jnp.asarray(extra),
    )


def synthetic_body_model(
    num_verts: int = 386, seed: int = 0, num_betas: int = NUM_BETAS
) -> BodyModel:
    """Small closed "capsule person" with SMPL joint topology, for tests/demos.

    Vertices form a closed tube around the kinematic tree so mesh sign tests
    and rasterization are meaningful; skinning weights are a distance softmax
    over the two nearest joints, normalized like real SMPL weights.
    """
    rng = np.random.default_rng(seed)

    # Rest joints: a simplified humanoid skeleton (meters).
    J = np.zeros((NUM_JOINTS, 3), dtype=np.float32)
    J[0] = (0.0, 0.0, 0.0)  # pelvis
    J[1] = (0.07, -0.08, 0.0)  # L hip
    J[2] = (-0.07, -0.08, 0.0)  # R hip
    J[3] = (0.0, 0.11, 0.0)  # spine1
    J[4] = (0.10, -0.48, 0.0)  # L knee
    J[5] = (-0.10, -0.48, 0.0)  # R knee
    J[6] = (0.0, 0.25, 0.0)  # spine2
    J[7] = (0.09, -0.88, 0.0)  # L ankle
    J[8] = (-0.09, -0.88, 0.0)  # R ankle
    J[9] = (0.0, 0.31, 0.0)  # spine3
    J[10] = (0.11, -0.95, 0.10)  # L foot
    J[11] = (-0.11, -0.95, 0.10)  # R foot
    J[12] = (0.0, 0.46, 0.0)  # neck
    J[13] = (0.08, 0.38, 0.0)  # L collar
    J[14] = (-0.08, 0.38, 0.0)  # R collar
    J[15] = (0.0, 0.56, 0.0)  # head
    J[16] = (0.17, 0.40, 0.0)  # L shoulder
    J[17] = (-0.17, 0.40, 0.0)  # R shoulder
    J[18] = (0.43, 0.40, 0.0)  # L elbow
    J[19] = (-0.43, 0.40, 0.0)  # R elbow
    J[20] = (0.68, 0.40, 0.0)  # L wrist
    J[21] = (-0.68, 0.40, 0.0)  # R wrist
    J[22] = (0.76, 0.40, 0.0)  # L hand
    J[23] = (-0.76, 0.40, 0.0)  # R hand

    # Closed tube: rings of 8 verts swept along torso+limb paths. We build one
    # capped cylinder along the torso (pelvis->head) — enough structure for
    # skinning/mesh tests while keeping the mesh closed and simple.
    n_ring, n_seg = 8, (num_verts - 2) // (8)
    ys = np.linspace(-1.0, 0.62, n_seg)
    radius = 0.22
    verts, faces = [], []
    for i, y in enumerate(ys):
        for k in range(n_ring):
            a = 2 * np.pi * k / n_ring
            r = radius * (0.9 + 0.2 * np.sin(i * 1.7))
            verts.append((r * np.cos(a), y, r * np.sin(a)))
    for i in range(n_seg - 1):
        for k in range(n_ring):
            a0, a1 = i * n_ring + k, i * n_ring + (k + 1) % n_ring
            b0, b1 = a0 + n_ring, a1 + n_ring
            faces.append((a0, b0, a1))
            faces.append((a1, b0, b1))
    bot = len(verts)
    verts.append((0.0, ys[0] - 0.05, 0.0))
    top = len(verts)
    verts.append((0.0, ys[-1] + 0.05, 0.0))
    for k in range(n_ring):
        faces.append((k, (k + 1) % n_ring, bot))
        base = (n_seg - 1) * n_ring
        faces.append((base + (k + 1) % n_ring, base + k, top))

    v_template = np.array(verts, dtype=np.float32)
    faces = np.array(faces, dtype=np.int32)
    V = v_template.shape[0]

    # Skinning weights: softmax over negative distances to nearest joints.
    d = np.linalg.norm(v_template[:, None, :] - J[None, :, :], axis=-1)
    w = np.exp(-d / 0.08)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # Joint regressor: each joint regressed from its 4 nearest verts.
    j_regressor = np.zeros((NUM_JOINTS, V), dtype=np.float32)
    for j in range(NUM_JOINTS):
        idx = np.argsort(d[:, j])[:4]
        j_regressor[j, idx] = 0.25

    shapedirs = (rng.standard_normal((V, 3, num_betas)) * 0.01).astype(np.float32)
    posedirs = (rng.standard_normal(((NUM_JOINTS - 1) * 9, V * 3)) * 1e-4).astype(
        np.float32
    )
    extra = rng.integers(0, V, size=5).astype(np.int32)

    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        joint_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        faces=jnp.asarray(faces),
        extra_joint_idxs=jnp.asarray(extra),
    )
