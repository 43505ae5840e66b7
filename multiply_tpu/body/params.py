"""Per-frame optimizable SMPL parameter tables.

Parity target: code/lib/model/body_model_params.py — embedding tables over
frame index for betas / global_orient / transl / body_pose, with per-group
trainability switches. Here the table is a plain param pytree; trainability is
realized by optax masking at the optimizer level instead of requires_grad.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class BodyParamTable(NamedTuple):
    """One person's frame-indexed SMPL params. Stack across persons for P>1."""

    betas: jnp.ndarray  # (1, 10) — shared across frames like the reference
    global_orient: jnp.ndarray  # (F, 3)
    transl: jnp.ndarray  # (F, 3)
    body_pose: jnp.ndarray  # (F, 69)

    @staticmethod
    def create(num_frames: int, betas=None, global_orient=None, transl=None, body_pose=None) -> "BodyParamTable":
        def arr(x, shape):
            if x is None:
                return jnp.zeros(shape, jnp.float32)
            x = jnp.asarray(np.asarray(x), jnp.float32)
            return x.reshape(shape)

        return BodyParamTable(
            betas=arr(betas, (1, 10)),
            global_orient=arr(global_orient, (num_frames, 3)),
            transl=arr(transl, (num_frames, 3)),
            body_pose=arr(body_pose, (num_frames, 69)),
        )

    def lookup(self, frame_idx) -> dict:
        """Fetch one frame's params (jit-safe gather)."""
        return {
            "betas": self.betas[0],
            "global_orient": self.global_orient[frame_idx],
            "transl": self.transl[frame_idx],
            "body_pose": self.body_pose[frame_idx],
        }

    def thetas(self, frame_idx) -> jnp.ndarray:
        """Full 72-d pose for a frame (global orient + body pose)."""
        return jnp.concatenate(
            [self.global_orient[frame_idx], self.body_pose[frame_idx]], axis=-1
        )
