"""End-to-end process-parity driver: the ACTUAL reference PyTorch process
(lib/model/multiply.py Multiply + loss.py Loss + the training_step
orchestration of multiply_model.py:131-227) vs our JAX training step, on one
identical synthetic 2-person scene with identical initial weights.

Both sides consume the same synthetic MPI-format SMPL pickle
(body/synthetic_pickle.py, 6890 verts), the same camera, the same ray
batches, and the reference's exact initial network weights (ported
ref->ours, extending the per-module goldens of test_reference_parity.py to
the full system). CUDA-only deps are replaced by functional CPU math
(ref_process/stubs.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference/code"
_THIS_DIR = os.path.dirname(os.path.abspath(__file__))

# config shared by both sides: tiny-but-representative nets (geometric init,
# skips, PE, weight norm) and the reference's hardcoded 32 bg sphere samples
DIMS = [64, 64, 64, 64]
SKIP = [2]
FEAT = 32
DIM_FRAME = 32  # reference RenderingNet hardcodes +32 for nerf_frame_encoding
SAMPLER = dict(
    near=0.0, N_samples=16, N_samples_eval=32, N_samples_extra=8,
    eps=0.1, beta_iters=5, max_total_iters=3, add_tiny=1e-6,
    N_samples_inverse_sphere=32,
)
LOSS_W = dict(
    eikonal_weight=0.1, bce_weight=5e-3, opacity_sparse_weight=3e-3,
    in_shape_weight=1e-2, sam_mask_weight=1e-1, sam_start_epoch=0,
    smpl_surface_weight=0.0, smpl_surface_milestone=800,
    zero_pose_weight=0.0, temporal_loss_weight=1.0, increase_sam=False,
)
LR = 5e-4


class Opt(dict):
    """Attribute-style config shim for the reference modules."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def ref_model_opt(num_frames: int) -> Opt:
    return Opt(
        use_person_encoder=False,
        with_bkgd=True,
        use_smpl_deformer=True,
        smpl_init=False,
        num_training_frames=num_frames,
        dim_frame_encoding=DIM_FRAME,
        implicit_network=Opt(
            d_in=3, d_out=1, dims=list(DIMS), feature_vector_size=FEAT,
            skip_in=list(SKIP), multires=6, cond="smpl", init="geometry",
            bias=0.6, weight_norm=True, embedder_mode="fourier",
        ),
        rendering_network=Opt(
            mode="pose_no_view", d_in=14, d_out=3, dims=[64, 64],
            feature_vector_size=FEAT, multires_view=-1, weight_norm=True,
        ),
        bg_implicit_network=Opt(
            d_in=4, d_out=1, dims=list(DIMS), feature_vector_size=FEAT,
            skip_in=[], multires=10, cond="frame", init="none", bias=0.0,
            weight_norm=False, embedder_mode="fourier",
        ),
        bg_rendering_network=Opt(
            mode="nerf_frame_encoding", d_in=3, d_out=3, dims=[32],
            feature_vector_size=FEAT, multires_view=4, weight_norm=False,
        ),
        density=Opt(params_init=Opt(beta=0.1), beta_min=1e-4),
        ray_sampler=Opt(**SAMPLER),
        loss=Opt(**LOSS_W),
    )


def our_conf(num_frames: int):
    from multiply_tpu.config import Config

    return Config(
        {
            "dim_frame_encoding": DIM_FRAME,
            "implicit_network": {
                "feature_vector_size": FEAT, "d_in": 3, "d_out": 1,
                "dims": list(DIMS), "init": "geometry", "bias": 0.6,
                "skip_in": list(SKIP), "weight_norm": True, "multires": 6,
                "cond": "smpl", "scene_bounding_sphere": 3.0,
            },
            "rendering_network": {
                "feature_vector_size": FEAT, "mode": "pose_no_view",
                "d_in": 14, "d_out": 3, "dims": [64, 64],
                "weight_norm": True, "multires_view": -1,
            },
            "bg_implicit_network": {
                "feature_vector_size": FEAT, "d_in": 4, "d_out": 1,
                "dims": list(DIMS), "init": "none", "bias": 0.0,
                "skip_in": [], "weight_norm": False, "multires": 10,
                "cond": "frame",
            },
            "bg_rendering_network": {
                "feature_vector_size": FEAT, "mode": "nerf_frame_encoding",
                "d_in": 3, "d_out": 3, "dims": [32], "weight_norm": False,
                "multires_view": 4,
            },
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {**SAMPLER},
            "sampler_bf16": False,
            "loss": {"smpl_surface_weight": 0.0},
        }
    )


# ---------------------------------------------------------------------------
# scene assets
# ---------------------------------------------------------------------------


def build_assets(workdir: str, num_frames: int = 2, num_persons: int = 2,
                 height: int = 32, width: int = 40, num_verts: int = 6890):
    """Synthetic SMPL pickles + betas/gender files + a rendered scene."""
    from multiply_tpu.body.smpl import load_smpl_model
    from multiply_tpu.body.synthetic_pickle import write_synthetic_smpl_dir
    from multiply_tpu.data.synthetic import make_scene

    smpl_dir = os.path.join(workdir, "smpl_model")
    write_synthetic_smpl_dir(smpl_dir, num_verts=num_verts, seed=0)
    model = load_smpl_model(smpl_dir, gender="male")

    scene = make_scene(
        num_frames=num_frames, num_persons=num_persons,
        height=height, width=width, model=model,
    )
    betas_path = os.path.join(workdir, "mean_shape.npy")
    np.save(betas_path, scene.betas)
    np.save(os.path.join(workdir, "gender.npy"), np.array(["male"] * num_persons))
    return scene, model, smpl_dir, betas_path


def pick_rays(scene, frame: int, n_rays: int, seed: int = 0) -> dict:
    """Rays guaranteed to intersect BOTH persons' enlarged boxes, so the
    reference's per-person ray subsetting (multiply.py:257-266) selects every
    ray and both composites integrate identical sample sets."""
    from multiply_tpu.data.synthetic import sample_rays

    rng = np.random.default_rng(seed)
    # oversample, then keep rays whose pixel lies inside the intersection of
    # the persons' mask bounding boxes (a conservative proxy for box hits)
    boxes = []
    H, W = scene.height, scene.width
    for p in range(scene.masks.shape[-1]):
        ys, xs = np.nonzero(scene.masks[frame][..., p])
        boxes.append((xs.min(), xs.max(), ys.min(), ys.max()))
    x0 = max(b[0] for b in boxes)
    x1 = min(b[1] for b in boxes)
    y0 = max(b[2] for b in boxes)
    y1 = min(b[3] for b in boxes)
    if x1 <= x0 or y1 <= y0:  # disjoint persons: fall back to union sampling
        return sample_rays(scene, frame, n_rays, rng)
    px = rng.integers(x0, x1 + 1, n_rays)
    py = rng.integers(y0, y1 + 1, n_rays)
    uv = np.stack([px, py], axis=-1).astype(np.float32)
    return {
        "uv": uv,
        "rgb": scene.images[frame][py, px],
        "sam": scene.sam_logits[frame][py, px],
    }


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------


def build_reference(workdir: str, scene, smpl_dir: str, betas_path: str,
                    num_frames: int):
    """Instantiate the reference Multiply + Loss with functional stubs."""
    import torch

    sys.path.insert(0, _THIS_DIR)
    import stubs

    stubs.install(smpl_model_dir=smpl_dir, base_dir=workdir)
    if REF not in sys.path:
        # bind the REPO's train.py in sys.modules first: REF also has a
        # top-level train.py, and tests that later do `from train import
        # build_servers` (test_trainer etc.) must keep getting ours
        import train  # noqa: F401

        sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    from lib.model.loss import Loss
    from lib.model.multiply import Multiply

    opt = ref_model_opt(num_frames)
    torch.manual_seed(0)
    model = Multiply(opt, betas_path)
    loss = Loss(opt.loss)

    # optimizable body params, mirroring body_model_params.py (betas shared
    # across frames; transl/global_orient/body_pose per frame)
    body = []
    for p in range(scene.betas.shape[0]):
        body.append(
            {
                "transl": torch.nn.Parameter(torch.tensor(scene.transl[:, p])),
                "global_orient": torch.nn.Parameter(
                    torch.tensor(scene.poses[:, p, :3])
                ),
                "body_pose": torch.nn.Parameter(torch.tensor(scene.poses[:, p, 3:])),
                "betas": torch.nn.Parameter(torch.tensor(scene.betas[p][None])),
            }
        )
    body_leaves = [v for d in body for v in d.values()]
    optimizer = torch.optim.Adam(
        [
            {"params": list(model.parameters()), "lr": LR},
            {"params": body_leaves, "lr": LR * 0.1},
        ],
        lr=LR,
        eps=1e-8,
    )
    return model, loss, body, optimizer


def ref_inputs(scene, frame: int, rays: dict, epoch: int, body):
    """The `inputs`/`targets` pair training_step assembles
    (multiply_model.py:163-193 + the dataset's camera fields)."""
    import torch

    P = len(body)
    transl = torch.stack([body[p]["transl"][frame] for p in range(P)])[None]
    go = torch.stack([body[p]["global_orient"][frame] for p in range(P)])[None]
    bp = torch.stack([body[p]["body_pose"][frame] for p in range(P)])[None]
    betas = torch.stack([body[p]["betas"][0] for p in range(P)])[None]
    pose72 = torch.cat([go, bp], dim=2)

    smpl_params = torch.zeros(1, P, 86)
    smpl_params[:, :, 0] = 1.0  # scale

    inputs = {
        "uv": torch.tensor(rays["uv"])[None],
        "intrinsics": torch.tensor(scene.intrinsics)[None],
        "pose": torch.tensor(scene.cam_pose[frame])[None],
        "smpl_params": smpl_params,
        "smpl_pose": pose72,
        "smpl_shape": betas,
        "smpl_trans": transl,
        "current_epoch": epoch,
        "idx": torch.tensor([frame]),
        "index_outside": torch.zeros(1, 0, dtype=torch.long),
        "sam_mask": torch.tensor(rays["sam"])[None],
    }
    targets = {"rgb": torch.tensor(rays["rgb"])[None]}
    return inputs, targets


def ref_train_step(model, loss, body, optimizer, scene, frame, rays, epoch):
    """One joint-mode training step (multiply_model.py:131-227, the
    `else: cur_opt = opt_joint` branch; pose-depth windows and delayed-pose
    are exercised by their own tests)."""
    import torch

    model.train()
    inputs, targets = ref_inputs(scene, frame, rays, epoch, body)
    outputs = model(inputs)
    loss_out = loss(outputs, targets)
    if loss_out["loss"].isnan():
        loss_out["loss"] = torch.zeros((1), requires_grad=True)
    optimizer.zero_grad()
    loss_out["loss"].backward()
    optimizer.step()
    return {k: float(v) for k, v in loss_out.items()}


def ref_eval_forward(model, body, scene, frame, rays, epoch):
    import torch

    model.eval()
    inputs, _ = ref_inputs(scene, frame, rays, epoch, body)
    # no_grad is NOT enough: forward() re-enables grad internally
    # (multiply.py:176 torch.set_grad_enabled(True)) for the normals VJP
    out = model(inputs)
    return {
        "rgb_values": out["rgb_values"].detach().numpy(),
        "normal_values": out["normal_values"].detach().numpy(),
        "acc_map": out["acc_map"].detach().numpy(),
        "acc_person": out["acc_person_list"].detach().numpy(),
    }


# ---------------------------------------------------------------------------
# weight port: reference torch modules -> our flax tree
# ---------------------------------------------------------------------------


def _materialize(lin):
    import torch

    if hasattr(lin, "weight_v"):
        torch.nn.utils.remove_weight_norm(lin)
    return lin.weight.detach().numpy(), lin.bias.detach().numpy()


def _port_mlp(ref_net, tree, layer_names):
    """Copy lin{i} weights into a flax param dict (kernel/bias/g leaves)."""
    import jax.numpy as jnp

    out = dict(tree)
    for name in layer_names:
        w, b = _materialize(getattr(ref_net, name))
        leaf = dict(out[name])
        kernel = jnp.asarray(w.T)
        assert leaf["kernel"].shape == kernel.shape, (
            name, leaf["kernel"].shape, kernel.shape,
        )
        leaf["kernel"] = kernel
        leaf["bias"] = jnp.asarray(b)
        if "g" in leaf:
            leaf["g"] = jnp.linalg.norm(kernel, axis=0)
        out[name] = leaf
    return out


def port_ref_weights(ref_model, our_net_params, num_persons: int):
    """Reference Multiply state -> our renderer param tree (same math as
    test_reference_parity's per-module ports, applied to the whole system)."""
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, our_net_params)

    n_imp = len(DIMS) + 1  # lin0..lin{n-1}
    imp_layers = [f"lin{i}" for i in range(n_imp)]
    ren_layers = [f"lin{i}" for i in range(3)]  # dims [64,64] -> 3 layers

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    def destack(tree, p):
        """Drop the leading person axis the vmapped init gave each leaf."""
        return jax.tree.map(lambda x: x[p], tree)

    per_person_imp = []
    per_person_ren = []
    for p in range(num_persons):
        per_person_imp.append(
            _port_mlp(
                ref_model.foreground_implicit_network_list[p],
                destack(params["fg_implicit"]["params"], p),
                imp_layers,
            )
        )
        ren_net = ref_model.foreground_rendering_network_list[p]
        ren_tree = _port_mlp(
            ren_net, destack(params["fg_render"]["params"], p), ren_layers
        )
        wp = ren_net.lin_pose.weight.detach().numpy()
        bp = ren_net.lin_pose.bias.detach().numpy()
        ren_tree["lin_pose"] = {
            "kernel": jnp.asarray(wp.T), "bias": jnp.asarray(bp),
        }
        per_person_ren.append(ren_tree)

    params["fg_implicit"] = {"params": stack(per_person_imp)}
    params["fg_render"] = {"params": stack(per_person_ren)}

    params["bg_implicit"] = {
        "params": _port_mlp(
            ref_model.bg_implicit_network,
            params["bg_implicit"]["params"],
            imp_layers,
        )
    }
    n_bg_ren = 2  # dims [32] -> 2 layers
    params["bg_render"] = {
        "params": _port_mlp(
            ref_model.bg_rendering_network,
            params["bg_render"]["params"],
            [f"lin{i}" for i in range(n_bg_ren)],
        )
    }
    params["frame_latent"] = jnp.asarray(
        ref_model.frame_latent_encoder.weight.detach().numpy()
    )
    params["beta"] = jnp.asarray(
        ref_model.density.beta.detach().numpy().reshape(-1)
    )
    return params
