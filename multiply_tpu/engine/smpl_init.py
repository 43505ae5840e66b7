"""Pretrain the canonical SDF network to the SMPL body shape.

The reference ships a downloaded initialization (`smpl_init_male_256.pth`,
loaded at code/lib/model/multiply.py:102-108) that makes the implicit field
start as the canonical SMPL body instead of a sphere. We pretrain our own:
fit ImplicitNet (zero pose conditioning) to the exact signed distance of the
canonical SMPL mesh — surface samples + gaussian-perturbed + uniform box
samples, L1 on SDF + eikonal regularization. Runs in minutes on a TPU chip
and the result is cached to disk and shared across sequences/persons of the
same gender, mirroring the reference's reuse of one init file.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..body.server import SMPLServer
from ..models.networks import ImplicitNet
from ..ops.mesh_ops import signed_distance


def sample_training_points(
    server: SMPLServer, n: int, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """(points, gt_sdf): 40% near-surface, 40% medium noise, 20% uniform box."""
    verts = np.asarray(server.verts_c)
    faces = np.asarray(server.model.faces)
    lo, hi = verts.min(0) - 0.5, verts.max(0) + 0.5

    n_near, n_med = int(n * 0.4), int(n * 0.4)
    idx = rng.integers(0, len(verts), n_near + n_med)
    pts = verts[idx].copy()
    pts[:n_near] += rng.normal(0, 0.01, (n_near, 3))
    pts[n_near:] += rng.normal(0, 0.1, (n_med, 3))
    uni = rng.uniform(lo, hi, (n - n_near - n_med, 3))
    pts = np.concatenate([pts, uni]).astype(np.float32)

    gt = np.asarray(
        signed_distance(jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(faces))
    )
    return pts, gt


def pretrain_smpl_init(
    net: ImplicitNet,
    server: SMPLServer,
    steps: int = 2000,
    batch: int = 4096,
    lr: float = 1e-4,
    eikonal_weight: float = 0.1,
    seed: int = 0,
    pool: int = 200_000,
    verbose: bool = False,
):
    """Returns pretrained params for `net` (cond zeroed during fitting)."""
    import optax

    rng = np.random.default_rng(seed)
    pts_pool, sdf_pool = sample_training_points(server, pool, rng)

    cond_dim = {"smpl": 69, "frame": 32, "smpl_id": 133, "none": 0}[net.cond]
    cond = jnp.zeros((cond_dim,)) if cond_dim else None
    params = net.init(jax.random.PRNGKey(seed), jnp.zeros((2, 3)), cond)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, pts, gt, key):
        def loss_fn(p):
            pred = net.apply(p, pts, cond)[:, 0]
            l1 = jnp.mean(jnp.abs(pred - gt))

            def sdf_sum(x):
                return jnp.sum(net.apply(p, x, cond)[:, 0])

            g = jax.grad(sdf_sum)(pts + jax.random.normal(key, pts.shape) * 0.01)
            eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
            return l1 + eikonal_weight * eik, (l1, eik)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    key = jax.random.PRNGKey(seed + 1)
    for it in range(steps):
        sel = rng.integers(0, pool, batch)
        key, k = jax.random.split(key)
        params, opt_state, loss, aux = step(
            params, opt_state, jnp.asarray(pts_pool[sel]), jnp.asarray(sdf_pool[sel]), k
        )
        if verbose and it % 200 == 0:
            print(f"smpl_init step {it}: loss={float(loss):.4f} l1={float(aux[0]):.4f}")
    return params


def save_init(path: str, params) -> None:
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_init(path: str) -> dict:
    data = np.load(path)
    out: dict = {}
    for key in data.files:
        parts = key.split("/")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = jnp.asarray(data[key])
    return out


def get_or_pretrain(
    net: ImplicitNet, server: SMPLServer, cache_path: str, **kwargs
):
    if os.path.exists(cache_path):
        return load_init(cache_path)
    params = pretrain_smpl_init(net, server, **kwargs)
    save_init(cache_path, params)
    return params
