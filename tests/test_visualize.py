"""Mesh-over-image visualization (ait_viewer equivalent)."""

import numpy as np

from multiply_tpu.engine.visualize import export_visualization, shade_mesh_over_image
from test_mesh_ops import icosphere


def make_proj(H=40, W=52, f=60.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    Rt = np.eye(4)[:3]
    Rt[:3, 3] = [0, 0, 4.0]
    P = np.eye(4)
    P[:3, :4] = K @ Rt
    return P


def test_shade_mesh_over_image_coverage_and_tint():
    verts, faces = icosphere(1)
    H, W = 40, 52
    img = np.full((H, W, 3), 0.9, np.float32)
    out = shade_mesh_over_image(img, [(verts, faces)], make_proj(H, W))
    assert out.shape == (H, W, 3)
    changed = np.abs(out - img).sum(-1) > 0.05
    # the sphere covers a central blob, not everything
    assert 0.05 < changed.mean() < 0.9
    # person-0 tint is reddish where covered
    reds = out[changed]
    assert reds[:, 0].mean() > reds[:, 2].mean()


def test_export_visualization_writes_pngs_and_gif(tmp_path):
    verts, faces = icosphere(0)
    H, W = 32, 40
    imgs = [np.full((H, W, 3), 0.8, np.float32)] * 2
    meshes = [[(verts, faces)]] * 2
    Ps = [make_proj(H, W)] * 2
    export_visualization(str(tmp_path), imgs, meshes, Ps)
    import os

    assert os.path.exists(tmp_path / "0000.png")
    assert os.path.exists(tmp_path / "0001.png")
    assert os.path.exists(tmp_path / "sequence.gif")
