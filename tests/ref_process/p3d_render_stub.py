"""Functional CPU stand-ins for the pytorch3d renderer surface that the
reference's lib/model/render.py:1-214 consumes, so multiply_model.py's
pose-opt losses (get_depth_order_loss :578-736, get_interpenetration_loss
:521-551) can run as an actual process on this box.

Semantics reproduced:

  * PerspectiveCameras (in_ndc=False): camera coords X_cam = X @ R + T
    (row-vector convention), screen projection u = px - fx*x/z,
    v = py - fy*y/z (pytorch3d's +X-left/+Y-up camera to +u-right/+v-down
    screen), pixel (i, j) center at (j + 0.5, i + 0.5).
  * MeshRasterizer -> Fragments.zbuf: nearest-face view-space z per pixel,
    screen-space barycentric interpolation (perspective_correct=False
    default), -1 where uncovered. Face selection and barycentrics are
    found under no_grad, then z is recomputed differentiably from the
    projected vertices of the selected face — gradients flow to vertex
    x/y/z like pytorch3d's rasterizer backward.
  * MeshRenderer(SoftPhongShader + AmbientLights) softmax blending
    (pytorch3d blending.softmax_rgb_blend): prob = sigmoid(-dist2/sigma)
    with signed squared NDC pixel-to-face distance, depth weights
    exp((zinv - zinv_max)/gamma) against a background weight, ambient-only
    shading = interpolated vertex color.

Only what the reference calls is implemented; everything else raises.
"""

from __future__ import annotations

import numpy as np
import torch


class _Cfg:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def PointLights(**kw):
    return _Cfg(**kw)


def AmbientLights(**kw):
    return _Cfg(**kw)


class BlendParams:
    def __init__(self, sigma=1e-4, gamma=1e-4, background_color=(0.0, 0.0, 0.0)):
        self.sigma = sigma
        self.gamma = gamma
        self.background_color = background_color


class RasterizationSettings:
    def __init__(self, image_size=None, faces_per_pixel=1, blur_radius=0.0,
                 max_faces_per_bin=None, **kw):
        self.image_size = image_size if isinstance(image_size, (tuple, list)) \
            else (int(image_size), int(image_size))
        self.faces_per_pixel = faces_per_pixel
        self.blur_radius = float(blur_radius)


class SoftPhongShader(_Cfg):
    def __init__(self, device=None, cameras=None, lights=None):
        super().__init__(device=device, cameras=cameras, lights=lights)


class SoftSilhouetteShader(_Cfg):
    pass


class Textures:
    def __init__(self, verts_rgb=None):
        self.verts_rgb = verts_rgb


class Meshes:
    def __init__(self, verts, faces, textures=None):
        # reference always passes batched (1, V, 3) / (1, F, 3)
        self.verts = verts
        self.faces = faces
        self.textures = textures

    def verts_normals_list(self):  # render_mesh_recon only (no_grad path)
        v, f = self.verts[0], self.faces[0].long()
        fn = torch.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]], dim=-1)
        vn = torch.zeros_like(v)
        for k in range(3):
            vn = vn.index_add(0, f[:, k], fn)
        return [torch.nn.functional.normalize(vn, dim=-1)]


def join_meshes_as_scene(mesh_list):
    vs, fs, cs, off = [], [], [], 0
    for m in mesh_list:
        vs.append(m.verts[0])
        fs.append(m.faces[0].long() + off)
        off += m.verts.shape[1]
        if m.textures is not None and m.textures.verts_rgb is not None:
            cs.append(m.textures.verts_rgb[0])
        else:
            cs.append(torch.ones_like(m.verts[0]))
    return Meshes(
        torch.cat(vs)[None], torch.cat(fs)[None],
        textures=Textures(verts_rgb=torch.cat(cs)[None]),
    )


class PerspectiveCameras:
    def __init__(self, focal_length=None, principal_point=None, R=None, T=None,
                 in_ndc=False, image_size=None, device=None, **kw):
        assert not in_ndc, "reference always builds in_ndc=False cameras"
        self.focal_length = torch.as_tensor(focal_length).float()
        self.principal_point = torch.as_tensor(principal_point).float()
        self.R = torch.as_tensor(R).float()
        self.T = torch.as_tensor(T).float()
        self.image_size = image_size


def _project(cameras: PerspectiveCameras, verts: torch.Tensor):
    """(V, 3) world -> (u, v) screen px + view z. Differentiable."""
    vc = verts @ cameras.R[0] + cameras.T[0]
    z = vc[:, 2]
    zc = torch.clamp(z, min=1e-6)
    u = cameras.principal_point[0, 0] - cameras.focal_length[0, 0] * vc[:, 0] / zc
    v = cameras.principal_point[0, 1] - cameras.focal_length[0, 1] * vc[:, 1] / zc
    return u, v, z


def _edge_fn(xa, ya, xb, yb, px, py):
    """Signed area of (a, b, p) per face/pixel (broadcasts)."""
    return (xb - xa) * (py - ya) - (yb - ya) * (px - xa)


def _rasterize_hard(cameras, raster_settings, verts, faces, face_chunk=2048):
    """Nearest-face index + screen barycentrics per pixel, no_grad.

    Returns (face_idx (H,W) long, -1 empty; bary (H,W,3))."""
    H, W = raster_settings.image_size
    device = verts.device
    with torch.no_grad():
        u, v, z = _project(cameras, verts)
        fu, fv, fz = u[faces], v[faces], z[faces]  # (F, 3)
        py, px = torch.meshgrid(
            torch.arange(H, device=device).float() + 0.5,
            torch.arange(W, device=device).float() + 0.5,
            indexing="ij",
        )
        px = px.reshape(-1)
        py = py.reshape(-1)
        best_z = torch.full((H * W,), float("inf"))
        best_f = torch.full((H * W,), -1, dtype=torch.long)
        best_bary = torch.zeros((H * W, 3))
        F = faces.shape[0]
        for f0 in range(0, F, face_chunk):
            fe = min(F, f0 + face_chunk)
            A = _edge_fn(fu[f0:fe, 1, None], fv[f0:fe, 1, None],
                         fu[f0:fe, 2, None], fv[f0:fe, 2, None], px[None], py[None])
            B = _edge_fn(fu[f0:fe, 2, None], fv[f0:fe, 2, None],
                         fu[f0:fe, 0, None], fv[f0:fe, 0, None], px[None], py[None])
            C = _edge_fn(fu[f0:fe, 0, None], fv[f0:fe, 0, None],
                         fu[f0:fe, 1, None], fv[f0:fe, 1, None], px[None], py[None])
            area = A + B + C  # (Fc, N)
            denom = torch.where(area.abs() < 1e-12, torch.ones_like(area), area)
            w0, w1, w2 = A / denom, B / denom, C / denom
            inside = (
                ((w0 >= 0) & (w1 >= 0) & (w2 >= 0) | (w0 <= 0) & (w1 <= 0) & (w2 <= 0))
                & (area.abs() > 1e-12)
            )
            zi = (w0 * fz[f0:fe, 0, None] + w1 * fz[f0:fe, 1, None]
                  + w2 * fz[f0:fe, 2, None])
            zi = torch.where(inside & (zi > 1e-6), zi, torch.full_like(zi, float("inf")))
            chunk_z, chunk_arg = zi.min(dim=0)  # (N,)
            upd = chunk_z < best_z
            best_z = torch.where(upd, chunk_z, best_z)
            gidx = chunk_arg + f0
            best_f = torch.where(upd, gidx, best_f)
            sel = torch.stack(
                [w0[chunk_arg, torch.arange(len(px))],
                 w1[chunk_arg, torch.arange(len(px))],
                 w2[chunk_arg, torch.arange(len(px))]], dim=-1)
            best_bary = torch.where(upd[:, None], sel, best_bary)
        return best_f.reshape(H, W), best_bary.reshape(H, W, 3)


class Fragments:
    def __init__(self, zbuf):
        self.zbuf = zbuf


class MeshRasterizer:
    def __init__(self, cameras=None, raster_settings=None):
        self.cameras = cameras
        self.raster_settings = raster_settings

    def __call__(self, mesh: Meshes):
        verts, faces = mesh.verts[0], mesh.faces[0].long()
        face_idx, bary = _rasterize_hard(
            self.cameras, self.raster_settings, verts, faces
        )
        # differentiable recompute of z for selected faces: re-derive the
        # barycentrics from the (differentiable) projected vertices so
        # gradients reach vertex x/y as well as z (pytorch3d semantics)
        H, W = face_idx.shape
        cover = face_idx >= 0
        fsel = face_idx.clamp(min=0).reshape(-1)
        u, v, z = _project(self.cameras, verts)
        tri = faces[fsel]  # (N, 3)
        tu, tv, tz = u[tri], v[tri], z[tri]  # (N, 3)
        py, px = torch.meshgrid(
            torch.arange(H).float() + 0.5, torch.arange(W).float() + 0.5,
            indexing="ij",
        )
        px = px.reshape(-1)
        py = py.reshape(-1)
        A = _edge_fn(tu[:, 1], tv[:, 1], tu[:, 2], tv[:, 2], px, py)
        B = _edge_fn(tu[:, 2], tv[:, 2], tu[:, 0], tv[:, 0], px, py)
        C = _edge_fn(tu[:, 0], tv[:, 0], tu[:, 1], tv[:, 1], px, py)
        area = A + B + C
        denom = torch.where(area.abs() < 1e-12, torch.ones_like(area), area)
        zi = (A * tz[:, 0] + B * tz[:, 1] + C * tz[:, 2]) / denom
        zbuf = torch.where(cover.reshape(-1), zi, torch.full_like(zi, -1.0))
        return Fragments(zbuf=zbuf.reshape(1, H, W, 1))


def _point_face_dist2_ndc(cameras, raster_settings, verts, faces, face_idx_k,
                          px, py):
    """Squared screen distance (converted to pytorch3d's NDC units) from each
    pixel to its K candidate faces, negative inside. Differentiable."""
    H, W = raster_settings.image_size
    u, v, _ = _project(cameras, verts)
    # pytorch3d NDC: shorter image side spans [-1, 1] -> px * 2/min(H,W)
    s = 2.0 / min(H, W)
    tri_u, tri_v = u[faces], v[faces]  # (F, 3)
    tu = tri_u[face_idx_k] * s  # (N, K, 3)
    tv = tri_v[face_idx_k] * s
    qx = (px * s)[:, None]
    qy = (py * s)[:, None]
    d2 = torch.full(face_idx_k.shape, float("inf"))
    inside_all = torch.ones(face_idx_k.shape, dtype=torch.bool)
    for e in range(3):
        ax, ay = tu[:, :, e], tv[:, :, e]
        bx, by = tu[:, :, (e + 1) % 3], tv[:, :, (e + 1) % 3]
        ex, ey = bx - ax, by - ay
        qx_, qy_ = qx - ax, qy - ay
        t = ((qx_ * ex + qy_ * ey) / (ex * ex + ey * ey + 1e-12)).clamp(0, 1)
        dx, dy = qx_ - t * ex, qy_ - t * ey
        d2 = torch.minimum(d2, dx * dx + dy * dy)
        inside_all = inside_all & (_edge_fn(ax, ay, bx, by, qx, qy) *
                                   torch.sign(_area_sign(tu, tv)) >= 0)
    return torch.where(inside_all, -d2, d2)


def _area_sign(tu, tv):
    return _edge_fn(tu[:, :, 0], tv[:, :, 0], tu[:, :, 1], tv[:, :, 1],
                    tu[:, :, 2], tv[:, :, 2])


class MeshRenderer:
    """rasterizer + shader -> (1, H, W, 4) RGBA via softmax blending
    (ambient-only shading = interpolated vertex colors)."""

    def __init__(self, rasterizer=None, shader=None):
        self.rasterizer = rasterizer
        self.shader = shader

    def __call__(self, scene: Meshes):
        cams = self.rasterizer.cameras
        rs = self.rasterizer.raster_settings
        H, W = rs.image_size
        verts, faces = scene.verts[0], scene.faces[0].long()
        colors = (scene.textures.verts_rgb[0]
                  if scene.textures and scene.textures.verts_rgb is not None
                  else torch.ones_like(verts))
        K = min(rs.faces_per_pixel, faces.shape[0])
        sigma = 5e-5 if rs.blur_radius > 0 else 1e-9
        gamma = 1e-4

        # K nearest covering/near faces per pixel by z (no_grad selection)
        with torch.no_grad():
            u, v, z = _project(cams, verts)
            fu, fv, fz = u[faces], v[faces], z[faces]
            py, px = torch.meshgrid(
                torch.arange(H).float() + 0.5, torch.arange(W).float() + 0.5,
                indexing="ij",
            )
            px = px.reshape(-1)
            py = py.reshape(-1)
            N = H * W
            s = 2.0 / min(H, W)
            blur_px2 = rs.blur_radius / (s * s)  # NDC^2 -> px^2
            topz = torch.full((N, K), float("inf"))
            topf = torch.full((N, K), -1, dtype=torch.long)
            F = faces.shape[0]
            chunk = 2048
            for f0 in range(0, F, chunk):
                fe = min(F, f0 + chunk)
                A = _edge_fn(fu[f0:fe, 1, None], fv[f0:fe, 1, None],
                             fu[f0:fe, 2, None], fv[f0:fe, 2, None], px[None], py[None])
                B = _edge_fn(fu[f0:fe, 2, None], fv[f0:fe, 2, None],
                             fu[f0:fe, 0, None], fv[f0:fe, 0, None], px[None], py[None])
                C = _edge_fn(fu[f0:fe, 0, None], fv[f0:fe, 0, None],
                             fu[f0:fe, 1, None], fv[f0:fe, 1, None], px[None], py[None])
                area = A + B + C
                denom = torch.where(area.abs() < 1e-12, torch.ones_like(area), area)
                w0, w1, w2 = A / denom, B / denom, C / denom
                inside = (((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) |
                          ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))) & (area.abs() > 1e-12)
                # near-face inclusion within blur radius: cheap bbox distance
                if blur_px2 > 0:
                    bb = _bbox_dist2(fu[f0:fe], fv[f0:fe], px, py)
                    cand = inside | (bb <= blur_px2)
                else:
                    cand = inside
                zi = (w0 * fz[f0:fe, 0, None] + w1 * fz[f0:fe, 1, None]
                      + w2 * fz[f0:fe, 2, None])
                # near-but-outside faces: use min vertex z as tiebreak depth
                zmin = fz[f0:fe].min(dim=1).values[:, None].expand_as(zi)
                zi = torch.where(inside, zi, zmin)
                zi = torch.where(cand & (zi > 1e-6), zi,
                                 torch.full_like(zi, float("inf")))
                allz = torch.cat([topz, zi.t()], dim=1)
                allf = torch.cat(
                    [topf, (torch.arange(f0, fe)[None].expand(N, fe - f0))],
                    dim=1,
                )
                topz, sel = torch.topk(allz, K, dim=1, largest=False)
                topf = torch.gather(allf, 1, sel)
            valid_k = torch.isfinite(topz)
            topf_safe = topf.clamp(min=0)

        # differentiable blend over the selected K faces
        d2 = _point_face_dist2_ndc(cams, rs, verts, faces, topf_safe, px, py)
        prob = torch.sigmoid(-d2 / sigma) * valid_k.float()
        u, v, z = _project(cams, verts)
        tri = faces[topf_safe.reshape(-1)]
        tu = u[tri].reshape(N, K, 3)
        tv = v[tri].reshape(N, K, 3)
        tz = z[tri].reshape(N, K, 3)
        A = _edge_fn(tu[..., 1], tv[..., 1], tu[..., 2], tv[..., 2],
                     px[:, None], py[:, None])
        B = _edge_fn(tu[..., 2], tv[..., 2], tu[..., 0], tv[..., 0],
                     px[:, None], py[:, None])
        C = _edge_fn(tu[..., 0], tv[..., 0], tu[..., 1], tv[..., 1],
                     px[:, None], py[:, None])
        area = A + B + C
        denom = torch.where(area.abs() < 1e-12, torch.ones_like(area), area)
        w0, w1, w2 = (A / denom).clamp(0, 1), (B / denom).clamp(0, 1), (C / denom).clamp(0, 1)
        wsum = (w0 + w1 + w2).clamp(min=1e-12)
        w0, w1, w2 = w0 / wsum, w1 / wsum, w2 / wsum
        zk = w0 * tz[..., 0] + w1 * tz[..., 1] + w2 * tz[..., 2]
        tcol = colors[tri].reshape(N, K, 3, 3)
        ck = (w0[..., None] * tcol[:, :, 0] + w1[..., None] * tcol[:, :, 1]
              + w2[..., None] * tcol[:, :, 2])  # (N, K, 3)

        znear, zfar = 1.0, 100.0
        zinv = (zfar - zk) / (zfar - znear) * valid_k.float()
        zmax = zinv.max(dim=1, keepdim=True).values.clamp(min=1e-3)
        wk = prob * torch.exp((zinv - zmax) / gamma)
        wbg = torch.exp((torch.zeros_like(zmax) - zmax) / gamma)[:, 0]
        denom_w = wk.sum(dim=1) + wbg + 1e-10
        rgb = (wk[..., None] * ck).sum(dim=1) / denom_w[:, None]
        alpha = 1.0 - torch.exp(torch.log1p(-prob.clamp(max=1 - 1e-6)).sum(dim=1))
        img = torch.cat([rgb, alpha[:, None]], dim=-1).reshape(1, H, W, 4)
        return img


def _bbox_dist2(fu, fv, px, py):
    """Squared px distance from pixels to each face's screen bbox (lower
    bound on true distance — cheap candidate gate). (F, N)."""
    uax, ubx = fu.min(dim=1).values[:, None], fu.max(dim=1).values[:, None]
    vay, vby = fv.min(dim=1).values[:, None], fv.max(dim=1).values[:, None]
    dx = torch.clamp(torch.maximum(uax - px[None], px[None] - ubx), min=0)
    dy = torch.clamp(torch.maximum(vay - py[None], py[None] - vby), min=0)
    return dx * dx + dy * dy


def install():
    """Register pytorch3d.renderer / .structures (+ pl, segment_anything)
    stub modules. Call AFTER stubs.install() (extends its pytorch3d stub)."""
    import sys
    import types

    p3d = sys.modules.get("pytorch3d") or types.ModuleType("pytorch3d")
    renderer = types.ModuleType("pytorch3d.renderer")
    for name in ("PerspectiveCameras", "RasterizationSettings", "MeshRenderer",
                 "MeshRasterizer", "SoftPhongShader", "PointLights",
                 "BlendParams", "SoftSilhouetteShader", "AmbientLights",
                 "Textures"):
        setattr(renderer, name, globals()[name])
    renderer.SfMPerspectiveCameras = PerspectiveCameras
    renderer_mesh = types.ModuleType("pytorch3d.renderer.mesh")
    renderer_mesh.Textures = Textures
    structures = types.ModuleType("pytorch3d.structures")
    structures.Meshes = Meshes
    structures_meshes = types.ModuleType("pytorch3d.structures.meshes")
    structures_meshes.join_meshes_as_scene = join_meshes_as_scene
    structures.join_meshes_as_scene = join_meshes_as_scene
    p3d.renderer = renderer
    p3d.structures = structures
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.renderer"] = renderer
    sys.modules["pytorch3d.renderer.mesh"] = renderer_mesh
    sys.modules["pytorch3d.structures"] = structures
    sys.modules["pytorch3d.structures.meshes"] = structures_meshes

    # pytorch_lightning: just enough to subclass
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            pass

        pl.LightningModule = LightningModule
        core = types.ModuleType("pytorch_lightning.core")
        core_opt = types.ModuleType("pytorch_lightning.core.optimizer")

        class LightningOptimizer:
            pass

        core_opt.LightningOptimizer = LightningOptimizer
        core.optimizer = core_opt
        pl.core = core
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.core"] = core
        sys.modules["pytorch_lightning.core.optimizer"] = core_opt

    if "segment_anything" not in sys.modules:
        sa = types.ModuleType("segment_anything")
        sa.sam_model_registry = {}
        sa.SamPredictor = object
        sa.SamAutomaticMaskGenerator = object
        sys.modules["segment_anything"] = sa

    # lib.utils.mesh needs skimage+libmise; the pose-opt tests monkeypatch
    # generate_mesh anyway, so pre-register a placeholder module
    if "lib.utils.mesh" not in sys.modules:
        lum = types.ModuleType("lib.utils.mesh")

        def generate_mesh(*a, **k):
            raise RuntimeError(
                "generate_mesh placeholder — monkeypatch multiply_model."
                "generate_mesh with a fixture mesh in the test"
            )

        lum.generate_mesh = generate_mesh
        sys.modules["lib.utils.mesh"] = lum
