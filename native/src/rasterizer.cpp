// Scanline z-buffer triangle rasterizer (depth maps + face-id maps).
//
// Host-side replacement for the reference's PyTorch3D depth rasterization in
// the epoch-end instance-mask stage (reference: code/lib/model/render.py:135
// render_multiple_depth_map; code/multiply_model.py:741-939 get_instance_mask)
// — that path renders every frame x person at image resolution and needs no
// gradients, so a tight C++ scanline loop beats shipping 0.5M-pixel x 50k-face
// brute force through XLA. The differentiable losses use the JAX ray-mesh
// intersector instead (multiply_tpu/ops/mesh_ops.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// verts: (V,3) — x,y in pixel coordinates, z = camera depth (>0 in front).
// faces: (F,3). Writes depth (H*W, inf init) and face_id (H*W, -1 init).
void rasterize_depth(const float* verts, int64_t nv, const int64_t* faces,
                     int64_t nf, int width, int height, float* depth,
                     int32_t* face_id) {
  const float INF = std::numeric_limits<float>::infinity();
  for (int64_t i = 0; i < (int64_t)width * height; ++i) {
    depth[i] = INF;
    if (face_id) face_id[i] = -1;
  }

  for (int64_t f = 0; f < nf; ++f) {
    const float* a = verts + 3 * faces[3 * f];
    const float* b = verts + 3 * faces[3 * f + 1];
    const float* c = verts + 3 * faces[3 * f + 2];
    // backface/behind-camera culling: keep faces with any vertex in front
    if (a[2] <= 0 && b[2] <= 0 && c[2] <= 0) continue;

    int x0 = (int)std::floor(std::min({a[0], b[0], c[0]}));
    int x1 = (int)std::ceil(std::max({a[0], b[0], c[0]}));
    int y0 = (int)std::floor(std::min({a[1], b[1], c[1]}));
    int y1 = (int)std::ceil(std::max({a[1], b[1], c[1]}));
    x0 = std::max(x0, 0);
    y0 = std::max(y0, 0);
    x1 = std::min(x1, width - 1);
    y1 = std::min(y1, height - 1);
    if (x0 > x1 || y0 > y1) continue;

    float d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1]);
    if (std::fabs(d) < 1e-12f) continue;
    float inv_d = 1.0f / d;

    for (int y = y0; y <= y1; ++y) {
      for (int x = x0; x <= x1; ++x) {
        float px = (float)x + 0.5f, py = (float)y + 0.5f;
        float w0 = ((b[1] - c[1]) * (px - c[0]) + (c[0] - b[0]) * (py - c[1])) * inv_d;
        float w1 = ((c[1] - a[1]) * (px - c[0]) + (a[0] - c[0]) * (py - c[1])) * inv_d;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        float z = w0 * a[2] + w1 * b[2] + w2 * c[2];
        if (z <= 0) continue;
        int64_t idx = (int64_t)y * width + x;
        if (z < depth[idx]) {
          depth[idx] = z;
          if (face_id) face_id[idx] = (int32_t)f;
        }
      }
    }
  }
}

// Binary coverage mask via the same loop (any z>0 hit).
void rasterize_mask(const float* verts, int64_t nv, const int64_t* faces,
                    int64_t nf, int width, int height, uint8_t* mask) {
  std::vector<float> depth((size_t)width * height);
  rasterize_depth(verts, nv, faces, nf, width, height, depth.data(), nullptr);
  for (int64_t i = 0; i < (int64_t)width * height; ++i)
    mask[i] = std::isfinite(depth[i]) ? 1 : 0;
}

}  // extern "C"
