// Isosurface triangulation by marching tetrahedra.
//
// Fills the role of skimage.measure.marching_cubes_lewiner in the reference
// mesh-extraction path (reference: code/lib/utils/mesh.py:110-118) without a
// skimage dependency. Each grid cube splits into 6 tetrahedra; each tet emits
// 0-2 triangles by edge interpolation. Vertices are deduplicated through an
// edge hash so the output is a watertight, indexed mesh.

#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct MarchOut {
  std::vector<float> verts;   // xyz triplets (grid coordinates)
  std::vector<int64_t> faces;  // index triplets
};

// Kuhn (path) subdivision of the cube into 6 tetrahedra {0, a, b, 7} along
// the monotone paths 0->7 (corner ids 0..7 with bit order x<<2 | y<<1 | z).
// Unlike arbitrary 6-tet splits this one cuts every cube face along the same
// diagonal as the neighboring cube, so the global triangulation is conforming
// and the extracted surface watertight.
static const int TETS[6][4] = {
    {0, 4, 6, 7}, {0, 4, 7, 5}, {0, 2, 7, 6},
    {0, 2, 3, 7}, {0, 1, 5, 7}, {0, 1, 7, 3},
};

inline void corner_coord(int c, int64_t x, int64_t y, int64_t z, int64_t out[3]) {
  out[0] = x + ((c >> 2) & 1);
  out[1] = y + ((c >> 1) & 1);
  out[2] = z + (c & 1);
}

}  // namespace

extern "C" {

// grid: n*n*n values (row-major x,y,z). iso: level set. Returns handle.
void* march_run(const float* grid, int64_t n, float iso) {
  MarchOut* out = new MarchOut();
  auto val = [&](int64_t x, int64_t y, int64_t z) {
    return grid[(x * n + y) * n + z];
  };
  // edge key: the two full-grid point ids, ordered
  auto pid = [&](const int64_t c[3]) { return (c[0] * n + c[1]) * n + c[2]; };
  std::unordered_map<uint64_t, int64_t> edge_vert;

  auto edge_vertex = [&](const int64_t a[3], float va, const int64_t b[3], float vb) {
    int64_t ia = pid(a), ib = pid(b);
    uint64_t k = ia < ib ? ((uint64_t)ia << 32) ^ (uint64_t)ib
                         : ((uint64_t)ib << 32) ^ (uint64_t)ia;
    // NOTE: n^3 < 2^32 required (n <= 1625) — holds for all used resolutions
    auto it = edge_vert.find(k);
    if (it != edge_vert.end()) return it->second;
    float t = (iso - va) / (vb - va);
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    out->verts.push_back((float)a[0] + t * (float)(b[0] - a[0]));
    out->verts.push_back((float)a[1] + t * (float)(b[1] - a[1]));
    out->verts.push_back((float)a[2] + t * (float)(b[2] - a[2]));
    int64_t id = (int64_t)out->verts.size() / 3 - 1;
    edge_vert.emplace(k, id);
    return id;
  };

  for (int64_t x = 0; x + 1 < n; ++x)
    for (int64_t y = 0; y + 1 < n; ++y)
      for (int64_t z = 0; z + 1 < n; ++z) {
        float cv[8];
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) {
          int64_t cc[3];
          corner_coord(c, x, y, z, cc);
          cv[c] = val(cc[0], cc[1], cc[2]);
          (cv[c] < iso ? any_in : any_out) = true;
        }
        if (!any_in || !any_out) continue;

        for (int t = 0; t < 6; ++t) {
          const int* tet = TETS[t];
          int inside = 0, in_ids[4], out_ids[4];
          int n_in = 0, n_out = 0;
          for (int i = 0; i < 4; ++i) {
            if (cv[tet[i]] < iso) {
              in_ids[n_in++] = tet[i];
              inside |= 1 << i;
            } else {
              out_ids[n_out++] = tet[i];
            }
          }
          if (n_in == 0 || n_in == 4) continue;

          int64_t ca[3], cb[3];
          auto ev = [&](int a, int b) {
            corner_coord(a, x, y, z, ca);
            corner_coord(b, x, y, z, cb);
            return edge_vertex(ca, cv[a], cb, cv[b]);
          };

          // orient each triangle so its normal points from inside to outside
          // (toward increasing value) — sidesteps per-case winding tables
          float in_c[3] = {0, 0, 0}, out_c[3] = {0, 0, 0};
          for (int i = 0; i < n_in; ++i) {
            int64_t cc[3];
            corner_coord(in_ids[i], x, y, z, cc);
            for (int d = 0; d < 3; ++d) in_c[d] += (float)cc[d] / n_in;
          }
          for (int i = 0; i < n_out; ++i) {
            int64_t cc[3];
            corner_coord(out_ids[i], x, y, z, cc);
            for (int d = 0; d < 3; ++d) out_c[d] += (float)cc[d] / n_out;
          }
          auto emit = [&](int64_t v0, int64_t v1, int64_t v2) {
            const float* p0 = &out->verts[3 * v0];
            const float* p1 = &out->verts[3 * v1];
            const float* p2 = &out->verts[3 * v2];
            float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
            float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
            float nx = e1[1] * e2[2] - e1[2] * e2[1];
            float ny = e1[2] * e2[0] - e1[0] * e2[2];
            float nz = e1[0] * e2[1] - e1[1] * e2[0];
            float gx = out_c[0] - in_c[0], gy = out_c[1] - in_c[1], gz = out_c[2] - in_c[2];
            if (nx * gx + ny * gy + nz * gz < 0) std::swap(v1, v2);
            out->faces.insert(out->faces.end(), {v0, v1, v2});
          };

          if (n_in == 1) {
            int a = in_ids[0];
            emit(ev(a, out_ids[0]), ev(a, out_ids[1]), ev(a, out_ids[2]));
          } else if (n_in == 3) {
            int b = out_ids[0];
            emit(ev(in_ids[0], b), ev(in_ids[1], b), ev(in_ids[2], b));
          } else {  // 2 in, 2 out: quad -> 2 triangles
            int a0 = in_ids[0], a1 = in_ids[1], b0 = out_ids[0], b1 = out_ids[1];
            int64_t v00 = ev(a0, b0), v01 = ev(a0, b1), v10 = ev(a1, b0), v11 = ev(a1, b1);
            emit(v00, v01, v11);
            emit(v00, v11, v10);
          }
        }
      }
  return out;
}

int64_t march_num_verts(void* h) { return (int64_t)static_cast<MarchOut*>(h)->verts.size() / 3; }
int64_t march_num_faces(void* h) { return (int64_t)static_cast<MarchOut*>(h)->faces.size() / 3; }

void march_get(void* h, float* verts, int64_t* faces) {
  MarchOut* m = static_cast<MarchOut*>(h);
  if (verts) std::copy(m->verts.begin(), m->verts.end(), verts);
  if (faces) std::copy(m->faces.begin(), m->faces.end(), faces);
}

void march_destroy(void* h) { delete static_cast<MarchOut*>(h); }

}  // extern "C"
