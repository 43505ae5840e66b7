// Multiresolution IsoSurface Extraction (MISE) octree.
//
// Same capability as the reference's Cython extension
// (reference: code/lib/libmise/mise.pyx — MISE(res0, depth, threshold) with
// query()/update()/to_dense() driven by utils/mesh.py:87-109): only cells
// whose corners straddle the iso level are subdivided, so the expensive SDF
// evaluations (batched on the TPU by the Python caller) concentrate in a
// shrinking band around the surface. Fresh implementation: flat hash maps
// keyed by full-resolution grid indices, per-level active cell lists.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Mise {
  int res0;         // coarse cells per axis
  int depth;        // subdivision levels
  int R;            // full-resolution cells per axis = res0 << depth
  float threshold;  // iso level
  int level;        // current refinement level (0..depth)

  // evaluated SDF/occupancy values at full-res grid points
  std::unordered_map<uint64_t, float> values;
  // active (unresolved) cells at `level`: key = full-res corner index of the
  // cell's min corner
  std::vector<uint64_t> active;
  // resolved cells (all corners same side), stored with their level for
  // interior fill at to_dense time
  std::vector<std::pair<uint64_t, int>> resolved;
  // points handed out by the last query, awaiting update()
  std::vector<uint64_t> pending;

  uint64_t key(int64_t x, int64_t y, int64_t z) const {
    uint64_t n = (uint64_t)R + 1;
    return ((uint64_t)x * n + (uint64_t)y) * n + (uint64_t)z;
  }
  void unkey(uint64_t k, int64_t& x, int64_t& y, int64_t& z) const {
    uint64_t n = (uint64_t)R + 1;
    z = (int64_t)(k % n);
    k /= n;
    y = (int64_t)(k % n);
    x = (int64_t)(k / n);
  }
  int cell_size(int lvl) const { return R / (res0 << lvl); }
};

void cell_corners(const Mise& m, uint64_t cell_key, int lvl, uint64_t out[8]) {
  int64_t x, y, z;
  m.unkey(cell_key, x, y, z);
  int s = m.cell_size(lvl);
  int idx = 0;
  for (int dx = 0; dx <= 1; ++dx)
    for (int dy = 0; dy <= 1; ++dy)
      for (int dz = 0; dz <= 1; ++dz)
        out[idx++] = m.key(x + (int64_t)dx * s, y + (int64_t)dy * s, z + (int64_t)dz * s);
}

}  // namespace

extern "C" {

void* mise_create(int res0, int depth, float threshold) {
  Mise* m = new Mise();
  m->res0 = res0;
  m->depth = depth;
  m->R = res0 << depth;
  m->threshold = threshold;
  m->level = 0;
  // all coarse cells start active
  int s = m->cell_size(0);
  for (int x = 0; x < res0; ++x)
    for (int y = 0; y < res0; ++y)
      for (int z = 0; z < res0; ++z)
        m->active.push_back(m->key((int64_t)x * s, (int64_t)y * s, (int64_t)z * s));
  return m;
}

void mise_destroy(void* h) { delete static_cast<Mise*>(h); }

int mise_resolution(void* h) { return static_cast<Mise*>(h)->R; }

// Collect grid points (full-res integer coords) needing evaluation for the
// current level's active cells. Returns the count; writes up to max_out
// triplets into out_xyz. Call with max_out=0 to size the buffer.
int64_t mise_query(void* h, int64_t* out_xyz, int64_t max_out) {
  Mise* m = static_cast<Mise*>(h);
  std::unordered_set<uint64_t> need;
  uint64_t corners[8];
  for (uint64_t cell : m->active) {
    cell_corners(*m, cell, m->level, corners);
    for (int i = 0; i < 8; ++i)
      if (!m->values.count(corners[i])) need.insert(corners[i]);
  }
  m->pending.assign(need.begin(), need.end());
  int64_t n = (int64_t)m->pending.size();
  if (out_xyz) {
    int64_t lim = n < max_out ? n : max_out;
    for (int64_t i = 0; i < lim; ++i) {
      int64_t x, y, z;
      m->unkey(m->pending[i], x, y, z);
      out_xyz[3 * i] = x;
      out_xyz[3 * i + 1] = y;
      out_xyz[3 * i + 2] = z;
    }
  }
  return n;
}

// Store values for the previously-queried points, then refine: resolved cells
// (all corners strictly one side) are frozen, straddling cells subdivide.
void mise_update(void* h, const float* vals, int64_t n) {
  Mise* m = static_cast<Mise*>(h);
  for (int64_t i = 0; i < n && i < (int64_t)m->pending.size(); ++i)
    m->values[m->pending[i]] = vals[i];
  m->pending.clear();

  std::vector<uint64_t> next;
  uint64_t corners[8];
  for (uint64_t cell : m->active) {
    cell_corners(*m, cell, m->level, corners);
    bool any_in = false, any_out = false;
    for (int i = 0; i < 8; ++i) {
      float v = m->values.at(corners[i]);
      (v <= m->threshold ? any_in : any_out) = true;
    }
    if (any_in && any_out && m->level < m->depth) {
      // subdivide into 8 children
      int64_t x, y, z;
      m->unkey(cell, x, y, z);
      int half = m->cell_size(m->level) / 2;
      for (int dx = 0; dx <= 1; ++dx)
        for (int dy = 0; dy <= 1; ++dy)
          for (int dz = 0; dz <= 1; ++dz)
            next.push_back(m->key(x + (int64_t)dx * half, y + (int64_t)dy * half,
                                  z + (int64_t)dz * half));
    } else {
      m->resolved.emplace_back(cell, m->level);
    }
  }
  m->active = std::move(next);
  if (m->level < m->depth) m->level += 1;
}

int64_t mise_num_active(void* h) {
  return (int64_t)static_cast<Mise*>(h)->active.size();
}

// Densify to the full (R+1)^3 grid: evaluated points verbatim, resolved-cell
// interiors trilinearly interpolated from their corners (sign-constant there,
// so marching cubes is unaffected).
void mise_to_dense(void* h, float* out) {
  Mise* m = static_cast<Mise*>(h);
  int64_t n = (int64_t)m->R + 1;
  // fill resolved (and still-active, at final level) cell interiors
  auto fill_cell = [&](uint64_t cell, int lvl) {
    int64_t cx, cy, cz;
    m->unkey(cell, cx, cy, cz);
    int s = m->cell_size(lvl);
    float c[2][2][2];
    for (int dx = 0; dx <= 1; ++dx)
      for (int dy = 0; dy <= 1; ++dy)
        for (int dz = 0; dz <= 1; ++dz) {
          auto it = m->values.find(
              m->key(cx + (int64_t)dx * s, cy + (int64_t)dy * s, cz + (int64_t)dz * s));
          c[dx][dy][dz] = it != m->values.end() ? it->second : m->threshold + 1.0f;
        }
    for (int ix = 0; ix <= s; ++ix)
      for (int iy = 0; iy <= s; ++iy)
        for (int iz = 0; iz <= s; ++iz) {
          float fx = (float)ix / s, fy = (float)iy / s, fz = (float)iz / s;
          float v =
              c[0][0][0] * (1 - fx) * (1 - fy) * (1 - fz) + c[1][0][0] * fx * (1 - fy) * (1 - fz) +
              c[0][1][0] * (1 - fx) * fy * (1 - fz) + c[0][0][1] * (1 - fx) * (1 - fy) * fz +
              c[1][1][0] * fx * fy * (1 - fz) + c[1][0][1] * fx * (1 - fy) * fz +
              c[0][1][1] * (1 - fx) * fy * fz + c[1][1][1] * fx * fy * fz;
          out[((cx + ix) * n + (cy + iy)) * n + (cz + iz)] = v;
        }
  };
  for (auto& rc : m->resolved) fill_cell(rc.first, rc.second);
  for (uint64_t cell : m->active) fill_cell(cell, m->level);
  // exact evaluated points win over interpolation
  for (auto& kv : m->values) {
    int64_t x, y, z;
    m->unkey(kv.first, x, y, z);
    out[(x * n + y) * n + z] = kv.second;
  }
}

}  // extern "C"
