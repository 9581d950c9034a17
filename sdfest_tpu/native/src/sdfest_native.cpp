// Native geometry kernels for sdfest_tpu (host-side preprocessing).
//
// Replaces the reference's external `mesh_to_sdf` package (scan-based
// voxelization, /root/reference/sdfest/vae/sdf_utils.py:17-43) and
// skimage's marching cubes with self-contained C++:
//
//  - voxelize_mesh: triangle mesh -> signed distance grid on [-1,1]^3.
//    Exact point-triangle distances in a narrow band around the surface
//    (bucket-grid accelerated), 8-pass chamfer distance transform for the
//    far field, and inside/outside signs from x-ray crossing parity.
//  - marching_tetrahedra: isosurface extraction (6 tets per cell, no
//    256-case tables); emits a triangle soup, deduplicated by the Python
//    wrapper.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm2() const { return dot(*this); }
};

// Exact squared distance from point p to triangle (a, b, c).
// Standard region-based algorithm (Eberly, Geometric Tools).
double point_triangle_dist2(const Vec3& p, const Vec3& a, const Vec3& b,
                            const Vec3& c) {
  Vec3 ab = b - a, ac = c - a, ap = p - a;
  double d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0.0 && d2 <= 0.0) return ap.norm2();
  Vec3 bp = p - b;
  double d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0.0 && d4 <= d3) return bp.norm2();
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0.0 && d1 >= 0.0 && d3 <= 0.0) {
    double v = d1 / (d1 - d3);
    Vec3 q = a + ab * v;
    return (p - q).norm2();
  }
  Vec3 cp = p - c;
  double d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0.0 && d5 <= d6) return cp.norm2();
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0.0 && d2 >= 0.0 && d6 <= 0.0) {
    double w = d2 / (d2 - d6);
    Vec3 q = a + ac * w;
    return (p - q).norm2();
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0.0 && (d4 - d3) >= 0.0 && (d5 - d6) >= 0.0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    Vec3 q = b + (c - b) * w;
    return (p - q).norm2();
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  Vec3 q = a + ab * v + ac * w;
  return (p - q).norm2();
}

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// Voxelize a triangle mesh into a signed distance grid.
//
// vertices: (n_vertices, 3) float64, already positioned in [-1, 1]^3.
// faces: (n_faces, 3) int32 vertex indices.
// res: grid resolution per axis; grid point i is at -1 + 2*i/(res-1).
// band_cells: half-width (in cells) of the exact-distance band.
// out_sdf: (res, res, res) float32 output, indexed [x][y][z].
//
// Returns 0 on success.
int voxelize_mesh(const double* vertices, int n_vertices, const int32_t* faces,
                  int n_faces, int res, int band_cells, float* out_sdf) {
  if (res < 2 || n_faces <= 0 || n_vertices <= 0) return 1;
  const double spacing = 2.0 / (res - 1);
  const size_t n_cells = (size_t)res * res * res;
  std::vector<double> dist2(n_cells, 1e30);

  auto vert = [&](int32_t vi) -> Vec3 {
    return {vertices[3 * vi], vertices[3 * vi + 1], vertices[3 * vi + 2]};
  };
  auto grid_coord = [&](int i) -> double { return -1.0 + spacing * i; };
  auto to_cell = [&](double v) -> int {
    return (int)std::floor((v + 1.0) / spacing);
  };

  // --- narrow band: exact distances near each triangle -------------------
  for (int f = 0; f < n_faces; ++f) {
    Vec3 a = vert(faces[3 * f]), b = vert(faces[3 * f + 1]),
         c = vert(faces[3 * f + 2]);
    double min_x = std::min({a.x, b.x, c.x}), max_x = std::max({a.x, b.x, c.x});
    double min_y = std::min({a.y, b.y, c.y}), max_y = std::max({a.y, b.y, c.y});
    double min_z = std::min({a.z, b.z, c.z}), max_z = std::max({a.z, b.z, c.z});
    int i0 = clampi(to_cell(min_x) - band_cells, 0, res - 1);
    int i1 = clampi(to_cell(max_x) + band_cells + 1, 0, res - 1);
    int j0 = clampi(to_cell(min_y) - band_cells, 0, res - 1);
    int j1 = clampi(to_cell(max_y) + band_cells + 1, 0, res - 1);
    int k0 = clampi(to_cell(min_z) - band_cells, 0, res - 1);
    int k1 = clampi(to_cell(max_z) + band_cells + 1, 0, res - 1);
    for (int i = i0; i <= i1; ++i) {
      for (int j = j0; j <= j1; ++j) {
        for (int k = k0; k <= k1; ++k) {
          Vec3 p = {grid_coord(i), grid_coord(j), grid_coord(k)};
          double d2 = point_triangle_dist2(p, a, b, c);
          size_t idx = ((size_t)i * res + j) * res + k;
          if (d2 < dist2[idx]) dist2[idx] = d2;
        }
      }
    }
  }

  // --- far field: 2-pass 26-neighbor chamfer distance transform ----------
  std::vector<float> dist(n_cells);
  for (size_t i = 0; i < n_cells; ++i)
    dist[i] = dist2[i] < 1e29 ? (float)std::sqrt(dist2[i]) : 1e30f;

  auto sweep = [&](bool forward) {
    int start = forward ? 0 : res - 1;
    int end = forward ? res : -1;
    int step = forward ? 1 : -1;
    for (int i = start; i != end; i += step) {
      for (int j = start; j != end; j += step) {
        for (int k = start; k != end; k += step) {
          size_t idx = ((size_t)i * res + j) * res + k;
          float best = dist[idx];
          for (int di = -1; di <= 1; ++di) {
            int ni = i + di;
            if (ni < 0 || ni >= res) continue;
            for (int dj = -1; dj <= 1; ++dj) {
              int nj = j + dj;
              if (nj < 0 || nj >= res) continue;
              for (int dk = -1; dk <= 1; ++dk) {
                if (di == 0 && dj == 0 && dk == 0) continue;
                int nk = k + dk;
                if (nk < 0 || nk >= res) continue;
                size_t nidx = ((size_t)ni * res + nj) * res + nk;
                float cand =
                    dist[nidx] +
                    (float)(spacing *
                            std::sqrt((double)(di * di + dj * dj + dk * dk)));
                if (cand < best) best = cand;
              }
            }
          }
          dist[idx] = best;
        }
      }
    }
  };
  sweep(true);
  sweep(false);

  // --- signs: x-ray crossing parity per (j, k) grid line -----------------
  // crossings[j][k] holds x-coordinates where the line crosses the surface
  std::vector<std::vector<float>> crossings((size_t)res * res);
  for (int f = 0; f < n_faces; ++f) {
    Vec3 a = vert(faces[3 * f]), b = vert(faces[3 * f + 1]),
         c = vert(faces[3 * f + 2]);
    double min_y = std::min({a.y, b.y, c.y}), max_y = std::max({a.y, b.y, c.y});
    double min_z = std::min({a.z, b.z, c.z}), max_z = std::max({a.z, b.z, c.z});
    int j0 = clampi((int)std::ceil((min_y + 1.0) / spacing), 0, res - 1);
    int j1 = clampi((int)std::floor((max_y + 1.0) / spacing), 0, res - 1);
    int k0 = clampi((int)std::ceil((min_z + 1.0) / spacing), 0, res - 1);
    int k1 = clampi((int)std::floor((max_z + 1.0) / spacing), 0, res - 1);
    // 2D (y, z) barycentric test per covered grid line
    double e1y = b.y - a.y, e1z = b.z - a.z;
    double e2y = c.y - a.y, e2z = c.z - a.z;
    double det = e1y * e2z - e1z * e2y;
    if (std::fabs(det) < 1e-14) continue;  // degenerate in (y, z)
    double inv_det = 1.0 / det;
    for (int j = j0; j <= j1; ++j) {
      double y = grid_coord(j);
      for (int k = k0; k <= k1; ++k) {
        double z = grid_coord(k);
        double py = y - a.y, pz = z - a.z;
        double u = (py * e2z - pz * e2y) * inv_det;
        double v = (e1y * pz - e1z * py) * inv_det;
        if (u < 0.0 || v < 0.0 || u + v > 1.0) continue;
        double x = a.x + u * (b.x - a.x) + v * (c.x - a.x);
        crossings[(size_t)j * res + k].push_back((float)x);
      }
    }
  }

  for (int j = 0; j < res; ++j) {
    for (int k = 0; k < res; ++k) {
      auto& xs = crossings[(size_t)j * res + k];
      std::sort(xs.begin(), xs.end());
      size_t ci = 0;
      bool inside = false;
      for (int i = 0; i < res; ++i) {
        double x = grid_coord(i);
        while (ci < xs.size() && xs[ci] < x) {
          inside = !inside;
          ++ci;
        }
        size_t idx = ((size_t)i * res + j) * res + k;
        out_sdf[idx] = inside ? -dist[idx] : dist[idx];
      }
    }
  }
  return 0;
}

// Marching tetrahedra isosurface extraction (triangle soup output).
//
// grid: (res, res, res) float32 scalar field, indexed [x][y][z].
// level: iso level.
// out_verts: capacity for max_tris * 9 floats (3 vertices per triangle,
//   index-space coordinates).
// Returns number of triangles written, or -1 if capacity exceeded.
int marching_tetrahedra(const float* grid, int res, float level,
                        float* out_verts, int max_tris) {
  static const int corners[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                                    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  static const int tets[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                                 {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};
  int n_tris = 0;
  auto val = [&](int i, int j, int k) -> float {
    return grid[((size_t)i * res + j) * res + k];
  };

  for (int i = 0; i < res - 1; ++i) {
    for (int j = 0; j < res - 1; ++j) {
      for (int k = 0; k < res - 1; ++k) {
        float cv[8];
        float cp[8][3];
        for (int c = 0; c < 8; ++c) {
          int ci = i + corners[c][0], cj = j + corners[c][1],
              ck = k + corners[c][2];
          cv[c] = val(ci, cj, ck);
          cp[c][0] = (float)ci;
          cp[c][1] = (float)cj;
          cp[c][2] = (float)ck;
        }
        for (int t = 0; t < 6; ++t) {
          const int* tv = tets[t];
          int caseid = 0;
          for (int v = 0; v < 4; ++v)
            if (cv[tv[v]] < level) caseid |= 1 << v;
          if (caseid == 0 || caseid == 15) continue;

          // collect inside / outside vertex indices of the tet
          int in[4], out[4], n_in = 0, n_out = 0;
          for (int v = 0; v < 4; ++v) {
            if (cv[tv[v]] < level)
              in[n_in++] = tv[v];
            else
              out[n_out++] = tv[v];
          }
          auto emit_edge_vertex = [&](int va, int vb, float* dst) {
            float fa = cv[va], fb = cv[vb];
            float tt = (level - fa) / (fb - fa);
            for (int d = 0; d < 3; ++d)
              dst[d] = cp[va][d] + tt * (cp[vb][d] - cp[va][d]);
          };
          auto emit_tri = [&](int a0, int b0, int a1, int b1, int a2,
                              int b2) -> bool {
            if (n_tris >= max_tris) return false;
            float* dst = out_verts + (size_t)n_tris * 9;
            emit_edge_vertex(a0, b0, dst);
            emit_edge_vertex(a1, b1, dst + 3);
            emit_edge_vertex(a2, b2, dst + 6);
            ++n_tris;
            return true;
          };
          bool ok = true;
          if (n_in == 1) {
            ok = emit_tri(in[0], out[0], in[0], out[1], in[0], out[2]);
          } else if (n_in == 3) {
            ok = emit_tri(out[0], in[0], out[0], in[2], out[0], in[1]);
          } else {  // 2 in / 2 out: quad -> 2 triangles
            ok = emit_tri(in[0], out[0], in[0], out[1], in[1], out[1]) &&
                 emit_tri(in[0], out[0], in[1], out[1], in[1], out[0]);
          }
          if (!ok) return -1;
        }
      }
    }
  }
  return n_tris;
}

}  // extern "C"
