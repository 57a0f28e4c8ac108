// Ball-Pivoting surface reconstruction (first-party C++).
//
// TPU-native framework companion: the one genuinely sequential,
// host-bound stage of the pipeline (SURVEY.md §7 hard part 2), replacing
// Open3D's create_from_point_cloud_ball_pivoting (ref utils.py:94).
// Bernardini et al. 1999: roll a ball of radius r over the cloud; each
// stable 3-point contact is a triangle; pivot around front edges to
// grow the surface. Multi-radius: retry remaining front edges with the
// next (larger) radius, as Open3D does with its radii list.
//
// Exposed as a flat C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float norm2(V3 a) { return dot(a, a); }
static inline float norm(V3 a) { return std::sqrt(norm2(a)); }
static inline V3 normalize(V3 a) {
  float n = norm(a);
  return n > 1e-20f ? a * (1.0f / n) : V3{0, 0, 1};
}

// ---------------- spatial grid ----------------
struct Grid {
  float cell;
  V3 origin;
  int nx, ny, nz;
  std::vector<std::vector<int>> cells;

  void build(const std::vector<V3>& pts, float cell_size) {
    cell = cell_size;
    V3 lo = pts[0], hi = pts[0];
    for (const auto& p : pts) {
      lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
      hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
    }
    origin = lo - V3{cell, cell, cell} * 0.5f;
    nx = std::max(1, (int)((hi.x - origin.x) / cell) + 2);
    ny = std::max(1, (int)((hi.y - origin.y) / cell) + 2);
    nz = std::max(1, (int)((hi.z - origin.z) / cell) + 2);
    // cap the table so degenerate clouds don't explode memory
    while ((long long)nx * ny * nz > (1LL << 24)) {
      cell *= 2.0f;
      nx = std::max(1, (int)((hi.x - origin.x) / cell) + 2);
      ny = std::max(1, (int)((hi.y - origin.y) / cell) + 2);
      nz = std::max(1, (int)((hi.z - origin.z) / cell) + 2);
    }
    cells.assign((size_t)nx * ny * nz, {});
    for (int i = 0; i < (int)pts.size(); ++i) cells[index_of(pts[i])].push_back(i);
  }

  size_t index_of(V3 p) const {
    int ix = std::min(nx - 1, std::max(0, (int)((p.x - origin.x) / cell)));
    int iy = std::min(ny - 1, std::max(0, (int)((p.y - origin.y) / cell)));
    int iz = std::min(nz - 1, std::max(0, (int)((p.z - origin.z) / cell)));
    return ((size_t)iz * ny + iy) * nx + ix;
  }

  template <class F>
  void for_neighbors(V3 p, float radius, F&& f) const {
    int r = (int)(radius / cell) + 1;
    int ix = (int)((p.x - origin.x) / cell);
    int iy = (int)((p.y - origin.y) / cell);
    int iz = (int)((p.z - origin.z) / cell);
    for (int dz = -r; dz <= r; ++dz) {
      int z = iz + dz; if (z < 0 || z >= nz) continue;
      for (int dy = -r; dy <= r; ++dy) {
        int y = iy + dy; if (y < 0 || y >= ny) continue;
        for (int dx = -r; dx <= r; ++dx) {
          int x = ix + dx; if (x < 0 || x >= nx) continue;
          for (int idx : cells[((size_t)z * ny + y) * nx + x]) f(idx);
        }
      }
    }
  }
};

// ---------------- BPA state ----------------
enum PState : uint8_t { ORPHAN = 0, FRONT = 1, INSIDE = 2 };

struct Edge {
  int a, b, opposite;
  V3 center;  // ball center of the triangle this edge came from
};

struct BPA {
  const std::vector<V3>& pts;
  const std::vector<V3>& nrm;
  Grid grid;
  std::vector<uint8_t> state;
  std::vector<int32_t> tris;
  // directed-edge bookkeeping: key = (min,max); value: #times used
  std::unordered_map<uint64_t, int> edge_uses;
  std::deque<Edge> front;
  float r;

  BPA(const std::vector<V3>& p, const std::vector<V3>& n)
      : pts(p), nrm(n), state(p.size(), ORPHAN) {}

  static uint64_t ekey(int a, int b) {
    uint32_t lo = (uint32_t)std::min(a, b), hi = (uint32_t)std::max(a, b);
    return ((uint64_t)hi << 32) | lo;
  }

  // ball center touching p1,p2,p3 with radius r, on the side agreeing with
  // the vertex normals; returns false if the ball doesn't fit
  bool ball_center(int i1, int i2, int i3, V3* out) const {
    V3 p1 = pts[i1], p2 = pts[i2], p3 = pts[i3];
    V3 e1 = p2 - p1, e2 = p3 - p1;
    V3 nt = cross(e1, e2);
    float nt2 = norm2(nt);
    if (nt2 < 1e-24f) return false;  // degenerate triangle
    // circumcenter (relative to p1)
    V3 cc = (cross(nt, e1) * norm2(e2) + cross(e2, nt) * norm2(e1)) * (0.5f / nt2);
    float rc2 = norm2(cc);
    float h2 = r * r - rc2;
    if (h2 <= 0) return false;  // circumradius exceeds ball radius
    V3 nhat = normalize(nt);
    // orient with the average vertex normal
    V3 avg = nrm[i1] + nrm[i2] + nrm[i3];
    if (dot(nhat, avg) < 0) nhat = nhat * -1.0f;
    *out = p1 + cc + nhat * std::sqrt(h2);
    return true;
  }

  bool ball_empty(V3 c, int i1, int i2, int i3) const {
    float lim = r * r * (1.0f - 1e-4f);
    bool ok = true;
    grid.for_neighbors(c, r, [&](int idx) {
      if (!ok || idx == i1 || idx == i2 || idx == i3) return;
      if (norm2(pts[idx] - c) < lim) ok = false;
    });
    return ok;
  }

  bool normals_compatible(int i1, int i2, int i3) const {
    V3 nt = cross(pts[i2] - pts[i1], pts[i3] - pts[i1]);
    V3 avg = nrm[i1] + nrm[i2] + nrm[i3];
    return std::fabs(dot(normalize(nt), normalize(avg))) > 0.1f ||
           norm2(avg) < 1e-12f;
  }

  void emit(int a, int b, int c, V3 center) {
    // wind so the triangle normal agrees with the ball side
    V3 nt = cross(pts[b] - pts[a], pts[c] - pts[a]);
    V3 mid = (pts[a] + pts[b] + pts[c]) * (1.0f / 3.0f);
    if (dot(nt, center - mid) < 0) std::swap(b, c);
    tris.push_back(a); tris.push_back(b); tris.push_back(c);
    state[a] = state[b] = state[c] = INSIDE;
    push_edge(a, b, c, center);
    push_edge(b, c, a, center);
    push_edge(c, a, b, center);
  }

  void push_edge(int a, int b, int opp, V3 center) {
    int& uses = edge_uses[ekey(a, b)];
    ++uses;
    if (uses == 1) front.push_back({a, b, opp, center});
  }

  bool edge_open(int a, int b) const {
    auto it = edge_uses.find(ekey(a, b));
    return it != edge_uses.end() && it->second == 1;
  }

  // try to find a seed triangle among unused points.
  //
  // seed_cursor: within one radius pass the seeding outcome for a point
  // is static (positions/normals never change; state only transitions
  // ORPHAN -> INSIDE), so a point that failed once fails for the rest
  // of the pass — resume scanning where the last seed search stopped
  // instead of from 0. Without this, S components cost O(S*n) rescans
  // (measured: the 1M torus spent ~15 min mostly here).
  int seed_cursor = 0;

  bool find_seed() {
    for (int& i = seed_cursor; i < (int)pts.size(); ++i) {
      if (state[i] != ORPHAN) continue;
      std::vector<int> cand;
      grid.for_neighbors(pts[i], 2 * r, [&](int idx) {
        if (idx != i && norm2(pts[idx] - pts[i]) < 4 * r * r) cand.push_back(idx);
      });
      // a valid seed triangle has circumradius <= r, so its two other
      // vertices are almost always among the nearest points; bound the
      // O(|cand|^2) pair loop by trying the nearest pairs first (dense
      // regions at the ladder's large radii otherwise see |cand| in the
      // thousands)
      constexpr size_t kSeedCap = 64;
      if (cand.size() > kSeedCap) {
        V3 pi = pts[i];
        std::partial_sort(cand.begin(), cand.begin() + kSeedCap, cand.end(),
                          [&](int x, int y) {
                            return norm2(pts[x] - pi) < norm2(pts[y] - pi);
                          });
        cand.resize(kSeedCap);
      }
      for (size_t a = 0; a < cand.size(); ++a) {
        for (size_t b = a + 1; b < cand.size(); ++b) {
          int j = cand[a], k = cand[b];
          if (!normals_compatible(i, j, k)) continue;
          V3 c;
          if (!ball_center(i, j, k, &c)) continue;
          if (!ball_empty(c, i, j, k)) continue;
          emit(i, j, k, c);
          return true;
        }
      }
    }
    return false;
  }

  // pivot the ball around front edge e; returns contact point or -1
  int pivot(const Edge& e, V3* new_center) {
    V3 a = pts[e.a], b = pts[e.b];
    V3 m = (a + b) * 0.5f;
    V3 u = normalize(b - a);
    V3 v0 = e.center - m;
    v0 = v0 - u * dot(v0, u);  // component ⊥ edge
    float v0n = norm(v0);
    if (v0n < 1e-12f) return -1;
    V3 v0h = v0 * (1.0f / v0n);
    V3 wdir = cross(u, v0h);  // completes right-handed frame (u, v0h, wdir)

    int best = -1;
    float best_angle = 1e9f;
    V3 best_c{};
    float search = 2.0f * r;
    grid.for_neighbors(m, search, [&](int x) {
      if (x == e.a || x == e.b || x == e.opposite) return;
      // interior points may be re-glued; non-manifold overuse is rejected
      // by the edge_uses >= 2 checks in run()
      V3 c;
      if (!ball_center(e.a, e.b, x, &c)) return;
      V3 w = c - m;
      w = w - u * dot(w, u);
      float wy = dot(w, v0h), wx = dot(w, wdir);
      // rolling direction: away from the old triangle = positive wdir side
      float ang = std::atan2(wx, wy);           // 0 at current center
      if (ang <= 1e-6f) ang += 2.0f * (float)M_PI;
      if (ang < best_angle) {
        if (!normals_compatible(e.a, e.b, x)) return;
        if (!ball_empty(c, e.a, e.b, x)) return;
        best_angle = ang;
        best = x;
        best_c = c;
      }
    });
    if (best >= 0) *new_center = best_c;
    return best;
  }

  void run(float radius) {
    r = radius;
    seed_cursor = 0;  // a larger ball can seed points that failed before
    grid.build(pts, std::max(radius, 1e-6f));
    // resume: re-activate open edges from earlier (smaller-radius) passes
    std::deque<Edge> carried = std::move(front);
    front.clear();
    for (auto& e : carried)
      if (edge_open(e.a, e.b)) front.push_back(e);

    while (true) {
      while (!front.empty()) {
        Edge e = front.front();
        front.pop_front();
        if (!edge_open(e.a, e.b)) continue;
        V3 c;
        int x = pivot(e, &c);
        if (x < 0) continue;  // boundary edge (for this radius)
        // adding triangle (a, b, x): the shared edge gets its 2nd use
        if (!edge_open(e.a, e.b)) continue;
        // avoid non-manifold overuse of the new edges
        auto u1 = edge_uses.find(ekey(e.a, x));
        auto u2 = edge_uses.find(ekey(e.b, x));
        if ((u1 != edge_uses.end() && u1->second >= 2) ||
            (u2 != edge_uses.end() && u2->second >= 2))
          continue;
        edge_uses[ekey(e.a, e.b)]++;  // now closed
        emit_pivot(e.a, e.b, x, c);
      }
      if (!find_seed()) break;
    }
  }

  void emit_pivot(int a, int b, int x, V3 center) {
    // orientation handled in emit(); do not re-push the closing edge
    V3 nt = cross(pts[b] - pts[a], pts[x] - pts[a]);
    V3 mid = (pts[a] + pts[b] + pts[x]) * (1.0f / 3.0f);
    int va = a, vb = b;
    if (dot(nt, center - mid) < 0) std::swap(va, vb);
    tris.push_back(va); tris.push_back(vb); tris.push_back(x);
    state[a] = state[b] = state[x] = INSIDE;
    push_edge(a, x, b, center);
    push_edge(b, x, a, center);
  }
};

}  // namespace

extern "C" {

// Returns number of triangles; fills *out (malloc'd, caller frees via
// bpa_free) with t*3 int32 vertex ids. radii must be ascending.
int bpa_reconstruct(const float* points, const float* normals, int n,
                    const float* radii, int n_radii, int32_t** out) {
  if (n < 3 || n_radii < 1) { *out = nullptr; return 0; }
  std::vector<V3> pts(n), nrm(n);
  std::memcpy(pts.data(), points, sizeof(V3) * n);
  std::memcpy(nrm.data(), normals, sizeof(V3) * n);
  BPA bpa(pts, nrm);
  for (int i = 0; i < n_radii; ++i) bpa.run(radii[i]);
  int t = (int)(bpa.tris.size() / 3);
  if (t == 0) { *out = nullptr; return 0; }
  *out = (int32_t*)std::malloc(sizeof(int32_t) * bpa.tris.size());
  std::memcpy(*out, bpa.tris.data(), sizeof(int32_t) * bpa.tris.size());
  return t;
}

void bpa_free(int32_t* buf) { std::free(buf); }

}  // extern "C"
