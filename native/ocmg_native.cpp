// Native host-side kernels for the OCMG postprocess pipeline.
//
// Replaces the Python/networkx algorithmic hot spots of the reference's
// postprocessing (utils/cluster.py:83-89 Edmonds minimum spanning
// arborescence + dag_longest_path; scipy linear_sum_assignment at
// utils/postprocessing.py:522):
//
//  - chu_liu_edmonds_path: minimum spanning arborescence of a dense
//    directed distance graph (virtual-root formulation, Chu-Liu/Edmonds)
//    followed by the unweighted longest root-to-leaf path — the segment
//    ordering used by concat_segments_of_stroke.
//  - solve_lap: Jonker-Volgenant shortest augmenting path LAP.
//
// Exposed with a C ABI for ctypes binding (no pybind11 in this image).
//
// Build: make -C native    (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <utility>
#include <vector>

namespace {

constexpr double INF = std::numeric_limits<double>::infinity();

// Chu-Liu/Edmonds minimum arborescence rooted at `root` on a dense cost
// matrix (cost[i*n+j] = weight of edge i->j, INF = absent).
// Returns parent[] over original nodes (parent[root] = -1), or false if
// some node is unreachable.
bool chu_liu_edmonds(int n, int root, const std::vector<double>& cost,
                     std::vector<int>& parent_out) {
  struct EdgeOrig { int u, v; };  // original endpoints an edge represents
  struct Level {
    std::vector<int> in_edge_from;       // chosen parent per local node
    std::vector<EdgeOrig> in_edge_orig;  // original edge per local node
    std::vector<char> in_cycle;          // local cycle membership
    std::vector<int> map;                // original node -> local id
  };

  int N = n;
  std::vector<double> c = cost;
  std::vector<EdgeOrig> orig(static_cast<size_t>(N) * N);
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < N; ++j) orig[i * N + j] = {i, j};
  std::vector<int> map_cur(n);  // original -> current local id
  for (int i = 0; i < n; ++i) map_cur[i] = i;

  std::vector<Level> levels;
  int cur_root = root;

  while (true) {
    std::vector<int> in_from(N, -1);
    std::vector<double> in_w(N, INF);
    std::vector<EdgeOrig> in_orig(N, {-1, -1});
    for (int j = 0; j < N; ++j) {
      if (j == cur_root) continue;
      for (int i = 0; i < N; ++i) {
        if (i == j) continue;
        double w = c[i * N + j];
        if (w < in_w[j]) { in_w[j] = w; in_from[j] = i; in_orig[j] = orig[i * N + j]; }
      }
      if (in_from[j] < 0) return false;  // unreachable
    }

    // cycle detection over the chosen-parent functional graph
    std::vector<int> color(N, 0);
    int cycle_start = -1;
    for (int s = 0; s < N && cycle_start < 0; ++s) {
      if (color[s]) continue;
      int v = s;
      while (v != -1 && color[v] == 0) {
        color[v] = 1;
        v = (v == cur_root) ? -1 : in_from[v];
      }
      if (v != -1 && color[v] == 1) { cycle_start = v; }
      int u = s;
      while (u != -1 && color[u] == 1) { color[u] = 2; u = (u == cur_root) ? -1 : in_from[u]; }
    }

    Level lvl;
    lvl.in_edge_from = in_from;
    lvl.in_edge_orig = in_orig;
    lvl.map = map_cur;
    lvl.in_cycle.assign(N, 0);

    if (cycle_start < 0) {  // arborescence found at this level
      levels.push_back(std::move(lvl));
      break;
    }

    {
      int v = cycle_start;
      do { lvl.in_cycle[v] = 1; v = in_from[v]; } while (v != cycle_start);
    }

    // contract the cycle
    std::vector<int> cyc_id(N, -1);
    int n_next = 0;
    for (int i = 0; i < N; ++i) if (!lvl.in_cycle[i]) cyc_id[i] = n_next++;
    int cyc_node = n_next++;
    for (int i = 0; i < N; ++i) if (lvl.in_cycle[i]) cyc_id[i] = cyc_node;

    std::vector<double> c2(static_cast<size_t>(n_next) * n_next, INF);
    std::vector<EdgeOrig> orig2(static_cast<size_t>(n_next) * n_next, {-1, -1});
    for (int i = 0; i < N; ++i) {
      for (int j = 0; j < N; ++j) {
        if (i == j || c[i * N + j] == INF) continue;
        int ni = cyc_id[i], nj = cyc_id[j];
        if (ni == nj) continue;
        double w = c[i * N + j];
        if (lvl.in_cycle[j]) w -= in_w[j];  // reweight edges into the cycle
        if (w < c2[ni * n_next + nj]) {
          c2[ni * n_next + nj] = w;
          orig2[ni * n_next + nj] = orig[i * N + j];
        }
      }
    }

    levels.push_back(std::move(lvl));
    for (int o = 0; o < n; ++o) map_cur[o] = cyc_id[map_cur[o]];
    cur_root = cyc_id[cur_root];
    c = std::move(c2);
    orig = std::move(orig2);
    N = n_next;
  }

  // Expansion: start from the top arborescence's chosen original edges,
  // then for each contracted level add the cycle's internal edges except
  // the one entering the node where the external edge lands.
  std::vector<EdgeOrig> selected;
  {
    const Level& top = levels.back();
    for (size_t j = 0; j < top.in_edge_from.size(); ++j)
      if (top.in_edge_from[j] >= 0 && top.in_edge_orig[j].u >= 0)
        selected.push_back(top.in_edge_orig[j]);
  }
  for (int li = static_cast<int>(levels.size()) - 2; li >= 0; --li) {
    const Level& lvl = levels[li];
    // the selected edge entering this level's cycle (by original target)
    int entry_local = -1;
    for (const auto& e : selected) {
      int t = lvl.map[e.v];
      if (t >= 0 && lvl.in_cycle[t]) { entry_local = t; break; }
    }
    for (size_t j = 0; j < lvl.in_cycle.size(); ++j) {
      if (!lvl.in_cycle[j] || static_cast<int>(j) == entry_local) continue;
      selected.push_back(lvl.in_edge_orig[j]);
    }
  }

  parent_out.assign(n, -1);
  for (const auto& e : selected)
    if (e.v >= 0 && e.v < n && e.u >= 0) parent_out[e.v] = e.u;
  return true;
}

// --- Akima spline (scipy Akima1DInterpolator semantics, uniform x=0..n-1) --
//
// Reference postprocess interpolates every stroke twice with scipy's
// Akima1DInterpolator (utils/postprocessing.py:269-312). scipy's generic
// PPoly construction dominated the host postprocess profile (~0.6 ms per
// construction on tiny strokes); Akima is a *local* O(n) method, so it is
// reimplemented here following scipy's formulas exactly
// (scipy/interpolate/_cubic.py Akima1DInterpolator.__init__ + PPoly eval):
// results match scipy to reassociation-level fp error.

struct AkimaSpline {
  int n = 0, d = 0;
  // per-interval Hermite coefficients, row-major (n-1, d) each
  std::vector<double> c0, c1, c2, c3;

  // y: n*d row-major, n >= 2
  void build(const double* y, int n_, int d_) {
    n = n_;
    d = d_;
    const int ni = n - 1;  // intervals
    std::vector<double> t(static_cast<size_t>(n) * d);
    if (n == 2) {
      for (int k = 0; k < d; ++k) {
        double mk = y[d + k] - y[k];
        t[k] = mk;
        t[d + k] = mk;
      }
    } else {
      // slopes with two extrapolated entries on each side: m has n+3 rows
      std::vector<double> m(static_cast<size_t>(n + 3) * d);
      for (int i = 0; i < ni; ++i)
        for (int k = 0; k < d; ++k)
          m[(i + 2) * d + k] =
              y[(i + 1) * d + k] - y[i * d + k];  // dx == 1
      for (int k = 0; k < d; ++k) {
        m[1 * d + k] = 2. * m[2 * d + k] - m[3 * d + k];
        m[0 * d + k] = 2. * m[1 * d + k] - m[2 * d + k];
        m[(n + 1) * d + k] = 2. * m[n * d + k] - m[(n - 1) * d + k];
        m[(n + 2) * d + k] = 2. * m[(n + 1) * d + k] - m[n * d + k];
      }
      // default slope: mean of the straddling extended slopes
      for (int i = 0; i < n; ++i)
        for (int k = 0; k < d; ++k)
          t[i * d + k] = .5 * (m[(i + 3) * d + k] + m[i * d + k]);
      // Akima weights; the breakpoint-defined mask uses the GLOBAL max of
      // f12 across all rows and dims, exactly like scipy's xp.max(f12)
      std::vector<double> f1(static_cast<size_t>(n) * d),
          f2(static_cast<size_t>(n) * d);
      double mmax = -INF;
      for (int i = 0; i < n; ++i)
        for (int k = 0; k < d; ++k) {
          double a = std::fabs(m[(i + 3) * d + k] - m[(i + 2) * d + k]);
          double b = std::fabs(m[(i + 1) * d + k] - m[i * d + k]);
          f1[i * d + k] = a;
          f2[i * d + k] = b;
          if (a + b > mmax) mmax = a + b;
        }
      for (int i = 0; i < n; ++i)
        for (int k = 0; k < d; ++k) {
          double s = f1[i * d + k] + f2[i * d + k];
          if (s > 1.e-9 * mmax)
            t[i * d + k] =
                m[(i + 1) * d + k] +
                (f2[i * d + k] / s) * (m[(i + 2) * d + k] - m[(i + 1) * d + k]);
        }
    }
    // CubicHermiteSpline coefficients (dx == 1)
    c0.resize(static_cast<size_t>(ni) * d);
    c1.resize(static_cast<size_t>(ni) * d);
    c2.resize(static_cast<size_t>(ni) * d);
    c3.resize(static_cast<size_t>(ni) * d);
    for (int i = 0; i < ni; ++i)
      for (int k = 0; k < d; ++k) {
        double slope = y[(i + 1) * d + k] - y[i * d + k];
        double tt = t[i * d + k] + t[(i + 1) * d + k] - 2. * slope;
        c0[i * d + k] = tt;
        c1[i * d + k] = (slope - t[i * d + k]) - tt;
        c2[i * d + k] = t[i * d + k];
        c3[i * d + k] = y[i * d + k];
      }
  }

  // Evaluate at tq; returns false if tq is outside [0, n-1]
  // (scipy extrapolate=False -> NaN -> caller drops the row).
  bool eval(double tq, double* out) const {
    if (!(tq >= 0.0) || tq > static_cast<double>(n - 1)) return false;
    int i = static_cast<int>(tq);
    if (i > n - 2) i = n - 2;
    double s = tq - i;
    for (int k = 0; k < d; ++k) {
      double v = ((c0[i * d + k] * s + c1[i * d + k]) * s + c2[i * d + k]) * s +
                 c3[i * d + k];
      out[k] = v;
    }
    return true;
  }
};

// scipy.ndimage 'reflect' boundary: (d c b a | a b c d | d c b a)
inline int reflect_index(int i, int n) {
  if (n == 1) return 0;
  while (i < 0 || i >= n) {
    if (i < 0) i = -i - 1;
    if (i >= n) i = 2 * n - i - 1;
  }
  return i;
}

}  // namespace

extern "C" {

// Akima interpolation of y (n*d, uniform x=0..n-1) at t_count query times.
// Rows with out-of-range t are skipped. Returns number of rows written.
int akima_eval(const double* y, int n, int d, const double* ts, int t_count,
               double* out) {
  if (n < 2) return 0;
  AkimaSpline sp;
  sp.build(y, n, d);
  int written = 0;
  for (int i = 0; i < t_count; ++i)
    if (sp.eval(ts[i], out + static_cast<size_t>(written) * d)) ++written;
  return written;
}

// Overlap trim between adjacent segments of one concatenated stroke
// (reference utils/postprocessing.py:350-391): for each segment except the
// last, keep pose j while no pose <= j is within `dist` of the next
// segment's first pose; the last segment keeps all poses. Writes kept FLAT
// pose indices (into the (n_seg*lam) pose sequence); returns their count.
int trim_overlap_keep(const double* stroke, int n_seg, int lam, int outdim,
                      double dist, int* out_idx) {
  int count = 0;
  double dist2 = dist * dist;
  for (int i = 0; i < n_seg - 1; ++i) {
    const double* cur = stroke + static_cast<size_t>(i) * lam * outdim;
    const double* nxt = stroke + static_cast<size_t>(i + 1) * lam * outdim;
    int cut = lam;
    for (int j = 0; j < lam; ++j) {
      double acc = 0.0;
      for (int k = 0; k < outdim; ++k) {
        double diff = cur[j * outdim + k] - nxt[k];
        acc += diff * diff;
      }
      if (acc < dist2) {
        cut = j + 1;
        break;
      }
    }
    for (int j = 0; j < cut; ++j) out_idx[count++] = i * lam + j;
  }
  for (int j = 0; j < lam; ++j) out_idx[count++] = (n_seg - 1) * lam + j;
  return count;
}

// Fused per-stroke tail: equal-space resample (Akima walk at 0.1 steps,
// reference utils/postprocessing.py:396-432) and, when do_interp != 0, the
// 5x Akima upsample + sigma=2 'reflect' Gaussian smoothing
// (utils/postprocessing.py:298-312). points: n*d. out must hold
// (10*n + 2) * 5 * d doubles. Returns output row count.
int resample_upsample_smooth(const double* points, int n, int d,
                             double resample_dist, int do_interp,
                             double* out) {
  // --- stage 1: resample at equal spaced points except last -------------
  std::vector<double> res;
  int rn = 0;
  if (n < 3) {
    res.assign(points, points + static_cast<size_t>(n) * d);
    rn = n;
  } else {
    AkimaSpline sp;
    sp.build(points, n, d);
    // the reference accumulates t += 0.1 in double and compares against
    // n-1 + 0.0005 (postprocessing.py:413-429) — replicated bit for bit
    std::vector<double> pts;
    pts.insert(pts.end(), points, points + d);  // stroke[0] prepended
    double t = 0.1;
    double row[64];
    const double tmax = static_cast<double>(n - 1) + 0.0005;
    while (t <= tmax) {
      if (sp.eval(t, row)) pts.insert(pts.end(), row, row + d);
      t += 0.1;
    }
    int np_ = static_cast<int>(pts.size()) / d;
    // greedy equal-spacing walk (sqrt compare, matches greedy_spaced_select)
    res.insert(res.end(), pts.begin(), pts.begin() + d);
    const double* last = pts.data();
    for (int i = 1; i < np_; ++i) {
      const double* p = pts.data() + static_cast<size_t>(i) * d;
      double acc = 0.0;
      for (int k = 0; k < d; ++k) {
        double diff = p[k] - last[k];
        acc += diff * diff;
      }
      if (std::sqrt(acc) > resample_dist) {
        res.insert(res.end(), p, p + d);
        last = p;
      }
    }
    // final pose kept unconditionally
    res.insert(res.end(), points + static_cast<size_t>(n - 1) * d,
               points + static_cast<size_t>(n) * d);
    rn = static_cast<int>(res.size()) / d;
  }

  if (!do_interp || rn < 3) {
    std::memcpy(out, res.data(), res.size() * sizeof(double));
    return rn;
  }

  // --- stage 2: 5x Akima upsample (ts = i * 0.2, NaN rows dropped) ------
  AkimaSpline sp2;
  sp2.build(res.data(), rn, d);
  std::vector<double> up;
  up.reserve(static_cast<size_t>(rn) * 5 * d);
  double row[64];
  for (int i = 0; i < rn * 5; ++i) {
    double tq = i * 0.2;  // np.arange(0, rn, 1/5): start + i*step
    if (sp2.eval(tq, row)) up.insert(up.end(), row, row + d);
  }
  int un = static_cast<int>(up.size()) / d;

  // --- stage 3: Gaussian sigma=2 (radius 8, 'reflect'), per dim ---------
  constexpr double sigma = 2.0;
  constexpr int radius = 8;  // int(truncate*sigma + 0.5), truncate=4
  double w[2 * radius + 1], wsum = 0.0;
  for (int x = -radius; x <= radius; ++x) {
    w[x + radius] = std::exp(-0.5 / (sigma * sigma) * x * x);
    wsum += w[x + radius];
  }
  for (int j = 0; j < 2 * radius + 1; ++j) w[j] /= wsum;
  for (int i = 0; i < un; ++i)
    for (int k = 0; k < d; ++k) {
      double acc = 0.0;
      for (int j = -radius; j <= radius; ++j)
        acc += w[j + radius] * up[static_cast<size_t>(
                   reflect_index(i + j, un)) * d + k];
      out[static_cast<size_t>(i) * d + k] = acc;
    }
  return un;
}

// Greedy equal-spacing walk over a polyline's sample points
// (reference utils/postprocessing.py:396-432 inner loop): keep a point iff
// its Euclidean distance to the previously *kept* point exceeds `dist`.
// pts: n*d row-major. out_idx: caller-allocated n ints. Returns kept count.
// The first point is always kept.
int greedy_spaced_select(const double* pts, int n, int d, double dist,
                         int* out_idx) {
  if (n <= 0) return 0;
  int count = 0;
  out_idx[count++] = 0;
  const double* last = pts;
  for (int i = 1; i < n; ++i) {
    const double* p = pts + static_cast<size_t>(i) * d;
    double acc = 0.0;
    for (int k = 0; k < d; ++k) {
      double diff = p[k] - last[k];
      acc += diff * diff;
    }
    // sqrt-then-compare matches the reference's np.linalg.norm(...) > dist
    // (postprocessing.py:421-426) bit for bit on razor-edge distances
    if (std::sqrt(acc) > dist) {
      out_idx[count++] = i;
      last = p;
    }
  }
  return count;
}

// Near-duplicate row suppression (reference utils/postprocessing.py:189-235
// inner loop): repeatedly remove the row whose nearest-neighbour distance
// among alive rows is smallest, while that distance <= threshold and fewer
// than max_removed rows were removed. Incremental NN maintenance makes this
// O(n^2 + removals * n) instead of the O(n^3) recompute-everything loop.
// rows: n*d row-major. out_removed: caller-allocated n ints (removal order).
// Returns number removed.
int filter_near_duplicates(const double* rows, int n, int d,
                           double threshold, int max_removed,
                           int* out_removed) {
  if (n <= 1 || max_removed <= 0) return 0;
  std::vector<double> dist2(static_cast<size_t>(n) * n, INF);
  auto row_d2 = [&](int i, int j) {
    const double* a = rows + static_cast<size_t>(i) * d;
    const double* b = rows + static_cast<size_t>(j) * d;
    double acc = 0.0;
    for (int k = 0; k < d; ++k) {
      double diff = a[k] - b[k];
      acc += diff * diff;
    }
    return acc;
  };
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      dist2[i * n + j] = dist2[j * n + i] = row_d2(i, j);

  std::vector<char> alive(n, 1);
  std::vector<double> nn(n);   // squared NN distance among alive rows
  std::vector<int> nn_of(n);
  auto recompute_nn = [&](int i) {
    double best = INF;
    int who = -1;
    for (int j = 0; j < n; ++j) {
      if (j == i || !alive[j]) continue;
      double v = dist2[i * n + j];
      if (v < best) { best = v; who = j; }
    }
    nn[i] = best;
    nn_of[i] = who;
  };
  for (int i = 0; i < n; ++i) recompute_nn(i);

  double thr2 = threshold * threshold;
  int removed = 0;
  while (removed < max_removed) {
    int victim = -1;
    double best = INF;
    for (int i = 0; i < n; ++i)
      if (alive[i] && nn[i] < best) { best = nn[i]; victim = i; }
    if (victim < 0 || best > thr2) break;
    alive[victim] = 0;
    out_removed[removed++] = victim;
    for (int i = 0; i < n; ++i)
      if (alive[i] && nn_of[i] == victim) recompute_nn(i);
  }
  return removed;
}

// Minimum spanning arborescence over a dense directed cost matrix
// (INF/huge = missing edge) with a virtual root connected to every node,
// then the longest (by hop count) path of the resulting branching.
// d2: n*n row-major costs. out_path: caller-allocated n ints.
// Returns path length (>0) or 0 on failure.
int chu_liu_edmonds_path(const double* d2, int n, double big,
                         int* out_path) {
  if (n <= 0) return 0;
  if (n == 1) { out_path[0] = 0; return 1; }
  int m = n + 1;  // + virtual root (index n)
  std::vector<double> cost(static_cast<size_t>(m) * m, INF);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      if (i != j && d2[i * n + j] < big) cost[i * m + j] = d2[i * n + j];
  for (int j = 0; j < n; ++j) cost[n * m + j] = big;  // virtual root edges

  std::vector<int> parent;
  if (!chu_liu_edmonds(m, n, cost, parent)) return 0;

  // children lists over real nodes (edges from virtual root start trees)
  std::vector<std::vector<int>> children(m);
  for (int v = 0; v < n; ++v)
    if (parent[v] >= 0) children[parent[v]].push_back(v);

  // longest path from any tree root: DFS depth + backtrack
  std::vector<int> best_path;
  std::vector<int> stack_nodes, stack_child_idx, cur;
  for (int r : children[n]) {
    // iterative DFS tracking the current path
    cur.clear();
    stack_nodes.assign(1, r);
    stack_child_idx.assign(1, 0);
    cur.push_back(r);
    if (cur.size() > best_path.size()) best_path = cur;
    while (!stack_nodes.empty()) {
      int node = stack_nodes.back();
      int ci = stack_child_idx.back();
      if (ci < static_cast<int>(children[node].size())) {
        int nxt = children[node][ci];
        ++stack_child_idx.back();
        stack_nodes.push_back(nxt);
        stack_child_idx.push_back(0);
        cur.push_back(nxt);
        if (cur.size() > best_path.size()) best_path = cur;
      } else {
        stack_nodes.pop_back();
        stack_child_idx.pop_back();
        cur.pop_back();
      }
    }
  }
  for (size_t i = 0; i < best_path.size(); ++i) out_path[i] = best_path[i];
  return static_cast<int>(best_path.size());
}

// Whole-stroke concat ordering (reference utils/cluster.py:12-102 =
// maskplanner_tpu/postprocess/concat.py): endpoint features with inferred
// starting velocity (weight 1.5) on both endpoints, kNN(k)/radius-bounded
// directed end->start squared-distance graph, Chu-Liu/Edmonds minimum
// spanning arborescence (virtual root) + unweighted longest path.
// traj: n_seg x (lam*outdim). Returns ordered segment count written to
// out_path, or 0 on failure (caller falls back to the Python path).
int concat_order(const double* traj, int n_seg, int lam, int outdim,
                 double radius, int k, int* out_path) {
  if (n_seg <= 0) return 0;
  if (n_seg == 1) {
    out_path[0] = 0;
    return 1;
  }
  const int row = lam * outdim;
  const int fdim = outdim + 3;
  std::vector<double> starts(static_cast<size_t>(n_seg) * fdim),
      ends(static_cast<size_t>(n_seg) * fdim);
  constexpr double VEL_WEIGHT = 1.5;
  for (int i = 0; i < n_seg; ++i) {
    const double* r = traj + static_cast<size_t>(i) * row;
    for (int kk = 0; kk < outdim; ++kk) {
      starts[i * fdim + kk] = r[kk];
      ends[i * fdim + kk] = r[(lam - 1) * outdim + kk];
    }
    for (int kk = 0; kk < 3; ++kk) {
      // lam=1 rows have no second pose -> zero velocity (concat.py:27-30)
      double v = (row >= outdim + 3)
                     ? VEL_WEIGHT * (r[outdim + kk] - r[kk])
                     : 0.0;
      starts[i * fdim + outdim + kk] = v;
      ends[i * fdim + outdim + kk] = v;
    }
  }
  // dense end_i -> start_j squared distances
  std::vector<double> d2(static_cast<size_t>(n_seg) * n_seg);
  for (int i = 0; i < n_seg; ++i)
    for (int j = 0; j < n_seg; ++j) {
      double acc = 0.0;
      for (int kk = 0; kk < fdim; ++kk) {
        double diff = ends[i * fdim + kk] - starts[j * fdim + kk];
        acc += diff * diff;
      }
      d2[i * n_seg + j] = acc;
    }
  // keep only each row's k nearest (argsort order), masked by radius
  const double big = radius;
  std::vector<double> masked(static_cast<size_t>(n_seg) * n_seg,
                             big * 10.0);
  int keff = k < n_seg ? k : n_seg;
  std::vector<int> idx(n_seg);
  for (int i = 0; i < n_seg; ++i) {
    for (int j = 0; j < n_seg; ++j) idx[j] = j;
    std::partial_sort(idx.begin(), idx.begin() + keff, idx.end(),
                      [&](int a, int b) {
                        return d2[i * n_seg + a] < d2[i * n_seg + b];
                      });
    for (int t = 0; t < keff; ++t) {
      int j = idx[t];
      if (i != j && d2[i * n_seg + j] < radius)
        masked[i * n_seg + j] = d2[i * n_seg + j];
    }
  }
  return chu_liu_edmonds_path(masked.data(), n_seg, big * 5.0, out_path);
}

// Per-item near-duplicate segment suppression across all strokes
// (reference utils/postprocessing.py:189-235; Python driver
// segments.py:filter_overlapping_segments). traj: S x D (modified in
// place: removed rows -> -100), ids: S (removed -> -1).
void filter_segments_item(double* traj, long long* ids, int S, int D,
                          double percentage, double threshold) {
  std::vector<int> order(S);
  // group rows by stroke id (stable)
  std::vector<std::pair<long long, int>> keyed(S);
  for (int i = 0; i < S; ++i) keyed[i] = {ids[i], i};
  std::stable_sort(keyed.begin(), keyed.end());
  int pos = 0;
  std::vector<double> rows;
  std::vector<int> members, removed;
  while (pos < S) {
    long long sid = keyed[pos].first;
    int end = pos;
    while (end < S && keyed[end].first == sid) ++end;
    if (sid != -1) {
      int n = end - pos;
      if (static_cast<double>(n) > 1.0 / percentage) {
        members.assign(n, 0);
        rows.assign(static_cast<size_t>(n) * D, 0.0);
        for (int t = 0; t < n; ++t) {
          members[t] = keyed[pos + t].second;
          std::memcpy(&rows[static_cast<size_t>(t) * D],
                      traj + static_cast<size_t>(members[t]) * D,
                      sizeof(double) * D);
        }
        int to_filter = static_cast<int>(n * percentage);
        removed.assign(n, 0);
        int n_removed = filter_near_duplicates(rows.data(), n, D, threshold,
                                               to_filter, removed.data());
        for (int t = 0; t < n_removed; ++t) {
          int orig = members[removed[t]];
          for (int kk = 0; kk < D; ++kk)
            traj[static_cast<size_t>(orig) * D + kk] = -100.0;
          ids[orig] = -1;
        }
      }
    }
    pos = end;
  }
}

// Jonker-Volgenant shortest augmenting path LAP on a dense row-major cost
// matrix (n_rows >= n_cols required). row4col[j] = assigned row of col j.
void solve_lap(const double* cost, int n_rows, int n_cols, int* row4col) {
  int n = n_rows > n_cols ? n_rows : n_cols;
  double big = 0.0;
  for (int i = 0; i < n_rows * n_cols; ++i)
    big = std::fmax(big, std::fabs(cost[i]));
  big = big * 2.0 + 1.0;

  std::vector<double> c(static_cast<size_t>(n) * n, big);
  for (int i = 0; i < n_rows; ++i)
    for (int j = 0; j < n_cols; ++j) c[i * n + j] = cost[i * n_cols + j];

  std::vector<double> u(n, 0.0), v(n, 0.0), shortest(n);
  std::vector<int> col4row(n, -1), r4c(n, -1), path(n);
  std::vector<char> sr(n), sc(n);

  for (int cur_row = 0; cur_row < n; ++cur_row) {
    std::fill(shortest.begin(), shortest.end(), INF);
    std::fill(path.begin(), path.end(), -1);
    std::fill(sr.begin(), sr.end(), 0);
    std::fill(sc.begin(), sc.end(), 0);
    int i = cur_row, sink = -1;
    double minval = 0.0;
    while (sink < 0) {
      sr[i] = 1;
      double lowest = INF;
      int jlow = -1;
      for (int j = 0; j < n; ++j) {
        if (sc[j]) continue;
        double d = minval + c[i * n + j] - u[i] - v[j];
        if (d < shortest[j]) { shortest[j] = d; path[j] = i; }
        if (shortest[j] < lowest) { lowest = shortest[j]; jlow = j; }
      }
      minval = lowest;
      sc[jlow] = 1;
      if (r4c[jlow] < 0) sink = jlow;
      else i = r4c[jlow];
    }
    u[cur_row] += minval;
    for (int k = 0; k < n; ++k) {
      if (sr[k] && k != cur_row) u[k] += minval - shortest[col4row[k]];
      if (sc[k]) v[k] += shortest[k] - minval;
    }
    int j = sink;
    while (true) {
      int pi = path[j];
      r4c[j] = pi;
      int prev = col4row[pi];
      col4row[pi] = j;
      if (pi == cur_row) break;
      j = prev;
    }
  }
  for (int j = 0; j < n_cols; ++j) row4col[j] = r4c[j];
}

}  // extern "C"

// Whole-item stroke postprocess (the per-stroke tail of reference
// utils/postprocessing.py:155-324 fused into one call): for each stroke id
// (ascending, -1 skipped) gather its segments, order them via the Edmonds
// concat (utils/cluster.py:12-102), trim overlapping poses between
// adjacent segments (:350-391), then equal-space resample [+ 5x Akima
// upsample + Gaussian smoothing] (:269-312). Outputs the concatenated
// per-pose trajectory and per-pose stroke ids.
//
// traj: S x (lam*outdim) row-major (post segment-filtering; -100 rows ok);
// ids:  S (int64, -1 = dropped). out must hold out_cap doubles; out_ids
// must hold out_cap/outdim doubles. Returns total pose count, or -1 when
// out_cap is insufficient.
namespace {

// One stroke's full tail: gather -> concat order -> overlap trim ->
// resample/upsample/smooth. Returns pose count written to `result`
// (outdim columns per pose), or -2 when the concat solve bailed.
int process_one_stroke(const double* traj, const long long* ids, int S,
                       long long sid, int lam, int outdim, int knn,
                       double radius, double trim_dist,
                       double resample_dist, int do_interp,
                       double* result) {
  const int row = lam * outdim;
  std::vector<double> stroke;
  for (int s = 0; s < S; ++s) {
    if (ids[s] != sid) continue;
    const double* r = traj + static_cast<size_t>(s) * row;
    bool pad = true;
    for (int kk = 0; kk < row && pad; ++kk) pad = (r[kk] == -100.0);
    if (!pad) stroke.insert(stroke.end(), r, r + row);
  }
  int n_seg = static_cast<int>(stroke.size()) / row;
  if (n_seg == 0) return 0;

  std::vector<int> path(n_seg);
  int plen = concat_order(stroke.data(), n_seg, lam, outdim, radius, knn,
                          path.data());
  if (plen <= 0) return -2;
  std::vector<double> ordered(static_cast<size_t>(plen) * row);
  for (int t = 0; t < plen; ++t)
    std::memcpy(&ordered[static_cast<size_t>(t) * row],
                &stroke[static_cast<size_t>(path[t]) * row],
                sizeof(double) * row);

  std::vector<int> keep(static_cast<size_t>(plen) * lam);
  int n_keep = trim_overlap_keep(ordered.data(), plen, lam, outdim,
                                 trim_dist, keep.data());

  // reshape to poses with suffix -100-padding dropped (from_seq_to_pc
  // semantics, data/pointcloud.py:120-154), then apply the keep walk
  int n_poses = plen * lam;
  for (int p = 0; p < n_poses; ++p) {
    const double* q = &ordered[static_cast<size_t>(p) * outdim];
    if (q[0] == -100.0 && q[1] == -100.0 && q[2] == -100.0) {
      n_poses = p;
      break;
    }
  }
  std::vector<double> poses;
  for (int t = 0; t < n_keep; ++t) {
    int p = keep[t];
    if (p >= n_poses) continue;
    const double* q = &ordered[static_cast<size_t>(p) * outdim];
    poses.insert(poses.end(), q, q + outdim);
  }
  int np_ = static_cast<int>(poses.size()) / outdim;
  if (np_ == 0) return 0;

  return resample_upsample_smooth(poses.data(), np_, outdim, resample_dist,
                                  do_interp, result);
}

// worst-case output poses for one stroke of n_seg segments
inline long long stroke_out_cap(long long n_seg, int lam) {
  return (n_seg * lam * 10 + 2) * 5;
}

}  // namespace

extern "C" long long process_strokes_item(
    const double* traj, const long long* ids, int S, int lam, int outdim,
    int knn, double radius, double trim_dist, double resample_dist,
    int do_interp, double* out, double* out_ids, long long out_cap) {
  // ascending unique stroke ids (np.unique order of the Python loop)
  std::vector<long long> uniq(ids, ids + S);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  std::vector<long long> sids;
  for (long long sid : uniq)
    if (sid != -1) sids.push_back(sid);
  const int n_strokes = static_cast<int>(sids.size());

  // per-stroke segment counts -> disjoint worst-case output slices, so
  // strokes can run concurrently writing straight into `out`
  std::vector<long long> seg_count(n_strokes, 0), offset(n_strokes + 1, 0);
  for (int i = 0; i < n_strokes; ++i) {
    for (int s = 0; s < S; ++s)
      if (ids[s] == sids[i]) ++seg_count[i];
    offset[i + 1] = offset[i] + stroke_out_cap(seg_count[i], lam);
  }
  if (offset[n_strokes] * outdim > out_cap) return -1;

  // strokes are independent: a small pool (reference caps its postprocess
  // pool at 8 threads, utils/postprocessing.py:155) fills the disjoint
  // slices; single-core machines take the no-thread path
  std::vector<int> counts(n_strokes, 0);
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = static_cast<int>(
      std::min<unsigned>(std::min(hw ? hw : 1u, 8u),
                         static_cast<unsigned>(n_strokes ? n_strokes : 1)));
  auto work = [&](int t0) {
    for (int i = t0; i < n_strokes; i += n_threads)
      counts[i] = process_one_stroke(traj, ids, S, sids[i], lam, outdim,
                                     knn, radius, trim_dist, resample_dist,
                                     do_interp, out + offset[i] * outdim);
  };
  if (n_threads <= 1) {
    work(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 1; t < n_threads; ++t) pool.emplace_back(work, t);
    work(0);
    for (auto& th : pool) th.join();
  }

  // compact the slices left-to-right (already in ascending-id order)
  long long total = 0;
  for (int i = 0; i < n_strokes; ++i) {
    if (counts[i] == -2) return -2;  // caller falls back to the Python loop
    if (counts[i] <= 0) continue;
    if (total != offset[i])
      std::memmove(out + total * outdim, out + offset[i] * outdim,
                   static_cast<size_t>(counts[i]) * outdim * sizeof(double));
    for (int t = 0; t < counts[i]; ++t)
      out_ids[total + t] = static_cast<double>(sids[i]);
    total += counts[i];
  }
  return total;
}
