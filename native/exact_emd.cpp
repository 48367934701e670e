// Exact earth-mover distance via the transportation simplex.
//
// Native counterpart of the reference's two exact-EMD backends — the qpth
// QP relaxation (reference src/loss_multilabel.py:113-170) and cv2.EMD
// (:172-199).  Solves the balanced transportation LP
//     min sum_ij c_ij x_ij   s.t.  sum_j x_ij = s_i, sum_i x_ij = d_j
// with the classic MODI / u-v method on a spanning-tree basis (the same
// algorithm family cv2.EMD uses).  Marginals are normalised internally the
// way the reference's opencv path does (relu + 1e-5, scaled to the support
// size).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Cell {
  int i, j;
};

// Find a loop in the basis containing entering cell (ei, ej).
// Basis is given as a boolean matrix; loop alternates row/col moves.
bool find_loop(const std::vector<char>& basis, int n, int m, int ei, int ej,
               std::vector<Cell>& loop) {
  // DFS over alternating row/column moves.
  loop.clear();
  loop.push_back({ei, ej});
  std::vector<Cell> stack;

  // recursive lambda via explicit stack of (position, nextdir, tried index)
  struct Frame {
    Cell c;
    bool row_move;  // next move along the row (change j) or column (change i)
    int next;       // next candidate index
  };
  std::vector<Frame> frames;
  frames.push_back({{ei, ej}, true, 0});
  while (!frames.empty()) {
    Frame& f = frames.back();
    bool advanced = false;
    if (f.row_move) {
      for (int j = f.next; j < m; j++) {
        if (j == f.c.j) continue;
        if (!basis[(size_t)f.c.i * m + j] &&
            !(f.c.i == ei && j == ej))
          continue;
        // candidate (f.c.i, j)
        if (f.c.i == ei && j == ej && frames.size() >= 4) {
          // closed the loop
          loop.resize(frames.size());
          for (size_t k = 0; k < frames.size(); k++) loop[k] = frames[k].c;
          return true;
        }
        if (basis[(size_t)f.c.i * m + j]) {
          f.next = j + 1;
          frames.push_back({{f.c.i, j}, false, 0});
          advanced = true;
          break;
        }
      }
    } else {
      for (int i = f.next; i < n; i++) {
        if (i == f.c.i) continue;
        if (i == ei && f.c.j == ej) {
          if (frames.size() >= 3) {
            loop.resize(frames.size());
            for (size_t k = 0; k < frames.size(); k++) loop[k] = frames[k].c;
            return true;
          }
          continue;
        }
        if (basis[(size_t)i * m + f.c.j]) {
          f.next = i + 1;
          frames.push_back({{i, f.c.j}, true, 0});
          advanced = true;
          break;
        }
      }
    }
    if (!advanced) frames.pop_back();
  }
  return false;
}

}  // namespace

extern "C" {

// cost: n x m; supply: n; demand: m (will be normalised to equal mass).
// flow_out (optional, may be null): n x m optimal transport plan.
// Returns the optimal total cost sum(c * x).
float muscle_exact_emd(const float* cost, const float* supply_in,
                       const float* demand_in, int n, int m,
                       float* flow_out) {
  std::vector<double> s(n), d(m);
  double ssum = 0, dsum = 0;
  for (int i = 0; i < n; i++) {
    s[i] = supply_in[i] > 0 ? supply_in[i] : 0;
    s[i] += 1e-5;
    ssum += s[i];
  }
  for (int j = 0; j < m; j++) {
    d[j] = demand_in[j] > 0 ? demand_in[j] : 0;
    d[j] += 1e-5;
    dsum += d[j];
  }
  // balance to unit mass
  for (int i = 0; i < n; i++) s[i] /= ssum;
  for (int j = 0; j < m; j++) d[j] /= dsum;

  std::vector<double> x((size_t)n * m, 0.0);
  std::vector<char> basis((size_t)n * m, 0);

  // --- north-west corner initial basis ---
  {
    int i = 0, j = 0;
    std::vector<double> rs = s, rd = d;
    while (i < n && j < m) {
      double q = rs[i] < rd[j] ? rs[i] : rd[j];
      x[(size_t)i * m + j] = q;
      basis[(size_t)i * m + j] = 1;
      rs[i] -= q;
      rd[j] -= q;
      if (rs[i] <= 1e-15 && i < n - 1)
        i++;
      else if (rd[j] <= 1e-15 && j < m - 1)
        j++;
      else if (rs[i] <= 1e-15 && rd[j] <= 1e-15) {
        i++;
        j++;
      } else if (rs[i] <= 1e-15)
        i++;
      else
        j++;
    }
  }

  std::vector<double> u(n), v(m);
  std::vector<char> useen(n), vseen(m);
  std::vector<Cell> loop;

  for (int iter = 0; iter < 4 * n * m; iter++) {
    // --- compute potentials u, v from basis (u0 = 0) ---
    std::fill(useen.begin(), useen.end(), 0);
    std::fill(vseen.begin(), vseen.end(), 0);
    u[0] = 0;
    useen[0] = 1;
    bool progressed = true;
    while (progressed) {
      progressed = false;
      for (int i = 0; i < n; i++)
        for (int j = 0; j < m; j++) {
          if (!basis[(size_t)i * m + j]) continue;
          if (useen[i] && !vseen[j]) {
            v[j] = cost[(size_t)i * m + j] - u[i];
            vseen[j] = 1;
            progressed = true;
          } else if (!useen[i] && vseen[j]) {
            u[i] = cost[(size_t)i * m + j] - v[j];
            useen[i] = 1;
            progressed = true;
          }
        }
    }
    // degenerate disconnected basis: assign zero potentials to unseen
    for (int i = 0; i < n; i++)
      if (!useen[i]) u[i] = 0;
    for (int j = 0; j < m; j++)
      if (!vseen[j]) v[j] = 0;

    // --- entering cell: most negative reduced cost ---
    double best = -1e-9;
    int ei = -1, ej = -1;
    for (int i = 0; i < n; i++)
      for (int j = 0; j < m; j++) {
        if (basis[(size_t)i * m + j]) continue;
        double rc = cost[(size_t)i * m + j] - u[i] - v[j];
        if (rc < best) {
          best = rc;
          ei = i;
          ej = j;
        }
      }
    if (ei < 0) break;  // optimal

    if (!find_loop(basis, n, m, ei, ej, loop)) break;  // numerical safety

    // --- pivot: minimum of the odd (leaving) positions ---
    double theta = 1e30;
    int leave = -1;
    for (size_t k = 1; k < loop.size(); k += 2) {
      double val = x[(size_t)loop[k].i * m + loop[k].j];
      if (val < theta) {
        theta = val;
        leave = (int)k;
      }
    }
    for (size_t k = 0; k < loop.size(); k++) {
      double* cell = &x[(size_t)loop[k].i * m + loop[k].j];
      *cell += (k % 2 == 0) ? theta : -theta;
    }
    basis[(size_t)ei * m + ej] = 1;
    basis[(size_t)loop[leave].i * m + loop[leave].j] = 0;
  }

  double total = 0;
  for (int i = 0; i < n; i++)
    for (int j = 0; j < m; j++) total += x[(size_t)i * m + j] * cost[(size_t)i * m + j];
  if (flow_out)
    for (size_t k = 0; k < (size_t)n * m; k++) flow_out[k] = (float)x[k];
  return (float)total;
}

}  // extern "C"
