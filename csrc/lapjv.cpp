// Exact linear-assignment solver (Jonker-Volgenant shortest augmenting
// path with dual potentials, O(n^2 m)).
//
// Native replacement for the scipy linear_sum_assignment dependency the
// reference leans on (training/hungarian_matcher.py:3,79): the host-exact
// assignment path for eval-time verification and host-callback matching,
// with a std::thread batch front-end so a whole padded batch solves in
// parallel. The TPU hot path uses the on-device optax Hungarian; this is
// the CPU-side oracle and data-pipeline solver.
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblapjv.so lapjv.cpp -lpthread
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Assign every row (n rows <= m cols) of an n x m cost matrix to a
// distinct column, minimizing total cost. row_to_col[i] = column of row i.
void solve_one(const float* cost, int n, int m, int32_t* row_to_col) {
  // 1-indexed potentials per the classic formulation.
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, 0), way(m + 1, 0);

  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(m + 1, kInf);
    std::vector<char> used(m + 1, 0);
    do {
      used[j0] = 1;
      const int i0 = p[j0];
      int j1 = 0;
      double delta = kInf;
      const float* row = cost + static_cast<size_t>(i0 - 1) * m;
      for (int j = 1; j <= m; ++j) {
        if (used[j]) continue;
        const double cur = static_cast<double>(row[j - 1]) - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      const int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != 0);
  }
  for (int j = 1; j <= m; ++j) {
    if (p[j] > 0) row_to_col[p[j] - 1] = j - 1;
  }
}

}  // namespace

extern "C" {

// cost: [n_rows, n_cols] row-major, n_rows <= n_cols.
// row_to_col: [n_rows] output, the assigned column per row.
// Returns 0 on success.
int lapjv_solve(const float* cost, int n_rows, int n_cols,
                int32_t* row_to_col) {
  if (n_rows <= 0) return 0;
  if (n_rows > n_cols || cost == nullptr || row_to_col == nullptr) return 1;
  solve_one(cost, n_rows, n_cols, row_to_col);
  return 0;
}

// Batched solve with optional row-count per sample (n_valid may be null →
// all n_rows). costs: [batch, n_rows, n_cols]; out: [batch, n_rows],
// unused rows set to -1.
int lapjv_solve_batch(const float* costs, int batch, int n_rows, int n_cols,
                      const int32_t* n_valid, int32_t* out, int n_threads) {
  if (batch <= 0) return 0;
  if (costs == nullptr || out == nullptr) return 1;
  const int hw = static_cast<int>(std::thread::hardware_concurrency());
  int workers = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  workers = std::min(workers, batch);

  std::fill(out, out + static_cast<size_t>(batch) * n_rows, -1);

  std::atomic<int> bad{0};
  auto work = [&](int start, int step) {
    for (int b = start; b < batch; b += step) {
      const int nv = n_valid ? n_valid[b] : n_rows;
      if (nv <= 0) continue;
      if (nv > n_cols || nv > n_rows) {
        // invalid sample: skip IT (not the worker's whole stripe) and
        // report — nv > n_rows would read past this sample's slab and
        // write past its out slice
        bad.store(1, std::memory_order_relaxed);
        continue;
      }
      const float* slab = costs + static_cast<size_t>(b) * n_rows * n_cols;
      bool finite = true;  // NaN costs make the augmenting loop spin forever
      for (int i = 0; finite && i < nv; ++i)
        for (int j = 0; j < n_cols; ++j)
          if (!std::isfinite(slab[static_cast<size_t>(i) * n_cols + j])) {
            finite = false;
            break;
          }
      if (!finite) {
        bad.store(2, std::memory_order_relaxed);
        continue;
      }
      solve_one(slab, nv, n_cols, out + static_cast<size_t>(b) * n_rows);
    }
  };
  if (workers == 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(workers);
    for (int t = 0; t < workers; ++t) threads.emplace_back(work, t, workers);
    for (auto& t : threads) t.join();
  }
  return bad.load(std::memory_order_relaxed) ? 2 : 0;
}

}  // extern "C"
