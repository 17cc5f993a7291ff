// CPU baseline benchmark: reference-semantics sparse ALS-NMF in plain C++.
//
// A fresh implementation (no code copied) of the algorithm the reference's
// C++ core runs (sequential coordinate-descent NNLS per column against the
// k x k Gram, sparse CSC gather for the right-hand sides, OpenMP over
// columns; semantics per SURVEY.md §2 / reference:src/singlet.cpp:229-347).
// Used only to measure the CPU cells/s denominator for bench.py's
// vs_baseline ratio on THIS host.
//
// Build: g++ -O3 -march=native -fopenmp -o baseline_bench baseline_bench.cpp
// Run:   ./baseline_bench <genes> <cells> <k> <density> <iters>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

struct Csc {
  int rows = 0, cols = 0;
  std::vector<int> indptr, indices;
  std::vector<double> values;
};

// column-major dense matrix helpers
static inline double* col(std::vector<double>& m, int nrows, int c) {
  return m.data() + (size_t)nrows * c;
}

// sequential coordinate-descent NNLS on a x = b, warm-started; clamp at zero
static void nnls_cd(const std::vector<double>& a, int k, double* b, double* x,
                    double L1) {
  double tol = 1.0;
  for (int it = 0; it < 100 && tol / k > 1e-8; ++it) {
    tol = 0.0;
    for (int i = 0; i < k; ++i) {
      double diff = b[i] / a[(size_t)i * k + i] - L1;
      if (-diff > x[i]) {
        if (x[i] != 0.0) {
          const double* ac = a.data() + (size_t)i * k;
          for (int j = 0; j < k; ++j) b[j] += ac[j] * x[i];
          tol = 1.0;
          x[i] = 0.0;
        }
      } else if (diff != 0.0) {
        x[i] += diff;
        const double* ac = a.data() + (size_t)i * k;
        for (int j = 0; j < k; ++j) b[j] -= ac[j] * diff;
        tol += std::fabs(diff / (x[i] + 1e-15));
      }
    }
  }
}

// gram = X X^T for X stored k x m column-major (column j = factor vector of
// feature j), plus tiny diagonal jitter
static void gram(const std::vector<double>& X, int k, int m,
                 std::vector<double>& out) {
  std::fill(out.begin(), out.end(), 0.0);
  for (int j = 0; j < m; ++j) {
    const double* xc = X.data() + (size_t)k * j;
    for (int r = 0; r < k; ++r)
      for (int c = 0; c < k; ++c) out[(size_t)c * k + r] += xc[r] * xc[c];
  }
  for (int i = 0; i < k; ++i) out[(size_t)i * k + i] += 1e-15;
}

// half-update: for every column c of A (CSC), gather b = sum_nz v * X[:, row]
// and solve NNLS into Y[:, c]
static void half_update(const Csc& A, const std::vector<double>& X,
                        std::vector<double>& Y, int k, double L1) {
  std::vector<double> a((size_t)k * k);
  gram(X, k, A.rows, a);
#pragma omp parallel
  {
    std::vector<double> b(k);
#pragma omp for schedule(dynamic, 64)
    for (int c = 0; c < A.cols; ++c) {
      if (A.indptr[c] == A.indptr[c + 1]) continue;
      std::fill(b.begin(), b.end(), 0.0);
      for (int p = A.indptr[c]; p < A.indptr[c + 1]; ++p) {
        const double v = A.values[p];
        const double* xc = X.data() + (size_t)k * A.indices[p];
        for (int i = 0; i < k; ++i) b[i] += v * xc[i];
      }
      std::vector<double> acopy = a;  // nnls mutates b only; a is shared
      nnls_cd(a, k, b.data(), Y.data() + (size_t)k * c, L1);
      (void)acopy;
    }
  }
}

static void scale_rows(std::vector<double>& X, int k, int m,
                       std::vector<double>& d) {
  std::fill(d.begin(), d.end(), 1e-15);
  for (int j = 0; j < m; ++j) {
    const double* xc = X.data() + (size_t)k * j;
    for (int i = 0; i < k; ++i) d[i] += xc[i];
  }
  for (int j = 0; j < m; ++j) {
    double* xc = X.data() + (size_t)k * j;
    for (int i = 0; i < k; ++i) xc[i] /= d[i];
  }
}

int main(int argc, char** argv) {
  int genes = argc > 1 ? atoi(argv[1]) : 16384;
  int cells = argc > 2 ? atoi(argv[2]) : 8192;
  int k = argc > 3 ? atoi(argv[3]) : 50;
  double density = argc > 4 ? atof(argv[4]) : 0.07;
  int iters = argc > 5 ? atoi(argv[5]) : 5;

  // synthetic sparse CSC (and its transpose) with uniform values
  std::mt19937_64 rng(42);
  std::uniform_real_distribution<double> uni(0.1, 3.0);
  std::geometric_distribution<int> gap(density);
  Csc A, At;
  A.rows = genes; A.cols = cells;
  At.rows = cells; At.cols = genes;
  A.indptr.push_back(0);
  std::vector<std::vector<std::pair<int, double>>> rowsbuf(genes);
  for (int c = 0; c < cells; ++c) {
    int r = gap(rng);
    while (r < genes) {
      double v = uni(rng);
      A.indices.push_back(r);
      A.values.push_back(v);
      rowsbuf[r].push_back({c, v});
      r += 1 + gap(rng);
    }
    A.indptr.push_back((int)A.indices.size());
  }
  At.indptr.push_back(0);
  for (int g = 0; g < genes; ++g) {
    for (auto& pr : rowsbuf[g]) {
      At.indices.push_back(pr.first);
      At.values.push_back(pr.second);
    }
    At.indptr.push_back((int)At.indices.size());
  }

  std::vector<double> W((size_t)k * genes), H((size_t)k * cells, 0.0), d(k);
  std::uniform_real_distribution<double> u01(0.0, 1.0);
  for (auto& v : W) v = u01(rng);

  // warmup iteration (first-touch, caches)
  half_update(A, W, H, k, 0.01);
  scale_rows(H, k, cells, d);
  half_update(At, H, W, k, 0.01);
  scale_rows(W, k, genes, d);

  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it) {
    half_update(A, W, H, k, 0.01);
    scale_rows(H, k, cells, d);
    half_update(At, H, W, k, 0.01);
    scale_rows(W, k, genes, d);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double ips = iters / secs;
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  printf(
      "{\"genes\": %d, \"cells\": %d, \"k\": %d, \"density\": %.3f, "
      "\"threads\": %d, \"iters_per_s\": %.4f, \"cells_per_s\": %.1f, "
      "\"nnz\": %zu}\n",
      genes, cells, k, density, threads, ips, ips * cells, A.values.size());
  return 0;
}
