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
//        [--adaptive] [--race TOL] [--maxit N] [--load FILE]
//
// --adaptive: run the SAME adaptive inner-sweep schedule as the TPU engine
//   (ops/nnls.py sweep_cap_update): cap 8 sweeps/solve until the outer tol
//   (1 - Pearson(W_new, W_prev)) first drops to max(10 * tol_target, 1e-4),
//   then latch the full 100-sweep reference cap. Makes the iteration-rate
//   ratio vs the TPU bench apples-to-apples on inner-solve depth.
// --race TOL: convergence race — iterate until outer tol <= TOL (or
//   --maxit), report wall-clock + iterations. The claim users care about:
//   time-to-converged-model, each side free to use its own schedule.
// --load FILE: read the operand + W0 (binary, written by
//   benchmarks/race_baseline.py) instead of self-generating, so the race
//   runs on the IDENTICAL operand and init as the TPU side.
//   Format (little-endian): int64 genes, cells, k, nnz; int64 indptr
//   [cells+1]; int32 indices [nnz]; float32 values [nnz]; float32 W0
//   [k * genes] (column-major: W0[:, g] = factor vector of gene g).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <string>
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
                    double L1, int max_sweeps) {
  double tol = 1.0;
  for (int it = 0; it < max_sweeps && tol / k > 1e-8; ++it) {
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
                        std::vector<double>& Y, int k, double L1,
                        int max_sweeps) {
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
      nnls_cd(a, k, b.data(), Y.data() + (size_t)k * c, L1, max_sweeps);
    }
  }
}

// 1 - Pearson(x, y) over all entries — the TPU engine's outer convergence
// metric (solvers/als.py cor_distance), identical here for a fair race
static double cor_distance(const std::vector<double>& x,
                           const std::vector<double>& y) {
  const size_t n = x.size();
  double sx = 0, sy = 0, sxx = 0, syy = 0, sxy = 0;
  for (size_t i = 0; i < n; ++i) {
    sx += x[i]; sy += y[i];
    sxx += x[i] * x[i]; syy += y[i] * y[i]; sxy += x[i] * y[i];
  }
  const double cov = sxy - sx * sy / (double)n;
  const double vx = sxx - sx * sx / (double)n;
  const double vy = syy - sy * sy / (double)n;
  return 1.0 - cov / (std::sqrt(vx * vy) + 1e-30);
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
  int genes = 16384, cells = 8192, k = 50, iters = 5, maxit = 1000;
  double density = 0.07, race_tol = -1.0;
  bool adaptive = false;
  const char* load_path = nullptr;
  int npos = 0;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--adaptive") adaptive = true;
    else if (a == "--race" && i + 1 < argc) race_tol = atof(argv[++i]);
    else if (a == "--maxit" && i + 1 < argc) maxit = atoi(argv[++i]);
    else if (a == "--load" && i + 1 < argc) load_path = argv[++i];
    else {
      switch (npos++) {
        case 0: genes = atoi(argv[i]); break;
        case 1: cells = atoi(argv[i]); break;
        case 2: k = atoi(argv[i]); break;
        case 3: density = atof(argv[i]); break;
        case 4: iters = atoi(argv[i]); break;
      }
    }
  }

  std::mt19937_64 rng(42);
  Csc A, At;
  std::vector<double> W, H, d;
  if (load_path) {
    FILE* f = fopen(load_path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", load_path); return 1; }
    int64_t hdr[4];
    if (fread(hdr, sizeof(int64_t), 4, f) != 4) return 1;
    genes = (int)hdr[0]; cells = (int)hdr[1]; k = (int)hdr[2];
    size_t nnz = (size_t)hdr[3];
    std::vector<int64_t> ip(cells + 1);
    if (fread(ip.data(), sizeof(int64_t), cells + 1, f) != (size_t)cells + 1)
      return 1;
    std::vector<int32_t> idx(nnz);
    std::vector<float> val(nnz), w0((size_t)k * genes);
    if (fread(idx.data(), sizeof(int32_t), nnz, f) != nnz) return 1;
    if (fread(val.data(), sizeof(float), nnz, f) != nnz) return 1;
    if (fread(w0.data(), sizeof(float), (size_t)k * genes, f) !=
        (size_t)k * genes) return 1;
    fclose(f);
    A.rows = genes; A.cols = cells;
    A.indptr.assign(ip.begin(), ip.end());
    A.indices.assign(idx.begin(), idx.end());
    A.values.assign(val.begin(), val.end());
    W.assign(w0.begin(), w0.end());
    density = (double)nnz / ((double)genes * cells);
  } else {
    // synthetic sparse CSC with uniform values
    std::uniform_real_distribution<double> uni(0.1, 3.0);
    std::geometric_distribution<int> gap(density);
    A.rows = genes; A.cols = cells;
    A.indptr.push_back(0);
    for (int c = 0; c < cells; ++c) {
      int r = gap(rng);
      while (r < genes) {
        A.indices.push_back(r);
        A.values.push_back(uni(rng));
        r += 1 + gap(rng);
      }
      A.indptr.push_back((int)A.indices.size());
    }
    W.resize((size_t)k * genes);
    std::uniform_real_distribution<double> u01(0.0, 1.0);
    for (auto& v : W) v = u01(rng);
  }
  // transpose
  At.rows = cells; At.cols = genes;
  {
    std::vector<int> counts(genes + 1, 0);
    for (int p = 0; p < (int)A.indices.size(); ++p) counts[A.indices[p] + 1]++;
    At.indptr.resize(genes + 1);
    At.indptr[0] = 0;
    for (int g = 0; g < genes; ++g) At.indptr[g + 1] = At.indptr[g] + counts[g + 1];
    At.indices.resize(A.indices.size());
    At.values.resize(A.values.size());
    std::vector<int> pos(At.indptr.begin(), At.indptr.end() - 1);
    for (int c = 0; c < cells; ++c)
      for (int p = A.indptr[c]; p < A.indptr[c + 1]; ++p) {
        int g = A.indices[p];
        At.indices[pos[g]] = c;
        At.values[pos[g]] = A.values[p];
        pos[g]++;
      }
  }
  H.assign((size_t)k * cells, 0.0);
  d.resize(k);

  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif

  // adaptive schedule state (mirrors ops/nnls.py sweep_cap_update):
  // fast cap 8 until outer tol <= max(10 * tol_target, 1e-4), then latch 100
  const double tol_target = race_tol > 0 ? race_tol : 0.0;
  const double exact_thresh = std::max(10.0 * tol_target, 1e-4);
  bool exact = false;
  double tol_prev = 1.0;
  auto cap_for_iter = [&]() {
    if (!adaptive) return 100;
    exact = exact || (tol_prev <= exact_thresh);
    return exact ? 100 : 8;
  };

  if (race_tol > 0) {
    // convergence race: wall-clock (incl. every iteration from the cold
    // start) until tol = 1 - Pearson(W_new, W_prev) <= race_tol
    std::vector<double> Wprev;
    auto t0 = std::chrono::steady_clock::now();
    int it = 0;
    double tol = 1.0;
    for (; it < maxit && tol > race_tol; ++it) {
      int cap = cap_for_iter();
      half_update(A, W, H, k, 0.01, cap);
      scale_rows(H, k, cells, d);
      Wprev = W;
      half_update(At, H, W, k, 0.01, cap);
      scale_rows(W, k, genes, d);
      tol = cor_distance(W, Wprev);
      tol_prev = tol;
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    printf(
        "{\"mode\": \"race\", \"genes\": %d, \"cells\": %d, \"k\": %d, "
        "\"density\": %.4f, \"threads\": %d, \"adaptive\": %s, "
        "\"race_tol\": %g, \"converged\": %s, \"iters\": %d, "
        "\"wall_s\": %.3f, \"final_tol\": %.3e, \"nnz\": %zu}\n",
        genes, cells, k, density, threads, adaptive ? "true" : "false",
        race_tol, tol <= race_tol ? "true" : "false", it, secs, tol,
        A.values.size());
    return 0;
  }

  // throughput mode: warmup iteration (first-touch, caches), then timed
  {
    int cap = cap_for_iter();
    half_update(A, W, H, k, 0.01, cap);
    scale_rows(H, k, cells, d);
    std::vector<double> Wprev = W;
    half_update(At, H, W, k, 0.01, cap);
    scale_rows(W, k, genes, d);
    tol_prev = cor_distance(W, Wprev);
  }
  auto t0 = std::chrono::steady_clock::now();
  std::vector<double> Wprev;
  for (int it = 0; it < iters; ++it) {
    int cap = cap_for_iter();
    half_update(A, W, H, k, 0.01, cap);
    scale_rows(H, k, cells, d);
    Wprev = W;
    half_update(At, H, W, k, 0.01, cap);
    scale_rows(W, k, genes, d);
    tol_prev = cor_distance(W, Wprev);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double ips = iters / secs;
  printf(
      "{\"genes\": %d, \"cells\": %d, \"k\": %d, \"density\": %.3f, "
      "\"threads\": %d, \"adaptive\": %s, \"iters_per_s\": %.4f, "
      "\"cells_per_s\": %.1f, \"final_tol\": %.3e, \"nnz\": %zu}\n",
      genes, cells, k, density, threads, adaptive ? "true" : "false", ips,
      ips * cells, tol_prev, A.values.size());
  return 0;
}
