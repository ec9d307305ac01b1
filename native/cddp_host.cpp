// cddp-tpu native host runtime.
//
// C++ counterpart of the framework's CPU-side numerics, filling the role the
// reference's C++ core plays outside the TPU compute path:
//
//  - an independent double-precision BoxQP (projected-Newton active-set,
//    same algorithm family as src/cddp_core/boxqp.cpp) used as a
//    cross-language oracle in the test suite and as a host-side fallback;
//  - a dense LQR backward Riccati sweep (the verification oracle for the
//    lax.scan recursions);
//  - a std::thread batched BoxQP driver — the host-runtime analogue of the
//    reference's std::async fan-out (cddp_solver_base.cpp:264-314) for
//    workloads that stay on CPU.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
// Build: g++ -O3 -march=native -shared -fPIC cddp_host.cpp -o libcddp_host.so

#include <algorithm>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Solve A x = b for small dense symmetric PD A (n <= 16) via Cholesky.
// Returns false if not PD.
bool chol_solve(const double* A, const double* b, double* x, int n,
                int nrhs, double* work /* n*n */) {
  // Factor A = L L^T into work.
  std::memcpy(work, A, sizeof(double) * n * n);
  for (int j = 0; j < n; ++j) {
    double d = work[j * n + j];
    for (int k = 0; k < j; ++k) d -= work[j * n + k] * work[j * n + k];
    if (!(d > 0.0) || !std::isfinite(d)) return false;
    const double Ljj = std::sqrt(d);
    work[j * n + j] = Ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = work[i * n + j];
      for (int k = 0; k < j; ++k) s -= work[i * n + k] * work[j * n + k];
      work[i * n + j] = s / Ljj;
    }
  }
  // Solve L y = b, L^T x = y for each rhs column (b is n x nrhs, row-major).
  for (int r = 0; r < nrhs; ++r) {
    for (int i = 0; i < n; ++i) {
      double s = b[i * nrhs + r];
      for (int k = 0; k < i; ++k) s -= work[i * n + k] * x[k * nrhs + r];
      x[i * nrhs + r] = s / work[i * n + i];
    }
    for (int i = n - 1; i >= 0; --i) {
      double s = x[i * nrhs + r];
      for (int k = i + 1; k < n; ++k) s -= work[k * n + i] * x[k * nrhs + r];
      x[i * nrhs + r] = s / work[i * n + i];
    }
  }
  return true;
}

double qp_objective(const double* H, const double* g, const double* x, int n) {
  double v = 0.0;
  for (int i = 0; i < n; ++i) {
    double Hx = 0.0;
    for (int j = 0; j < n; ++j) Hx += H[i * n + j] * x[j];
    v += 0.5 * x[i] * Hx + g[i] * x[i];
  }
  return v;
}

}  // namespace

extern "C" {

// Status codes mirror BoxQPStatus (boxqp.hpp:46-54).
// Returns status; writes solution into x (length n) and free mask into
// free_mask (length n, 0/1).
int cddp_boxqp_solve(const double* H, const double* g, const double* lower,
                     const double* upper, const double* x0, int n, double* x,
                     int* free_mask, int max_iterations, double min_grad,
                     double min_rel_improve, double step_dec, double min_step,
                     double armijo) {
  std::vector<double> grad(n), gradc(n), search(n), xnew(n);
  std::vector<double> Hff(n * n), rhs(n), sol(n), work(n * n);
  std::vector<int> clamped(n, 0), old_clamped(n);

  for (int i = 0; i < n; ++i)
    x[i] = std::min(std::max(x0[i], lower[i]), upper[i]);

  double value = qp_objective(H, g, x, n);
  double old_value = 1e300;
  int status = 1;  // MAX_ITER_EXCEEDED

  for (int iter = 0; iter < max_iterations; ++iter) {
    if (iter > 0 && std::abs(old_value - value) <
                        min_rel_improve * std::abs(old_value)) {
      status = 4;  // SUCCESS
      break;
    }
    old_value = value;

    for (int i = 0; i < n; ++i) {
      double Hx = 0.0;
      for (int j = 0; j < n; ++j) Hx += H[i * n + j] * x[j];
      grad[i] = g[i] + Hx;
    }

    old_clamped = clamped;
    int n_clamped = 0;
    for (int i = 0; i < n; ++i) {
      clamped[i] = ((x[i] == lower[i] && grad[i] > 0) ||
                    (x[i] == upper[i] && grad[i] < 0))
                       ? 1
                       : 0;
      n_clamped += clamped[i];
    }
    if (n_clamped == n) {
      status = 5;  // ALL_CLAMPED
      break;
    }

    // Identity-padded free-block Hessian (same masking trick as the JAX path)
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        Hff[i * n + j] = (!clamped[i] && !clamped[j])
                             ? H[i * n + j]
                             : (i == j ? 1.0 : 0.0);

    double gn = 0.0;
    for (int i = 0; i < n; ++i)
      if (!clamped[i]) gn += grad[i] * grad[i];
    gn = std::sqrt(gn);
    if (gn < min_grad) {
      status = 4;
      break;
    }

    for (int i = 0; i < n; ++i) {
      double s = g[i];
      for (int j = 0; j < n; ++j)
        if (clamped[j]) s += H[i * n + j] * x[j];
      gradc[i] = clamped[i] ? 0.0 : -s;
    }
    if (!chol_solve(Hff.data(), gradc.data(), sol.data(), n, 1, work.data())) {
      status = -1;  // HESSIAN_NOT_PD
      break;
    }
    double sdotg = 0.0;
    for (int i = 0; i < n; ++i) {
      search[i] = clamped[i] ? 0.0 : (sol[i] - x[i]);
      sdotg += search[i] * grad[i];
    }
    if (sdotg >= 0) {
      status = 0;  // NO_DESCENT
      break;
    }

    double step = 1.0;
    bool accepted = false;
    while (step > min_step) {
      for (int i = 0; i < n; ++i)
        xnew[i] =
            std::min(std::max(x[i] + step * search[i], lower[i]), upper[i]);
      double vnew = qp_objective(H, g, xnew.data(), n);
      if (vnew - value <= armijo * step * sdotg) {
        accepted = true;
        value = vnew;
        std::memcpy(x, xnew.data(), sizeof(double) * n);
        break;
      }
      step *= step_dec;
    }
    if (!accepted) {
      status = 2;  // MAX_LS_EXCEEDED
      break;
    }
  }

  for (int i = 0; i < n; ++i) free_mask[i] = clamped[i] ? 0 : 1;
  return status;
}

// Batched BoxQP over B problems, fanned out over `threads` std::threads.
// Hs: (B, n, n) row-major; gs/lowers/uppers/x0s: (B, n); xs out (B, n);
// statuses out (B,).
void cddp_boxqp_solve_batch(const double* Hs, const double* gs,
                            const double* lowers, const double* uppers,
                            const double* x0s, int B, int n, double* xs,
                            int* statuses, int threads, int max_iterations,
                            double min_grad, double min_rel_improve,
                            double step_dec, double min_step, double armijo) {
  threads = std::max(1, std::min(threads, B));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int chunk = (B + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int lo = t * chunk;
    const int hi = std::min(B, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      std::vector<int> fm(n);
      for (int b = lo; b < hi; ++b) {
        statuses[b] = cddp_boxqp_solve(
            Hs + (size_t)b * n * n, gs + (size_t)b * n, lowers + (size_t)b * n,
            uppers + (size_t)b * n, x0s + (size_t)b * n, n,
            xs + (size_t)b * n, fm.data(), max_iterations, min_grad,
            min_rel_improve, step_dec, min_step, armijo);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Dense LQR backward Riccati sweep (oracle for the lax.scan recursion).
// Inputs row-major: Q (N+1, n, n), q (N+1, n), R (N, m, m), r (N, m),
// M (N, n, m), A (N, n, n), Bm (N, n, m).
// Outputs: K (N, m, n), k (N, m). Returns 0 on success, -1 if a Quu is
// not PD.
int cddp_lqr_backward(const double* Q, const double* q, const double* R,
                      const double* r, const double* M, const double* A,
                      const double* Bm, int N, int n, int m, double* K,
                      double* k) {
  std::vector<double> P(n * n), p(n), Pn(n * n);
  std::vector<double> Quu(m * m), Qux(m * n), Qu(m), rhs(m * (n + 1)),
      sol(m * (n + 1)), work(m * m), BtP(m * n);

  // terminal
  for (int i = 0; i < n * n; ++i)
    P[i] = 0.5 * (Q[(size_t)N * n * n + i] +
                  Q[(size_t)N * n * n + (i % n) * n + i / n]);
  for (int i = 0; i < n; ++i) p[i] = q[(size_t)N * n + i];

  for (int t = N - 1; t >= 0; --t) {
    const double* At = A + (size_t)t * n * n;
    const double* Bt = Bm + (size_t)t * n * m;
    const double* Rt = R + (size_t)t * m * m;
    const double* rt = r + (size_t)t * m;
    const double* Mt = M + (size_t)t * n * m;
    const double* Qt = Q + (size_t)t * n * n;
    const double* qt = q + (size_t)t * n;

    // BtP = B^T P
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < n; ++j) {
        double s = 0.0;
        for (int l = 0; l < n; ++l) s += Bt[l * m + i] * P[l * n + j];
        BtP[i * n + j] = s;
      }
    // Quu = sym(R + BtP B)
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < m; ++j) {
        double s = Rt[i * m + j];
        for (int l = 0; l < n; ++l) s += BtP[i * n + l] * Bt[l * m + j];
        Quu[i * m + j] = s;
      }
    for (int i = 0; i < m; ++i)
      for (int j = i + 1; j < m; ++j) {
        double v = 0.5 * (Quu[i * m + j] + Quu[j * m + i]);
        Quu[i * m + j] = Quu[j * m + i] = v;
      }
    // Qux = BtP A + M^T ; Qu = r + B^T p
    for (int i = 0; i < m; ++i) {
      for (int j = 0; j < n; ++j) {
        double s = Mt[j * m + i];
        for (int l = 0; l < n; ++l) s += BtP[i * n + l] * At[l * n + j];
        Qux[i * n + j] = s;
      }
      double s = rt[i];
      for (int l = 0; l < n; ++l) s += Bt[l * m + i] * p[l];
      Qu[i] = s;
    }
    // Solve Quu [k | K] = [Qu | Qux]
    for (int i = 0; i < m; ++i) {
      rhs[i * (n + 1)] = Qu[i];
      for (int j = 0; j < n; ++j) rhs[i * (n + 1) + 1 + j] = Qux[i * n + j];
    }
    if (!chol_solve(Quu.data(), rhs.data(), sol.data(), m, n + 1, work.data()))
      return -1;
    for (int i = 0; i < m; ++i) {
      k[(size_t)t * m + i] = -sol[i * (n + 1)];
      for (int j = 0; j < n; ++j)
        K[(size_t)t * m * n + i * n + j] = -sol[i * (n + 1) + 1 + j];
    }
    // P_t = sym(Q + A^T P A + Qux^T K + K^T Qux + K^T Quu K)
    // p_t = Qx + Qux^T k + K^T Qu + K^T Quu k ; Qx = q + A^T p
    std::vector<double> Kt(m * n), kt(m), Qx(n);
    for (int i = 0; i < m; ++i) {
      kt[i] = k[(size_t)t * m + i];
      for (int j = 0; j < n; ++j) Kt[i * n + j] = K[(size_t)t * m * n + i * n + j];
    }
    for (int i = 0; i < n; ++i) {
      double s = qt[i];
      for (int l = 0; l < n; ++l) s += At[l * n + i] * p[l];
      Qx[i] = s;
    }
    // Pn = A^T P A
    std::vector<double> PA(n * n);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double s = 0.0;
        for (int l = 0; l < n; ++l) s += P[i * n + l] * At[l * n + j];
        PA[i * n + j] = s;
      }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double s = Qt[i * n + j];
        for (int l = 0; l < n; ++l) s += At[l * n + i] * PA[l * n + j];
        // + Qux^T K + K^T Qux + K^T Quu K
        for (int l = 0; l < m; ++l) s += Qux[l * n + i] * Kt[l * n + j];
        for (int l = 0; l < m; ++l) s += Kt[l * n + i] * Qux[l * n + j];
        for (int l = 0; l < m; ++l) {
          double QuuK = 0.0;
          for (int o = 0; o < m; ++o) QuuK += Quu[l * m + o] * Kt[o * n + j];
          s += Kt[l * n + i] * QuuK;
        }
        Pn[i * n + j] = s;
      }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        P[i * n + j] = 0.5 * (Pn[i * n + j] + Pn[j * n + i]);
    for (int i = 0; i < n; ++i) {
      double s = Qx[i];
      for (int l = 0; l < m; ++l) s += Qux[l * n + i] * kt[l];
      for (int l = 0; l < m; ++l) s += Kt[l * n + i] * Qu[l];
      for (int l = 0; l < m; ++l) {
        double Quuk = 0.0;
        for (int o = 0; o < m; ++o) Quuk += Quu[l * m + o] * kt[o];
        s += Kt[l * n + i] * Quuk;
      }
      p[i] = s;
    }
  }
  return 0;
}

}  // extern "C"
