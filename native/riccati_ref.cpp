// Native (C++) reference implementation of the proximal Riccati solver.
//
// Role: an implementation-independent oracle for the JAX solver
// (aligator_tpu/gar/riccati.py) — the same stagewise recursion coded twice,
// cross-validated in tests/test_native.py — and a low-latency CPU fallback
// for single-scenario MPC deployments without an accelerator.
//
// Math follows the dual-regularized stagewise elimination (see the JAX module
// docstring; reference algorithm: include/aligator/gar/riccati-kernel.hxx):
// per stage, with value function V(y) = 1/2 y'P y + p'y,
//   Ptilde = E^{-T} P E^{-1},  ptilde = -E^{-T} p
//   (I + mudyn*Ptilde) Vxx = Ptilde ; (I + mudyn*Ptilde) vx = ptilde + Ptilde f
//   Qhat = Q + A'Vxx A, etc.; reduced KKT solved by SPD Schur elimination
//   (W = Rhat + D'D/mueq), gains and value recursion as in the JAX kernel.
//
// Self-contained dense linear algebra (row-major):
//   - Cholesky factorization/solve for SPD systems
//   - partial-pivot LU for general E blocks
// Exposed as a C ABI for ctypes (aligator_tpu/native.py).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

using Mat = std::vector<double>; // row-major buffers

// C = A(m×k) * B(k×n)
void matmul(const double *A, const double *B, double *C, int m, int k, int n,
            bool transA = false, bool transB = false) {
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) {
      double s = 0;
      for (int l = 0; l < k; ++l) {
        double a = transA ? A[l * m + i] : A[i * k + l];
        double b = transB ? B[j * k + l] : B[l * n + j];
        s += a * b;
      }
      C[i * n + j] = s;
    }
}

void matvec(const double *A, const double *x, double *y, int m, int n,
            bool transA = false) {
  for (int i = 0; i < m; ++i) {
    double s = 0;
    for (int j = 0; j < n; ++j)
      s += (transA ? A[j * m + i] : A[i * n + j]) * x[j];
    y[i] = s;
  }
}

// in-place Cholesky (lower) of SPD n×n
bool cholesky(double *M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[j * n + j];
    for (int k = 0; k < j; ++k)
      d -= M[j * n + k] * M[j * n + k];
    if (d <= 0)
      return false;
    M[j * n + j] = std::sqrt(d);
    for (int i = j + 1; i < n; ++i) {
      double s = M[i * n + j];
      for (int k = 0; k < j; ++k)
        s -= M[i * n + k] * M[j * n + k];
      M[i * n + j] = s / M[j * n + j];
    }
  }
  return true;
}

// solve L L' X = B (B: n×m, in place), L = lower factor in M
void chol_solve(const double *L, double *B, int n, int m) {
  for (int c = 0; c < m; ++c) {
    // forward
    for (int i = 0; i < n; ++i) {
      double s = B[i * m + c];
      for (int k = 0; k < i; ++k)
        s -= L[i * n + k] * B[k * m + c];
      B[i * m + c] = s / L[i * n + i];
    }
    // backward
    for (int i = n - 1; i >= 0; --i) {
      double s = B[i * m + c];
      for (int k = i + 1; k < n; ++k)
        s -= L[k * n + i] * B[k * m + c];
      B[i * m + c] = s / L[i * n + i];
    }
  }
}

// partial-pivot LU inverse of n×n
bool invert(const double *Min, double *Out, int n) {
  Mat A(Min, Min + n * n);
  Mat I(n * n, 0.0);
  for (int i = 0; i < n; ++i)
    I[i * n + i] = 1.0;
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(A[col * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(A[r * n + col]);
      if (v > best) {
        best = v;
        piv = r;
      }
    }
    if (best == 0.0)
      return false;
    if (piv != col) {
      for (int j = 0; j < n; ++j) {
        std::swap(A[piv * n + j], A[col * n + j]);
        std::swap(I[piv * n + j], I[col * n + j]);
      }
    }
    double d = A[col * n + col];
    for (int j = 0; j < n; ++j) {
      A[col * n + j] /= d;
      I[col * n + j] /= d;
    }
    for (int r = 0; r < n; ++r) {
      if (r == col)
        continue;
      double f = A[r * n + col];
      if (f == 0.0)
        continue;
      for (int j = 0; j < n; ++j) {
        A[r * n + j] -= f * A[col * n + j];
        I[r * n + j] -= f * I[col * n + j];
      }
    }
  }
  std::memcpy(Out, I.data(), sizeof(double) * n * n);
  return true;
}

} // namespace

extern "C" {

// All matrices row-major, stacked over time with leading dim T = N+1.
// Shapes: Q (T,nx,nx) S (T,nx,nu) R (T,nu,nu) q (T,nx) r (T,nu)
//         A,E (T,nx,nx) B (T,nx,nu) f (T,nx)  C (T,nc,nx) D (T,nc,nu) d (T,nc)
//         G0 (nx,nx) g0 (nx)   [nc0 == nx]
// Outputs: xs (T,nx) us (T,nu) vs (T,nc) lams (T,nx)
// Returns 0 on success.
int proximal_riccati_solve(int N, int nx, int nu, int nc, const double *Q,
                           const double *S, const double *R, const double *q,
                           const double *r, const double *A, const double *B,
                           const double *E, const double *f, const double *C,
                           const double *D, const double *d, const double *G0,
                           const double *g0, double mudyn, double mueq,
                           double *xs, double *us, double *vs, double *lams) {
  const int T = N + 1;
  auto at = [](const double *base, int t, int sz) { return base + t * sz; };

  // per-stage gains
  Mat kff(T * nu), Kfb(T * nu * nx), zff(T * nc), Zfb(T * nc * nx);
  Mat lff(T * nx), Lfb(T * nx * nx), yff(T * nx), Afb(T * nx * nx);

  Mat P(nx * nx), p(nx);

  // scratch
  Mat W(nu * nu), rhs_u(nu), rhs_K(nu * nx), tmp_nxnx(nx * nx),
      tmp_nxnu(nx * nu), tmp_nunx(nu * nx);

  auto reduced_kkt = [&](const double *Rhat, const double *Ct, const double *Dt,
                         const double *dt_, const double *rhat,
                         const double *ShatT, int t) -> bool {
    // W = Rhat + D'D/mueq (SPD)
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nu; ++j) {
        double s = Rhat[i * nu + j];
        for (int k = 0; k < nc; ++k)
          s += Dt[k * nu + i] * Dt[k * nu + j] / mueq;
        W[i * nu + j] = s;
      }
    if (!cholesky(W.data(), nu))
      return false;
    // kff = -W^{-1} (rhat + D'd/mueq)
    for (int i = 0; i < nu; ++i) {
      double s = rhat[i];
      for (int k = 0; k < nc; ++k)
        s += Dt[k * nu + i] * dt_[k] / mueq;
      rhs_u[i] = -s;
    }
    chol_solve(W.data(), rhs_u.data(), nu, 1);
    std::memcpy(&kff[t * nu], rhs_u.data(), sizeof(double) * nu);
    // K = -W^{-1} (Shat' + D'C/mueq)
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = ShatT[i * nx + j];
        for (int k = 0; k < nc; ++k)
          s += Dt[k * nu + i] * Ct[k * nx + j] / mueq;
        rhs_K[i * nx + j] = -s;
      }
    chol_solve(W.data(), rhs_K.data(), nu, nx);
    std::memcpy(&Kfb[t * nu * nx], rhs_K.data(), sizeof(double) * nu * nx);
    // zff = (D kff + d)/mueq ; Z = (D K + C)/mueq
    for (int k = 0; k < nc; ++k) {
      double s = d[t * nc + k];
      for (int i = 0; i < nu; ++i)
        s += Dt[k * nu + i] * kff[t * nu + i];
      zff[t * nc + k] = s / mueq;
      for (int j = 0; j < nx; ++j) {
        double z = Ct[k * nx + j];
        for (int i = 0; i < nu; ++i)
          z += Dt[k * nu + i] * Kfb[t * nu * nx + i * nx + j];
        Zfb[t * nc * nx + k * nx + j] = z / mueq;
      }
    }
    return true;
  };

  // ---- terminal stage ----
  {
    int t = N;
    Mat St(nu * nx);
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nx; ++j)
        St[i * nx + j] = S[t * nx * nu + j * nu + i];
    if (!reduced_kkt(at(R, t, nu * nu), at(C, t, nc * nx), at(D, t, nc * nu),
                     at(d, t, nc), at(r, t, nu), St.data(), t))
      return 1;
    // P = Q + C'Z + S K ; p = q + C'zff + S kff
    for (int i = 0; i < nx; ++i) {
      for (int j = 0; j < nx; ++j) {
        double s = Q[t * nx * nx + i * nx + j];
        for (int k = 0; k < nc; ++k)
          s += C[t * nc * nx + k * nx + i] * Zfb[t * nc * nx + k * nx + j];
        for (int k = 0; k < nu; ++k)
          s += S[t * nx * nu + i * nu + k] * Kfb[t * nu * nx + k * nx + j];
        P[i * nx + j] = s;
      }
      double s = q[t * nx + i];
      for (int k = 0; k < nc; ++k)
        s += C[t * nc * nx + k * nx + i] * zff[t * nc + k];
      for (int k = 0; k < nu; ++k)
        s += S[t * nx * nu + i * nu + k] * kff[t * nu + k];
      p[i] = s;
    }
    // symmetrize
    for (int i = 0; i < nx; ++i)
      for (int j = i + 1; j < nx; ++j) {
        double m = 0.5 * (P[i * nx + j] + P[j * nx + i]);
        P[i * nx + j] = P[j * nx + i] = m;
      }
  }

  // ---- backward stages ----
  Mat Einv(nx * nx), Ptilde(nx * nx), ptilde(nx), Schur(nx * nx);
  Mat Vxx(nx * nx), vx(nx), Qhat(nx * nx), Rhat(nu * nu), ShatT(nu * nx),
      qhat(nx), rhat(nu), AtV(nx * nx), BtV(nu * nx);

  for (int t = N - 1; t >= 0; --t) {
    if (!invert(at(E, t, nx * nx), Einv.data(), nx))
      return 2;
    // Ptilde = Einv' P Einv ; ptilde = -Einv' p
    matmul(Einv.data(), P.data(), tmp_nxnx.data(), nx, nx, nx, true, false);
    matmul(tmp_nxnx.data(), Einv.data(), Ptilde.data(), nx, nx, nx);
    matvec(Einv.data(), p.data(), ptilde.data(), nx, nx, true);
    for (int i = 0; i < nx; ++i)
      ptilde[i] = -ptilde[i];
    // Schur = I + mudyn*Ptilde ; Vxx = Schur^{-1} Ptilde ;
    // vx = Schur^{-1}(ptilde + Ptilde f)
    for (int i = 0; i < nx * nx; ++i)
      Schur[i] = mudyn * Ptilde[i];
    for (int i = 0; i < nx; ++i)
      Schur[i * nx + i] += 1.0;
    if (!cholesky(Schur.data(), nx))
      return 3;
    std::memcpy(Vxx.data(), Ptilde.data(), sizeof(double) * nx * nx);
    chol_solve(Schur.data(), Vxx.data(), nx, nx);
    matvec(Ptilde.data(), at(f, t, nx), vx.data(), nx, nx);
    for (int i = 0; i < nx; ++i)
      vx[i] += ptilde[i];
    chol_solve(Schur.data(), vx.data(), nx, 1);

    // hat quantities
    matmul(at(A, t, nx * nx), Vxx.data(), AtV.data(), nx, nx, nx, true, false);
    matmul(at(B, t, nx * nu), Vxx.data(), BtV.data(), nu, nx, nx, true, false);
    matmul(AtV.data(), at(A, t, nx * nx), Qhat.data(), nx, nx, nx);
    for (int i = 0; i < nx * nx; ++i)
      Qhat[i] += Q[t * nx * nx + i];
    matmul(BtV.data(), at(B, t, nx * nu), Rhat.data(), nu, nx, nu);
    for (int i = 0; i < nu * nu; ++i)
      Rhat[i] += R[t * nu * nu + i];
    // Shat' = S' + B'Vxx A  → (nu×nx)
    matmul(BtV.data(), at(A, t, nx * nx), ShatT.data(), nu, nx, nx);
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nx; ++j)
        ShatT[i * nx + j] += S[t * nx * nu + j * nu + i];
    matvec(at(A, t, nx * nx), vx.data(), qhat.data(), nx, nx, true);
    for (int i = 0; i < nx; ++i)
      qhat[i] += q[t * nx + i];
    matvec(at(B, t, nx * nu), vx.data(), rhat.data(), nu, nx, true);
    for (int i = 0; i < nu; ++i)
      rhat[i] += r[t * nu + i];

    if (!reduced_kkt(Rhat.data(), at(C, t, nc * nx), at(D, t, nc * nu),
                     at(d, t, nc), rhat.data(), ShatT.data(), t))
      return 4;

    // lff = vx + Vxx B kff ; L = Vxx A + Vxx B K
    Mat Bk(nx), BK(nx * nx);
    matvec(at(B, t, nx * nu), &kff[t * nu], Bk.data(), nx, nu);
    matvec(Vxx.data(), Bk.data(), &lff[t * nx], nx, nx);
    for (int i = 0; i < nx; ++i)
      lff[t * nx + i] += vx[i];
    matmul(at(B, t, nx * nu), &Kfb[t * nu * nx], BK.data(), nx, nu, nx);
    for (int i = 0; i < nx * nx; ++i)
      tmp_nxnx[i] = A[t * nx * nx + i] + BK[i];
    matmul(Vxx.data(), tmp_nxnx.data(), &Lfb[t * nx * nx], nx, nx, nx);
    // yff = -Einv (f + B kff - mudyn lff) ; Afb = -Einv (A + BK - mudyn L)
    Mat pre(nx);
    for (int i = 0; i < nx; ++i)
      pre[i] = f[t * nx + i] + Bk[i] - mudyn * lff[t * nx + i];
    matvec(Einv.data(), pre.data(), &yff[t * nx], nx, nx);
    for (int i = 0; i < nx; ++i)
      yff[t * nx + i] = -yff[t * nx + i];
    Mat preM(nx * nx);
    for (int i = 0; i < nx * nx; ++i)
      preM[i] = A[t * nx * nx + i] + BK[i] - mudyn * Lfb[t * nx * nx + i];
    matmul(Einv.data(), preM.data(), &Afb[t * nx * nx], nx, nx, nx);
    for (int i = 0; i < nx * nx; ++i)
      Afb[t * nx * nx + i] = -Afb[t * nx * nx + i];

    // value recursion: P = Qhat + Shat K + C'Z ; p = qhat + Shat kff + C'zff
    // (Shat = (Shat')')
    for (int i = 0; i < nx; ++i) {
      for (int j = 0; j < nx; ++j) {
        double s = Qhat[i * nx + j];
        for (int k = 0; k < nu; ++k)
          s += ShatT[k * nx + i] * Kfb[t * nu * nx + k * nx + j];
        for (int k = 0; k < nc; ++k)
          s += C[t * nc * nx + k * nx + i] * Zfb[t * nc * nx + k * nx + j];
        tmp_nxnx[i * nx + j] = s;
      }
      double s = qhat[i];
      for (int k = 0; k < nu; ++k)
        s += ShatT[k * nx + i] * kff[t * nu + k];
      for (int k = 0; k < nc; ++k)
        s += C[t * nc * nx + k * nx + i] * zff[t * nc + k];
      p[i] = s;
    }
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j)
        P[i * nx + j] = 0.5 * (tmp_nxnx[i * nx + j] + tmp_nxnx[j * nx + i]);
  }

  // ---- initial stage: (P + G0'G0/mudyn) x0 = -(p + G0'g0/mudyn) ----
  {
    Mat Wx(nx * nx), b(nx);
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < nx; ++j) {
        double s = P[i * nx + j];
        for (int k = 0; k < nx; ++k)
          s += G0[k * nx + i] * G0[k * nx + j] / mudyn;
        Wx[i * nx + j] = s;
      }
    for (int i = 0; i < nx; ++i) {
      double s = p[i];
      for (int k = 0; k < nx; ++k)
        s += G0[k * nx + i] * g0[k] / mudyn;
      b[i] = -s;
    }
    if (!cholesky(Wx.data(), nx))
      return 5;
    chol_solve(Wx.data(), b.data(), nx, 1);
    std::memcpy(xs, b.data(), sizeof(double) * nx);
    // lam0 = (G0 x0 - (-g0))/mudyn = (G0 x0 + g0)/mudyn
    for (int i = 0; i < nx; ++i) {
      double s = g0[i];
      for (int j = 0; j < nx; ++j)
        s += G0[i * nx + j] * xs[j];
      lams[i] = s / mudyn;
    }
  }

  // ---- forward sweep ----
  for (int t = 0; t <= N; ++t) {
    const double *x = xs + t * nx;
    // u = kff + K x ; v = zff + Z x
    for (int i = 0; i < nu; ++i) {
      double s = kff[t * nu + i];
      for (int j = 0; j < nx; ++j)
        s += Kfb[t * nu * nx + i * nx + j] * x[j];
      us[t * nu + i] = s;
    }
    for (int k = 0; k < nc; ++k) {
      double s = zff[t * nc + k];
      for (int j = 0; j < nx; ++j)
        s += Zfb[t * nc * nx + k * nx + j] * x[j];
      vs[t * nc + k] = s;
    }
    if (t == N)
      break;
    for (int i = 0; i < nx; ++i) {
      double s = lff[t * nx + i];
      for (int j = 0; j < nx; ++j)
        s += Lfb[t * nx * nx + i * nx + j] * x[j];
      lams[(t + 1) * nx + i] = s;
    }
    for (int i = 0; i < nx; ++i) {
      double s = yff[t * nx + i];
      for (int j = 0; j < nx; ++j)
        s += Afb[t * nx * nx + i * nx + j] * x[j];
      xs[(t + 1) * nx + i] = s;
    }
  }
  return 0;
}

} // extern "C"
