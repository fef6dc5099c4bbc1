// Measured CPU baseline for bench.py (VERDICT round-1 item #9).
//
// Single-file C++/OpenMP implementation of the APDGICP scan-match regime:
// per frame = source k-NN covariance estimation (PLANE-regularized) + LM
// registration (NN correspondences, adaptive per-point covariance,
// Mahalanobis-weighted H/b, 6x6 damped solves). The math is a transcription
// of this repository's own JAX implementation (rivslam_tpu/frontend/
// apdgicp.py — itself behavior-cited to the reference's
// fast_apdgicp_impl.hpp / lsq_registration_impl.hpp); no reference code is
// copied. OpenMP point loops mirror the reference's
// `#pragma omp parallel for` regime (fast_apdgicp_impl.hpp:146,221,312).
//
// Input (stdin-free, single arg): binary file
//   int32 n_pairs, int32 capacity
//   per pair: f64 src[cap*3], u8 smask[cap], f64 tgt[cap*3], u8 tmask[cap]
// Output: one JSON line {"frames": N, "median_ms": .., "fps": ..,
//                        "threads": T}
//
// Build: g++ -O3 -march=native -fopenmp -o cpu_baseline cpu_baseline.cpp

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int KNN = 20;
constexpr double MAX_CORR = 2.0;          // max_correspondence_distance
constexpr double ROT_EPS = 2e-3;          // rotation_epsilon
constexpr double TRANS_EPS = 0.1;         // transformation_epsilon (launch)
constexpr int MAX_ITER = 64;              // outer iterations
constexpr int LM_MAX_ITER = 10;           // inner lambda search
constexpr double LM_INIT_LAMBDA = 1e-9;   // lm_init_lambda_factor
constexpr double DIST_VAR = 0.86;         // adaptive covariance params
constexpr double AZ_VAR_DEG = 1.0;
constexpr double EL_VAR_DEG = 1.0;

struct M3 {
  double a[9];
  double* operator[](int r) { return a + 3 * r; }
  const double* operator[](int r) const { return a + 3 * r; }
};

inline M3 eye3() { return M3{{1, 0, 0, 0, 1, 0, 0, 0, 1}}; }

inline M3 matmul(const M3& A, const M3& B) {
  M3 C{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += A[i][k] * B[k][j];
      C[i][j] = s;
    }
  return C;
}

inline M3 transpose(const M3& A) {
  M3 C{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) C[i][j] = A[j][i];
  return C;
}

inline void matvec(const M3& A, const double v[3], double out[3]) {
  for (int i = 0; i < 3; i++)
    out[i] = A[i][0] * v[0] + A[i][1] * v[1] + A[i][2] * v[2];
}

// closed-form 3x3 inverse (adjugate/det) — _inv3 in apdgicp.py
inline M3 inv3(const M3& M) {
  double a = M[0][0], b = M[0][1], c = M[0][2];
  double d = M[1][0], e = M[1][1], f = M[1][2];
  double g = M[2][0], h = M[2][1], i = M[2][2];
  double A = e * i - f * h, B = -(d * i - f * g), C = d * h - e * g;
  double D = -(b * i - c * h), E = a * i - c * g, F = -(a * h - b * g);
  double G = b * f - c * e, H = -(a * f - c * d), I = a * e - b * d;
  double det = a * A + b * B + c * C;
  double inv_det = 1.0 / (std::fabs(det) < 1e-30 ? 1.0 : det);
  M3 R{{A, D, G, B, E, H, C, F, I}};
  for (double& x : R.a) x *= inv_det;
  return R;
}

// Jacobi eigendecomposition of a symmetric 3x3: V columns = eigenvectors
inline void eigh3(const M3& S, double w[3], M3& V) {
  M3 A = S;
  V = eye3();
  for (int sweep = 0; sweep < 24; sweep++) {
    double off = std::fabs(A[0][1]) + std::fabs(A[0][2]) + std::fabs(A[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        if (std::fabs(A[p][q]) < 1e-18) continue;
        double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
  }
  w[0] = A[0][0];
  w[1] = A[1][1];
  w[2] = A[2][2];
}

inline M3 so3_exp(const double w[3]) {
  double t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  M3 W{{0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0}};
  M3 R = eye3();
  if (t2 < 1e-20) {
    for (int i = 0; i < 9; i++) R.a[i] += W.a[i];
    return R;
  }
  double t = std::sqrt(t2);
  double s = std::sin(t) / t, c = (1.0 - std::cos(t)) / t2;
  M3 WW = matmul(W, W);
  for (int i = 0; i < 9; i++) R.a[i] += s * W.a[i] + c * WW.a[i];
  return R;
}

struct Pose {
  M3 R;
  double t[3];
};

// adaptive per-point covariance (APDGICP, evaluated at the transformed pt)
inline M3 adaptive_cov(const double p[3]) {
  double x = p[0], y = p[1], z = p[2];
  double dist = std::sqrt(std::max(x * x + y * y + z * z, 1e-12));
  double aoa = std::atan2(x, std::sqrt(y * y + z * z));
  double cos_aoa = std::cos(aoa);
  if (std::fabs(cos_aoa) < 1e-6) cos_aoa = 1e-6;
  double sx = dist * DIST_VAR / 400.0;
  double sy = dist * std::sin(AZ_VAR_DEG * M_PI / 180.0) / cos_aoa;
  double sz = dist * std::sin(EL_VAR_DEG * M_PI / 180.0) / cos_aoa;
  double elevation = std::atan2(std::sqrt(x * x + y * y), z);
  double azimuth = std::atan2(y, x);
  double ca = std::cos(azimuth), sa = std::sin(azimuth);
  double ce = std::cos(elevation), se = std::sin(elevation);
  M3 Rz{{ca, -sa, 0, sa, ca, 0, 0, 0, 1}};
  M3 Ry{{ce, 0, se, 0, 1, 0, -se, 0, ce}};
  M3 R = matmul(Rz, Ry);
  double s2[3] = {sx * sx, sy * sy, sz * sz};
  M3 C{};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += R[i][k] * s2[k] * R[j][k];
      C[i][j] = s;
    }
  return C;
}

struct Cloud {
  int n = 0;
  std::vector<double> xyz;  // [n*3]
  std::vector<M3> cov;      // PLANE-regularized
};

// brute-force k-NN covariance estimation + PLANE regularization
void estimate_covariances(Cloud& c) {
  c.cov.resize(c.n);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < c.n; i++) {
    double bd[KNN];
    int bi[KNN];
    for (int k = 0; k < KNN; k++) {
      bd[k] = 1e30;
      bi[k] = 0;
    }
    const double* pi = &c.xyz[3 * i];
    for (int j = 0; j < c.n; j++) {
      const double* pj = &c.xyz[3 * j];
      double dx = pi[0] - pj[0], dy = pi[1] - pj[1], dz = pi[2] - pj[2];
      double d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < bd[KNN - 1]) {  // insertion into the sorted top-k
        int k = KNN - 1;
        while (k > 0 && bd[k - 1] > d2) {
          bd[k] = bd[k - 1];
          bi[k] = bi[k - 1];
          k--;
        }
        bd[k] = d2;
        bi[k] = j;
      }
    }
    double mean[3] = {0, 0, 0};
    for (int k = 0; k < KNN; k++)
      for (int d = 0; d < 3; d++) mean[d] += c.xyz[3 * bi[k] + d];
    for (int d = 0; d < 3; d++) mean[d] /= KNN;
    M3 C{};
    for (int k = 0; k < KNN; k++) {
      double e[3];
      for (int d = 0; d < 3; d++) e[d] = c.xyz[3 * bi[k] + d] - mean[d];
      for (int r = 0; r < 3; r++)
        for (int s = 0; s < 3; s++) C[r][s] += e[r] * e[s];
    }
    for (double& x : C.a) x /= KNN;
    // PLANE: eigenvalues -> (1, 1, 1e-3)
    double w[3];
    M3 V;
    eigh3(C, w, V);
    int order[3] = {0, 1, 2};
    std::sort(order, order + 3, [&](int a, int b) { return w[a] < w[b]; });
    double newv[3];
    newv[order[0]] = 1e-3;
    newv[order[1]] = 1.0;
    newv[order[2]] = 1.0;
    M3 Creg{};
    for (int r = 0; r < 3; r++)
      for (int s = 0; s < 3; s++) {
        double acc = 0;
        for (int k = 0; k < 3; k++) acc += V[r][k] * newv[k] * V[s][k];
        Creg[r][s] = acc;
      }
    c.cov[i] = Creg;
  }
}

// solve (A + lam I) d = -b for 6x6 via Gaussian elimination
bool solve6(const double H[36], const double b[6], double lam, double d[6]) {
  double A[6][7];
  for (int i = 0; i < 6; i++) {
    for (int j = 0; j < 6; j++) A[i][j] = H[6 * i + j] + (i == j ? lam : 0.0);
    A[i][6] = -b[i];
  }
  for (int col = 0; col < 6; col++) {
    int piv = col;
    for (int r = col + 1; r < 6; r++)
      if (std::fabs(A[r][col]) > std::fabs(A[piv][col])) piv = r;
    if (std::fabs(A[piv][col]) < 1e-30) return false;
    if (piv != col)
      for (int j = 0; j < 7; j++) std::swap(A[piv][j], A[col][j]);
    for (int r = 0; r < 6; r++) {
      if (r == col) continue;
      double f = A[r][col] / A[col][col];
      for (int j = col; j < 7; j++) A[r][j] -= f * A[col][j];
    }
  }
  for (int i = 0; i < 6; i++) d[i] = A[i][6] / A[i][i];
  return true;
}

struct Corr {
  int idx;
  M3 mah;
};

// one linearization: correspondences + H/b/error (OpenMP reduction)
double linearize(const Pose& T, const Cloud& src, const Cloud& tgt,
                 std::vector<Corr>& corr, double H[36], double b[6]) {
  corr.resize(src.n);
  double err = 0;
  double Hl[36] = {0};
  double bl[6] = {0};
#pragma omp parallel
  {
    double Ht[36] = {0}, bt[6] = {0}, errt = 0;
#pragma omp for schedule(static) nowait
    for (int i = 0; i < src.n; i++) {
      double pt[3];
      matvec(T.R, &src.xyz[3 * i], pt);
      for (int d = 0; d < 3; d++) pt[d] += T.t[d];
      // brute-force NN in target
      int best = -1;
      double bestd = 1e30;
      for (int j = 0; j < tgt.n; j++) {
        const double* q = &tgt.xyz[3 * j];
        double dx = pt[0] - q[0], dy = pt[1] - q[1], dz = pt[2] - q[2];
        double d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < bestd) {
          bestd = d2;
          best = j;
        }
      }
      if (bestd >= MAX_CORR * MAX_CORR) {
        corr[i].idx = -1;
        continue;
      }
      corr[i].idx = best;
      // mahalanobis = inv((C_B + C_d) + R (C_A + C_d) R^T)
      M3 cd = adaptive_cov(pt);
      M3 CA = src.cov[i], CB = tgt.cov[best];
      for (int k = 0; k < 9; k++) CA.a[k] += cd.a[k];
      M3 RCA = matmul(matmul(T.R, CA), transpose(T.R));
      for (int k = 0; k < 9; k++) RCA.a[k] += CB.a[k] + cd.a[k];
      M3 mah = inv3(RCA);
      corr[i].mah = mah;
      // residual e = q - pt; J = [skew(pt) | -I]
      const double* q = &tgt.xyz[3 * best];
      double e[3] = {q[0] - pt[0], q[1] - pt[1], q[2] - pt[2]};
      double me[3];
      matvec(mah, e, me);
      errt += e[0] * me[0] + e[1] * me[1] + e[2] * me[2];
      // de/d(dw) = +skew(pt) for e = q - exp(dw) pt (so b_rot = -(pt x Me),
      // matching apdgicp_fast.linearize)
      double J[3][6] = {{0, -pt[2], pt[1], -1, 0, 0},
                        {pt[2], 0, -pt[0], 0, -1, 0},
                        {-pt[1], pt[0], 0, 0, 0, -1}};
      double MJ[3][6];
      for (int r = 0; r < 3; r++)
        for (int cidx = 0; cidx < 6; cidx++)
          MJ[r][cidx] = mah[r][0] * J[0][cidx] + mah[r][1] * J[1][cidx] +
                        mah[r][2] * J[2][cidx];
      for (int r = 0; r < 6; r++) {
        for (int cidx = 0; cidx < 6; cidx++) {
          double s = 0;
          for (int k = 0; k < 3; k++) s += J[k][r] * MJ[k][cidx];
          Ht[6 * r + cidx] += s;
        }
        bt[r] += J[0][r] * me[0] + J[1][r] * me[1] + J[2][r] * me[2];
      }
    }
#pragma omp critical
    {
      for (int k = 0; k < 36; k++) Hl[k] += Ht[k];
      for (int k = 0; k < 6; k++) bl[k] += bt[k];
      err += errt;
    }
  }
  std::memcpy(H, Hl, sizeof(Hl));
  std::memcpy(b, bl, sizeof(bl));
  return err;
}

// error at T under FIXED correspondences (compute_error semantics)
double compute_error(const Pose& T, const Cloud& src, const Cloud& tgt,
                     const std::vector<Corr>& corr) {
  double err = 0;
#pragma omp parallel for schedule(static) reduction(+ : err)
  for (int i = 0; i < src.n; i++) {
    if (corr[i].idx < 0) continue;
    double pt[3];
    matvec(T.R, &src.xyz[3 * i], pt);
    for (int d = 0; d < 3; d++) pt[d] += T.t[d];
    const double* q = &tgt.xyz[3 * corr[i].idx];
    double e[3] = {q[0] - pt[0], q[1] - pt[1], q[2] - pt[2]};
    double me[3];
    matvec(corr[i].mah, e, me);
    err += e[0] * me[0] + e[1] * me[1] + e[2] * me[2];
  }
  return err;
}

inline Pose apply_delta(const double d[6], const Pose& T) {
  M3 dR = so3_exp(d);
  Pose out;
  out.R = matmul(dR, T.R);
  for (int i = 0; i < 3; i++) {
    out.t[i] = dR[i][0] * T.t[0] + dR[i][1] * T.t[1] + dR[i][2] * T.t[2] +
               d[3 + i];
  }
  return out;
}

inline bool is_converged(const double d[6]) {
  M3 dR = so3_exp(d);
  double rmax = 0;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      rmax = std::max(rmax, std::fabs(dR[i][j] - (i == j ? 1.0 : 0.0)));
  double tmax =
      std::max({std::fabs(d[3]), std::fabs(d[4]), std::fabs(d[5])});
  return rmax / ROT_EPS < 1.0 && tmax / TRANS_EPS < 1.0;
}

// LM driver (lsq_registration LM semantics)
Pose align(const Cloud& src, const Cloud& tgt) {
  Pose T{eye3(), {0, 0, 0}};
  double lam = -1.0;
  std::vector<Corr> corr;
  for (int it = 0; it < MAX_ITER; it++) {
    double H[36], b[6];
    double y0 = linearize(T, src, tgt, corr, H, b);
    if (lam < 0) {
      double dmax = 0;
      for (int i = 0; i < 6; i++) dmax = std::max(dmax, std::fabs(H[7 * i]));
      lam = LM_INIT_LAMBDA * dmax;
    }
    double nu = 2.0;
    bool accepted = false, converged = false;
    for (int j = 0; j < LM_MAX_ITER; j++) {
      double d[6];
      if (!solve6(H, b, lam, d)) break;
      Pose Tn = apply_delta(d, T);
      double yi = compute_error(Tn, src, tgt, corr);
      double denom = 0;
      for (int k = 0; k < 6; k++) denom += d[k] * (lam * d[k] - b[k]);
      double rho = (y0 - yi) / (std::fabs(denom) < 1e-30 ? 1e-30 : denom);
      if (rho >= 0) {
        T = Tn;
        lam *= std::max(1.0 / 3.0, 1.0 - std::pow(2.0 * rho - 1.0, 3.0));
        accepted = true;
        converged = is_converged(d);
        break;
      }
      lam *= nu;
      nu *= 2.0;
      if (is_converged(d)) {
        converged = true;
        break;
      }
    }
    if (converged || !accepted) break;
  }
  return T;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s clouds.bin\n", argv[0]);
    return 1;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::perror("open");
    return 1;
  }
  int32_t n_pairs = 0, cap = 0;
  if (std::fread(&n_pairs, 4, 1, f) != 1 || std::fread(&cap, 4, 1, f) != 1)
    return 1;
  std::vector<Cloud> srcs(n_pairs), tgts(n_pairs);
  std::vector<double> buf(cap * 3);
  std::vector<uint8_t> mbuf(cap);
  auto read_cloud = [&](Cloud& c) {
    if (std::fread(buf.data(), 8, cap * 3, f) != size_t(cap * 3)) std::abort();
    if (std::fread(mbuf.data(), 1, cap, f) != size_t(cap)) std::abort();
    for (int i = 0; i < cap; i++)
      if (mbuf[i]) {
        c.xyz.push_back(buf[3 * i]);
        c.xyz.push_back(buf[3 * i + 1]);
        c.xyz.push_back(buf[3 * i + 2]);
      }
    c.n = int(c.xyz.size() / 3);
  };
  for (int p = 0; p < n_pairs; p++) {
    read_cloud(srcs[p]);
    read_cloud(tgts[p]);
  }
  std::fclose(f);

  // target covariances estimated once (cached keyframe), like bench.py
  for (auto& t : tgts) estimate_covariances(t);

  // warmup
  estimate_covariances(srcs[0]);
  align(srcs[0], tgts[0]);

  std::vector<double> ms;
  std::vector<Pose> poses;
  poses.reserve(n_pairs);
  for (int p = 0; p < n_pairs; p++) {
    auto t0 = std::chrono::steady_clock::now();
    estimate_covariances(srcs[p]);  // per-frame source covariances
    Pose T = align(srcs[p], tgts[p]);
    auto t1 = std::chrono::steady_clock::now();
    poses.push_back(T);
    ms.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
  }
  if (argc > 2) {  // dump final transforms for cross-validation vs JAX
    FILE* g = std::fopen(argv[2], "wb");
    for (auto& P : poses) {
      double T44[16] = {P.R[0][0], P.R[0][1], P.R[0][2], P.t[0],
                        P.R[1][0], P.R[1][1], P.R[1][2], P.t[1],
                        P.R[2][0], P.R[2][1], P.R[2][2], P.t[2],
                        0,         0,         0,         1};
      std::fwrite(T44, 8, 16, g);
    }
    std::fclose(g);
  }

  std::sort(ms.begin(), ms.end());
  double median = ms[ms.size() / 2];
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  std::printf(
      "{\"frames\": %d, \"median_ms\": %.3f, \"fps\": %.2f, \"threads\": %d}\n",
      n_pairs, median, 1000.0 / median, threads);
  return 0;
}
