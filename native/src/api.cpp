#include "api.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

// Split a CSV header line and locate x/y/uref columns (case-insensitive).
struct Cols {
  int x = -1, y = -1, uref = -1, n = 0;
};

Cols parse_header(const std::string& line) {
  Cols c;
  std::stringstream ss(line);
  std::string tok;
  int i = 0;
  while (std::getline(ss, tok, ',')) {
    std::string t;
    for (char ch : tok)
      if (!isspace(static_cast<unsigned char>(ch)))
        t += static_cast<char>(tolower(ch));
    if (t == "x" || (c.x < 0 && t == "0")) c.x = i;
    else if (t == "y" || (c.y < 0 && t == "1")) c.y = i;
    else if (t == "uref" || t == "2") c.uref = i;
    ++i;
  }
  c.n = i;
  // headerless/generated files (lane_change.py writes pandas default 0,1,2)
  if (c.x < 0 && c.n >= 2) c.x = 0;
  if (c.y < 0 && c.n >= 2) c.y = 1;
  if (c.uref < 0 && c.n >= 3) c.uref = 2;
  return c;
}

}  // namespace

extern "C" {

int64_t mv_csv_rows(const char* path) {
  std::ifstream f(path);
  if (!f) return -1;
  std::string line;
  int64_t n = -1;  // first line is the header
  while (std::getline(f, line))
    if (!line.empty()) ++n;
  return std::max<int64_t>(n, 0);
}

int64_t mv_load_path_csv(const char* path, double* x, double* y, double* uref,
                         int64_t cap) {
  std::ifstream f(path);
  if (!f) return -1;
  std::string line;
  if (!std::getline(f, line)) return -1;
  Cols cols = parse_header(line);
  if (cols.x < 0 || cols.y < 0) return -1;
  int64_t n = 0;
  std::vector<double> vals;
  while (std::getline(f, line) && n < cap) {
    if (line.empty()) continue;
    vals.clear();
    const char* p = line.c_str();
    char* end = nullptr;
    while (*p) {
      vals.push_back(std::strtod(p, &end));
      p = (end && *end == ',') ? end + 1 : (end ? end : p + std::strlen(p));
      if (end && *end != ',' && *end != '\0') ++p;  // skip stray chars
      if (p == end && *p == '\0') break;
    }
    if (static_cast<int>(vals.size()) <= std::max(cols.x, cols.y)) continue;
    x[n] = vals[cols.x];
    y[n] = vals[cols.y];
    uref[n] = (cols.uref >= 0 && cols.uref < static_cast<int>(vals.size()))
                  ? vals[cols.uref]
                  : 0.4;
    ++n;
  }
  return n;
}

void mv_path_heading(const double* x, const double* y, int64_t n, int unwrap,
                     double* phi) {
  if (n <= 0) return;
  phi[0] = 0.0;
  for (int64_t i = 1; i < n; ++i) {
    double a = std::atan2(y[i] - y[i - 1], x[i] - x[i - 1]);
    if (unwrap && a < 0) a += 2.0 * M_PI;
    phi[i] = a;
  }
}

void mv_lateral_error_refs(const double* x, const double* y, int64_t n,
                           double dt, double ar, double br, int unwrap,
                           double* out) {
  if (n < 3) return;
  std::vector<double> phi(n), r(n), phidd(n);
  mv_path_heading(x, y, n, unwrap, phi.data());
  for (int64_t i = 1; i + 1 < n; ++i)
    r[i] = (phi[i + 1] - phi[i - 1]) / (2.0 * dt);
  r[0] = (phi[1] - phi[0]) / dt;
  r[n - 1] = (phi[n - 1] - phi[n - 2]) / dt;
  for (int64_t i = 1; i + 1 < n; ++i)
    phidd[i] = (phi[i + 1] - 2.0 * phi[i] + phi[i - 1]) / (dt * dt);
  phidd[0] = phidd[1];
  phidd[n - 1] = phidd[n - 2];
  for (int64_t i = 0; i < n; ++i) {
    out[4 * i + 0] = y[i];
    out[4 * i + 1] = phi[i];
    out[4 * i + 2] = r[i];
    out[4 * i + 3] = (phidd[i] - ar * r[i]) / br;
  }
}

void mv_stage_window(const double* refs, int64_t n, int64_t np_, int64_t nt,
                     int64_t nsim, double* out) {
  for (int64_t t = 0; t < nsim; ++t)
    for (int64_t k = 0; k < nt; ++k) {
      int64_t src = std::min(t + k, n - 1);
      std::memcpy(out + (t * nt + k) * np_, refs + src * np_,
                  sizeof(double) * np_);
    }
}

namespace {

// Tiny dense helpers (row-major), enough for nx <= 16, nu <= 4.
void matmul(const double* A, const double* B, double* C, int n, int m, int p) {
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < p; ++j) {
      double s = 0;
      for (int k = 0; k < m; ++k) s += A[i * m + k] * B[k * p + j];
      C[i * p + j] = s;
    }
}

// Solve S X = Y for X (S symmetric positive definite, size n; Y n x m) via
// Cholesky without pivoting.
bool chol_solve(double* S, double* Y, int n, int m) {
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = S[i * n + j];
      for (int k = 0; k < j; ++k) s -= S[i * n + k] * S[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        S[i * n + i] = std::sqrt(s);
      } else {
        S[i * n + j] = s / S[j * n + j];
      }
    }
  }
  // forward/backward substitution on each column of Y
  for (int c = 0; c < m; ++c) {
    for (int i = 0; i < n; ++i) {
      double s = Y[i * m + c];
      for (int k = 0; k < i; ++k) s -= S[i * n + k] * Y[k * m + c];
      Y[i * m + c] = s / S[i * n + i];
    }
    for (int i = n - 1; i >= 0; --i) {
      double s = Y[i * m + c];
      for (int k = i + 1; k < n; ++k) s -= S[k * n + i] * Y[k * m + c];
      Y[i * m + c] = s / S[i * n + i];
    }
  }
  return true;
}

}  // namespace

double mv_lqr_riccati(const double* A, const double* B, const double* Q,
                      const double* R, const double* Qf, int64_t nx,
                      int64_t nu, int64_t N, const double* x0, double* us) {
  const int n = static_cast<int>(nx), m = static_cast<int>(nu);
  std::vector<double> P(Qf, Qf + n * n), K(N * m * n);
  std::vector<double> PA(n * n), PB(n * m), BtPA(m * n), S(m * m), AK(n * n);
  for (int64_t t = N - 1; t >= 0; --t) {
    matmul(P.data(), A, PA.data(), n, n, n);            // P A
    matmul(P.data(), B, PB.data(), n, n, m);            // P B
    // S = R + B' P B ; rhs = B' P A
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < m; ++j) {
        double s = R[i * m + j];
        for (int k = 0; k < n; ++k) s += B[k * m + i] * PB[k * m + j];
        S[i * m + j] = s;
      }
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < n; ++j) {
        double s = 0;
        for (int k = 0; k < n; ++k) s += B[k * m + i] * PA[k * n + j];
        BtPA[i * n + j] = s;
      }
    std::vector<double> Scopy(S), Kt(BtPA);
    if (!chol_solve(Scopy.data(), Kt.data(), m, n)) return -1.0;
    std::copy(Kt.begin(), Kt.end(), K.begin() + t * m * n);
    // P = Q + A' P (A - B K)
    std::vector<double> BK(n * n);
    matmul(B, Kt.data(), BK.data(), n, m, n);
    for (int i = 0; i < n * n; ++i) AK[i] = A[i] - BK[i];
    std::vector<double> PAK(n * n);
    matmul(P.data(), AK.data(), PAK.data(), n, n, n);
    std::vector<double> AtPAK(n * n);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double s = Q[i * n + j];
        for (int k = 0; k < n; ++k) s += A[k * n + i] * PAK[k * n + j];
        AtPAK[i * n + j] = s;
      }
    // symmetrize
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        P[i * n + j] = 0.5 * (AtPAK[i * n + j] + AtPAK[j * n + i]);
  }
  // forward rollout
  std::vector<double> xcur(x0, x0 + n), xnext(n);
  double cost = 0.0;
  for (int64_t t = 0; t < N; ++t) {
    const double* Kt = K.data() + t * m * n;
    for (int a = 0; a < m; ++a) {
      double s = 0;
      for (int k = 0; k < n; ++k) s += Kt[a * n + k] * xcur[k];
      us[t * m + a] = -s;
    }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        cost += xcur[i] * Q[i * n + j] * xcur[j];
    for (int a = 0; a < m; ++a)
      for (int b = 0; b < m; ++b)
        cost += us[t * m + a] * R[a * m + b] * us[t * m + b];
    for (int i = 0; i < n; ++i) {
      double s = 0;
      for (int k = 0; k < n; ++k) s += A[i * n + k] * xcur[k];
      for (int a = 0; a < m; ++a) s += B[i * m + a] * us[t * m + a];
      xnext[i] = s;
    }
    xcur = xnext;
  }
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      cost += xcur[i] * Qf[i * n + j] * xcur[j];
  return cost;
}

}  // extern "C"
