// TM-score computation (Zhang & Skolnick 2004), C++ core.
//
// Native replacement for the reference's `tmtools` dependency
// (pybind11-wrapped TM-align, used at `analysis/metrics.py:44-46`).
// Computes the TM-score between two CA traces under the identity (1:1)
// alignment — the self-consistency setting, where sampled and refolded
// structures share residue correspondence — using the TM-score program's
// search recipe: fragment seeds, Kabsch superposition (Horn quaternion
// method), and iterative d0-cutoff refinement keeping the best score.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image):
//   tm_score_pair(xyz1, n1, xyz2, n2, &tm_norm1, &tm_norm2)
//
// Build: g++ -O3 -march=native -shared -fPIC tmalign.cc -o libtmalign.so

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline double d0_of(int n) {
  if (n <= 21) return 0.5;
  double d = 1.24 * std::cbrt(static_cast<double>(n) - 15.0) - 1.8;
  return d < 0.5 ? 0.5 : d;
}

// Horn's closed-form absolute orientation: finds the rotation maximizing
// alignment of a onto b (both pre-centered), via the dominant eigenvector
// of the 4x4 quaternion matrix (power iteration with shift).
void kabsch_rotation(const std::vector<Vec3>& a, const std::vector<Vec3>& b,
                     double R[3][3]) {
  double H[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (size_t i = 0; i < a.size(); ++i) {
    const double av[3] = {a[i].x, a[i].y, a[i].z};
    const double bv[3] = {b[i].x, b[i].y, b[i].z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) H[r][c] += av[r] * bv[c];
  }
  // 4x4 symmetric key matrix.
  double N[4][4];
  N[0][0] = H[0][0] + H[1][1] + H[2][2];
  N[0][1] = H[1][2] - H[2][1];
  N[0][2] = H[2][0] - H[0][2];
  N[0][3] = H[0][1] - H[1][0];
  N[1][1] = H[0][0] - H[1][1] - H[2][2];
  N[1][2] = H[0][1] + H[1][0];
  N[1][3] = H[2][0] + H[0][2];
  N[2][2] = -H[0][0] + H[1][1] - H[2][2];
  N[2][3] = H[1][2] + H[2][1];
  N[3][3] = -H[0][0] - H[1][1] + H[2][2];
  for (int r = 1; r < 4; ++r)
    for (int c = 0; c < r; ++c) N[r][c] = N[c][r];

  // Jacobi eigensolver on the 4x4 symmetric matrix: exact dominant
  // eigenvector regardless of spectral gap (power iteration stalls on
  // elongated traces where two eigenvalues nearly coincide).
  double V[4][4] = {{1, 0, 0, 0}, {0, 1, 0, 0}, {0, 0, 1, 0}, {0, 0, 0, 1}};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < 4; ++p)
      for (int qi = p + 1; qi < 4; ++qi) off += N[p][qi] * N[p][qi];
    if (off < 1e-24) break;
    for (int p = 0; p < 4; ++p) {
      for (int qi = p + 1; qi < 4; ++qi) {
        if (std::fabs(N[p][qi]) < 1e-18) continue;
        const double theta = (N[qi][qi] - N[p][p]) / (2.0 * N[p][qi]);
        const double t = (theta >= 0 ? 1.0 : -1.0) /
                         (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        const double cth = 1.0 / std::sqrt(t * t + 1.0);
        const double sth = t * cth;
        for (int k = 0; k < 4; ++k) {
          const double nkp = N[k][p], nkq = N[k][qi];
          N[k][p] = cth * nkp - sth * nkq;
          N[k][qi] = sth * nkp + cth * nkq;
        }
        for (int k = 0; k < 4; ++k) {
          const double npk = N[p][k], nqk = N[qi][k];
          N[p][k] = cth * npk - sth * nqk;
          N[qi][k] = sth * npk + cth * nqk;
        }
        for (int k = 0; k < 4; ++k) {
          const double vkp = V[k][p], vkq = V[k][qi];
          V[k][p] = cth * vkp - sth * vkq;
          V[k][qi] = sth * vkp + cth * vkq;
        }
      }
    }
  }
  int best_col = 0;
  for (int c = 1; c < 4; ++c)
    if (N[c][c] > N[best_col][best_col]) best_col = c;
  const double w = V[0][best_col], x = V[1][best_col], y = V[2][best_col],
               z = V[3][best_col];
  R[0][0] = w * w + x * x - y * y - z * z;
  R[0][1] = 2 * (x * y - w * z);
  R[0][2] = 2 * (x * z + w * y);
  R[1][0] = 2 * (x * y + w * z);
  R[1][1] = w * w - x * x + y * y - z * z;
  R[1][2] = 2 * (y * z - w * x);
  R[2][0] = 2 * (x * z - w * y);
  R[2][1] = 2 * (y * z + w * x);
  R[2][2] = w * w - x * x - y * y + z * z;
}

// Superimposes a[idx] onto b[idx]; returns per-residue distances of the
// FULL chains under that transform and the TM-score sum with d0.
double score_subset(const std::vector<Vec3>& a, const std::vector<Vec3>& b,
                    const std::vector<int>& idx, double d0,
                    std::vector<double>* dist_out) {
  const size_t m = idx.size();
  if (m < 3) return -1.0;
  Vec3 ca{0, 0, 0}, cb{0, 0, 0};
  for (int i : idx) {
    ca.x += a[i].x; ca.y += a[i].y; ca.z += a[i].z;
    cb.x += b[i].x; cb.y += b[i].y; cb.z += b[i].z;
  }
  ca.x /= m; ca.y /= m; ca.z /= m;
  cb.x /= m; cb.y /= m; cb.z /= m;

  std::vector<Vec3> as(m), bs(m);
  for (size_t k = 0; k < m; ++k) {
    const int i = idx[k];
    as[k] = {a[i].x - ca.x, a[i].y - ca.y, a[i].z - ca.z};
    bs[k] = {b[i].x - cb.x, b[i].y - cb.y, b[i].z - cb.z};
  }
  double R[3][3];
  kabsch_rotation(as, bs, R);

  const size_t n = a.size();
  dist_out->resize(n);
  double tm_sum = 0.0;
  const double d0sq = d0 * d0;
  for (size_t i = 0; i < n; ++i) {
    const double ax = a[i].x - ca.x, ay = a[i].y - ca.y, az = a[i].z - ca.z;
    const double rx = R[0][0] * ax + R[0][1] * ay + R[0][2] * az + cb.x;
    const double ry = R[1][0] * ax + R[1][1] * ay + R[1][2] * az + cb.y;
    const double rz = R[2][0] * ax + R[2][1] * ay + R[2][2] * az + cb.z;
    const double dx = rx - b[i].x, dy = ry - b[i].y, dz = rz - b[i].z;
    const double dsq = dx * dx + dy * dy + dz * dz;
    (*dist_out)[i] = std::sqrt(dsq);
    tm_sum += 1.0 / (1.0 + dsq / d0sq);
  }
  return tm_sum;
}

double tm_score_impl(const float* xyz1, int n1, const float* xyz2, int n2,
                     int norm_len) {
  const int n = std::min(n1, n2);
  if (n < 3) return 0.0;
  std::vector<Vec3> a(n), b(n);
  for (int i = 0; i < n; ++i) {
    a[i] = {xyz1[3 * i], xyz1[3 * i + 1], xyz1[3 * i + 2]};
    b[i] = {xyz2[3 * i], xyz2[3 * i + 1], xyz2[3 * i + 2]};
  }
  const double d0 = d0_of(norm_len);
  const double cutoff = std::max(d0, 4.5);

  double best = 0.0;
  std::vector<double> dist;
  std::vector<int> idx;
  const int frags[4] = {n, n / 2, n / 4, 8};
  for (int f = 0; f < 4; ++f) {
    const int L = frags[f];
    if (L < 3) continue;
    const int step = std::max(L / 2, 1);
    for (int start = 0; start + L <= n; start += step) {
      idx.resize(L);
      for (int i = 0; i < L; ++i) idx[i] = start + i;
      double prev = -1.0;
      for (int it = 0; it < 20; ++it) {
        const double s = score_subset(a, b, idx, d0, &dist);
        if (s < 0) break;
        best = std::max(best, s);
        if (std::fabs(s - prev) < 1e-9) break;
        prev = s;
        idx.clear();
        for (int i = 0; i < n; ++i)
          if (dist[i] < cutoff) idx.push_back(i);
        if (static_cast<int>(idx.size()) < 3) break;
      }
    }
  }
  return best / norm_len;
}

}  // namespace

extern "C" {

// TM-scores normalized by each chain's length (the tmtools contract).
void tm_score_pair(const float* xyz1, int n1, const float* xyz2, int n2,
                   double* tm_norm1, double* tm_norm2) {
  *tm_norm1 = tm_score_impl(xyz1, n1, xyz2, n2, n1);
  *tm_norm2 = tm_score_impl(xyz1, n1, xyz2, n2, n2);
}

// Kabsch-aligned RMSD under the identity alignment.
double aligned_rmsd(const float* xyz1, const float* xyz2, int n) {
  if (n < 3) return 0.0;
  std::vector<Vec3> a(n), b(n);
  for (int i = 0; i < n; ++i) {
    a[i] = {xyz1[3 * i], xyz1[3 * i + 1], xyz1[3 * i + 2]};
    b[i] = {xyz2[3 * i], xyz2[3 * i + 1], xyz2[3 * i + 2]};
  }
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  std::vector<double> dist;
  score_subset(a, b, idx, 5.0, &dist);
  double ssq = 0.0;
  for (int i = 0; i < n; ++i) ssq += dist[i] * dist[i];
  return std::sqrt(ssq / n);
}
}
