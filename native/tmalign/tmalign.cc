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

// ---------------------------------------------------------------------------
// Sequence-independent TM-align (Zhang & Skolnick 2005, NAR 33:2302).
//
// The reference's tmtools call (`analysis/metrics.py:44-46`) performs a full
// structural alignment between chains of possibly different lengths; the
// identity-alignment path above is only valid when the two chains share a
// residue correspondence (self-consistency scTM). The functions below
// implement the TM-align search: initial alignments from gapless threading
// and secondary-structure dynamic programming, then iterative
// {superpose-on-aligned-pairs -> distance-scored Needleman-Wunsch} until the
// alignment converges, scoring with the TM-score machinery above.
// ---------------------------------------------------------------------------

struct Transform {
  double R[3][3];
  Vec3 ca;  // center of the mobile (a) subset
  Vec3 cb;  // center of the target (b) subset
};

inline Vec3 apply(const Transform& t, const Vec3& p) {
  const double x = p.x - t.ca.x, y = p.y - t.ca.y, z = p.z - t.ca.z;
  return {t.R[0][0] * x + t.R[0][1] * y + t.R[0][2] * z + t.cb.x,
          t.R[1][0] * x + t.R[1][1] * y + t.R[1][2] * z + t.cb.y,
          t.R[2][0] * x + t.R[2][1] * y + t.R[2][2] * z + t.cb.z};
}

// Least-squares superposition of a_pts onto b_pts (same length).
void superpose(const std::vector<Vec3>& a_pts, const std::vector<Vec3>& b_pts,
               Transform* t) {
  const size_t m = a_pts.size();
  Vec3 ca{0, 0, 0}, cb{0, 0, 0};
  for (size_t i = 0; i < m; ++i) {
    ca.x += a_pts[i].x; ca.y += a_pts[i].y; ca.z += a_pts[i].z;
    cb.x += b_pts[i].x; cb.y += b_pts[i].y; cb.z += b_pts[i].z;
  }
  ca.x /= m; ca.y /= m; ca.z /= m;
  cb.x /= m; cb.y /= m; cb.z /= m;
  std::vector<Vec3> as(m), bs(m);
  for (size_t i = 0; i < m; ++i) {
    as[i] = {a_pts[i].x - ca.x, a_pts[i].y - ca.y, a_pts[i].z - ca.z};
    bs[i] = {b_pts[i].x - cb.x, b_pts[i].y - cb.y, b_pts[i].z - cb.z};
  }
  kabsch_rotation(as, bs, t->R);
  t->ca = ca;
  t->cb = cb;
}

// TM-score sum over an aligned pair list (pa[k] <-> pb[k]) with the
// TM-score program's fragment-seeded, cutoff-refined superposition search.
// Returns the best raw sum (divide by norm_len for the score); fills
// best_tf with the transform achieving it.
double tm_of_pairs(const std::vector<Vec3>& a, const std::vector<Vec3>& b,
                   const std::vector<int>& pa, const std::vector<int>& pb,
                   double d0, double cutoff, Transform* best_tf) {
  const int L = static_cast<int>(pa.size());
  if (L < 3) return 0.0;
  const double d0sq = d0 * d0;
  double best = -1.0;
  std::vector<Vec3> sa, sb;
  std::vector<int> sel;
  std::vector<double> dist(L);
  const int frags[3] = {L, L / 2, 8};
  for (int f = 0; f < 3; ++f) {
    const int fl = frags[f];
    if (fl < 3 || fl > L) continue;
    const int step = std::max(fl / 2, 1);
    for (int start = 0; start + fl <= L; start += step) {
      sel.resize(fl);
      for (int i = 0; i < fl; ++i) sel[i] = start + i;
      double prev = -1.0;
      for (int it = 0; it < 20; ++it) {
        sa.resize(sel.size());
        sb.resize(sel.size());
        for (size_t k = 0; k < sel.size(); ++k) {
          sa[k] = a[pa[sel[k]]];
          sb[k] = b[pb[sel[k]]];
        }
        Transform tf;
        superpose(sa, sb, &tf);
        double sum = 0.0;
        for (int k = 0; k < L; ++k) {
          const Vec3 ap = apply(tf, a[pa[k]]);
          const double dx = ap.x - b[pb[k]].x, dy = ap.y - b[pb[k]].y,
                       dz = ap.z - b[pb[k]].z;
          const double dsq = dx * dx + dy * dy + dz * dz;
          dist[k] = std::sqrt(dsq);
          sum += 1.0 / (1.0 + dsq / d0sq);
        }
        if (sum > best) {
          best = sum;
          if (best_tf) *best_tf = tf;
        }
        if (std::fabs(sum - prev) < 1e-9) break;
        prev = sum;
        sel.clear();
        for (int k = 0; k < L; ++k)
          if (dist[k] < cutoff) sel.push_back(k);
        if (static_cast<int>(sel.size()) < 3) break;
      }
    }
  }
  return best < 0.0 ? 0.0 : best;
}

// Needleman-Wunsch with TM-align's gap convention: a gap costs `gap_open`
// only when it opens (the previous step along that gap's direction was a
// match); extensions are free. Fills ali (size n1) with the aligned j for
// each i, or -1.
void nwdp(const std::vector<double>& score, int n1, int n2, double gap_open,
          std::vector<int>* ali) {
  const int W = n2 + 1;
  std::vector<double> val((n1 + 1) * W, 0.0);
  // dir: 0 = diag (match), 1 = up (gap in b), 2 = left (gap in a).
  std::vector<unsigned char> dir((n1 + 1) * W, 0);
  for (int j = 1; j <= n2; ++j) dir[j] = 2;
  for (int i = 1; i <= n1; ++i) dir[i * W] = 1;
  for (int i = 1; i <= n1; ++i) {
    for (int j = 1; j <= n2; ++j) {
      const double d =
          val[(i - 1) * W + (j - 1)] + score[(i - 1) * n2 + (j - 1)];
      const double h =
          val[(i - 1) * W + j] + (dir[(i - 1) * W + j] == 0 ? gap_open : 0.0);
      const double v =
          val[i * W + (j - 1)] + (dir[i * W + (j - 1)] == 0 ? gap_open : 0.0);
      if (d >= h && d >= v) {
        val[i * W + j] = d;
        dir[i * W + j] = 0;
      } else if (h >= v) {
        val[i * W + j] = h;
        dir[i * W + j] = 1;
      } else {
        val[i * W + j] = v;
        dir[i * W + j] = 2;
      }
    }
  }
  ali->assign(n1, -1);
  int i = n1, j = n2;
  while (i > 0 && j > 0) {
    const unsigned char d = dir[i * W + j];
    if (d == 0) {
      (*ali)[i - 1] = j - 1;
      --i;
      --j;
    } else if (d == 1) {
      --i;
    } else {
      --j;
    }
  }
}

// CA-geometry secondary structure (TM-align's make_sec): helix/strand/turn
// from the i-2..i+2 CA distance fingerprint. 1=coil 2=helix 3=turn 4=strand.
std::vector<char> make_sec(const std::vector<Vec3>& x) {
  const int n = static_cast<int>(x.size());
  std::vector<char> sec(n, 1);
  auto dist = [&](int i, int j) {
    const double dx = x[i].x - x[j].x, dy = x[i].y - x[j].y,
                 dz = x[i].z - x[j].z;
    return std::sqrt(dx * dx + dy * dy + dz * dz);
  };
  for (int i = 2; i < n - 2; ++i) {
    const double d13 = dist(i - 2, i), d14 = dist(i - 2, i + 1),
                 d15 = dist(i - 2, i + 2), d24 = dist(i - 1, i + 1),
                 d25 = dist(i - 1, i + 2), d35 = dist(i, i + 2);
    double delta = 2.1;
    if (std::fabs(d15 - 6.37) < delta && std::fabs(d14 - 5.18) < delta &&
        std::fabs(d25 - 5.18) < delta && std::fabs(d13 - 5.45) < delta &&
        std::fabs(d24 - 5.45) < delta && std::fabs(d35 - 5.45) < delta) {
      sec[i] = 2;  // helix
      continue;
    }
    delta = 1.42;
    if (std::fabs(d15 - 13.0) < delta && std::fabs(d14 - 10.4) < delta &&
        std::fabs(d25 - 10.4) < delta && std::fabs(d13 - 6.1) < delta &&
        std::fabs(d24 - 6.1) < delta && std::fabs(d35 - 6.1) < delta) {
      sec[i] = 4;  // strand
      continue;
    }
    if (d15 < 8.0) sec[i] = 3;  // turn
  }
  return sec;
}

void pairs_from_ali(const std::vector<int>& ali, std::vector<int>* pa,
                    std::vector<int>* pb) {
  pa->clear();
  pb->clear();
  for (size_t i = 0; i < ali.size(); ++i) {
    if (ali[i] >= 0) {
      pa->push_back(static_cast<int>(i));
      pb->push_back(ali[i]);
    }
  }
}

// Iterative refinement: superpose on the current alignment, rescore the
// full n1 x n2 distance matrix, realign by DP; keep the best alignment seen.
void dp_iterate(const std::vector<Vec3>& a, const std::vector<Vec3>& b,
                const std::vector<int>& ali_init, double d0, double cutoff,
                double* best_sum, std::vector<int>* best_ali) {
  const int n1 = static_cast<int>(a.size());
  const int n2 = static_cast<int>(b.size());
  const double d0sq = d0 * d0;
  std::vector<int> ali = ali_init, pa, pb;
  std::vector<double> score(static_cast<size_t>(n1) * n2);
  for (int it = 0; it < 30; ++it) {
    pairs_from_ali(ali, &pa, &pb);
    if (static_cast<int>(pa.size()) < 3) return;
    Transform tf;
    const double sum = tm_of_pairs(a, b, pa, pb, d0, cutoff, &tf);
    if (sum > *best_sum) {
      *best_sum = sum;
      *best_ali = ali;
    }
    // Score matrix under the best transform of this alignment.
    std::vector<Vec3> at(n1);
    for (int i = 0; i < n1; ++i) at[i] = apply(tf, a[i]);
    for (int i = 0; i < n1; ++i) {
      for (int j = 0; j < n2; ++j) {
        const double dx = at[i].x - b[j].x, dy = at[i].y - b[j].y,
                     dz = at[i].z - b[j].z;
        score[static_cast<size_t>(i) * n2 + j] =
            1.0 / (1.0 + (dx * dx + dy * dy + dz * dz) / d0sq);
      }
    }
    std::vector<int> new_ali;
    nwdp(score, n1, n2, -0.6, &new_ali);
    if (new_ali == ali) return;  // converged
    ali = new_ali;
  }
  // Score the final alignment too.
  pairs_from_ali(ali, &pa, &pb);
  if (static_cast<int>(pa.size()) >= 3) {
    const double sum = tm_of_pairs(a, b, pa, pb, d0, cutoff, nullptr);
    if (sum > *best_sum) {
      *best_sum = sum;
      *best_ali = ali;
    }
  }
}

// Full TM-align between two CA traces. Fills ali_out (size n1, -1 = gap)
// when non-null; returns TM-scores normalized by n1 and by n2.
void tm_align_impl(const float* xyz1, int n1, const float* xyz2, int n2,
                   double* tm_norm1, double* tm_norm2, int* ali_out) {
  *tm_norm1 = 0.0;
  *tm_norm2 = 0.0;
  if (n1 < 3 || n2 < 3) return;
  std::vector<Vec3> a(n1), b(n2);
  for (int i = 0; i < n1; ++i)
    a[i] = {xyz1[3 * i], xyz1[3 * i + 1], xyz1[3 * i + 2]};
  for (int j = 0; j < n2; ++j)
    b[j] = {xyz2[3 * j], xyz2[3 * j + 1], xyz2[3 * j + 2]};
  const int nmin = std::min(n1, n2);
  const double d0 = d0_of(nmin);
  const double cutoff = std::min(std::max(d0, 4.5), 8.0);

  double best_sum = -1.0;
  std::vector<int> best_ali;

  // Initial 1: gapless threading — best diagonal by one-shot superposition
  // + one cutoff refinement.
  {
    double best_thread = -1.0;
    std::vector<int> best_thread_ali;
    std::vector<int> pa, pb;
    const int min_overlap = std::max(5, nmin / 4);
    for (int shift = -(n2 - min_overlap); shift <= n1 - min_overlap; ++shift) {
      const int i0 = std::max(0, shift);
      const int i1 = std::min(n1, n2 + shift);
      const int L = i1 - i0;
      if (L < min_overlap) continue;
      pa.resize(L);
      pb.resize(L);
      for (int k = 0; k < L; ++k) {
        pa[k] = i0 + k;
        pb[k] = i0 + k - shift;
      }
      // Quick score: superpose on all overlap pairs, one refinement pass.
      std::vector<Vec3> sa(L), sb(L);
      for (int k = 0; k < L; ++k) {
        sa[k] = a[pa[k]];
        sb[k] = b[pb[k]];
      }
      Transform tf;
      superpose(sa, sb, &tf);
      double sum = 0.0;
      std::vector<int> close;
      for (int k = 0; k < L; ++k) {
        const Vec3 ap = apply(tf, a[pa[k]]);
        const double dx = ap.x - b[pb[k]].x, dy = ap.y - b[pb[k]].y,
                     dz = ap.z - b[pb[k]].z;
        const double dsq = dx * dx + dy * dy + dz * dz;
        sum += 1.0 / (1.0 + dsq / (d0 * d0));
        if (std::sqrt(dsq) < cutoff) close.push_back(k);
      }
      if (static_cast<int>(close.size()) >= 3) {
        std::vector<Vec3> ca2(close.size()), cb2(close.size());
        for (size_t k = 0; k < close.size(); ++k) {
          ca2[k] = a[pa[close[k]]];
          cb2[k] = b[pb[close[k]]];
        }
        superpose(ca2, cb2, &tf);
        double sum2 = 0.0;
        for (int k = 0; k < L; ++k) {
          const Vec3 ap = apply(tf, a[pa[k]]);
          const double dx = ap.x - b[pb[k]].x, dy = ap.y - b[pb[k]].y,
                       dz = ap.z - b[pb[k]].z;
          sum2 += 1.0 / (1.0 + (dx * dx + dy * dy + dz * dz) / (d0 * d0));
        }
        sum = std::max(sum, sum2);
      }
      if (sum > best_thread) {
        best_thread = sum;
        best_thread_ali.assign(n1, -1);
        for (int k = 0; k < L; ++k) best_thread_ali[pa[k]] = pb[k];
      }
    }
    if (!best_thread_ali.empty())
      dp_iterate(a, b, best_thread_ali, d0, cutoff, &best_sum, &best_ali);
  }

  // Initial 2: secondary-structure DP (match 1 / mismatch 0, gap -1).
  const std::vector<char> sa_sec = make_sec(a), sb_sec = make_sec(b);
  {
    std::vector<double> score(static_cast<size_t>(n1) * n2);
    for (int i = 0; i < n1; ++i)
      for (int j = 0; j < n2; ++j)
        score[static_cast<size_t>(i) * n2 + j] =
            sa_sec[i] == sb_sec[j] ? 1.0 : 0.0;
    std::vector<int> ali;
    nwdp(score, n1, n2, -1.0, &ali);
    dp_iterate(a, b, ali, d0, cutoff, &best_sum, &best_ali);
  }

  // Initial 3: hybrid — distance score under the best superposition so far
  // + 0.5 * secondary-structure match (TM-align's get_initial_ssplus).
  if (!best_ali.empty()) {
    std::vector<int> pa, pb;
    pairs_from_ali(best_ali, &pa, &pb);
    Transform tf;
    tm_of_pairs(a, b, pa, pb, d0, cutoff, &tf);
    std::vector<double> score(static_cast<size_t>(n1) * n2);
    for (int i = 0; i < n1; ++i) {
      const Vec3 ap = apply(tf, a[i]);
      for (int j = 0; j < n2; ++j) {
        const double dx = ap.x - b[j].x, dy = ap.y - b[j].y,
                     dz = ap.z - b[j].z;
        score[static_cast<size_t>(i) * n2 + j] =
            1.0 / (1.0 + (dx * dx + dy * dy + dz * dz) / (d0 * d0)) +
            (sa_sec[i] == sb_sec[j] ? 0.5 : 0.0);
      }
    }
    std::vector<int> ali;
    nwdp(score, n1, n2, -0.6, &ali);
    dp_iterate(a, b, ali, d0, cutoff, &best_sum, &best_ali);
  }

  if (best_ali.empty()) return;
  std::vector<int> pa, pb;
  pairs_from_ali(best_ali, &pa, &pb);
  if (static_cast<int>(pa.size()) < 3) return;
  // Final scores: full TM-score search over the aligned pairs, with the
  // normalization length's own d0 (the tmtools contract).
  const double d0_1 = d0_of(n1), d0_2 = d0_of(n2);
  *tm_norm1 =
      tm_of_pairs(a, b, pa, pb, d0_1, std::min(std::max(d0_1, 4.5), 8.0),
                  nullptr) /
      n1;
  *tm_norm2 =
      tm_of_pairs(a, b, pa, pb, d0_2, std::min(std::max(d0_2, 4.5), 8.0),
                  nullptr) /
      n2;
  if (ali_out) {
    for (int i = 0; i < n1; ++i) ali_out[i] = best_ali[i];
  }
}

}  // namespace

extern "C" {

// Sequence-independent TM-align (Zhang & Skolnick 2005). ali_out may be
// null; otherwise it receives, for each residue of chain 1, the aligned
// residue index in chain 2 or -1.
void tm_align_pair(const float* xyz1, int n1, const float* xyz2, int n2,
                   double* tm_norm1, double* tm_norm2, int* ali_out) {
  tm_align_impl(xyz1, n1, xyz2, n2, tm_norm1, tm_norm2, ali_out);
}

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
