// Native PT-MPO builder: the streaming windowed MPS construction of
// pyaceqd_tpu/engine/ptmpo.py::build_pt_tensors, in C++ against BLAS/LAPACK.
//
// This is the framework's "graph builder" equivalent of the reference's C++
// PT-MPO engine (the ACE binary driven by pyaceqd/general_system.py): the
// process-tensor network is prepared natively on the host, then handed to the
// XLA/TPU propagation path.  Algorithm identical to the Python implementation
// (same sweep order, same gauge pinning, same truncation rule) so the two
// backends are interchangeable and cross-checked in tests/test_native.py.
//
// Layout trick: all tensors are row-major (numpy C order).  LAPACK is
// column-major, and a row-major (m,n) buffer *is* the col-major (n,m)
// transpose, so
//   QR  of row-major M  == LQ  (zgelqf/zunglq) of the same buffer,
//   SVD of row-major M  == SVD of the transpose with U/Vh swapped,
//   row-major GEMM      == col-major GEMM with operands swapped.
// No physical transposes anywhere.

#include <complex>
#include <cstring>
#include <vector>
#include <deque>
#include <utility>
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <dlfcn.h>

using cplx = std::complex<double>;

// BLAS / LAPACK resolved at runtime: prefer an optimized OpenBLAS passed in
// by the Python wrapper (scipy bundles one with `scipy_`-prefixed symbols),
// fall back to the system netlib liblapack/libblas.
typedef void (*zgemm_t)(const char*, const char*, const int*, const int*,
                        const int*, const cplx*, const cplx*, const int*,
                        const cplx*, const int*, const cplx*, cplx*,
                        const int*);
typedef void (*zgelqf_t)(const int*, const int*, cplx*, const int*, cplx*,
                         cplx*, const int*, int*);
typedef void (*zunglq_t)(const int*, const int*, const int*, cplx*, const int*,
                         const cplx*, cplx*, const int*, int*);
typedef void (*zgesdd_t)(const char*, const int*, const int*, cplx*,
                         const int*, double*, cplx*, const int*, cplx*,
                         const int*, cplx*, const int*, double*, int*, int*);
typedef void (*zgesvd_t)(const char*, const char*, const int*, const int*,
                         cplx*, const int*, double*, cplx*, const int*, cplx*,
                         const int*, cplx*, const int*, double*, int*);

static zgemm_t zgemm_ = nullptr;
static zgelqf_t zgelqf_ = nullptr;
static zunglq_t zunglq_ = nullptr;
static zgesdd_t zgesdd_ = nullptr;
static zgesvd_t zgesvd_ = nullptr;  // robust fallback driver (optional)

static void* resolve(void* h1, void* h2, const char* base) {
  char pre[64];
  std::snprintf(pre, sizeof(pre), "scipy_%s", base);
  for (void* h : {h1, h2}) {
    if (!h) continue;
    if (void* s = dlsym(h, pre)) return s;
    if (void* s = dlsym(h, base)) return s;
  }
  return nullptr;
}

extern "C" int pt_init(const char* blas_path) {
  void* h1 = blas_path && blas_path[0] ? dlopen(blas_path, RTLD_NOW | RTLD_LOCAL)
                                       : nullptr;
  void* h2 = dlopen("liblapack.so.3", RTLD_NOW | RTLD_GLOBAL);
  if (h2) dlopen("libblas.so.3", RTLD_NOW | RTLD_GLOBAL);
  zgemm_ = (zgemm_t)resolve(h1, h2, "zgemm_");
  zgelqf_ = (zgelqf_t)resolve(h1, h2, "zgelqf_");
  zunglq_ = (zunglq_t)resolve(h1, h2, "zunglq_");
  zgesdd_ = (zgesdd_t)resolve(h1, h2, "zgesdd_");
  zgesvd_ = (zgesvd_t)resolve(h1, h2, "zgesvd_");
  return (zgemm_ && zgelqf_ && zunglq_ && zgesdd_) ? (h1 ? 1 : 2) : -1;
}

// Phase profiling for the stationary stepper (PYACEQD_TPU_NATIVE_PROF=1):
// cumulative seconds per ptinf_step section, dumped by ptinf_prof().
struct ProfClock {
  double zip = 0, qr1 = 0, svd = 0, qr2 = 0, emit = 0, lwin = 0, spec = 0;
  long steps = 0;
  long max_bond = 0, sum_bond = 0;  // per-iteration max chain bond telemetry
  double w_s = 0, r_s = 0, x_s = 0;  // per-truncation-path seconds
  long w_n = 0, r_n = 0, x_n = 0;    // ... and call counts (warm/rand/exact)
};
static ProfClock* g_prof = nullptr;  // set by ptinf_step while profiling
// Set whenever an UNLOCKED truncation wanted more rank than chi_max allowed —
// i.e. the cap (not the SVD threshold) decided a cut somewhere.  Reset by
// pt_build / ptinf_step; surfaces ACE's "threshold alone governs chi"
// semantics honestly (emitted bond dims alone cannot: interior window bonds
// can bind while the emission bond stays below the cap).
static bool g_capped = false;
// count of truncations that took a non-exact (randomized / warm-subspace)
// SVD path since the last pt_build2 entry; reported via info_out[1] so the
// parity tests can assert the randomized path actually fired at the shapes
// they exercise (ADVICE r4).
static long g_rsvd_n = 0;
static bool prof_on() {
  static int on = -1;
  if (on < 0) {
    const char* e = std::getenv("PYACEQD_TPU_NATIVE_PROF");
    on = (e && e[0] == '1') ? 1 : 0;
  }
  return on == 1;
}
static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

namespace {

struct Tensor {
  int a = 0, g = 0, b = 0;           // (chi_l, G, chi_r), row-major
  std::vector<cplx> data;
  cplx& at(int i, int j, int k) { return data[(size_t(i) * g + j) * b + k]; }
  void resize(int a_, int g_, int b_) {
    a = a_; g = g_; b = b_;
    data.assign(size_t(a) * g * b, cplx(0.0, 0.0));
  }
};

// C = A(m,k) @ B(k,n), all row-major.  Col-major equivalent: C^T = B^T A^T.
void matmul(const cplx* A, const cplx* B, cplx* C, int m, int k, int n) {
  const cplx one(1.0, 0.0), zero(0.0, 0.0);
  zgemm_("N", "N", &n, &m, &k, &one, B, &n, A, &k, &zero, C, &n);
}

// In-place thin QR of row-major M (m,n) with the gauge pinned
// (diag(R) real-positive).  On return: Q (m,kr) row-major in qout,
// R (kr,n) row-major in rout; kr = min(m,n).
void qr_rowmajor(std::vector<cplx>& M, int m, int n,
                 std::vector<cplx>& qout, std::vector<cplx>& rout, int& kr) {
  kr = std::min(m, n);
  // col-major view of M's buffer: (n, m).  LQ: M^T = L Q~ ; then
  // Q = Q~^T (row-major view of Q~'s buffer), R = L^T.
  int cm_m = n, cm_n = m, lda = n, info = 0, lwork = -1;
  std::vector<cplx> tau(kr);
  cplx wq;
  zgelqf_(&cm_m, &cm_n, M.data(), &lda, tau.data(), &wq, &lwork, &info);
  lwork = int(wq.real()) + 8;
  std::vector<cplx> work(lwork);
  zgelqf_(&cm_m, &cm_n, M.data(), &lda, tau.data(), work.data(), &lwork, &info);
  // L sits in the lower triangle of the (n,m) col-major factor.
  // R(i,j) = L(j,i) for i<=j (row-major R is (kr, n)): L col-major element
  // (row j_col=j<cm_m? careful) — L is (n, kr) col-major: L[p + n*q], p>=q.
  rout.assign(size_t(kr) * n, cplx(0.0, 0.0));
  for (int q = 0; q < kr; ++q)          // column of L == row of R
    for (int p = q; p < n; ++p)         // row of L == column of R
      rout[size_t(q) * n + p] = M[size_t(q) * n + p];  // col-major (n,·): L[p + n q] ... see note
  // NOTE: M viewed col-major (n,m) has element (p,q) at M[p + n*q]; the
  // row-major indexing above M[q*n + p] equals col-major (p, q) — correct.
  zunglq_(&kr, &cm_n, &kr, M.data(), &lda, tau.data(), &wq, &(lwork = -1), &info);
  lwork = int(wq.real()) + 8;
  work.resize(lwork);
  zunglq_(&kr, &cm_n, &kr, M.data(), &lda, tau.data(), work.data(), &lwork, &info);
  // Q~ is (kr, m) col-major in M's buffer with leading dim n; compact it into
  // qout as row-major Q (m, kr): Q(i,c) = Q~(c,i) = M[c + n*i].
  qout.resize(size_t(m) * kr);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < kr; ++c)
      qout[size_t(i) * kr + c] = M[size_t(i) * n + c];
  // gauge: make diag(R) real-positive
  for (int c = 0; c < kr; ++c) {
    cplx d = rout[size_t(c) * n + c];
    double mag = std::abs(d);
    cplx ph = (mag > 1e-300) ? d / mag : cplx(1.0, 0.0);
    cplx phc = std::conj(ph);
    for (int i = 0; i < m; ++i) qout[size_t(i) * kr + c] *= ph;
    for (int j = 0; j < n; ++j) rout[size_t(c) * n + j] *= phc;
  }
}

// Thin LQ of row-major M (m,n): M = L Qr with L (m,kr) lower-ish and
// Qr (kr,n) having orthonormal ROWS (Qr Qr^H = I), kr = min(m,n).  Built on
// qr_rowmajor via the conjugate-transpose duality M^H = Q~ R~  =>
// M = R~^H Q~^H.  This is the cheap exact replacement for a full SVD at a
// right-canonicalization step where only the gauge (not the spectrum) is
// needed: canonical forms are unique up to a bond unitary, and every
// consumer of the result (window Schmidt spectrum, weighted drift norms) is
// invariant under that unitary.
void lq_rowmajor(const std::vector<cplx>& M, int m, int n,
                 std::vector<cplx>& L, std::vector<cplx>& Qr, int& kr) {
  std::vector<cplx> Mh(size_t(n) * m);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j)
      Mh[size_t(j) * m + i] = std::conj(M[size_t(i) * n + j]);
  std::vector<cplx> Qt, Rt;
  qr_rowmajor(Mh, n, m, Qt, Rt, kr);   // Mh = Qt (n,kr) Rt (kr,m)
  L.resize(size_t(m) * kr);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < kr; ++c)
      L[size_t(i) * kr + c] = std::conj(Rt[size_t(c) * m + i]);
  Qr.resize(size_t(kr) * n);
  for (int c = 0; c < kr; ++c)
    for (int j = 0; j < n; ++j)
      Qr[size_t(c) * n + j] = std::conj(Qt[size_t(j) * kr + c]);
}

// SVD of row-major M (m,n): returns U (m,k) row-major, S (k), Vh (k,n)
// row-major, k = min(m,n).  Uses the transpose duality:
// svd(M^T) = U' S V'h  =>  U_M = V'h^T, Vh_M = U'^T.
// On zgesdd non-convergence falls back to the slower-but-robust zgesvd
// (mirrors the Python builder's gesvd fallback).  Returns LAPACK info.
int svd_rowmajor(std::vector<cplx>& M, int m, int n, std::vector<cplx>& U,
                 std::vector<double>& S, std::vector<cplx>& Vh) {
  int k = std::min(m, n);
  // (An explicit QR/LQ pre-reduction of lopsided inputs was tried and
  // MEASURED SLOWER in-loop: zgesdd already reduces internally at aspect
  // >= 1.6 with better constants than qr_rowmajor's zgelqf+zunglq pair —
  // the darkmodel n_mem=102 build regressed 983 s -> 1360 s.)
  int cm_m = n, cm_n = m, lda = n, info = 0, lwork = -1;
  S.resize(k);
  std::vector<cplx> Up(size_t(n) * k);   // U' (n,k) col-major
  std::vector<cplx> Vp(size_t(k) * m);   // V'h (k,m) col-major
  int ldu = n, ldvt = k;
  std::vector<double> rwork(size_t(k) * std::max(5 * k + 7, 2 * std::max(m, n) + 2 * k + 1) + 32);
  std::vector<int> iwork(8 * size_t(k) + 8);
  cplx wq;
  std::vector<cplx> Mcopy;
  if (zgesvd_) Mcopy = M;              // gesdd clobbers M; keep a fallback copy
  zgesdd_("S", &cm_m, &cm_n, M.data(), &lda, S.data(), Up.data(), &ldu,
          Vp.data(), &ldvt, &wq, &lwork, rwork.data(), iwork.data(), &info);
  lwork = int(wq.real()) + 8;
  std::vector<cplx> work(lwork);
  zgesdd_("S", &cm_m, &cm_n, M.data(), &lda, S.data(), Up.data(), &ldu,
          Vp.data(), &ldvt, work.data(), &lwork, rwork.data(), iwork.data(),
          &info);
  if (info != 0 && zgesvd_) {
    M = Mcopy;
    lwork = -1;
    zgesvd_("S", "S", &cm_m, &cm_n, M.data(), &lda, S.data(), Up.data(), &ldu,
            Vp.data(), &ldvt, &wq, &lwork, rwork.data(), &info);
    lwork = int(wq.real()) + 8;
    work.resize(lwork);
    zgesvd_("S", "S", &cm_m, &cm_n, M.data(), &lda, S.data(), Up.data(), &ldu,
            Vp.data(), &ldvt, work.data(), &lwork, rwork.data(), &info);
  }
  if (info != 0) std::fprintf(stderr, "ptmpo_native: svd info=%d\n", info);
  // U_M (m,k) row-major = V'h^T: U_M(i,c) = V'h(c,i) = Vp[c + k*i]
  U.resize(size_t(m) * k);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < k; ++c) U[size_t(i) * k + c] = Vp[size_t(i) * k + c];
  // (col-major (k,m) buffer read row-major IS the transpose — direct copy)
  // Vh_M (k,n) row-major = U'^T: Vh(c,j) = U'(j,c) = Up[j + n*c]
  Vh.resize(size_t(k) * n);
  for (int c = 0; c < k; ++c)
    for (int j = 0; j < n; ++j) Vh[size_t(c) * n + j] = Up[size_t(c) * n + j];
  return info;
}

// Randomized truncated SVD of row-major M (m,n) targeting rank <= k_target:
// range finder with one power iteration, then an exact SVD of the small
// projected matrix (Halko-Martinsson-Tropp).  Used for the zip-up
// pre-truncation where m = chi*D rows but only <= chi_max survive; a full
// zgesdd would compute all m singular values.  Deterministic (fixed-seed
// xorshift) so cached PT builds are reproducible bit-for-bit.
void rsvd_rowmajor(std::vector<cplx>& M, int m, int n, int k_target,
                   std::vector<cplx>& U, std::vector<double>& S,
                   std::vector<cplx>& Vh) {
  int k = std::min({k_target, m, n});
  // Gaussian-ish random test matrix Omega (n, k) via Box-Muller on xorshift64
  uint64_t st = 0x9e3779b97f4a7c15ull;
  auto rnd = [&st]() {
    st ^= st << 13; st ^= st >> 7; st ^= st << 17;
    return (double)(st >> 11) * (1.0 / 9007199254740992.0);  // [0,1)
  };
  std::vector<cplx> Om(size_t(n) * k);
  for (auto& x : Om) {
    double u1 = rnd(), u2 = rnd();
    double r = std::sqrt(-2.0 * std::log(u1 + 1e-300));
    x = cplx(r * std::cos(2 * M_PI * u2), r * std::sin(2 * M_PI * u2));
  }
  // Y = M Om (m, k)
  std::vector<cplx> Y(size_t(m) * k);
  matmul(M.data(), Om.data(), Y.data(), m, n, k);
  // power iterations (with QR re-orthonormalization for stability):
  // Y <- M (M^H Y)
  for (int q = 0; q < 2; ++q) {
    std::vector<cplx> Qy, Rdisc2;
    int kq = 0;
    qr_rowmajor(Y, m, k, Qy, Rdisc2, kq);
    std::vector<cplx> Yc(size_t(kq) * m);
    for (int i = 0; i < m; ++i)
      for (int c = 0; c < kq; ++c) Yc[size_t(c) * m + i] = std::conj(Qy[size_t(i) * kq + c]);
    std::vector<cplx> Z(size_t(kq) * n);
    matmul(Yc.data(), M.data(), Z.data(), kq, m, n);
    std::vector<cplx> Zh(size_t(n) * kq);
    for (int c = 0; c < kq; ++c)
      for (int j = 0; j < n; ++j) Zh[size_t(j) * kq + c] = std::conj(Z[size_t(c) * n + j]);
    Y.assign(size_t(m) * kq, cplx(0, 0));
    matmul(M.data(), Zh.data(), Y.data(), m, n, kq);
    k = kq;
  }
  // orthonormalize the range: QR of Y (m, k)
  std::vector<cplx> Q, Rdisc;
  int kr = 0;
  qr_rowmajor(Y, m, k, Q, Rdisc, kr);
  // C = Q^H M (kr, n)
  std::vector<cplx> Qc(size_t(kr) * m);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < kr; ++c) Qc[size_t(c) * m + i] = std::conj(Q[size_t(i) * kr + c]);
  std::vector<cplx> C(size_t(kr) * n);
  matmul(Qc.data(), M.data(), C.data(), kr, m, n);
  // exact SVD of the small C
  std::vector<cplx> Uc;
  svd_rowmajor(C, kr, n, Uc, S, Vh);
  // U = Q Uc (m, kk)
  int kk = int(S.size());
  U.resize(size_t(m) * kk);
  matmul(Q.data(), Uc.data(), U.data(), m, kr, kk);
}

// ---------------------------------------------------------------------------
// Finite-builder sweeps (pt_build2): the 4-sweep segment-scoped structure of
// pyaceqd_tpu/engine/ptmpo.py::build_pt_tensors.  The r4 two-sweep rewrite
// (fused zip + one full-chain L->R truncation per step) re-cut every bond
// every step and measurably degraded finite-PT accuracy (phonon_tls golden
// config: 5.9e-4 vs 5.0e-4 max observable error against a thr=1e-10/chi=128
// referee); the r5 adjudication (scripts/adjudicate_golden.py) reverted it.
// Bonds older than the effective kernel range are never re-truncated.
// ---------------------------------------------------------------------------

// chain[i] (a,g,b) -> QR of (a*g, b); absorb R into chain[i+1]
void qr_sweep_lr(std::vector<Tensor>& chain, int start) {
  for (int i = start; i + 1 < int(chain.size()); ++i) {
    Tensor& T = chain[i];
    int m = T.a * T.g, n = T.b, kr = 0;
    std::vector<cplx> Q, R;
    qr_rowmajor(T.data, m, n, Q, R, kr);
    Tensor nt;
    nt.a = T.a; nt.g = T.g; nt.b = kr; nt.data = std::move(Q);
    Tensor& N = chain[i + 1];
    Tensor out;
    out.resize(kr, N.g, N.b);
    matmul(R.data(), N.data.data(), out.data.data(), kr, N.a, N.g * N.b);
    chain[i] = std::move(nt);
    chain[i + 1] = std::move(out);
  }
}

// chain[i] (a,g,b) -> SVD of (a, g*b), truncate; absorb U*S into chain[i-1].
// use_rsvd: allow the randomized path when the row count far exceeds what
// can survive truncation (zip-up stage only; the exact sweep never).  The
// finite path defaults all-exact (goldens were generated that way and the
// rsvd drift is O(1e-5) on observables — ADVICE r4); opt in via
// PYACEQD_TPU_NATIVE_RSVD=1 for throwaway builds.
void svd_sweep_rl(std::vector<Tensor>& chain, double thr, int chi_max,
                  int stop, bool use_rsvd = false) {
  for (int i = int(chain.size()) - 1; i > stop; --i) {
    Tensor& T = chain[i];
    int m = T.a, n = T.g * T.b;
    std::vector<cplx> U, Vh;
    std::vector<double> S;
    int k_target = chi_max + 32;  // oversampling margin
    if (use_rsvd && m > 2 * k_target && n > k_target) {
      rsvd_rowmajor(T.data, m, n, k_target, U, S, Vh);
      ++g_rsvd_n;
    } else {
      svd_rowmajor(T.data, m, n, U, S, Vh);
    }
    int k = int(S.size());
    int keep = 1;
    if (k > 0 && S[0] > 0) {
      keep = 0;
      for (int c = 0; c < k; ++c)
        if (S[c] > S[0] * thr) ++keep;
    }
    if (keep > chi_max) g_capped = true;
    keep = std::max(1, std::min(chi_max, keep));
    Tensor nt;
    nt.a = keep; nt.g = T.g; nt.b = T.b;
    nt.data.assign(Vh.begin(), Vh.begin() + size_t(keep) * n);
    std::vector<cplx> US(size_t(m) * keep);
    for (int r = 0; r < m; ++r)
      for (int c = 0; c < keep; ++c)
        US[size_t(r) * keep + c] = U[size_t(r) * k + c] * S[c];
    Tensor& L = chain[i - 1];
    Tensor out;
    out.resize(L.a, L.g, keep);
    matmul(L.data.data(), US.data(), out.data.data(), L.a * L.g, L.b, keep);
    chain[i] = std::move(nt);
    chain[i - 1] = std::move(out);
  }
}

// multiply a new time step's influence factors into the chain
void apply_layer(std::vector<Tensor>& chain, const cplx* b0, const cplx* bD,
                 const int* d_of_g, int G, int D, int w_eff) {
  int W = int(chain.size());
  int start = std::max(0, W - w_eff);
  for (int j = start; j < W; ++j) {
    Tensor& P = chain[j];
    int delta = W - j;
    const cplx* B = bD + size_t(delta - 1) * D * G;  // (D, G)
    Tensor T;
    if (j == start) {
      // T(l, g, r*D + c) = P(l,g,r) * B(c,g)
      T.resize(P.a, G, P.b * D);
      for (int l = 0; l < P.a; ++l)
        for (int g = 0; g < G; ++g)
          for (int r = 0; r < P.b; ++r) {
            cplx p = P.at(l, g, r);
            for (int c = 0; c < D; ++c)
              T.at(l, g, r * D + c) = p * B[size_t(c) * G + g];
          }
    } else {
      // block-diagonal in c: T(l*D+c, g, r*D+c) = P(l,g,r) * B(c,g)
      T.resize(P.a * D, G, P.b * D);
      for (int l = 0; l < P.a; ++l)
        for (int g = 0; g < G; ++g)
          for (int r = 0; r < P.b; ++r) {
            cplx p = P.at(l, g, r);
            for (int c = 0; c < D; ++c)
              T.at(l * D + c, g, r * D + c) = p * B[size_t(c) * G + g];
          }
    }
    chain[j] = std::move(T);
  }
  // new site: emits its own d-value, weighted by the self term
  Tensor N;
  if (W == 0 || w_eff == 0) {
    N.resize(1, G, 1);
    for (int g = 0; g < G; ++g) N.at(0, g, 0) = b0[g];
  } else {
    N.resize(D, G, 1);
    for (int g = 0; g < G; ++g) N.at(d_of_g[g], g, 0) = b0[g];
  }
  chain.push_back(std::move(N));
}

// split off the oldest site in left-canonical gauge-pinned form
Tensor emit(std::vector<Tensor>& chain) {
  Tensor& T = chain[0];
  int m = T.a * T.g, n = T.b, kr = 0;
  std::vector<cplx> Q, R;
  qr_rowmajor(T.data, m, n, Q, R, kr);
  Tensor em;
  em.a = T.a; em.g = T.g; em.b = kr; em.data = std::move(Q);
  Tensor& N = chain[1];
  Tensor out;
  out.resize(kr, N.g, N.b);
  matmul(R.data(), N.data.data(), out.data.data(), kr, N.a, N.g * N.b);
  chain.erase(chain.begin());
  chain[0] = std::move(out);
  return em;
}

// ---------------------------------------------------------------------------
// Stationary (ptinf) builder support: the per-iteration numeric work of
// pyaceqd_tpu/engine/ptinf.py::build_stationary_pt — fused zip-layer sweep,
// QR re-canonicalization, aligned/locked SVD truncation sweep, emission, and
// the window Schmidt factor — behind a persistent state handle.  All control
// logic (period detection, drift acceptance, stall doubling, final cycle
// assembly) stays in Python and is shared verbatim between backends.
// ---------------------------------------------------------------------------

// SVD with the gauge pinned like ptinf._svd_pinned: each Vh row is rotated so
// its max-|.| element is real-positive (U columns co-rotated).
int svd_pinned(std::vector<cplx>& M, int m, int n, std::vector<cplx>& U,
               std::vector<double>& S, std::vector<cplx>& Vh) {
  int info = svd_rowmajor(M, m, n, U, S, Vh);
  int k = int(S.size());
  for (int c = 0; c < k; ++c) {
    double best = -1.0;
    cplx piv(1.0, 0.0);
    for (int j = 0; j < n; ++j) {
      double a = std::abs(Vh[size_t(c) * n + j]);
      if (a > best) { best = a; piv = Vh[size_t(c) * n + j]; }
    }
    cplx ph = (best > 0) ? piv / std::abs(piv) : cplx(1.0, 0.0);
    cplx phc = std::conj(ph);
    for (int j = 0; j < n; ++j) Vh[size_t(c) * n + j] *= phc;
    for (int i = 0; i < m; ++i) U[size_t(i) * k + c] *= ph;
  }
  return info;
}

// C (m,p) = A (m,k) @ B^H, B row-major (p,k).  Col-major: C^T = conj(B) A^T.
void matmul_nc(const cplx* A, const cplx* B, cplx* C, int m, int k, int p) {
  const cplx one(1.0, 0.0), zero(0.0, 0.0);
  zgemm_("C", "N", &p, &m, &k, &one, B, &k, A, &k, &zero, C, &p);
}

// Unitary polar factor of the square matrix M (k,k); false on SVD failure
// (caller skips gauge alignment — an optimization, never correctness).
bool polar_unitary(std::vector<cplx> M, int k, std::vector<cplx>& P) {
  std::vector<cplx> U, Vh;
  std::vector<double> S;
  if (svd_rowmajor(M, k, k, U, S, Vh) != 0) return false;
  P.assign(size_t(k) * k, cplx(0, 0));
  matmul(U.data(), Vh.data(), P.data(), k, k, k);
  return true;
}

struct RecMat {             // recorded kept right basis V (k, n) at a bond
  int k = 0, n = 0;
  std::vector<cplx> v;
};
using RecSet = std::vector<RecMat>;   // indexed by site index; k==0 => absent

// Warm-started randomized subspace SVD of row-major M (m,n): the projection
// basis is the PREVIOUS ITERATION's kept right basis (rows of warm_v, (k_w,n))
// plus n_over random oversampling columns that catch rank growth / subspace
// drift.  Consecutive stationary-build iterations are near-identical maps
// (locked ranks, aligned gauges), so the warm basis is within O(drift) of the
// true top row space and zero power iterations suffice — measured 2x over the
// cold rsvd at darkmodel n_mem=102 shapes (366 x 1098, keep 122).
void wsvd_rowmajor(std::vector<cplx>& M, int m, int n, const cplx* warm_v,
                   int k_w, int n_over, std::vector<cplx>& U,
                   std::vector<double>& S, std::vector<cplx>& Vh) {
  int kc = std::min(k_w + n_over, std::min(m, n));
  // P (n, kc): first k_w columns = warm_v^H, rest Gaussian-ish random
  std::vector<cplx> P(size_t(n) * kc, cplx(0, 0));
  for (int r = 0; r < k_w; ++r)
    for (int j = 0; j < n; ++j)
      P[size_t(j) * kc + r] = std::conj(warm_v[size_t(r) * n + j]);
  uint64_t stx = 0xd1b54a32d192ed03ull;
  auto rnd = [&stx]() {
    stx ^= stx << 13; stx ^= stx >> 7; stx ^= stx << 17;
    return (double)(stx >> 11) * (1.0 / 9007199254740992.0);
  };
  for (int r = k_w; r < kc; ++r)
    for (int j = 0; j < n; ++j) {
      double u1 = rnd(), u2 = rnd();
      double rr = std::sqrt(-2.0 * std::log(u1 + 1e-300));
      P[size_t(j) * kc + r] = cplx(rr * std::cos(2 * M_PI * u2),
                                   rr * std::sin(2 * M_PI * u2));
    }
  std::vector<cplx> Y(size_t(m) * kc);
  matmul(M.data(), P.data(), Y.data(), m, n, kc);
  // one power iteration: sharpens the projected spectrum at the truncation
  // threshold edge (without it, near-edge singular values ratchet the kept
  // rank upward across iterations — measured chi 50 -> 57 on the n_mem=12
  // test bath)
  std::vector<cplx> Q, Rdisc;
  int kq = 0;
  qr_rowmajor(Y, m, kc, Q, Rdisc, kq);
  std::vector<cplx> Qc(size_t(kq) * m);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < kq; ++c)
      Qc[size_t(c) * m + i] = std::conj(Q[size_t(i) * kq + c]);
  std::vector<cplx> Z(size_t(kq) * n);
  matmul(Qc.data(), M.data(), Z.data(), kq, m, n);
  std::vector<cplx> Zh(size_t(n) * kq);
  for (int c = 0; c < kq; ++c)
    for (int j = 0; j < n; ++j)
      Zh[size_t(j) * kq + c] = std::conj(Z[size_t(c) * n + j]);
  Y.assign(size_t(m) * kq, cplx(0, 0));
  matmul(M.data(), Zh.data(), Y.data(), m, n, kq);
  qr_rowmajor(Y, m, kq, Q, Rdisc, kq);
  Qc.resize(size_t(kq) * m);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < kq; ++c)
      Qc[size_t(c) * m + i] = std::conj(Q[size_t(i) * kq + c]);
  std::vector<cplx> C(size_t(kq) * n);
  matmul(Qc.data(), M.data(), C.data(), kq, m, n);
  std::vector<cplx> Uc;
  svd_pinned(C, kq, n, Uc, S, Vh);
  int kk = int(S.size());
  U.resize(size_t(m) * kk);
  matmul(Q.data(), Uc.data(), U.data(), m, kq, kk);
}

// One truncation step shared by both sweeps: SVD (pinned) of M (m,n),
// threshold/lock rank rule (ptinf._keep_rank), gauge alignment to prev
// (unitary polar factor of prev V^H), basis recording.  V out (keep,n),
// C out (m,keep).  lock <= 0 means unlocked.  Matrices whose row count far
// exceeds the possible kept rank take the deterministic randomized-SVD path
// (exact small-SVD of the projected matrix; 2 power iterations) — at
// chi_max=128 weight-2 baths the zip-up rows are chi*D ~ 5x the kept rank
// and the full zgesdd dominates the whole build.  warm (the previous
// iteration's basis at this bond, lag 1) switches to the warm-started
// subspace path (wsvd_rowmajor) when shape-compatible and cheaper.
void trunc_step(std::vector<cplx>& M, int m, int n, double thr, int chi_max,
                int lock, const RecMat* prev, RecMat* rec,
                std::vector<cplx>& V, std::vector<cplx>& C, int& keep,
                bool allow_rsvd = true, bool do_align = true) {
  std::vector<cplx> U, Vh;
  std::vector<double> S;
  int k_target = (lock > 0 ? lock + 16 : chi_max + 32);
  const int n_over = 24;
  // warm start ONLY at rank-locked bonds: shapes match by construction
  // (locks freeze the rank pattern) and the kept rank is forced to the lock,
  // so the projected spectrum cannot ratchet the truncation decisions —
  // measured: unlocked warm starts wobbled the attractor (chi 25 -> 48 at
  // darkmodel n_mem=102) for zero wall-clock gain (shape flicker starved
  // the path)
  double tp0 = g_prof ? now_s() : 0;
  // adaptive randomized-SVD target at unlocked bonds: the previous
  // iteration's kept rank at this bond (lag-1 rec, available because
  // alignment targets are threaded pre-detection too) plus a growth margin —
  // the fixed chi_max+32 target pays ~1.3-1.6x extra gemm work once bonds
  // settle below the cap.  A kept rank crowding the adaptive target retries
  // at the full target (rank growth must never be silently clipped).
  int kt = k_target;
  if (lock <= 0 && prev && prev->k > 0 && prev->n == n)
    kt = std::min(k_target, prev->k + 48);
  if (allow_rsvd && lock > 0 && prev && prev->k > 0 && prev->n == n
      && prev->k + n_over + 8 < std::min(m, n)) {
    wsvd_rowmajor(M, m, n, prev->v.data(), prev->k, n_over, U, S, Vh);
    ++g_rsvd_n;
    if (g_prof) { g_prof->w_s += now_s() - tp0; g_prof->w_n += 1; }
  } else if (allow_rsvd && m > 2 * kt && n > kt) {
    for (;;) {
      rsvd_rowmajor(M, m, n, kt, U, S, Vh);
      if (lock > 0 || kt >= k_target) break;
      int kk = int(S.size()), kept = 0;
      if (kk > 0 && S[0] > 0)
        for (int c = 0; c < kk; ++c)
          if (S[c] > S[0] * thr) ++kept;
      if (kept < kt - 16) break;
      kt = k_target;
    }
    ++g_rsvd_n;
    if (g_prof) { g_prof->r_s += now_s() - tp0; g_prof->r_n += 1; }
  } else {
    svd_pinned(M, m, n, U, S, Vh);
    if (g_prof) { g_prof->x_s += now_s() - tp0; g_prof->x_n += 1; }
  }
  int k = int(S.size());
  if (lock > 0) {
    keep = std::max(1, std::min(lock, k));
  } else {
    keep = 1;
    if (k > 0 && S[0] > 0) {
      keep = 0;
      for (int c = 0; c < k; ++c)
        if (S[c] > S[0] * thr) ++keep;
    }
    if (keep > chi_max) g_capped = true;
    keep = std::max(1, std::min(chi_max, keep));
  }
  V.assign(Vh.begin(), Vh.begin() + size_t(keep) * n);
  C.resize(size_t(m) * keep);
  for (int r = 0; r < m; ++r)
    for (int c = 0; c < keep; ++c)
      C[size_t(r) * keep + c] = U[size_t(r) * k + c] * S[c];
  if (do_align && prev && prev->k == keep && prev->n == n) {
    // O = prev @ V^H (keep,keep); rotate V inside its span: V <- P V,
    // C <- C P^H (pure gauge, keeps the iteration a continuous map)
    std::vector<cplx> O(size_t(keep) * keep), P;
    matmul_nc(prev->v.data(), V.data(), O.data(), keep, n, keep);
    if (polar_unitary(O, keep, P)) {
      std::vector<cplx> Vn(size_t(keep) * n), Cn(size_t(m) * keep);
      matmul(P.data(), V.data(), Vn.data(), keep, keep, n);
      matmul_nc(C.data(), P.data(), Cn.data(), m, keep, keep);
      V.swap(Vn);
      C.swap(Cn);
    }
  }
  if (rec) {
    rec->k = keep;
    rec->n = n;
    rec->v = V;
  }
}

// Left-to-right twin of trunc_step: SVD of M (m,n), threshold/lock rank rule,
// the kept COLUMN basis U (m,keep) stays at the site and the carry
// C = S.Vh (keep,n) moves right.  Gauge pinned on U columns (max-|.| element
// real-positive); alignment rotates U within its span toward prev (which
// stores U^H, rows (keep, m)).  No randomized path: shapes here are
// (a*G, b<=chi) — the full zgesdd is already the cheap direction.
void trunc_step_lr(std::vector<cplx>& M, int m, int n, double thr, int chi_max,
                   int lock, const RecMat* prev, RecMat* rec,
                   std::vector<cplx>& U_out, std::vector<cplx>& C, int& keep,
                   bool do_align = true) {
  std::vector<cplx> U, Vh;
  std::vector<double> S;
  double tp0 = g_prof ? now_s() : 0;
  svd_rowmajor(M, m, n, U, S, Vh);
  if (g_prof) { g_prof->x_s += now_s() - tp0; g_prof->x_n += 1; }
  int k = int(S.size());
  for (int c = 0; c < k; ++c) {
    double best = -1.0;
    cplx piv(1.0, 0.0);
    for (int i = 0; i < m; ++i) {
      double a = std::abs(U[size_t(i) * k + c]);
      if (a > best) { best = a; piv = U[size_t(i) * k + c]; }
    }
    cplx ph = (best > 0) ? piv / std::abs(piv) : cplx(1.0, 0.0);
    cplx phc = std::conj(ph);
    for (int i = 0; i < m; ++i) U[size_t(i) * k + c] *= phc;
    for (int j = 0; j < n; ++j) Vh[size_t(c) * n + j] *= ph;
  }
  if (lock > 0) {
    keep = std::max(1, std::min(lock, k));
  } else {
    keep = 1;
    if (k > 0 && S[0] > 0) {
      keep = 0;
      for (int c = 0; c < k; ++c)
        if (S[c] > S[0] * thr) ++keep;
    }
    if (keep > chi_max) g_capped = true;
    keep = std::max(1, std::min(chi_max, keep));
  }
  U_out.resize(size_t(m) * keep);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < keep; ++c)
      U_out[size_t(i) * keep + c] = U[size_t(i) * k + c];
  C.resize(size_t(keep) * n);
  for (int c = 0; c < keep; ++c)
    for (int j = 0; j < n; ++j)
      C[size_t(c) * n + j] = S[c] * Vh[size_t(c) * n + j];
  if (do_align && prev && prev->k == keep && prev->n == m) {
    // O = prev (keep,m) @ U (m,keep); R = polar(O)^H rotates U toward prev:
    // U <- U R = U P^H, C <- P C (pure gauge: U C invariant)
    std::vector<cplx> O(size_t(keep) * keep), P;
    matmul(prev->v.data(), U_out.data(), O.data(), keep, m, keep);
    if (polar_unitary(O, keep, P)) {
      std::vector<cplx> Un(size_t(m) * keep), Cn(size_t(keep) * n);
      matmul_nc(U_out.data(), P.data(), Un.data(), m, keep, keep);
      matmul(P.data(), C.data(), Cn.data(), keep, keep, n);
      U_out.swap(Un);
      C.swap(Cn);
    }
  }
  if (rec) {
    rec->k = keep;
    rec->n = m;
    rec->v.resize(size_t(keep) * m);
    for (int c = 0; c < keep; ++c)
      for (int i = 0; i < m; ++i)
        rec->v[size_t(c) * m + i] = std::conj(U_out[size_t(i) * keep + c]);
  }
}

struct PtinfState {
  int G = 0, D = 0, n_bD = 0, w_eff = 0, chi_max = 0, max_period = 0;
  bool exact_only = false;  // finite builder: no randomized SVD paths
  bool align_now = true;    // apply polar gauge alignment this iteration
  //   (pre-detection iterations thread lag-1 recs for the adaptive rsvd
  //   rank target ONLY: aligning before the locks are seeded perturbs the
  //   gauge trajectory — measured: a clean period-1/7.6e-7 biexciton-bath
  //   build turned into a period-doubling stall at 3.1e-5)
  std::vector<cplx> b0;          // (G)
  std::vector<cplx> bD;          // (n_bD, D, G)
  std::vector<int> d_of_g;       // (G)
  std::vector<Tensor> chain;
  int period = 0;                // 0 = not yet detected
  long emitted = 0;
  std::vector<RecSet> hist1, hist2;            // [phase][site]
  std::vector<std::vector<int>> lock1, lock2;  // [phase][site], 0 = unlocked
  std::deque<std::pair<RecSet, RecSet>> recent;  // pre-detection ring
  RecSet last1, last2;   // lag-1 recs: pre-detection alignment + adaptive kt
  ProfClock prof;
  bool capped = false;  // any unlocked truncation bound by chi_max (g_capped)
};

RecMat* rec_at(RecSet& rs, int i) {
  if (int(rs.size()) <= i) rs.resize(i + 1);
  return &rs[i];
}

const RecMat* prev_at(RecSet* rs, int i) {
  if (!rs || int(rs->size()) <= i) return nullptr;
  return (*rs)[i].k > 0 ? &(*rs)[i] : nullptr;
}

int lock_at(std::vector<int>* lk, int i) {
  if (!lk || int(lk->size()) <= i) return 0;
  return (*lk)[i];
}

// Fused apply-layer + right-to-left zip-up truncation with alignment/locks:
// the C++ twin of ptinf._zip_layer_sweep (same contraction order, same SVD
// inputs, same truncation decisions).
void ptinf_zip_sweep(PtinfState& st, double thr, RecSet* prev, RecSet* rec,
                     std::vector<int>* lock) {
  const int W = int(st.chain.size());
  const int G = st.G, D = st.D;
  const int start = std::max(0, W - st.w_eff);
  std::vector<Tensor> out(W + 1);
  // new site N (D, G, 1): N[d_of_g[g], g, 0] = b0[g]; no past in range ->
  // close the layer bond immediately
  Tensor cur;
  if (W == 0 || st.w_eff == 0) {
    cur.resize(1, G, 1);
    for (int g = 0; g < G; ++g) cur.at(0, g, 0) += st.b0[g];
  } else {
    cur.resize(D, G, 1);
    for (int g = 0; g < G; ++g) cur.at(st.d_of_g[g], g, 0) = st.b0[g];
  }
  std::vector<cplx> V, C;
  for (int j = W; j > start; --j) {
    int a = cur.a, b = cur.b, keep = 0;
    trunc_step(cur.data, a, G * b, thr, st.chi_max, lock_at(lock, j),
               prev_at(prev, j), rec ? rec_at(*rec, j) : nullptr, V, C, keep,
               !st.exact_only, st.align_now);
    Tensor& oj = out[j];
    oj.a = keep; oj.g = G; oj.b = b;
    oj.data.assign(V.begin(), V.end());
    Tensor& P = st.chain[j - 1];
    int delta = W - (j - 1);
    const cplx* B = st.bD.data() + size_t(delta - 1) * D * G;  // (D, G)
    // C rows are the (r, c) composite with r = P.b: Crs (P.b, D, keep)
    const int r_dim = P.b;
    std::vector<cplx> Pg(size_t(P.a) * r_dim);
    if (j - 1 == start) {
      // oldest in-window site: cur(l,g,k) = sum_{r,c} P(l,g,r) B(c,g) Crs(r,c,k)
      Tensor nx;
      nx.resize(P.a, G, keep);
      std::vector<cplx> Mg(size_t(r_dim) * keep);
      for (int g = 0; g < G; ++g) {
        for (int r = 0; r < r_dim; ++r)
          for (int k2 = 0; k2 < keep; ++k2) {
            cplx acc(0, 0);
            for (int c = 0; c < D; ++c)
              acc += B[size_t(c) * G + g] * C[(size_t(r) * D + c) * keep + k2];
            Mg[size_t(r) * keep + k2] = acc;
          }
        for (int l = 0; l < P.a; ++l)
          for (int r = 0; r < r_dim; ++r) Pg[size_t(l) * r_dim + r] = P.at(l, g, r);
        std::vector<cplx> res(size_t(P.a) * keep);
        matmul(Pg.data(), Mg.data(), res.data(), P.a, r_dim, keep);
        for (int l = 0; l < P.a; ++l)
          for (int k2 = 0; k2 < keep; ++k2) nx.at(l, g, k2) = res[size_t(l) * keep + k2];
      }
      cur = std::move(nx);
    } else {
      // interior: cur(l*D+c, g, k) = sum_r P(l,g,r) Crs(r,c,k) * B(c,g)
      Tensor nx;
      nx.resize(P.a * D, G, keep);
      std::vector<cplx> res(size_t(P.a) * D * keep);
      for (int g = 0; g < G; ++g) {
        for (int l = 0; l < P.a; ++l)
          for (int r = 0; r < r_dim; ++r) Pg[size_t(l) * r_dim + r] = P.at(l, g, r);
        matmul(Pg.data(), C.data(), res.data(), P.a, r_dim, D * keep);
        for (int l = 0; l < P.a; ++l)
          for (int c = 0; c < D; ++c) {
            cplx bg = B[size_t(c) * G + g];
            for (int k2 = 0; k2 < keep; ++k2)
              nx.at(l * D + c, g, k2) = res[(size_t(l) * D + c) * keep + k2] * bg;
          }
      }
      cur = std::move(nx);
    }
  }
  out[start] = std::move(cur);
  // plain zip-up over untouched older sites (below the kernel range; only
  // reachable when the chain exceeds w_eff — kept for parity with Python)
  for (int i = start; i > 0; --i) {
    Tensor& T = out[i];
    int keep = 0;
    trunc_step(T.data, T.a, G * T.b, thr, st.chi_max, lock_at(lock, i),
               prev_at(prev, i), rec ? rec_at(*rec, i) : nullptr, V, C, keep,
               !st.exact_only, st.align_now);
    Tensor nt;
    nt.a = keep; nt.g = G; nt.b = T.b;
    nt.data.assign(V.begin(), V.end());
    Tensor& L = out[i - 1];
    Tensor res;
    res.resize(L.a, L.g, keep);
    matmul(L.data.data(), C.data(), res.data.data(), L.a * L.g, L.b, keep);
    out[i] = std::move(nt);
    out[i - 1] = std::move(res);
  }
  st.chain = std::move(out);
}

// Aligned/locked right-to-left SVD truncation sweep (ptinf._svd_sweep_rl).
// Aligned/locked LEFT-TO-RIGHT exact SVD truncation sweep
// (ptinf._svd_sweep_lr).  Runs directly on the zip sweep's output: the zip
// leaves the chain right-canonical with the weight at the leftmost site,
// which is exactly the gauge an L->R truncation needs for globally exact
// Schmidt values at every bond (the left part becomes left-canonical as the
// sweep proceeds).  Ends left-canonical with the weight at the right end —
// the gauge emit() and the next iteration's zip expect — so the two QR
// re-canonicalization sweeps of the previous iteration structure
// (measured 427 s of 1370 s at darkmodel n_mem=102) are unnecessary.
void ptinf_svd_sweep_lr(PtinfState& st, double thr, RecSet* prev, RecSet* rec,
                        std::vector<int>* lock) {
  std::vector<cplx> U, C;
  const int W = int(st.chain.size());
  for (int i = 0; i + 1 < W; ++i) {
    Tensor& T = st.chain[i];
    int keep = 0;
    trunc_step_lr(T.data, T.a * T.g, T.b, thr, st.chi_max, lock_at(lock, i),
                  prev_at(prev, i), rec ? rec_at(*rec, i) : nullptr, U, C,
                  keep, st.align_now);
    Tensor nt;
    nt.a = T.a; nt.g = T.g; nt.b = keep;
    nt.data.assign(U.begin(), U.end());
    Tensor& N = st.chain[i + 1];
    Tensor res;
    res.resize(keep, N.g, N.b);
    matmul(C.data(), N.data.data(), res.data.data(), keep, N.a, N.g * N.b);
    st.chain[i] = std::move(nt);
    st.chain[i + 1] = std::move(res);
  }
}

// Window Schmidt left-factor via right-canonicalization of a chain copy
// (ptinf._right_canonicalize): returns L (a0, k0).  Uses LQ, not SVD: every
// consumer of L (window Schmidt spectrum = its singular values, weighted
// drift Frobenius norms, |L^T v| eigenvector weights) depends only on the
// Gram matrix L L^H, which any exact factorization M = L Q with Q Q^H = I
// reproduces bit-for-math (L L^H = M M^H).  LQ is ~10x cheaper than ZGESDD
// at these shapes.
void ptinf_lwin(const PtinfState& st, std::vector<cplx>& L, int& la, int& lk) {
  std::vector<Tensor> ch = st.chain;
  std::vector<cplx> Lf, Qr;
  la = lk = 0;
  for (int i = int(ch.size()) - 1; i >= 0; --i) {
    Tensor& T = ch[i];
    int kr = 0;
    lq_rowmajor(T.data, T.a, T.g * T.b, Lf, Qr, kr);
    if (i > 0) {
      Tensor nt;
      nt.a = kr; nt.g = T.g; nt.b = T.b;
      nt.data = Qr;
      // absorb the left factor into the left neighbour
      Tensor& Lt = ch[i - 1];
      Tensor res;
      res.resize(Lt.a, Lt.g, kr);
      matmul(Lt.data.data(), Lf.data(), res.data.data(), Lt.a * Lt.g, Lt.b,
             kr);
      ch[i] = std::move(nt);
      ch[i - 1] = std::move(res);
    } else {
      la = T.a;
      lk = kr;
      L = Lf;
    }
  }
}

}  // namespace

extern "C" {

// Build the per-step PT tensors — the finite-horizon streaming builder, C++
// twin of pyaceqd_tpu/engine/ptmpo.py::build_pt_tensors (same 4-sweep
// segment-scoped structure: apply_layer, zip-truncate R->L at thr*0.1 over
// the touched segment, QR L->R, exact R->L truncation at thr, QR L->R —
// bonds older than the kernel range are never re-truncated; see the sweep
// block comment above for the r5 adjudication that reverted the two-sweep
// rewrite), with exact truncation of the final flushed frontier and
// converged-emission tiling (weighted drift <= tile_tol for 3 consecutive
// emissions -> the remaining emissions are tiles of the converged tensor).
//
// SVD policy: ALL-EXACT by default (the golden regression artifacts were
// generated by the all-exact path and the randomized zip drifts O(1e-5) on
// observables).  PYACEQD_TPU_NATIVE_RSVD=1 opts the zip pre-truncation into
// the m-gated randomized path (m > 2*(chi_max+32)) for throwaway builds;
// PYACEQD_TPU_NATIVE_EXACT=1 still forces exact everywhere (overrides the
// opt-in).  Native-vs-numpy parity at rsvd-gate-triggering shapes is tested
// in tests/test_native.py.
//
// Outputs are written padded to (n_steps, chi_pad, G, chi_pad) row-major
// complex<double> with the true dims in out_dims (n_steps, 2).
// info_out[0] = emission index tiling started at (-1 if the full horizon
// was built).  Returns 0 on success (1 = success with the chi cap binding
// some truncation), -1 if any emitted bond exceeds chi_pad, -2 internal.
int pt_build2(int n_steps, int n_mem, int G, int D, int w_eff,
              const cplx* b0, const cplx* bD, const int* d_of_g,
              double threshold, int chi_max, int chi_pad, double tile_tol,
              cplx* out, int* out_dims, int* info_out) {
  g_capped = false;
  g_rsvd_n = 0;
  info_out[0] = -1;
  info_out[1] = 0;
  PtinfState st;
  st.G = G; st.D = D; st.n_bD = n_mem - 1; st.w_eff = w_eff;
  st.chi_max = chi_max;
  // finite path is all-exact unless PYACEQD_TPU_NATIVE_RSVD=1 opts the zip
  // pre-truncation into the randomized path (see the header comment);
  // PYACEQD_TPU_NATIVE_EXACT=1 forces exact regardless.
  {
    const char* e = std::getenv("PYACEQD_TPU_NATIVE_EXACT");
    st.exact_only = (e && e[0] == '1');
  }
  st.b0.assign(b0, b0 + G);
  st.bD.assign(bD, bD + size_t(std::max(n_mem - 1, 1)) * D * G);
  st.d_of_g.assign(d_of_g, d_of_g + G);
  std::vector<Tensor> emitted;
  emitted.reserve(n_steps);
  const int n_emit = std::max(0, n_steps - n_mem + 1);
  Tensor prevQ;
  int streak = 0;
  const bool use_rsvd_zip = !st.exact_only && [] {
    const char* e = std::getenv("PYACEQD_TPU_NATIVE_RSVD");
    return e && e[0] == '1';
  }();
  for (int step = 0; step < n_steps; ++step) {
    int touched = std::min(int(st.chain.size()), w_eff);
    apply_layer(st.chain, st.b0.data(), st.bD.data(), st.d_of_g.data(), G, D,
                w_eff);
    int seg = std::max(0, int(st.chain.size()) - 1 - touched);
    svd_sweep_rl(st.chain, threshold * 0.1, chi_max, seg, use_rsvd_zip);
    qr_sweep_lr(st.chain, seg);
    svd_sweep_rl(st.chain, threshold, chi_max, seg);
    qr_sweep_lr(st.chain, seg);
    if (int(st.chain.size()) == n_mem) {
      Tensor Q = emit(st.chain);
      // strip the accumulated global norm by a POWER OF TWO: without this
      // the chain norm grows ~3x/step and >=1000-step horizons overflow
      // float64 (inf -> zgesdd info=4 -> NaN tensors).  A power-of-two
      // scale touches only float exponents, so every downstream
      // SVD/QR/truncation decision is BIT-IDENTICAL to the unstripped
      // build (golden parity preserved); an arbitrary-scalar strip
      // measurably reshuffles near-threshold truncation cuts (9.2e-5).
      {
        Tensor& last = st.chain.back();
        double s = 0.0;
        for (const cplx& x : last.data) s += std::norm(x);
        s = std::sqrt(s);
        if (s > 0 && std::isfinite(s)) {
          double inv = std::pow(2.0, -std::floor(std::log2(s)));
          for (cplx& x : last.data) x *= inv;
        }
      }
      if (tile_tol > 0 && prevQ.a == Q.a && prevQ.g == Q.g
          && prevQ.b == Q.b) {
        double raw = 0.0;
        for (size_t i = 0; i < Q.data.size(); ++i)
          raw = std::max(raw, std::abs(Q.data[i] - prevQ.data[i]));
        double drift = raw;
        if (raw <= 1e-3 && raw > tile_tol) {
          // weighted drift: contract the right bond through the window's
          // Schmidt left-factor (elementwise wobble in near-weightless
          // truncation directions does not propagate into observables)
          std::vector<cplx> L;
          int la = 0, lk = 0;
          ptinf_lwin(st, L, la, lk);           // la == Q.b by construction
          if (la == Q.b) {
            std::vector<cplx> Dq(Q.data.size());
            for (size_t i = 0; i < Q.data.size(); ++i)
              Dq[i] = Q.data[i] - prevQ.data[i];
            std::vector<cplx> DL(size_t(Q.a) * Q.g * lk);
            std::vector<cplx> QL(size_t(Q.a) * Q.g * lk);
            matmul(Dq.data(), L.data(), DL.data(), Q.a * Q.g, Q.b, lk);
            matmul(Q.data.data(), L.data(), QL.data(), Q.a * Q.g, Q.b, lk);
            double dn = 0, qn = 0;
            for (const cplx& x : DL) dn += std::norm(x);
            for (const cplx& x : QL) qn += std::norm(x);
            drift = std::sqrt(dn) / std::sqrt(qn > 0 ? qn : 1.0);
          }
        }
        streak = (drift <= tile_tol) ? streak + 1 : 0;
      } else {
        streak = 0;
      }
      prevQ = Q;
      emitted.push_back(std::move(Q));
      if (streak >= 3 && int(emitted.size()) < n_emit) {
        info_out[0] = int(emitted.size());
        while (int(emitted.size()) < n_emit) emitted.push_back(prevQ);
        break;
      }
    }
  }
  // exact truncation of the flushed frontier: the chain's interior working
  // bonds (~cap) otherwise land untruncated in the emitted stack and set the
  // padded DEVICE propagation width (measured: interior ~104-122 vs emitted
  // chi=25 on the biexciton bench bath).  Right-canonicalize via LQ (weight
  // to the left; exact — truncation quality depends only on the Gram
  // structure), then one exact L->R SVD sweep at the build threshold.
  if (st.chain.size() >= 2) {
    for (int i = int(st.chain.size()) - 1; i > 0; --i) {
      Tensor& T = st.chain[i];
      std::vector<cplx> L, Qr;
      int kr = 0;
      lq_rowmajor(T.data, T.a, T.g * T.b, L, Qr, kr);
      Tensor nt;
      nt.a = kr; nt.g = T.g; nt.b = T.b; nt.data = std::move(Qr);
      Tensor& Lt = st.chain[i - 1];
      Tensor res;
      res.resize(Lt.a, Lt.g, kr);
      matmul(Lt.data.data(), L.data(), res.data.data(), Lt.a * Lt.g, Lt.b,
             kr);
      st.chain[i] = std::move(nt);
      st.chain[i - 1] = std::move(res);
    }
    ptinf_svd_sweep_lr(st, threshold, nullptr, nullptr, nullptr);
  }
  for (auto& t : st.chain) emitted.push_back(std::move(t));
  if (int(emitted.size()) != n_steps) return -2;
  for (int i = 0; i < n_steps; ++i) {
    Tensor& T = emitted[i];
    if (T.a > chi_pad || T.b > chi_pad) return -1;
    out_dims[2 * i] = T.a;
    out_dims[2 * i + 1] = T.b;
    cplx* dst = out + size_t(i) * chi_pad * G * chi_pad;
    for (int l = 0; l < T.a; ++l)
      for (int g = 0; g < G; ++g)
        std::memcpy(dst + (size_t(l) * G + g) * chi_pad,
                    &T.at(l, g, 0), sizeof(cplx) * T.b);
  }
  info_out[1] = int(g_rsvd_n);
  return g_capped ? 1 : 0;  // 1 = success, but the cap bound a truncation
}

// ---- stationary (ptinf) stepper ----

void* ptinf_new(int G, int D, int n_bD, int w_eff, int chi_max, int max_period,
                const cplx* b0, const cplx* bD, const int* d_of_g) {
  PtinfState* st = new PtinfState();
  st->G = G; st->D = D; st->n_bD = n_bD; st->w_eff = w_eff;
  st->chi_max = chi_max; st->max_period = max_period;
  st->b0.assign(b0, b0 + G);
  st->bD.assign(bD, bD + size_t(std::max(n_bD, 1)) * D * G);
  st->d_of_g.assign(d_of_g, d_of_g + G);
  return st;
}

void ptinf_free(void* h) { delete static_cast<PtinfState*>(h); }

// Cumulative per-section seconds (zip, qr1, svd, qr2, emit, lwin, spec), the
// step count, bond telemetry, and per-truncation-path seconds/counts
// (warm/rand/exact), for PYACEQD_TPU_NATIVE_PROF=1 runs.  out must hold 16.
void ptinf_prof(void* h, double* out) {
  const ProfClock& p = static_cast<PtinfState*>(h)->prof;
  out[0] = p.zip; out[1] = p.qr1; out[2] = p.svd; out[3] = p.qr2;
  out[4] = p.emit; out[5] = p.lwin; out[6] = p.spec;
  out[7] = double(p.steps);
  out[8] = double(p.max_bond);
  out[9] = p.steps > 0 ? double(p.sum_bond) / double(p.steps) : 0.0;
  out[10] = p.w_s; out[11] = double(p.w_n);
  out[12] = p.r_s; out[13] = double(p.r_n);
  out[14] = p.x_s; out[15] = double(p.x_n);
}

// One build iteration (the body of the Python while-loop in
// build_stationary_pt): fused zip sweep (thr*0.1) -> QR -> SVD sweep (thr)
// -> QR; emit when the window is overfull; record bases.  Returns 1 when a
// tensor was emitted (q/spec/lwin valid), 0 while the window is filling,
// -1 if an emitted dimension exceeds chi_pad.
int ptinf_step(void* h, double thr, cplx* q_out, int* q_dims,
               double* spec_out, int* spec_len, cplx* lwin_out,
               int* lwin_dims, int chi_pad) {
  PtinfState& st = *static_cast<PtinfState*>(h);
  const bool pf = prof_on();
  g_capped = false;
  g_prof = pf ? &st.prof : nullptr;
  double t0 = pf ? now_s() : 0, t1 = 0;
  auto tick = [&](double& acc) {
    if (!pf) return;
    t1 = now_s();
    acc += t1 - t0;
    t0 = t1;
  };
  const int ph = st.period > 0 ? int(st.emitted % st.period) : 0;
  const bool use_prev = st.period > 0;
  RecSet rec1, rec2;
  // pre-detection: align to the LAG-1 recs (pure bond gauge — the Schmidt
  // spectra driving period detection are invariant) and let trunc_step size
  // its randomized projection from the lag-1 kept ranks
  RecSet* prev1 = use_prev ? &st.hist1[ph]
                           : (st.last1.empty() ? nullptr : &st.last1);
  RecSet* prev2 = use_prev ? &st.hist2[ph]
                           : (st.last2.empty() ? nullptr : &st.last2);
  st.align_now = use_prev;
  ptinf_zip_sweep(st, thr * 0.1, prev1, &rec1,
                  use_prev ? &st.lock1[ph] : nullptr);
  tick(st.prof.zip);
  ptinf_svd_sweep_lr(st, thr, prev2, &rec2,
                     use_prev ? &st.lock2[ph] : nullptr);
  tick(st.prof.svd);
  st.capped = st.capped || g_capped;
  st.prof.steps += 1;
  if (pf) {
    long mb = 0;
    for (const Tensor& t : st.chain) mb = std::max<long>(mb, t.a);
    st.prof.max_bond = std::max(st.prof.max_bond, mb);
    st.prof.sum_bond += mb;
  }
  if (int(st.chain.size()) <= st.w_eff) {
    if (!use_prev) {
      st.last1 = std::move(rec1);
      st.last2 = std::move(rec2);
    }
    return 0;
  }
  Tensor Q = emit(st.chain);
  // strip the accumulated window norm (pure global scale; emissions are QR
  // frames and never carry it — prevents float overflow over long transients)
  Tensor& last = st.chain.back();
  double s = 0.0;
  for (const cplx& x : last.data) s += std::norm(x);
  s = std::sqrt(s);
  if (s > 0)
    for (cplx& x : last.data) x /= s;
  if (use_prev) {
    st.hist1[ph] = std::move(rec1);
    st.hist2[ph] = std::move(rec2);
  } else {
    st.last1 = rec1;
    st.last2 = rec2;
    st.recent.emplace_back(std::move(rec1), std::move(rec2));
    if (int(st.recent.size()) > st.max_period) st.recent.pop_front();
  }
  st.emitted += 1;
  if (Q.a > chi_pad || Q.b > chi_pad) return -1;
  q_dims[0] = Q.a;
  q_dims[1] = Q.b;
  for (int l = 0; l < Q.a; ++l)
    for (int g = 0; g < st.G; ++g)
      std::memcpy(q_out + (size_t(l) * st.G + g) * chi_pad, &Q.at(l, g, 0),
                  sizeof(cplx) * Q.b);
  tick(st.prof.emit);
  // window Schmidt left-factor + its spectrum (the gauge-invariant
  // stationarity signal and the weighted-drift error metric)
  std::vector<cplx> L;
  int la = 0, lk = 0;
  ptinf_lwin(st, L, la, lk);
  tick(st.prof.lwin);
  if (la > chi_pad || lk > chi_pad) return -1;
  lwin_dims[0] = la;
  lwin_dims[1] = lk;
  for (int r = 0; r < la; ++r)
    std::memcpy(lwin_out + size_t(r) * chi_pad, L.data() + size_t(r) * lk,
                sizeof(cplx) * lk);
  std::vector<cplx> Lc = L, U, Vh;
  std::vector<double> S;
  svd_rowmajor(Lc, la, lk, U, S, Vh);
  tick(st.prof.spec);
  int ns = std::min<int>(int(S.size()), chi_pad);
  *spec_len = ns;
  double s0 = (ns > 0 && S[0] > 0) ? S[0] : 1.0;
  for (int i = 0; i < ns; ++i) spec_out[i] = S[i] / s0;
  return 1;
}

// Seed the alignment targets and rank locks from the last P pre-detection
// emissions (ptinf.build_stationary_pt lines "period detected").
// 1 if any unlocked truncation so far was bound by chi_max (see g_capped).
int ptinf_capped(void* h) {
  return static_cast<PtinfState*>(h)->capped ? 1 : 0;
}

void ptinf_seed(void* h, int period) {
  PtinfState& st = *static_cast<PtinfState*>(h);
  st.period = period;
  st.hist1.assign(period, RecSet());
  st.hist2.assign(period, RecSet());
  st.lock1.assign(period, std::vector<int>());
  st.lock2.assign(period, std::vector<int>());
  const long m = st.emitted;
  const int avail = std::min<int>(period, int(st.recent.size()));
  for (int j = 0; j < avail; ++j) {
    auto& pr = st.recent[st.recent.size() - 1 - j];
    int phj = int(((m - 1 - j) % period + period) % period);
    st.hist1[phj] = pr.first;
    st.hist2[phj] = pr.second;
    auto locks_of = [](const RecSet& rs) {
      std::vector<int> lk(rs.size(), 0);
      for (size_t i = 0; i < rs.size(); ++i) lk[i] = rs[i].k;
      return lk;
    };
    st.lock1[phj] = locks_of(pr.first);
    st.lock2[phj] = locks_of(pr.second);
  }
}

// Period doubling on a stalled elementwise drift (gauge two-cycles).
void ptinf_double(void* h) {
  PtinfState& st = *static_cast<PtinfState*>(h);
  const int old = st.period, nw = 2 * old;
  std::vector<RecSet> h1(nw), h2(nw);
  std::vector<std::vector<int>> l1(nw), l2(nw);
  for (int p = 0; p < nw; ++p) {
    h1[p] = st.hist1[p % old];
    h2[p] = st.hist2[p % old];
    l1[p] = st.lock1[p % old];
    l2[p] = st.lock2[p % old];
  }
  st.hist1 = std::move(h1);
  st.hist2 = std::move(h2);
  st.lock1 = std::move(l1);
  st.lock2 = std::move(l2);
  st.period = nw;
}

}  // extern "C"
