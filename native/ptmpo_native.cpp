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
#include <algorithm>
#include <cmath>
#include <cstdio>
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

static zgemm_t zgemm_ = nullptr;
static zgelqf_t zgelqf_ = nullptr;
static zunglq_t zunglq_ = nullptr;
static zgesdd_t zgesdd_ = nullptr;

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
  return (zgemm_ && zgelqf_ && zunglq_ && zgesdd_) ? (h1 ? 1 : 2) : -1;
}

static int g_use_rsvd = 0;  // opt-in: ~1.2x faster zip-up but O(1e-5) observable drift
extern "C" void pt_set_rsvd(int on) { g_use_rsvd = on; }

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

// SVD of row-major M (m,n): returns U (m,k) row-major, S (k), Vh (k,n)
// row-major, k = min(m,n).  Uses the transpose duality:
// svd(M^T) = U' S V'h  =>  U_M = V'h^T, Vh_M = U'^T.
void svd_rowmajor(std::vector<cplx>& M, int m, int n, std::vector<cplx>& U,
                  std::vector<double>& S, std::vector<cplx>& Vh) {
  int k = std::min(m, n);
  int cm_m = n, cm_n = m, lda = n, info = 0, lwork = -1;
  S.resize(k);
  std::vector<cplx> Up(size_t(n) * k);   // U' (n,k) col-major
  std::vector<cplx> Vp(size_t(k) * m);   // V'h (k,m) col-major
  int ldu = n, ldvt = k;
  std::vector<double> rwork(size_t(k) * std::max(5 * k + 7, 2 * std::max(m, n) + 2 * k + 1) + 32);
  std::vector<int> iwork(8 * size_t(k) + 8);
  cplx wq;
  zgesdd_("S", &cm_m, &cm_n, M.data(), &lda, S.data(), Up.data(), &ldu,
          Vp.data(), &ldvt, &wq, &lwork, rwork.data(), iwork.data(), &info);
  lwork = int(wq.real()) + 8;
  std::vector<cplx> work(lwork);
  zgesdd_("S", &cm_m, &cm_n, M.data(), &lda, S.data(), Up.data(), &ldu,
          Vp.data(), &ldvt, work.data(), &lwork, rwork.data(), iwork.data(),
          &info);
  if (info != 0) std::fprintf(stderr, "ptmpo_native: zgesdd info=%d\n", info);
  // U_M (m,k) row-major = V'h^T: U_M(i,c) = V'h(c,i) = Vp[c + k*i]
  U.resize(size_t(m) * k);
  for (int i = 0; i < m; ++i)
    for (int c = 0; c < k; ++c) U[size_t(i) * k + c] = Vp[size_t(i) * k + c];
  // (col-major (k,m) buffer read row-major IS the transpose — direct copy)
  // Vh_M (k,n) row-major = U'^T: Vh(c,j) = U'(j,c) = Up[j + n*c]
  Vh.resize(size_t(k) * n);
  for (int c = 0; c < k; ++c)
    for (int j = 0; j < n; ++j) Vh[size_t(c) * n + j] = Up[size_t(c) * n + j];
}

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

// chain[i] (a,g,b) -> SVD of (a, g*b), truncate; absorb U*S into chain[i-1].
// use_rsvd: allow the randomized path when the row count far exceeds what can
// survive truncation (zip-up stage; the final sweep stays exact).
void svd_sweep_rl(std::vector<Tensor>& chain, double thr, int chi_max,
                  int stop, bool use_rsvd = false) {
  for (int i = int(chain.size()) - 1; i > stop; --i) {
    Tensor& T = chain[i];
    int m = T.a, n = T.g * T.b;
    std::vector<cplx> U, Vh;
    std::vector<double> S;
    int k_target = chi_max + 32;  // oversampling margin
    if (use_rsvd && g_use_rsvd && m > 2 * k_target && n > k_target)
      rsvd_rowmajor(T.data, m, n, k_target, U, S, Vh);
    else
      svd_rowmajor(T.data, m, n, U, S, Vh);
    int k = int(S.size());
    int keep = 1;
    if (S[0] > 0) {
      keep = 0;
      for (int c = 0; c < k; ++c)
        if (S[c] > S[0] * thr) ++keep;
    }
    keep = std::max(1, std::min(chi_max, keep));
    Tensor nt;
    nt.a = keep; nt.g = T.g; nt.b = T.b;
    nt.data.assign(Vh.begin(), Vh.begin() + size_t(keep) * n);
    // US (m, keep)
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

}  // namespace

extern "C" {

// Build the per-step PT tensors.  Outputs are written padded to
// (n_steps, chi_pad, G, chi_pad) row-major complex<double> with the true
// dims in out_dims (n_steps, 2).  Returns 0 on success, -1 if any emitted
// bond exceeds chi_pad (caller should retry with a larger pad).
int pt_build(int n_steps, int n_mem, int G, int D, int w_eff,
             const cplx* b0, const cplx* bD, const int* d_of_g,
             double threshold, int chi_max, int chi_pad,
             cplx* out, int* out_dims) {
  std::vector<Tensor> chain;
  std::vector<Tensor> emitted;
  emitted.reserve(n_steps);
  for (int step = 0; step < n_steps; ++step) {
    int touched = std::min(int(chain.size()), w_eff);
    apply_layer(chain, b0, bD, d_of_g, G, D, w_eff);
    int seg = std::max(0, int(chain.size()) - 1 - touched);
    svd_sweep_rl(chain, threshold * 0.1, chi_max, seg, /*use_rsvd=*/true);
    qr_sweep_lr(chain, seg);
    svd_sweep_rl(chain, threshold, chi_max, seg);
    qr_sweep_lr(chain, seg);
    if (int(chain.size()) == n_mem) emitted.push_back(emit(chain));
  }
  // left-canonicalize the flushed tail: only the last tensor keeps the
  // accumulated global norm (the Python assembler rescales it)
  qr_sweep_lr(chain, 0);
  for (auto& t : chain) emitted.push_back(std::move(t));
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
  return 0;
}

}  // extern "C"
