// Native host kernels for the csa-tpu runtime.
//
// The accelerator (JAX/Pallas) owns the batched heavy compute; these are
// the serial host-side inner loops that Python is too slow for — the
// per-sequence profile NW fill (reference semantics:
// /root/reference/source/dynamicprogramming.c:990-1029) and the
// gap-block scan helpers of DeleteGappedColumns.  Exact integer
// arithmetic, identical tie-breaking; results are bit-identical to the
// pure-numpy fallback in csa_tpu/align/progressive.py.
//
// Build: make -C csa_tpu/native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <thread>
#include <vector>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {
// progressive-DP scoring (dynamicprogramming.c:16-19 defaults); mutable
// via csa_set_scoring so the host kernels honor csa_tpu.config.Scoring
int MATCH = 1;
int DOUBLEGAP = 0;
int MISMATCH = -1;
int INDEL = -1;
constexpr int GAP = 4;
constexpr int8_t D_DIAG = 0;
constexpr int8_t D_LEFT = 1;
constexpr int8_t D_UP = 2;
}  // namespace

namespace {

// --- Profile NW fill: per-row phases -------------------------------------
//
// m1/d1 precompute: max(diag, up) with the diag-preferred tie-break is
// vectorizable.  Tie-break equivalence with the reference
// (diag >= up >= left preference): left wins over m1 iff left > m1, or
// left == m1 and m1 came from up.
//
// The left-extension chain cur[c] = max(m1[c], cur[c-1] + cg[c]) is a
// max-plus prefix scan with the closed form (same trick as the device
// row-scan, csa_tpu/dp/wavefront.py): with S = prefix-sum(cg) and
// T[c] = cur[c] - S[c],  T[c] = max(T[c-1], m1[c] - S[c]) — a plain
// running max.  That shrinks the serial work to one add (S) and one
// max (T) per cell; everything else (m1, u, cur, directions) is
// straight-line vector code the compiler auto-vectorizes.  Directions
// are recomputed exactly afterward from the settled cur values: the
// chain value never depends on the tie-break, only the direction does.
//
// The phases are range-parameterized so a second thread can take the
// high half of every row in lockstep (see FillWorker below): phase A and
// phase C are embarrassingly parallel over columns; only the prefix-max
// carry crosses the split point, once per row.

// Phase A over 1-based columns [lo, hi]: m1/d1/u from the settled
// previous row.
inline void fill_phase_a(const int32_t* __restrict pv,
                         const int32_t* __restrict subrow, int32_t rowgap,
                         const int32_t* __restrict Sp,
                         int32_t* __restrict m1p, int8_t* __restrict d1p,
                         int32_t* __restrict up_, int32_t lo, int32_t hi) {
  for (int32_t c = lo; c <= hi; ++c) {
    const int32_t diag = pv[c - 1] + subrow[c - 1];
    const int32_t up = pv[c] + rowgap;
    const bool dwin = diag >= up;
    const int32_t m = dwin ? diag : up;
    m1p[c] = m;
    d1p[c] = dwin ? D_DIAG : D_UP;
    up_[c] = m - Sp[c];
  }
}

// Inclusive running max of up_[lo..hi] in place, seeded with t; returns
// the final running max.  With random profiles a branchy `if`
// mispredicts nearly every cell (measured 0.23 -> 1.2 Gcell/s going
// branchless); the AVX-512 path does the inclusive prefix max
// in-register (4 alignr+max steps + carry broadcast).
inline int32_t prefix_max_inplace(int32_t* __restrict up_, int32_t lo,
                                  int32_t hi, int32_t t) {
  int32_t c = lo;
#if defined(__AVX512F__)
  __m512i carry = _mm512_set1_epi32(t);
  const __m512i z = _mm512_set1_epi32(INT32_MIN);
  for (; c + 16 <= hi + 1; c += 16) {
    __m512i v = _mm512_loadu_si512((const void*)(up_ + c));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, z, 15));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, z, 14));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, z, 12));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, z, 8));
    v = _mm512_max_epi32(v, carry);
    _mm512_storeu_si512((void*)(up_ + c), v);
    carry = _mm512_permutexvar_epi32(_mm512_set1_epi32(15), v);
  }
  t = _mm_cvtsi128_si32(_mm512_castsi512_si128(carry));
#endif
  for (; c <= hi; ++c) {
    t = up_[c] > t ? up_[c] : t;
    up_[c] = t;
  }
  return t;
}

// Phase C over [lo, hi]: settled cur values + exact reference
// directions.  left = cur[c-1] + cg[c]; cur[c-1] is settled
// (= T[c-1] + S[c-1]), so read it from up_/Sp to keep the loop
// dependence-free for the vectorizer.
inline void fill_phase_c(int32_t* __restrict cu,
                         const int32_t* __restrict up_,
                         const int32_t* __restrict Sp,
                         const int32_t* __restrict cg,
                         const int32_t* __restrict m1p,
                         const int8_t* __restrict d1p,
                         int8_t* __restrict drow, int32_t lo, int32_t hi) {
  for (int32_t c = lo; c <= hi; ++c) {
    cu[c] = up_[c] + Sp[c];
    const int32_t left = up_[c - 1] + Sp[c - 1] + cg[c];
    const bool take_left =
        (left > m1p[c]) | ((left == m1p[c]) & (d1p[c] == D_UP));
    drow[c] = take_left ? D_LEFT : d1p[c];
  }
}

inline void cpu_pause() {
#if defined(__x86_64__)
  __builtin_ia32_pause();
#endif
}

// Shared state of one two-thread fill.  Rows alternate between buf[0]
// and buf[1] by parity (row j writes buf[j & 1]), so neither thread
// needs a pointer swap barrier.
struct FillJob {
  const int8_t* row_codes;
  const int32_t* subcol;
  const int32_t* Sp;
  const int32_t* cg;
  int32_t* buf[2];
  int32_t* m1p;
  int8_t* d1p;
  int32_t* up_;
  int8_t* dirs;
  int32_t R, C, Cmid, rowgap, edge_rowgap;
};

// Persistent second thread running the high half [Cmid+1, C] of every
// row, pipelined against the caller (low half).  The decomposition is
// conflict-free by column range: the caller only ever touches columns
// [0, Cmid] of the row buffers / m1 / d1 / u, the worker only
// [Cmid+1, C], so neither needs a per-row barrier.  Exactly two scalars
// cross the split per row, both published through 4-deep rings:
//
//   * the low half's prefix-max carry T[Cmid] (the worker scans its half
//     with an INT32_MIN seed concurrently and fixes up with an
//     elementwise max — running max is monotone, so
//     max(local_scan, carry) == the true seeded scan);
//   * the boundary value cur[Cmid], which the worker's phase A reads as
//     pv[c-1] at its first column.
//
// The caller may run up to MAX_LEAD rows ahead of the worker (the rings
// hold 4 entries, and the lead bound keeps ring slots from being
// overwritten before the worker consumes them), so transient scheduling
// jitter on either thread is absorbed instead of stalling every row.
// Between fills the worker blocks on a futex-backed atomic wait, so an
// idle worker costs nothing while the host runs merges /
// DeleteGappedColumns.
class FillWorker {
 public:
  static constexpr int32_t MAX_LEAD = 2;  // < ring size - 1

  FillWorker() : th_(&FillWorker::loop, this) {}
  ~FillWorker() {
    quit_.store(true);
    fill_seq_.fetch_add(1);
    fill_seq_.notify_one();
    th_.join();
  }

  int32_t run(FillJob& job) {
    job_ = &job;
    carry_ready_.store(0);
    rows_done_.store(0);
    cmid_ring_[0] = job.buf[0][job.Cmid];  // row 0 boundary = top_row
    const int32_t seq = fill_seq_.fetch_add(1) + 1;
    fill_seq_.notify_one();
    const int32_t R = job.R, Cmid = job.Cmid;
    const int32_t C = job.C;
    for (int32_t j = 1; j <= R; ++j) {
      while (rows_done_.load(std::memory_order_acquire) < j - MAX_LEAD)
        cpu_pause();
      const int32_t* pv = job.buf[(j - 1) & 1];
      int32_t* cu = job.buf[j & 1];
      const int32_t* subrow = job.subcol + (int64_t)job.row_codes[j - 1] * C;
      int8_t* drow = job.dirs + (int64_t)j * (C + 1);
      drow[0] = D_UP;
      cu[0] = j * job.edge_rowgap;
      fill_phase_a(pv, subrow, job.rowgap, job.Sp, job.m1p, job.d1p,
                   job.up_, 1, Cmid);
      job.up_[0] = cu[0];
      carry_ring_[j & 3] = prefix_max_inplace(job.up_, 1, Cmid, cu[0]);
      fill_phase_c(cu, job.up_, job.Sp, job.cg, job.m1p, job.d1p, drow,
                   1, Cmid);
      cmid_ring_[j & 3] = cu[Cmid];
      carry_ready_.store(j, std::memory_order_release);
    }
    while (fills_done_.load(std::memory_order_acquire) < seq) cpu_pause();
    return job.buf[R & 1][C];
  }

 private:
  void loop() {
    int32_t done = 0;
    for (;;) {
      fill_seq_.wait(done, std::memory_order_acquire);
      if (quit_.load(std::memory_order_relaxed)) return;
      ++done;
      FillJob& job = *job_;
      const int32_t R = job.R, C = job.C, Cmid = job.Cmid;
      const int32_t lo = Cmid + 1;
      for (int32_t j = 1; j <= R; ++j) {
        // one wait per row: the carry publish also covers the previous
        // row's boundary value (cmid_ring_[j-1] precedes carry_ready_
        // j-1 <= j in release order)
        while (carry_ready_.load(std::memory_order_acquire) < j)
          cpu_pause();
        const int32_t* pv = job.buf[(j - 1) & 1];
        int32_t* cu = job.buf[j & 1];
        const int32_t* subrow =
            job.subcol + (int64_t)job.row_codes[j - 1] * C;
        int8_t* drow = job.dirs + (int64_t)j * (C + 1);
        // first column reads the boundary pv[Cmid] from the ring (the
        // caller's low half of that buffer row may already be
        // overwritten by a later row)
        {
          const int32_t pvmid = cmid_ring_[(j - 1) & 3];
          const int32_t diag = pvmid + subrow[lo - 1];
          const int32_t up = pv[lo] + job.rowgap;
          const bool dwin = diag >= up;
          const int32_t m = dwin ? diag : up;
          job.m1p[lo] = m;
          job.d1p[lo] = dwin ? D_DIAG : D_UP;
          job.up_[lo] = m - job.Sp[lo];
        }
        fill_phase_a(pv, subrow, job.rowgap, job.Sp, job.m1p, job.d1p,
                     job.up_, lo + 1, C);
        prefix_max_inplace(job.up_, lo, C, INT32_MIN);
        const int32_t t_mid = carry_ring_[j & 3];
        int32_t* __restrict uhi = job.up_;
        for (int32_t c = lo; c <= C; ++c) {
          uhi[c] = uhi[c] > t_mid ? uhi[c] : t_mid;
        }
        // first column's `left` neighbour is the settled low-half tail
        // T[Cmid] + S[Cmid] — derive it from the carry, not from u[Cmid]
        // (the caller reuses u for later rows)
        {
          cu[lo] = job.up_[lo] + job.Sp[lo];
          const int32_t left = t_mid + job.Sp[lo - 1] + job.cg[lo];
          const bool take_left = (left > job.m1p[lo]) |
                                 ((left == job.m1p[lo]) &&
                                  (job.d1p[lo] == D_UP));
          drow[lo] = take_left ? D_LEFT : job.d1p[lo];
        }
        fill_phase_c(cu, job.up_, job.Sp, job.cg, job.m1p, job.d1p, drow,
                     lo + 1, C);
        rows_done_.store(j, std::memory_order_release);
      }
      fills_done_.store(done, std::memory_order_release);
    }
  }

  std::thread th_;
  FillJob* job_ = nullptr;
  int32_t carry_ring_[4] = {0, 0, 0, 0};
  int32_t cmid_ring_[4] = {0, 0, 0, 0};
  std::atomic<int32_t> fill_seq_{0}, fills_done_{0};
  std::atomic<int32_t> carry_ready_{0}, rows_done_{0};
  std::atomic<bool> quit_{false};
};

// Two-thread dispatch threshold (cells); settable from Python for the
// single- vs multi-thread exactness tests.
std::atomic<int64_t> g_mt_threshold{int64_t(8) << 20};

// Profile NW fill core.  row_codes: R entries in [0,4); sv: (C,5) int32
// row-major counts; i: number of previously aligned sequences.
// top_row: C+1 boundary values for dp[0][*]; edge_rowgap: per-row scale
// for dp[j][0] = j * edge_rowgap.  These are passed in because the
// reference reuses its DP matrix across merges without re-initializing
// the boundaries (dynamicprogramming.c:957-987), so they may be STALE
// values from the allocating merge — reproduced for parity.
// dirs out: (R+1)*(C+1) int8, row-major.  Returns dp[R][C].
int32_t dp_fill_core(const int8_t* row_codes, int32_t R,
                     const int32_t* sv, int32_t C, int32_t i,
                     const int32_t* top_row, int32_t edge_rowgap,
                     int8_t* dirs) {
  const int32_t rowgap = INDEL * i;
  std::vector<int32_t> buf0(C + 1), buf1(C + 1);
  std::vector<int32_t> colgap(C + 1);
  dirs[0] = D_DIAG;
  for (int32_t c = 1; c <= C; ++c) {
    const int32_t g = sv[(c - 1) * 5 + GAP];
    colgap[c] = DOUBLEGAP * g + INDEL * (i - g);
    dirs[c] = D_LEFT;
  }
  for (int32_t c = 0; c <= C; ++c) buf0[c] = top_row[c];
  // per-column substitution profile for each character code (transposed
  // scorevector), so the row loop reads contiguous memory
  std::vector<int32_t> subcol(4 * C);
  for (int32_t c = 0; c < C; ++c) {
    const int32_t* col = sv + (int64_t)c * 5;
    const int32_t g = col[GAP];
    for (int32_t a = 0; a < 4; ++a) {
      subcol[(int64_t)a * C + c] =
          MATCH * col[a] + INDEL * g + MISMATCH * (i - col[a] - g);
    }
  }
  std::vector<int32_t> m1(C + 1);
  std::vector<int8_t> d1(C + 1);
  std::vector<int32_t> S(C + 1), u(C + 1);
  S[0] = 0;
  for (int32_t c = 1; c <= C; ++c) S[c] = S[c - 1] + colgap[c];

  // Two-thread pipelining needs HEADROOM: on a 2-core box the ring
  // spin-waits ping-pong with the scheduler and the fill runs ~35x
  // SLOWER than single-thread (measured 0.015 vs 0.99 Gcell/s at
  // 4600x6000 — the round-3 "native pipeline regression" root cause),
  // so require >= 4 hardware threads before splitting the row.
  if ((int64_t)R * C >= g_mt_threshold.load(std::memory_order_relaxed) &&
      C >= 4096 && std::thread::hardware_concurrency() >= 4) {
    static thread_local std::unique_ptr<FillWorker> tl_worker;
    if (!tl_worker) tl_worker = std::make_unique<FillWorker>();
    FillJob job;
    job.row_codes = row_codes;
    job.subcol = subcol.data();
    job.Sp = S.data();
    job.cg = colgap.data();
    job.buf[0] = buf0.data();
    job.buf[1] = buf1.data();
    job.m1p = m1.data();
    job.d1p = d1.data();
    job.up_ = u.data();
    job.dirs = dirs;
    job.R = R;
    job.C = C;
    job.Cmid = (C / 2) & ~15;
    job.rowgap = rowgap;
    job.edge_rowgap = edge_rowgap;
    return tl_worker->run(job);
  }

  int32_t* bufs[2] = {buf0.data(), buf1.data()};
  for (int32_t j = 1; j <= R; ++j) {
    const int32_t* __restrict pv = bufs[(j - 1) & 1];
    int32_t* __restrict cu = bufs[j & 1];
    const int32_t* __restrict subrow =
        subcol.data() + (int64_t)row_codes[j - 1] * C;
    int8_t* __restrict drow = dirs + (int64_t)j * (C + 1);
    drow[0] = D_UP;
    cu[0] = j * edge_rowgap;
    fill_phase_a(pv, subrow, rowgap, S.data(), m1.data(), d1.data(),
                 u.data(), 1, C);
    u[0] = cu[0];
    prefix_max_inplace(u.data(), 1, C, cu[0]);
    fill_phase_c(cu, u.data(), S.data(), colgap.data(), m1.data(),
                 d1.data(), drow, 1, C);
  }
  return bufs[R & 1][C];
}

}  // namespace

extern "C" {

void csa_set_scoring(int match_, int mismatch_, int indel_, int doublegap_) {
  MATCH = match_;
  MISMATCH = mismatch_;
  INDEL = indel_;
  DOUBLEGAP = doublegap_;
}

// Two-thread fill dispatch threshold in cells (exactness tests compare
// forced single- vs multi-thread output through this knob).
void csa_set_mt_threshold(int64_t cells) {
  g_mt_threshold.store(cells <= 0 ? (int64_t(8) << 20) : cells);
}

int32_t csa_dp_fill(const int8_t* row_codes, int32_t R,
                    const int32_t* sv, int32_t C, int32_t i,
                    const int32_t* top_row, int32_t edge_rowgap,
                    int8_t* dirs) {
  return dp_fill_core(row_codes, R, sv, C, i, top_row, edge_rowgap, dirs);
}

// Fill + backtrack fused: the direction matrix stays native-side and
// only the O(R+C) walk-order path codes cross into Python (same code
// convention as progressive._dirs_to_maps: first entry = the step taken
// at (R, C), boundary tails emitted as D_UP / D_LEFT).  path must hold
// R + C entries; *path_len receives the walk length.  Returns dp[R][C].
int32_t csa_dp_fill_path(const int8_t* row_codes, int32_t R,
                         const int32_t* sv, int32_t C, int32_t i,
                         const int32_t* top_row, int32_t edge_rowgap,
                         int8_t* path, int32_t* path_len) {
  // persistent scratch: the direction matrix of a large merge is
  // hundreds of MB; per-call alloc/free page-faults the whole range
  // every merge (measured ~18 s of sys time on Set3's 36 merges).  A
  // raw malloc with 1.5x growth headroom — NOT std::vector, whose
  // resize would memcpy + zero-fill hundreds of MB every time the
  // consensus grows a merge — keeps the pages warm across merges.
  struct Scratch {
    int8_t* p = nullptr;
    size_t cap = 0;
    ~Scratch() { std::free(p); }
    int8_t* get(size_t need) {
      if (cap < need) {
        std::free(p);
        const size_t newcap = need + need / 2;
        p = static_cast<int8_t*>(std::malloc(newcap));
        cap = p ? newcap : 0;
      }
      return p;
    }
  };
  static thread_local Scratch scratch;
  const size_t need = (size_t)(R + 1) * (C + 1);
  int8_t* dirs = scratch.get(need);
  if (!dirs) {  // allocation failure: report an empty path
    *path_len = 0;
    return 0;
  }
  const int32_t score =
      dp_fill_core(row_codes, R, sv, C, i, top_row, edge_rowgap, dirs);
  int32_t j = R, c = C, n = 0;
  while (j > 0 && c > 0) {
    const int8_t d = dirs[(int64_t)j * (C + 1) + c];
    path[n++] = d;
    if (d == D_DIAG) {
      --j;
      --c;
    } else if (d == D_LEFT) {
      --c;
    } else {
      --j;
    }
  }
  while (j > 0) {
    path[n++] = D_UP;
    --j;
  }
  while (c > 0) {
    path[n++] = D_LEFT;
    --c;
  }
  *path_len = n;
  return score;
}

// Pairwise global NW score between two code strings with the simple
// +1/-1 scoring (reference Score(), dynamicprogramming.c:46-54); used
// by the rotation-verification and benchmark paths.
int32_t csa_pairwise_nw(const int8_t* a, int32_t n, const int8_t* b,
                        int32_t m) {
  std::vector<int32_t> prev(m + 1), cur(m + 1);
  for (int32_t c = 0; c <= m; ++c) prev[c] = -c;
  for (int32_t j = 1; j <= n; ++j) {
    cur[0] = -j;
    const int8_t ca = a[j - 1];
    for (int32_t c = 1; c <= m; ++c) {
      const int32_t sub = (ca == b[c - 1]) ? 1 : -1;
      int32_t v = prev[c - 1] + sub;
      const int32_t up = prev[c] - 1;
      const int32_t left = cur[c - 1] - 1;
      if (up > v) v = up;
      if (left > v) v = left;
      cur[c] = v;
    }
    prev.swap(cur);
  }
  return prev[m];
}

// Gap-block shift compaction (reference behavior:
// dynamicprogramming.c:643-899).  Serial host pass structured after the
// static/moving count-vector simulation of
// csa_tpu/align/progressive.py::delete_gapped_columns, which this is a
// bit-identical transliteration of (the Python version remains the
// exactness twin and the fallback).
//
// strings: (numseqs, stride) int8 row-major, logical width `consize`,
// rows in DP order; sv: (stride, 5) int32 row-major column counts.
// Both are modified in place.  Returns the new consize.
int32_t csa_dgc(int8_t* strings, int32_t numseqs, int64_t stride,
                int32_t* sv, int32_t consize, int32_t maxnongaps) {
  const int32_t mingaps = numseqs - maxnongaps;
  std::vector<int32_t> seqstoshift(numseqs);
  std::vector<int32_t> postonextgap(numseqs), nposaff(numseqs);
  std::vector<int32_t> bestnposaff(numseqs);
  std::vector<int32_t> movingsv, staticsv, bestworking;
  auto svrow = [&](int32_t c) { return sv + (int64_t)c * 5; };

  int32_t col = 1;
  while (col <= consize) {
    if (svrow(col - 1)[GAP] < mingaps) { ++col; continue; }
    int32_t ntoshift = 0;
    for (int32_t t = 0; t < numseqs; ++t)
      if (strings[(int64_t)t * stride + col - 1] != GAP)
        seqstoshift[ntoshift++] = t;
    if (ntoshift == 0) { ++col; continue; }

    int64_t bestscore = 0;
    int32_t bestshift = 0;   // signed: dirsignal * shift
    int32_t best_maxpos = 0;
    bool have_best = false;
    int32_t dirsignal = 1;   // forward pass first, then backward
    for (;;) {
      // per shifting row: non-gap run from col, then the gap run after it
      bool hit_end = false;
      int32_t postofarthest = 0, minnextgaps = consize;
      for (int32_t t = 0; t < ntoshift; ++t) {
        const int8_t* s = strings + (int64_t)seqstoshift[t] * stride;
        const int32_t wlen = dirsignal > 0 ? consize - (col - 1) : col;
        int32_t cnt = 0;
        while (cnt < wlen && s[col - 1 + dirsignal * cnt] != GAP) ++cnt;
        if (cnt >= wlen) { hit_end = true; break; }
        int32_t gend = cnt;
        while (gend < wlen && s[col - 1 + dirsignal * gend] == GAP) ++gend;
        postonextgap[t] = cnt;
        if (cnt > postofarthest) postofarthest = cnt;
        if (gend - cnt < minnextgaps) minnextgaps = gend - cnt;
      }
      if (hit_end) {
        if (dirsignal == -1) break;
        dirsignal = -1;
        continue;
      }
      const int32_t maxpos = postofarthest + minnextgaps;
      for (int32_t t = 0; t < ntoshift; ++t)
        nposaff[t] = postonextgap[t] + minnextgaps;

      // moving = counts of the shifting rows' block chars per window
      // position; static = remaining rows
      movingsv.assign((size_t)maxpos * 5, 0);
      staticsv.assign((size_t)maxpos * 5, 0);
      for (int32_t j = 0; j < maxpos; ++j) {
        const int32_t ci = col + dirsignal * j - 1;
        for (int32_t t = 0; t < ntoshift; ++t)
          if (j < nposaff[t])
            ++movingsv[(size_t)j * 5 +
                       strings[(int64_t)seqstoshift[t] * stride + ci]];
        for (int32_t a = 0; a < 5; ++a)
          staticsv[(size_t)j * 5 + a] =
              svrow(ci)[a] - movingsv[(size_t)j * 5 + a];
      }

      // score of the moving chars at their current placement
      int64_t currentscore = 0;
      for (int32_t j = 0; j < maxpos; ++j) {
        const int32_t ci = col + dirsignal * j - 1;
        const int32_t* sc = svrow(ci);
        const int32_t svg = sc[GAP];
        const int32_t* mv = movingsv.data() + (size_t)j * 5;
        for (int32_t a = 0; a < 4; ++a)
          if (mv[a])
            currentscore +=
                (int64_t)mv[a] * (MATCH * (sc[a] - 1) +
                                  MISMATCH * (numseqs - (sc[a] + svg)) +
                                  INDEL * svg);
        if (mv[GAP])
          currentscore += (int64_t)mv[GAP] *
                          (DOUBLEGAP * (svg - 1) + INDEL * (numseqs - svg));
      }

      // simulate shifts 1..minnextgaps, peeling one trailing gap off each
      // moving block per step
      std::vector<int32_t> moving_i(movingsv);
      std::vector<int32_t> nposaff_i(nposaff.begin(), nposaff.begin() + ntoshift);
      int32_t dir_bestshift = 0;
      for (int32_t sh = 1; sh <= minnextgaps; ++sh) {
        for (int32_t t = 0; t < ntoshift; ++t) {
          --nposaff_i[t];
          --moving_i[(size_t)nposaff_i[t] * 5 + GAP];
        }
        int64_t score = 0;
        for (int32_t j = 0; j < maxpos; ++j) {
          if (j < sh) {
            const int32_t wg = staticsv[(size_t)j * 5 + GAP] + ntoshift;
            if (wg != numseqs)
              score += (int64_t)ntoshift *
                       (DOUBLEGAP * (wg - 1) + INDEL * (numseqs - wg));
          } else {
            const int32_t* st = staticsv.data() + (size_t)j * 5;
            const int32_t* ms = moving_i.data() + (size_t)(j - sh) * 5;
            const int32_t wg = st[GAP] + ms[GAP];
            if (wg == numseqs) continue;
            for (int32_t a = 0; a < 4; ++a)
              if (ms[a]) {
                const int32_t w = st[a] + ms[a];
                score += (int64_t)ms[a] * (MATCH * (w - 1) +
                                           MISMATCH * (numseqs - (w + wg)) +
                                           INDEL * wg);
              }
            if (ms[GAP])
              score += (int64_t)ms[GAP] *
                       (DOUBLEGAP * (wg - 1) + INDEL * (numseqs - wg));
          }
        }
        const int64_t shifted = score - currentscore;
        if (shifted >= bestscore) {
          bestshift = dirsignal * sh;
          bestscore = shifted;
          dir_bestshift = sh;
        }
      }
      if (bestshift != 0 && bestshift * dirsignal > 0) {
        // capture apply state: re-add the still-remaining trailing gaps
        best_maxpos = maxpos;
        const int32_t sh = dir_bestshift;
        const int32_t nrem = minnextgaps - sh;
        std::vector<int32_t> moving_best(moving_i);
        for (int32_t t = 0; t < ntoshift; ++t) {
          for (int32_t r = 0; r < nrem; ++r)
            ++moving_best[(size_t)(postonextgap[t] + r) * 5 + GAP];
          bestnposaff[t] = postonextgap[t] + sh;
        }
        bestworking.assign((size_t)maxpos * 5, 0);
        for (int32_t j = 0; j < maxpos; ++j) {
          int32_t* bw = bestworking.data() + (size_t)j * 5;
          const int32_t* st = staticsv.data() + (size_t)j * 5;
          if (j < sh) {
            for (int32_t a = 0; a < 5; ++a) bw[a] = st[a];
            bw[GAP] += ntoshift;
          } else {
            const int32_t* ms = moving_best.data() + (size_t)(j - sh) * 5;
            for (int32_t a = 0; a < 5; ++a) bw[a] = st[a] + ms[a];
          }
        }
        have_best = true;
      }
      if (dirsignal == -1) break;
      dirsignal = -1;
    }
    if (bestshift == 0 || !have_best) { ++col; continue; }

    dirsignal = bestshift < 0 ? -1 : 1;
    const int32_t sh = bestshift < 0 ? -bestshift : bestshift;
    // apply the counts
    for (int32_t j = 0; j < best_maxpos; ++j) {
      const int32_t ci = col + dirsignal * j - 1;
      for (int32_t a = 0; a < 5; ++a)
        svrow(ci)[a] = bestworking[(size_t)j * 5 + a];
    }
    // apply the char block moves + gap fills
    for (int32_t t = 0; t < ntoshift; ++t) {
      int8_t* s = strings + (int64_t)seqstoshift[t] * stride;
      const int32_t np = bestnposaff[t];
      if (dirsignal > 0) {
        std::memmove(s + col - 1 + sh, s + col - 1, np - sh);
        std::memset(s + col - 1, GAP, sh);
      } else {
        std::memmove(s + col - np, s + col - np + sh, np - sh);
        std::memset(s + col - sh, GAP, sh);
      }
    }
    // remove the all-gap columns that opened up around col
    int32_t mrun = 0;
    for (int32_t j = col; j <= consize && svrow(j - 1)[GAP] == numseqs; ++j)
      ++mrun;
    int32_t krun = 0;
    for (int32_t j = col - 1; j >= 1 && svrow(j - 1)[GAP] == numseqs; --j)
      ++krun;
    const int32_t mtot = mrun + krun;
    const int32_t start = col - krun;  // leftmost empty column, 1-based
    if (mtot > 0) {
      const int32_t length = consize - mtot - start + 1;
      if (length > 0) {
        std::memmove(svrow(start - 1), svrow(start + mtot - 1),
                     (size_t)length * 5 * sizeof(int32_t));
        for (int32_t t = 0; t < numseqs; ++t) {
          int8_t* s = strings + (int64_t)t * stride;
          std::memmove(s + start - 1, s + start + mtot - 1, length);
        }
      }
      std::memset(svrow(consize - mtot), 0,
                  (size_t)mtot * 5 * sizeof(int32_t));
      consize -= mtot;
    }
    col = col - (krun + 1) + 1;  // reference: for-loop increment after
                                 // `col = col - (k + 1)`
  }
  return consize;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native cyclic suffix-array rotation engine.
//
// Small-input latency twin of the device engine (csa_tpu/index/engine.py):
// the tunneled accelerator's per-op launch latency dominates below ~1 Mbp
// total (measured ~350 ms for the fused device program on the 280k-entry
// Primates set vs ~25 ms here), so the rotation pipeline routes small sets
// here and large sets to the device.  Semantics are an exact mirror of the
// numpy engine (csa_tpu/index/cyclic.py — itself the re-derivation of the
// reference's gencycsuffixtrees.c + csamsa.c:69-257 contract):
//
//   * prefix-doubling rank sort over all rotations, periodic comparison,
//     ties by (seq, pos); LSD radix sorts with 16-bit digits;
//   * within-sequence duplicate rotations collapse to the smallest pos;
//   * adjacent LCP capped at min(seq lengths) via cyclic Kasai
//     (h-decrement invariant holds for periodic strings; see notes inline);
//   * lcp-interval tree traversal (stack sweep) with per-interval
//     sequence bitmasks -> "deepest all-sequences" blocks
//     (= collectNodes, csamsa.c:69-81);
//   * suffix-containment filter via inverse-SA membership
//     (= removeSuffixNodes, csamsa.c:85-109);
//   * per-sequence uniqueness + first-occurrence positions
//     (= removeNonUniqueNodes + collectPositions, csamsa.c:114-257).
// ---------------------------------------------------------------------------

namespace {

// Stable LSD counting sort of idx by key16 = (key[idx] >> shift) & 0xffff.
// tmp must have the same size as idx (they are swapped).
void radix_pass(const int32_t* key, int shift, std::vector<int32_t>& idx,
                std::vector<int32_t>& tmp, std::vector<int32_t>& hist) {
  hist.assign(65536 + 1, 0);
  const size_t n = idx.size();
  for (size_t i = 0; i < n; ++i)
    ++hist[((static_cast<uint32_t>(key[idx[i]]) >> shift) & 0xffffu) + 1];
  for (int d = 0; d < 65536; ++d) hist[d + 1] += hist[d];
  for (size_t i = 0; i < n; ++i) {
    const uint32_t d = (static_cast<uint32_t>(key[idx[i]]) >> shift) & 0xffffu;
    tmp[hist[d]++] = idx[i];
  }
  idx.swap(tmp);
}

// Sort idx stably by (k1[g], k2[g]); keys are non-negative int32.
void radix_sort_pairs(const int32_t* k1, const int32_t* k2, int32_t maxval,
                      std::vector<int32_t>& idx, std::vector<int32_t>& hist) {
  std::vector<int32_t> tmp(idx.size());
  const bool wide = maxval >= (1 << 16);
  radix_pass(k2, 0, idx, tmp, hist);
  if (wide) radix_pass(k2, 16, idx, tmp, hist);
  radix_pass(k1, 0, idx, tmp, hist);
  if (wide) radix_pass(k1, 16, idx, tmp, hist);
}

}  // namespace

extern "C" {

// Cyclic suffix-array rotation analysis.  codes: concatenated per-sequence
// normalized codes (values in [0, 5)); offsets: k+1 int64 sequence starts.
// Outputs (buffers sized by the caller):
//   counts[0..3] = M (deduped entries), collected, after-suffix, after-unique
//   bstart/bend/bdepth/keep_suffix/uniq: per collected block (max_blocks)
//   positions: max_blocks * k first-occurrence start positions
// Returns 0, or the needed block count if max_blocks was too small.
int32_t csa_rotation_analyze(const int8_t* codes, const int64_t* offsets,
                             int32_t k, int32_t max_blocks, int32_t* counts,
                             int32_t* bstart, int32_t* bend, int32_t* bdepth,
                             uint8_t* keep_suffix, uint8_t* uniq,
                             int64_t* positions) {
  const bool prof = std::getenv("CSA_NATIVE_PROFILE") != nullptr;
  auto t_last = std::chrono::steady_clock::now();
  auto mark = [&](const char* what) {
    if (!prof) return;
    const auto now = std::chrono::steady_clock::now();
    std::fprintf(stderr, "[native] %-12s %7.3f ms\n", what,
                 std::chrono::duration<double, std::milli>(now - t_last).count());
    t_last = now;
  };
  const int64_t N64 = offsets[k];
  const int32_t N = static_cast<int32_t>(N64);
  std::vector<int32_t> seq_of(N), pos_of(N), n_of(N);
  int32_t max_n = 0;
  for (int32_t s = 0; s < k; ++s) {
    const int32_t n = static_cast<int32_t>(offsets[s + 1] - offsets[s]);
    if (n > max_n) max_n = n;
    for (int32_t p = 0; p < n; ++p) {
      const int32_t g = static_cast<int32_t>(offsets[s]) + p;
      seq_of[g] = s;
      pos_of[g] = p;
      n_of[g] = n;
    }
  }
  auto advance = [&](int32_t g, int32_t off) -> int32_t {
    const int32_t n = n_of[g];
    int32_t p = pos_of[g] + off % n;
    if (p >= n) p -= n;
    return g - pos_of[g] + p;
  };

  // ---- suffix ranks: packed 12-mer base + tied-run-only refinement ----
  // The initial rank packs 12 cyclic chars base-5 (5^12 < 2^31), resolving
  // the overwhelming majority of comparisons in ONE radix sort; doubling
  // then refines only the still-tied runs (Larsson–Sadakane-style), whose
  // total size decays geometrically on genomic data.  Ranks use the
  // group-start-position convention (order- and equality-correct, which is
  // all the downstream comparisons need).
  mark("setup");
  constexpr int32_t PACK_W = 12;
  std::vector<int32_t> key(N);
  {
    std::vector<int8_t> dbl;
    for (int32_t s = 0; s < k; ++s) {
      const int32_t base = static_cast<int32_t>(offsets[s]);
      const int32_t n = n_of[base];
      dbl.assign(static_cast<size_t>(n) + PACK_W, 0);
      for (int32_t p = 0; p < n + PACK_W; ++p) dbl[p] = codes[base + p % n];
      // rolling base-5 pack over the doubled buffer, high char first
      int64_t acc = 0;
      int64_t top = 1;  // 5^(PACK_W-1)
      for (int32_t t = 1; t < PACK_W; ++t) top *= 5;
      for (int32_t t = 0; t < PACK_W; ++t) acc = acc * 5 + dbl[t];
      key[base] = static_cast<int32_t>(acc);
      for (int32_t p = 1; p < n; ++p) {
        acc = (acc - dbl[p - 1] * top) * 5 + dbl[p + PACK_W - 1];
        key[base + p] = static_cast<int32_t>(acc);
      }
    }
  }
  mark("keys");
  std::vector<int32_t> rank(N), idx(N), tmp(N), hist;
  for (int32_t g = 0; g < N; ++g) idx[g] = g;
  radix_pass(key.data(), 0, idx, tmp, hist);
  radix_pass(key.data(), 16, idx, tmp, hist);
  // group-start ranks + initial tied runs
  std::vector<int32_t> run_lo, run_hi;  // tied runs [lo, hi] in sa positions
  {
    int32_t gs = 0;
    for (int32_t i = 1; i <= N; ++i) {
      if (i == N || key[idx[i]] != key[idx[gs]]) {
        for (int32_t j = gs; j < i; ++j) rank[idx[j]] = gs;
        if (i - gs > 1) { run_lo.push_back(gs); run_hi.push_back(i - 1); }
        gs = i;
      }
    }
  }
  mark("base-sort");
  int32_t window = PACK_W;
  std::vector<std::pair<int32_t, int32_t>> run_buf;  // (ek2, slot-in-run)
  std::vector<int32_t> run_g, new_lo, new_hi;
  while (window < max_n && !run_lo.empty()) {
    new_lo.clear();
    new_hi.clear();
    for (size_t r = 0; r < run_lo.size(); ++r) {
      const int32_t lo = run_lo[r], hi = run_hi[r];
      const int32_t L = hi - lo + 1;
      // within a tied run ek1 == rank[g] == lo for every member, so only
      // the window-advanced rank orders it; sorting (ek2, slot) pairs is
      // stable because slot is unique and ascending
      run_buf.resize(L);
      run_g.resize(L);
      for (int32_t e = 0; e < L; ++e) {
        const int32_t g = idx[lo + e];
        run_g[e] = g;
        run_buf[e] = {rank[advance(g, window)], e};
      }
      std::sort(run_buf.begin(), run_buf.end());
      for (int32_t e = 0; e < L; ++e) idx[lo + e] = run_g[run_buf[e].second];
      // re-rank within refined groups; collect still-tied sub-runs
      int32_t e0 = 0;
      for (int32_t e = 1; e <= L; ++e) {
        if (e == L || run_buf[e].first != run_buf[e0].first) {
          for (int32_t j = e0; j < e; ++j) rank[idx[lo + j]] = lo + e0;
          if (e - e0 > 1) {
            new_lo.push_back(lo + e0);
            new_hi.push_back(lo + e - 1);
          }
          e0 = e;
        }
      }
    }
    run_lo.swap(new_lo);
    run_hi.swap(new_hi);
    window <<= 1;
  }
  mark("refine");

  // ---- final order: ties within groups stayed in g = (seq, pos)
  // construction order through the stable sorts — exactly the numpy
  // engine's lexsort((pos, seq, final_rank)) (cyclic.py:197) ----
  std::vector<int32_t>& sa_full = idx;

  // ---- dedup within-sequence identical rotations (keep smallest pos) ----
  std::vector<int32_t> sa;
  sa.reserve(N);
  std::vector<int32_t> kept_prefix(N);  // # kept entries among sa_full[0..i]
  for (int32_t i = 0; i < N; ++i) {
    const int32_t g = sa_full[i];
    const bool dup = i > 0 && rank[g] == rank[sa_full[i - 1]] &&
                     seq_of[g] == seq_of[sa_full[i - 1]];
    if (!dup) sa.push_back(g);
    kept_prefix[i] = static_cast<int32_t>(sa.size()) - 1;
  }
  const int32_t M = static_cast<int32_t>(sa.size());
  counts[0] = M;
  std::vector<int32_t> inv_full(N);  // g -> sorted position in sa_full
  for (int32_t i = 0; i < N; ++i) inv_full[sa_full[i]] = i;
  std::vector<int32_t> inv(N, -1);  // g -> deduped position (kept only)
  for (int32_t i = 0; i < M; ++i) inv[sa[i]] = i;

  mark("dedup");
  // ---- capped LCP via cyclic Kasai ----
  // h-invariant: lcp of the 1-advanced pair >= h-1 holds for periodic
  // strings; the length cap only shrinks targets, and h is clamped to the
  // pair cap before extension, so h always lower-bounds the true value.
  // Comparison runs wrap-free over a doubled-codes buffer (each sequence
  // written twice back-to-back, 8 bytes at a time), so no modulo per char.
  std::vector<int8_t> dbl2(static_cast<size_t>(2) * N + 8, 0);
  for (int32_t s = 0; s < k; ++s) {
    const int32_t base = static_cast<int32_t>(offsets[s]);
    const int32_t n = n_of[base];
    std::memcpy(dbl2.data() + 2 * base, codes + base, n);
    std::memcpy(dbl2.data() + 2 * base + n, codes + base, n);
  }
  auto dptr = [&](int32_t g) -> const int8_t* {
    return dbl2.data() + 2 * (g - pos_of[g]) + pos_of[g];
  };
  std::vector<int32_t> lcp(M, 0);
  for (int32_t s = 0; s < k; ++s) {
    const int32_t base = static_cast<int32_t>(offsets[s]);
    const int32_t n = n_of[base];
    int32_t h = 0;
    for (int32_t p = 0; p < n; ++p) {
      const int32_t g = base + p;
      const int32_t i = inv[g];
      if (i > 0) {
        const int32_t y = sa[i - 1];
        const int32_t cap = n < n_of[y] ? n : n_of[y];
        if (h > cap) h = cap;
        const int8_t* a = dptr(g);
        const int8_t* b = dptr(y);
        while (h + 8 <= cap) {
          uint64_t wa, wb;
          std::memcpy(&wa, a + h, 8);
          std::memcpy(&wb, b + h, 8);
          if (wa != wb) {
            h += __builtin_ctzll(wa ^ wb) >> 3;
            goto done;
          }
          h += 8;
        }
        while (h < cap && a[h] == b[h]) ++h;
      done:
        lcp[i] = h;
      } else if (i == 0) {
        h = 0;
      }
      if (h > 0) --h;
    }
  }

  mark("kasai");
  // ---- lcp-interval tree sweep: deepest all-sequences blocks ----
  // Mirrors cyclic.collect_blocks (PSV/NSV interval dedupe + direct-parent
  // all-seq child marking) via the standard stack traversal; with k <= 64
  // coverage is a bitmask OR.  Collected intervals are pairwise disjoint
  // (any nested all-seq pair marks the parent chain), so the later
  // per-member passes are O(M) total.
  struct Node {
    int32_t depth, start;
    uint64_t mask;
    bool allseq_child;
  };
  const uint64_t full_mask =
      k == 64 ? ~0ull : ((1ull << k) - 1ull);
  std::vector<Node> stack;
  stack.push_back({0, 0, 0, false});
  std::vector<int32_t> cs, ce, cd;  // collected intervals
  auto emit = [&](const Node& nd, int32_t end) {
    if (nd.depth >= 1 && nd.mask == full_mask && !nd.allseq_child) {
      cs.push_back(nd.start);
      ce.push_back(end);
      cd.push_back(nd.depth);
    }
  };
  for (int32_t i = 1; i <= M; ++i) {
    const int32_t d = i < M ? lcp[i] : 0;
    int32_t start = i - 1;
    uint64_t carry = 1ull << seq_of[sa[i - 1]];
    bool carry_allseq = false;
    while (stack.back().depth > d) {
      Node nd = stack.back();
      stack.pop_back();
      nd.mask |= carry;
      nd.allseq_child |= carry_allseq;
      emit(nd, i - 1);
      carry = nd.mask;
      carry_allseq = nd.mask == full_mask;
      start = nd.start;
    }
    if (stack.back().depth == d) {
      stack.back().mask |= carry;
      stack.back().allseq_child |= carry_allseq;
    } else if (d >= 1) {
      stack.push_back({d, start, carry, carry_allseq});
    } else {
      stack[0].mask |= carry;
    }
  }
  mark("sweep");
  const int32_t nb = static_cast<int32_t>(cs.size());
  counts[1] = nb;
  if (nb > max_blocks) return nb;

  // order blocks by (start, end) like the numpy dedupe's lexsort — the
  // stack pops them in (end, start-descending-ish) order
  std::vector<int32_t> border(nb);
  for (int32_t b = 0; b < nb; ++b) border[b] = b;
  radix_sort_pairs(ce.data(), cs.data(), M, border, hist);
  // radix_sort_pairs sorts by (ce, cs); disjoint intervals make (start) and
  // (end) orders identical, so this equals the (start, end) lexsort.
  for (int32_t b = 0; b < nb; ++b) {
    bstart[b] = cs[border[b]];
    bend[b] = ce[border[b]];
    bdepth[b] = cd[border[b]];
  }

  // ---- suffix-containment filter (removeSuffixNodes semantics) ----
  // Occurrence-END join (the round-3 device engine's formulation): block
  // i (depth d_i) is a suffix of a strictly deeper block j iff
  // q = advance(rep_j, d_j - d_i) lies inside i's interval, and advancing
  // both sides by d_i turns that into end_rot(j) == advance(member, d_i)
  // for some member of i's interval — O(total occurrences) with one
  // max-depth table over rotation ids, replacing the
  // (blocks x distinct-depths) binary-search join (8.1 s -> ~0.3 s at
  // the 8x1 Mbp 746k-block set).  The id-level bijection needs every
  // interval member to be a live rotation id, so inputs where the dedup
  // pass removed duplicate rotations (M < N, degenerate periodic
  // sequences) keep the positional join below.
  for (int32_t b = 0; b < nb; ++b) keep_suffix[b] = 1;
  if (M == N) {
    std::vector<int32_t> maxd(N, -1);
    for (int32_t b = 0; b < nb; ++b) {
      const int32_t e = advance(sa[bstart[b]], bdepth[b]);
      if (bdepth[b] > maxd[e]) maxd[e] = bdepth[b];
    }
    for (int32_t b = 0; b < nb; ++b) {
      const int32_t d = bdepth[b];
      for (int32_t r = bstart[b]; r <= bend[b]; ++r) {
        if (maxd[advance(sa[r], d)] > d) {
          keep_suffix[b] = 0;
          break;
        }
      }
    }
  } else {
  std::vector<int32_t> by_depth(nb);
  for (int32_t b = 0; b < nb; ++b) by_depth[b] = b;
  std::vector<int32_t> zero(nb, 0);
  radix_sort_pairs(bdepth, zero.data(), max_n, by_depth, hist);
  std::vector<int32_t> distinct;  // distinct depths ascending
  for (int32_t t = 0; t < nb; ++t)
    if (t == 0 || bdepth[by_depth[t]] != bdepth[by_depth[t - 1]])
      distinct.push_back(bdepth[by_depth[t]]);
  // per distinct depth: sorted (start, block) table
  for (int32_t ds : distinct) {
    std::vector<std::pair<int32_t, int32_t>> owners;
    for (int32_t b = 0; b < nb; ++b)
      if (bdepth[b] == ds) owners.emplace_back(bstart[b], b);
    // bstart is ascending in b already, owners sorted
    for (int32_t j = 0; j < nb; ++j) {
      if (bdepth[j] <= ds) continue;
      const int32_t rep = sa[bstart[j]];
      const int32_t q = advance(rep, bdepth[j] - ds);
      const int32_t qpos = kept_prefix[inv_full[q]];
      // find owner with largest start <= qpos
      int32_t lo = 0, hi = static_cast<int32_t>(owners.size());
      while (lo < hi) {
        const int32_t mid = (lo + hi) / 2;
        if (owners[mid].first <= qpos) lo = mid + 1;
        else hi = mid;
      }
      if (lo > 0) {
        const int32_t b = owners[lo - 1].second;
        if (bend[b] >= qpos) keep_suffix[b] = 0;
      }
    }
  }
  }
  int32_t after_suffix = 0;
  for (int32_t b = 0; b < nb; ++b) after_suffix += keep_suffix[b];
  counts[2] = after_suffix;

  mark("suffix");
  // ---- uniqueness + first-occurrence positions ----
  // Collected intervals are all-sequences and pairwise disjoint, so
  // "exactly once per sequence" is simply width == k; positions then
  // read straight off the k members (no per-block counter clearing).
  int32_t after_unique = 0;
  std::vector<int32_t> cnt(k);
  for (int32_t b = 0; b < nb; ++b) {
    const int32_t width = bend[b] - bstart[b] + 1;
    if (width == k) {
      for (int32_t i = bstart[b]; i <= bend[b]; ++i) {
        const int32_t g = sa[i];
        positions[static_cast<int64_t>(b) * k + seq_of[g]] = pos_of[g];
      }
      uniq[b] = 1;
      if (keep_suffix[b]) ++after_unique;
      continue;
    }
    // non-unique (or degenerate) blocks: exact counting for positions
    for (int32_t s = 0; s < k; ++s) cnt[s] = 0;
    for (int32_t i = bstart[b]; i <= bend[b]; ++i) {
      const int32_t g = sa[i];
      const int32_t s = seq_of[g];
      if (cnt[s] == 0) positions[static_cast<int64_t>(b) * k + s] = pos_of[g];
      ++cnt[s];
    }
    uint8_t u = 1;
    for (int32_t s = 0; s < k; ++s)
      if (cnt[s] != 1) { u = 0; break; }
    uniq[b] = u;
    if (u && keep_suffix[b]) ++after_unique;
  }
  mark("unique");
  counts[3] = after_unique;
  return 0;
}

// Anchor attachment stats over the linear suffix index (the numpy
// semantics of csa_tpu/align/anchors.py::compute_border_nodes, exact):
// per sorted entry x,
//   mstat[x] = min over sequences j != seq[x] of the best LCP to the
//              nearest j-entry above/below (running-min sweeps), capped
//              by the suffix length cap[x];
//   att[x]   = deepest boundary lcp <= mstat[x] adjacent to x's interval
//              = max(lcp_ext[Lb], lcp_ext[Rb]) where Lb/Rb are the
//              nearest positions (<=x / >x) with lcp <= mstat[x];
//   lb2[x]   = nearest position <= x with lcp <= att[x]-1 (the node's
//              interval run start, the border-node identity).
// The nearest-<=-threshold queries use monotonic stacks with strictly
// increasing values toward the top + binary search (the numpy twin uses
// sparse-table descents; results are identical).
int32_t csa_anchor_attach(const int32_t* seq, const int32_t* lcp,
                          const int32_t* cap, int32_t k, int32_t m,
                          int32_t* att, int32_t* lb2) {
  if (m <= 0) return 0;
  const int64_t INF = (int64_t(1) << 60);
  std::vector<int64_t> mstat(m, INF);
  std::vector<int64_t> down(m), up(m);
  for (int32_t j = 0; j < k; ++j) {
    // downward: nearest j-entry above (smaller index)
    {
      int64_t r = INF;
      bool seen = false;
      for (int32_t i = 0; i < m; ++i) {
        if (seq[i] == j) {
          seen = true;
          r = INF;
          down[i] = INF;  // own sequence: no constraint
        } else {
          if (seen && lcp[i] < r) r = lcp[i];
          else if (!seen) { down[i] = -1; continue; }
          down[i] = r;
        }
      }
    }
    // upward: nearest j-entry below (larger index); lcp_up[x] = lcp[x+1]
    {
      int64_t r = INF;
      bool seen = false;
      for (int32_t i = m - 1; i >= 0; --i) {
        if (seq[i] == j) {
          seen = true;
          r = INF;
          up[i] = INF;
        } else if (!seen) {
          up[i] = -1;
        } else {
          const int64_t lu = (i + 1 < m) ? lcp[i + 1] : 0;
          if (lu < r) r = lu;
          up[i] = r;
        }
      }
    }
    for (int32_t i = 0; i < m; ++i) {
      if (seq[i] == j) continue;
      int64_t mj = down[i] > up[i] ? down[i] : up[i];
      if (mj < 0) mj = 0;
      if (mj < mstat[i]) mstat[i] = mj;
    }
  }
  for (int32_t i = 0; i < m; ++i)
    if (cap[i] < mstat[i]) mstat[i] = cap[i];

  // Rb pass (right-to-left; query BEFORE pushing x: j > x strictly).
  // stack: positions with strictly increasing lcp toward the top
  std::vector<int32_t> st;
  std::vector<int32_t> rb(m);
  st.reserve(64);
  for (int32_t x = m - 1; x >= 0; --x) {
    // nearest j > x with lcp[j] <= mstat[x]; m (sentinel value 0) if none
    const int64_t t = mstat[x];
    int32_t ans = m;
    // prefix of the stack (bottom = farthest, smallest values) holds
    // values <= t; we want the LAST such element (nearest)
    int32_t lo = 0, hi = static_cast<int32_t>(st.size());
    while (lo < hi) {
      const int32_t mid = (lo + hi) / 2;
      if (lcp[st[mid]] <= t) lo = mid + 1;
      else hi = mid;
    }
    if (lo > 0) ans = st[lo - 1];
    rb[x] = ans;
    while (!st.empty() && lcp[st.back()] >= lcp[x]) st.pop_back();
    st.push_back(x);
  }
  // Lb pass (left-to-right; push x BEFORE querying: j <= x inclusive),
  // fused with att and the second (lb2, threshold att-1) query
  st.clear();
  for (int32_t x = 0; x < m; ++x) {
    while (!st.empty() && lcp[st.back()] >= lcp[x]) st.pop_back();
    st.push_back(x);
    const int64_t t = mstat[x];
    int32_t lo = 0, hi = static_cast<int32_t>(st.size());
    while (lo < hi) {
      const int32_t mid = (lo + hi) / 2;
      if (lcp[st[mid]] <= t) lo = mid + 1;
      else hi = mid;
    }
    const int32_t lb = lo > 0 ? st[lo - 1] : 0;
    const int32_t lv = lcp[lb];
    const int32_t rv = rb[x] < m ? lcp[rb[x]] : 0;
    const int32_t a = lv > rv ? lv : rv;
    att[x] = a;
    const int64_t t2 = int64_t(a) - 1;
    lo = 0;
    hi = static_cast<int32_t>(st.size());
    while (lo < hi) {
      const int32_t mid = (lo + hi) / 2;
      if (lcp[st[mid]] <= t2) lo = mid + 1;
      else hi = mid;
    }
    lb2[x] = lo > 0 ? st[lo - 1] : 0;
  }
  return 0;
}

// Linear suffix index of one concatenated string (the alignment-phase
// anchor workload: csa_tpu/align/anchors.py::build_linear_index, the
// re-derivation of the reference's tree surgery
// morenodeslinkedlists.c:303-326).  s values are in [0, sigma); the
// caller embeds one UNIQUE separator per sequence, which makes every
// suffix distinct and caps every comparison, so plain prefix doubling
// with the linear past-the-end convention (rank -1) converges to a
// total order and Kasai yields exact (uncapped) LCPs.
// Outputs: sa (total,) int32 sorted suffix starts; lcp (total,) int32
// adjacent LCPs (lcp[0] = 0).  Returns 0.
int32_t csa_linear_index(const int32_t* s, int32_t total, int32_t sigma,
                         int32_t* sa, int32_t* lcp) {
  if (total <= 0) return 0;
  // pack W chars base sigma into one int31 key (rolling window, zero pad
  // past the end — the pad never decides an order: two windows always
  // first differ at or before a unique separator inside the string)
  int32_t W = 1;
  {
    int64_t p = sigma;
    while (p * sigma < (int64_t(1) << 31)) {
      p *= sigma;
      ++W;
    }
  }
  std::vector<int32_t> key(total);
  {
    int64_t top = 1;
    for (int32_t t = 1; t < W; ++t) top *= sigma;
    int64_t acc = 0;
    for (int32_t t = 0; t < W; ++t)
      acc = acc * sigma + (t < total ? s[t] : 0);
    key[0] = static_cast<int32_t>(acc);
    for (int32_t p = 1; p < total; ++p) {
      const int64_t incoming = p + W - 1 < total ? s[p + W - 1] : 0;
      acc = (acc - s[p - 1] * top) * sigma + incoming;
      key[p] = static_cast<int32_t>(acc);
    }
  }
  std::vector<int32_t> idx(total), tmp(total), hist;
  for (int32_t g = 0; g < total; ++g) idx[g] = g;
  radix_pass(key.data(), 0, idx, tmp, hist);
  radix_pass(key.data(), 16, idx, tmp, hist);
  std::vector<int32_t> rank(total);
  std::vector<int32_t> run_lo, run_hi;
  {
    int32_t gs = 0;
    for (int32_t i = 1; i <= total; ++i) {
      if (i == total || key[idx[i]] != key[idx[gs]]) {
        for (int32_t j = gs; j < i; ++j) rank[idx[j]] = gs;
        if (i - gs > 1) {
          run_lo.push_back(gs);
          run_hi.push_back(i - 1);
        }
        gs = i;
      }
    }
  }
  int32_t window = W;
  std::vector<std::pair<int32_t, int32_t>> run_buf;
  std::vector<int32_t> run_g, new_lo, new_hi;
  while (window < total && !run_lo.empty()) {
    new_lo.clear();
    new_hi.clear();
    for (size_t r = 0; r < run_lo.size(); ++r) {
      const int32_t lo = run_lo[r], hi = run_hi[r];
      const int32_t L = hi - lo + 1;
      run_buf.resize(L);
      run_g.resize(L);
      for (int32_t e = 0; e < L; ++e) {
        const int32_t g = idx[lo + e];
        run_g[e] = g;
        const int32_t adv = g + window;
        run_buf[e] = {adv < total ? rank[adv] : -1, e};
      }
      std::sort(run_buf.begin(), run_buf.end());
      for (int32_t e = 0; e < L; ++e) idx[lo + e] = run_g[run_buf[e].second];
      int32_t e0 = 0;
      for (int32_t e = 1; e <= L; ++e) {
        if (e == L || run_buf[e].first != run_buf[e0].first) {
          for (int32_t j = e0; j < e; ++j) rank[idx[lo + j]] = lo + e0;
          if (e - e0 > 1) {
            new_lo.push_back(lo + e0);
            new_hi.push_back(lo + e - 1);
          }
          e0 = e;
        }
      }
    }
    run_lo.swap(new_lo);
    run_hi.swap(new_hi);
    window <<= 1;
  }
  // every suffix distinct (unique separators) -> rank is the exact sorted
  // position; standard Kasai for the LCPs
  std::memcpy(sa, idx.data(), sizeof(int32_t) * total);
  lcp[0] = 0;
  {
    int32_t h = 0;
    for (int32_t g = 0; g < total; ++g) {
      const int32_t i = rank[g];
      if (i > 0) {
        const int32_t y = sa[i - 1];
        const int32_t cap = total - (g > y ? g : y);
        if (h > cap) h = cap;
        while (h < cap && s[g + h] == s[y + h]) ++h;
        lcp[i] = h;
      } else {
        h = 0;
      }
      if (h > 0) --h;
    }
  }
  return 0;
}

}  // extern "C"
