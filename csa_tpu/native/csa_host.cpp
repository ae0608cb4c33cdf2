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

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int MATCH = 1;
constexpr int DOUBLEGAP = 0;
constexpr int MISMATCH = -1;
constexpr int INDEL = -1;
constexpr int GAP = 4;
constexpr int8_t D_DIAG = 0;
constexpr int8_t D_LEFT = 1;
constexpr int8_t D_UP = 2;
}  // namespace

extern "C" {

// Profile NW fill.  row_codes: R entries in [0,4); sv: (C,5) int32
// row-major counts; i: number of previously aligned sequences.
// top_row: C+1 boundary values for dp[0][*]; edge_rowgap: per-row scale
// for dp[j][0] = j * edge_rowgap.  These are passed in because the
// reference reuses its DP matrix across merges without re-initializing
// the boundaries (dynamicprogramming.c:957-987), so they may be STALE
// values from the allocating merge — reproduced for parity.
// dirs out: (R+1)*(C+1) int8, row-major.  Returns dp[R][C].
int32_t csa_dp_fill(const int8_t* row_codes, int32_t R,
                    const int32_t* sv, int32_t C, int32_t i,
                    const int32_t* top_row, int32_t edge_rowgap,
                    int8_t* dirs) {
  const int32_t rowgap = INDEL * i;
  std::vector<int32_t> prev(C + 1), cur(C + 1);
  std::vector<int32_t> colgap(C + 1);
  dirs[0] = D_DIAG;
  for (int32_t c = 1; c <= C; ++c) {
    const int32_t g = sv[(c - 1) * 5 + GAP];
    colgap[c] = DOUBLEGAP * g + INDEL * (i - g);
    dirs[c] = D_LEFT;
  }
  for (int32_t c = 0; c <= C; ++c) prev[c] = top_row[c];
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
  // m1/d1 precompute: max(diag, up) with the diag-preferred tie-break is
  // vectorizable; only the left-extension chain stays serial.  Tie-break
  // equivalence with the reference (diag >= up >= left preference):
  // left wins over m1 iff left > m1, or left == m1 and m1 came from up.
  std::vector<int32_t> m1(C + 1);
  std::vector<int8_t> d1(C + 1);
  for (int32_t j = 1; j <= R; ++j) {
    const int32_t* subrow = subcol.data() + (int64_t)row_codes[j - 1] * C;
    int8_t* drow = dirs + (int64_t)j * (C + 1);
    drow[0] = D_UP;
    cur[0] = j * edge_rowgap;
    const int32_t* pv = prev.data();
    int32_t* m1p = m1.data();
    int8_t* d1p = d1.data();
    for (int32_t c = 1; c <= C; ++c) {
      const int32_t diag = pv[c - 1] + subrow[c - 1];
      const int32_t up = pv[c] + rowgap;
      const bool dwin = diag >= up;
      m1p[c] = dwin ? diag : up;
      d1p[c] = dwin ? D_DIAG : D_UP;
    }
    int32_t left_val = cur[0];
    int32_t* cu = cur.data();
    const int32_t* cg = colgap.data();
    for (int32_t c = 1; c <= C; ++c) {
      const int32_t left = left_val + cg[c];
      const int32_t m = m1p[c];
      const bool take_left = (left > m) | ((left == m) & (d1p[c] == D_UP));
      left_val = take_left ? left : m;
      cu[c] = left_val;
      drow[c] = take_left ? D_LEFT : d1p[c];
    }
    prev.swap(cur);
  }
  return prev[C];
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
