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

}  // extern "C"
