// Native host-runtime kernels for marginalign_trna_tpu.
//
// The reference framework's host-side hot loops live in C (sonLib, cPecan
// drivers); here the TPU does the DP compute and the native layer covers
// the sequential host work that Python is slow at:
//   - banded DP tracebacks (guide Viterbi 3-state pointers, MEA 2-bit moves)
//   - colinear seed chaining (O(h^2) DP over k-mer hits)
//   - band-offset monotonisation and banded-batch packing helpers
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// Fetch one pointer cell from a [D1, Wp_arr, B]-strided array that packs
// (8 / bits) cells per byte along the band dimension (device-side pack:
// row k lives in byte k / per, bit offset (k % per) * bits).  bits == 8 is
// the legacy unpacked layout.  Bit-packing exists because device-to-host
// on the remote-PJRT tunnel measures ~30MB/s — the pointer pull was the
// realign/guide wall once compute went device-side.
static inline uint8_t fetch_cell(
    const uint8_t* ptr, int64_t d, int64_t k,
    int64_t wp_arr, int64_t b_stride, int64_t lane, int32_t bits) {
  if (bits == 8) return ptr[(d * wp_arr + k) * b_stride + lane];
  int64_t per = 8 / bits;
  uint8_t byte = ptr[(d * wp_arr + k / per) * b_stride + lane];
  return (byte >> ((k % per) * bits)) & ((1 << bits) - 1);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- traceback

// Guide Viterbi traceback.  pointers: [D1, Wp_arr, B] uint8 holding
// (8 / bits) cells per byte (ptrM | ptrIx<<2 | ptrIy<<3 per cell);
// lo: [D1] int32 band offsets for this lane.  Emits ops (0=M, 1=I, 2=D)
// reversed into out_ops; returns count, or -1 on error/overflow.
int64_t nw_traceback_b(
    const uint8_t* pointers, const int32_t* lo,
    int64_t d1, int64_t wp_arr, int64_t b_stride, int64_t lane,
    int64_t m, int64_t n, int32_t final_state, int32_t bits,
    uint8_t* out_ops, int64_t max_ops) {
  int64_t i = m, j = n;
  int64_t wp = wp_arr * (8 / bits);
  int state = final_state;
  int64_t count = 0;
  while (!(i == 0 && j == 0)) {
    if (count >= max_ops) return -1;
    if (state == 0 && (i == 0 || j == 0)) {
      state = (i == 0) ? 1 : 2;  // degenerate edge: fall back to gap states
      continue;
    }
    int64_t d = i + j;
    int64_t k = i - lo[d];
    if (k < 0 || k >= wp || d < 0 || d >= d1) return -1;
    uint8_t p = fetch_cell(pointers, d, k, wp_arr, b_stride, lane, bits);
    if (state == 0) {
      out_ops[count++] = 0;
      state = p & 0x3;
      --i;
      --j;
    } else if (state == 1) {  // Ix: ref consumed, deletion in read
      out_ops[count++] = 2;
      state = ((p >> 2) & 1) ? 1 : 0;
      --j;
    } else {  // Iy: read consumed, insertion
      out_ops[count++] = 1;
      state = ((p >> 3) & 1) ? 2 : 0;
      --i;
    }
    if (i < 0 || j < 0) return -1;
  }
  return count;
}

int64_t nw_traceback(
    const uint8_t* pointers, const int32_t* lo,
    int64_t d1, int64_t wp, int64_t b_stride, int64_t lane,
    int64_t m, int64_t n, int32_t final_state,
    uint8_t* out_ops, int64_t max_ops) {
  return nw_traceback_b(pointers, lo, d1, wp, b_stride, lane, m, n,
                        final_state, 8, out_ops, max_ops);
}

// MEA traceback.  Cells are 0=diag, 1=left/ref, 2=up; bits as above.
int64_t mea_traceback_b(
    const uint8_t* pointers, const int32_t* lo,
    int64_t d1, int64_t wp_arr, int64_t b_stride, int64_t lane,
    int64_t m, int64_t n, int32_t bits,
    uint8_t* out_ops, int64_t max_ops) {
  int64_t i = m, j = n;
  int64_t wp = wp_arr * (8 / bits);
  int64_t count = 0;
  while (!(i == 0 && j == 0)) {
    if (count >= max_ops) return -1;
    if (i == 0) {
      out_ops[count++] = 2;
      --j;
      continue;
    }
    if (j == 0) {
      out_ops[count++] = 1;
      --i;
      continue;
    }
    int64_t d = i + j;
    int64_t k = i - lo[d];
    if (k < 0 || k >= wp || d >= d1) return -1;
    uint8_t p = fetch_cell(pointers, d, k, wp_arr, b_stride, lane, bits);
    if (p == 0) {
      out_ops[count++] = 0;
      --i;
      --j;
    } else if (p == 1) {
      out_ops[count++] = 2;
      --j;
    } else {
      out_ops[count++] = 1;
      --i;
    }
    if (i < 0 || j < 0) return -1;
  }
  return count;
}

int64_t mea_traceback(
    const uint8_t* pointers, const int32_t* lo,
    int64_t d1, int64_t wp, int64_t b_stride, int64_t lane,
    int64_t m, int64_t n,
    uint8_t* out_ops, int64_t max_ops) {
  return mea_traceback_b(pointers, lo, d1, wp, b_stride, lane, m, n, 8,
                         out_ops, max_ops);
}

// ----------------------------------------------------------------- chaining

// Best colinear chain over seed hits sorted by (r, q).  Scores = chain
// length; constraints mirror align/guide.chain_seeds.  Writes the selected
// hit indices (in chain order) to out_idx; returns chain length.
int64_t chain_seeds(
    const int64_t* q, const int64_t* r, int64_t h,
    int64_t max_gap2, int64_t max_drift,
    int64_t* out_idx, int64_t max_out) {
  if (h <= 0) return 0;
  std::vector<int64_t> score(h, 1), parent(h, -1);
  int64_t best = 0;
  for (int64_t i = 0; i < h; ++i) {
    for (int64_t j2 = 0; j2 < i; ++j2) {
      int64_t dq = q[i] - q[j2];
      int64_t dr = r[i] - r[j2];
      if (dq > 0 && dr > 0 && dq + dr <= max_gap2 &&
          std::abs(dq - dr) <= max_drift && score[j2] + 1 > score[i]) {
        score[i] = score[j2] + 1;
        parent[i] = j2;
      }
    }
    if (score[i] > score[best]) best = i;
  }
  std::vector<int64_t> chain;
  for (int64_t at = best; at >= 0; at = parent[at]) chain.push_back(at);
  int64_t len = static_cast<int64_t>(chain.size());
  if (len > max_out) return -1;
  for (int64_t t = 0; t < len; ++t) out_idx[t] = chain[len - 1 - t];
  return len;
}

// ------------------------------------------------------------ band packing

// Fill the banded per-diagonal symbol/validity arrays for one lane.
// Arrays are [D1, Wp, B]-strided; writes rows [0, m+n] for this lane.
void pack_band_lane(
    const int8_t* read_codes, int64_t m,
    const int8_t* ref_codes, int64_t n,
    const int32_t* lo, int64_t width,
    int64_t d1, int64_t wp, int64_t b_stride, int64_t lane,
    int8_t* xb, int8_t* yb, uint8_t* valid) {
  for (int64_t d = 0; d <= m + n; ++d) {
    for (int64_t k = 0; k < wp; ++k) {
      int64_t i = lo[d] + k;
      int64_t j = d - i;
      int64_t idx = (d * wp + k) * b_stride + lane;
      bool ok = k < width && i >= 0 && i <= m && i <= d && j >= 0 && j <= n;
      valid[idx] = ok ? 1 : 0;
      int64_t yi = std::min(std::max(i - 1, (int64_t)0), std::max(m - 1, (int64_t)0));
      int64_t xj = std::min(std::max(j - 1, (int64_t)0), std::max(n - 1, (int64_t)0));
      yb[idx] = m > 0 ? read_codes[yi] : 4;
      xb[idx] = n > 0 ? ref_codes[xj] : 4;
    }
  }
}

}  // extern "C"
