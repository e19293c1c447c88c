// COCO RLE codec — C++ fast path for instancesegmentation_tpu/data/rle.py.
//
// Replaces the pycocotools C extension the reference depends on
// (SURVEY.md §2.9: RLE encode/decode are the host-side native ops of the
// data/eval pipeline). Wire format: column-major run lengths starting
// with zeros, LEB128-style 6-bit chunks (char = 48 + chunk, continuation
// bit 0x20), counts delta-encoded against counts[i-2] for i >= 2.
//
// Build: make -C native   (produces librle.so; loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode an (h, w) row-major uint8 mask. Writes the compressed string to
// `out` (capacity out_cap) and returns its length, or -1 on overflow.
int rle_encode(const uint8_t* mask, int h, int w, char* out, int out_cap) {
  // run lengths in column-major order, starting with zeros
  std::vector<int64_t> counts;
  counts.reserve(256);
  uint8_t cur = 0;
  int64_t run = 0;
  for (int x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;
    for (int y = 0; y < h; ++y) {
      uint8_t v = col[(int64_t)y * w] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        counts.push_back(run);
        cur = v;
        run = 1;
      }
    }
  }
  counts.push_back(run);
  if (counts.empty()) counts.push_back((int64_t)h * w);

  int pos = 0;
  for (size_t i = 0; i < counts.size(); ++i) {
    int64_t x = counts[i];
    if (i >= 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      int chunk = (int)(x & 0x1f);
      x >>= 5;
      more = !((x == 0 && !(chunk & 0x10)) || (x == -1 && (chunk & 0x10)));
      if (more) chunk |= 0x20;
      if (pos >= out_cap) return -1;
      out[pos++] = (char)(chunk + 48);
    }
  }
  return pos;
}

// Decode a compressed count string into an (h*w,) uint8 buffer laid out
// ROW-major for the caller after transposing; we write column-major order
// linearly, i.e. out[k] is pixel (k % h, k / h). Python reshapes (w, h).T.
// Returns 0 on success, -1 on count overflow.
int rle_decode(const char* s, int h, int w, uint8_t* out) {
  const int64_t total = (int64_t)h * w;
  int64_t prev[2] = {0, 0};
  size_t n_counts = 0;
  int64_t pos = 0;
  uint8_t val = 0;
  for (const char* p = s; *p;) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      int c = *p - 48;
      if (*p == 0) return -1;
      x |= (int64_t)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      if (!more && (c & 0x10)) x |= ~((int64_t)0) << (5 * (k + 1));
      ++k;
    }
    if (n_counts >= 2) x += prev[n_counts & 1];
    prev[n_counts & 1] = x;
    ++n_counts;
    if (x < 0 || pos + x > total) {
      if (pos + x > total) x = total - pos;  // tolerate padded counts
      if (x < 0) return -1;
    }
    if (val) memset(out + pos, 1, (size_t)x);
    else memset(out + pos, 0, (size_t)x);
    pos += x;
    val ^= 1;
  }
  if (pos < total) memset(out + pos, 0, (size_t)(total - pos));
  return 0;
}

// Run-length-space intersection of two masks given as uncompressed COCO
// count arrays (alternating 0/1 run lengths, starting with zeros, over
// the same h*w pixel sequence). O(runs), never materializes pixels —
// the same trick pycocotools' C rleArea/rleIou uses.
static int64_t rle_intersection(const int64_t* a, int64_t na,
                                const int64_t* b, int64_t nb) {
  int64_t ka = 0, kb = 0;
  int va = 0, vb = 0;  // value of the current run (counts start with 0s)
  int64_t ca = (na > 0) ? a[0] : 0;
  int64_t cb = (nb > 0) ? b[0] : 0;
  int64_t inter = 0;
  for (;;) {
    while (ca == 0) {  // advance a (zero-length runs just toggle parity)
      if (++ka >= na) return inter;
      va ^= 1;
      ca = a[ka];
    }
    while (cb == 0) {
      if (++kb >= nb) return inter;
      vb ^= 1;
      cb = b[kb];
    }
    int64_t c = ca < cb ? ca : cb;
    if (va && vb) inter += c;
    ca -= c;
    cb -= c;
  }
}

// Pairwise mask IoU in RLE space (pycocotools mask.iou semantics:
// crowd gt -> intersection / area(dt)). Count arrays for the nd
// detections followed by the ng ground truths are concatenated in
// `counts`, indexed by offs/lens (element i spans
// counts[offs[i] .. offs[i]+lens[i])). Writes an (nd, ng) row-major
// double matrix to `out`.
void rle_iou(const int64_t* counts, const int64_t* offs, const int64_t* lens,
             int nd, int ng, const uint8_t* iscrowd, double* out) {
  std::vector<int64_t> area(nd + ng);
  for (int i = 0; i < nd + ng; ++i) {
    int64_t s = 0;
    for (int64_t k = 1; k < lens[i]; k += 2) s += counts[offs[i] + k];
    area[i] = s;
  }
  for (int d = 0; d < nd; ++d) {
    const int64_t* dc = counts + offs[d];
    for (int g = 0; g < ng; ++g) {
      const int64_t* gc = counts + offs[nd + g];
      int64_t inter = rle_intersection(dc, lens[d], gc, lens[nd + g]);
      int64_t denom = iscrowd[g] ? area[d]
                                 : area[d] + area[nd + g] - inter;
      out[(int64_t)d * ng + g] =
          denom > 0 ? (double)inter / (double)denom : 0.0;
    }
  }
}

}  // extern "C"
