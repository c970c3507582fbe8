// Native fast ops for the morphik_core_tpu host data plane.
//
// C++ replacement for the reference's Rust L0 kernels
// (reference morphik_rust/src/{base64_ops,binary_ops,text_utils}.rs):
// base64 encode/decode, control-char cleaning, whitespace token
// counting/normalization, packed-bit Hamming distances. Exposed as a
// plain C ABI consumed via ctypes (no pybind11 in this environment).
//
// Build: make -C native   (produces libfastops.so)

#include <cctype>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- base64

static const char B64_TBL[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

// out must hold 4*((n+2)/3) bytes; returns bytes written
size_t b64_encode(const uint8_t* in, size_t n, char* out) {
  size_t o = 0, i = 0;
  for (; i + 2 < n; i += 3) {
    uint32_t v = (in[i] << 16) | (in[i + 1] << 8) | in[i + 2];
    out[o++] = B64_TBL[(v >> 18) & 63];
    out[o++] = B64_TBL[(v >> 12) & 63];
    out[o++] = B64_TBL[(v >> 6) & 63];
    out[o++] = B64_TBL[v & 63];
  }
  if (i < n) {
    uint32_t v = in[i] << 16;
    bool two = (i + 1 < n);
    if (two) v |= in[i + 1] << 8;
    out[o++] = B64_TBL[(v >> 18) & 63];
    out[o++] = B64_TBL[(v >> 12) & 63];
    out[o++] = two ? B64_TBL[(v >> 6) & 63] : '=';
    out[o++] = '=';
  }
  return o;
}

// out must hold 3*(n/4)+3; returns bytes written, or (size_t)-1 on bad input
size_t b64_decode(const char* in, size_t n, uint8_t* out) {
  static int8_t rev[256];
  static bool init = false;
  if (!init) {
    memset(rev, -1, sizeof(rev));
    for (int i = 0; i < 64; i++) rev[(uint8_t)B64_TBL[i]] = (int8_t)i;
    init = true;
  }
  size_t o = 0;
  uint32_t buf = 0;
  int bits = 0;
  for (size_t i = 0; i < n; i++) {
    char c = in[i];
    if (c == '=' || c == '\n' || c == '\r') continue;
    int8_t v = rev[(uint8_t)c];
    if (v < 0) return (size_t)-1;
    buf = (buf << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out[o++] = (uint8_t)(buf >> bits);
    }
  }
  return o;
}

// --------------------------------------------------------------- text utils

// Remove ASCII control chars except \n \t \r (UTF-8 passthrough).
size_t clean_control_chars(const char* in, size_t n, char* out) {
  size_t o = 0;
  for (size_t i = 0; i < n; i++) {
    uint8_t c = (uint8_t)in[i];
    if (c < 0x20 && c != '\n' && c != '\t' && c != '\r') continue;
    if (c == 0x7f) continue;
    out[o++] = (char)c;
  }
  return o;
}

size_t count_tokens_whitespace(const char* in, size_t n) {
  size_t count = 0;
  bool in_tok = false;
  for (size_t i = 0; i < n; i++) {
    uint8_t c = (uint8_t)in[i];
    bool ws = (c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\f' || c == '\v');
    if (!ws && !in_tok) { count++; in_tok = true; }
    if (ws) in_tok = false;
  }
  return count;
}

// Collapse whitespace runs into single spaces; trim ends.
size_t normalize_whitespace(const char* in, size_t n, char* out) {
  size_t o = 0;
  bool pending = false;
  for (size_t i = 0; i < n; i++) {
    uint8_t c = (uint8_t)in[i];
    bool ws = (c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\f' || c == '\v');
    if (ws) { pending = (o > 0); continue; }
    if (pending) { out[o++] = ' '; pending = false; }
    out[o++] = (char)c;
  }
  return o;
}

// --------------------------------------------------------------- binary ops

// a: (len,) packed bits; b: (nb, len); out: (nb,)
void hamming_distance_batch(const uint8_t* a, const uint8_t* b, size_t nb,
                            size_t len, uint32_t* out) {
  for (size_t r = 0; r < nb; r++) {
    const uint8_t* row = b + r * len;
    uint32_t acc = 0;
    size_t i = 0;
    for (; i + 8 <= len; i += 8) {
      uint64_t x, y;
      memcpy(&x, a + i, 8);
      memcpy(&y, row + i, 8);
      acc += (uint32_t)__builtin_popcountll(x ^ y);
    }
    for (; i < len; i++) acc += (uint32_t)__builtin_popcount((uint32_t)(a[i] ^ row[i]));
    out[r] = acc;
  }
}

// f32 (rows, dim) -> packed MSB-first bits (rows, dim/8), bit = v > 0
void binary_quantize_packed(const float* in, size_t rows, size_t dim, uint8_t* out) {
  size_t stride = dim / 8;
  for (size_t r = 0; r < rows; r++) {
    const float* row = in + r * dim;
    uint8_t* orow = out + r * stride;
    for (size_t b = 0; b < stride; b++) {
      uint8_t byte = 0;
      for (int k = 0; k < 8; k++) byte = (uint8_t)((byte << 1) | (row[b * 8 + k] > 0.0f ? 1 : 0));
      orow[b] = byte;
    }
  }
}

}  // extern "C"

// ------------------------------------------------------------------ chunking
//
// Recursive character text splitting — the native port of the
// reference's morphik_rust/src/chunking.rs (separators
// ["\n\n", "\n", ". ", " ", ""], chunk budget, overlap tail carried
// into the next chunk). Exact behavioral parity with
// morphik_core_tpu/parser/text_splitter.py for ASCII input (the shim
// routes non-ASCII through the Python path, where "character" means
// code point, not byte).

namespace {

const char* kSeparators[] = {"\n\n", "\n", ". ", " "};
constexpr int kNumSeps = 4;

struct Range { size_t off, len; };

// Recursively split [off, off+len) until every piece fits chunk_size.
// Pieces are ranges of the ORIGINAL buffer (part + separator is always
// a contiguous original substring), so splitting is zero-copy.
void split_rec(const char* s, size_t off, size_t len, int sep_idx,
               size_t chunk_size, std::vector<Range>& out) {
  if (len <= chunk_size) {
    if (len) out.push_back({off, len});
    return;
  }
  if (sep_idx >= kNumSeps) {  // "" separator: fixed-size character slices
    for (size_t i = 0; i < len; i += chunk_size)
      out.push_back({off + i, len - i < chunk_size ? len - i : chunk_size});
    return;
  }
  const char* sep = kSeparators[sep_idx];
  size_t sep_len = sep[1] ? 2 : 1;
  size_t start = off, end = off + len;
  bool found_any = false;
  size_t i = off;
  while (i + sep_len <= end) {
    if (s[i] == sep[0] && (sep_len == 1 || s[i + 1] == sep[1])) {
      found_any = true;
      size_t keep_len = i + sep_len - start;  // part + separator
      if (keep_len) {
        if (keep_len <= chunk_size) out.push_back({start, keep_len});
        else split_rec(s, start, keep_len, sep_idx + 1, chunk_size, out);
      }
      start = i + sep_len;
      i = start;
    } else {
      i++;
    }
  }
  if (!found_any) {  // no separator at this level: descend directly
    split_rec(s, off, len, sep_idx + 1, chunk_size, out);
    return;
  }
  size_t tail = end - start;  // final part, no separator appended
  if (tail) {
    if (tail <= chunk_size) out.push_back({start, tail});
    else split_rec(s, start, tail, sep_idx + 1, chunk_size, out);
  }
}

bool all_space(const char* s, size_t n) {
  for (size_t i = 0; i < n; i++)
    if (!std::isspace(static_cast<unsigned char>(s[i]))) return false;
  return true;
}

}  // namespace

extern "C" {

// Split `in` into chunks. Chunk bytes are written concatenated into
// `out` (capacity `out_cap`), per-chunk byte lengths into `lens`.
// Returns the chunk count, or (size_t)-1 if max_chunks or out_cap
// would be exceeded (caller falls back to Python).
size_t split_text(const char* in, size_t n, size_t chunk_size, size_t overlap,
                  char* out, size_t out_cap, long long* lens, size_t max_chunks) {
  if (n == 0) return 0;
  if (n <= chunk_size) {
    if (out_cap < n || max_chunks < 1) return static_cast<size_t>(-1);
    std::memcpy(out, in, n);
    lens[0] = static_cast<long long>(n);
    return 1;
  }
  std::vector<Range> pieces;
  split_rec(in, 0, n, 0, chunk_size, pieces);

  // greedy merge with overlap tail (text_splitter.py::_merge)
  std::string cur;
  char* w = out;
  size_t written = 0;
  size_t count = 0;
  auto emit = [&](const std::string& c) -> bool {
    if (count >= max_chunks || written + c.size() > out_cap) return false;
    std::memcpy(w, c.data(), c.size());
    w += c.size();
    written += c.size();
    lens[count++] = static_cast<long long>(c.size());
    return true;
  };
  for (const Range& r : pieces) {
    if (!cur.empty() && cur.size() + r.len > chunk_size) {
      if (!emit(cur)) return static_cast<size_t>(-1);
      // trim the overlap tail so tail+piece honors the chunk budget
      // (parity with text_splitter.py::_merge)
      size_t room = chunk_size > r.len ? chunk_size - r.len : 0;
      size_t keep = overlap < room ? overlap : room;
      if (keep && keep < cur.size()) cur = cur.substr(cur.size() - keep);
      else if (keep >= cur.size()) { /* keep whole cur */ }
      else cur.clear();
    }
    cur.append(in + r.off, r.len);
  }
  if (!cur.empty() && !all_space(cur.data(), cur.size())) {
    if (!emit(cur)) return static_cast<size_t>(-1);
  }
  return count;
}

}  // extern "C"
