// Native JSON array serializer for the payload writers.
//
// The reference emits its artifacts with MATLAB's jsonencode
// (radar_processing.m:315,364,392,425,590) — a closed-source native
// encoder. This is the framework's native equivalent for the hot part:
// multi-million-element float matrices (spectrogram intensity is
// 1024 x T). The Python path (ndarray.tolist() + json.dumps) boxes every
// element into a PyFloat; this renders the whole matrix into one buffer
// in a single pass, with CPython-compatible semantics:
//
//   * shortest round-trip formatting via std::to_chars (Ryu), re-rendered
//     with CPython repr notation rules — output is byte-identical to what
//     json.dumps would produce;
//   * NaN/±Inf → null (MATLAB jsonencode rule, utils/jsonio.py);
//   * pretty mode reproduces json.dumps(indent=2) layout exactly
//     (each element on its own line, 2-space indent steps).
//
// C ABI for ctypes (no pybind11 in the deployment image).

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Shortest round-trip decimal for v into buf; returns length.
// Mirrors CPython repr: shortest significant-digit count (one
// std::to_chars call — Ryu, exact), fixed notation for decimal exponents
// in [-4, 16), scientific otherwise, integral values keep a ".0" suffix
// ("206.0"), "1e+20"/"1e-05" style exponents (to_chars already pads the
// exponent to two digits like CPython).
int format_double(double v, char* buf, int cap) {
  char tmp[48];
  auto res = std::to_chars(tmp, tmp + sizeof(tmp), v,
                           std::chars_format::scientific);
  *res.ptr = '\0';
  char* e = strchr(tmp, 'e');
  int exp10 = atoi(e + 1);
  int digits = int(e - tmp) - (tmp[0] == '-' ? 1 : 0)
               - (memchr(tmp, '.', e - tmp) != nullptr ? 1 : 0);
  if (cap < 44) return -1;  // worst fixed case: sign + 16 int + '.' + 17 frac
  if (exp10 < -4 || exp10 >= 16) {
    int n = int(res.ptr - tmp);
    if (n >= cap) return -1;
    memcpy(buf, tmp, n + 1);
    return n;
  }
  // Fixed notation straight from the digit string (no second snprintf).
  char digs[20];
  int d = 0;
  for (const char* p = tmp + (tmp[0] == '-' ? 1 : 0); p < e; ++p)
    if (*p != '.') digs[d++] = *p;
  char* o = buf;
  if (tmp[0] == '-') *o++ = '-';
  if (exp10 >= 0) {
    int ip = exp10 + 1;  // integer-part digit count
    for (int i = 0; i < ip; ++i) *o++ = i < d ? digs[i] : '0';
    *o++ = '.';
    if (d > ip) { memcpy(o, digs + ip, d - ip); o += d - ip; }
    else *o++ = '0';
  } else {
    *o++ = '0';
    *o++ = '.';
    for (int i = 0; i < -exp10 - 1; ++i) *o++ = '0';
    memcpy(o, digs, d);
    o += d;
  }
  *o = '\0';
  (void)digits;
  return int(o - buf);
}

struct Writer {
  char* out;
  int64_t cap;
  int64_t pos = 0;
  bool overflow = false;

  void put(const char* s, int64_t n) {
    if (overflow || pos + n > cap) { overflow = true; return; }
    memcpy(out + pos, s, n);
    pos += n;
  }
  void putc_(char c) {
    if (overflow || pos + 1 > cap) { overflow = true; return; }
    out[pos++] = c;
  }
  void indent(int level) {
    for (int i = 0; i < level * 2; ++i) putc_(' ');
  }
  void value(double v) {
    if (!std::isfinite(v)) { put("null", 4); return; }
    char buf[48];
    int n = format_double(v, buf, sizeof(buf));
    if (n < 0) { overflow = true; return; }
    put(buf, n);
  }
};

void write_row(Writer& w, const double* a, int64_t n, int pretty, int level) {
  if (n == 0) { w.put("[]", 2); return; }
  w.putc_('[');
  for (int64_t i = 0; i < n; ++i) {
    if (i) w.putc_(',');
    if (pretty) { w.putc_('\n'); w.indent(level + 1); }
    else if (i) w.putc_(' ');
    w.value(a[i]);
  }
  if (pretty) { w.putc_('\n'); w.indent(level); }
  w.putc_(']');
}

}  // namespace

extern "C" {

// Serialize a float64 array as a JSON array.
//   a      : C-contiguous data
//   rows   : number of rows (for 1-D arrays: the length)
//   cols   : columns; 0 => 1-D array of `rows` elements
//   pretty : 1 => json.dumps(indent=2) layout; 0 => compact (", " sep)
//   level  : current indent depth in 2-space units (pretty only)
// Returns bytes written, or -1 on buffer overflow.
int64_t fmcw_json_f64_array(const double* a, int64_t rows, int64_t cols,
                            int pretty, int level, char* out, int64_t cap) {
  Writer w{out, cap};
  if (cols == 0) {
    write_row(w, a, rows, pretty, level);
  } else if (rows == 0) {
    w.put("[]", 2);
  } else {
    w.putc_('[');
    for (int64_t r = 0; r < rows; ++r) {
      if (r) w.putc_(',');
      if (pretty) { w.putc_('\n'); w.indent(level + 1); }
      else if (r) w.putc_(' ');
      write_row(w, a + r * cols, cols, pretty, level + 1);
    }
    if (pretty) { w.putc_('\n'); w.indent(level); }
    w.putc_(']');
  }
  return w.overflow ? -1 : w.pos;
}

}  // extern "C"
