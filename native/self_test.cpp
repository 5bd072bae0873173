// Sanitizer self-test for the native runtime (fmcw_io + fmcw_json).
//
// The reference has no native code and no sanitizers (SURVEY §5.2); this
// framework ships native components, so it ships their race/memory-safety
// harness too. Built by tests/test_native_sanitize.py with
// -fsanitize=address,undefined and executed as a standalone binary: any
// out-of-bounds read/write, leak, or UB in the native layer fails CI.
//
// Exit code 0 = all checks passed.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int fmcw_parse_header(const char* path, uint32_t* out);
int fmcw_read_calib(const char* path, uint32_t rx, float* out);
int fmcw_read_frames_pair(const char* path, uint32_t start, uint32_t count,
                          uint32_t rx, float* out);
int fmcw_calib_vector_pair(const char* path, uint32_t rx, uint32_t nts,
                           float* out);
int64_t fmcw_json_f64_array(const double* a, int64_t rows, int64_t cols,
                            int pretty, int level, char* out, int64_t cap);
}

#define CHECK(cond)                                                       \
  do {                                                                    \
    if (!(cond)) {                                                        \
      fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);     \
      return 1;                                                           \
    }                                                                     \
  } while (0)

namespace {

// Write a tiny valid recording: 2 frames, 2 rx, n_cal=8, pn=2, nts=4, complex.
std::string write_recording(bool complex_data) {
  std::string path = std::string(getenv("TMPDIR") ? getenv("TMPDIR") : "/tmp")
                     + "/fmcw_selftest.raw.bin";
  FILE* f = fopen(path.c_str(), "wb");
  const uint32_t fields[7] = {1, 2, 2, 8, 2, 4, complex_data ? 1u : 0u};
  fwrite("FMCWTPU0", 1, 8, f);
  fwrite(fields, 4, 7, f);
  // calib: 2 rx * 2 blocks * 8 floats
  for (int i = 0; i < 2 * 2 * 8; ++i) {
    float v = float(i) * 0.5f;
    fwrite(&v, 4, 1, f);
  }
  // frames: [frame][rx][pn][nts] * (2 if complex)
  int vals = 2 * 2 * 2 * 4 * (complex_data ? 2 : 1);
  for (int i = 0; i < vals; ++i) {
    float v = float(i);
    fwrite(&v, 4, 1, f);
  }
  fclose(f);
  return path;
}

int test_io() {
  for (int c = 0; c <= 1; ++c) {
    std::string path = write_recording(c != 0);
    uint32_t hdr[7];
    CHECK(fmcw_parse_header(path.c_str(), hdr) == 0);
    CHECK(hdr[1] == 2 && hdr[2] == 2 && hdr[4] == 2 && hdr[5] == 4);
    CHECK(hdr[6] == uint32_t(c));

    std::vector<float> calib(2 * 8);
    CHECK(fmcw_read_calib(path.c_str(), 1, calib.data()) == 0);
    CHECK(calib[0] == 8.0f);  // rx1 block starts after rx0's 16 floats
    CHECK(fmcw_read_calib(path.c_str(), 2, calib.data()) == -5);  // bad rx

    std::vector<float> frames(2 * 2 * 4 * 2);  // [2 frames, pn, nts, 2]
    CHECK(fmcw_read_frames_pair(path.c_str(), 0, 2, 0, frames.data()) == 0);
    if (c) CHECK(frames[0] == 0.0f && frames[1] == 1.0f);  // interleaved IQ
    else CHECK(frames[0] == 0.0f && frames[1] == 0.0f);    // imag zeroed
    CHECK(fmcw_read_frames_pair(path.c_str(), 1, 2, 0, frames.data()) == -5);

    std::vector<float> cv(4 * 2);
    CHECK(fmcw_calib_vector_pair(path.c_str(), 0, 4, cv.data()) == 0);

    // Truncated file → clean error, no OOB.
    FILE* f = fopen(path.c_str(), "wb");
    fwrite("FMCWTPU0", 1, 8, f);
    fclose(f);
    CHECK(fmcw_parse_header(path.c_str(), hdr) == -2);
    remove(path.c_str());
  }
  return 0;
}

int test_json() {
  const double vals[6] = {1.0, -0.5, 0.0, 1e300, NAN, INFINITY};
  char out[4096];
  // 2-D pretty + compact
  for (int pretty = 0; pretty <= 1; ++pretty) {
    int64_t n = fmcw_json_f64_array(vals, 2, 3, pretty, 1, out, sizeof(out));
    CHECK(n > 0);
    out[n] = '\0';
    CHECK(strstr(out, "null") != nullptr);
    CHECK(out[0] == '[' && out[n - 1] == ']');
  }
  // 1-D
  CHECK(fmcw_json_f64_array(vals, 6, 0, 0, 0, out, sizeof(out)) > 0);
  // empty shapes
  CHECK(fmcw_json_f64_array(vals, 0, 0, 1, 0, out, sizeof(out)) == 2);
  CHECK(fmcw_json_f64_array(vals, 0, 3, 1, 0, out, sizeof(out)) == 2);
  // overflow: capacity too small must return -1, never write past cap
  for (int64_t cap = 1; cap < 64; ++cap) {
    char small[64];
    memset(small, 0x7f, sizeof(small));
    int64_t n = fmcw_json_f64_array(vals, 2, 3, 1, 1, small, cap);
    CHECK(n == -1 || n <= cap);
    for (int64_t i = cap; i < 64; ++i) CHECK(small[i] == 0x7f);
  }
  return 0;
}

}  // namespace

int main() {
  if (test_io()) return 1;
  if (test_json()) return 1;
  printf("native self-test: all checks passed\n");
  return 0;
}
