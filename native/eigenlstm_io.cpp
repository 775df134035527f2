// Native IO runtime for eigen_lstm_tpu — the TPU-native equivalent of the
// reference's C++ L0 layer (SURVEY.md §1): corpus reading
// (rawread, /root/reference/lstm.cc:382-420), host-side window batching
// (class_batch/lstm.cc:279-302), and the text matrix checkpoint codec
// (class_CUDA/io.h:16-81).
//
// The TPU training path batches on-device (data/corpus.py); this library
// serves host-side pipelines: mmap'd zero-copy corpus access for files too
// big to eagerly load, fast window assembly for per-host data feeding, and a
// strtod-based parser for the reference's large text checkpoints (the
// shipped enwik8 N=256 checkpoint is ~10 MB of ASCII floats; np.loadtxt is
// ~40x slower).
//
// Exposed via ctypes (eigen_lstm_tpu/utils/native.py) — no pybind11 in the
// build image. Build: make -C native (g++ -O3 -shared -fPIC).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------- corpus loading ----------

// mmap a file read-only; returns pointer or nullptr, size via *size_out.
void* elio_mmap(const char* path, int64_t* size_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return nullptr;
  }
  void* p = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return nullptr;
  madvise(p, (size_t)st.st_size, MADV_WILLNEED);
  *size_out = (int64_t)st.st_size;
  return p;
}

void elio_munmap(void* p, int64_t size) {
  if (p) munmap(p, (size_t)size);
}

// Whole-file read into caller-owned buffer (rawread equivalent).
// Returns bytes read, or -1 on error; -2 if buffer too small (size via stat).
int64_t elio_read_file(const char* path, uint8_t* buf, int64_t buf_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
  long sz = ftell(f);
  if (sz < 0) { fclose(f); return -1; }
  if (sz > buf_size) { fclose(f); return -2; }
  rewind(f);
  size_t got = fread(buf, 1, (size_t)sz, f);
  fclose(f);
  return (int64_t)got;
}

int64_t elio_file_size(const char* path) {
  struct stat st;
  if (stat(path, &st) != 0) return -1;
  return (int64_t)st.st_size;
}

// ---------- window batching (host-side) ----------

// Fill x_out/t_out, each (seq, batch) int32 row-major [s*batch + b], with
// the byte windows starting at positions[b] and their next-byte targets —
// the ev_x/ev_t pairs of class_batch/lstm.cc:279-284.
// Requires positions[b] + seq + 1 <= len. Returns 0 on success, -1 on a
// position out of range.
int elio_build_windows(const uint8_t* corpus, int64_t len,
                       const int32_t* positions, int32_t batch, int32_t seq,
                       int32_t* x_out, int32_t* t_out) {
  for (int32_t b = 0; b < batch; ++b) {
    int64_t pos = positions[b];
    if (pos < 0 || pos + seq + 1 > len) return -1;
    const uint8_t* w = corpus + pos;
    for (int32_t s = 0; s < seq; ++s) {
      x_out[(int64_t)s * batch + b] = (int32_t)w[s];
      t_out[(int64_t)s * batch + b] = (int32_t)w[s + 1];
    }
  }
  return 0;
}

// Advance cursors by stride, wrapping at EOF (class_batch/lstm.cc:297-300
// semantics with window-start positions). wrapped_out[b] = 1 if stream b
// wrapped (caller resets its recurrent state).
void elio_advance_positions(int32_t* positions, int32_t batch, int32_t stride,
                            int64_t len, int32_t seq, uint8_t* wrapped_out) {
  int64_t limit = len - seq - 1;
  if (limit < 1) limit = 1;
  for (int32_t b = 0; b < batch; ++b) {
    int64_t nxt = (int64_t)positions[b] + stride;
    if (nxt > limit) {
      wrapped_out[b] = 1;
      nxt = nxt % limit;
    } else {
      wrapped_out[b] = 0;
    }
    positions[b] = (int32_t)nxt;
  }
}

// One-hot encode a (seq, batch) id matrix into (seq, batch, vocab) float32 —
// the reference's codes-matrix gather (root lstm.cc:129,169) for host-side
// consumers that want explicit one-hot.
void elio_one_hot(const int32_t* ids, int32_t seq, int32_t batch,
                  int32_t vocab, float* out) {
  memset(out, 0, sizeof(float) * (size_t)seq * batch * vocab);
  for (int64_t i = 0; i < (int64_t)seq * batch; ++i) {
    int32_t v = ids[i];
    if (v >= 0 && v < vocab) out[i * vocab + v] = 1.0f;
  }
}

// ---------- reference text matrix codec (io.h format) ----------

// Parse whitespace-separated floats from a text file into out[0..max).
// Returns the number parsed, or -1 on open failure, or -(2+n) if more than
// max values exist (n values were parsed before overflow).
int64_t elio_parse_floats(const char* path, double* out, int64_t max) {
  int64_t size = 0;
  void* p = elio_mmap(path, &size);
  if (!p) return -1;
  const char* s = (const char*)p;
  const char* end = s + size;
  int64_t n = 0;
  while (s < end) {
    // skip whitespace
    while (s < end && (*s == ' ' || *s == '\n' || *s == '\r' || *s == '\t'))
      ++s;
    if (s >= end) break;
    char* next = nullptr;
    double v = strtod(s, &next);
    if (next == s) break;  // unparseable tail
    if (n >= max) {
      elio_munmap(p, size);
      return -(2 + n);
    }
    out[n++] = v;
    s = next;
  }
  elio_munmap(p, size);
  return n;
}

// Write a (rows, cols) double matrix as the reference's row-per-line text
// (io.h:16-32). Returns 0 on success.
int elio_write_matrix(const char* path, const double* data, int64_t rows,
                      int64_t cols) {
  FILE* f = fopen(path, "w");
  if (!f) return -1;
  char buf[64];
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t c = 0; c < cols; ++c) {
      int len = snprintf(buf, sizeof(buf), "%.10g", data[r * cols + c]);
      fwrite(buf, 1, (size_t)len, f);
      fputc(c + 1 < cols ? ' ' : '\n', f);
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
