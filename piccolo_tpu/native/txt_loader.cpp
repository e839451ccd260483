// Fast multithreaded whitespace-delimited float table parser.
//
// Native data-layer fast path for piccolo_tpu: the reference loads
// x y z r g b point-cloud text files through pandas.read_table
// (reference data_utils.py:30,150); clouds run to millions of rows and the
// Python parser dominates cold-start time.  This parser mmaps the file,
// splits it into per-thread chunks at newline boundaries, counts rows in a
// first parallel pass, prefix-sums the offsets, and parses in a second
// parallel pass with a branch-light decimal float scanner.
//
// C ABI (consumed via ctypes from piccolo_tpu/native/__init__.py):
//   ptxt_dims(path, &rows, &cols)  -> 0 on success
//   ptxt_parse(path, out, rows, cols) -> number of rows parsed (or -1)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open_file(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      return false;
    }
    size = static_cast<size_t>(st.st_size);
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      return false;
    }
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const char*>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

inline bool is_space(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// Parse one decimal float (optionally signed, optional exponent).
// Returns the advanced pointer; writes the value to *out.
inline const char* parse_double(const char* p, const char* end, double* out) {
  while (p < end && is_space(*p)) ++p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  double value = 0.0;
  while (p < end && *p >= '0' && *p <= '9') {
    value = value * 10.0 + (*p - '0');
    ++p;
  }
  if (p < end && *p == '.') {
    ++p;
    double scale = 0.1;
    while (p < end && *p >= '0' && *p <= '9') {
      value += (*p - '0') * scale;
      scale *= 0.1;
      ++p;
    }
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) {
      eneg = (*p == '-');
      ++p;
    }
    int ev = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      ev = ev * 10 + (*p - '0');
      ++p;
    }
    double factor = 1.0;
    double base = eneg ? 0.1 : 10.0;
    while (ev) {
      if (ev & 1) factor *= base;
      base *= base;
      ev >>= 1;
    }
    value *= factor;
  }
  *out = neg ? -value : value;
  return p;
}

size_t count_rows_range(const char* p, const char* end) {
  size_t rows = 0;
  while (p < end) {
    while (p < end && is_space(*p)) ++p;
    if (p < end && *p != '\n') ++rows;
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;  // skip newline
  }
  return rows;
}

void parse_range(const char* p, const char* end, double* out, long cols) {
  double* cursor = out;
  while (p < end) {
    while (p < end && is_space(*p)) ++p;
    if (p >= end) break;
    if (*p == '\n') {
      ++p;
      continue;
    }
    for (long c = 0; c < cols; ++c) {
      p = parse_double(p, end, cursor);
      ++cursor;
    }
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
}

// Split [begin, end) into n chunks whose boundaries land on newlines.
std::vector<const char*> chunk_bounds(const char* begin, const char* end, int n) {
  std::vector<const char*> bounds;
  bounds.push_back(begin);
  size_t total = static_cast<size_t>(end - begin);
  for (int i = 1; i < n; ++i) {
    const char* p = begin + total * i / n;
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
    bounds.push_back(p);
  }
  bounds.push_back(end);
  return bounds;
}

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

}  // namespace

extern "C" {

// Fill *rows / *cols with the table dimensions. Returns 0 on success.
int ptxt_dims(const char* path, long* rows, long* cols) {
  MappedFile mf;
  if (!mf.open_file(path)) return -1;
  const char* p = mf.data;
  const char* end = mf.data + mf.size;

  // column count from the first non-empty line
  const char* q = p;
  long ncols = 0;
  while (q < end && *q != '\n') {
    while (q < end && is_space(*q)) ++q;
    if (q < end && *q != '\n' && !is_space(*q)) {
      ++ncols;
      while (q < end && !is_space(*q) && *q != '\n') ++q;
    }
  }
  if (ncols == 0) return -1;

  int nt = hw_threads();
  auto bounds = chunk_bounds(p, end, nt);
  std::vector<size_t> counts(nt, 0);
  std::vector<std::thread> threads;
  for (int i = 0; i < nt; ++i) {
    threads.emplace_back([&, i] { counts[i] = count_rows_range(bounds[i], bounds[i + 1]); });
  }
  for (auto& t : threads) t.join();
  size_t total = 0;
  for (size_t c : counts) total += c;

  *rows = static_cast<long>(total);
  *cols = ncols;
  return 0;
}

// Parse the table into out (rows*cols doubles, row-major).
// Returns rows parsed, or -1 on failure.
long ptxt_parse(const char* path, double* out, long rows, long cols) {
  MappedFile mf;
  if (!mf.open_file(path)) return -1;
  const char* begin = mf.data;
  const char* end = mf.data + mf.size;

  int nt = hw_threads();
  auto bounds = chunk_bounds(begin, end, nt);

  // pass 1: rows per chunk -> output offsets
  std::vector<size_t> counts(nt, 0);
  {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; ++i) {
      threads.emplace_back([&, i] { counts[i] = count_rows_range(bounds[i], bounds[i + 1]); });
    }
    for (auto& t : threads) t.join();
  }
  std::vector<size_t> offsets(nt + 1, 0);
  for (int i = 0; i < nt; ++i) offsets[i + 1] = offsets[i] + counts[i];
  if (static_cast<long>(offsets[nt]) != rows) return -1;

  // pass 2: parse
  {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; ++i) {
      threads.emplace_back([&, i] {
        parse_range(bounds[i], bounds[i + 1], out + offsets[i] * cols, cols);
      });
    }
    for (auto& t : threads) t.join();
  }
  return rows;
}

}  // extern "C"
