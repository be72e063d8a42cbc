// Fast MatrixMarket (.mtx / .mtx.gz) reader for single-cell count matrices.
//
// Role: the reference delegates data ingestion to R/Bioconductor
// (SingleCellExperiment "counts" assays, reference R/preprocess.R:6-25).
// Real scRNA-seq pipelines feed CellRanger-style sparse MatrixMarket files,
// which are slow to parse in pure Python. This native loader provides:
//   - mmap + multi-threaded chunk parsing for plain .mtx
//   - zlib streaming for .mtx.gz
//   - direct scatter into a dense row-major (rows x cols) float64 buffer or
//     into COO triplet arrays
// exposed through a minimal C ABI consumed via ctypes
// (clonealign_tpu/io/mtx.py). No Python.h dependency.

#include <algorithm>
#include <atomic>
#include <cinttypes>
#include <cctype>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

struct Header {
  bool pattern = false;  // "pattern" matrices have no value column
  bool symmetric = false;
  bool skew = false;  // skew-symmetric: mirror with -v
  int64_t rows = 0, cols = 0, nnz = 0;
  size_t data_offset = 0;  // byte offset where triplets start (plain files)
};

void set_error(char* err, const char* msg) {
  if (err) {
    std::snprintf(err, 255, "%s", msg);
    err[255] = '\0';
  }
}

// Parse the banner + dimension line from a text buffer; returns false on
// malformed input.
bool parse_header(const char* buf, size_t len, Header* h, char* err) {
  size_t pos = 0;
  auto next_line = [&](std::string* line) -> bool {
    if (pos >= len) return false;
    size_t e = pos;
    while (e < len && buf[e] != '\n') e++;
    line->assign(buf + pos, e - pos);
    pos = (e < len) ? e + 1 : len;
    return true;
  };

  std::string line;
  if (!next_line(&line) || line.rfind("%%MatrixMarket", 0) != 0) {
    set_error(err, "not a MatrixMarket file (missing %%MatrixMarket banner)");
    return false;
  }
  {
    std::string lower(line);
    std::transform(lower.begin(), lower.end(), lower.begin(),
                   [](unsigned char c) { return std::tolower(c); });
    if (lower.find("coordinate") == std::string::npos) {
      set_error(err, "only coordinate (sparse) MatrixMarket supported");
      return false;
    }
    if (lower.find("complex") != std::string::npos ||
        lower.find("hermitian") != std::string::npos) {
      // complex entries have FOUR columns; parsing them as triplets would
      // silently misalign the token stream
      set_error(err, "complex/hermitian MatrixMarket not supported");
      return false;
    }
    h->pattern = lower.find("pattern") != std::string::npos;
    h->skew = lower.find("skew") != std::string::npos;
    h->symmetric = lower.find("symmetric") != std::string::npos || h->skew;
  }
  // skip comment lines
  while (next_line(&line)) {
    if (!line.empty() && line[0] != '%') break;
  }
  if (std::sscanf(line.c_str(), "%" SCNd64 " %" SCNd64 " %" SCNd64, &h->rows,
                  &h->cols, &h->nnz) != 3) {
    set_error(err, "malformed dimensions line");
    return false;
  }
  if (h->rows < 0 || h->cols < 0 || h->nnz < 0) {
    set_error(err, "negative dimensions");
    return false;
  }
  if (h->symmetric && h->rows != h->cols) {
    set_error(err, "symmetric matrix must be square");
    return false;
  }
  h->data_offset = pos;
  return true;
}

// Lock-free accumulate for concurrent duplicate coordinates (the spec says
// entries are unique, but scipy tolerates duplicates by summing — so must we).
// Uses the __atomic_* builtins directly on the object representation rather
// than reinterpret_casting double* to std::atomic<uint64_t>* (which assumes a
// matching layout and lock-free 8-byte atomics and is formally UB in C++17);
// the builtins operate on raw 8-byte storage, so the only requirement is the
// size/alignment match asserted below.
static_assert(sizeof(double) == sizeof(uint64_t) &&
                  alignof(double) >= alignof(uint64_t),
              "atomic_add_double requires 8-byte doubles");
inline void atomic_add_double(double* p, double v) {
  auto* bits = reinterpret_cast<uint64_t*>(p);
  uint64_t old_bits = __atomic_load_n(bits, __ATOMIC_RELAXED);
  for (;;) {
    double od;
    std::memcpy(&od, &old_bits, sizeof(double));
    const double nv = od + v;
    uint64_t new_bits;
    std::memcpy(&new_bits, &nv, sizeof(double));
    if (__atomic_compare_exchange_n(bits, &old_bits, new_bits, /*weak=*/true,
                                    __ATOMIC_RELAXED, __ATOMIC_RELAXED))
      return;
  }
}

// Parse triplets from [begin, end); calls emit(row0, col0, value).
// Returns parsed count, or -1 on malformed entry.
template <typename Emit>
int64_t parse_triplets(const char* p, const char* end, bool pattern,
                       Emit&& emit) {
  int64_t count = 0;
  while (p < end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
      p++;
    if (p >= end) break;
    char* q;
    errno = 0;
    long long r = std::strtoll(p, &q, 10);
    if (q == p) return -1;
    p = q;
    long long c = std::strtoll(p, &q, 10);
    if (q == p) return -1;
    p = q;
    double v = 1.0;
    if (!pattern) {
      v = std::strtod(p, &q);
      if (q == p) return -1;
      p = q;
    }
    if (r < 1 || c < 1) return -1;
    emit(r - 1, c - 1, v);
    count++;
  }
  return count;
}

// Memory-map a file; nullptr on failure.
struct Mapped {
  const char* data = nullptr;
  size_t len = 0;
  int fd = -1;
  ~Mapped() {
    if (data) munmap(const_cast<char*>(data), len);
    if (fd >= 0) close(fd);
  }
};

bool map_file(const char* path, Mapped* m, char* err) {
  m->fd = open(path, O_RDONLY);
  if (m->fd < 0) {
    set_error(err, "cannot open file");
    return false;
  }
  struct stat st;
  if (fstat(m->fd, &st) != 0 || st.st_size == 0) {
    set_error(err, "cannot stat file / empty file");
    return false;
  }
  m->len = static_cast<size_t>(st.st_size);
  void* p = mmap(nullptr, m->len, PROT_READ, MAP_PRIVATE, m->fd, 0);
  if (p == MAP_FAILED) {
    m->data = nullptr;
    set_error(err, "mmap failed");
    return false;
  }
  m->data = static_cast<const char*>(p);
  return true;
}

bool is_gzip(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[2] = {0, 0};
  size_t n = std::fread(magic, 1, 2, f);
  std::fclose(f);
  return n == 2 && magic[0] == 0x1f && magic[1] == 0x8b;
}

// Inflate a .gz file fully into memory.
bool gunzip_all(const char* path, std::vector<char>* out, char* err) {
  gzFile gz = gzopen(path, "rb");
  if (!gz) {
    set_error(err, "cannot open gzip file");
    return false;
  }
  gzbuffer(gz, 1 << 20);
  constexpr size_t CHUNK = 1 << 22;
  size_t used = 0;
  for (;;) {
    out->resize(used + CHUNK);
    int n = gzread(gz, out->data() + used, CHUNK);
    if (n < 0) {
      gzclose(gz);
      set_error(err, "gzip read error");
      return false;
    }
    used += static_cast<size_t>(n);
    if (n == 0) break;
  }
  out->resize(used);
  gzclose(gz);
  return true;
}

// Load file contents (decompressed if needed). On success, either `mapped`
// holds an mmap or `heap` holds bytes; (*data, *len) point at them.
bool load_bytes(const char* path, Mapped* mapped, std::vector<char>* heap,
                const char** data, size_t* len, char* err) {
  if (is_gzip(path)) {
    if (!gunzip_all(path, heap, err)) return false;
    *data = heap->data();
    *len = heap->size();
    return true;
  }
  if (!map_file(path, mapped, err)) return false;
  *data = mapped->data;
  *len = mapped->len;
  return true;
}

int n_threads_for(size_t bytes) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  // below ~8 MB the thread spawn overhead dominates
  size_t want = bytes / (8u << 20);
  return static_cast<int>(std::max<size_t>(1, std::min<size_t>(hw, want + 1)));
}

// Split [begin, end) into nearly-equal chunks on line boundaries.
std::vector<std::pair<const char*, const char*>> chunk_lines(const char* begin,
                                                             const char* end,
                                                             int n) {
  std::vector<std::pair<const char*, const char*>> chunks;
  size_t total = static_cast<size_t>(end - begin);
  const char* p = begin;
  for (int i = 0; i < n && p < end; i++) {
    const char* q = (i == n - 1) ? end : begin + total * (i + 1) / n;
    while (q < end && *q != '\n') q++;
    if (q < end) q++;
    chunks.emplace_back(p, q);
    p = q;
  }
  return chunks;
}

}  // namespace

extern "C" {

// Read only the header: dims + nnz. Returns 0 on success.
int mtx_read_info(const char* path, int64_t* rows, int64_t* cols, int64_t* nnz,
                  char* err) {
  Mapped mapped;
  std::vector<char> heap;
  const char* data;
  size_t len;
  if (!load_bytes(path, &mapped, &heap, &data, &len, err)) return 1;
  Header h;
  if (!parse_header(data, len, &h, err)) return 1;
  *rows = h.rows;
  *cols = h.cols;
  *nnz = h.symmetric ? 2 * h.nnz : h.nnz;  // upper bound for symmetric
  return 0;
}

// Read triplets into caller-allocated arrays of capacity `cap`.
// Writes the actual count into *out_nnz. Returns 0 on success.
int mtx_read_triplets(const char* path, int64_t* row_idx, int64_t* col_idx,
                      double* vals, int64_t cap, int64_t* out_nnz, char* err) {
  Mapped mapped;
  std::vector<char> heap;
  const char* data;
  size_t len;
  if (!load_bytes(path, &mapped, &heap, &data, &len, err)) return 1;
  Header h;
  if (!parse_header(data, len, &h, err)) return 1;
  int64_t bound = h.symmetric ? 2 * h.nnz : h.nnz;
  if (bound > cap) {
    set_error(err, "capacity too small for nnz");
    return 1;
  }

  const char* body = data + h.data_offset;
  const char* end = data + len;
  std::atomic<bool> failed{false};
  std::atomic<bool> oob{false};

  int nt = n_threads_for(static_cast<size_t>(end - body));
  auto chunks = chunk_lines(body, end, nt);

  // Two-pass concurrency contract: pass 1 counts each chunk's ACTUAL
  // entries; exclusive prefix sums give each chunk a disjoint destination
  // range, so pass 2 scatters with no synchronization. (Symmetric files
  // reserve 2x per entry; the tail gap per chunk is compacted afterwards.)
  std::vector<int64_t> counts(chunks.size(), 0);
  {
    std::vector<std::thread> threads;
    for (size_t i = 0; i < chunks.size(); i++) {
      threads.emplace_back([&, i] {
        int64_t c = parse_triplets(chunks[i].first, chunks[i].second,
                                   h.pattern, [](int64_t, int64_t, double) {});
        if (c < 0)
          failed.store(true);
        else
          counts[i] = h.symmetric ? 2 * c : c;  // worst case off-diag
      });
    }
    for (auto& t : threads) t.join();
  }
  if (failed.load()) {
    set_error(err, "malformed triplet entry");
    return 1;
  }
  std::vector<int64_t> offsets(chunks.size() + 1, 0);
  for (size_t i = 0; i < chunks.size(); i++)
    offsets[i + 1] = offsets[i] + counts[i];
  // capacity must cover the ACTUAL parsed entries, not the header's claim —
  // a body with more lines than the declared nnz must not overrun the
  // caller's arrays
  if (offsets.back() > cap) {
    set_error(err, "file contains more entries than the header declares");
    return 1;
  }

  const int64_t R = h.rows, C = h.cols;
  const double mirror = h.skew ? -1.0 : 1.0;
  std::vector<int64_t> written(chunks.size(), 0);
  {
    std::vector<std::thread> threads;
    for (size_t i = 0; i < chunks.size(); i++) {
      threads.emplace_back([&, i] {
        int64_t w = offsets[i];
        int64_t c = parse_triplets(
            chunks[i].first, chunks[i].second, h.pattern,
            [&](int64_t r, int64_t cc, double v) {
              if (r >= R || cc >= C) {
                oob.store(true);
                return;
              }
              row_idx[w] = r;
              col_idx[w] = cc;
              vals[w] = v;
              w++;
              if (h.symmetric && r != cc) {
                row_idx[w] = cc;
                col_idx[w] = r;
                vals[w] = mirror * v;
                w++;
              }
            });
        if (c < 0) failed.store(true);
        written[i] = w - offsets[i];
      });
    }
    for (auto& t : threads) t.join();
  }
  if (failed.load()) {
    set_error(err, "malformed triplet entry");
    return 1;
  }
  if (oob.load()) {
    set_error(err, "entry index out of declared bounds");
    return 1;
  }
  // compact gaps left by symmetric worst-case reservation
  int64_t total = written[0];
  for (size_t i = 1; i < chunks.size(); i++) {
    if (offsets[i] != total) {
      std::memmove(row_idx + total, row_idx + offsets[i],
                   sizeof(int64_t) * written[i]);
      std::memmove(col_idx + total, col_idx + offsets[i],
                   sizeof(int64_t) * written[i]);
      std::memmove(vals + total, vals + offsets[i], sizeof(double) * written[i]);
    }
    total += written[i];
  }
  *out_nnz = total;
  return 0;
}

// Scatter straight into a dense row-major rows x cols float64 buffer
// (caller-zeroed). transpose!=0 writes out[col, row] into a cols x rows
// buffer instead. Duplicate entries accumulate. Returns 0 on success.
int mtx_read_dense(const char* path, double* out, int transpose, char* err) {
  Mapped mapped;
  std::vector<char> heap;
  const char* data;
  size_t len;
  if (!load_bytes(path, &mapped, &heap, &data, &len, err)) return 1;
  Header h;
  if (!parse_header(data, len, &h, err)) return 1;

  const char* body = data + h.data_offset;
  const char* end = data + len;
  std::atomic<bool> failed{false};
  std::atomic<bool> oob{false};

  const int64_t R = h.rows, C = h.cols;
  const double mirror = h.skew ? -1.0 : 1.0;
  int nt = n_threads_for(static_cast<size_t>(end - body));
  auto chunks = chunk_lines(body, end, nt);
  // Duplicate (r, c) coordinates may land in different chunks, so the
  // multi-threaded scatter accumulates with a lock-free CAS add (documented
  // behavior: duplicates accumulate). Single-chunk files take the plain-add
  // path. Note symmetric implies R == C (parse_header), so the mirror index
  // cc*C+r is correct in both orientations.
  const bool atomic = chunks.size() > 1;
  std::vector<std::thread> threads;
  for (auto& ch : chunks) {
    threads.emplace_back([&, ch] {
      auto add = [&](int64_t i, double v) {
        if (atomic)
          atomic_add_double(out + i, v);
        else
          out[i] += v;
      };
      int64_t c = parse_triplets(
          ch.first, ch.second, h.pattern, [&](int64_t r, int64_t cc, double v) {
            if (r >= R || cc >= C) {
              oob.store(true);
              return;
            }
            if (transpose) {
              add(cc * R + r, v);
              if (h.symmetric && r != cc) add(r * C + cc, mirror * v);
            } else {
              add(r * C + cc, v);
              if (h.symmetric && r != cc) add(cc * C + r, mirror * v);
            }
          });
      if (c < 0) failed.store(true);
    });
  }
  for (auto& t : threads) t.join();
  if (failed.load()) {
    set_error(err, "malformed triplet entry");
    return 1;
  }
  if (oob.load()) {
    set_error(err, "entry index out of declared bounds");
    return 1;
  }
  return 0;
}

}  // extern "C"
