// Native host kernels for trilinos_tpu.
//
// The reference implements ALL of its host-side runtime in C++ (Tpetra's
// fillComplete machinery, Ifpack2's factorizations, the MatrixMarket
// reader in MatrixMarket_Tpetra.hpp). The TPU compute path here is
// JAX/XLA/Pallas; this translation unit provides the C++ versions of the
// *setup-time* hot paths, loaded from Python via ctypes:
//
//   * tt_read_mm   — MatrixMarket coordinate parser (fast strtod scan;
//                    analogue of MatrixMarket_Tpetra.hpp readSparse)
//   * tt_ilu0      — in-place ILU(0) numeric factorization on sorted CSR
//                    (analogue of Ifpack2_RILUK_def.hpp compute(), k=0)
//   * tt_spgemm_count / tt_spgemm — one-pass symbolic+numeric local
//                    SpGEMM with a dense accumulator (analogue of
//                    KokkosSparse spgemm's kkmem variant)
//
// Build: g++ -O3 -march=native -shared -fPIC (see ../build.py).

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MatrixMarket coordinate parser
// ---------------------------------------------------------------------------

// Parses the header; returns 0 on success. symm: 0 general, 1 symmetric,
// 2 skew. field: 0 real/int, 1 pattern. Leaves *data_pos at the first
// entry line's file offset.
int tt_read_mm_header(const char* path, int64_t* m, int64_t* n,
                      int64_t* nnz, int* symm, int* pattern,
                      int64_t* data_pos) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[1024];
  if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return -2; }
  if (std::strncmp(line, "%%MatrixMarket", 14) != 0) {
    std::fclose(f);
    return -3;
  }
  char obj[64], fmt[64], field[64], sym[64];
  if (std::sscanf(line, "%%%%MatrixMarket %63s %63s %63s %63s", obj, fmt,
                  field, sym) != 4) { std::fclose(f); return -4; }
  if (std::strcmp(fmt, "coordinate") != 0) { std::fclose(f); return -5; }
  *pattern = std::strcmp(field, "pattern") == 0 ? 1 : 0;
  if (std::strcmp(sym, "symmetric") == 0) *symm = 1;
  else if (std::strcmp(sym, "skew-symmetric") == 0) *symm = 2;
  else *symm = 0;
  // skip comments
  long pos;
  for (;;) {
    pos = std::ftell(f);
    if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return -6; }
    if (line[0] != '%') break;
  }
  long long mm, nn, zz;
  if (std::sscanf(line, "%lld %lld %lld", &mm, &nn, &zz) != 3) {
    std::fclose(f);
    return -7;
  }
  *m = mm; *n = nn; *nnz = zz;
  *data_pos = std::ftell(f);
  std::fclose(f);
  return 0;
}

// Reads nnz (row, col, val) triples starting at data_pos. rows/cols are
// 0-based on output. Returns number parsed, or negative on error.
int64_t tt_read_mm(const char* path, int64_t data_pos, int64_t nnz,
                   int pattern, int64_t* rows, int64_t* cols, double* vals) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, static_cast<long>(data_pos), SEEK_SET);
  // slurp the remainder for a single fast scan
  long start = std::ftell(f);
  std::fseek(f, 0, SEEK_END);
  long end = std::ftell(f);
  std::fseek(f, start, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(end - start) + 1);
  size_t got = std::fread(buf.data(), 1, buf.size() - 1, f);
  buf[got] = '\0';
  std::fclose(f);
  char* p = buf.data();
  int64_t k = 0;
  while (k < nnz) {
    while (*p && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (!*p) break;
    char* q;
    long long r = std::strtoll(p, &q, 10);
    if (q == p) return -2;
    p = q;
    long long c = std::strtoll(p, &q, 10);
    if (q == p) return -3;
    p = q;
    double v = 1.0;
    if (!pattern) {
      v = std::strtod(p, &q);
      if (q == p) return -4;
      p = q;
    }
    rows[k] = r - 1;
    cols[k] = c - 1;
    vals[k] = v;
    ++k;
  }
  return k;
}

// ---------------------------------------------------------------------------
// ILU(0): in-place numeric factorization on a sorted CSR
// ---------------------------------------------------------------------------

// vals is modified in place; on exit, entries left of the diagonal hold L
// (unit diagonal implied), the diagonal and right of it hold U.
// Returns 0 on success, i+1 if a zero pivot was hit at row i (factorization
// continues with the pivot skipped, matching the reference's tolerant
// behavior).
int64_t tt_ilu0(int64_t n, const int64_t* row_ptr, const int32_t* cols,
                double* vals) {
  std::vector<int64_t> diag(n, -1);
  std::vector<int64_t> pos(n, -1);  // column -> index scratch for row i
  int64_t bad = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t jj = row_ptr[i]; jj < row_ptr[i + 1]; ++jj)
      if (cols[jj] == i) { diag[i] = jj; break; }
  }
  for (int64_t i = 0; i < n; ++i) {
    const int64_t rs = row_ptr[i], re = row_ptr[i + 1];
    for (int64_t jj = rs; jj < re; ++jj) pos[cols[jj]] = jj;
    for (int64_t kk = rs; kk < re; ++kk) {
      const int64_t k = cols[kk];
      if (k >= i) break;  // sorted: done with the strict lower part
      const int64_t dk = diag[k];
      if (dk < 0) continue;
      const double ukk = vals[dk];
      if (ukk == 0.0) { if (!bad) bad = i + 1; continue; }
      const double lik = vals[kk] / ukk;
      vals[kk] = lik;
      for (int64_t jj = dk + 1; jj < row_ptr[k + 1]; ++jj) {
        const int64_t p = pos[cols[jj]];
        if (p >= 0) vals[p] -= lik * vals[jj];
      }
    }
    for (int64_t jj = rs; jj < re; ++jj) pos[cols[jj]] = -1;
  }
  return bad;
}

// ---------------------------------------------------------------------------
// Local SpGEMM (dense-accumulator numeric, like kkmem for modest n_cols)
// ---------------------------------------------------------------------------

// Pass 1: count output nnz per row of C = A(mxk) * B(kxn).
void tt_spgemm_count(int64_t m, int64_t n, const int64_t* a_ptr,
                     const int32_t* a_cols, const int64_t* b_ptr,
                     const int32_t* b_cols, int64_t* c_counts) {
  std::vector<int64_t> mark(n, -1);
  for (int64_t i = 0; i < m; ++i) {
    int64_t cnt = 0;
    for (int64_t jj = a_ptr[i]; jj < a_ptr[i + 1]; ++jj) {
      const int32_t k = a_cols[jj];
      for (int64_t bb = b_ptr[k]; bb < b_ptr[k + 1]; ++bb) {
        const int32_t c = b_cols[bb];
        if (mark[c] != i) { mark[c] = i; ++cnt; }
      }
    }
    c_counts[i] = cnt;
  }
}

// Pass 2: fill C (rows sorted by column). c_ptr = exclusive scan of counts.
void tt_spgemm_fill(int64_t m, int64_t n, const int64_t* a_ptr,
                    const int32_t* a_cols, const double* a_vals,
                    const int64_t* b_ptr, const int32_t* b_cols,
                    const double* b_vals, const int64_t* c_ptr,
                    int32_t* c_cols, double* c_vals) {
  std::vector<double> acc(n, 0.0);
  std::vector<int64_t> mark(n, -1);
  std::vector<int32_t> touched;
  touched.reserve(256);
  for (int64_t i = 0; i < m; ++i) {
    touched.clear();
    for (int64_t jj = a_ptr[i]; jj < a_ptr[i + 1]; ++jj) {
      const int32_t k = a_cols[jj];
      const double av = a_vals[jj];
      for (int64_t bb = b_ptr[k]; bb < b_ptr[k + 1]; ++bb) {
        const int32_t c = b_cols[bb];
        if (mark[c] != i) {
          mark[c] = i;
          acc[c] = 0.0;
          touched.push_back(c);
        }
        acc[c] += av * b_vals[bb];
      }
    }
    std::sort(touched.begin(), touched.end());
    int64_t out = c_ptr[i];
    for (const int32_t c : touched) {
      c_cols[out] = c;
      c_vals[out] = acc[c];
      ++out;
    }
  }
}

}  // extern "C"
