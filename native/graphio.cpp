// Native host runtime for serendipity_tpu: graph text IO, k-core filtering, CSR
// construction, and an exact-rejection negative sampler.
//
// Role parity with the reference's native components (SURVEY.md §2):
//   N1 sampling.cpp  -> stpu_sample_negatives (exact rejection loop; serves as the
//      differential cross-check for the fixed-round on-device sampler)
//   pandas/scipy preprocessing (rating_data_process.py, load_data.py) -> fast
//      adjacency-list parsing + k-core peeling + CSR building
// (N2's top-k/metrics evaluator is replaced by on-device XLA, not host C++.)
//
// C ABI for ctypes; buffers are malloc'd here and released via stpu_free.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {

void stpu_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Adjacency-list parsing:  "uid i1 i2 ..." per line (train.txt/test.txt format,
// contract of LightGCN-tf/utility/load_data.py:30-85).
// Returns number of edges; fills *users/*items (malloc'd int32 arrays) and
// *max_user/*max_item.  Returns -1 on IO error.
int64_t stpu_parse_adjacency(const char* path, int32_t** users, int32_t** items,
                             int32_t* max_user, int32_t* max_item) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (size > 0 && fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  std::vector<int32_t> us, is;
  us.reserve(1 << 20);
  is.reserve(1 << 20);
  int32_t mu = -1, mi = -1;
  char* p = buf.data();
  char* end = p + size;
  while (p < end) {
    // parse one line
    bool have_uid = false;
    int32_t uid = 0;
    while (p < end && *p != '\n') {
      while (p < end && (*p == ' ' || *p == '\r' || *p == '\t')) p++;
      if (p >= end || *p == '\n') break;
      if (*p < '0' || *p > '9') {  // non-numeric token: skip line remainder
        while (p < end && *p != '\n') p++;
        break;
      }
      int64_t v = 0;
      while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
      if (!have_uid) {
        uid = (int32_t)v;
        have_uid = true;
        if (uid > mu) mu = uid;
      } else {
        us.push_back(uid);
        is.push_back((int32_t)v);
        if ((int32_t)v > mi) mi = (int32_t)v;
      }
    }
    if (p < end) p++;  // consume '\n'
  }
  int64_t n = (int64_t)us.size();
  *users = (int32_t*)malloc(n * sizeof(int32_t));
  *items = (int32_t*)malloc(n * sizeof(int32_t));
  memcpy(*users, us.data(), n * sizeof(int32_t));
  memcpy(*items, is.data(), n * sizeof(int32_t));
  *max_user = mu;
  *max_item = mi;
  return n;
}

// ---------------------------------------------------------------------------
// Iterative k-core peeling over the bipartite graph (semantics of
// rating_data_process.filter_k_core_precise, :22-65): repeatedly drop
// interactions of users/items with degree < k until stable.
// keep[e] (uint8) marks surviving edges; returns number kept.
int64_t stpu_k_core(const int32_t* users, const int32_t* items, int64_t n_edges,
                    int32_t n_users, int32_t n_items, int32_t k_user,
                    int32_t k_item, uint8_t* keep) {
  std::vector<int64_t> du(n_users, 0), di(n_items, 0);
  for (int64_t e = 0; e < n_edges; e++) {
    keep[e] = 1;
    du[users[e]]++;
    di[items[e]]++;
  }
  bool changed = true;
  while (changed) {
    changed = false;
    for (int64_t e = 0; e < n_edges; e++) {
      if (!keep[e]) continue;
      if (du[users[e]] < k_user || di[items[e]] < k_item) {
        keep[e] = 0;
        du[users[e]]--;
        di[items[e]]--;
        changed = true;
      }
    }
  }
  int64_t kept = 0;
  for (int64_t e = 0; e < n_edges; e++) kept += keep[e];
  return kept;
}

// ---------------------------------------------------------------------------
// CSR build by counting sort; column ids sorted ascending within each row.
// indptr must have n_rows+1 slots; indices n_edges slots (both caller-allocated).
void stpu_build_csr(const int32_t* rows, const int32_t* cols, int64_t n_edges,
                    int32_t n_rows, int64_t* indptr, int32_t* indices) {
  memset(indptr, 0, (n_rows + 1) * sizeof(int64_t));
  for (int64_t e = 0; e < n_edges; e++) indptr[rows[e] + 1]++;
  for (int32_t r = 0; r < n_rows; r++) indptr[r + 1] += indptr[r];
  std::vector<int64_t> cursor(indptr, indptr + n_rows);
  for (int64_t e = 0; e < n_edges; e++) {
    indices[cursor[rows[e]]++] = cols[e];
  }
  // sort within rows (rows are short; std::sort per segment, threaded)
  int n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int32_t> next_row(0);
  auto worker = [&]() {
    for (;;) {
      int32_t r = next_row.fetch_add(256);
      if (r >= n_rows) return;
      int32_t stop = std::min(r + 256, n_rows);
      for (int32_t i = r; i < stop; i++) {
        std::sort(indices + indptr[i], indices + indptr[i + 1]);
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; t++) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Exact-rejection BPR negative sampling (contract of sampling.cpp:27-56): for each
// slot, draw uniform items until one is outside the user's positive set.
// Uses per-call deterministic PRNG (mt19937) instead of the reference's
// thread-unsafe rand().
void stpu_sample_negatives(const int64_t* indptr, const int32_t* indices,
                           const int32_t* users, int64_t n, int32_t n_items,
                           uint64_t seed, int32_t* neg_out) {
  std::mt19937_64 gen(seed);
  std::uniform_int_distribution<int32_t> dist(0, n_items - 1);
  for (int64_t s = 0; s < n; s++) {
    int32_t u = users[s];
    const int32_t* lo = indices + indptr[u];
    const int32_t* hi = indices + indptr[u + 1];
    for (;;) {
      int32_t cand = dist(gen);
      if (!std::binary_search(lo, hi, cand)) {
        neg_out[s] = cand;
        break;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// CSV interaction parsing for the serendipity schema
// (userInd,itemInd,rating,timestamp,... header; rating_data_process.py:293-389).
// Fills malloc'd arrays for the four leading numeric columns plus optional
// serLabel (by header name).  Returns row count, -1 on error.
int64_t stpu_parse_rating_csv(const char* path, int32_t** users, int32_t** items,
                              float** ratings, double** timestamps,
                              float** ser_labels, int32_t* has_ser) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (size > 0 && fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';
  char* p = buf.data();
  char* end = p + size;

  // header
  int col_user = -1, col_item = -1, col_rating = -1, col_ts = -1, col_ser = -1;
  {
    int col = 0;
    char* start = p;
    while (p <= end && *p != '\n' && p < end) p++;
    std::string header(start, p - start);
    size_t pos = 0;
    while (pos != std::string::npos) {
      size_t c = header.find(',', pos);
      std::string name = header.substr(pos, c == std::string::npos ? c : c - pos);
      while (!name.empty() && (name.back() == '\r' || name.back() == ' ')) name.pop_back();
      if (name == "userInd") col_user = col;
      else if (name == "itemInd") col_item = col;
      else if (name == "rating") col_rating = col;
      else if (name == "timestamp") col_ts = col;
      else if (name == "serLabel") col_ser = col;
      col++;
      pos = (c == std::string::npos) ? c : c + 1;
    }
    if (p < end) p++;
  }
  if (col_user < 0 || col_item < 0) return -1;
  *has_ser = col_ser >= 0 ? 1 : 0;

  std::vector<int32_t> us, is;
  std::vector<float> rs, ss;
  std::vector<double> tss;
  while (p < end) {
    int col = 0;
    int32_t u = -1, it = -1;
    float r = 0.f, sl = 0.f;
    double ts = 0.0;
    while (p < end && *p != '\n') {
      char* tok = p;
      while (p < end && *p != ',' && *p != '\n') p++;
      char saved = *p;
      *p = '\0';
      if (col == col_user) u = (int32_t)strtol(tok, nullptr, 10);
      else if (col == col_item) it = (int32_t)strtol(tok, nullptr, 10);
      else if (col == col_rating) r = strtof(tok, nullptr);
      else if (col == col_ts) ts = strtod(tok, nullptr);
      else if (col == col_ser) sl = strtof(tok, nullptr);
      *p = saved;
      if (p < end && *p == ',') p++;
      col++;
    }
    if (p < end) p++;
    if (u >= 0 && it >= 0) {
      us.push_back(u);
      is.push_back(it);
      rs.push_back(r);
      tss.push_back(ts);
      ss.push_back(sl);
    }
  }
  int64_t n = (int64_t)us.size();
  auto alloc_copy = [](auto& vec, auto** out) {
    using T = typename std::remove_reference<decltype(vec)>::type::value_type;
    *out = (T*)malloc(vec.size() * sizeof(T));
    memcpy(*out, vec.data(), vec.size() * sizeof(T));
  };
  alloc_copy(us, users);
  alloc_copy(is, items);
  alloc_copy(rs, ratings);
  alloc_copy(tss, timestamps);
  alloc_copy(ss, ser_labels);
  return n;
}

// ---------------------------------------------------------------------------
// Generic raw ratings CSV with STRING ids — the multi-GB source dumps the
// reference preprocesses (`rating_data_process.py:440-567`: SerenLens
// user,item,timestamp,review,rating,label; Amazon user,item,rating,timestamp and
// item,user,rating,timestamp).  Full RFC4180 quoting (quoted commas, doubled
// quotes, embedded newlines) to stay record-identical with Python's csv.reader,
// which the pure-Python `data/preprocess.parse_raw_csv` uses and which remains
// the differential cross-check (tests/test_native.py).
//
// String ids are vocabulary-encoded in FIRST-APPEARANCE order: per-row int32
// codes plus a concatenated vocab byte buffer with offsets; the Python wrapper
// reconstructs the exact string column as vocab[codes].
//
// Column indices are 0-based; -1 marks an absent column (rating/ts/label then
// default to 0, matching the Python reader).  Rows with fewer than `min_cols`
// fields are skipped, like `len(row) < len(columns)` in the Python path.

namespace {

struct RawCsvVocab {
  // open-addressing table with the key INLINED in the 32-byte slot for ids up
  // to 27 bytes — one cache line touch per lookup instead of three (slot ->
  // by_id pair -> key bytes), which is what made interning superlinear once the
  // vocabulary outgrew L3 (multi-GB dumps: millions of distinct ids)
  struct Slot {
    int32_t id;               // -1 empty
    uint8_t len;              // 255 = long key, compare via by_id
    char s[27];
  };
  std::vector<std::pair<const char*, int32_t>> by_id;  // ptr/len per id (export)
  std::vector<Slot> table;
  size_t mask = 0;

  void reserve(size_t cap) {
    size_t sz = 64;
    while (sz < cap * 2) sz <<= 1;
    table.assign(sz, Slot{-1, 0, {}});
    mask = sz - 1;
  }
  static uint64_t hash(const char* p, int32_t n) {
    uint64_t h = 1469598103934665603ull;
    for (int32_t i = 0; i < n; i++) h = (h ^ (uint8_t)p[i]) * 1099511628211ull;
    return h;
  }
  int32_t intern(const char* p, int32_t n) {
    if ((by_id.size() + 1) * 2 > table.size()) grow();
    size_t slot = hash(p, n) & mask;
    for (;;) {
      Slot& sl = table[slot];
      if (sl.id < 0) {
        sl.id = (int32_t)by_id.size();
        fill(sl, p, n);
        by_id.emplace_back(p, n);
        return sl.id;
      }
      if (matches(sl, p, n)) return sl.id;
      slot = (slot + 1) & mask;
    }
  }
  void fill(Slot& sl, const char* p, int32_t n) {
    if (n <= 27) {
      sl.len = (uint8_t)n;
      memcpy(sl.s, p, n);
    } else {
      sl.len = 255;
    }
  }
  bool matches(const Slot& sl, const char* p, int32_t n) const {
    if (sl.len != 255)
      return sl.len == n && memcmp(sl.s, p, n) == 0;
    return n > 27 && by_id[sl.id].second == n &&
           memcmp(by_id[sl.id].first, p, n) == 0;
  }
  void grow() {
    std::vector<Slot> old;
    old.swap(table);
    table.assign(old.size() * 2, Slot{-1, 0, {}});
    mask = table.size() - 1;
    for (int32_t id = 0; id < (int32_t)by_id.size(); id++) {
      size_t slot = hash(by_id[id].first, by_id[id].second) & mask;
      while (table[slot].id >= 0) slot = (slot + 1) & mask;
      table[slot].id = id;
      fill(table[slot], by_id[id].first, by_id[id].second);
    }
  }
};

// Fast decimal parse, bit-identical to strtod (and Python float) for the common
// case: optional sign, <= 15 significant digits, optional '.(digits)' and small
// exponent — mantissa and 10^k are then exactly representable, and the single
// multiply/divide rounds once, which is provably correctly rounded.  Anything
// else falls back to strtod on a NUL-terminated copy.
static const double kPow10[23] = {
    1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,  1e10, 1e11,
    1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};

double fast_atod(const char* field, int64_t len) {
  const char* p = field;
  const char* end = p + len;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  uint64_t mant = 0;
  int digits = 0, frac = 0;
  const char* start = p;
  while (p < end && *p >= '0' && *p <= '9') {
    mant = mant * 10 + (*p++ - '0');
    digits++;
  }
  if (p < end && *p == '.') {
    p++;
    while (p < end && *p >= '0' && *p <= '9') {
      mant = mant * 10 + (*p++ - '0');
      digits++;
      frac++;
    }
  }
  int expo = 0;
  bool has_exp = false;
  if (p < end && (*p == 'e' || *p == 'E')) {
    has_exp = true;
    p++;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) eneg = (*p++ == '-');
    while (p < end && *p >= '0' && *p <= '9') expo = expo * 10 + (*p++ - '0');
    if (eneg) expo = -expo;
  }
  int net = expo - frac;
  if (p == end && p != start && digits <= 15 && net >= -22 && net <= 22 &&
      (!has_exp || digits > 0)) {
    double v = (double)mant;
    v = net >= 0 ? v * kPow10[net] : v / kPow10[-net];
    return neg ? -v : v;
  }
  char tmp[64];
  int64_t n = len < 63 ? len : 63;
  memcpy(tmp, field, n);
  tmp[n] = '\0';
  return strtod(tmp, nullptr);
}

void export_vocab(const RawCsvVocab& v, char** buf, int64_t** off, int64_t* n) {
  int64_t total = 0;
  for (auto& s : v.by_id) total += s.second;
  *buf = (char*)malloc(total > 0 ? total : 1);
  *off = (int64_t*)malloc((v.by_id.size() + 1) * sizeof(int64_t));
  int64_t pos = 0;
  for (size_t i = 0; i < v.by_id.size(); i++) {
    (*off)[i] = pos;
    memcpy(*buf + pos, v.by_id[i].first, v.by_id[i].second);
    pos += v.by_id[i].second;
  }
  (*off)[v.by_id.size()] = pos;
  *n = (int64_t)v.by_id.size();
}

}  // namespace

int64_t stpu_parse_raw_csv(
    const char* path, int32_t has_header, int32_t min_cols,
    int32_t col_user, int32_t col_item, int32_t col_rating, int32_t col_ts,
    int32_t col_label,
    int32_t** ucodes, int32_t** icodes, double** ratings, double** ts_out,
    double** labels,
    char** uvoc_buf, int64_t** uvoc_off, int64_t* n_uvoc,
    char** ivoc_buf, int64_t** ivoc_off, int64_t* n_ivoc) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  // +1 so in-place strtod on a field ending at EOF finds a terminator
  char* buf = (char*)malloc(size + 1);
  if (size > 0 && fread(buf, 1, size, f) != (size_t)size) {
    fclose(f);
    free(buf);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  // --- parallel chunked parse -----------------------------------------------
  // Chunks split at record boundaries: a '\n' at even quote PARITY from the
  // buffer start (doubled "" inside quoted fields contributes 2, so parity
  // correctly tracks inside/outside-quotes state).  Each thread parses its
  // range into thread-local columns + a thread-local first-appearance vocab;
  // the sequential merge re-interns the local vocabs in thread order, which
  // reproduces the single-threaded (global first-appearance) id assignment
  // exactly because every thread-k row precedes every thread-(k+1) row.
  struct ChunkOut {
    std::vector<int32_t> ucol, icol;
    std::vector<double> rcol, tcol, lcol;
    RawCsvVocab uvoc, ivoc;
    std::vector<std::vector<char>*> arenas;
    ~ChunkOut() {
      for (auto* a : arenas) delete a;
    }
  };
  const int n_watch = 5;
  int watch_col[n_watch] = {col_user, col_item, col_rating, col_ts, col_label};

  // delimiter lookup table: one load+test per scanned byte; '\0' included so
  // the global buffer sentinel also terminates (chunk-internal scans stop at
  // the '\n' before the chunk boundary — boundaries are record starts)
  static bool is_delim_tbl[256];
  is_delim_tbl[(uint8_t)','] = true;
  is_delim_tbl[(uint8_t)'\n'] = true;
  is_delim_tbl[(uint8_t)'\r'] = true;
  is_delim_tbl[(uint8_t)'\0'] = true;
  const bool* is_delim = is_delim_tbl;
  // column -> watched-slot role (or -1), replacing a 5-way compare per field
  int8_t role_tbl[256];
  memset(role_tbl, -1, sizeof(role_tbl));
  for (int w = n_watch - 1; w >= 0; w--)
    if (watch_col[w] >= 0 && watch_col[w] < 256) role_tbl[watch_col[w]] = (int8_t)w;
  const int8_t* role = role_tbl;

  auto parse_range = [&](const char* p, const char* end, bool skip_header,
                         ChunkOut& out) {
    std::vector<char>* arena = nullptr;
    size_t arena_used = 0;
    auto arena_put = [&](const char* s, int64_t n) -> char* {
      if (!arena || arena_used + n > arena->size()) {
        arena = new std::vector<char>(std::max<int64_t>(n, 1 << 20));
        out.arenas.push_back(arena);
        arena_used = 0;
      }
      char* dst = arena->data() + arena_used;
      memcpy(dst, s, n);
      arena_used += n;
      return dst;
    };
    out.uvoc.reserve(1 << 16);
    out.ivoc.reserve(1 << 16);
    const char* fptr[5];
    int64_t flen[5];
    std::vector<char> scratch;
    bool pending_header = skip_header;
    while (p < end) {
      int col = 0;
      int64_t first_len = 0;
      bool saw_comma = false;
      for (int w = 0; w < n_watch; w++) fptr[w] = nullptr;
      for (;;) {  // fields of one record
        const char* unq;
        int64_t unq_n;
        bool in_scratch = false;
        if (p < end && *p == '"') {
          // quoted field: scan to the closing (non-doubled) quote
          p++;
          const char* fstart = p;
          bool has_esc = false;
          const char* q = p;
          for (;;) {
            while (q < end && *q != '"') q++;
            if (q + 1 < end && q[1] == '"') {
              has_esc = true;
              q += 2;
              continue;
            }
            break;
          }
          if (has_esc) {
            scratch.clear();
            for (const char* c = fstart; c < q; c++) {
              scratch.push_back(*c);
              if (*c == '"' && c + 1 < q && c[1] == '"') c++;
            }
            unq = scratch.data();
            unq_n = (int64_t)scratch.size();
            in_scratch = true;
          } else {
            unq = fstart;
            unq_n = q - fstart;
          }
          p = q < end ? q + 1 : end;                 // past closing quote
          while (p < end && *p != ',' && *p != '\n' && *p != '\r') p++;
        } else {
          const char* fstart = p;
          while (!is_delim[(uint8_t)*p]) p++;   // '\0' sentinel backstops EOF
          unq = fstart;
          unq_n = p - fstart;
        }
        if (col == 0) first_len = unq_n;
        int8_t w = col < 256 ? role[col] : (int8_t)-1;
        if (w >= 0) {
          // scratch is reused per field — persist watched escaped fields
          fptr[w] = in_scratch ? arena_put(unq, unq_n) : unq;
          flen[w] = unq_n;
        }
        col++;
        if (p < end && *p == ',') {
          p++;
          saw_comma = true;
          continue;
        }
        if (p < end && *p == '\r') p++;
        if (p < end && *p == '\n') p++;
        break;
      }
      if (col == 1 && first_len == 0 && !saw_comma) continue;  // blank line
      if (pending_header) {
        pending_header = false;
        continue;
      }
      if (col < min_cols) continue;  // Python: len(row) < len(columns) -> skip
      if (fptr[0] == nullptr || fptr[1] == nullptr) continue;
      out.ucol.push_back(out.uvoc.intern(fptr[0], (int32_t)flen[0]));
      out.icol.push_back(out.ivoc.intern(fptr[1], (int32_t)flen[1]));
      auto num = [&](int w) -> double {
        if (watch_col[w] < 0 || fptr[w] == nullptr || flen[w] == 0) return 0.0;
        return fast_atod(fptr[w], flen[w]);
      };
      out.rcol.push_back(num(2));
      out.tcol.push_back(num(3));
      if (col_label >= 0) out.lcol.push_back(num(4));
    }
  };

  // record-boundary split points at even quote parity
  int n_threads = std::max(1u, std::thread::hardware_concurrency());
  if (size < (1 << 22)) n_threads = 1;  // not worth it under ~4 MB
  std::vector<const char*> bounds{buf};
  {
    const char* pos = buf;
    int64_t parity = 0;
    for (int t = 1; t < n_threads; t++) {
      const char* target = buf + (size * t) / n_threads;
      // advance parity up to target, then to the next even-parity '\n'
      while (pos < target) parity += (*pos++ == '"');
      const char* split = nullptr;
      for (const char* q = pos; q < buf + size; q++) {
        parity += (*q == '"');
        if (*q == '\n' && (parity & 1) == 0) {
          split = q + 1;
          pos = q + 1;
          break;
        }
      }
      if (!split) break;
      if (split > bounds.back()) bounds.push_back(split);
    }
  }
  bounds.push_back(buf + size);

  std::vector<ChunkOut> chunks(bounds.size() - 1);
  {
    std::vector<std::thread> ts;
    for (size_t c = 0; c < chunks.size(); c++) {
      ts.emplace_back([&, c]() {
        parse_range(bounds[c], bounds[c + 1], c == 0 && has_header != 0,
                    chunks[c]);
      });
    }
    for (auto& t : ts) t.join();
  }

  // sequential merge: global vocab + remapped codes, thread order
  std::vector<int32_t> ucol, icol;
  std::vector<double> rcol, tcol, lcol;
  RawCsvVocab uvoc, ivoc;
  uvoc.reserve(1 << 16);
  ivoc.reserve(1 << 16);
  {
    int64_t total = 0;
    for (auto& c : chunks) total += (int64_t)c.ucol.size();
    ucol.reserve(total);
    icol.reserve(total);
    rcol.reserve(total);
    tcol.reserve(total);
    if (col_label >= 0) lcol.reserve(total);
  }
  for (auto& c : chunks) {
    std::vector<int32_t> umap(c.uvoc.by_id.size()), imap(c.ivoc.by_id.size());
    for (size_t i = 0; i < c.uvoc.by_id.size(); i++)
      umap[i] = uvoc.intern(c.uvoc.by_id[i].first, c.uvoc.by_id[i].second);
    for (size_t i = 0; i < c.ivoc.by_id.size(); i++)
      imap[i] = ivoc.intern(c.ivoc.by_id[i].first, c.ivoc.by_id[i].second);
    for (int32_t code : c.ucol) ucol.push_back(umap[code]);
    for (int32_t code : c.icol) icol.push_back(imap[code]);
    rcol.insert(rcol.end(), c.rcol.begin(), c.rcol.end());
    tcol.insert(tcol.end(), c.tcol.begin(), c.tcol.end());
    lcol.insert(lcol.end(), c.lcol.begin(), c.lcol.end());
  }

  int64_t n = (int64_t)ucol.size();
  auto alloc_copy = [](auto& vec, auto** out) {
    using T = typename std::remove_reference<decltype(vec)>::type::value_type;
    *out = (T*)malloc((vec.size() > 0 ? vec.size() : 1) * sizeof(T));
    memcpy(*out, vec.data(), vec.size() * sizeof(T));
  };
  alloc_copy(ucol, ucodes);
  alloc_copy(icol, icodes);
  alloc_copy(rcol, ratings);
  alloc_copy(tcol, ts_out);
  alloc_copy(lcol, labels);
  export_vocab(uvoc, uvoc_buf, uvoc_off, n_uvoc);
  export_vocab(ivoc, ivoc_buf, ivoc_off, n_ivoc);
  // vocab entries view into buf / the chunk arenas; the exports above copied
  // them, so both can be released now (arenas die with `chunks`)
  free(buf);
  return n;
}

}  // extern "C"
