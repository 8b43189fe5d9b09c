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

}  // extern "C"
