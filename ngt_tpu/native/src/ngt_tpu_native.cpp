// Native host runtime for ngt_tpu.
//
// The reference implements its entire host runtime in C++ (layer 1:
// lib/NGT/Common.h repositories/serializers, ObjectRepository.h TSV
// ingestion, Graph.h sorted edge insertion).  The TPU rebuild keeps compute
// on the device, but two host paths are hot enough to be native:
//
//  * tsv_parse  — bulk TSV vector ingestion (the reference's data-load phase
//    is 15.5 s for SIFT1M, bin/ngtqg/README.md:86-93; numpy.loadtxt is far
//    slower still).  strtof-based single-pass parser, extra columns ignored
//    like ObjectRepository::appendText (ObjectRepository.h:108-145).
//
//  * merge_edges — the serial graph-update phase of batched ANNG build
//    (the analogue of the coordinator-thread insert,
//    reference Index.cpp:670-719): bulk sorted-insert of reverse edges into
//    fixed-width rows, dropping the farthest edge when a row is full
//    (addEdgeDeletingExcessEdges semantics, Graph.h:888-934).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parse up to max_rows lines of TSV floats into out[max_rows * dim].
// Columns beyond `dim` are ignored; lines with fewer than `dim` columns are
// zero-padded.  Returns rows parsed, or -1 on I/O error.
long tsv_parse(const char *path, float *out, long max_rows, long dim) {
  FILE *fh = std::fopen(path, "rb");
  if (!fh) return -1;
  long rows = 0;
  char *line = nullptr;
  size_t cap = 0;
  ssize_t len;
  while (rows < max_rows && (len = getline(&line, &cap, fh)) != -1) {
    if (len == 0 || line[0] == '\n') continue;
    char *p = line;
    float *dst = out + rows * dim;
    long col = 0;
    while (col < dim) {
      char *end = p;
      float v = strtof(p, &end);
      if (end == p) break;  // no more numbers on this line
      dst[col++] = v;
      p = end;
      while (*p == '\t' || *p == ' ' || *p == ',') ++p;
      if (*p == '\n' || *p == '\0') break;
    }
    if (col == 0) continue;  // no parseable numbers (e.g. a header line):
                             // ignore like ObjectRepository::appendText
                             // rather than inserting a zero vector
    for (; col < dim; ++col) dst[col] = 0.0f;
    ++rows;
  }
  free(line);
  std::fclose(fh);
  return rows;
}

// Count data rows of a file (for pre-allocation).
long tsv_count_rows(const char *path) {
  FILE *fh = std::fopen(path, "rb");
  if (!fh) return -1;
  long rows = 0;
  int c, prev = '\n';
  bool nonempty = false;
  while ((c = std::fgetc(fh)) != EOF) {
    if (c == '\n') {
      if (nonempty) ++rows;
      nonempty = false;
    } else {
      nonempty = true;
    }
    prev = c;
  }
  (void)prev;
  if (nonempty) ++rows;
  std::fclose(fh);
  return rows;
}

// Bulk sorted-insert of edges target->src into fixed-width rows.
//   nbr_ids  [cap * e_max] int32, -1 padded, each row ascending by dist
//   nbr_dist [cap * e_max] float, +inf padded
//   degree   [cap] int32
//   has_node [cap] uint8
// adds: (targets[i] -> srcs[i], dists[i]) for i < n_adds.
// Duplicate (target, src) pairs are skipped; full rows drop the farthest.
void merge_edges(int32_t *nbr_ids, float *nbr_dist, int32_t *degree,
                 uint8_t *has_node, int64_t e_max, const int64_t *targets,
                 const int32_t *srcs, const float *dists, int64_t n_adds) {
  if (n_adds <= 0) return;
  // group adds by target
  std::vector<int64_t> order(n_adds);
  for (int64_t i = 0; i < n_adds; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return targets[a] < targets[b];
  });
  // group starts (one group per distinct target; groups touch disjoint
  // rows, so they parallelize freely — the analogue of the reference's
  // serial coordinator insert, spread over threads)
  std::vector<int64_t> starts;
  starts.reserve(1024);
  for (int64_t i = 0; i < n_adds; ++i)
    if (i == 0 || targets[order[i]] != targets[order[i - 1]])
      starts.push_back(i);
  starts.push_back(n_adds);
  const int64_t n_groups = static_cast<int64_t>(starts.size()) - 1;

  auto work = [&](int64_t g0, int64_t g1) {
    std::vector<std::pair<float, int32_t>> row;
    row.reserve(e_max * 2);
    for (int64_t g = g0; g < g1; ++g) {
      const int64_t i0 = starts[g], i1 = starts[g + 1];
      const int64_t t = targets[order[i0]];
      int32_t *ids = nbr_ids + t * e_max;
      float *ds = nbr_dist + t * e_max;
      row.clear();
      for (int64_t j = 0; j < e_max && ids[j] >= 0; ++j)
        row.emplace_back(ds[j], ids[j]);
      const size_t existing = row.size();
      for (int64_t i = i0; i < i1; ++i) {
        const int32_t s = srcs[order[i]];
        if (s < 0) continue;
        bool dup = false;
        for (size_t j = 0; j < row.size(); ++j)
          if (row[j].second == s) { dup = true; break; }
        if (!dup) row.emplace_back(dists[order[i]], s);
      }
      if (row.size() != existing) {
        std::stable_sort(row.begin(), row.end(),
                         [](const std::pair<float, int32_t> &a,
                            const std::pair<float, int32_t> &b) {
                           return a.first < b.first;
                         });
        const int64_t n = std::min<int64_t>(row.size(), e_max);
        for (int64_t j = 0; j < n; ++j) {
          ds[j] = row[j].first;
          ids[j] = row[j].second;
        }
        for (int64_t j = n; j < e_max; ++j) {
          ds[j] = __builtin_inff();
          ids[j] = -1;
        }
        degree[t] = static_cast<int32_t>(n);
        has_node[t] = 1;
      }
    }
  };

  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? static_cast<int64_t>(hw) : 4;
  if (n_threads > n_groups / 64) n_threads = n_groups / 64;  // small batches
  if (n_threads <= 1) {
    work(0, n_groups);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  const int64_t per = (n_groups + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t g0 = t * per;
    const int64_t g1 = std::min(g0 + per, n_groups);
    if (g0 >= g1) break;
    pool.emplace_back(work, g0, g1);
  }
  for (auto &th : pool) th.join();
}

// Constrained reverse-edge selection — the serial core of
// reconstructGraphWithConstraint (reference GraphReconstructor.h:565-715):
// process reverse lists smallest-first; add reversed edge (rid -> src)
// unless src already received `in_edges` reversed edges, or rid's row is
// full (`out_edges`) and src already has at least one.  Emits the selected
// (rid, src, dist) triples; returns the count (<= total input edges).
int64_t constrained_reverse(const int32_t *nbr, const float *dist,
                            const int32_t *deg, int64_t n, int64_t e_w,
                            int64_t out_edges, int64_t in_edges,
                            int32_t *out_rid, int32_t *out_src,
                            float *out_d) {
  // reverse CSR: rev[t] = list of (src, d) for edges src -> t, src ascending
  std::vector<int64_t> rcount(n, 0);
  for (int64_t u = 0; u < n; ++u)
    for (int64_t j = 0; j < deg[u]; ++j) {
      const int32_t t = nbr[u * e_w + j];
      if (t >= 0 && t < n) ++rcount[t];
    }
  std::vector<int64_t> rstart(n + 1, 0);
  for (int64_t t = 0; t < n; ++t) rstart[t + 1] = rstart[t] + rcount[t];
  std::vector<int32_t> rsrc(rstart[n]);
  std::vector<float> rd(rstart[n]);
  std::vector<int64_t> fill(rstart.begin(), rstart.end() - 1);
  for (int64_t u = 0; u < n; ++u)  // ascending u preserves the reference's
    for (int64_t j = 0; j < deg[u]; ++j) {  // push order (id-major)
      const int32_t t = nbr[u * e_w + j];
      if (t < 0 || t >= n) continue;
      rsrc[fill[t]] = static_cast<int32_t>(u);
      rd[fill[t]] = dist[u * e_w + j];
      ++fill[t];
    }
  // rids by increasing reverse-list size (stable: ties by id)
  std::vector<int32_t> order;
  order.reserve(n);
  for (int64_t t = 0; t < n; ++t)
    if (rcount[t] > 0) order.push_back(static_cast<int32_t>(t));
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return rcount[a] < rcount[b];
  });
  std::vector<int32_t> indeg(n, 0), outdeg(n, 0);
  int64_t m = 0;
  for (const int32_t rid : order) {
    for (int64_t p = rstart[rid]; p < rstart[rid] + rcount[rid]; ++p) {
      const int32_t s = rsrc[p];
      if (indeg[s] >= in_edges) continue;
      if (indeg[s] > 0 && outdeg[rid] >= out_edges) continue;
      out_rid[m] = rid;
      out_src[m] = s;
      out_d[m] = rd[p];
      ++m;
      ++indeg[s];
      ++outdeg[rid];
    }
  }
  return m;
}

// Connected components of the (undirected view of the) adjacency.
//   nbr_ids [n * e_max] int32, -1 padded;  has_node [n] uint8
//   labels  [n] int32 out: component root id per node, -1 for non-nodes.
// Union-find with path halving; ~64M edges in about a second.
int64_t connected_components(const int32_t *nbr_ids, const uint8_t *has_node,
                             int64_t n, int64_t e_max, int32_t *labels) {
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  auto find = [&](int32_t v) {
    while (parent[v] != v) {
      parent[v] = parent[parent[v]];  // path halving
      v = parent[v];
    }
    return v;
  };
  for (int64_t u = 0; u < n; ++u) {
    if (!has_node[u]) continue;
    const int32_t *row = nbr_ids + u * e_max;
    for (int64_t j = 0; j < e_max; ++j) {
      const int32_t v = row[j];
      if (v < 0) break;  // rows are -1 padded at the tail
      if (v >= n || !has_node[v]) continue;
      int32_t ru = find(static_cast<int32_t>(u)), rv = find(v);
      if (ru != rv) parent[rv] = ru;
    }
  }
  int64_t roots = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!has_node[i]) {
      labels[i] = -1;
    } else {
      labels[i] = find(static_cast<int32_t>(i));
      if (labels[i] == static_cast<int32_t>(i)) ++roots;
    }
  }
  return roots;
}

// Merge extra undirected edges (given in LABEL space) into an existing
// component labeling: labels[n] int32 in/out holds a component
// representative per node (-1 for non-nodes; a representative's label is
// itself).  Pairs (a[i], b[i]) are representative ids to union — the
// device-extracted edges that CROSS the initial components.  On return
// labels hold the MIN node id of each merged component.  Returns the
// component count.
int64_t union_pairs(int32_t *labels, int64_t n, const int32_t *a,
                    const int32_t *b, int64_t m) {
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i)
    parent[i] = labels[i] >= 0 ? labels[i] : static_cast<int32_t>(i);
  auto find = [&](int32_t v) {
    while (parent[v] != v) {
      parent[v] = parent[parent[v]];  // path halving
      v = parent[v];
    }
    return v;
  };
  for (int64_t i = 0; i < m; ++i) {
    const int32_t x = a[i], y = b[i];
    if (x < 0 || x >= n || y < 0 || y >= n) continue;
    const int32_t rx = find(x), ry = find(y);
    if (rx != ry) parent[ry] = rx;
  }
  std::vector<int32_t> mn(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    if (labels[i] < 0) continue;
    const int32_t r = find(static_cast<int32_t>(i));
    if (mn[r] < 0 || static_cast<int32_t>(i) < mn[r])
      mn[r] = static_cast<int32_t>(i);
  }
  int64_t comps = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (labels[i] < 0) continue;
    const int32_t r = find(static_cast<int32_t>(i));
    labels[i] = mn[r];
    if (mn[r] == static_cast<int32_t>(i)) ++comps;
  }
  return comps;
}

// ---- text export/import (the Serializer analogue, Common.h:668-809) ------
//
// The lossless v2 text stream (Index::exportIndex twin, Index.h:703-727)
// spends all its time formatting/parsing floats; Python-level repr()/float()
// per element is ~100x slower than these single-pass C loops.  %.9g is
// lossless for binary32 (9 significant digits uniquely identify a float).

// Shortest-exact f32 formatting with an integer fast path (u8/encoded
// corpora are overwhelmingly small integers; snprintf "%.9g" costs ~430 ns
// while the digit loop costs ~20 ns).  %.9g is lossless for binary32.
static inline char *fmt_f32(char *p, float v) {
  const int64_t iv = static_cast<int64_t>(v);
  if (v == static_cast<float>(iv) && iv > -16777216 && iv < 16777216) {
    uint64_t u = iv < 0 ? (*p++ = '-', static_cast<uint64_t>(-iv))
                        : static_cast<uint64_t>(iv);
    char tmp[12];
    int k = 0;
    do {
      tmp[k++] = static_cast<char>('0' + u % 10);
      u /= 10;
    } while (u);
    while (k) *p++ = tmp[--k];
    return p;
  }
  return p + snprintf(p, 20, "%.9g", static_cast<double>(v));
}

// Format `n` object rows: "+v\tv...\n" when valid[i], else "-\n".
// Returns bytes written, or -1 if `cap` would be exceeded.
int64_t format_obj_rows(const float *x, const uint8_t *valid, int64_t n,
                        int64_t d, char *out, int64_t cap) {
  char *p = out;
  char *end = out + cap;
  for (int64_t i = 0; i < n; ++i) {
    if (end - p < 2 + d * 20) return -1;
    if (!valid[i]) {
      *p++ = '-';
      *p++ = '\n';
      continue;
    }
    *p++ = '+';
    const float *row = x + i * d;
    for (int64_t j = 0; j < d; ++j) {
      if (j) *p++ = '\t';
      p = fmt_f32(p, row[j]);
    }
    *p++ = '\n';
  }
  return p - out;
}

// Format `n` graph rows: "id:dist\tid:dist...\n" for nodes (empty line for
// degree-0 nodes), "-\n" for non-nodes.  Returns bytes written or -1.
int64_t format_graph_rows(const int32_t *nbr, const float *dist,
                          const int32_t *deg, const uint8_t *has, int64_t n,
                          int64_t e, char *out, int64_t cap) {
  char *p = out;
  char *end = out + cap;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t dg = has[i] ? deg[i] : 0;
    if (end - p < 2 + dg * 34) return -1;
    if (!has[i]) {
      *p++ = '-';
      *p++ = '\n';
      continue;
    }
    const int32_t *ids = nbr + i * e;
    const float *ds = dist + i * e;
    for (int64_t j = 0; j < dg; ++j) {
      if (j) *p++ = '\t';
      p += snprintf(p, 13, "%d", ids[j]);
      *p++ = ':';
      p = fmt_f32(p, ds[j]);
    }
    *p++ = '\n';
  }
  return p - out;
}

// Parse `n` object rows from buf back into x[n*d] / valid[n].
// Accepts both %.9g and Python-repr floats.  Returns bytes consumed or -1.
int64_t parse_obj_rows(const char *buf, int64_t len, int64_t n, int64_t d,
                       float *x, uint8_t *valid) {
  const char *p = buf;
  const char *end = buf + len;
  for (int64_t i = 0; i < n; ++i) {
    if (p >= end) return -1;
    if (*p == '-') {
      valid[i] = 0;
      for (int64_t j = 0; j < d; ++j) x[i * d + j] = 0.0f;
      while (p < end && *p != '\n') ++p;
      ++p;
      continue;
    }
    if (*p != '+') return -1;
    ++p;
    valid[i] = 1;
    float *row = x + i * d;
    for (int64_t j = 0; j < d; ++j) {
      char *q;
      row[j] = strtof(p, &q);
      if (q == p) return -1;
      p = q;
      if (*p == '\t') ++p;
    }
    while (p < end && *p != '\n') ++p;
    ++p;
  }
  return p - buf;
}

// Parse `n` graph rows back into fixed-width adjacency.  Returns bytes
// consumed or -1.
int64_t parse_graph_rows(const char *buf, int64_t len, int64_t n, int64_t e,
                         int32_t *nbr, float *dist, int32_t *deg,
                         uint8_t *has) {
  const char *p = buf;
  const char *end = buf + len;
  for (int64_t i = 0; i < n; ++i) {
    int32_t *ids = nbr + i * e;
    float *ds = dist + i * e;
    for (int64_t j = 0; j < e; ++j) {
      ids[j] = -1;
      ds[j] = __builtin_inff();
    }
    if (p >= end) return -1;
    if (*p == '-' && (p + 1 >= end || p[1] == '\n')) {
      has[i] = 0;
      deg[i] = 0;
      while (p < end && *p != '\n') ++p;
      ++p;
      continue;
    }
    has[i] = 1;
    int64_t dg = 0;
    while (p < end && *p != '\n' && dg < e) {
      char *q;
      const long id = strtol(p, &q, 10);
      if (q == p) break;  // empty line: degree-0 node
      p = q;
      if (*p != ':') return -1;
      ++p;
      const float dd = strtof(p, &q);
      if (q == p) return -1;
      p = q;
      ids[dg] = static_cast<int32_t>(id);
      ds[dg] = dd;
      ++dg;
      if (*p == '\t') ++p;
    }
    deg[i] = static_cast<int32_t>(dg);
    while (p < end && *p != '\n') ++p;
    ++p;
  }
  return p - buf;
}

// Rank-ordered shortcut re-insertion — phase 2 of path adjustment
// (adjustPathsEffectively, reference GraphReconstructor.h:197-386).  The
// device pass (graph/reconstruct.py _detect_shortcuts_all) has already
// bit-packed, per node u and edge ranks (v_rank, w_rank), whether the
// two-hop u->v->w triangle shortcuts u->w; this serial pass replays edges
// in rank order keeping u->w only when no KEPT two-hop path exists yet.
//
//   nbr   [n, e]      adjacency, -1 padded, rows distance-sorted
//   deg   [n]         out-degrees
//   cand  [n, e, eb8] candidate bits, w axis packed big-endian per byte
//   kept  [n, e]      OUT 0/1
//
// pos(w in v's row) is resolved by binary search over a per-node id-sorted
// permutation built once (the numpy rank loop paid a full [n,e] unpack +
// argmax gather per rank — 849-1,023 s at 1M/e=130; this pass is seconds).
//
// snap_period parametrizes the rank-visibility rule R(C) shared with the
// device implementation (graph/reconstruct.py _adjust_phase2_dev): the
// inner-edge survival view kept[v, pos] is a SNAPSHOT refreshed every C
// ranks; inner edges decided within the current snapshot window [r0, r)
// count as PRESENT (their survival is not yet visible), while the u-row's
// own kept[u, v_rank] stays fully live.  R(1) is the exact rank-synchronous
// rule (snapshot == previous ranks, empty window) — the historical
// behavior.  Any C yields a valid shortcut reduction: every dropped edge
// has a 2-hop detour of strictly shorter edges, so detour chains terminate
// by distance descent (same argument as the reference's global
// shortest-first order, adjustPathsEffectively GraphReconstructor.h:197).
// Returns kept-edge count, or -1 on alloc failure.
int64_t adjust_paths_phase2(const int32_t *nbr, const int32_t *deg,
                            const uint8_t *cand, int64_t n, int64_t e,
                            int64_t eb8, int64_t min_edges,
                            int64_t snap_period, uint8_t *kept) {
  if (n <= 0 || e <= 0) return 0;
  // id-sorted permutation per node: sorted_ids[u*e+j] ascending, with
  // sorted_rank[u*e+j] = original rank of that id
  std::vector<int32_t> sorted_ids;
  std::vector<int16_t> sorted_rank;
  std::vector<int32_t> kept_count(n, 0);
  try {
    sorted_ids.resize((size_t)n * e);
    sorted_rank.resize((size_t)n * e);
  } catch (...) {
    return -1;
  }
  std::vector<int16_t> perm(e);
  for (int64_t u = 0; u < n; ++u) {
    const int32_t *row = nbr + (size_t)u * e;
    int64_t d = deg[u] < e ? deg[u] : e;
    for (int64_t j = 0; j < d; ++j) perm[j] = (int16_t)j;
    std::sort(perm.begin(), perm.begin() + d,
              [row](int16_t a, int16_t b) { return row[a] < row[b]; });
    int32_t *si = sorted_ids.data() + (size_t)u * e;
    int16_t *sr = sorted_rank.data() + (size_t)u * e;
    for (int64_t j = 0; j < d; ++j) {
      si[j] = row[perm[j]];
      sr[j] = perm[j];
    }
    for (int64_t j = d; j < e; ++j) si[j] = INT32_MAX;  // search sentinel
  }
  std::memset(kept, 0, (size_t)n * e);
  if (snap_period < 1) snap_period = e > 0 ? e : 1;
  std::vector<uint8_t> snapbuf;
  const bool snapshot = snap_period > 1;
  if (snapshot) {
    try {
      snapbuf.assign((size_t)n * e, 0);
    } catch (...) {
      return -1;
    }
  }
  const uint8_t *snapp = snapshot ? snapbuf.data() : kept;
  int64_t total = 0;
  int64_t r0 = 0;
  for (int64_t r = 0; r < e; ++r) {
    if (snapshot) {
      if (r % snap_period == 0) {
        std::memcpy(snapbuf.data(), kept, (size_t)n * e);
        r0 = r;
      }
    } else {
      r0 = r;  // R(1): snapshot IS the live array, window empty
    }
    const int64_t byte_r = r >> 3;
    const int shift_r = 7 - (int)(r & 7);
    for (int64_t u = 0; u < n; ++u) {
      if (r >= deg[u]) continue;
      bool drop = false;
      if (kept_count[u] + (deg[u] - r) > min_edges) {
        const int32_t w = nbr[(size_t)u * e + r];
        const uint8_t *cu = cand + ((size_t)u * e) * eb8 + byte_r;
        const uint8_t *ku = kept + (size_t)u * e;
        // v_rank < r: only earlier-rank edges can already be kept (the
        // u-row's own kept state is LIVE under every snap_period)
        for (int64_t v_rank = 0; v_rank < r; ++v_rank) {
          if (!ku[v_rank]) continue;
          if (!((cu[(size_t)v_rank * eb8] >> shift_r) & 1)) continue;
          const int32_t v = nbr[(size_t)u * e + v_rank];
          if (v < 0 || v >= n) continue;
          // first occurrence of w in v's row (rows are duplicate-free)
          const int32_t *si = sorted_ids.data() + (size_t)v * e;
          const int32_t *lo = std::lower_bound(si, si + e, w);
          if (lo != si + e && *lo == w) {
            const int16_t pos = sorted_rank[(size_t)v * e + (lo - si)];
            // pos < r0: survival via the snapshot; [r0, r): presence rule
            // (pos >= r is undecided future — never counts)
            if (pos < r0 ? snapp[(size_t)v * e + pos] : pos < r) {
              drop = true;
              break;
            }
          }
        }
      }
      if (!drop) {
        kept[(size_t)u * e + r] = 1;
        ++kept_count[u];
        ++total;
      }
    }
  }
  return total;
}

// Resolve distances for already-known edges: out[u, j] = dist of edge
// (u -> qnbr[u, j]) looked up in u's ORIGINAL row (id-sorted per-node
// permutation + binary search, same scheme as adjust_paths_phase2).  Lets
// the device ONNG path download only the adjacency ids — the f32 distance
// half of the row download (~0.5 GB at 1M) is recomputable host-side in
// ~1 s.  With symmetric != 0, an id absent from u's row falls back to the
// MIRROR edge (qnbr[u,j] -> u) — reconstruction-family rows are unions of
// original and reversed edges, so one of the two directions always exists
// in the source graph.  Missing both ways gets +inf (a bug signal).
void edge_dist_lookup(const int32_t *nbr, const float *dist,
                      const int32_t *deg, int64_t n, int64_t w,
                      const int32_t *qnbr, const int32_t *qdeg, int64_t qw,
                      int64_t symmetric, float *out) {
  // id-sorted view of every source row (row-major + id-ascending within a
  // row = globally ascending (u << 32 | id) keys, enabling the mirror
  // lookup without any global sort)
  std::vector<int32_t> sids((size_t)n * w, INT32_MAX);
  std::vector<int16_t> sranks((size_t)n * w);
  std::vector<int16_t> perm(w);
  for (int64_t u = 0; u < n; ++u) {
    const int32_t *row = nbr + (size_t)u * w;
    int64_t d = deg[u] < w ? deg[u] : w;
    for (int64_t j = 0; j < d; ++j) perm[j] = (int16_t)j;
    std::sort(perm.begin(), perm.begin() + d,
              [row](int16_t a, int16_t b) { return row[a] < row[b]; });
    int32_t *si = sids.data() + (size_t)u * w;
    int16_t *sr = sranks.data() + (size_t)u * w;
    for (int64_t j = 0; j < d; ++j) {
      si[j] = row[perm[j]];
      sr[j] = perm[j];
    }
  }
  auto find = [&](int64_t u, int32_t t) -> float {
    const int32_t *si = sids.data() + (size_t)u * w;
    const int32_t *lo = std::lower_bound(si, si + w, t);
    if (lo != si + w && *lo == t)
      return dist[(size_t)u * w + sranks[(size_t)u * w + (lo - si)]];
    return __builtin_inff();
  };
  for (int64_t u = 0; u < n; ++u) {
    const int32_t *qrow = qnbr + (size_t)u * qw;
    float *orow = out + (size_t)u * qw;
    const int64_t qd = qdeg[u] < qw ? qdeg[u] : qw;
    for (int64_t j = 0; j < qw; ++j) orow[j] = __builtin_inff();
    for (int64_t j = 0; j < qd; ++j) {
      const int32_t t = qrow[j];
      float v = find(u, t);
      if (symmetric && !(v < __builtin_inff()) && t >= 0 && t < n)
        v = find(t, (int32_t)u);
      orow[j] = v;
    }
  }
}

}  // extern "C"
