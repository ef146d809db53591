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

  std::vector<std::pair<float, int32_t>> row;
  row.reserve(e_max * 2);
  int64_t i = 0;
  while (i < n_adds) {
    const int64_t t = targets[order[i]];
    int32_t *ids = nbr_ids + t * e_max;
    float *ds = nbr_dist + t * e_max;
    row.clear();
    for (int64_t j = 0; j < e_max && ids[j] >= 0; ++j)
      row.emplace_back(ds[j], ids[j]);
    const size_t existing = row.size();
    for (; i < n_adds && targets[order[i]] == t; ++i) {
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

}  // extern "C"
