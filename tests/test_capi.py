"""C ABI surface: a real C program drives the index through the shim
(the analogue of the reference's C API, lib/NGT/Capi.h:60-212 — the FULL
surface: create (on-disk + in-memory), property set/get, insert/append
(single/double/float/batch), build, search (double/float/query-struct/
linear), results accessors, object space accessors, graph edges, refine,
optimizer objects, edge-count optimization, save/open, remove, error
objects, plus the NGTQG surface NGTQ/Capi.h:126-136)."""

import os
import subprocess
import sys
import sysconfig

import pytest

from ngt_tpu import native

C_TEST = r"""
#include <math.h>
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef void *NGTIndex;
typedef void *NGTProperty;
typedef void *NGTObjectSpace;
typedef void *NGTObjectDistances;
typedef void *NGTError;
typedef void *NGTOptimizer;
typedef uint32_t ObjectID;
typedef struct { ObjectID id; float distance; } NGTObjectDistance;
typedef struct {
  float *query; size_t size; float epsilon; float accuracy; float radius;
  size_t edge_size;
} NGTQuery;
typedef struct {
  size_t no_of_queries; size_t no_of_results; size_t no_of_threads;
  float target_accuracy; size_t target_no_of_objects;
  size_t no_of_sample_objects; size_t max_of_no_of_edges; bool log;
} NGTAnngEdgeOptimizationParameter;

extern NGTError ngt_create_error_object(void);
extern const char *ngt_get_error_string(const NGTError);
extern void ngt_clear_error_string(NGTError);
extern void ngt_destroy_error_object(NGTError);

extern NGTProperty ngt_create_property(NGTError);
extern bool ngt_set_property_dimension(NGTProperty, int32_t, NGTError);
extern bool ngt_set_property_edge_size_for_creation(NGTProperty, int16_t, NGTError);
extern bool ngt_set_property_edge_size_for_search(NGTProperty, int16_t, NGTError);
extern bool ngt_set_property_distance_type_l2(NGTProperty, NGTError);
extern bool ngt_set_property_object_type_float(NGTProperty, NGTError);
extern void ngt_destroy_property(NGTProperty);
extern bool ngt_get_property(NGTIndex, NGTProperty, NGTError);
extern int32_t ngt_get_property_dimension(NGTProperty, NGTError);
extern int16_t ngt_get_property_edge_size_for_creation(NGTProperty, NGTError);
extern int16_t ngt_get_property_edge_size_for_search(NGTProperty, NGTError);
extern int32_t ngt_get_property_object_type(NGTProperty, NGTError);
extern int32_t ngt_get_property_distance_type(NGTProperty, NGTError);
extern bool ngt_is_property_object_type_float(int32_t);
extern bool ngt_is_property_object_type_integer(int32_t);

extern NGTIndex ngt_create_graph_and_tree(const char *, NGTProperty, NGTError);
extern NGTIndex ngt_create_graph_and_tree_in_memory(NGTProperty, NGTError);
extern NGTIndex ngt_open_index(const char *, NGTError);
extern void ngt_close_index(NGTIndex);

extern ObjectID ngt_insert_index(NGTIndex, double *, uint32_t, NGTError);
extern ObjectID ngt_append_index(NGTIndex, double *, uint32_t, NGTError);
extern ObjectID ngt_insert_index_as_float(NGTIndex, float *, uint32_t, NGTError);
extern ObjectID ngt_append_index_as_float(NGTIndex, float *, uint32_t, NGTError);
extern bool ngt_batch_append_index(NGTIndex, float *, uint32_t, NGTError);
extern bool ngt_batch_insert_index(NGTIndex, float *, uint32_t, uint32_t *, NGTError);
extern bool ngt_create_index(NGTIndex, uint32_t, NGTError);
extern bool ngt_remove_index(NGTIndex, ObjectID, NGTError);
extern bool ngt_save_index(NGTIndex, const char *, NGTError);

extern NGTObjectDistances ngt_create_empty_results(NGTError);
extern void ngt_destroy_results(NGTObjectDistances);
extern int32_t ngt_get_size(NGTObjectDistances, NGTError);
extern uint32_t ngt_get_result_size(NGTObjectDistances, NGTError);
extern NGTObjectDistance ngt_get_result(const NGTObjectDistances, uint32_t, NGTError);

extern bool ngt_search_index(NGTIndex, double *, int32_t, size_t,
                             float, float, NGTObjectDistances, NGTError);
extern bool ngt_search_index_as_float(NGTIndex, float *, int32_t, size_t,
                                      float, float, NGTObjectDistances, NGTError);
extern bool ngt_search_index_with_query(NGTIndex, NGTQuery, NGTObjectDistances, NGTError);
extern bool ngt_linear_search_index(NGTIndex, double *, int32_t, size_t,
                                    NGTObjectDistances, NGTError);
extern bool ngt_linear_search_index_as_float(NGTIndex, float *, int32_t, size_t,
                                             NGTObjectDistances, NGTError);
extern bool ngt_linear_search_index_with_query(NGTIndex, NGTQuery,
                                               NGTObjectDistances, NGTError);

extern uint32_t ngt_get_number_of_objects(NGTIndex, NGTError);
extern uint32_t ngt_get_object_repository_size(NGTIndex, NGTError);
extern NGTObjectSpace ngt_get_object_space(NGTIndex, NGTError);
extern float *ngt_get_object_as_float(NGTObjectSpace, ObjectID, NGTError);
extern uint8_t *ngt_get_object_as_integer(NGTObjectSpace, ObjectID, NGTError);
extern bool ngt_get_edges(NGTIndex, ObjectID, NGTObjectDistances, NGTError);
extern bool ngt_refine_anng(NGTIndex, float, float, int, int, size_t, NGTError);

extern NGTOptimizer ngt_create_optimizer(bool, NGTError);
extern bool ngt_optimizer_set(NGTOptimizer, int, int, int, float, float,
                              float, float, double, double, NGTError);
extern bool ngt_optimizer_set_minimum(NGTOptimizer, int, int, int, int, NGTError);
extern bool ngt_optimizer_set_extension(NGTOptimizer, float, float, float,
                                        float, double, double, NGTError);
extern bool ngt_optimizer_set_processing_modes(NGTOptimizer, bool, bool, bool, NGTError);
extern bool ngt_optimizer_execute(NGTOptimizer, const char *, const char *, NGTError);
extern bool ngt_optimizer_adjust_search_coefficients(NGTOptimizer, const char *, NGTError);
extern void ngt_destroy_optimizer(NGTOptimizer);
extern NGTAnngEdgeOptimizationParameter ngt_get_anng_edge_optimization_parameter(void);
extern bool ngt_optimize_number_of_edges(const char *,
                                         NGTAnngEdgeOptimizationParameter, NGTError);

typedef void *NGTQGIndex;
typedef struct {
  float *query; size_t size; float epsilon; float result_expansion;
  float radius;
} NGTQGQuery;
typedef struct {
  float dimension_of_subvector; size_t max_number_of_edges;
} NGTQGQuantizationParameters;
extern NGTQGIndex ngtqg_open_index(const char *, NGTError);
extern void ngtqg_initialize_quantization_parameters(NGTQGQuantizationParameters *);
extern bool ngtqg_quantize(const char *, NGTQGQuantizationParameters, NGTError);
extern void ngtqg_initialize_query(NGTQGQuery *);
extern bool ngtqg_search_index(NGTQGIndex, NGTQGQuery, NGTObjectDistances, NGTError);
extern void ngtqg_close_index(NGTQGIndex);

#define CHECK(cond, msg) \
  if (!(cond)) { fprintf(stderr, "FAIL: %s: %s\n", msg, ngt_get_error_string(err)); return 1; }

static void fill(float *v, int i) {
  for (int d = 0; d < 8; d++) v[d] = (float)((i * 37 + d * 11) % 97) / 10.0f;
}

int main(int argc, char **argv) {
  const char *path = argv[1];
  char path2[1024];
  snprintf(path2, sizeof(path2), "%s.onng", path);
  NGTError err = ngt_create_error_object();
  NGTProperty prop = ngt_create_property(err);
  CHECK(ngt_set_property_dimension(prop, 8, err), "dimension");
  CHECK(ngt_set_property_edge_size_for_creation(prop, 8, err), "edges");
  CHECK(ngt_set_property_edge_size_for_search(prop, 16, err), "search edges");
  CHECK(ngt_set_property_distance_type_l2(prop, err), "metric");
  CHECK(ngt_set_property_object_type_float(prop, err), "object type");
  NGTIndex idx = ngt_create_graph_and_tree(path, prop, err);
  CHECK(idx != NULL, "create");
  ngt_destroy_property(prop);

  /* insert 200 vectors through all four single-object entry points */
  float v[8];
  double dv[8];
  for (int i = 0; i < 200; i++) {
    fill(v, i);
    ObjectID id;
    switch (i % 4) {
      case 0: id = ngt_insert_index_as_float(idx, v, 8, err); break;
      case 1: id = ngt_append_index_as_float(idx, v, 8, err); break;
      case 2:
        for (int d = 0; d < 8; d++) dv[d] = (double)v[d];
        id = ngt_insert_index(idx, dv, 8, err);
        break;
      default:
        for (int d = 0; d < 8; d++) dv[d] = (double)v[d];
        id = ngt_append_index(idx, dv, 8, err);
    }
    CHECK(id == (ObjectID)(i + 1), "1-based insert id");
  }
  /* batch entry points */
  float batch[10 * 8];
  for (int i = 0; i < 10; i++) fill(batch + i * 8, 200 + i);
  CHECK(ngt_batch_append_index(idx, batch, 10, err), "batch append");
  uint32_t ids[10];
  for (int i = 0; i < 10; i++) fill(batch + i * 8, 210 + i);
  CHECK(ngt_batch_insert_index(idx, batch, 10, ids, err), "batch insert");
  CHECK(ids[0] == 211 && ids[9] == 220, "batch insert ids");

  CHECK(ngt_create_index(idx, 4, err), "build");
  CHECK(ngt_get_number_of_objects(idx, err) == 220, "count");
  CHECK(ngt_get_object_repository_size(idx, err) >= 220, "repo size");

  /* property readback */
  NGTProperty got = ngt_create_property(err);
  CHECK(ngt_get_property(idx, got, err), "get property");
  CHECK(ngt_get_property_dimension(got, err) == 8, "get dimension");
  CHECK(ngt_get_property_edge_size_for_creation(got, err) == 8, "get E");
  CHECK(ngt_get_property_edge_size_for_search(got, err) == 16, "get S");
  int32_t ot = ngt_get_property_object_type(got, err);
  CHECK(ngt_is_property_object_type_float(ot), "object type float");
  CHECK(!ngt_is_property_object_type_integer(ot), "object type not int");
  CHECK(ngt_get_property_distance_type(got, err) == 1, "distance L2=1");
  ngt_destroy_property(got);

  /* search: double / float / query-struct / linear x3 */
  fill(v, 5);
  for (int d = 0; d < 8; d++) dv[d] = (double)v[d];
  NGTObjectDistances res = ngt_create_empty_results(err);
  CHECK(ngt_search_index(idx, dv, 8, 5, 0.1f, 1e30f, res, err), "search d");
  CHECK(ngt_get_result_size(res, err) == 5, "result size");
  CHECK(ngt_get_size(res, err) == 5, "deprecated size");
  NGTObjectDistance first = ngt_get_result(res, 0, err);
  CHECK(first.id == 6, "self-match id (1-based)");
  CHECK(first.distance < 1e-4, "self-match distance");

  CHECK(ngt_search_index_as_float(idx, v, 8, 5, 0.1f, 1e30f, res, err),
        "search f");
  CHECK(ngt_get_result(res, 0, err).id == 6, "search f id");

  NGTQuery q;
  q.query = v; q.size = 5; q.epsilon = 0.1f; q.accuracy = 0.0f;
  q.radius = 1e30f; q.edge_size = 0;
  CHECK(ngt_search_index_with_query(idx, q, res, err), "search q");
  CHECK(ngt_get_result(res, 0, err).id == 6, "search q id");
  /* expected-accuracy without an accuracy table errors cleanly, like the
     reference (Index.h:1156-1158 throws when the table is absent) */
  q.accuracy = 0.95f;
  CHECK(!ngt_search_index_with_query(idx, q, res, err), "acc needs table");
  ngt_clear_error_string(err);
  q.accuracy = 0.0f;

  CHECK(ngt_linear_search_index(idx, dv, 8, 5, res, err), "linear d");
  CHECK(ngt_get_result(res, 0, err).id == 6, "linear d id");
  CHECK(ngt_linear_search_index_as_float(idx, v, 8, 5, res, err), "linear f");
  CHECK(ngt_get_result(res, 0, err).id == 6, "linear f id");
  q.accuracy = 0.0f;
  CHECK(ngt_linear_search_index_with_query(idx, q, res, err), "linear q");
  CHECK(ngt_get_result(res, 0, err).id == 6, "linear q id");

  /* object space accessors */
  NGTObjectSpace space = ngt_get_object_space(idx, err);
  CHECK(space != NULL, "object space");
  float *obj = ngt_get_object_as_float(space, 6, err);
  CHECK(obj != NULL, "object as float");
  for (int d = 0; d < 8; d++)
    CHECK(fabsf(obj[d] - v[d]) < 1e-6, "object roundtrip");
  uint8_t *iobj = ngt_get_object_as_integer(space, 6, err);
  CHECK(iobj != NULL, "object as integer");
  CHECK(iobj[0] == (uint8_t)v[0], "object int cast");
  /* the object space handle shares the index's lifetime (the reference
     returns a pointer into the index); no separate destroy */

  /* graph edges */
  CHECK(ngt_get_edges(idx, 6, res, err), "get edges");
  uint32_t ne = ngt_get_result_size(res, err);
  CHECK(ne >= 1 && ne <= 64, "edge count");
  NGTObjectDistance e0 = ngt_get_result(res, 0, err);
  CHECK(e0.id >= 1 && e0.id <= 220 && e0.id != 6, "edge id");
  ngt_destroy_results(res);

  /* refine (reference Capi ngt_refine_anng) */
  CHECK(ngt_refine_anng(idx, 0.1f, -1.0f, 0, -2147483647, 64, err), "refine");

  CHECK(ngt_save_index(idx, path, err), "save");
  CHECK(ngt_remove_index(idx, 6, err), "remove");
  ngt_close_index(idx);

  NGTIndex re = ngt_open_index(path, err);
  CHECK(re != NULL, "open");
  CHECK(ngt_get_number_of_objects(re, err) == 220, "reopen count");
  ngt_close_index(re);

  /* in-memory index (no backing directory) */
  prop = ngt_create_property(err);
  CHECK(ngt_set_property_dimension(prop, 8, err), "mem dimension");
  NGTIndex mem = ngt_create_graph_and_tree_in_memory(prop, err);
  CHECK(mem != NULL, "in-memory create");
  ngt_destroy_property(prop);
  fill(v, 3);
  CHECK(ngt_insert_index_as_float(mem, v, 8, err) == 1, "mem insert");
  ngt_close_index(mem);

  /* optimizer surface */
  NGTOptimizer opt = ngt_create_optimizer(true, err);
  CHECK(opt != NULL, "optimizer create");
  CHECK(ngt_optimizer_set(opt, 6, 30, 0, 0.3f, 0.5f, 0.8f, 0.9f, 0.0, 0.0,
                          err), "optimizer set");
  CHECK(ngt_optimizer_set_minimum(opt, 6, 30, 0, 0, err), "optimizer min");
  CHECK(ngt_optimizer_set_extension(opt, 0.3f, 0.5f, 0.8f, 0.9f, 0.0, 0.0,
                                    err), "optimizer ext");
  CHECK(ngt_optimizer_set_processing_modes(opt, true, false, true, err),
        "optimizer modes");
  CHECK(ngt_optimizer_execute(opt, path, path2, err), "optimizer execute");
  CHECK(ngt_optimizer_adjust_search_coefficients(opt, path2, err),
        "optimizer adjust");
  ngt_destroy_optimizer(opt);

  /* edge-count optimization */
  NGTAnngEdgeOptimizationParameter p =
      ngt_get_anng_edge_optimization_parameter();
  CHECK(p.no_of_queries == 200 && p.max_of_no_of_edges == 100,
        "edge param defaults");
  p.target_accuracy = 0.9f;
  CHECK(ngt_optimize_number_of_edges(path, p, err), "optimize edges");

  /* error handling: bogus open must set the error string */
  NGTIndex bad = ngt_open_index("/nonexistent/nowhere", err);
  CHECK(bad == NULL, "bad open returns null");
  CHECK(strlen(ngt_get_error_string(err)) > 0, "error string set");
  ngt_clear_error_string(err);
  CHECK(strlen(ngt_get_error_string(err)) == 0, "error string cleared");

  /* NGTQG surface (reference NGTQ/Capi.h:126-136) */
  NGTQGQuantizationParameters qp;
  ngtqg_initialize_quantization_parameters(&qp);
  CHECK(qp.max_number_of_edges == 128, "qg param defaults");
  CHECK(ngtqg_quantize(path, qp, err), "quantize");
  NGTQGIndex qg = ngtqg_open_index(path, err);
  CHECK(qg != NULL, "qg open");
  NGTQGQuery qq;
  ngtqg_initialize_query(&qq);
  CHECK(qq.size == 20 && qq.result_expansion == 3.0f, "qg query defaults");
  fill(v, 7);
  qq.query = v; qq.size = 5; qq.epsilon = 0.1f;
  NGTObjectDistances qres = ngt_create_empty_results(err);
  CHECK(ngtqg_search_index(qg, qq, qres, err), "qg search");
  CHECK(ngt_get_result_size(qres, err) == 5, "qg result size");
  NGTObjectDistance qfirst = ngt_get_result(qres, 0, err);
  CHECK(qfirst.id == 8, "qg self-match id (1-based)");
  ngt_destroy_results(qres);
  ngtqg_close_index(qg);

  ngt_destroy_error_object(err);
  printf("C API OK\n");
  return 0;
}
"""


@pytest.mark.skipif(not native.available(), reason="no toolchain")
def test_c_program_drives_index(tmp_path):
    so = native.build_capi()
    csrc = tmp_path / "capi_test.c"
    csrc.write_text(C_TEST)
    exe = str(tmp_path / "capi_test")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or ""
    subprocess.run(
        [
            "g++", "-O1", "-o", exe, str(csrc), so,
            f"-L{libdir}", f"-lpython{ver}",
            f"-Wl,-rpath,{os.path.dirname(so)}", f"-Wl,-rpath,{libdir}",
        ],
        check=True, capture_output=True, timeout=120,
    )
    env = dict(os.environ)
    env["NGT_TPU_PLATFORM"] = "cpu"  # the shim pins jax before first use
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [exe, str(tmp_path / "cidx")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, f"stdout={r.stdout!r} stderr={r.stderr!r}"
    assert "C API OK" in r.stdout
