"""C ABI surface: a real C program drives the index through the shim
(the analogue of the reference's C API, lib/NGT/Capi.h:60-212 — create,
property setters, insert, build, search, results accessors, save/open,
remove, error objects)."""

import os
import subprocess
import sys
import sysconfig

import pytest

from ngt_tpu import native

C_TEST = r"""
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef void *NGTIndex;
typedef void *NGTProperty;
typedef void *NGTObjectDistances;
typedef void *NGTError;
typedef uint32_t ObjectID;
typedef struct { ObjectID id; float distance; } NGTObjectDistance;

extern NGTError ngt_create_error_object(void);
extern const char *ngt_get_error_string(const NGTError);
extern void ngt_destroy_error_object(NGTError);
extern NGTProperty ngt_create_property(NGTError);
extern bool ngt_set_property_dimension(NGTProperty, int32_t, NGTError);
extern bool ngt_set_property_edge_size_for_creation(NGTProperty, int16_t, NGTError);
extern bool ngt_set_property_distance_type_l2(NGTProperty, NGTError);
extern void ngt_destroy_property(NGTProperty);
extern NGTIndex ngt_create_graph_and_tree(const char *, NGTProperty, NGTError);
extern NGTIndex ngt_open_index(const char *, NGTError);
extern void ngt_close_index(NGTIndex);
extern ObjectID ngt_insert_index_as_float(NGTIndex, float *, uint32_t, NGTError);
extern bool ngt_create_index(NGTIndex, uint32_t, NGTError);
extern bool ngt_remove_index(NGTIndex, ObjectID, NGTError);
extern bool ngt_save_index(NGTIndex, const char *, NGTError);
extern NGTObjectDistances ngt_create_empty_results(NGTError);
extern void ngt_destroy_results(NGTObjectDistances);
extern uint32_t ngt_get_result_size(NGTObjectDistances, NGTError);
extern NGTObjectDistance ngt_get_result(const NGTObjectDistances, uint32_t, NGTError);
extern bool ngt_search_index_as_float(NGTIndex, float *, int32_t, size_t,
                                      float, float, NGTObjectDistances, NGTError);
extern uint32_t ngt_get_number_of_objects(NGTIndex, NGTError);

typedef void *NGTQGIndex;
typedef struct {
  float *query; size_t size; float epsilon; float result_expansion;
  float radius;
} NGTQGQuery;
extern NGTQGIndex ngtqg_open_index(const char *, NGTError);
extern bool ngtqg_quantize(const char *, float, NGTError);
extern bool ngtqg_search_index(NGTQGIndex, NGTQGQuery, NGTObjectDistances, NGTError);
extern void ngtqg_close_index(NGTQGIndex);

#define CHECK(cond, msg) \
  if (!(cond)) { fprintf(stderr, "FAIL: %s: %s\n", msg, ngt_get_error_string(err)); return 1; }

int main(int argc, char **argv) {
  const char *path = argv[1];
  NGTError err = ngt_create_error_object();
  NGTProperty prop = ngt_create_property(err);
  CHECK(ngt_set_property_dimension(prop, 8, err), "dimension");
  CHECK(ngt_set_property_edge_size_for_creation(prop, 8, err), "edges");
  CHECK(ngt_set_property_distance_type_l2(prop, err), "metric");
  NGTIndex idx = ngt_create_graph_and_tree(path, prop, err);
  CHECK(idx != NULL, "create");
  ngt_destroy_property(prop);

  float v[8];
  for (int i = 0; i < 200; i++) {
    for (int d = 0; d < 8; d++) v[d] = (float)((i * 37 + d * 11) % 97) / 10.0f;
    ObjectID id = ngt_insert_index_as_float(idx, v, 8, err);
    CHECK(id == (ObjectID)(i + 1), "1-based insert id");
  }
  CHECK(ngt_create_index(idx, 4, err), "build");
  CHECK(ngt_get_number_of_objects(idx, err) == 200, "count");

  for (int d = 0; d < 8; d++) v[d] = (float)((5 * 37 + d * 11) % 97) / 10.0f;
  NGTObjectDistances res = ngt_create_empty_results(err);
  CHECK(ngt_search_index_as_float(idx, v, 8, 5, 0.1f, 1e30f, res, err),
        "search");
  CHECK(ngt_get_result_size(res, err) == 5, "result size");
  NGTObjectDistance first = ngt_get_result(res, 0, err);
  CHECK(first.id == 6, "self-match id (1-based)");
  CHECK(first.distance < 1e-4, "self-match distance");
  ngt_destroy_results(res);

  CHECK(ngt_save_index(idx, path, err), "save");
  CHECK(ngt_remove_index(idx, 6, err), "remove");
  ngt_close_index(idx);

  NGTIndex re = ngt_open_index(path, err);
  CHECK(re != NULL, "open");
  CHECK(ngt_get_number_of_objects(re, err) == 200, "reopen count");
  ngt_close_index(re);

  /* NGTQG surface (reference NGTQ/Capi.h:126-136) */
  CHECK(ngtqg_quantize(path, 2.0f, err), "quantize");
  NGTQGIndex qg = ngtqg_open_index(path, err);
  CHECK(qg != NULL, "qg open");
  NGTQGQuery q;
  for (int d = 0; d < 8; d++) v[d] = (float)((7 * 37 + d * 11) % 97) / 10.0f;
  q.query = v; q.size = 5; q.epsilon = 0.1f; q.result_expansion = 3.0f;
  q.radius = 1e30f;
  NGTObjectDistances qres = ngt_create_empty_results(err);
  CHECK(ngtqg_search_index(qg, q, qres, err), "qg search");
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
