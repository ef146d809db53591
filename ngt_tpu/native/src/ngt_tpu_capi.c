/* C ABI for ngt_tpu — the analogue of the reference's C API
 * (lib/NGT/Capi.{h,cpp}: ngt_* functions over opaque handles,
 * Capi.h:60-212).  The reference wraps a C++ library in extern "C"; here
 * the engine is a Python/JAX package, so the shim embeds the CPython
 * interpreter and forwards each call.  Handles are PyObject* behind
 * void*: NGTIndex = ngt_tpu.Index (1-based ids, like the reference C
 * API), NGTObjectDistances = list[(id, dist)], NGTProperty = dict,
 * NGTError = a one-slot list holding the last error string.
 *
 * Build: g++ -shared -fPIC ngt_tpu_capi.c -I$(python3-config --includes)
 *        -lpython3.x -o libngt_tpu_c.so   (see native.build_capi()).
 *
 * Honors NGT_TPU_PLATFORM=cpu|tpu at first call (test environments pin
 * the CPU backend; the axon sitecustomize otherwise selects the TPU).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <string.h>

typedef void *NGTIndex;
typedef void *NGTProperty;
typedef void *NGTObjectDistances;
typedef void *NGTError;
typedef uint32_t ObjectID;

typedef struct {
  ObjectID id;
  float distance;
} NGTObjectDistance;

static int g_owns_interpreter = 0;

static void ensure_python(void) {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_owns_interpreter = 1;
    /* release the GIL so ngt_* entry points can PyGILState_Ensure from
     * any thread */
    PyEval_SaveThread();
  }
}

static void set_error(NGTError err, const char *msg) {
  if (!err) return;
  PyObject *lst = (PyObject *)err;
  PyObject *s = PyUnicode_FromString(msg ? msg : "unknown error");
  if (PyList_Size(lst) == 0) {
    PyList_Append(lst, s);
    Py_DECREF(s);
  } else {
    PyList_SetItem(lst, 0, s); /* steals s */
  }
}

static void set_error_from_python(NGTError err) {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject *s = PyObject_Str(value);
    set_error(err, s ? PyUnicode_AsUTF8(s) : "python error");
    Py_XDECREF(s);
  } else {
    set_error(err, "python error");
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

static PyObject *get_module(NGTError err) {
  static int configured = 0;
  if (!configured) {
    configured = 1;
    const char *plat = getenv("NGT_TPU_PLATFORM");
    if (plat && *plat) {
      char buf[256];
      snprintf(buf, sizeof(buf),
               "import jax\njax.config.update('jax_platforms', '%s')\n",
               plat);
      if (PyRun_SimpleString(buf) != 0) {
        set_error(err, "cannot pin jax platform");
      }
    }
  }
  PyObject *mod = PyImport_ImportModule("ngt_tpu");
  if (!mod) set_error_from_python(err);
  return mod;
}

/* ------------------------------------------------------------- errors -- */

NGTError ngt_create_error_object(void) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *lst = PyList_New(0);
  PyGILState_Release(g);
  return (NGTError)lst;
}

const char *ngt_get_error_string(const NGTError err) {
  if (!err) return "";
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *lst = (PyObject *)err;
  const char *out = "";
  if (PyList_Size(lst) > 0)
    out = PyUnicode_AsUTF8(PyList_GetItem(lst, 0));
  PyGILState_Release(g);
  return out;
}

void ngt_clear_error_string(NGTError err) {
  if (!err) return;
  PyGILState_STATE g = PyGILState_Ensure();
  PyList_SetSlice((PyObject *)err, 0, PY_SSIZE_T_MAX, NULL);
  PyGILState_Release(g);
}

void ngt_destroy_error_object(NGTError err) {
  if (!err) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject *)err);
  PyGILState_Release(g);
}

/* ---------------------------------------------------------- properties -- */

NGTProperty ngt_create_property(NGTError err) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *d = PyDict_New();
  PyDict_SetItemString(d, "distance_type", PyUnicode_FromString("L2"));
  PyGILState_Release(g);
  (void)err;
  return (NGTProperty)d;
}

void ngt_destroy_property(NGTProperty prop) {
  if (!prop) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject *)prop);
  PyGILState_Release(g);
}

static bool prop_set_long(NGTProperty prop, const char *key, long v,
                          NGTError err) {
  if (!prop) {
    set_error(err, "null property");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *o = PyLong_FromLong(v);
  PyDict_SetItemString((PyObject *)prop, key, o);
  Py_DECREF(o);
  PyGILState_Release(g);
  return true;
}

static bool prop_set_str(NGTProperty prop, const char *key, const char *v,
                         NGTError err) {
  if (!prop) {
    set_error(err, "null property");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *o = PyUnicode_FromString(v);
  PyDict_SetItemString((PyObject *)prop, key, o);
  Py_DECREF(o);
  PyGILState_Release(g);
  return true;
}

bool ngt_set_property_dimension(NGTProperty prop, int32_t value,
                                NGTError err) {
  return prop_set_long(prop, "dimension", value, err);
}

bool ngt_set_property_edge_size_for_creation(NGTProperty prop, int16_t value,
                                             NGTError err) {
  return prop_set_long(prop, "edge_size_for_creation", value, err);
}

bool ngt_set_property_edge_size_for_search(NGTProperty prop, int16_t value,
                                           NGTError err) {
  return prop_set_long(prop, "edge_size_for_search", value, err);
}

/* distance-type setters (Capi.h exposes one function per metric) */
#define DIST_SETTER(name, metric)                                       \
  bool ngt_set_property_distance_type_##name(NGTProperty prop,          \
                                             NGTError err) {            \
    return prop_set_str(prop, "distance_type", metric, err);            \
  }
DIST_SETTER(l1, "L1")
DIST_SETTER(l2, "L2")
DIST_SETTER(angle, "Angle")
DIST_SETTER(hamming, "Hamming")
DIST_SETTER(jaccard, "Jaccard")
DIST_SETTER(cosine, "Cosine")
DIST_SETTER(normalized_angle, "Normalized Angle")
DIST_SETTER(normalized_cosine, "Normalized Cosine")
#undef DIST_SETTER

bool ngt_set_property_object_type_float(NGTProperty prop, NGTError err) {
  return prop_set_str(prop, "object_type", "Float", err);
}

bool ngt_set_property_object_type_integer(NGTProperty prop, NGTError err) {
  return prop_set_str(prop, "object_type", "uint8", err);
}

/* --------------------------------------------------------------- index -- */

NGTIndex ngt_create_graph_and_tree(const char *path, NGTProperty prop,
                                   NGTError err) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *mod = get_module(err);
  NGTIndex out = NULL;
  if (mod) {
    PyObject *create = PyObject_GetAttrString(mod, "create");
    PyObject *args = PyTuple_New(1);
    PyTuple_SetItem(args, 0,
                    path ? PyUnicode_FromString(path) : (Py_INCREF(Py_None),
                                                         Py_None));
    PyObject *kwargs = PyDict_Copy((PyObject *)prop);
    PyObject *idx = PyObject_Call(create, args, kwargs);
    if (!idx) {
      set_error_from_python(err);
    } else {
      /* reference C API ids are 1-based (Capi.cpp) */
      PyObject_SetAttrString(idx, "zero_based", Py_False);
      out = (NGTIndex)idx;
    }
    Py_DECREF(kwargs);
    Py_DECREF(args);
    Py_DECREF(create);
    Py_DECREF(mod);
  }
  PyGILState_Release(g);
  return out;
}

NGTIndex ngt_open_index(const char *path, NGTError err) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *mod = get_module(err);
  NGTIndex out = NULL;
  if (mod) {
    PyObject *idx = PyObject_CallMethod(
        mod, "open_index", "sO", path, Py_False);
    if (!idx)
      set_error_from_python(err);
    else
      out = (NGTIndex)idx;
    Py_DECREF(mod);
  }
  PyGILState_Release(g);
  return out;
}

void ngt_close_index(NGTIndex index) {
  if (!index) return;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *r = PyObject_CallMethod((PyObject *)index, "close", NULL);
  Py_XDECREF(r);
  PyErr_Clear();
  Py_DECREF((PyObject *)index);
  PyGILState_Release(g);
}

ObjectID ngt_insert_index_as_float(NGTIndex index, float *obj, uint32_t dim,
                                   NGTError err) {
  if (!index) {
    set_error(err, "null index");
    return 0;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *vec = PyList_New(dim);
  for (uint32_t i = 0; i < dim; ++i)
    PyList_SetItem(vec, i, PyFloat_FromDouble((double)obj[i]));
  PyObject *r = PyObject_CallMethod((PyObject *)index, "insert", "O", vec);
  Py_DECREF(vec);
  ObjectID out = 0;
  if (!r)
    set_error_from_python(err);
  else {
    out = (ObjectID)PyLong_AsUnsignedLong(r);
    Py_DECREF(r);
  }
  PyGILState_Release(g);
  return out;
}

bool ngt_create_index(NGTIndex index, uint32_t pool_size, NGTError err) {
  if (!index) {
    set_error(err, "null index");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *r = PyObject_CallMethod((PyObject *)index, "build_index", "I",
                                    pool_size);
  bool ok = r != NULL;
  if (!r) set_error_from_python(err);
  Py_XDECREF(r);
  PyGILState_Release(g);
  return ok;
}

bool ngt_remove_index(NGTIndex index, ObjectID id, NGTError err) {
  if (!index) {
    set_error(err, "null index");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *r = PyObject_CallMethod((PyObject *)index, "remove", "I", id);
  bool ok = r != NULL;
  if (!r) set_error_from_python(err);
  Py_XDECREF(r);
  PyGILState_Release(g);
  return ok;
}

bool ngt_save_index(NGTIndex index, const char *path, NGTError err) {
  if (!index) {
    set_error(err, "null index");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *r = PyObject_CallMethod((PyObject *)index, "save", "s", path);
  bool ok = r != NULL;
  if (!r) set_error_from_python(err);
  Py_XDECREF(r);
  PyGILState_Release(g);
  return ok;
}

/* ------------------------------------------------------------- results -- */

NGTObjectDistances ngt_create_empty_results(NGTError err) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *lst = PyList_New(0);
  PyGILState_Release(g);
  (void)err;
  return (NGTObjectDistances)lst;
}

void ngt_destroy_results(NGTObjectDistances results) {
  if (!results) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject *)results);
  PyGILState_Release(g);
}

uint32_t ngt_get_result_size(NGTObjectDistances results, NGTError err) {
  if (!results) {
    set_error(err, "null results");
    return 0;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  uint32_t n = (uint32_t)PyList_Size((PyObject *)results);
  PyGILState_Release(g);
  return n;
}

NGTObjectDistance ngt_get_result(const NGTObjectDistances results,
                                 const uint32_t i, NGTError err) {
  NGTObjectDistance out = {0, 0.0f};
  if (!results) {
    set_error(err, "null results");
    return out;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *lst = (PyObject *)results;
  if (i >= (uint32_t)PyList_Size(lst)) {
    set_error(err, "result index out of range");
  } else {
    PyObject *pair = PyList_GetItem(lst, i);
    out.id = (ObjectID)PyLong_AsUnsignedLong(PyTuple_GetItem(pair, 0));
    out.distance = (float)PyFloat_AsDouble(PyTuple_GetItem(pair, 1));
  }
  PyGILState_Release(g);
  return out;
}

static bool search_common(NGTIndex index, PyObject *vec, size_t size,
                          float epsilon, float radius,
                          NGTObjectDistances results, NGTError err) {
  PyObject *r = PyObject_CallMethod(
      (PyObject *)index, "search", "Onff", vec, (Py_ssize_t)size,
      (double)epsilon, (double)radius);
  Py_DECREF(vec);
  if (!r) {
    set_error_from_python(err);
    return false;
  }
  PyObject *lst = (PyObject *)results;
  PyList_SetSlice(lst, 0, PY_SSIZE_T_MAX, NULL);
  for (Py_ssize_t i = 0; i < PyList_Size(r); ++i) {
    PyList_Append(lst, PyList_GetItem(r, i));
  }
  Py_DECREF(r);
  return true;
}

bool ngt_search_index(NGTIndex index, double *query, int32_t dim,
                      size_t size, float epsilon, float radius,
                      NGTObjectDistances results, NGTError err) {
  if (!index || !results) {
    set_error(err, "null handle");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *vec = PyList_New(dim);
  for (int32_t i = 0; i < dim; ++i)
    PyList_SetItem(vec, i, PyFloat_FromDouble(query[i]));
  bool ok = search_common(index, vec, size, epsilon, radius, results, err);
  PyGILState_Release(g);
  return ok;
}

bool ngt_search_index_as_float(NGTIndex index, float *query, int32_t dim,
                               size_t size, float epsilon, float radius,
                               NGTObjectDistances results, NGTError err) {
  if (!index || !results) {
    set_error(err, "null handle");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *vec = PyList_New(dim);
  for (int32_t i = 0; i < dim; ++i)
    PyList_SetItem(vec, i, PyFloat_FromDouble((double)query[i]));
  bool ok = search_common(index, vec, size, epsilon, radius, results, err);
  PyGILState_Release(g);
  return ok;
}

/* ------------------------------------------------------- NGTQG surface --
 * quantized-graph C API (reference NGTQ/Capi.h:126-136:
 * ngtqg_open_index / ngtqg_quantize / ngtqg_search_index / close). */

typedef void *NGTQGIndex;

typedef struct {
  float *query;
  size_t size;
  float epsilon;
  float result_expansion;
  float radius;
} NGTQGQuery;

NGTQGIndex ngtqg_open_index(const char *path, NGTError err) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *mod = PyImport_ImportModule("ngt_tpu.quant.qgraph");
  NGTQGIndex out = NULL;
  if (!mod) {
    set_error_from_python(err);
  } else {
    PyObject *cls = PyObject_GetAttrString(mod, "QuantizedGraphIndex");
    PyObject *qg = PyObject_CallMethod(cls, "open", "s", path);
    if (!qg) {
      set_error_from_python(err);
    } else {
      /* reference C API ids are 1-based */
      PyObject *inner = PyObject_GetAttrString(qg, "index");
      if (inner) {
        PyObject_SetAttrString(inner, "zero_based", Py_False);
        Py_DECREF(inner);
      }
      out = (NGTQGIndex)qg;
    }
    Py_DECREF(cls);
    Py_DECREF(mod);
  }
  PyGILState_Release(g);
  return out;
}

bool ngtqg_quantize(const char *path, float dimension_of_subvector,
                    NGTError err) {
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  bool ok = false;
  PyObject *mod = get_module(err);
  if (mod) {
    PyObject *idx = PyObject_CallMethod(mod, "open_index", "s", path);
    if (idx) {
      PyObject *qmod = PyImport_ImportModule("ngt_tpu.quant.qgraph");
      PyObject *cls =
          qmod ? PyObject_GetAttrString(qmod, "QuantizedGraphIndex") : NULL;
      PyObject *qg = cls ? PyObject_CallMethod(
                               cls, "quantize", "Oi", idx,
                               (int)dimension_of_subvector)
                         : NULL;
      if (qg) {
        PyObject *r = PyObject_CallMethod(qg, "save", "s", path);
        ok = r != NULL;
        Py_XDECREF(r);
        Py_DECREF(qg);
      }
      if (!ok) set_error_from_python(err);
      Py_XDECREF(cls);
      Py_XDECREF(qmod);
      Py_DECREF(idx);
    } else {
      set_error_from_python(err);
    }
    Py_DECREF(mod);
  }
  PyGILState_Release(g);
  return ok;
}

bool ngtqg_search_index(NGTQGIndex index, NGTQGQuery query,
                        NGTObjectDistances results, NGTError err) {
  if (!index || !results) {
    set_error(err, "null handle");
    return false;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *qg = (PyObject *)index;
  int dim = 0;
  PyObject *inner = PyObject_GetAttrString(qg, "index");
  if (inner) {
    PyObject *store = PyObject_GetAttrString(inner, "store");
    if (store) {
      PyObject *dim_o = PyObject_GetAttrString(store, "dimension");
      if (dim_o) {
        dim = (int)PyLong_AsLong(dim_o);
        Py_DECREF(dim_o);
      }
      Py_DECREF(store);
    }
    Py_DECREF(inner);
  }
  PyObject *vec = PyList_New(dim);
  for (int i = 0; i < dim; ++i)
    PyList_SetItem(vec, i, PyFloat_FromDouble((double)query.query[i]));
  PyObject *r = PyObject_CallMethod(
      qg, "search", "Onff", vec, (Py_ssize_t)query.size,
      (double)query.epsilon, (double)query.result_expansion);
  Py_DECREF(vec);
  bool ok = r != NULL;
  if (!r) {
    set_error_from_python(err);
  } else {
    PyObject *lst = (PyObject *)results;
    PyList_SetSlice(lst, 0, PY_SSIZE_T_MAX, NULL);
    for (Py_ssize_t i = 0; i < PyList_Size(r); ++i)
      PyList_Append(lst, PyList_GetItem(r, i));
    Py_DECREF(r);
  }
  PyGILState_Release(g);
  return ok;
}

void ngtqg_close_index(NGTQGIndex index) {
  if (!index) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject *)index);
  PyGILState_Release(g);
}

uint32_t ngt_get_number_of_objects(NGTIndex index, NGTError err) {
  if (!index) {
    set_error(err, "null index");
    return 0;
  }
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject *r = PyObject_CallMethod((PyObject *)index, "__len__", NULL);
  uint32_t n = 0;
  if (!r)
    set_error_from_python(err);
  else {
    n = (uint32_t)PyLong_AsUnsignedLong(r);
    Py_DECREF(r);
  }
  PyGILState_Release(g);
  return n;
}
