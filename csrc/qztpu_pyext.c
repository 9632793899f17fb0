/* CPython extension: zero-copy batched member decode.
 *
 * The ctypes path (native.py inflate_batch) decodes into a numpy buffer
 * that must then be copied into a bytes object for the session API — a
 * full extra pass over the output (~30ms at 48MB). This module allocates
 * the PyBytes up front and lets the native thread pool decode straight
 * into it, GIL released. The native decode itself lives in
 * qztpu_native.cpp (qz_inflate_batch); this is only the object-protocol
 * shim the reference never needed (its C callers own their buffers,
 * utils/qzip.c:245-365).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* from qztpu_native.so (linked at build time, rpath $ORIGIN) */
#ifdef __cplusplus
extern "C"
#endif
void qz_inflate_batch(const uint8_t* src, const int64_t* in_off,
                             const int64_t* in_len, uint8_t* dst,
                             const int64_t* out_off, const int64_t* out_cap,
                             int64_t* out_len, uint32_t* crcs, int32_t nmem,
                             int32_t nthreads, int64_t* in_used);
#ifdef __cplusplus
extern "C"
#endif
void qz_lz4_decompress_batch(const uint8_t* src, const int64_t* in_off,
                             const int64_t* in_len, uint8_t* dst,
                             const int64_t* out_off, const int64_t* out_cap,
                             int64_t* out_len, int32_t nblk,
                             int32_t nthreads, uint32_t* crcs,
                             uint32_t* xxh);

/* lz4_batch_bytes(data, in_offs, in_lens, out_caps, nthreads, want_xxh,
 *                 xxh_seed)
 *   -> (out: bytes, out_lens: bytes(int64 LE), crcs: bytes(uint32 LE),
 *       xxh: int or None)
 * in_lens[i] < 0 marks a stored block of |in_lens[i]| verbatim bytes.
 * crcs[i] = crc32 of block i's decoded bytes (computed cache-warm by the
 * decode workers; the caller combine-folds them). want_xxh != 0 asks a
 * trailing thread to XXH32 the whole output overlapped with the decode;
 * None is returned when the block shape made that invalid.
 */
static PyObject* lz4_batch_bytes(PyObject* self, PyObject* args) {
  Py_buffer data, offs, lens, caps_b;
  int nthreads = 0;
  int want_xxh = 0;
  unsigned int xxh_seed = 0;
  uint32_t xxh[2] = {0, 0};
  (void)self;
  if (!PyArg_ParseTuple(args, "y*y*y*y*i|iI", &data, &offs, &lens, &caps_b,
                        &nthreads, &want_xxh, &xxh_seed))
    return NULL;
  PyObject* out = NULL;
  PyObject* outlens = NULL;
  PyObject* outcrcs = NULL;
  int64_t* out_off = NULL;
  if (offs.len != lens.len || offs.len != caps_b.len || offs.len % 8 != 0) {
    PyErr_SetString(PyExc_ValueError, "offs/lens/caps length mismatch");
    goto fail;
  }
  {
    Py_ssize_t n = offs.len / 8;
    const int64_t* in_off = (const int64_t*)offs.buf;
    const int64_t* in_len = (const int64_t*)lens.buf;
    const int64_t* cap = (const int64_t*)caps_b.buf;
    int64_t total = 0;
    out_off = (int64_t*)PyMem_Malloc((size_t)(n ? n : 1) * 8);
    if (!out_off) goto fail;
    for (Py_ssize_t i = 0; i < n; ++i) {
      out_off[i] = total;
      int64_t il = in_len[i] < 0 ? -in_len[i] : in_len[i];
      if (cap[i] < 0 || in_off[i] < 0 || in_off[i] + il > data.len) {
        PyErr_SetString(PyExc_ValueError, "block out of range");
        goto fail;
      }
      total += cap[i];
    }
    out = PyBytes_FromStringAndSize(NULL, total);
    outlens = PyBytes_FromStringAndSize(NULL, n * 8);
    outcrcs = PyBytes_FromStringAndSize(NULL, n * 4);
    if (!out || !outlens || !outcrcs) goto fail;
    if (n > 0) {
      uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
      int64_t* olen = (int64_t*)PyBytes_AS_STRING(outlens);
      uint32_t* crcs = (uint32_t*)PyBytes_AS_STRING(outcrcs);
      const uint8_t* src = (const uint8_t*)data.buf;
      xxh[0] = (uint32_t)xxh_seed;
      Py_BEGIN_ALLOW_THREADS;
      qz_lz4_decompress_batch(src, in_off, in_len, dst, out_off, cap, olen,
                              (int32_t)n, (int32_t)nthreads, crcs,
                              want_xxh ? xxh : NULL);
      Py_END_ALLOW_THREADS;
    }
  }
  PyMem_Free(out_off);
  PyBuffer_Release(&data);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&caps_b);
  {
    PyObject* hv = (want_xxh && xxh[1])
                       ? PyLong_FromUnsignedLong(xxh[0])
                       : (Py_INCREF(Py_None), Py_None);
    PyObject* tup = hv ? PyTuple_Pack(4, out, outlens, outcrcs, hv) : NULL;
    Py_XDECREF(out);
    Py_XDECREF(outlens);
    Py_XDECREF(outcrcs);
    Py_XDECREF(hv);
    return tup;
  }
fail:
  PyMem_Free(out_off);
  PyBuffer_Release(&data);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&caps_b);
  Py_XDECREF(out);
  Py_XDECREF(outlens);
  Py_XDECREF(outcrcs);
  return NULL;
}

/* inflate_batch_bytes(data, in_offs, in_lens, out_sizes, nthreads)
 *   -> (out: bytes, out_lens: bytes(int64 LE), crcs: bytes(uint32 LE),
 *       in_used: bytes(int64 LE))
 * in_offs/in_lens/out_sizes are contiguous int64 buffers (numpy ok).
 */
static PyObject* inflate_batch_bytes(PyObject* self, PyObject* args) {
  Py_buffer data, offs, lens, sizes;
  int nthreads = 0;
  (void)self;
  if (!PyArg_ParseTuple(args, "y*y*y*y*i", &data, &offs, &lens, &sizes,
                        &nthreads))
    return NULL;
  PyObject* out = NULL;
  PyObject* outlens = NULL;
  PyObject* outcrcs = NULL;
  PyObject* outused = NULL;
  int64_t* out_off = NULL;
  if (offs.len != lens.len || offs.len != sizes.len ||
      offs.len % 8 != 0) {
    PyErr_SetString(PyExc_ValueError, "offs/lens/sizes length mismatch");
    goto fail;
  }
  {
    Py_ssize_t n = offs.len / 8;
    const int64_t* in_off = (const int64_t*)offs.buf;
    const int64_t* in_len = (const int64_t*)lens.buf;
    const int64_t* cap = (const int64_t*)sizes.buf;
    int64_t total = 0;
    out_off = (int64_t*)PyMem_Malloc((size_t)(n ? n : 1) * 8);
    if (!out_off) goto fail;
    for (Py_ssize_t i = 0; i < n; ++i) {
      out_off[i] = total;
      if (cap[i] < 0 || in_off[i] < 0 || in_len[i] < 0 ||
          in_off[i] + in_len[i] > data.len) {
        PyErr_SetString(PyExc_ValueError, "member out of range");
        goto fail;
      }
      total += cap[i];
    }
    out = PyBytes_FromStringAndSize(NULL, total);
    outlens = PyBytes_FromStringAndSize(NULL, n * 8);
    outcrcs = PyBytes_FromStringAndSize(NULL, n * 4);
    outused = PyBytes_FromStringAndSize(NULL, n * 8);
    if (!out || !outlens || !outcrcs || !outused) goto fail;
    if (n > 0) {
      uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
      int64_t* olen = (int64_t*)PyBytes_AS_STRING(outlens);
      uint32_t* crcs = (uint32_t*)PyBytes_AS_STRING(outcrcs);
      int64_t* used = (int64_t*)PyBytes_AS_STRING(outused);
      const uint8_t* src = (const uint8_t*)data.buf;
      Py_BEGIN_ALLOW_THREADS;
      qz_inflate_batch(src, in_off, in_len, dst, out_off, cap, olen, crcs,
                       (int32_t)n, (int32_t)nthreads, used);
      Py_END_ALLOW_THREADS;
    }
  }
  PyMem_Free(out_off);
  PyBuffer_Release(&data);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&sizes);
  {
    PyObject* tup = PyTuple_Pack(4, out, outlens, outcrcs, outused);
    Py_XDECREF(out);
    Py_XDECREF(outlens);
    Py_XDECREF(outcrcs);
    Py_XDECREF(outused);
    return tup;
  }
fail:
  PyMem_Free(out_off);
  PyBuffer_Release(&data);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&sizes);
  Py_XDECREF(out);
  Py_XDECREF(outlens);
  Py_XDECREF(outcrcs);
  Py_XDECREF(outused);
  return NULL;
}

static PyMethodDef Methods[] = {
    {"inflate_batch_bytes", inflate_batch_bytes, METH_VARARGS,
     "Batched raw-deflate member decode into one bytes object."},
    {"lz4_batch_bytes", lz4_batch_bytes, METH_VARARGS,
     "Batched LZ4 block decode into one bytes object."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_qztpu_pyext",
    "Zero-copy batched decode shim over qztpu_native.", -1, Methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__qztpu_pyext(void) {
  return PyModule_Create(&moduledef);
}
