// libasciichat-compatible C API shim (BASELINE.json north-star: "expose the
// same libasciichat public C API via a thin FFI shim so existing clients
// ... are untouched"). C callers get the reference's conversion entry point
// (ascii_convert_with_capabilities semantics, lib/video/ascii/ascii.c:194)
// backed by this framework's device pipeline: the shim embeds the Python
// runtime once and calls asciichat_tpu.render.pipeline.AsciiRenderer.
//
// Byte-exactness carries through: the output is the same golden-tested ANSI
// grammar the Python API produces.
//
// Build: g++ -O3 -shared -fPIC -o libasciichat_capi.so capi.cpp \
//            $(python3-config --includes) $(python3-config --embed --libs)

#include <Python.h>

#include <cstdint>
#include <cstring>
#include <mutex>

namespace {

std::mutex g_mu;
bool g_inited = false;
PyObject* g_convert = nullptr;  // asciichat_tpu.capi_entry.convert

const char* BOOTSTRAP = R"PY(
import numpy as _np

from asciichat_tpu.render.palette import BUILTIN_PALETTES as _BP
from asciichat_tpu.render.pipeline import AsciiRenderer as _R
from asciichat_tpu.render.types import ColorLevel as _CL, RenderMode as _RM, TerminalCapabilities as _TC

_renderers = {}

def convert(buf, src_w, src_h, out_w, out_h, color_level, render_mode, palette, stretch):
    frame = _np.frombuffer(buf, _np.uint8).reshape(src_h, src_w, 3)
    palette = _BP.get(palette, palette)  # names resolve; else custom chars
    r = _renderers.get(palette)
    if r is None:
        # bounded: a client cycling distinct custom palette strings must not
        # accrete one renderer (jit caches + glyph tables) per string forever
        if len(_renderers) >= 32:
            _renderers.pop(next(iter(_renderers)))
        r = _renderers[palette] = _R(palette)
    caps = _TC(_CL(color_level), _RM(render_mode))
    return r.convert(frame, out_w, out_h, caps, stretch=bool(stretch))
)PY";

int ensure_init() {
  std::lock_guard<std::mutex> lk(g_mu);
  if (g_inited) return 0;
  bool we_initialized = false;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    we_initialized = true;
  }
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* mod = PyModule_New("asciichat_capi_entry");
  PyObject* globals = PyModule_GetDict(mod);
  PyDict_SetItemString(globals, "__builtins__", PyEval_GetBuiltins());
  PyObject* res = PyRun_String(BOOTSTRAP, Py_file_input, globals, globals);
  int rc = 0;
  if (!res) {
    PyErr_Print();
    rc = -1;
  } else {
    Py_DECREF(res);
    g_convert = PyDict_GetItemString(globals, "convert");
    Py_XINCREF(g_convert);
    if (!g_convert) rc = -1;
  }
  PyGILState_Release(gil);
  if (we_initialized) {
    // RELEASE the GIL held by the initializing thread: without this, any
    // OTHER thread's PyGILState_Ensure blocks forever and a multithreaded
    // C client deadlocks on its first convert call from a second thread.
    PyEval_SaveThread();
  }
  if (rc == 0) g_inited = true;
  return rc;
}

}  // namespace

extern "C" {

// color levels / render modes match render/types.py (and the reference's
// terminal_capabilities_t enums)
int asciichat_init(void) { return ensure_init(); }

// RGB24 frame -> malloc'd ANSI frame bytes (caller frees with
// asciichat_free); returns NULL on error. The grammar is byte-identical to
// the reference scalar renderers (golden-tested).
char* asciichat_convert(const uint8_t* rgb, int src_w, int src_h, int out_w,
                        int out_h, int color_level, int render_mode,
                        const char* palette, int stretch, size_t* out_len) {
  if (ensure_init() != 0 || !rgb || !out_len) return nullptr;
  PyGILState_STATE gil = PyGILState_Ensure();
  char* out = nullptr;
  PyObject* buf = PyBytes_FromStringAndSize(
      (const char*)rgb, (Py_ssize_t)src_w * src_h * 3);
  PyObject* res = PyObject_CallFunction(
      g_convert, "Oiiiiiisi", buf, src_w, src_h, out_w, out_h, color_level,
      render_mode, palette ? palette : "standard", stretch);
  Py_XDECREF(buf);
  if (!res) {
    PyErr_Print();
    PyGILState_Release(gil);
    return nullptr;
  }
  char* data;
  Py_ssize_t n;
  if (PyBytes_AsStringAndSize(res, &data, &n) == 0) {
    out = (char*)malloc((size_t)n + 1);
    if (out) {
      memcpy(out, data, (size_t)n);
      out[n] = '\0';
      *out_len = (size_t)n;
    }
  } else {
    // a non-bytes result sets a TypeError; leaving the error indicator set
    // would poison the NEXT convert call (CPython forbids calls with a
    // pending exception)
    PyErr_Print();
  }
  Py_DECREF(res);
  PyGILState_Release(gil);
  return out;
}

void asciichat_free(char* p) { free(p); }

}  // extern "C"
