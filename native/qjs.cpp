// native/qjs.cpp — execute JavaScript under the system Qt5 QML (V4) engine.
//
// This image ships no browser, node, or standalone JS interpreter, but
// libQt5Qml.so.5 — the full ES6/ES7 V4 engine that QML embeds — IS
// installed as a runtime library. The browser twins (asciichat_tpu/web/
// {ansi,acip}.js) must execute under a REAL JS engine in CI rather than
// being vouched for only by their Python twins (the reference ships its
// web/packages with executed JS tests). Qt dev headers are absent, so the
// five entry points this needs are bound by their Itanium-mangled names
// straight against the runtime .so.5 (g++ accepts mangled names as plain C
// identifiers), linked with -l:libQt5Qml.so.5.
//
// ABI notes (x86-64 Itanium):
//  - QString / QJSValue / QByteArray are single-pointer pimpl classes with
//    non-trivial destructors -> returned via hidden sret pointer (first
//    argument); we model each as an opaque pointer-sized slot.
//  - QJSEngine / QCoreApplication are QObject-derived (vptr + d_ptr =
//    16 bytes); generous aligned buffers stand in for the real layout.
//  - QByteArray data lives at (char*)d + d->offset with the Qt5
//    QArrayData header {ref, size, alloc:31+flag, pad, offset}.
// The few intermediate QStrings are deliberately leaked: their inline
// destructors are not exported and the shim serves short test processes.

#include <cstddef>
#include <cstring>

extern "C" {
// QCoreApplication::QCoreApplication(int&, char**, int)
void _ZN16QCoreApplicationC1ERiPPci(void*, int*, char**, int);
// QJSEngine::QJSEngine() / ~QJSEngine()
void _ZN9QJSEngineC1Ev(void*);
void _ZN9QJSEngineD1Ev(void*);
// QJSValue QJSEngine::evaluate(const QString&, const QString&, int)
void _ZN9QJSEngine8evaluateERK7QStringS2_i(void* sret, void* self,
                                           const void* prog,
                                           const void* file, int line);
// QJSValue::~QJSValue() / isError() / toString()
void _ZN8QJSValueD1Ev(void*);
bool _ZNK8QJSValue7isErrorEv(const void*);
void _ZNK8QJSValue8toStringEv(void* sret, const void* self);
// static QString::fromUtf8_helper(const char*, int)
void _ZN7QString15fromUtf8_helperEPKci(void* sret, const char*, int);
// static QByteArray QString::toUtf8_helper(const QString&)
void _ZN7QString13toUtf8_helperERKS_(void* sret, const void*);
}

namespace {

struct QArrayDataHdr {  // Qt5 qarraydata.h layout
  int ref;
  int size;
  unsigned alloc_flags;
  unsigned pad_;
  ptrdiff_t offset;
};

struct PtrBox {  // stand-in for any single-pointer pimpl value
  void* d;
};

PtrBox qstr(const char* s, long n) {
  PtrBox q;
  _ZN7QString15fromUtf8_helperEPKci(&q, s, static_cast<int>(n));
  return q;
}

}  // namespace

// Evaluate `program` (UTF-8, program_len bytes); write the result's string
// form into out (UTF-8). An uncaught JS exception prefixes "JSERROR:".
// Returns bytes written, or -2 when out_cap is too small.
extern "C" long ac_qjs_eval(const char* program, long program_len, char* out,
                            long out_cap) {
  static bool app_made = false;
  static int argc = 1;
  static char arg0[] = "qjsrun";
  static char* argv[] = {arg0, nullptr};
  alignas(16) static unsigned char app_buf[256];
  if (!app_made) {  // QJSEngine asserts a QCoreApplication exists
    _ZN16QCoreApplicationC1ERiPPci(app_buf, &argc, argv, 0x050F00);
    app_made = true;
  }
  alignas(16) unsigned char engine[128];
  _ZN9QJSEngineC1Ev(engine);
  PtrBox prog = qstr(program, program_len);
  PtrBox fname = qstr("program.js", 10);
  PtrBox val;
  _ZN9QJSEngine8evaluateERK7QStringS2_i(&val, engine, &prog, &fname, 1);
  const bool err = _ZNK8QJSValue7isErrorEv(&val);
  PtrBox str;
  _ZNK8QJSValue8toStringEv(&str, &val);
  PtrBox ba;
  _ZN7QString13toUtf8_helperERKS_(&ba, &str);
  const QArrayDataHdr* hdr = static_cast<const QArrayDataHdr*>(ba.d);
  const char* bytes = static_cast<const char*>(ba.d) + hdr->offset;
  const long n = hdr->size;
  const long need = n + (err ? 8 : 0);
  long written = -2;
  if (need <= out_cap) {
    char* p = out;
    if (err) {
      std::memcpy(p, "JSERROR:", 8);
      p += 8;
    }
    std::memcpy(p, bytes, static_cast<size_t>(n));
    written = need;
  }
  _ZN8QJSValueD1Ev(&val);
  _ZN9QJSEngineD1Ev(engine);
  return written;
}
