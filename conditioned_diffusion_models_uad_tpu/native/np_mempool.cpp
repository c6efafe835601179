// Caching numpy data allocator: a PyDataMem_Handler whose free() RETAINS
// large blocks in per-size free lists instead of returning them to the OS.
//
// Why this exists (measured on this box, see PARITY.md "host allocation"):
// inside a jax/axon-tunnel process, faulting NEW anonymous pages costs
// ~150-600us/page of kernel time (microVM demand paging), so a fresh
// 44 MB-per-volume numpy allocation pattern burns ~7 s/volume of system
// time, while writing into ALREADY-FAULTED pages runs at memcpy speed.
// glibc cannot be coaxed into reuse here (the tunnel client's mappings
// block brk growth, so large requests fall back to mmap/munmap regardless
// of M_MMAP_THRESHOLD/mallopt). Retaining blocks sidesteps the fault path.
//
// The reference framework leans on torch DataLoader worker processes whose
// allocators stay hot for the whole run (reference
// src/datamodules/create_dataset.py:95-141 RAM cache + num_workers=4);
// this is the equivalent host-memory hygiene for the single-process
// TPU-native pipeline.
//
// Design:
//   - requests < MIN_CACHED (1 MB) pass through to malloc/free untouched
//     (glibc handles small churn fine; keeps the registry tiny).
//   - cached blocks are mmap'd directly, rounded up to 256 KB classes, and
//     kept in per-class free lists under a mutex on free().
//   - a registry (ptr -> class size) makes pool membership authoritative:
//     free/realloc never route a pooled block to glibc or vice versa.
//   - a cap (default 6 GB, env NP_MEMPOOL_CAP_MB) bounds retained bytes;
//     beyond it, frees really munmap (LRU is unnecessary: the eval loop's
//     working set is a handful of distinct shapes).
//   - calloc memsets reused blocks (pages are already faulted -> cheap).
//
// Exposed module API:  install(), stats() -> dict, trim()  (np_mempool).
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <cstring>
#include <mutex>
#include <sys/mman.h>
#include <unordered_map>
#include <vector>

namespace {

constexpr size_t kMinCached = 1u << 20;        // 1 MB
constexpr size_t kClass = 256u << 10;          // 256 KB rounding
size_t g_cap_bytes = 6ull << 30;               // retained-bytes cap

std::mutex g_mu;
std::unordered_map<size_t, std::vector<void *>> g_free;  // class size -> blocks
std::unordered_map<void *, size_t> g_live;               // pooled ptr -> class
size_t g_cached_bytes = 0;
size_t g_hits = 0, g_misses = 0, g_evictions = 0;

inline size_t round_class(size_t n) { return (n + kClass - 1) / kClass * kClass; }

void *pool_alloc(size_t size) {
  size_t cls = round_class(size);
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_free.find(cls);
    if (it != g_free.end() && !it->second.empty()) {
      void *p = it->second.back();
      it->second.pop_back();
      g_cached_bytes -= cls;
      ++g_hits;
      g_live.emplace(p, cls);
      return p;
    }
  }
  void *p = mmap(nullptr, cls, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  if (p == MAP_FAILED) return nullptr;
  std::lock_guard<std::mutex> lk(g_mu);
  ++g_misses;
  g_live.emplace(p, cls);
  return p;
}

// -> class size if ptr was pooled (and unregisters it), 0 otherwise
size_t pool_release(void *p) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_live.find(p);
  if (it == g_live.end()) return 0;
  size_t cls = it->second;
  g_live.erase(it);
  return cls;
}

void pool_retain_or_unmap(void *p, size_t cls) {
  bool retain;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    retain = g_cached_bytes + cls <= g_cap_bytes;
    if (retain) {
      g_free[cls].push_back(p);
      g_cached_bytes += cls;
    } else {
      ++g_evictions;
    }
  }
  if (!retain) munmap(p, cls);
}

// ---- PyDataMem_Handler hooks ------------------------------------------------

void *h_malloc(void *, size_t size) {
  if (size < kMinCached) return malloc(size);
  return pool_alloc(size);
}

void *h_calloc(void *, size_t nelem, size_t elsize) {
  size_t size = nelem * elsize;
  if (elsize && nelem > size / elsize) return nullptr;  // overflow
  if (size < kMinCached) return calloc(nelem, elsize);
  void *p = pool_alloc(size);
  if (p) memset(p, 0, size);  // reused pages are faulted already
  return p;
}

void h_free(void *, void *ptr, size_t /*size*/) {
  if (ptr == nullptr) return;
  size_t cls = pool_release(ptr);
  if (cls)
    pool_retain_or_unmap(ptr, cls);
  else
    free(ptr);
}

void *h_realloc(void *, void *ptr, size_t size) {
  if (ptr == nullptr) return h_malloc(nullptr, size);
  size_t cls = pool_release(ptr);
  if (!cls) {
    // glibc-owned block; growing past the threshold stays glibc-owned
    // (h_free routes by registry, so that is consistent).
    return realloc(ptr, size);
  }
  if (size <= cls) {  // shrink or same class: keep the block
    std::lock_guard<std::mutex> lk(g_mu);
    g_live.emplace(ptr, cls);
    return ptr;
  }
  void *np_ = h_malloc(nullptr, size);
  if (!np_) {  // keep the original alive on failure, per realloc contract
    std::lock_guard<std::mutex> lk(g_mu);
    g_live.emplace(ptr, cls);
    return nullptr;
  }
  memcpy(np_, ptr, cls);
  pool_retain_or_unmap(ptr, cls);
  return np_;
}

PyDataMem_Handler g_handler = {
    "np_mempool",
    1,
    {
        nullptr,    // ctx
        h_malloc,
        h_calloc,
        h_realloc,
        h_free,
    },
};

// ---- module -----------------------------------------------------------------

PyObject *py_install(PyObject *, PyObject *) {
  const char *cap = getenv("NP_MEMPOOL_CAP_MB");
  if (cap && *cap) {
    long mb = atol(cap);
    if (mb > 0) g_cap_bytes = static_cast<size_t>(mb) << 20;
  }
  PyObject *capsule = PyCapsule_New(&g_handler, "mem_handler", nullptr);
  if (!capsule) return nullptr;
  PyObject *old = PyDataMem_SetHandler(capsule);
  Py_DECREF(capsule);
  if (!old) return nullptr;
  Py_DECREF(old);
  Py_RETURN_NONE;
}

PyObject *py_stats(PyObject *, PyObject *) {
  std::lock_guard<std::mutex> lk(g_mu);
  size_t live = 0;
  for (auto &kv : g_live) live += kv.second;
  return Py_BuildValue(
      "{s:n, s:n, s:n, s:n, s:n, s:n}",
      "cached_bytes", (Py_ssize_t)g_cached_bytes,
      "live_bytes", (Py_ssize_t)live,
      "hits", (Py_ssize_t)g_hits,
      "misses", (Py_ssize_t)g_misses,
      "evictions", (Py_ssize_t)g_evictions,
      "cap_bytes", (Py_ssize_t)g_cap_bytes);
}

PyObject *py_trim(PyObject *, PyObject *) {
  std::unordered_map<size_t, std::vector<void *>> drop;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    drop.swap(g_free);
    g_cached_bytes = 0;
  }
  for (auto &kv : drop)
    for (void *p : kv.second) munmap(p, kv.first);
  Py_RETURN_NONE;
}

PyMethodDef g_methods[] = {
    {"install", py_install, METH_NOARGS,
     "Install the caching allocator as numpy's data-memory handler."},
    {"stats", py_stats, METH_NOARGS, "Pool statistics dict."},
    {"trim", py_trim, METH_NOARGS, "Release all retained blocks to the OS."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef g_module = {
    PyModuleDef_HEAD_INIT, "np_mempool",
    "Caching numpy data allocator (see np_mempool.cpp).",
    -1, g_methods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_np_mempool(void) {
  import_array();
  return PyModule_Create(&g_module);
}
