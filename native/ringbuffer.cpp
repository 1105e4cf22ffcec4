// Lock-free SPSC ring buffer (float samples) — lib/ringbuffer.c parity.
//
// Single-producer/single-consumer ring with atomic head/tail, power-of-two
// capacity, partial read/write semantics matching audio_ring_buffer_read
// (mixer.c:531: partial frames are legal and padded by the caller).
//
// Build: g++ -O3 -shared -fPIC -o libringbuffer.so ringbuffer.cpp

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

namespace {

struct Ring {
  float* data;
  uint64_t capacity;  // power of two
  std::atomic<uint64_t> head;  // write position (producer)
  std::atomic<uint64_t> tail;  // read position (consumer)
  std::atomic<uint64_t> overruns;
};

}  // namespace

extern "C" {

Ring* ac_ring_create(uint64_t min_capacity) {
  // Bound the request BEFORE the round-up loop: a negative size wrapped
  // through ctypes' uint64 would otherwise spin the doubling loop forever
  // (cap overflows to 0) or overflow cap*sizeof(float) into a tiny
  // allocation that every write then corrupts. 2^28 floats (1 GiB) is far
  // beyond any audio ring this framework sizes.
  const uint64_t kMaxCapacity = uint64_t(1) << 28;
  if (min_capacity == 0 || min_capacity > kMaxCapacity) return nullptr;
  uint64_t cap = 1;
  while (cap < min_capacity) cap <<= 1;
  // failures report as NULL across the C ABI (the Python wrapper raises
  // MemoryError) — an escaping bad_alloc would std::terminate the process
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->data = (float*)malloc(cap * sizeof(float));
  if (!r->data) {
    delete r;
    return nullptr;
  }
  r->capacity = cap;
  r->head.store(0);
  r->tail.store(0);
  r->overruns.store(0);
  return r;
}

void ac_ring_destroy(Ring* r) {
  if (!r) return;
  free(r->data);
  delete r;
}

uint64_t ac_ring_size(const Ring* r) {
  // Load TAIL first: a third (stats/shedding) thread racing both ends can
  // otherwise see head from before a write and tail from after the
  // matching read, and the unsigned subtraction reports ~2^64. Tail-first
  // bounds any race to an under-estimate, which every caller tolerates.
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  uint64_t head = r->head.load(std::memory_order_acquire);
  return head >= tail ? head - tail : 0;
}

uint64_t ac_ring_capacity(const Ring* r) { return r->capacity; }
uint64_t ac_ring_overruns(const Ring* r) { return r->overruns.load(); }

// Producer: write up to n samples. On overflow the NEWEST samples are
// dropped (counted in overruns) — in true SPSC only the producer may move
// `head` and only the consumer may move `tail`; the real-time shedding the
// reference needs (stale audio discarded) happens on the consumer side,
// which reads-and-discards backlog beyond its latency budget.
uint64_t ac_ring_write(Ring* r, const float* src, uint64_t n) {
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  uint64_t free_space = r->capacity - (head - tail);
  uint64_t take = n < free_space ? n : free_space;
  if (take < n) r->overruns.fetch_add(n - take, std::memory_order_relaxed);
  for (uint64_t i = 0; i < take; ++i)
    r->data[(head + i) & (r->capacity - 1)] = src[i];
  r->head.store(head + take, std::memory_order_release);
  return take;
}

// Consumer: read up to n samples; returns the number actually read.
uint64_t ac_ring_read(Ring* r, float* dst, uint64_t n) {
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t avail = head - tail;
  uint64_t take = n < avail ? n : avail;
  for (uint64_t i = 0; i < take; ++i)
    dst[i] = r->data[(tail + i) & (r->capacity - 1)];
  r->tail.store(tail + take, std::memory_order_release);
  return take;
}

}  // extern "C"
