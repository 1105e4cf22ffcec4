/* Minimal uthash-compatible shim (test-only): insertion-order linked list.
 * Supports the macros the renderer closure uses: HASH_ADD_INT,
 * HASH_FIND_INT, HASH_DEL, HASH_ITER, HASH_COUNT. Semantics match upstream
 * for these uses (find-by-key, app-order iteration). */
#ifndef STUB_UTHASH_H
#define STUB_UTHASH_H
#include <string.h>

typedef struct UT_hash_handle {
  void *next, *prev;
  const void *key;
  unsigned keylen;
} UT_hash_handle;

#define HASH_ADD_INT(head, fieldname, add) do { \
    (add)->hh.key = &((add)->fieldname); \
    (add)->hh.keylen = (unsigned)sizeof((add)->fieldname); \
    (add)->hh.next = NULL; (add)->hh.prev = NULL; \
    if (!(head)) { (head) = (add); } \
    else { \
      __typeof__(head) _ut_last = (head); \
      while (_ut_last->hh.next) _ut_last = (__typeof__(head))_ut_last->hh.next; \
      _ut_last->hh.next = (add); (add)->hh.prev = _ut_last; \
    } \
  } while (0)

#define HASH_FIND_INT(head, keyptr, out) do { \
    (out) = (head); \
    while ((out) && !((out)->hh.keylen == (unsigned)sizeof(*(keyptr)) && \
                      memcmp((out)->hh.key, (keyptr), sizeof(*(keyptr))) == 0)) \
      (out) = (__typeof__(out))(out)->hh.next; \
  } while (0)

#define HASH_DEL(head, delptr) do { \
    if ((delptr)->hh.prev) \
      ((__typeof__(head))(delptr)->hh.prev)->hh.next = (delptr)->hh.next; \
    else (head) = (__typeof__(head))(delptr)->hh.next; \
    if ((delptr)->hh.next) \
      ((__typeof__(head))(delptr)->hh.next)->hh.prev = (delptr)->hh.prev; \
  } while (0)

#define HASH_ITER(hh_name, head, el, tmp) \
  for ((el) = (head), (tmp) = (el) ? (__typeof__(el))(el)->hh_name.next : NULL; \
       (el); \
       (el) = (tmp), (tmp) = (el) ? (__typeof__(el))(el)->hh_name.next : NULL)

#define HASH_COUNT(head) ({ \
    unsigned _ut_n = 0; __typeof__(head) _ut_el = (head); \
    while (_ut_el) { _ut_n++; _ut_el = (__typeof__(head))_ut_el->hh.next; } \
    _ut_n; })
#endif
