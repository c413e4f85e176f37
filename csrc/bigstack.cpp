// LD_PRELOAD shim: give every newly created pthread a large stack.
//
// Why: XLA:CPU compiles jitted programs on tsl thread-pool threads
// whose default ~8 MB stacks overflow (SIGSEGV, fault address just
// below sp, error 6) on deep compiler recursion when a program embeds
// several in-tile routing networks (ops/compaction.py) — e.g. the
// in-tile radix sort/unsort network (ops/pipeline.py::_radix_sort_tile
// and the sorted-stream pipeline tests that embed it). The depth is
// linear in program size; the cliff on this jaxlib (0.9.0) sits at
// ~85 sorted-array-bits per XLA module, which the big-mesh pipeline
// exceeds by design. TPU (Mosaic) compiles the same kernels fine —
// this is a host-compiler-only workaround, used by tests/conftest.py
// (re-exec with LD_PRELOAD) so the CPU suite can run the exact TPU
// code paths in interpret mode.
//
// RLIMIT_STACK does not help: tsl sets thread stack sizes explicitly,
// and glibc only consults the rlimit when the attr has no stacksize.
// Interposing pthread_create and raising small stacksizes is the one
// process-wide lever that reaches those threads.
//
// No reference counterpart (reference is CUDA; its host build never
// embeds a vectorized sorting network in one translation unit).

#include <dlfcn.h>
#include <pthread.h>

#include <cstddef>

extern "C" int pthread_create(pthread_t *thread, const pthread_attr_t *attr,
                              void *(*start)(void *), void *arg) {
    typedef int (*pc_t)(pthread_t *, const pthread_attr_t *,
                        void *(*)(void *), void *);
    static pc_t real = nullptr;
    if (!real) real = (pc_t)dlsym(RTLD_NEXT, "pthread_create");
    pthread_attr_t local;
    if (attr) {
        local = *attr;
    } else {
        pthread_attr_init(&local);
    }
    size_t ss = 0;
    pthread_attr_getstacksize(&local, &ss);
    const size_t want = (size_t)2048 * 1024 * 1024;  // virtual; faulted lazily
    if (ss < want) pthread_attr_setstacksize(&local, want);
    int rc = real(thread, &local, start, arg);
    if (rc != 0) {
        // Address-space-constrained box: fall back to the caller's attr.
        rc = real(thread, attr, start, arg);
    }
    return rc;
}
