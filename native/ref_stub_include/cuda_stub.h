/* Minimal CUDA/cuFFT API stubs so the reference's CPU code paths compile with
 * plain g++ (see strip_cuda.py). The reference .cu files rely on nvcc's
 * implicit declarations; this header is force-included instead.
 *
 * Every runtime entry point ABORTS: the oracle build only ever executes the
 * CPU call graph (tfhe_bootstrap, lweKeySwitch, keygen, tfhe_io), and any
 * accidental excursion into GPU wrappers must fail loudly, not silently. */
#ifndef REF_ORACLE_CUDA_STUB_H
#define REF_ORACLE_CUDA_STUB_H

#include <cstdint>
#include <cstddef>
#include <cstdlib>
#include <cstdio>

typedef int cudaError_t;
static const cudaError_t cudaSuccess = 0;
enum cudaMemcpyKind {
    cudaMemcpyHostToHost = 0,
    cudaMemcpyHostToDevice = 1,
    cudaMemcpyDeviceToHost = 2,
    cudaMemcpyDeviceToDevice = 3,
};

static inline cudaError_t cuda_stub_abort(const char *what) {
    std::fprintf(stderr, "ref_oracle: CUDA stub '%s' called — the oracle must "
                         "stay on the CPU call graph\n", what);
    std::abort();
}

template <class T>
static inline cudaError_t cudaMalloc(T **p, size_t) { return cuda_stub_abort("cudaMalloc"); }
static inline cudaError_t cudaFree(void *) { return cuda_stub_abort("cudaFree"); }
static inline cudaError_t cudaMemcpy(void *, const void *, size_t, cudaMemcpyKind) {
    return cuda_stub_abort("cudaMemcpy");
}
static inline cudaError_t cudaMemset(void *, int, size_t) { return cuda_stub_abort("cudaMemset"); }
static inline cudaError_t cudaDeviceSynchronize() { return cuda_stub_abort("cudaDeviceSynchronize"); }
static inline cudaError_t cudaGetLastError() { return cudaSuccess; }
static inline const char *cudaGetErrorString(cudaError_t) { return "cuda stub"; }

#endif /* REF_ORACLE_CUDA_STUB_H */
