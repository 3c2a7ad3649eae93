/* Stub <cuda_runtime.h> — see cuda_stub.h for the rationale. */
#ifndef REF_ORACLE_CUDA_RUNTIME_STUB_H
#define REF_ORACLE_CUDA_RUNTIME_STUB_H
#include "cuda_stub.h"
typedef int cudaStream_t;
typedef int cudaEvent_t;
#endif
