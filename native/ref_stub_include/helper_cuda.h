/* Stub for NVIDIA sample helper_cuda.h (vendored cuda_common). */
#ifndef REF_ORACLE_HELPER_CUDA_STUB_H
#define REF_ORACLE_HELPER_CUDA_STUB_H
#include "cuda_stub.h"
#define checkCudaErrors(x) (x)
#endif
