/* Stub for NVIDIA sample helper_functions.h (vendored cuda_common). */
#ifndef REF_ORACLE_HELPER_FUNCTIONS_STUB_H
#define REF_ORACLE_HELPER_FUNCTIONS_STUB_H
#endif
