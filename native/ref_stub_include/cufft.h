/* Stub <cufft.h> — types only; no cuFFT call exists on the oracle CPU path. */
#ifndef REF_ORACLE_CUFFT_STUB_H
#define REF_ORACLE_CUFFT_STUB_H
#include "cufftXt.h"
#define CUFFT_D2Z 0x6a
#define CUFFT_Z2D 0x6c
#define CUFFT_SUCCESS 0
#endif
