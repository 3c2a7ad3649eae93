/* Stub <cufftXt.h> for compiling the reference headers with g++.
 * Only the TYPES that appear in reference function declarations are needed;
 * no cuFFT function is ever called on the oracle's CPU call graph. */
#ifndef REF_ORACLE_CUFFTXT_STUB_H
#define REF_ORACLE_CUFFTXT_STUB_H

typedef struct { double x, y; } cufftDoubleComplex;
typedef struct { float x, y; } cufftComplex;
typedef double cufftDoubleReal;
typedef float cufftReal;
typedef int cufftHandle;
typedef int cufftResult;

#endif
