/* ref_oracle.cpp — ctypes glue around the REFERENCE'S OWN CPU code.
 *
 * The translation units of /root/reference/gpuParallel are compiled in place
 * (never copied) by the Makefile's `libref_oracle.so` target, with
 * strip_cuda.py removing only `__global__` kernels and `<<<>>>` launches, and
 * `-DtorusPolynomialAddMulR=torusPolynomialAddMulRKaratsuba` (etc.) selecting
 * the reference's own commented-in exact-integer multiply configuration
 * (polynomials_arithmetic.h:108-111; multiplication.cu:53-77 documents the
 * naive/Karatsuba/FFT versions as exactly interchangeable). The result: the
 * reference's non-FFT bootstrap chain — tfhe_bootstrap
 * (lwe-bootstrapping-functions.cu:159-182) -> tfhe_blindRotate (:55-79) ->
 * tGswExternMulToTLwe (tgsw-functions.cu:151-172) -> exact Karatsuba
 * (multiplication.cu:126-176) -> lweKeySwitch
 * (lwe-keyswitch-functions.cu:955-989) — runs as compiled from the
 * reference's own sources, FFTW-free and CUDA-free.
 *
 * This file contains ONLY glue: seed/keygen/accessor plumbing and the 3-line
 * gate affines (mirroring boot-gates.cu:98-448, each cited), exported with C
 * linkage for tests/test_reference_oracle.py. Everything cryptographic
 * executes inside the reference's translation units.
 */
#include <cstdint>
#include <cstring>
#include <cstdio>

#include "tfhe.h"
#include "tfhe_io.h"

static const TFheGateBootstrappingParameterSet *g_params = nullptr;
static LweKey *g_lwe_key = nullptr;
static TGswKey *g_tgsw_key = nullptr;
static LweBootstrappingKey *g_bk = nullptr;
static TFheGateBootstrappingSecretKeySet *g_keyset = nullptr;

extern "C" {

/* The FFT bootstrapping-key type is never built on the non-FFT oracle path
 * (its real definitions live in lwe-bootstrapping-functions-fft.cu, which
 * needs FFTW). tfhe_io's import path references these two symbols; define
 * loud stubs so dlopen's eager binding succeeds. */
LweBootstrappingKeyFFT *new_LweBootstrappingKeyFFT(const LweBootstrappingKey *) {
    fprintf(stderr, "ref_oracle: new_LweBootstrappingKeyFFT is not part of the "
                    "non-FFT oracle\n");
    abort();
}
void delete_LweBootstrappingKeyFFT(LweBootstrappingKeyFFT *) {
    fprintf(stderr, "ref_oracle: delete_LweBootstrappingKeyFFT is not part of "
                    "the non-FFT oracle\n");
    abort();
}

/* params(lambda=110) + seed + keygen, exactly the reference app's preamble
 * (main.cu:2719-2726 / cpuParallel/main.cpp:11-25) and keyset construction
 * (new_random_gate_bootstrapping_secret_keyset, tfhe_gate_bootstrapping.cu:
 * 57-68) minus its final new_LweBootstrappingKeyFFT(bk) — a pure transform
 * that draws no randomness and needs FFTW; the non-FFT chain never reads it
 * (bkFFT stays null in the keyset). */
int ro_init(uint32_t s0, uint32_t s1, uint32_t s2) {
    if (g_keyset) return 0;
    g_params = new_default_gate_bootstrapping_parameters(110);
    uint32_t seed[] = {s0, s1, s2};
    tfhe_random_generator_setSeed(seed, 3);
    g_lwe_key = new_LweKey(g_params->in_out_params);
    lweKeyGen(g_lwe_key);
    g_tgsw_key = new_TGswKey(g_params->tgsw_params);
    tGswKeyGen(g_tgsw_key);
    g_bk = new_LweBootstrappingKey(g_params->ks_t, g_params->ks_basebit,
                                   g_params->in_out_params, g_params->tgsw_params);
    tfhe_createLweBootstrappingKey(g_bk, g_lwe_key, g_tgsw_key);
    g_keyset = new TFheGateBootstrappingSecretKeySet(g_params, g_bk, /*bkFFT=*/nullptr,
                                                     g_lwe_key, g_tgsw_key);
    return 0;
}

int ro_n(void) { return g_params->in_out_params->n; }
int ro_N(void) { return g_params->tgsw_params->tlwe_params->N; }
int ro_kpl(void) { return g_params->tgsw_params->kpl; }
int ro_k(void) { return g_params->tgsw_params->tlwe_params->k; }
int ro_ks_t(void) { return g_params->ks_t; }
int ro_ks_base(void) { return 1 << g_params->ks_basebit; }

void ro_get_lwe_key(int32_t *out /* [n] */) {
    memcpy(out, g_lwe_key->key, ro_n() * sizeof(int32_t));
}

void ro_get_tlwe_key(int32_t *out /* [k*N] */) {
    const int N = ro_N();
    for (int i = 0; i < ro_k(); i++)
        memcpy(out + i * N, g_tgsw_key->tlwe_key.key[i].coefs, N * sizeof(int32_t));
}

/* BK raw coefficients in [n][kpl][k+1][N] order (TGswSample row r holds
 * TLwe column c in all_sample[r].a[c], tgsw.h:55-76). */
void ro_get_bk(int32_t *out) {
    const int n = ro_n(), kpl = ro_kpl(), k1 = ro_k() + 1, N = ro_N();
    for (int i = 0; i < n; i++)
        for (int r = 0; r < kpl; r++)
            for (int c = 0; c < k1; c++)
                memcpy(out + ((size_t)(i * kpl + r) * k1 + c) * N,
                       g_bk->bk[i].all_sample[r].a[c].coefsT, N * sizeof(int32_t));
}

/* KS key in [n_extract][t][base][n] / [n_extract][t][base] order
 * (ks->ks[i][j][h], lwekeyswitch.h:11-28). */
void ro_get_ks(int32_t *out_a, int32_t *out_b) {
    const int n = ro_n(), ne = ro_N() * ro_k(), t = ro_ks_t(), base = ro_ks_base();
    for (int i = 0; i < ne; i++)
        for (int j = 0; j < t; j++)
            for (int h = 0; h < base; h++) {
                const LweSample *s = &g_bk->ks->ks[i][j][h];
                memcpy(out_a + (((size_t)(i * t + j) * base + h) * n),
                       s->a, n * sizeof(int32_t));
                out_b[(size_t)(i * t + j) * base + h] = s->b;
            }
}

/* Encrypt message bits, continuing the global PRNG stream after keygen
 * (bootsSymEncrypt, tfhe_gate_bootstrapping.cu:114-119). */
void ro_encrypt_bits(const int32_t *bits, int nb, int32_t *out_a /* [nb][n] */,
                     int32_t *out_b /* [nb] */) {
    const int n = ro_n();
    LweSample *tmp = new_LweSample(g_params->in_out_params);
    for (int i = 0; i < nb; i++) {
        bootsSymEncrypt(tmp, bits[i], g_keyset);
        memcpy(out_a + (size_t)i * n, tmp->a, n * sizeof(int32_t));
        out_b[i] = tmp->b;
    }
    delete_LweSample(tmp);
}

int ro_decrypt(const int32_t *a, int32_t b) {
    LweSample *tmp = new_LweSample(g_params->in_out_params);
    memcpy(tmp->a, a, ro_n() * sizeof(int32_t));
    tmp->b = b;
    tmp->current_variance = 0.0;
    int r = bootsSymDecrypt(tmp, g_keyset);
    delete_LweSample(tmp);
    return r;
}

/* Full non-FFT gate bootstrap on an arbitrary input sample
 * (tfhe_bootstrap, lwe-bootstrapping-functions.cu:159-182). */
void ro_bootstrap(const int32_t *a, int32_t b, int32_t mu,
                  int32_t *out_a /* [n] */, int32_t *out_b) {
    LweSample *x = new_LweSample(g_params->in_out_params);
    LweSample *r = new_LweSample(g_params->in_out_params);
    memcpy(x->a, a, ro_n() * sizeof(int32_t));
    x->b = b;
    x->current_variance = 0.0;
    tfhe_bootstrap(r, g_bk, mu, x);
    memcpy(out_a, r->a, ro_n() * sizeof(int32_t));
    *out_b = r->b;
    delete_LweSample(r);
    delete_LweSample(x);
}

/* Bootstrap without key switch: extracted-key sample out
 * (tfhe_bootstrap_woKS, lwe-bootstrapping-functions.cu:120-157). */
void ro_bootstrap_woks(const int32_t *a, int32_t b, int32_t mu,
                       int32_t *out_a /* [k*N] */, int32_t *out_b) {
    const LweParams *ext = &g_params->tgsw_params->tlwe_params->extracted_lweparams;
    LweSample *x = new_LweSample(g_params->in_out_params);
    LweSample *u = new_LweSample(ext);
    memcpy(x->a, a, ro_n() * sizeof(int32_t));
    x->b = b;
    x->current_variance = 0.0;
    tfhe_bootstrap_woKS(u, g_bk, mu, x);
    memcpy(out_a, u->a, (size_t)ro_k() * ro_N() * sizeof(int32_t));
    *out_b = u->b;
    delete_LweSample(u);
    delete_LweSample(x);
}

/* Key switch alone on an arbitrary extracted-key sample
 * (lweKeySwitch, lwe-keyswitch-functions.cu:955-989). */
void ro_keyswitch(const int32_t *a_ext, int32_t b_ext,
                  int32_t *out_a /* [n] */, int32_t *out_b) {
    const LweParams *ext = &g_params->tgsw_params->tlwe_params->extracted_lweparams;
    LweSample *u = new_LweSample(ext);
    LweSample *r = new_LweSample(g_params->in_out_params);
    memcpy(u->a, a_ext, (size_t)ro_k() * ro_N() * sizeof(int32_t));
    u->b = b_ext;
    u->current_variance = 0.0;
    lweKeySwitch(r, g_bk->ks, u);
    memcpy(out_a, r->a, ro_n() * sizeof(int32_t));
    *out_b = r->b;
    delete_LweSample(r);
    delete_LweSample(u);
}

/* Two-input gates: the reference affine (boot-gates.cu:98-448 constants) +
 * the non-FFT tfhe_bootstrap. op: 0=AND 1=OR 2=XOR 3=NAND 4=NOR 5=XNOR. */
void ro_gate(int op, const int32_t *a1, int32_t b1, const int32_t *a2, int32_t b2,
             int32_t *out_a, int32_t *out_b) {
    const LweParams *io = g_params->in_out_params;
    const Torus32 MU = modSwitchToTorus32(1, 8);
    LweSample *ca = new_LweSample(io);
    LweSample *cb = new_LweSample(io);
    LweSample *t = new_LweSample(io);
    LweSample *r = new_LweSample(io);
    memcpy(ca->a, a1, ro_n() * sizeof(int32_t)); ca->b = b1; ca->current_variance = 0.0;
    memcpy(cb->a, a2, ro_n() * sizeof(int32_t)); cb->b = b2; cb->current_variance = 0.0;
    switch (op) {
    case 0:  /* bootsAND, boot-gates.cu:151-182: (0,-1/8)+ca+cb */
        lweNoiselessTrivial(t, modSwitchToTorus32(-1, 8), io);
        lweAddTo(t, ca, io); lweAddTo(t, cb, io); break;
    case 1:  /* bootsOR, :125-146: (0,1/8)+ca+cb */
        lweNoiselessTrivial(t, modSwitchToTorus32(1, 8), io);
        lweAddTo(t, ca, io); lweAddTo(t, cb, io); break;
    case 2:  /* bootsXOR, :192-213: (0,1/4)+2*(ca+cb) */
        lweNoiselessTrivial(t, modSwitchToTorus32(1, 4), io);
        lweAddMulTo(t, 2, ca, io); lweAddMulTo(t, 2, cb, io); break;
    case 3:  /* bootsNAND, :98-117: (0,1/8)-ca-cb */
        lweNoiselessTrivial(t, modSwitchToTorus32(1, 8), io);
        lweSubTo(t, ca, io); lweSubTo(t, cb, io); break;
    case 4:  /* bootsNOR, :283-304: (0,-1/8)-ca-cb */
        lweNoiselessTrivial(t, modSwitchToTorus32(-1, 8), io);
        lweSubTo(t, ca, io); lweSubTo(t, cb, io); break;
    default: /* bootsXNOR, :218-239: (0,-1/4)-2*(ca+cb) */
        lweNoiselessTrivial(t, modSwitchToTorus32(-1, 4), io);
        lweSubMulTo(t, 2, ca, io); lweSubMulTo(t, 2, cb, io); break;
    }
    tfhe_bootstrap(r, g_bk, MU, t);
    memcpy(out_a, r->a, ro_n() * sizeof(int32_t));
    *out_b = r->b;
    delete_LweSample(r); delete_LweSample(t);
    delete_LweSample(cb); delete_LweSample(ca);
}

/* MUX: mirrors bootsMUX (boot-gates.cu:407-448) over the non-FFT
 * tfhe_bootstrap_woKS + lweKeySwitch. */
void ro_mux(const int32_t *aa, int32_t ab, const int32_t *ba, int32_t bb,
            const int32_t *ca, int32_t cb_, int32_t *out_a, int32_t *out_b) {
    const LweParams *io = g_params->in_out_params;
    const LweParams *ext = &g_params->tgsw_params->tlwe_params->extracted_lweparams;
    const Torus32 MU = modSwitchToTorus32(1, 8);
    const Torus32 AndConst = modSwitchToTorus32(-1, 8);
    LweSample *A = new_LweSample(io), *B = new_LweSample(io), *C = new_LweSample(io);
    LweSample *t = new_LweSample(io), *t1 = new_LweSample(ext);
    LweSample *u1 = new_LweSample(ext), *u2 = new_LweSample(ext);
    LweSample *r = new_LweSample(io);
    memcpy(A->a, aa, ro_n() * sizeof(int32_t)); A->b = ab; A->current_variance = 0.0;
    memcpy(B->a, ba, ro_n() * sizeof(int32_t)); B->b = bb; B->current_variance = 0.0;
    memcpy(C->a, ca, ro_n() * sizeof(int32_t)); C->b = cb_; C->current_variance = 0.0;
    lweNoiselessTrivial(t, AndConst, io);
    lweAddTo(t, A, io); lweAddTo(t, B, io);
    tfhe_bootstrap_woKS(u1, g_bk, MU, t);
    lweNoiselessTrivial(t, AndConst, io);
    lweSubTo(t, A, io); lweAddTo(t, C, io);
    tfhe_bootstrap_woKS(u2, g_bk, MU, t);
    lweNoiselessTrivial(t1, modSwitchToTorus32(1, 8), ext);
    lweAddTo(t1, u1, ext); lweAddTo(t1, u2, ext);
    lweKeySwitch(r, g_bk->ks, t1);
    memcpy(out_a, r->a, ro_n() * sizeof(int32_t));
    *out_b = r->b;
    delete_LweSample(r); delete_LweSample(u2); delete_LweSample(u1);
    delete_LweSample(t1); delete_LweSample(t);
    delete_LweSample(C); delete_LweSample(B); delete_LweSample(A);
}

/* Export key files with the reference's OWN serializer (tfhe_io.cu:1109,1173)
 * so the bytes can be diffed against the repo's io.py and the golden
 * fixtures. Returns 0 on success. */
int ro_write_keyset_files(const char *secret_path, const char *cloud_path) {
    FILE *fs = fopen(secret_path, "wb");
    if (!fs) return 1;
    export_tfheGateBootstrappingSecretKeySet_toFile(fs, g_keyset);
    fclose(fs);
    FILE *fc = fopen(cloud_path, "wb");
    if (!fc) return 1;
    export_tfheGateBootstrappingCloudKeySet_toFile(fc, &g_keyset->cloud);
    fclose(fc);
    return 0;
}

/* Export a ciphertext with the reference's serializer (tfhe_io.cu). */
int ro_write_ciphertexts(const char *path, const int32_t *a /* [nb][n] */,
                         const int32_t *b, int nb) {
    FILE *f = fopen(path, "wb");
    if (!f) return 1;
    LweSample *tmp = new_LweSample(g_params->in_out_params);
    for (int i = 0; i < nb; i++) {
        memcpy(tmp->a, a + (size_t)i * ro_n(), ro_n() * sizeof(int32_t));
        tmp->b = b[i];
        tmp->current_variance = g_params->in_out_params->alpha_min *
                                g_params->in_out_params->alpha_min;
        export_gate_bootstrapping_ciphertext_toFile(f, tmp, g_params);
    }
    delete_LweSample(tmp);
    fclose(f);
    return 0;
}

} /* extern "C" */
