// Reference-PRNG golden-fixture generator.
//
// Reproduces, draw for draw, the key generation of the reference apps
// (cpuParallel/main.cpp:11-82 and gpuParallel/main.cu:2714-2760):
//   - std::default_random_engine seeded with seed_seq{314,1592,657}
//     (numeric-functions.cu:11-19) — the SAME libstdc++ engine/distributions
//     the reference links against, so the byte streams are identical to what
//     the reference produces when compiled with g++ on linux;
//   - lweKeyGen (lwe-functions.cu:21-27): n uniform{0,1} draws;
//   - tGswKeyGen -> tLweKeyGen (tlwe-functions.cu:14-23): k*N uniform{0,1};
//   - tfhe_createLweBootstrappingKey (lwe-bootstrapping-functions.cu:185-229):
//       1. lweCreateKeySwitchKey (lwe-keyswitch-functions.cu:890-954):
//          sizeks fresh normal(0,ks_alpha) draws, recentred, then per (i,j,h>0)
//          lweSymEncryptWithExternalNoise = n uniform Torus32 draws
//          (lwe-functions.cu:53-63);
//       2. per LWE key bit: tGswSymEncryptInt -> tGswEncryptZero = kpl x
//          tLweSymEncryptZero (tlwe-functions.cu:26-39): N x gaussian32
//          (fresh normal_distribution per draw, numeric-functions.cu:22-28)
//          then N uniform Torus32 (torusPolynomialUniform,
//          toruspolynomial-functions.cu:20-26), then tGswAddMuIntH;
//   - bootsSymEncrypt per input bit (tfhe_gate_bootstrapping.cu:114-119):
//     lweSymEncrypt = 1 gaussian32 + n uniform Torus32.
//
// Output files are written in the reference tfhe_io wire format
// (tfhe_io.cu: write_tfheGateBootstrappingSecretKeySet :1160-1166,
// write_tfheGateBootstrappingCloudKeySet :1099-1103, write_lweSample :101-108)
// by an independent C++ serializer (NOT tfhe_tpu/io.py), so loading them from
// Python is a genuine cross-implementation format test.
//
// Usage: ref_fixtures <outdir> <bitsize> <plaintext1> <plaintext2>

#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <random>
#include <string>
#include <vector>

using namespace std;

typedef int32_t Torus32;

// ------------------------------------------------------------------ params
static const int kN_lwe = 500;     // n
static const int kN_poly = 1024;   // N
static const int kK = 1;           // k
static const int kL = 2;           // bk_l
static const int kBgbit = 10;      // bk_Bgbit
static const int kKsBasebit = 2;   // ks_basebit
static const int kKsT = 8;         // ks_length
static const int kKpl = (kK + 1) * kL;
static const int kKsBase = 1 << kKsBasebit;

static double ks_stdev() { return pow(2., -15) * sqrt(2. / M_PI); }
static double bk_stdev() { return 9.e-9 * sqrt(2. / M_PI); }
static double max_stdev() { return (pow(2., -4) / 4.) * sqrt(2. / M_PI); }

// ------------------------------------------------------------------ RNG
// exact mirrors of numeric-functions.cu:11-13 (global engine + distribs)
static default_random_engine generator;
static uniform_int_distribution<Torus32> uniformTorus32_distrib(INT32_MIN, INT32_MAX);

static Torus32 dtot32(double d) {  // numeric-functions.cu:33-35
  return int32_t(int64_t((d - int64_t(d)) * 4294967296.0));
}

static Torus32 gaussian32(Torus32 message, double sigma) {  // :22-28
  normal_distribution<double> distribution(0., sigma);  // fresh each call
  double err = distribution(generator);
  return message + dtot32(err);
}

static Torus32 mod_switch_to_torus32(int mu, int Msize) {  // :72-77
  uint64_t interv = ((UINT64_C(1) << 63) / Msize) * 2;
  uint64_t phase64 = mu * interv;
  return (Torus32)(phase64 >> 32);
}

// ------------------------------------------------------------------ keygen
struct Keys {
  vector<int32_t> lwe_key;    // [n]
  vector<int32_t> tlwe_key;   // [k*N]
  vector<int32_t> ks_a;       // [N*k, t, base, n] (h=0 rows zero)
  vector<int32_t> ks_b;       // [N*k, t, base]
  vector<double> ks_cv;       // per sample
  vector<int32_t> bk;         // [n, kpl, k+1, N]
};

// b += key (*) a in Z[X]/(X^N+1), exact mod 2^32 (torusPolynomialAddMulR)
static void add_mul_r(int32_t* b, const int32_t* key, const int32_t* a, int N) {
  for (int i = 0; i < N; i++) {
    if (!key[i]) continue;
    for (int j = 0; j < N - i; j++)
      b[i + j] = (int32_t)((uint32_t)b[i + j] + (uint32_t)a[j]);
    for (int j = N - i; j < N; j++)
      b[i + j - N] = (int32_t)((uint32_t)b[i + j - N] - (uint32_t)a[j]);
  }
}

static void keygen(Keys& K, const uint32_t* seed_vals, int seed_len) {
  seed_seq seeds(seed_vals, seed_vals + seed_len);  // main.cu:2724-2725
  generator.seed(seeds);

  // 1. lweKeyGen (lwe-functions.cu:21-27)
  K.lwe_key.resize(kN_lwe);
  {
    uniform_int_distribution<int> distribution(0, 1);
    for (int i = 0; i < kN_lwe; i++) K.lwe_key[i] = distribution(generator);
  }

  // 2. tGswKeyGen -> tLweKeyGen (tlwe-functions.cu:14-23)
  K.tlwe_key.resize(kK * kN_poly);
  {
    uniform_int_distribution<int> distribution(0, 1);
    for (int i = 0; i < kK * kN_poly; i++) K.tlwe_key[i] = distribution(generator);
  }

  // 3a. lweCreateKeySwitchKey(extracted -> lwe) (lwe-keyswitch-functions.cu:890-954)
  const int n_ext = kK * kN_poly;
  const int sizeks = n_ext * kKsT * (kKsBase - 1);
  const double alpha = ks_stdev();
  vector<double> noise(sizeks);
  {
    double err = 0;
    for (int i = 0; i < sizeks; ++i) {
      normal_distribution<double> distribution(0., alpha);  // fresh per draw
      noise[i] = distribution(generator);
      err += noise[i];
    }
    err /= sizeks;
    for (int i = 0; i < sizeks; ++i) noise[i] -= err;
  }
  // extracted key = tlwe key coefficients in order (tLweExtractKey)
  K.ks_a.assign((size_t)n_ext * kKsT * kKsBase * kN_lwe, 0);
  K.ks_b.assign((size_t)n_ext * kKsT * kKsBase, 0);
  K.ks_cv.assign((size_t)n_ext * kKsT * kKsBase, 0.);
  {
    int index = 0;
    for (int i = 0; i < n_ext; ++i) {
      for (int j = 0; j < kKsT; ++j) {
        // h = 0: lweNoiselessTrivial(0) — stays zero, cv 0
        for (int h = 1; h < kKsBase; ++h) {
          uint32_t mess = (uint32_t)(K.tlwe_key[i] * h)
                          << (32 - (j + 1) * kKsBasebit);
          size_t s = ((size_t)(i * kKsT + j) * kKsBase + h);
          int32_t* a = &K.ks_a[s * kN_lwe];
          uint32_t b = mess + (uint32_t)dtot32(noise[index]);
          for (int p = 0; p < kN_lwe; ++p) {
            a[p] = uniformTorus32_distrib(generator);
            b += (uint32_t)a[p] * (uint32_t)K.lwe_key[p];
          }
          K.ks_b[s] = (int32_t)b;
          K.ks_cv[s] = alpha * alpha;
          index++;
        }
      }
    }
  }

  // 3b. BK: per key bit, tGswSymEncryptInt (tgsw-functions.cu:125-136,191-196)
  const double balpha = bk_stdev();
  K.bk.assign((size_t)kN_lwe * kKpl * (kK + 1) * kN_poly, 0);
  vector<int32_t> h(kL);
  for (int i = 0; i < kL; ++i) h[i] = 1 << (32 - (i + 1) * kBgbit);  // tgsw.cu:15-19
  for (int i = 0; i < kN_lwe; i++) {
    int32_t* samp = &K.bk[(size_t)i * kKpl * (kK + 1) * kN_poly];
    for (int p = 0; p < kKpl; ++p) {  // tGswEncryptZero row order
      int32_t* a = samp + (size_t)p * (kK + 1) * kN_poly;       // mask polys
      int32_t* b = a + (size_t)kK * kN_poly;                    // body poly
      // tLweSymEncryptZero (tlwe-functions.cu:26-39): b noise first...
      for (int j = 0; j < kN_poly; ++j) b[j] = gaussian32(0, balpha);
      // ...then per mask poly: uniform draw + AddMulR
      for (int c = 0; c < kK; ++c) {
        int32_t* ac = a + (size_t)c * kN_poly;
        for (int j = 0; j < kN_poly; ++j) ac[j] = uniformTorus32_distrib(generator);
        add_mul_r(b, &K.tlwe_key[c * kN_poly], ac, kN_poly);
      }
    }
    // tGswAddMuIntH (tgsw-functions.cu:114-123)
    if (K.lwe_key[i]) {
      for (int bloc = 0; bloc <= kK; ++bloc)
        for (int p = 0; p < kL; ++p) {
          int32_t* poly = samp + (size_t)(bloc * kL + p) * (kK + 1) * kN_poly
                          + (size_t)bloc * kN_poly;
          poly[0] = (int32_t)((uint32_t)poly[0]
                              + (uint32_t)(K.lwe_key[i] * h[p]));
        }
    }
  }
}

// bootsSymEncrypt (tfhe_gate_bootstrapping.cu:114-119)
static void encrypt_bit(const Keys& K, int message, int32_t* a, int32_t* b,
                        double* cv) {
  Torus32 _1s8 = mod_switch_to_torus32(1, 8);
  Torus32 mu = message ? _1s8 : -_1s8;
  double alpha = ks_stdev();
  uint32_t bb = (uint32_t)gaussian32(mu, alpha);
  for (int i = 0; i < kN_lwe; ++i) {
    a[i] = uniformTorus32_distrib(generator);
    bb += (uint32_t)a[i] * (uint32_t)K.lwe_key[i];
  }
  *b = (int32_t)bb;
  *cv = alpha * alpha;
}

// ------------------------------------------------------------------ tfhe_io
// Text blocks: sorted key: value lines (tfhe_generic_streams.cu:163-172,43-53)
static void write_props(FILE* F, const string& title,
                        const map<string, string>& props) {
  fprintf(F, "-----BEGIN %s-----\n", title.c_str());
  for (auto& kv : props) fprintf(F, "%s: %s\n", kv.first.c_str(), kv.second.c_str());
  fprintf(F, "-----END %s-----\n", title.c_str());
}
static string fmt_long(long v) { char b[64]; sprintf(b, "%ld", v); return b; }
static string fmt_double(double v) { char b[64]; sprintf(b, "%.8lf", v); return b; }

static void write_gbparams(FILE* F) {  // tfhe_io.cu:1013-1035
  write_props(F, "GATEBOOTSPARAMS",
              {{"ks_t", fmt_long(kKsT)}, {"ks_basebit", fmt_long(kKsBasebit)}});
  write_props(F, "LWEPARAMS", {{"n", fmt_long(kN_lwe)},
                               {"alpha_min", fmt_double(ks_stdev())},
                               {"alpha_max", fmt_double(max_stdev())}});
  write_props(F, "TLWEPARAMS", {{"N", fmt_long(kN_poly)},
                                {"k", fmt_long(kK)},
                                {"alpha_min", fmt_double(bk_stdev())},
                                {"alpha_max", fmt_double(max_stdev())}});
  write_props(F, "TGSWPARAMS", {{"l", fmt_long(kL)}, {"Bgbit", fmt_long(kBgbit)}});
}

static const int32_t LWE_SAMPLE_UID = 42, LWE_KEY_UID = 43, TGSW_KEY_UID = 169,
                     KS_KEY_UID = 200, BK_UID = 201;

static void w_i32(FILE* F, int32_t v) { fwrite(&v, 4, 1, F); }
static void w_dbl(FILE* F, double v) { fwrite(&v, 8, 1, F); }

// write_lweBootstrappingKey(F, bk, false, false) (tfhe_io.cu:937-944)
static void write_bootstrapping_key(FILE* F, const Keys& K) {
  write_props(F, "LWEKSPARAMS", {{"n", fmt_long(kK * kN_poly)},
                                 {"t", fmt_long(kKsT)},
                                 {"basebit", fmt_long(kKsBasebit)}});
  // write_LweKeySwitchKey_content (tfhe_io.cu:757-785)
  w_i32(F, KS_KEY_UID);
  double max_cv = -1;
  for (double cv : K.ks_cv) if (cv > max_cv) max_cv = cv;
  w_dbl(F, max_cv);
  const int n_ext = kK * kN_poly;
  for (int s = 0; s < n_ext * kKsT * kKsBase; ++s) {
    fwrite(&K.ks_a[(size_t)s * kN_lwe], 4, kN_lwe, F);
    w_i32(F, K.ks_b[s]);
  }
  // write_LweBootstrappingKey_content (tfhe_io.cu:883-906)
  w_i32(F, BK_UID);
  w_dbl(F, bk_stdev() * bk_stdev());
  fwrite(K.bk.data(), 4, K.bk.size(), F);
}

// ------------------------------------------------------- shared-lib entries
// In-process keygen for the Python framework (ctypes): fills caller buffers
// and leaves the global engine positioned exactly where the reference apps
// leave it after new_random_gate_bootstrapping_secret_keyset, so a following
// ref_encrypt_bits call continues the reference PRNG stream verbatim.
extern "C" void ref_keygen_fill(const uint32_t* seed_vals, int seed_len,
                                int32_t* lwe_key /*[500]*/,
                                int32_t* tlwe_key /*[1024]*/,
                                int32_t* ks_a /*[1024*8*4*500]*/,
                                int32_t* ks_b /*[1024*8*4]*/,
                                int32_t* bk /*[500*4*2*1024]*/) {
  Keys K;
  keygen(K, seed_vals, seed_len);
  memcpy(lwe_key, K.lwe_key.data(), K.lwe_key.size() * 4);
  memcpy(tlwe_key, K.tlwe_key.data(), K.tlwe_key.size() * 4);
  memcpy(ks_a, K.ks_a.data(), K.ks_a.size() * 4);
  memcpy(ks_b, K.ks_b.data(), K.ks_b.size() * 4);
  memcpy(bk, K.bk.data(), K.bk.size() * 4);
}

// bootsSymEncrypt of `nbits` plaintext bits, continuing the current stream
// (cpuParallel/main.cpp:42-51). Needs the LWE key from ref_keygen_fill.
extern "C" void ref_encrypt_bits(const int32_t* lwe_key, const int32_t* bits,
                                 int nbits, int32_t* ct_a /*[nbits*500]*/,
                                 int32_t* ct_b /*[nbits]*/) {
  Keys K;
  K.lwe_key.assign(lwe_key, lwe_key + kN_lwe);
  double cv;
  for (int i = 0; i < nbits; i++)
    encrypt_bit(K, bits[i], &ct_a[(size_t)i * kN_lwe], &ct_b[i], &cv);
}

#ifndef REF_FIXTURES_SHARED
int main(int argc, char** argv) {
  if (argc != 5) {
    fprintf(stderr, "usage: %s <outdir> <bitsize> <p1> <p2>\n", argv[0]);
    return 1;
  }
  string outdir = argv[1];
  int bitsize = atoi(argv[2]);
  int p1 = atoi(argv[3]), p2 = atoi(argv[4]);

  Keys K;
  uint32_t seed[] = {314, 1592, 657};  // main.cu:2724-2725
  keygen(K, seed, 3);

  // encrypt bits of p1 then p2 (cpuParallel/main.cpp:38-51, LSB first)
  int nct = 2 * bitsize;
  vector<int32_t> ct_a((size_t)nct * kN_lwe), ct_b(nct);
  vector<double> ct_cv(nct);
  for (int i = 0; i < bitsize; i++)
    encrypt_bit(K, (p1 >> i) & 1, &ct_a[(size_t)i * kN_lwe], &ct_b[i], &ct_cv[i]);
  for (int i = 0; i < bitsize; i++)
    encrypt_bit(K, (p2 >> i) & 1, &ct_a[(size_t)(bitsize + i) * kN_lwe],
                &ct_b[bitsize + i], &ct_cv[bitsize + i]);

  // secret.key (write_tfheGateBootstrappingSecretKeySet, tfhe_io.cu:1160-1166)
  FILE* F = fopen((outdir + "/secret.key").c_str(), "wb");
  if (!F) { perror("secret.key"); return 1; }
  write_gbparams(F);
  write_bootstrapping_key(F, K);
  w_i32(F, LWE_KEY_UID);                        // write_lweKey_content
  fwrite(K.lwe_key.data(), 4, K.lwe_key.size(), F);
  w_i32(F, TGSW_KEY_UID);                       // write_tGswKey_content
  fwrite(K.tlwe_key.data(), 4, K.tlwe_key.size(), F);
  fclose(F);

  // cloud.key (write_tfheGateBootstrappingCloudKeySet, tfhe_io.cu:1099-1103)
  F = fopen((outdir + "/cloud.key").c_str(), "wb");
  if (!F) { perror("cloud.key"); return 1; }
  write_gbparams(F);
  write_bootstrapping_key(F, K);
  fclose(F);

  // cloud.data (export_gate_bootstrapping_ciphertext_toFile per bit)
  F = fopen((outdir + "/cloud.data").c_str(), "wb");
  if (!F) { perror("cloud.data"); return 1; }
  for (int i = 0; i < nct; i++) {
    w_i32(F, LWE_SAMPLE_UID);
    fwrite(&ct_a[(size_t)i * kN_lwe], 4, kN_lwe, F);
    w_i32(F, ct_b[i]);
    w_dbl(F, ct_cv[i]);
  }
  fclose(F);

  // decrypt-check (lwePhase, lwe-functions.cu:73-82)
  long dec1 = 0, dec2 = 0;
  for (int i = 0; i < nct; i++) {
    Torus32 axs = 0;
    for (int q = 0; q < kN_lwe; q++)
      axs = (int32_t)((uint32_t)axs
                      + (uint32_t)ct_a[(size_t)i * kN_lwe + q] * (uint32_t)K.lwe_key[q]);
    Torus32 phase = (int32_t)((uint32_t)ct_b[i] - (uint32_t)axs);
    int bit = phase > 0 ? 1 : 0;
    if (i < bitsize) dec1 |= (long)bit << i;
    else dec2 |= (long)bit << (i - bitsize);
  }
  printf("fixtures: p1=%d dec1=%ld p2=%d dec2=%ld key0=%d tkey0=%d\n",
         p1, dec1, p2, dec2, K.lwe_key[0], K.tlwe_key[0]);
  return (dec1 == p1 && dec2 == p2) ? 0 : 2;
}
#endif  // REF_FIXTURES_SHARED
