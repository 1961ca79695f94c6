/* Single-core compiled baseline of the reference's forward recursion
 * (reference optimizer.py:165-188): log-space alpha with per-step max
 * shift, emission row via a precomputed (M, 625) full-alphabet table
 * (a strict upper bound on the reference's per-step ambiguity sum, so the
 * measured baseline is conservative for vs_baseline claims).
 *
 * Usage: forward <model.bin> <tokens.bin> <M> <K> <T> <reps>
 *   model.bin: float64 a[M*M] row-major, bfull[M*K], pi[M]
 *   tokens.bin: int32 v[T]
 * Prints one line: cols_per_s=<...> loglik=<...>
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

static double now(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv) {
  if (argc != 7) {
    fprintf(stderr, "usage: %s model.bin tokens.bin M K T reps\n", argv[0]);
    return 2;
  }
  int M = atoi(argv[3]), K = atoi(argv[4]);
  long T = atol(argv[5]);
  int reps = atoi(argv[6]);

  FILE *fm = fopen(argv[1], "rb");
  FILE *ft = fopen(argv[2], "rb");
  if (!fm || !ft) { perror("open"); return 2; }
  double *a = malloc(sizeof(double) * M * M);
  double *bfull = malloc(sizeof(double) * M * K);
  double *pi = malloc(sizeof(double) * M);
  int32_t *v = malloc(sizeof(int32_t) * T);
  if (fread(a, 8, (size_t)M * M, fm) != (size_t)M * M ||
      fread(bfull, 8, (size_t)M * K, fm) != (size_t)M * K ||
      fread(pi, 8, M, fm) != (size_t)M ||
      fread(v, 4, T, ft) != (size_t)T) {
    fprintf(stderr, "short read\n");
    return 2;
  }
  fclose(fm);
  fclose(ft);

  /* transpose a for unit-stride inner loops: at[j*M+i] = a[i*M+j] */
  double *at = malloc(sizeof(double) * M * M);
  for (int i = 0; i < M; i++)
    for (int j = 0; j < M; j++) at[j * M + i] = a[i * M + j];

  double *alpha = malloc(sizeof(double) * M);
  double *ea = malloc(sizeof(double) * M);
  double *nxt = malloc(sizeof(double) * M);
  double ll = 0.0, best = 1e30;

  for (int r = 0; r < reps; r++) {
    double t0 = now();
    for (int j = 0; j < M; j++)
      alpha[j] = log(pi[j] * bfull[j * K + v[0]]);
    for (long t = 1; t < T; t++) {
      double mx = alpha[0];
      for (int i = 1; i < M; i++)
        if (alpha[i] > mx) mx = alpha[i];
      for (int i = 0; i < M; i++) ea[i] = exp(alpha[i] - mx);
      const int32_t tok = v[t];
      for (int j = 0; j < M; j++) {
        const double *aj = at + (size_t)j * M;
        double s = 0.0;
        for (int i = 0; i < M; i++) s += ea[i] * aj[i];
        nxt[j] = log(s * bfull[j * K + tok]) + mx;
      }
      double *tmp = alpha;
      alpha = nxt;
      nxt = tmp;
    }
    double mx = alpha[0];
    for (int i = 1; i < M; i++)
      if (alpha[i] > mx) mx = alpha[i];
    double s = 0.0;
    for (int i = 0; i < M; i++) s += exp(alpha[i] - mx);
    ll = log(s) + mx;
    double dt = now() - t0;
    if (dt < best) best = dt;
  }
  printf("cols_per_s=%.1f loglik=%.10f\n", (double)T / best, ll);
  return 0;
}
