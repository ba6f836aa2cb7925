// Differential-target driver for the reference's dynamic load balancer.
//
// The balancer under test is the VERBATIM `adjust_device_ratio3` from
// /root/reference/original/BGSA_KNC/global.c:120-168 — build.sh extracts it
// (unmodified, brace-matched) into ref_adjust3.inc at build time, so no
// reference code lives in this repo; this file supplies only the globals
// the function uses and a stdin/stdout trace driver with the aligner
// driver's exact semantics:
//
//   * loop_device_ratio / loop_used_times are zero-initialized double**
//     arrays, one row per bucket (cal_all.c:970-980);
//   * time_index starts at 0 and is incremented once per bucket before the
//     adjust call (cal_all.c:1312, call at :1332);
//   * device 0's ratio is pinned to 1 inside the function itself.
//
// Input (stdin):  n_devices n_rounds, then n_rounds x n_devices times.
// Output (stdout): n_rounds lines of n_devices ratios, %.17g full precision
// (the schedule must be bit-identical across hosts, so the fixture pins
// every bit). tests/ref_kernels/regen_balancer_trace.py drives this to
// rewrite tests/golden/balancer_trace.json.

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int time_index = 0;
double **loop_device_ratio;
double **loop_used_times;

#include "ref_adjust3.inc"

int main(void) {
  int n, rounds;
  if (scanf("%d %d", &n, &rounds) != 2 || n < 1 || rounds < 1) return 1;
  loop_device_ratio = (double **)malloc(sizeof(double *) * rounds);
  loop_used_times = (double **)malloc(sizeof(double *) * rounds);
  for (int i = 0; i < rounds; i++) {
    loop_device_ratio[i] = (double *)calloc(n, sizeof(double));
    loop_used_times[i] = (double *)calloc(n, sizeof(double));
  }
  double *ratio = (double *)malloc(sizeof(double) * n);
  double *t = (double *)malloc(sizeof(double) * n);
  for (int i = 0; i < n; i++) ratio[i] = 1.0;
  for (int r = 0; r < rounds; r++) {
    for (int i = 0; i < n; i++)
      if (scanf("%lf", &t[i]) != 1) return 1;
    time_index++;
    adjust_device_ratio3(ratio, t, n);
    for (int i = 0; i < n; i++)
      printf("%.17g%c", ratio[i], i + 1 < n ? ' ' : '\n');
  }
  return 0;
}
