/* MSM bucket-schedule builder (hot host path of the serial-bucket
 * Pippenger kernel, ops/msm_serial.py).
 *
 * Plays the role of the digit-bucketing loop inside dalek's Pippenger
 * (invoked by the reference at /root/reference/src/prove.rs:79 via
 * prover.prove); here the buckets live on TPU lanes, so the host's job is
 * only to assign every nonzero (window, point) digit entry a (round, lane)
 * slot.
 *
 * Load balancing: bucket occupancies are far from uniform (scalars mod l
 * have a short top window; range-proof circuits commit bit vectors whose
 * digits all land in bucket 1), so a bucket with count c is split over
 * ceil(c/T) consecutive *pool lanes* (T = round budget chosen by the
 * caller); entry #r of a bucket goes to (round r%T, lane offs[bucket]+r/T).
 * The device merges sub-lanes with a segmented scan afterwards.  Two linear
 * passes; numpy equivalents (argsort-based) measured ~40x slower at 4M
 * entries.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NB 128 /* buckets per 8-bit signed window */

/* Both passes take digits TRANSPOSED ([wt, n], window-major) so the inner
 * loop reads sequentially and — in the fill pass — writes stay inside one
 * window's lane stripe (<= 128 lanes x rp rounds), which fits L2; the
 * point-major order was measured 5x slower from cache misses across the
 * whole idx array. */

/* Pass 1: per-bucket occupancy counts.  digits_t: [wt, n] int8 in
 * [-128, 127] int8; counts: [wt*NB] int32, zeroed here.  Returns the total
 * number of nonzero entries. */
int64_t bpg_msm_schedule_counts(const int8_t *digits_t, int64_t n,
                                int64_t wt, int32_t *counts) {
    memset(counts, 0, (size_t)(wt * NB) * sizeof(int32_t));
    int64_t total = 0;
    for (int64_t w = 0; w < wt; w++) {
        const int8_t *row = digits_t + w * n;
        int32_t *cw = counts + w * NB;
        for (int64_t i = 0; i < n; i++) {
            int32_t d = row[i];
            if (d) {
                cw[(d < 0 ? -d : d) - 1]++;
                total++;
            }
        }
    }
    return total;
}

/* Pass 2: fill idx [rp, p] (pre-filled with the identity slot 2n by the
 * caller) with source indices: i for positive digits, i+n for negative.
 * offs: [wt*NB] pool-lane offset per bucket; t: round budget (entry #r of
 * a bucket -> round r%t, pool lane offs[bucket]+r/t; r%t < rp always). */
void bpg_msm_schedule_fill(const int8_t *digits_t, int64_t n, int64_t wt,
                           int64_t t, int64_t p, const int32_t *offs,
                           int32_t *counts, int32_t *idx) {
    memset(counts, 0, (size_t)(wt * NB) * sizeof(int32_t));
    for (int64_t w = 0; w < wt; w++) {
        const int8_t *row = digits_t + w * n;
        int32_t *cw = counts + w * NB;
        const int32_t *ow = offs + w * NB;
        for (int64_t i = 0; i < n; i++) {
            int32_t d = row[i];
            if (d) {
                int32_t b = (d < 0 ? -d : d) - 1;
                int32_t r = cw[b]++;
                idx[(int64_t)(r % t) * p + ow[b] + r / t] =
                    d < 0 ? (int32_t)(i + n) : (int32_t)i;
            }
        }
    }
}
