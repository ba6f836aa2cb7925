/* Hand-instantiation of the reference generator's semi-global Myers kernel
 * for the scalar CPU port — the align_core.c that
 * `java -jar generator.jar -M 0 -I -1 -G -1 -a cpu -s` would emit
 * (no JRE in this environment; transcribed op-for-op from the emitter,
 * generator/.../MyersGenerator.java:56-223 genSemiGlobal +
 * GeneratorUtils.java:36-72 genBitIncluded/genBitGlobal +
 * arch/CPUArch.java + intrinsics/CPUIntrinsics.java + Element64.java).
 *
 * TEST ORACLE ONLY: compiled into /tmp/ref-build/semi_cpu next to the
 * reference's own pipeline sources (see .claude/skills/verify/SKILL.md) so
 * the semi-global mode has a compiled-reference differential target, which
 * the reference repo does not ship.
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include <omp.h>
#include <pthread.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>
#include "cal.h"
#include "align_core.h"

int match_score = 0;
int mismatch_score = -1;
int gap_score = -1;
int dvdh_len = 16;
int full_bits = 1;

void align_cpu(char * ref, cpu_read_t * read, int ref_len, int read_len, int word_num, int chunk_read_num, int result_index, cpu_write_t * results, cpu_data_t * dvdh_bit_mem) {

    int i, j, k;
    int word_size = CPU_WORD_SIZE;
    cpu_data_t one = 1;
    cpu_data_t pv;
    cpu_data_t mv;
    cpu_data_t eq;
    cpu_data_t xh;
    cpu_data_t xv;
    cpu_data_t ph;
    cpu_data_t mh;
    cpu_data_t ph_tmp;
    cpu_data_t mh_tmp;
    cpu_data_t all_ones = 0xffffffffffffffff;
    /* the committed kernels' 1L idiom (a bare int literal would be UB at
     * shift counts >= 32; the emitter's bitMask string resolves to it) */
    cpu_data_t last_maskh = 1L << ((read_len - 1) % word_size);
    cpu_data_t common_maskh = 1L << (word_size - 1);
    int last_shift_size = (read_len - 1) % word_size;
    int common_shift_size = word_size - 1;
    cpu_data_t h_in = 0;
    cpu_data_t h_in_tmp = 0;
    cpu_data_t h_out = 0;
    cpu_data_t factor;
    cpu_data_t score;
    cpu_data_t min_score;
    cpu_read_t * matchv;
    cpu_read_t * read_temp = read;
    int tid = omp_get_thread_num();
    int start = tid * word_num * dvdh_len;
    char * itr;
    cpu_data_t * pv_arr = & dvdh_bit_mem[start];
    cpu_data_t * mv_arr = & dvdh_bit_mem[start + word_num * 1];
    factor = -1;

    for(k = 0; k < chunk_read_num; k++) {

        read =& read_temp[ k * word_num * CPU_V_NUM * CHAR_NUM];

        for (i = 0; i < word_num; i++) {
            mv_arr[i] = 0;
            pv_arr[i] = 0xffffffffffffffff;
        }

        score = read_len;
        min_score = score;
        for(i = 0, itr = ref; i < ref_len; i++, itr++) {
            matchv = & read[((int)*itr) * CPU_V_NUM * word_num];
            h_in = 0;
            h_out = 0;
            for(j = 0; j < word_num - 1; j++) {
                h_in = h_out;
                h_in_tmp = h_in >> 1;
                h_in_tmp &= one;
                pv = pv_arr[j];
                mv = mv_arr[j];
                eq = *matchv;
                matchv += CPU_V_NUM;
                xv = eq | mv;
                eq |= h_in_tmp;
                xh = eq & pv;
                xh += pv;
                xh ^= pv;
                xh |= eq;
                ph = xh | pv;
                ph = ~ph;
                ph |= mv;
                mh = pv & xh;
                ph_tmp = ph & common_maskh;
                h_out = ph_tmp >> common_shift_size;
                mh_tmp = mh & common_maskh;
                mh_tmp >>= common_shift_size;
                h_out -= mh_tmp;
                ph <<= 1;
                mh <<= 1;
                mh |= h_in_tmp;
                h_in += one;
                h_in >>= 1;
                ph |= h_in;
                pv = xv | ph;
                pv = ~pv;
                pv |= mh;
                mv = ph & xv;
                pv_arr[j] = pv;
                mv_arr[j] = mv;
            }
            h_in = h_out;
            h_in_tmp = h_in >> 1;
            h_in_tmp &= one;
            pv = pv_arr[j];
            mv = mv_arr[j];
            eq = *matchv;
            matchv += CPU_V_NUM;
            xv = eq | mv;
            eq |= h_in_tmp;
            xh = eq & pv;
            xh += pv;
            xh ^= pv;
            xh |= eq;
            ph = xh | pv;
            ph = ~ph;
            ph |= mv;
            mh = pv & xh;
            ph_tmp = ph & last_maskh;
            h_out = ph_tmp >> last_shift_size;
            mh_tmp = mh & last_maskh;
            mh_tmp >>= last_shift_size;
            h_out -= mh_tmp;
            ph <<= 1;
            mh <<= 1;
            mh |= h_in_tmp;
            h_in += one;
            h_in >>= 1;
            ph |= h_in;
            pv = xv | ph;
            pv = ~pv;
            pv |= mh;
            mv = ph & xv;
            pv_arr[j] = pv;
            mv_arr[j] = mv;
            score += h_out;
            min_score = min_score < score ? min_score : score;
        }

        score = min_score;
        score *= factor;
        int index = result_index * CPU_V_NUM;
        int * vec_dump = ((int *) & score);
        #pragma vector always
        #pragma ivdep
        for(i = 0; i < CPU_V_NUM; i++){
            results[index + i] = vec_dump[i];
        }
        result_index++;
    }

}
