/* Hand-transcribed instance of the reference generator's unit-cost global
 * Myers kernel at AVX-512 — what `java -jar generator.jar -M 0 -I -1 -G -1
 * -a knl` emits (no JRE in this environment).  Sources of truth:
 *   - structure: MyersGenerator.genMyersCommon (generator/source/.../
 *     MyersGenerator.java:225-401), identical to the committed SSE instance
 *     original/BGSA_SSE/align_core.c:19-152 (common path, isCarry=false for
 *     KNL: arch/KNLArch.java:26);
 *   - score update: KNCArch.myersCal (arch/KNCArch.java:85-94) — AVX-512
 *     mask-register cmp/mask_add instead of SSE's cmpeq+srli;
 *   - types/ABI: original/BGSA_AVX512/align_core.h + config.h (align_mic,
 *     mic_read_t=uint32_t, MIC_V_NUM=16, aligned _mm512_load_epi32 as in the
 *     committed BitPAl instance align_core.c:187).
 *
 * Used ONLY as a compiled baseline/differential target (tests/ref_kernels/
 * build.sh -> /tmp/ref-build/myers_avx512): it provides the same-ISA
 * unit-cost Myers per-core `cal GCUPS` anchor that BASELINE.md's per-family
 * denominators are scaled with.  Not product code.
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
int full_bits = 0;

void align_mic(char * ref, mic_read_t * read, int ref_len, int read_len, int word_num, int chunk_read_num, int result_index, mic_write_t * results, mic_data_t * dvdh_bit_mem) {

    int i, j, k;
    int word_size = MIC_WORD_SIZE - 1;
    mic_data_t * VN;
    mic_data_t * VP;
    mic_data_t VN_temp;
    mic_data_t VP_temp;
    mic_data_t PM;
    mic_data_t D0;
    mic_data_t HP;
    mic_data_t HN;
    mic_data_t HP_shift;
    mic_data_t HN_shift;
    mic_data_t sum;
    mic_data_t all_ones = _mm512_set1_epi32(0xffffffff);
    mic_data_t carry_bitmask = _mm512_set1_epi32(0x7fffffff);
    mic_data_t maskh;
    mic_data_t factor;
    mic_data_t one = _mm512_set1_epi32(1);
    mic_data_t score;
    mic_data_t matches;
    mic_data_t tmp;
    __mmask16 m1;
    maskh = _mm512_set1_epi32(0x00000001 << ((read_len - 1) % word_size));
    factor = _mm512_set1_epi32(-1);
    char * itr;
    mic_read_t * matchv;
    mic_read_t * read_temp = read;

    int tid = omp_get_thread_num();
    int start = tid * word_num * dvdh_len;
    VN = & dvdh_bit_mem[start];
    VP = & dvdh_bit_mem[start + word_num * 1];

    for(k = 0; k < chunk_read_num; k++) {

        read =& read_temp[ k * word_num * MIC_V_NUM * CHAR_NUM];

        for (i = 0; i < word_num; i++) {
            VN[i] = _mm512_set1_epi32(0);
            VP[i] = _mm512_set1_epi32(0x7fffffff);
        }

        score = _mm512_set1_epi32(read_len);

        for(i = 0, itr = ref; i < ref_len; i++, itr++) {

            matchv = & read[((int)*itr) * MIC_V_NUM * word_num];
            HP_shift = _mm512_set1_epi32(1);
            HN_shift = _mm512_set1_epi32(0);
            sum = _mm512_set1_epi32(0);

            for(j = 0; j < word_num-1; j++) {

                matches = _mm512_load_epi32(matchv);
                matchv += MIC_V_NUM;
                VN_temp = VN[j];
                VP_temp = VP[j];
                PM = _mm512_or_epi32(matches, VN_temp);
                tmp = _mm512_srli_epi32(sum, word_size);
                sum = _mm512_and_epi32(VP_temp, PM);
                sum = _mm512_add_epi32(sum, VP_temp);
                sum = _mm512_add_epi32(sum, tmp);
                D0 = _mm512_and_epi32(sum, carry_bitmask);
                D0 = _mm512_xor_epi32(D0, VP_temp);
                D0 = _mm512_or_epi32(D0, PM);
                HP = _mm512_or_epi32(D0, VP_temp);
                HP = _mm512_xor_epi32(HP, all_ones);
                HP = _mm512_or_epi32(HP, VN_temp);
                HN = _mm512_and_epi32(D0, VP_temp);

                HP = _mm512_slli_epi32(HP, 1);
                HP = _mm512_or_epi32(HP, HP_shift);
                HP_shift = _mm512_srli_epi32(HP, word_size);
                HN = _mm512_slli_epi32(HN, 1);
                HN = _mm512_or_epi32(HN, HN_shift);
                HN_shift = _mm512_srli_epi32(HN, word_size);
                VP[j] = _mm512_or_epi32(D0, HP);
                VP[j] = _mm512_xor_epi32(VP[j], all_ones);
                VP[j] = _mm512_or_epi32(VP[j], HN);
                VP[j] = _mm512_and_epi32(VP[j], carry_bitmask);
                VN[j] = _mm512_and_epi32(D0, HP);
                VN[j] = _mm512_and_epi32(VN[j], carry_bitmask);
            }

            matches = _mm512_load_epi32(matchv);
            VN_temp = VN[word_num - 1];
            VP_temp = VP[word_num - 1];
            PM = _mm512_or_epi32(matches, VN_temp);
            tmp = _mm512_srli_epi32(sum, word_size);
            sum = _mm512_and_epi32(VP_temp, PM);
            sum = _mm512_add_epi32(sum, VP_temp);
            sum = _mm512_add_epi32(sum, tmp);
            D0 = _mm512_and_epi32(sum, carry_bitmask);
            D0 = _mm512_xor_epi32(D0, VP_temp);
            D0 = _mm512_or_epi32(D0, PM);
            HP = _mm512_or_epi32(D0, VP_temp);
            HP = _mm512_xor_epi32(HP, all_ones);
            HP = _mm512_or_epi32(HP, VN_temp);
            HN = _mm512_and_epi32(D0, VP_temp);

            tmp = _mm512_and_epi32(HP, maskh);
            m1=_mm512_cmp_epu32_mask(tmp,maskh ,_MM_CMPINT_EQ);
            score= _mm512_mask_add_epi32(score, m1, score, one);
            tmp = _mm512_and_epi32(HN, maskh);
            m1=_mm512_cmp_epu32_mask(tmp,maskh ,_MM_CMPINT_EQ);
            score= _mm512_mask_sub_epi32(score, m1, score, one);
            HP = _mm512_slli_epi32(HP, 1);
            HP = _mm512_or_epi32(HP, HP_shift);
            HN = _mm512_slli_epi32(HN, 1);
            HN = _mm512_or_epi32(HN, HN_shift);
            VP[word_num - 1] = _mm512_or_epi32(D0, HP);
            VP[word_num - 1] = _mm512_xor_epi32(VP[word_num - 1], all_ones);
            VP[word_num - 1] = _mm512_or_epi32(VP[word_num - 1], HN);
            VP[word_num - 1] = _mm512_and_epi32(VP[word_num - 1], carry_bitmask);
            VN[word_num - 1] = _mm512_and_epi32(D0, HP);
            VN[word_num - 1] = _mm512_and_epi32(VN[word_num - 1], carry_bitmask);
        }

        score = _mm512_mullo_epi32(score, factor);
        int index = result_index * MIC_V_NUM;
        int * vec_dump = ((int *) & score);
        #pragma vector always
        #pragma ivdep
        for(i = 0; i < MIC_V_NUM; i++){
            results[index + i] = vec_dump[i];
        }
        result_index++;
    }

}
