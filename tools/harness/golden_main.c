/*
 * Golden-fixture harness, appended by tools/gen_golden.py to the end of a
 * patched copy of the reference's qpsk.c translation unit (so it can reach
 * the static state).  Prints deterministic trajectories to stdout as
 * tagged text lines; tools/gen_golden.py parses them into tests/golden/*.npz.
 *
 * This file is NOT part of the framework -- it is test fixture tooling.
 */

#include <assert.h>

static unsigned long golden_lcg_state = 42;

static unsigned long golden_lcg(void) {
    golden_lcg_state = (1103515245UL * golden_lcg_state + 12345UL) & 0x7fffffffUL;
    return golden_lcg_state;
}

static float golden_uniform(void) { /* in [-1, 1) */
    return ((float)golden_lcg() / 1073741824.0f) - 1.0f;
}

static void golden_reset_rx(void) {
    memset(rx_filter, 0, sizeof(rx_filter));
    memset(input_frame, 0, sizeof(input_frame));
    memset(decimated_frame, 0, sizeof(decimated_frame));
    rx_timing = FINE_TIMING_OFFSET;
    state = hunt;
    fbb_rx_phase = cmplx(0.0f);
    fbb_rx_rect = cmplx(TAU * (-CENTER + FOFFSET) / FS);
    kalman_init();
    scramble_init(rx);
}

static void golden_run_rx_stream(const char *tag, const int16_t *pcm, size_t nsamples) {
    int16_t frame[FRAME_SIZE];
    uint8_t ibits[BITS_PER_FRAME];
    size_t nframes = nsamples / FRAME_SIZE;

    golden_reset_rx();
    printf("%s_NFRAMES %zu\n", tag, nframes);
    for (size_t fr = 0; fr < nframes; fr++) {
        memcpy(frame, pcm + fr * FRAME_SIZE, FRAME_SIZE * sizeof(int16_t));
        memset(ibits, 0, sizeof(ibits));
        int valid = qpsk_rx_frame(frame, ibits);
        printf("%s_FRAME %zu valid %d rx_timing %d matches %d max_index %d "
               "max_value %.9e mean %.9e\n",
               tag, fr, valid, rx_timing,
               golden_last_matches, golden_last_max_index,
               golden_last_max_value, golden_last_mean);
        printf("%s_BITS %zu ", tag, fr);
        for (int i = 0; i < DATA_SYMBOLS * 2; i++) printf("%d", ibits[i]);
        printf("\n");
    }
}

int main(void) {
    size_t i, j, k;

    /* preamble table exactly as main() builds it (qpsk.c:361-365) */
    for (i = 0; i < PREAMBLE_LENGTH; i++) {
        float val = (float) preamblevalues[i];
        preambletable[i] = val + (val * I);
    }

    /* ---------------- section A: FIR trajectory ---------------- */
    {
        enum { N = 500 };
        static complex float mem[NTAPS];
        static complex float sig[N];
        memset(mem, 0, sizeof(mem));
        for (i = 0; i < N; i++)
            sig[i] = golden_uniform() + golden_uniform() * I;
        printf("FIR_IN %d ", N);
        for (i = 0; i < N; i++)
            printf("%.9e %.9e ", crealf(sig[i]), cimagf(sig[i]));
        printf("\n");
        fir(mem, false, sig, N);      /* narrow filter, as qpsk.c:60 */
        printf("FIR_OUT %d ", N);
        for (i = 0; i < N; i++)
            printf("%.9e %.9e ", crealf(sig[i]), cimagf(sig[i]));
        printf("\n");
    }

    /* ------------- section B: kalman/equalizer trajectory ------------- */
    {
        /* noisy preamble chips followed by noisy QPSK data symbols,
         * through train_eq x128 then data_eq x31 */
        enum { NSYM = 128 + 31 + EQ_LENGTH };
        static complex float syms[NSYM];
        kalman_init();
        scramble_init(both);
        for (i = 0; i < NSYM; i++) {
            float re, im;
            if (i < PREAMBLE_LENGTH) {
                re = (float) preamblevalues[i];
                im = (float) preamblevalues[i];
            } else {
                re = (golden_lcg() % 2) ? 1.0f : -1.0f;
                im = (golden_lcg() % 2) ? 1.0f : -1.0f;
            }
            /* ~0.5 amplitude like real decimated symbols (tx at
             * 16384 -> /16384 -> RRC x2.2 twice) to keep the
             * trajectory in the equalizer's stable operating region */
            syms[i] = 0.5f * ((re + 0.1f * golden_uniform())
                    + (im + 0.1f * golden_uniform()) * I);
        }
        printf("EQ_IN %d ", NSYM);
        for (i = 0; i < NSYM; i++)
            printf("%.9e %.9e ", crealf(syms[i]), cimagf(syms[i]));
        printf("\n");
        printf("EQ_TRAIN 128 ");
        for (i = 0; i < 128; i++) {
            complex float ref = preambletable[i] + 0.0f * I;
            float err = train_eq(syms, (int) i, ref);
            printf("%.9e ", err);
        }
        printf("\n");
        printf("EQ_COEFF_AFTER_TRAIN %d ", EQ_LENGTH);
        for (i = 0; i < EQ_LENGTH; i++)
            printf("%.9e %.9e ", crealf(eq_coeff[i]), cimagf(eq_coeff[i]));
        printf("\n");
        printf("EQ_DATA 31 ");
        for (i = 0; i < 31; i++) {
            uint8_t dibit = 0;
            float err = data_eq(&dibit, syms, (int)(128 + i));
            printf("%d %.9e ", dibit, err);
        }
        printf("\n");
        printf("EQ_COEFF_AFTER_DATA %d ", EQ_LENGTH);
        for (i = 0; i < EQ_LENGTH; i++)
            printf("%.9e %.9e ", crealf(eq_coeff[i]), cimagf(eq_coeff[i]));
        printf("\n");
    }

    /* ---------------- section C: scrambler keystream ---------------- */
    {
        enum { NDIBITS = 256 };
        scramble_init(both);
        printf("SCRAMBLE_ZERO %d ", NDIBITS);
        for (i = 0; i < NDIBITS; i++) {
            uint8_t v = 0;                /* scrambling zeros = keystream */
            scramble(&v, tx);
            printf("%d ", v);
        }
        printf("\n");
    }

    /* ---------------- section D: TX packets ---------------- */
    enum { NPACKETS = 10,
           PKT = PREAMBLE_SIZE + DATA_SIZE + 903,
           TOTAL = NPACKETS * PKT };
    static int16_t tx_stream[TOTAL];
    static uint8_t tx_bits[NPACKETS][NS][DATA_SYMBOLS * 2];
    {
        int16_t frame[FRAME_SIZE];
        int16_t preamble[PREAMBLE_SIZE];
        uint8_t obits[DATA_SYMBOLS * 2];
        size_t pos = 0;

        memset(tx_filter, 0, sizeof(tx_filter));
        fbb_tx_phase = cmplx(0.0f);
        fbb_tx_rect = cmplx(TAU * CENTER / FS);
        kalman_init();
        scramble_init(both);

        for (k = 0; k < NPACKETS; k++) {
            int length = preamble_modulate(preamble);
            memcpy(tx_stream + pos, preamble, length * sizeof(int16_t));
            pos += length;
            for (j = 0; j < NS; j++) {
                for (i = 0; i < DATA_SYMBOLS; i++) {
                    uint8_t sdata = (uint8_t)(((golden_lcg() % 2) << 1) | (golden_lcg() % 2));
                    obits[2 * i + 1] = (sdata >> 1) & 0x1;   /* I odd */
                    obits[2 * i] = sdata & 0x1;              /* Q even */
                    tx_bits[k][j][2 * i + 1] = obits[2 * i + 1];
                    tx_bits[k][j][2 * i] = obits[2 * i];
                }
                length = qpsk_modulate(frame, obits, DATA_SYMBOLS);
                memcpy(tx_stream + pos, frame, length * sizeof(int16_t));
                pos += length;
            }
            memset(tx_stream + pos, 0, 903 * sizeof(int16_t));
            pos += 903;
        }
        assert(pos == TOTAL);
        printf("TX_BITS %d ", NPACKETS * NS * DATA_SYMBOLS * 2);
        for (k = 0; k < NPACKETS; k++)
            for (j = 0; j < NS; j++)
                for (i = 0; i < DATA_SYMBOLS * 2; i++)
                    printf("%d", tx_bits[k][j][i]);
        printf("\n");
        printf("TX_PCM %d ", TOTAL);
        for (i = 0; i < TOTAL; i++) printf("%d ", tx_stream[i]);
        printf("\n");
    }

    /* ------------- section E: RX over the shipped golden file ------------- */
    {
        FILE *f = fopen("/root/reference/preamble_qpsk_8k.raw", "rb");
        assert(f != NULL);
        static int16_t pcm[32768];
        size_t n = fread(pcm, sizeof(int16_t), 32768, f);
        fclose(f);
        golden_run_rx_stream("RXG", pcm, n);
    }

    /* ------------- section F: RX over the harness TX stream ------------- */
    golden_run_rx_stream("RXT", tx_stream, TOTAL);

    return 0;
}
