/* Native runtime components for rho-tts-tpu.
 *
 * Host-side hot paths that sit outside the XLA compute graph:
 *   - Levenshtein distance (the STT fuzzy matcher calls it O(words^2)
 *     times per validation, which matters at max_iterations=50)
 *   - 16-bit PCM WAV encode/decode (validation and the isolation layer
 *     round-trip audio through wav files; Python's wave+struct path is
 *     an order of magnitude slower)
 *
 * Exposed with plain C symbols and loaded via ctypes — no pybind11
 * dependency. Build: `make -C csrc` (or python -m rho_tts_tpu.build_native).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* ------------------------------------------------------------------ */
/* Levenshtein distance over UTF-8 bytes (two-row rolling DP).        */
/* ------------------------------------------------------------------ */

EXPORT int levenshtein(const char *s1, int n1, const char *s2, int n2) {
    if (n1 < n2) {
        const char *ts = s1; int tn = n1;
        s1 = s2; n1 = n2;
        s2 = ts; n2 = tn;
    }
    if (n2 == 0) return n1;

    int *prev = (int *)malloc((size_t)(n2 + 1) * sizeof(int));
    int *curr = (int *)malloc((size_t)(n2 + 1) * sizeof(int));
    if (!prev || !curr) { free(prev); free(curr); return -1; }

    for (int j = 0; j <= n2; j++) prev[j] = j;

    for (int i = 0; i < n1; i++) {
        curr[0] = i + 1;
        char c1 = s1[i];
        for (int j = 0; j < n2; j++) {
            int ins = prev[j + 1] + 1;
            int del = curr[j] + 1;
            int sub = prev[j] + (c1 != s2[j]);
            int m = ins < del ? ins : del;
            curr[j + 1] = m < sub ? m : sub;
        }
        int *t = prev; prev = curr; curr = t;
    }
    int result = prev[n2];
    free(prev);
    free(curr);
    return result;
}

/* ------------------------------------------------------------------ */
/* float32 [-1,1] -> int16 PCM with clipping (vectorizable loop).      */
/* ------------------------------------------------------------------ */

EXPORT void f32_to_i16(const float *in, int16_t *out, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = (int16_t)(v * 32767.0f);
    }
}

EXPORT void i16_to_f32(const int16_t *in, float *out, int64_t n) {
    const float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; i++) out[i] = (float)in[i] * scale;
}

/* ------------------------------------------------------------------ */
/* Minimal 16-bit mono PCM WAV writer (single fwrite of the payload).  */
/* Returns 0 on success.                                               */
/* ------------------------------------------------------------------ */

EXPORT int write_wav_i16(const char *path, const int16_t *samples, int64_t n,
                         int sample_rate) {
    FILE *f = fopen(path, "wb");
    if (!f) return -1;

    uint32_t data_bytes = (uint32_t)(n * 2);
    uint32_t chunk = 36 + data_bytes;
    uint16_t channels = 1, bits = 16, block = 2, fmt = 1;
    uint32_t byte_rate = (uint32_t)sample_rate * 2;
    uint32_t sr = (uint32_t)sample_rate;
    uint32_t fmt_size = 16;

    int ok = 1;
    ok &= fwrite("RIFF", 1, 4, f) == 4;
    ok &= fwrite(&chunk, 4, 1, f) == 1;
    ok &= fwrite("WAVE", 1, 4, f) == 4;
    ok &= fwrite("fmt ", 1, 4, f) == 4;
    ok &= fwrite(&fmt_size, 4, 1, f) == 1;
    ok &= fwrite(&fmt, 2, 1, f) == 1;
    ok &= fwrite(&channels, 2, 1, f) == 1;
    ok &= fwrite(&sr, 4, 1, f) == 1;
    ok &= fwrite(&byte_rate, 4, 1, f) == 1;
    ok &= fwrite(&block, 2, 1, f) == 1;
    ok &= fwrite(&bits, 2, 1, f) == 1;
    ok &= fwrite("data", 1, 4, f) == 4;
    ok &= fwrite(&data_bytes, 4, 1, f) == 1;
    ok &= fwrite(samples, 2, (size_t)n, f) == (size_t)n;
    fclose(f);
    return ok ? 0 : -2;
}
