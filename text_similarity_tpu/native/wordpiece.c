/* Native WordPiece matcher — the host-side tokenization hot loop.
 *
 * Role parity with the reference's native tokenization dependencies (MeCab
 * C library, utils/tokenizers.py:1-12; HF fast tokenizers' Rust core):
 * tokenization stays a CPU concern in a TPU pipeline (SURVEY.md §2.1), and
 * at 1M-sentence corpus scale the pure-Python greedy matcher becomes the
 * encode-path bottleneck. This file implements the greedy
 * longest-match-first WordPiece inner loop in C; Unicode normalization and
 * word splitting stay in Python (exact parity with the Python matcher is
 * asserted in tests).
 *
 * Interface (ctypes, no pybind11 — see native/__init__.py):
 *   wp_create(tokens_buf, offsets, n, unk_id)  -> handle
 *   wp_encode_words(handle, words_buf, word_offsets, n_words,
 *                   out_ids, out_ends, max_out) -> n_ids (or -1 overflow)
 *   wp_free(handle)
 *
 * The vocab hash map is open-addressing FNV-1a over length-prefixed keys;
 * continuation pieces are stored with a "##" prefix exactly as in vocab
 * files.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const char *key;   /* not owned; points into the vocab buffer copy */
    int32_t keylen;
    int32_t id;        /* -1 = empty slot */
} Slot;

typedef struct {
    Slot *slots;
    int64_t capacity;  /* power of two */
    char *buf;         /* owned copy of all token strings */
    int32_t unk_id;
    int32_t max_token_chars;
} Vocab;

static uint64_t fnv1a(const char *s, int32_t n) {
    uint64_t h = 1469598103934665603ULL;
    for (int32_t i = 0; i < n; i++) {
        h ^= (uint8_t)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static int32_t vocab_lookup(const Vocab *v, const char *s, int32_t n) {
    uint64_t mask = (uint64_t)v->capacity - 1;
    uint64_t idx = fnv1a(s, n) & mask;
    for (;;) {
        const Slot *sl = &v->slots[idx];
        if (sl->id == -1) return -1;
        if (sl->keylen == n && memcmp(sl->key, s, (size_t)n) == 0)
            return sl->id;
        idx = (idx + 1) & mask;
    }
}

static void vocab_insert(Vocab *v, const char *s, int32_t n, int32_t id) {
    uint64_t mask = (uint64_t)v->capacity - 1;
    uint64_t idx = fnv1a(s, n) & mask;
    while (v->slots[idx].id != -1) {
        /* last insert wins on duplicates (matches dict semantics) */
        if (v->slots[idx].keylen == n &&
            memcmp(v->slots[idx].key, s, (size_t)n) == 0) {
            v->slots[idx].id = id;
            return;
        }
        idx = (idx + 1) & mask;
    }
    v->slots[idx].key = s;
    v->slots[idx].keylen = n;
    v->slots[idx].id = id;
}

/* tokens_buf: concatenated utf-8 tokens; offsets: n+1 byte offsets */
void *wp_create(const char *tokens_buf, const int64_t *offsets, int64_t n,
                int32_t unk_id, int32_t max_token_chars) {
    Vocab *v = (Vocab *)calloc(1, sizeof(Vocab));
    if (!v) return NULL;
    int64_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    v->capacity = cap;
    v->slots = (Slot *)malloc((size_t)cap * sizeof(Slot));
    if (!v->slots) { free(v); return NULL; }
    for (int64_t i = 0; i < cap; i++) v->slots[i].id = -1;
    int64_t total = offsets[n];
    v->buf = (char *)malloc((size_t)(total > 0 ? total : 1));
    if (!v->buf) { free(v->slots); free(v); return NULL; }
    memcpy(v->buf, tokens_buf, (size_t)total);
    for (int64_t i = 0; i < n; i++) {
        vocab_insert(v, v->buf + offsets[i],
                     (int32_t)(offsets[i + 1] - offsets[i]), (int32_t)i);
    }
    v->unk_id = unk_id;
    v->max_token_chars = max_token_chars;
    return v;
}

void wp_free(void *handle) {
    Vocab *v = (Vocab *)handle;
    if (!v) return;
    free(v->slots);
    free(v->buf);
    free(v);
}

/* greedy longest-match-first wordpiece for one word (bytes, utf-8).
 * scratch must hold >= wlen entries. returns count, or -1 if word maps to
 * UNK (caller emits unk_id), or -2 scratch overflow (impossible: <= wlen).
 */
static int32_t wp_word(const Vocab *v, const char *w, int32_t wlen,
                       int32_t *out) {
    /* continuation candidate buffer: "##" + suffix */
    char cont[1024 + 2];
    if (wlen > 1024 || wlen > v->max_token_chars) return -1;
    int32_t count = 0;
    int32_t start = 0;
    while (start < wlen) {
        int32_t end = wlen;
        int32_t cur = -1;
        while (start < end) {
            int32_t id;
            if (start > 0) {
                cont[0] = '#'; cont[1] = '#';
                memcpy(cont + 2, w + start, (size_t)(end - start));
                id = vocab_lookup(v, cont, end - start + 2);
            } else {
                id = vocab_lookup(v, w, end);
            }
            if (id >= 0) { cur = id; break; }
            /* step back one utf-8 character (skip continuation bytes) */
            end--;
            while (end > start && ((uint8_t)w[end] & 0xC0) == 0x80) end--;
        }
        if (cur < 0) return -1;
        out[count++] = cur;
        start = end;
    }
    return count;
}

/* words_buf: concatenated utf-8 words; word_offsets: n_words+1 offsets.
 * out_ids: token ids; out_ends[i] = #ids after word i (prefix sums).
 * returns total ids, or -1 if max_out exceeded. */
int64_t wp_encode_words(void *handle, const char *words_buf,
                        const int64_t *word_offsets, int64_t n_words,
                        int32_t *out_ids, int64_t *out_ends,
                        int64_t max_out) {
    Vocab *v = (Vocab *)handle;
    int64_t total = 0;
    int32_t scratch[4096];
    for (int64_t i = 0; i < n_words; i++) {
        const char *w = words_buf + word_offsets[i];
        int32_t wlen = (int32_t)(word_offsets[i + 1] - word_offsets[i]);
        int32_t cnt;
        if (wlen > 4096) {
            cnt = -1;
        } else {
            cnt = wp_word(v, w, wlen, scratch);
        }
        if (cnt < 0) {
            if (total + 1 > max_out) return -1;
            out_ids[total++] = v->unk_id;
        } else {
            if (total + cnt > max_out) return -1;
            memcpy(out_ids + total, scratch, (size_t)cnt * sizeof(int32_t));
            total += cnt;
        }
        out_ends[i] = total;
    }
    return total;
}

/* Marshalling-free batch entry: words are joined with a separator byte
 * (never part of a word — the Python splitter removed whitespace). One
 * Python-side encode + one call. out_ends gets one entry per word, bounded
 * by max_words (the caller-allocated out_ends capacity; a word containing
 * the separator byte splits into extra words, which must NOT write past
 * the buffer). Returns total ids; n_words written to *out_n_words;
 * -1 on id-buffer overflow; -2 on word-count overflow. */
int64_t wp_encode_joined(void *handle, const char *buf, int64_t buf_len,
                         char sep, int32_t *out_ids, int64_t *out_ends,
                         int64_t max_out, int64_t max_words,
                         int64_t *out_n_words) {
    Vocab *v = (Vocab *)handle;
    int64_t total = 0;
    int64_t n_words = 0;
    int32_t scratch[4096];
    int64_t start = 0;
    for (int64_t i = 0; i <= buf_len; i++) {
        if (i == buf_len || buf[i] == sep) {
            int64_t wlen = i - start;
            if (wlen > 0) {
                int32_t cnt;
                if (n_words + 1 > max_words) return -2;
                cnt = (wlen > 4096)
                    ? -1
                    : wp_word(v, buf + start, (int32_t)wlen, scratch);
                if (cnt < 0) {
                    if (total + 1 > max_out) return -1;
                    out_ids[total++] = v->unk_id;
                } else {
                    if (total + cnt > max_out) return -1;
                    memcpy(out_ids + total, scratch,
                           (size_t)cnt * sizeof(int32_t));
                    total += cnt;
                }
                out_ends[n_words++] = total;
            }
            start = i + 1;
        }
    }
    *out_n_words = n_words;
    return total;
}
