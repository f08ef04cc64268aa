/* Range decoder hot loop as native code (RFC 6716 section 4.1).
 *
 * Semantics mirror opus_tpu/bitstream/range_coder.py exactly (which is
 * itself bit-exact with the reference celt/entdec.c): the Python class
 * remains the oracle and the fallback; this file only accelerates the
 * per-stream symbol pass, which is the one inherently byte-sequential
 * part of the codec that the TPU cannot batch.
 *
 * Built at first use by opus_tpu/native/build.py with the system cc;
 * no external dependencies.
 */

#include <stdint.h>

#include "entropy.h"

#define SYM_BITS 8
#define CODE_BITS 32
#define SYM_MAX ((1u << SYM_BITS) - 1)
#define CODE_TOP (1u << (CODE_BITS - 1))
#define CODE_BOT (CODE_TOP >> SYM_BITS)
#define CODE_EXTRA (((CODE_BITS - 2) % SYM_BITS) + 1)
#define UINT_BITS 8
#define WINDOW_SIZE 32

static int read_byte(ecdec *d) {
    if (d->offs < d->storage) return d->buf[d->offs++];
    return 0;
}

static int read_byte_from_end(ecdec *d) {
    if (d->end_offs < d->storage) {
        d->end_offs++;
        return d->buf[d->storage - d->end_offs];
    }
    return 0;
}

static void normalize(ecdec *d) {
    while (d->rng <= CODE_BOT) {
        int sym;
        d->nbits_total += SYM_BITS;
        d->rng <<= SYM_BITS;
        sym = d->rem;
        d->rem = read_byte(d);
        sym = ((sym << SYM_BITS) | d->rem) >> (SYM_BITS - CODE_EXTRA);
        d->val = ((d->val << SYM_BITS) + (SYM_MAX & ~(uint32_t)sym))
                 & (CODE_TOP - 1);
    }
}

void ecd_init(ecdec *d, const unsigned char *buf, int32_t storage) {
    d->buf = buf;
    d->storage = storage;
    d->end_offs = 0;
    d->end_window = 0;
    d->nend_bits = 0;
    d->nbits_total = CODE_BITS + 1
        - ((CODE_BITS - CODE_EXTRA) / SYM_BITS) * SYM_BITS;
    d->offs = 0;
    d->rng = 1u << CODE_EXTRA;
    d->rem = read_byte(d);
    d->val = d->rng - 1 - (uint32_t)(d->rem >> (SYM_BITS - CODE_EXTRA));
    d->error = 0;
    d->ext = 0;
    normalize(d);
}

uint32_t ecd_decode(ecdec *d, uint32_t ft) {
    uint32_t s;
    d->ext = d->rng / ft;
    s = d->val / d->ext;
    return ft - (s + 1 < ft ? s + 1 : ft);
}

uint32_t ecd_decode_bin(ecdec *d, int32_t bits) {
    uint32_t s, total = 1u << bits;
    d->ext = d->rng >> bits;
    s = d->val / d->ext;
    return total - (s + 1 < total ? s + 1 : total);
}

void ecd_update(ecdec *d, uint32_t fl, uint32_t fh, uint32_t ft) {
    uint32_t s = d->ext * (ft - fh);
    d->val -= s;
    d->rng = fl > 0 ? d->ext * (fh - fl) : d->rng - s;
    normalize(d);
}

int32_t ecd_dec_bit_logp(ecdec *d, int32_t logp) {
    uint32_t r = d->rng, v = d->val, s = r >> logp;
    int32_t ret = v < s;
    if (!ret) d->val = v - s;
    d->rng = ret ? s : r - s;
    normalize(d);
    return ret;
}

int32_t ecd_dec_icdf(ecdec *d, const unsigned char *icdf, int32_t ftb) {
    uint32_t s = d->rng, v = d->val, r = s >> ftb, t;
    int32_t ret = -1;
    do {
        t = s;
        s = r * icdf[++ret];
    } while (v < s);
    d->val = v - s;
    d->rng = t - s;
    normalize(d);
    return ret;
}

uint32_t ecd_dec_bits(ecdec *d, int32_t bits) {
    uint32_t window = d->end_window, ret;
    int32_t available = d->nend_bits;
    if (available < bits) {
        do {
            window |= (uint32_t)read_byte_from_end(d) << available;
            available += SYM_BITS;
        } while (available <= WINDOW_SIZE - SYM_BITS);
    }
    ret = window & ((1u << bits) - 1);
    window >>= bits;
    available -= bits;
    d->end_window = window;
    d->nend_bits = available;
    d->nbits_total += bits;
    return ret;
}

static int ilog32(uint32_t v) {
    int n = 0;
    while (v) { n++; v >>= 1; }
    return n;
}

uint32_t ecd_dec_uint(ecdec *d, uint32_t ft) {
    int32_t ftb;
    ft--;
    ftb = ilog32(ft);
    if (ftb > UINT_BITS) {
        uint32_t ftrunc, s, t;
        ftb -= UINT_BITS;
        ftrunc = (ft >> ftb) + 1;
        s = ecd_decode(d, ftrunc);
        ecd_update(d, s, s + 1, ftrunc);
        t = (s << ftb) | ecd_dec_bits(d, ftb);
        if (t <= ft) return t;
        d->error = 1;
        return ft;
    } else {
        uint32_t s;
        ft++;
        s = ecd_decode(d, ft);
        ecd_update(d, s, s + 1, ft);
        return s;
    }
}
