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

/* ------------------------------------------------------------------ */
/* Range encoder (RFC 6716 section 4.1; mirrors RangeEncoder in       */
/* opus_tpu/bitstream/range_coder.py, itself bit-exact with the       */
/* reference celt/entenc.c).                                          */

static int ece_write_byte(ecenc *e, uint32_t value) {
    if (e->offs + e->end_offs >= e->storage) return -1;
    e->buf[e->offs++] = (unsigned char)(value & 0xFF);
    return 0;
}

static int ece_write_byte_at_end(ecenc *e, uint32_t value) {
    if (e->offs + e->end_offs >= e->storage) return -1;
    e->end_offs++;
    e->buf[e->storage - e->end_offs] = (unsigned char)(value & 0xFF);
    return 0;
}

static void ece_carry_out(ecenc *e, int c) {
    if ((uint32_t)c != SYM_MAX) {
        int carry = c >> SYM_BITS;
        if (e->rem >= 0) e->error |= ece_write_byte(e, e->rem + carry);
        if (e->ext > 0) {
            uint32_t sym = (SYM_MAX + carry) & SYM_MAX;
            while (e->ext > 0) {
                e->error |= ece_write_byte(e, sym);
                e->ext--;
            }
        }
        e->rem = c & SYM_MAX;
    } else {
        e->ext++;
    }
}

static void ece_normalize(ecenc *e) {
    while (e->rng <= CODE_BOT) {
        ece_carry_out(e, (int)(e->val >> (CODE_BITS - SYM_BITS - 1)));
        e->val = (e->val << SYM_BITS) & (CODE_TOP - 1);
        e->rng <<= SYM_BITS;
        e->nbits_total += SYM_BITS;
    }
}

void ece_init(ecenc *e, unsigned char *buf, int32_t size) {
    e->buf = buf;
    e->storage = size;
    e->end_offs = 0;
    e->end_window = 0;
    e->nend_bits = 0;
    e->nbits_total = CODE_BITS + 1;
    e->offs = 0;
    e->rng = CODE_TOP;
    e->rem = -1;
    e->val = 0;
    e->ext = 0;
    e->error = 0;
}

void ece_encode(ecenc *e, uint32_t fl, uint32_t fh, uint32_t ft) {
    uint32_t r = e->rng / ft;
    if (fl > 0) {
        e->val += e->rng - r * (ft - fl);
        e->rng = r * (fh - fl);
    } else {
        e->rng -= r * (ft - fh);
    }
    ece_normalize(e);
}

void ece_encode_bin(ecenc *e, uint32_t fl, uint32_t fh, int32_t bits) {
    uint32_t r = e->rng >> bits;
    uint32_t total = 1u << bits;
    if (fl > 0) {
        e->val += e->rng - r * (total - fl);
        e->rng = r * (fh - fl);
    } else {
        e->rng -= r * (total - fh);
    }
    ece_normalize(e);
}

void ece_enc_bit_logp(ecenc *e, int32_t val, int32_t logp) {
    uint32_t r = e->rng;
    uint32_t s = r >> logp;
    r -= s;
    if (val) e->val += r;
    e->rng = val ? s : r;
    ece_normalize(e);
}

void ece_enc_icdf(ecenc *e, int32_t s, const unsigned char *icdf,
                  int32_t ftb) {
    uint32_t r = e->rng >> ftb;
    if (s > 0) {
        e->val += e->rng - r * icdf[s - 1];
        e->rng = r * (uint32_t)(icdf[s - 1] - icdf[s]);
    } else {
        e->rng -= r * icdf[s];
    }
    ece_normalize(e);
}

void ece_enc_bits(ecenc *e, uint32_t fl, int32_t bits) {
    uint32_t window = e->end_window;
    int32_t used = e->nend_bits;
    if (used + bits > WINDOW_SIZE) {
        while (used >= SYM_BITS) {
            e->error |= ece_write_byte_at_end(e, window & SYM_MAX);
            window >>= SYM_BITS;
            used -= SYM_BITS;
        }
    }
    window |= fl << used;
    used += bits;
    e->end_window = window;
    e->nend_bits = used;
    e->nbits_total += bits;
}

void ece_enc_uint(ecenc *e, uint32_t fl, uint32_t ft) {
    int32_t ftb;
    ft--;
    ftb = ec_ilog(ft);
    if (ftb > UINT_BITS) {
        ftb -= UINT_BITS;
        ece_encode(e, fl >> ftb, (fl >> ftb) + 1, (ft >> ftb) + 1);
        ece_enc_bits(e, fl & ((1u << ftb) - 1), ftb);
    } else {
        ece_encode(e, fl, fl + 1, ft + 1);
    }
}

void ece_shrink(ecenc *e, int32_t size) {
    /* move the raw-bit tail so it abuts the new, smaller storage end */
    int32_t i;
    for (i = 0; i < e->end_offs; i++)
        e->buf[size - e->end_offs + i] = e->buf[e->storage - e->end_offs + i];
    e->storage = size;
}

void ece_done(ecenc *e) {
    int32_t l = CODE_BITS - ec_ilog(e->rng);
    uint32_t msk = (CODE_TOP - 1) >> l;
    uint32_t end = (e->val + msk) & ~msk;
    uint32_t window;
    int32_t used;
    if ((end | msk) >= e->val + e->rng) {
        l++;
        msk >>= 1;
        end = (e->val + msk) & ~msk;
    }
    while (l > 0) {
        ece_carry_out(e, (int)(end >> (CODE_BITS - SYM_BITS - 1)));
        end = (end << SYM_BITS) & (CODE_TOP - 1);
        l -= SYM_BITS;
    }
    if (e->rem >= 0 || e->ext > 0) ece_carry_out(e, 0);
    window = e->end_window;
    used = e->nend_bits;
    while (used >= SYM_BITS) {
        e->error |= ece_write_byte_at_end(e, window & SYM_MAX);
        window >>= SYM_BITS;
        used -= SYM_BITS;
    }
    if (!e->error) {
        int32_t i;
        for (i = e->offs; i < e->storage - e->end_offs; i++) e->buf[i] = 0;
        if (used > 0) {
            if (e->end_offs >= e->storage) {
                e->error = -1;
            } else {
                l = -l;
                if (e->offs + e->end_offs >= e->storage && l < used) {
                    window &= (1u << l) - 1;
                    e->error = -1;
                }
                e->buf[e->storage - e->end_offs - 1] |=
                    (unsigned char)(window & 0xFF);
            }
        }
    }
}
