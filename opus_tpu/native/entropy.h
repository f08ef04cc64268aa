/* Shared declarations for the native range decoder (entropy.c).
 *
 * Struct layout must stay in sync with NativeRangeDecoder in
 * opus_tpu/bitstream/native_rc.py (ctypes mirror).
 */
#ifndef OPUS_TPU_ENTROPY_H
#define OPUS_TPU_ENTROPY_H

#include <stdint.h>

typedef struct {
    const unsigned char *buf;
    int32_t storage;
    int32_t end_offs;
    uint32_t end_window;
    int32_t nend_bits;
    int32_t nbits_total;
    int32_t offs;
    uint32_t rng;
    uint32_t val;
    uint32_t ext;
    int32_t rem;
    int32_t error;
} ecdec;

void ecd_init(ecdec *d, const unsigned char *buf, int32_t storage);
uint32_t ecd_decode(ecdec *d, uint32_t ft);
uint32_t ecd_decode_bin(ecdec *d, int32_t bits);
void ecd_update(ecdec *d, uint32_t fl, uint32_t fh, uint32_t ft);
int32_t ecd_dec_bit_logp(ecdec *d, int32_t logp);
int32_t ecd_dec_icdf(ecdec *d, const unsigned char *icdf, int32_t ftb);
uint32_t ecd_dec_bits(ecdec *d, int32_t bits);
uint32_t ecd_dec_uint(ecdec *d, uint32_t ft);

typedef struct {
    unsigned char *buf;
    int32_t storage;
    int32_t end_offs;
    uint32_t end_window;
    int32_t nend_bits;
    int32_t nbits_total;
    int32_t offs;
    uint32_t rng;
    uint32_t val;
    uint32_t ext;
    int32_t rem;
    int32_t error;
} ecenc;

void ece_init(ecenc *e, unsigned char *buf, int32_t size);
void ece_encode(ecenc *e, uint32_t fl, uint32_t fh, uint32_t ft);
void ece_encode_bin(ecenc *e, uint32_t fl, uint32_t fh, int32_t bits);
void ece_enc_bit_logp(ecenc *e, int32_t val, int32_t logp);
void ece_enc_icdf(ecenc *e, int32_t s, const unsigned char *icdf,
                  int32_t ftb);
void ece_enc_bits(ecenc *e, uint32_t fl, int32_t bits);
void ece_enc_uint(ecenc *e, uint32_t fl, uint32_t ft);
void ece_shrink(ecenc *e, int32_t size);
void ece_done(ecenc *e);

static inline int ec_ilog(uint32_t v) {
    int n = 0;
    while (v) { n++; v >>= 1; }
    return n;
}

static inline int32_t ecd_tell(const ecdec *d) {
    return d->nbits_total - ec_ilog(d->rng);
}

static inline int32_t ece_tell(const ecenc *e) {
    return e->nbits_total - ec_ilog(e->rng);
}

static inline uint32_t ece_tell_frac(const ecenc *e) {
    static const unsigned correction[8] =
        {35733, 38967, 42495, 46340, 50535, 55109, 60097, 65535};
    uint32_t nbits = (uint32_t)e->nbits_total << 3;
    int l = ec_ilog(e->rng);
    uint32_t r = e->rng >> (l - 16);
    int b = (int)(r >> 12) - 8;
    if (r > correction[b]) b++;
    l = (l << 3) + b;
    return nbits - (uint32_t)l;
}

static inline uint32_t ecd_tell_frac(const ecdec *d) {
    /* (reference: ec_tell_frac celt/entcode.c:69) */
    static const unsigned correction[8] =
        {35733, 38967, 42495, 46340, 50535, 55109, 60097, 65535};
    uint32_t nbits = (uint32_t)d->nbits_total << 3;
    int l = ec_ilog(d->rng);
    uint32_t r = d->rng >> (l - 16);
    int b = (int)(r >> 12) - 8;
    if (r > correction[b]) b++;
    l = (l << 3) + b;
    return nbits - (uint32_t)l;
}

#endif
