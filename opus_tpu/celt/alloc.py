"""CELT bit allocation (reference: celt/rate.c clt_compute_allocation:535,
interp_bits2pulses:249; celt/celt.c init_caps:329).

Deterministic integer program shared by encoder and decoder; the skip /
intensity / dual-stereo decisions are entropy-coded inline, so the function
takes the range coder.  All arithmetic is exact Python int math.
"""

from __future__ import annotations

from .cwrs import BITRES
from .modes import CeltMode, MAX_FINE_BITS, FINE_OFFSET
from .tables import LOG2_FRAC_TABLE

ALLOC_STEPS = 6


def init_caps(mode: CeltMode, lm: int, c: int) -> list[int]:
    caps = []
    for i in range(mode.nbEBands):
        n = (mode.eBands[i + 1] - mode.eBands[i]) << lm
        caps.append((int(mode.cache.caps[mode.nbEBands * (2 * lm + c - 1) + i])
                     + 64) * c * n >> 2)
    return caps


def _interp_bits2pulses(mode: CeltMode, start, end, skip_start, bits1, bits2,
                        thresh, cap, total, skip_rsv, intensity, intensity_rsv,
                        dual_stereo, dual_stereo_rsv, c, lm, ec, encode, prev,
                        signal_bandwidth):
    """Returns (coded_bands, balance, bits, ebits, fine_priority,
    intensity, dual_stereo)."""
    alloc_floor = c << BITRES
    stereo = 1 if c > 1 else 0
    logM = lm << BITRES
    nb = mode.nbEBands
    eBands = mode.eBands

    lo, hi = 0, 1 << ALLOC_STEPS
    for _ in range(ALLOC_STEPS):
        mid = (lo + hi) >> 1
        psum = 0
        done = False
        for j in range(end - 1, start - 1, -1):
            tmp = bits1[j] + (mid * bits2[j] >> ALLOC_STEPS)
            if tmp >= thresh[j] or done:
                done = True
                psum += min(tmp, cap[j])
            elif tmp >= alloc_floor:
                psum += alloc_floor
        if psum > total:
            hi = mid
        else:
            lo = mid

    psum = 0
    done = False
    bits = [0] * nb
    for j in range(end - 1, start - 1, -1):
        tmp = bits1[j] + (lo * bits2[j] >> ALLOC_STEPS)
        if tmp < thresh[j] and not done:
            tmp = alloc_floor if tmp >= alloc_floor else 0
        else:
            done = True
        tmp = min(tmp, cap[j])
        bits[j] = tmp
        psum += tmp

    # skip decisions, working backwards
    coded_bands = end
    while True:
        j = coded_bands - 1
        if j <= skip_start:
            total += skip_rsv
            break
        left = total - psum
        percoeff = left // (eBands[coded_bands] - eBands[start])
        left -= (eBands[coded_bands] - eBands[start]) * percoeff
        rem = max(left - (eBands[j] - eBands[start]), 0)
        band_width = eBands[coded_bands] - eBands[j]
        band_bits = bits[j] + percoeff * band_width + rem
        if band_bits >= max(thresh[j], alloc_floor + (1 << BITRES)):
            if encode:
                if coded_bands > 17:
                    depth_threshold = 7 if j < prev else 9
                else:
                    depth_threshold = 0
                if (coded_bands <= start + 2
                        or (band_bits > ((depth_threshold * band_width << lm
                                          << BITRES) >> 4)
                            and j <= signal_bandwidth)):
                    ec.enc_bit_logp(1, 1)
                    break
                ec.enc_bit_logp(0, 1)
            elif ec.dec_bit_logp(1):
                break
            psum += 1 << BITRES
            band_bits -= 1 << BITRES
        psum -= bits[j] + intensity_rsv
        if intensity_rsv > 0:
            intensity_rsv = LOG2_FRAC_TABLE[j - start]
        psum += intensity_rsv
        if band_bits >= alloc_floor:
            psum += alloc_floor
            bits[j] = alloc_floor
        else:
            bits[j] = 0
        coded_bands -= 1

    assert coded_bands > start
    if intensity_rsv > 0:
        if encode:
            intensity = min(intensity, coded_bands)
            ec.enc_uint(intensity - start, coded_bands + 1 - start)
        else:
            intensity = start + ec.dec_uint(coded_bands + 1 - start)
    else:
        intensity = 0
    if intensity <= start:
        total += dual_stereo_rsv
        dual_stereo_rsv = 0
    if dual_stereo_rsv > 0:
        if encode:
            ec.enc_bit_logp(dual_stereo, 1)
        else:
            dual_stereo = ec.dec_bit_logp(1)
    else:
        dual_stereo = 0

    # distribute remaining bits
    left = total - psum
    percoeff = left // (eBands[coded_bands] - eBands[start])
    left -= (eBands[coded_bands] - eBands[start]) * percoeff
    for j in range(start, coded_bands):
        bits[j] += percoeff * (eBands[j + 1] - eBands[j])
    for j in range(start, coded_bands):
        tmp = min(left, eBands[j + 1] - eBands[j])
        bits[j] += tmp
        left -= tmp

    ebits = [0] * nb
    fine_priority = [0] * nb
    balance = 0
    for j in range(start, coded_bands):
        n0 = eBands[j + 1] - eBands[j]
        n = n0 << lm
        bit = bits[j] + balance
        if n > 1:
            excess = max(bit - cap[j], 0)
            bits[j] = bit - excess
            den = c * n + (1 if (c == 2 and n > 2 and not dual_stereo
                                 and j < intensity) else 0)
            nclogn = den * (mode.logN[j] + logM)
            offset = (nclogn >> 1) - den * FINE_OFFSET
            if n == 2:
                offset += den << BITRES >> 2
            if bits[j] + offset < (den * 2 << BITRES):
                offset += nclogn >> 2
            elif bits[j] + offset < (den * 3 << BITRES):
                offset += nclogn >> 3
            ebits[j] = max(0, bits[j] + offset + (den << (BITRES - 1)))
            ebits[j] = (ebits[j] // den) >> BITRES
            if c * ebits[j] > (bits[j] >> BITRES):
                ebits[j] = bits[j] >> stereo >> BITRES
            ebits[j] = min(ebits[j], MAX_FINE_BITS)
            fine_priority[j] = 1 if ebits[j] * (den << BITRES) >= bits[j] + offset else 0
            bits[j] -= c * ebits[j] << BITRES
        else:
            excess = max(0, bit - (c << BITRES))
            bits[j] = bit - excess
            ebits[j] = 0
            fine_priority[j] = 1
        if excess > 0:
            extra_fine = min(excess >> (stereo + BITRES), MAX_FINE_BITS - ebits[j])
            ebits[j] += extra_fine
            extra_bits = extra_fine * c << BITRES
            fine_priority[j] = 1 if extra_bits >= excess - balance else 0
            excess -= extra_bits
        balance = excess
        assert bits[j] >= 0 and ebits[j] >= 0

    for j in range(coded_bands, end):
        ebits[j] = bits[j] >> stereo >> BITRES
        assert c * ebits[j] << BITRES == bits[j]
        bits[j] = 0
        fine_priority[j] = 1 if ebits[j] < 1 else 0

    return coded_bands, balance, bits, ebits, fine_priority, intensity, dual_stereo


def compute_allocation(mode: CeltMode, start, end, offsets, cap, alloc_trim,
                       intensity, dual_stereo, total, c, lm, ec, encode=False,
                       prev=0, signal_bandwidth=0):
    """Returns (coded_bands, balance, pulses, ebits, fine_priority,
    intensity, dual_stereo)."""
    total = max(total, 0)
    nb = mode.nbEBands
    eBands = mode.eBands
    skip_start = start
    skip_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
    total -= skip_rsv
    intensity_rsv = dual_stereo_rsv = 0
    if c == 2:
        intensity_rsv = LOG2_FRAC_TABLE[end - start]
        if intensity_rsv > total:
            intensity_rsv = 0
        else:
            total -= intensity_rsv
            dual_stereo_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
            total -= dual_stereo_rsv

    thresh = [0] * nb
    trim_offset = [0] * nb
    for j in range(start, end):
        thresh[j] = max(c << BITRES,
                        (3 * (eBands[j + 1] - eBands[j]) << lm << BITRES) >> 4)
        trim_offset[j] = (c * (eBands[j + 1] - eBands[j])
                          * (alloc_trim - 5 - lm) * (end - j - 1)
                          * (1 << (lm + BITRES))) >> 6
        if (eBands[j + 1] - eBands[j]) << lm == 1:
            trim_offset[j] -= c << BITRES

    lo, hi = 1, mode.nbAllocVectors - 1
    av = mode.allocVectors
    while True:
        done = False
        psum = 0
        mid = (lo + hi) >> 1
        for j in range(end - 1, start - 1, -1):
            n = eBands[j + 1] - eBands[j]
            bitsj = c * n * int(av[mid, j]) << lm >> 2
            if bitsj > 0:
                bitsj = max(0, bitsj + trim_offset[j])
            bitsj += offsets[j]
            if bitsj >= thresh[j] or done:
                done = True
                psum += min(bitsj, cap[j])
            elif bitsj >= c << BITRES:
                psum += c << BITRES
        if psum > total:
            hi = mid - 1
        else:
            lo = mid + 1
        if lo > hi:
            break
    hi = lo
    lo -= 1

    bits1 = [0] * nb
    bits2 = [0] * nb
    skip_start_local = skip_start
    for j in range(start, end):
        n = eBands[j + 1] - eBands[j]
        bits1j = c * n * int(av[lo, j]) << lm >> 2
        bits2j = cap[j] if hi >= mode.nbAllocVectors else \
            c * n * int(av[hi, j]) << lm >> 2
        if bits1j > 0:
            bits1j = max(0, bits1j + trim_offset[j])
        if bits2j > 0:
            bits2j = max(0, bits2j + trim_offset[j])
        if lo > 0:
            bits1j += offsets[j]
        bits2j += offsets[j]
        if offsets[j] > 0:
            skip_start_local = j
        bits2j = max(0, bits2j - bits1j)
        bits1[j] = bits1j
        bits2[j] = bits2j

    return _interp_bits2pulses(mode, start, end, skip_start_local, bits1,
                               bits2, thresh, cap, total, skip_rsv, intensity,
                               intensity_rsv, dual_stereo, dual_stereo_rsv,
                               c, lm, ec, encode, prev, signal_bandwidth)


# ---------------------------------------------------------------------------
# QEXT: per-band extra depth allocation carried in the extension stream
# (reference: clt_compute_extra_allocation rate.c:725, ec_dec_depth rate.c:671)

_LAST_ZERO = (64, 50, 0)
_LAST_CAP = (110, 60, 0)
_LAST_OTHER = (120, 112, 70, 0)


def ec_dec_depth(dec, cap: int, last: int) -> tuple[int, int]:
    """Decode one band depth; returns (depth, new_last)
    (reference: ec_dec_depth rate.c:671)."""
    if last == 0:
        sym = dec.dec_icdf(_LAST_ZERO, 7)
        if sym == 2:
            sym = 3
    elif last == cap:
        sym = dec.dec_icdf(_LAST_CAP, 7)
        if sym == 2:
            sym = 3
    else:
        sym = dec.dec_icdf(_LAST_OTHER, 7)
    if sym == 0:
        depth = 0
    elif sym == 1:
        depth = cap
    elif sym == 2:
        depth = last
    else:
        depth = 1 + dec.dec_uint(cap)
    return depth, depth


def ec_enc_depth(enc, depth: int, cap: int, last: int) -> int:
    """Encode one band depth; returns new last
    (reference: ec_enc_depth rate.c:653)."""
    sym = 3
    if depth == last:
        sym = 2
    if depth == cap:
        sym = 1
    if depth == 0:
        sym = 0
    if last == 0:
        enc.enc_icdf(min(sym, 2), _LAST_ZERO, 7)
    elif last == cap:
        enc.enc_icdf(min(sym, 2), _LAST_CAP, 7)
    else:
        enc.enc_icdf(sym, _LAST_OTHER, 7)
    if sym == 3:
        enc.enc_uint(depth - 1, cap)
    return depth


def _depths_to_alloc(m: CeltMode, qext_mode, start, end, qext_end, depth,
                     extra_pulses, extra_equant, c, lm):
    for i in range(start, end):
        extra_equant[i] = (depth[i] + 3) >> 2
        extra_pulses[i] = ((((m.eBands[i + 1] - m.eBands[i]) << lm) - 1) * c
                           * depth[i] * (1 << BITRES) + 2) >> 2
    if qext_mode is not None:
        qe = qext_mode.eBands
        for i in range(qext_end):
            extra_equant[end + i] = (depth[end + i] + 3) >> 2
            extra_pulses[end + i] = ((((qe[i + 1] - qe[i]) << lm) - 1) * c
                                     * depth[end + i] * (1 << BITRES) + 2) >> 2


def clt_compute_extra_allocation_decode(m: CeltMode, qext_mode, start, end,
                                        qext_end, total, extra_pulses,
                                        extra_equant, c, lm, ec):
    """Decode-side extra allocation (reference:
    clt_compute_extra_allocation rate.c:725, decode branch rate.c:905-911).
    extra_pulses/extra_equant: arrays of nbEBands+qext_end ints, filled."""
    tot_bands = end + (qext_end if qext_mode is not None else 0)
    nb = m.nbEBands + (qext_end if qext_mode is not None else 0)
    if total <= 0:
        for i in range(start, nb):
            extra_pulses[i] = extra_equant[i] = 0
        return
    depth = [0] * tot_bands
    last = 0
    for i in range(start, tot_bands):
        if ec.tell_frac() + 80 < ec.storage * 8 << BITRES:
            depth[i], last = ec_dec_depth(ec, 4 * 14, last)
        else:
            depth[i] = 0
    _depths_to_alloc(m, qext_mode, start, end, qext_end, depth,
                     extra_pulses, extra_equant, c, lm)


def _median_of_5(x) -> float:
    """(reference: median_of_5_val16 rate.c:692)"""
    t2 = x[2]
    if x[0] > x[1]:
        t0, t1 = x[1], x[0]
    else:
        t0, t1 = x[0], x[1]
    if x[3] > x[4]:
        t3, t4 = x[4], x[3]
    else:
        t3, t4 = x[3], x[4]
    if t0 > t3:
        t0, t3 = t3, t0
        t1, t4 = t4, t1
    if t2 > t1:
        return min(t2, t3) if t1 < t3 else min(t4, t1)
    return min(t1, t3) if t2 < t3 else min(t2, t4)


def clt_compute_extra_allocation_encode(m: CeltMode, qext_mode, start, end,
                                        qext_end, band_log_e, qext_band_log_e,
                                        total, extra_pulses, extra_equant,
                                        c, lm, ec, tone_freq=0.0,
                                        toneishness=0.0):
    """Encode-side extra-depth allocation (reference:
    clt_compute_extra_allocation rate.c:725, float build): derives a
    per-band target depth from the flattened spectrum and codes it with
    ec_enc_depth.  band_log_e/qext_band_log_e: [2*nbEBands]-style arrays."""
    from .tables import E_MEANS
    import math as _m
    if qext_mode is not None:
        tot_bands = end + qext_end
        tot_samples = (qext_mode.eBands[qext_end] - m.eBands[start]) * c << lm
    else:
        tot_bands = end
        tot_samples = (m.eBands[end] - m.eBands[start]) * c << lm
    nb = m.nbEBands + (qext_end if qext_mode is not None else 0)
    cap = [14] * tot_bands
    if total <= 0:
        for i in range(start, nb):
            extra_pulses[i] = extra_equant[i] = 0
        return
    flat_e = [0.0] * tot_bands
    mins = [0.0] * tot_bands
    ncoef = [0] * tot_bands
    for i in range(start, end):
        ncoef[i] = (m.eBands[i + 1] - m.eBands[i]) * c << lm
        flat_e[i] = band_log_e[i] - 0.0625 * m.logN[i] + E_MEANS[i] \
            - 0.0062 * (i + 5) * (i + 5)
    if c == 2:
        for i in range(start, end):
            flat_e[i] = max(flat_e[i],
                            band_log_e[m.nbEBands + i] - 0.0625 * m.logN[i]
                            + E_MEANS[i] - 0.0062 * (i + 5) * (i + 5))
    if qext_mode is not None:
        min_depth = 0.0
        if (total >= 3 * c * (qext_mode.eBands[qext_end]
                              - qext_mode.eBands[0]) << lm << BITRES
                and (toneishness < 0.98 or tone_freq > 1.33)):
            min_depth = 1.0
        qe = qext_mode.eBands
        for i in range(qext_end):
            ncoef[end + i] = (qe[i + 1] - qe[i]) * c << lm
            mins[end + i] = min_depth
            flat_e[end + i] = qext_band_log_e[i] - 0.0625 * qext_mode.logN[i] \
                + E_MEANS[i] - 0.0062 * (end + i + 5) * (end + i + 5)
        if c == 2:
            from .modes import NB_QEXT_BANDS
            for i in range(qext_end):
                flat_e[end + i] = max(
                    flat_e[end + i],
                    qext_band_log_e[NB_QEXT_BANDS + i]
                    - 0.0625 * qext_mode.logN[i] + E_MEANS[i]
                    - 0.0062 * (end + i + 5) * (end + i + 5))
    follower = [0.0] * tot_bands
    if tot_bands - start >= 5:
        for i in range(start + 2, tot_bands - 2):
            follower[i] = _median_of_5(flat_e[i - 2:i + 3])
        follower[start] = follower[start + 1] = follower[start + 2]
        follower[tot_bands - 1] = follower[tot_bands - 2] = \
            follower[tot_bands - 3]
    else:
        for i in range(start, tot_bands):
            follower[i] = flat_e[i]
    for i in range(start + 1, tot_bands):
        follower[i] = max(follower[i], follower[i - 1] - 1.0)
    for i in range(tot_bands - 2, start - 1, -1):
        follower[i] = max(follower[i], follower[i + 1] - 1.0)
    if qext_mode is not None:
        for i in range(qext_end):
            flat_e[end + i] += 4.0 + 0.3 * i
            follower[end + i] += 5.0 + 0.6 * i
    for off, amt in ((4, 0.25), (3, 0.5), (2, 1.2), (1, 2.0)):
        flat_e[end - off] += amt
        follower[end - off] += amt
    dyn_cap = [max(0.0, min(flat_e[i] + 9.0, float(cap[i])))
               for i in range(tot_bands)]
    total >>= BITRES
    ssum = sum(ncoef[i] * dyn_cap[i] for i in range(start, tot_bands))
    depth = [0] * tot_bands
    last = 0
    if ssum <= total:
        dyn_tot = max(1, sum(ncoef[i] for i in range(start, tot_bands)
                             if dyn_cap[i] > 0))
        overfill = (total - ssum) / dyn_tot
        for i in range(start, tot_bands):
            if dyn_cap[i] > 0:
                dyn_cap[i] = min(float(cap[i]), dyn_cap[i] + overfill)
        for i in range(start, tot_bands):
            depth[i] = int(_m.floor(0.5 + 4 * dyn_cap[i]))
            if ec.tell_frac() + 80 < ec.storage * 8 << BITRES:
                last = ec_enc_depth(ec, depth[i], 4 * cap[i], last)
            else:
                depth[i] = 0
    else:
        for i in range(start, tot_bands):
            flat_e[i] -= (1.0 - toneishness) * follower[i]
        ssum = sum(ncoef[i] * flat_e[i] for i in range(start, tot_bands))
        fill = (total + ssum) / tot_samples
        for _ in range(20):
            ssum = sum(ncoef[i] * min(dyn_cap[i], max(mins[i],
                                                      flat_e[i] - fill))
                       for i in range(start, tot_bands))
            fill -= (total - ssum) / tot_samples
        for i in range(start, tot_bands):
            depth[i] = int(_m.floor(0.5 + 4 * min(dyn_cap[i],
                                                  max(mins[i],
                                                      flat_e[i] - fill))))
            if ec.tell_frac() + 80 < ec.storage * 8 << BITRES:
                last = ec_enc_depth(ec, depth[i], 4 * cap[i], last)
            else:
                depth[i] = 0
    _depths_to_alloc(m, qext_mode, start, end, qext_end, depth,
                     extra_pulses, extra_equant, c, lm)
