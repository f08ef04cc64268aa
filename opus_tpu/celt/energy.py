"""Band energy quantization, encode side (reference: celt/quant_bands.c).

Float build semantics: celt_glog == float, DB_SHIFT a no-op."""

from __future__ import annotations

import math

import numpy as np

from ..bitstream.range_coder import RangeEncoder, ec_tell, ec_tell_frac
from ..bitstream import laplace
from .modes import CeltMode
from .tables import (E_PROB_MODEL, SMALL_ENERGY_ICDF, PRED_COEF, BETA_COEF,
                     BETA_INTRA, E_MEANS)


def amp2log2(mode: CeltMode, eff_end, end, band_e, band_log_e, c):
    for ch in range(c):
        for i in range(eff_end):
            band_log_e[ch * mode.nbEBands + i] = \
                math.log2(band_e[ch * mode.nbEBands + i]) - E_MEANS[i]
        for i in range(eff_end, end):
            band_log_e[ch * mode.nbEBands + i] = -14.0


def compute_band_energies(mode: CeltMode, freq, band_e, end, c, lm):
    n = mode.shortMdctSize << lm
    for ch in range(c):
        for i in range(end):
            seg = freq[ch * n + (mode.eBands[i] << lm):
                       ch * n + (mode.eBands[i + 1] << lm)]
            band_e[i + ch * mode.nbEBands] = math.sqrt(
                1e-27 + float(np.dot(seg, seg)))


def normalise_bands(mode: CeltMode, freq, x, band_e, end, c, m):
    n = m * mode.shortMdctSize
    for ch in range(c):
        for i in range(end):
            g = 1.0 / (1e-27 + band_e[i + ch * mode.nbEBands])
            lo, hi = m * mode.eBands[i], m * mode.eBands[i + 1]
            x[ch * n + lo:ch * n + hi] = freq[ch * n + lo:ch * n + hi] * g


def _loss_distortion(e_bands, old_e_bands, start, end, nb, c):
    dist = 0.0
    for ch in range(c):
        for i in range(start, end):
            d = e_bands[i + ch * nb] - old_e_bands[i + ch * nb]
            dist += d * d
    return min(200.0, dist)


def _quant_coarse_impl(mode, start, end, e_bands, old_e_bands, budget, tell,
                       prob_model, error, enc, c, lm, intra, max_decay, lfe):
    badness = 0
    prev = [0.0, 0.0]
    if tell + 3 <= budget:
        enc.enc_bit_logp(intra, 3)
    if intra:
        coef = 0.0
        beta = BETA_INTRA
    else:
        beta = BETA_COEF[lm]
        coef = PRED_COEF[lm]
    nb = mode.nbEBands
    for i in range(start, end):
        for ch in range(c):
            x = e_bands[i + ch * nb]
            old_e = max(-9.0, old_e_bands[i + ch * nb])
            f = x - coef * old_e - prev[ch]
            qi = int(math.floor(.5 + f))
            decay_bound = max(-28.0, old_e_bands[i + ch * nb]) - max_decay
            if qi < 0 and x < decay_bound:
                qi += int(decay_bound - x)
                if qi > 0:
                    qi = 0
            qi0 = qi
            tell = ec_tell(enc)
            bits_left = budget - tell - 3 * c * (end - i)
            if i != start and bits_left < 30:
                if bits_left < 24:
                    qi = min(1, qi)
                if bits_left < 16:
                    qi = max(-1, qi)
            if lfe and i >= 2:
                qi = min(qi, 0)
            if budget - tell >= 15:
                pi = 2 * min(i, 20)
                qi = laplace.laplace_encode(enc, qi, prob_model[pi] << 7,
                                            prob_model[pi + 1] << 6)
            elif budget - tell >= 2:
                qi = max(-1, min(qi, 1))
                enc.enc_icdf(2 * qi ^ -(1 if qi < 0 else 0),
                             SMALL_ENERGY_ICDF, 2)
            elif budget - tell >= 1:
                qi = min(0, qi)
                enc.enc_bit_logp(-qi, 1)
            else:
                qi = -1
            error[i + ch * nb] = f - qi
            badness += abs(qi0 - qi)
            q = float(qi)
            tmp = coef * old_e + prev[ch] + q
            old_e_bands[i + ch * nb] = tmp
            prev[ch] = prev[ch] + q - beta * q
    return 0 if lfe else badness


def quant_coarse_energy(mode: CeltMode, start, end, eff_end, e_bands,
                        old_e_bands, budget, error, enc: RangeEncoder, c, lm,
                        nb_available_bytes, force_intra, delayed_intra,
                        two_pass, loss_rate, lfe):
    """Returns new delayed_intra (reference: quant_coarse_energy
    quant_bands.c:260)."""
    nb = mode.nbEBands
    intra = force_intra or (not two_pass and delayed_intra > 2 * c * (end - start)
                            and nb_available_bytes > (end - start) * c)
    intra_bias = int(budget * delayed_intra * loss_rate / (c * 512))
    new_distortion = _loss_distortion(e_bands, old_e_bands, start, eff_end,
                                      nb, c)
    tell = ec_tell(enc)
    if tell + 3 > budget:
        two_pass = intra = 0
    max_decay = 16.0
    if end - start > 10:
        max_decay = min(max_decay, .125 * nb_available_bytes)
    if lfe:
        max_decay = 3.0

    start_state = enc.save_state()
    old_intra = list(old_e_bands)
    error_intra = [0.0] * (c * nb)
    badness1 = 0
    if two_pass or intra:
        badness1 = _quant_coarse_impl(mode, start, end, e_bands, old_intra,
                                      budget, tell, E_PROB_MODEL[lm][1],
                                      error_intra, enc, c, lm, 1, max_decay,
                                      lfe)
    if not intra:
        intra_state = enc.save_state()
        tell_intra = ec_tell_frac(enc)
        enc.restore_state(start_state)
        badness2 = _quant_coarse_impl(mode, start, end, e_bands, old_e_bands,
                                      budget, tell, E_PROB_MODEL[lm][0],
                                      error, enc, c, lm, 0, max_decay, lfe)
        if two_pass and (badness1 < badness2
                         or (badness1 == badness2
                             and ec_tell_frac(enc) + intra_bias > tell_intra)):
            enc.restore_state(intra_state)
            old_e_bands[:] = old_intra
            error[:] = error_intra
            intra = 1
    else:
        old_e_bands[:] = old_intra
        error[:] = error_intra

    if intra:
        return new_distortion
    return (PRED_COEF[lm] * PRED_COEF[lm]) * delayed_intra + new_distortion


def quant_fine_energy(mode: CeltMode, start, end, old_e_bands, error,
                      prev_quant, extra_quant, enc, c):
    nb = mode.nbEBands
    for i in range(start, end):
        if extra_quant[i] <= 0:
            continue
        extra = 1 << extra_quant[i]
        if ec_tell(enc) + c * extra_quant[i] > enc.storage * 8:
            continue
        prev = prev_quant[i] if prev_quant is not None else 0
        for ch in range(c):
            q2 = int(math.floor((error[i + ch * nb] * (1 << prev) + .5) * extra))
            q2 = max(0, min(extra - 1, q2))
            enc.enc_bits(q2, extra_quant[i])
            offset = (q2 + .5) * (1 << (14 - extra_quant[i])) / 16384.0 - .5
            offset *= (1 << (14 - prev)) / 16384.0
            old_e_bands[i + ch * nb] += offset
            error[i + ch * nb] -= offset


def quant_energy_finalise(mode: CeltMode, start, end, old_e_bands, error,
                          fine_quant, fine_priority, bits_left, enc, c):
    nb = mode.nbEBands
    for prio in range(2):
        i = start
        while i < end and bits_left >= c:
            if fine_quant[i] >= 8 or fine_priority[i] != prio:
                i += 1
                continue
            for ch in range(c):
                q2 = 0 if error[i + ch * nb] < 0 else 1
                enc.enc_bits(q2, 1)
                offset = (q2 - .5) * (1 << (14 - fine_quant[i] - 1)) / 16384.0
                if old_e_bands is not None:
                    old_e_bands[i + ch * nb] += offset
                error[i + ch * nb] -= offset
                bits_left -= 1
            i += 1
