"""DRED decoder-side public objects (reference: src/opus_decoder.c
opus_dred_parse :1551 / opus_dred_process :1588 /
opus_decoder_dred_decode :1611, dred_find_payload :1468).

Two-stage API: `OpusDREDDecoder.parse` range-decodes the extension-126
payload into latents (cheap, per packet); `process` runs the RDOVAE
decoder into 10 ms feature frames (deferred, only when loss actually
happens).  `decode_audio` feeds those features into a deep-PLC
instance as FEC and synthesizes the concealment waveform."""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.extensions import ExtensionIterator, ExtensionData
from . import dred, rdovae, plc as plcmod

DRED_EXPERIMENTAL_BYTES = 2     # (dred_config.h:36)


class OpusDRED(NamedTuple):
    """(reference: OpusDRED struct, src/opus_private.h)"""
    process_stage: int
    dred_offset: int
    nb_latents: int
    state: np.ndarray
    latents: np.ndarray
    fec_features: Optional[np.ndarray]   # [4*nb, 20] newest first


def dred_find_payload(data: bytes):
    """Returns (payload bytes, dred_frame_offset) or None (reference:
    dred_find_payload src/opus_decoder.c:1468)."""
    parsed = pkt.packet_parse(data)
    if isinstance(parsed, int):
        return None
    frame_size = pkt.packet_get_samples_per_frame(data, 48000)
    it = ExtensionIterator(parsed.padding, parsed.count)
    while True:
        ext = it.find(dred.DRED_EXTENSION_ID)
        if not isinstance(ext, ExtensionData):
            return None
        frame_offset = ext.frame * frame_size // 120
        if len(ext.data) > DRED_EXPERIMENTAL_BYTES \
                and ext.data[0] == ord('D') \
                and ext.data[1] == dred.DRED_EXPERIMENTAL_VERSION:
            return bytes(ext.data[2:]), frame_offset


class OpusDREDDecoder:
    """(reference: OpusDREDDecoder; holds the RDOVAE decoder model)"""

    def __init__(self, dec_model: rdovae.RDOVAEDec,
                 stats: dred.DREDStats):
        self.model = dec_model
        self.stats = stats

    def parse(self, data: bytes, max_dred_samples: int, fs: int,
              defer_processing: bool = True):
        """(reference: opus_dred_parse src/opus_decoder.c:1551).
        Returns (OpusDRED | None, dred_end_samples)."""
        found = dred_find_payload(data)
        if found is None:
            return None, 0
        payload, frame_offset = found
        res = dred.dred_decode(self.stats, payload,
                               max_dred_samples * 400 // fs // 4,
                               frame_offset)
        if res.nb_latents == 0:
            return None, 0
        out = OpusDRED(1, res.dred_offset, res.nb_latents, res.state,
                       res.latents, None)
        if not defer_processing:
            out = self.process(out)
        dred_end = max(0, -res.dred_offset * fs // 400)
        return out, dred_end

    def process(self, d: OpusDRED) -> OpusDRED:
        """(reference: opus_dred_process src/opus_decoder.c:1588)"""
        if d.process_stage == 2:
            return d
        feats = np.asarray(rdovae.decode_all(self.model, d.state,
                                             d.latents))
        return d._replace(process_stage=2, fec_features=feats)


def feed_dred_fec(lpcnet: plcmod.LPCNetPLC, d: OpusDRED,
                  dred_offset: int, fs: int, frame_size: int):
    """Queue DRED features into a deep-PLC instance for the coming
    concealment call (reference: src/opus_decoder.c:735-760)."""
    assert d.process_stage == 2
    f10 = fs // 100
    lpcnet.fec_clear()
    init_frames = 2 if lpcnet.blend == 0 else 0
    features_per_frame = max(1, frame_size // f10)
    for i in range(init_frames + features_per_frame):
        offs = init_frames - i - 2 + int(np.floor(
            (dred_offset + d.dred_offset * f10 / 4) / f10))
        if 0 <= offs <= 4 * d.nb_latents - 1:
            lpcnet.fec_add(d.fec_features[offs])
        elif offs >= 0:
            lpcnet.fec_add(None)
