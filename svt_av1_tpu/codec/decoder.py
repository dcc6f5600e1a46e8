"""Verification decoder: parses our emitted AV1 streams and reconstructs
frames, mirroring the spec decode process for the supported subset.

Used by tests to prove syntax round-trips through real range-coded bytes
and that reconstruction matches the encoder's recon (the analog of the
reference E2E tests' recon-vs-decode comparison, SvtAv1E2EFramework)."""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from svt_av1_tpu.codec import obu
from svt_av1_tpu.codec.syntax import TileDecoder
from svt_av1_tpu.pipeline.intra_encoder import (apply_loop_filter,
                                                reconstruct_from_decisions)
from svt_av1_tpu.utils.bitio import BitReader


class Decoder:
    def __init__(self):
        self.sp: Optional[obu.SequenceParams] = None

    def decode_temporal_unit(self, data: bytes) -> List[Dict[str, np.ndarray]]:
        frames = []
        for obu_type, payload in obu.parse_obus(data):
            if obu_type == obu.OBU_TEMPORAL_DELIMITER:
                continue
            if obu_type == obu.OBU_SEQUENCE_HEADER:
                self.sp = obu.read_sequence_header(payload)
            elif obu_type == obu.OBU_FRAME:
                assert self.sp is not None, "no sequence header seen"
                frames.append(self._decode_frame(payload))
            else:
                raise NotImplementedError(f"obu type {obu_type}")
        return frames

    def _decode_frame(self, payload: bytes) -> Dict[str, np.ndarray]:
        r = BitReader(payload)
        fp = obu.read_frame_header(r, self.sp)
        r.byte_align()
        tile_data = payload[r.byte_pos:]
        tdec = TileDecoder(self.sp.width, self.sp.height, fp.base_q_idx,
                           reduced_tx_set=fp.reduced_tx_set,
                           update_cdfs=not fp.disable_cdf_update)
        decisions = tdec.decode(tile_data)
        recon = reconstruct_from_decisions(decisions, self.sp.width,
                                           self.sp.height, fp.base_q_idx,
                                           bd=self.sp.bit_depth)
        recon = apply_loop_filter(recon, fp)
        recon["decisions"] = decisions
        return recon
