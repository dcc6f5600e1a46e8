"""Verification decoder: parses our emitted AV1 streams and reconstructs
frames, mirroring the spec decode process for the supported subset.

Used by tests to prove syntax round-trips through real range-coded bytes
and that reconstruction matches the encoder's recon (the analog of the
reference E2E tests' recon-vs-decode comparison, SvtAv1E2EFramework)."""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from svt_av1_tpu.codec import obu
from svt_av1_tpu.codec.syntax import TileDecoder
from svt_av1_tpu.pipeline.intra_encoder import (apply_loop_filter,
                                                reconstruct_from_decisions)


class Decoder:
    def __init__(self):
        self.sp: Optional[obu.SequenceParams] = None
        # decoded-picture buffer: slot 0 holds the last refreshed frame
        self.ref: Optional[Dict[str, np.ndarray]] = None
        self.ref_cdfs = None
        self.ref_nmv = None

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
        from svt_av1_tpu.utils.bitio import BitReader
        r = BitReader(payload)
        fp = obu.read_frame_header(r, self.sp)
        r.byte_align()
        tile_data = payload[r.byte_pos:]
        is_intra = fp.frame_type in (obu.KEY_FRAME, obu.INTRA_ONLY_FRAME)
        coded_w = fp.coded_width(self.sp.width)
        chain = (not is_intra
                 and fp.primary_ref_frame != obu.PRIMARY_REF_NONE)
        tdec = TileDecoder(coded_w, self.sp.height, fp.base_q_idx,
                           reduced_tx_set=fp.reduced_tx_set,
                           update_cdfs=not fp.disable_cdf_update,
                           frame_is_intra=is_intra,
                           init_cdfs=self.ref_cdfs if chain else None,
                           init_nmv=self.ref_nmv if chain else None)
        lr_info = None
        if self.sp.enable_restoration:
            from svt_av1_tpu.codec import lr as lr_mod
            w, h = self.sp.width, self.sp.height
            cw, ch = (w + 1) >> 1, (h + 1) >> 1
            csize = fp.lr_unit_size >> (1 if fp.lr_uv_half else 0)
            lr_info = [
                lr_mod.PlaneLrInfo(fp.lr_types[0], fp.lr_unit_size, w, h),
                lr_mod.PlaneLrInfo(fp.lr_types[1], csize, cw, ch),
                lr_mod.PlaneLrInfo(fp.lr_types[2], csize, cw, ch),
            ]
            tdec.set_lr(lr_info)
        if fp.delta_q_present:
            tdec.set_delta_q(fp.delta_q_res)
        decisions = tdec.decode(tile_data)
        if not fp.disable_frame_end_update_cdf:
            self.ref_cdfs = tdec.cdfs
            self.ref_nmv = tdec.nmv
        if is_intra:
            recon = reconstruct_from_decisions(decisions, coded_w,
                                               self.sp.height,
                                               fp.base_q_idx,
                                               bd=self.sp.bit_depth)
        else:
            from svt_av1_tpu.pipeline.inter_encoder import (
                reconstruct_inter_from_decisions)
            assert self.ref is not None, "P frame with empty DPB"
            assert coded_w == self.sp.width, \
                "superres + inter needs scaled-reference MC (next round)"
            recon = reconstruct_inter_from_decisions(
                decisions, self.ref, coded_w, self.sp.height,
                fp.base_q_idx, bd=self.sp.bit_depth)
        recon = apply_loop_filter(recon, fp)
        deblocked = recon
        if self.sp.enable_cdef:
            from svt_av1_tpu.api.encoder import _skip_map
            from svt_av1_tpu.pipeline import cdef_stage
            skip16 = _skip_map(decisions, self.sp.height // 16,
                               coded_w // 16)
            recon = cdef_stage.cdef_apply(recon, skip16,
                                          fp.cdef_strengths,
                                          fp.cdef_damping,
                                          bd=self.sp.bit_depth)
        if fp.superres_denom != 8:
            from svt_av1_tpu.api.encoder import _superres_upscale_frame
            recon = _superres_upscale_frame(recon, self.sp.width,
                                            self.sp.bit_depth)
            deblocked = _superres_upscale_frame(deblocked, self.sp.width,
                                                self.sp.bit_depth)
        if lr_info is not None:
            from svt_av1_tpu.pipeline import lr_stage
            bounds = lr_stage.save_boundaries(deblocked)
            recon = lr_stage.apply_lr(recon, bounds, lr_info,
                                      bd=self.sp.bit_depth)
        if fp.refresh_frame_flags:
            self.ref = {k: recon[k] for k in ("y", "u", "v")}
        recon["decisions"] = decisions
        return recon
