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
        # decoded-picture buffer: 8 slots, each with its saved CDF state
        # (spec 7.20 reference frame update; CdfFrame[] per slot)
        self.slots: list = [None] * 8
        self.slot_cdfs: list = [None] * 8
        self.slot_nmv: list = [None] * 8
        # per-slot order hints (spec RefOrderHint[]; skip-mode pair and
        # error-resilient ref_order_hint checks derive from these)
        self.slot_hints: list = [0] * 8
        # per-slot saved motion fields (spec 7.20 MV storage; feeds the
        # 7.9 motion-field projection when use_ref_frame_mvs is set)
        self.slot_mvfield: list = [None] * 8
        # parsed metadata OBUs by metadata_type (HDR CLL/MDCV/T.35)
        self.metadata: dict = {}
        # most recent frame's parsed leaf decisions (test introspection)
        self.last_decisions: dict = None

    @property
    def ref(self):
        """Slot 0 (legacy single-ref accessor)."""
        return self.slots[0]

    def decode_temporal_unit(self, data: bytes) -> List[Dict[str, np.ndarray]]:
        """Returns the *displayed* frames of this TU (shown frames and
        show_existing_frame outputs; hidden frames decode silently)."""
        frames = []
        for obu_type, payload in obu.parse_obus(data):
            if obu_type == obu.OBU_TEMPORAL_DELIMITER:
                continue
            if obu_type == obu.OBU_SEQUENCE_HEADER:
                self.sp = obu.read_sequence_header(payload)
            elif obu_type == obu.OBU_FRAME:
                assert self.sp is not None, "no sequence header seen"
                recon, shown = self._decode_frame(payload)
                if shown:
                    frames.append(recon)
            elif obu_type == obu.OBU_FRAME_HEADER:
                idx = obu.parse_show_existing(payload)
                assert idx is not None, \
                    "frame-header OBU only used for show_existing here"
                assert self.slots[idx] is not None, "empty DPB slot shown"
                frames.append(dict(self.slots[idx]))
            elif obu_type == obu.OBU_METADATA:
                mtype, fields = obu.parse_metadata(payload)
                self.metadata[mtype] = fields
            elif obu_type == obu.OBU_PADDING:
                continue
            else:
                raise NotImplementedError(f"obu type {obu_type}")
        return frames

    def _decode_frame(self, payload: bytes):
        from svt_av1_tpu.utils.bitio import BitReader
        r = BitReader(payload)
        fp = obu.read_frame_header(r, self.sp,
                                   ref_hints_by_slot=self.slot_hints)
        r.byte_align()
        tile_data = payload[r.byte_pos:]
        is_intra = fp.frame_type in (obu.KEY_FRAME, obu.INTRA_ONLY_FRAME)
        coded_w = fp.coded_width(self.sp.width)
        n_tiles = len(obu.tile_cols_layout(coded_w, fp.log2_tile_cols)) \
            * (1 << fp.log2_tile_rows)
        if n_tiles > 1:
            return self._decode_frame_tiled(fp, tile_data, coded_w,
                                            n_tiles)
        chain = (not is_intra
                 and fp.primary_ref_frame != obu.PRIMARY_REF_NONE)
        init_cdfs = init_nmv = None
        if chain:
            pslot = fp.ref_frame_idx[fp.primary_ref_frame]
            init_cdfs = self.slot_cdfs[pslot]
            init_nmv = self.slot_nmv[pslot]
        tdec = TileDecoder(coded_w, self.sp.height, fp.base_q_idx,
                           reduced_tx_set=fp.reduced_tx_set,
                           update_cdfs=not fp.disable_cdf_update,
                           frame_is_intra=is_intra,
                           init_cdfs=init_cdfs,
                           init_nmv=init_nmv)
        if not is_intra:
            tdec.set_gm(fp.gm_trans)
            if fp.allow_high_precision_mv:
                from svt_av1_tpu.codec import mv as mv_mod
                tdec.mv_precision = mv_mod.MV_SUBPEL_HIGH
        tdec.enable_filter_intra = self.sp.enable_filter_intra
        tdec.allow_palette = bool(fp.allow_screen_content_tools)
        tdec.bit_depth = self.sp.bit_depth
        tdec.enable_masked_compound = self.sp.enable_masked_compound
        tdec.enable_interintra = self.sp.enable_interintra_compound
        tdec.is_motion_mode_switchable = fp.is_motion_mode_switchable
        tdec.reference_select = fp.reference_select
        if fp.skip_mode_present:
            tdec.skip_mode_present = True
            tdec.skip_mode_frames = obu.skip_mode_refs(
                fp.order_hint, fp.ref_hints, self.sp.order_hint_bits)
            tdec.interp_filter = fp.interpolation_filter
        if not is_intra:
            from svt_av1_tpu.codec import mv_pred
            hint_map = {e: fp.ref_hints[e - 1] for e in range(1, 8)}
            tdec.cur_hint = fp.order_hint
            tdec.ref_hints = hint_map
            tdec.order_hint_bits = self.sp.order_hint_bits
            if fp.use_ref_frame_mvs:
                slot_fields = {e: self.slot_mvfield[fp.ref_frame_idx[e - 1]]
                               for e in range(1, 8)}
                tdec.tmvp = mv_pred.setup_motion_field(
                    slot_fields, hint_map, fp.order_hint,
                    self.sp.order_hint_bits, tdec.mi_rows, tdec.mi_cols,
                    fp.allow_high_precision_mv)
        if fp.segmentation is not None:
            tdec.set_segmentation(fp.segmentation)
        if fp.cdef_bits:
            tdec.set_cdef(fp.cdef_bits)
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
        if is_intra:
            recon = reconstruct_from_decisions(decisions, coded_w,
                                               self.sp.height,
                                               fp.base_q_idx,
                                               bd=self.sp.bit_depth)
        else:
            from svt_av1_tpu.pipeline.inter_encoder import (
                reconstruct_inter_from_decisions)
            assert coded_w == self.sp.width, \
                "superres + inter needs scaled-reference MC (next round)"
            refs = {}
            for enum in range(1, 8):
                slot = fp.ref_frame_idx[enum - 1]
                if self.slots[slot] is not None:
                    refs[enum] = self.slots[slot]
            assert refs, "inter frame with empty DPB"
            gm_models = {i + 1: m for i, m in enumerate(fp.gm_trans)
                         if m is not None}
            recon = reconstruct_inter_from_decisions(
                decisions, refs, coded_w, self.sp.height,
                fp.base_q_idx, bd=self.sp.bit_depth, gm=gm_models,
                interp=fp.interpolation_filter)
        from svt_av1_tpu.codec import constants as _cc
        mixed = any(d.bsize != _cc.BLOCK_16X16
                    for d in decisions.values())
        if mixed:
            from svt_av1_tpu.pipeline import dlf_stage
            flens = dlf_stage.flens_from_maps(
                dlf_stage.maps_from_decisions(
                    decisions, self.sp.height // 4, coded_w // 4))
            recon = dlf_stage.apply_masked(recon, fp, flens,
                                           bd=self.sp.bit_depth)
        else:
            recon = apply_loop_filter(recon, fp)
        deblocked = recon
        if self.sp.enable_cdef:
            from svt_av1_tpu.api.encoder import _skip_map, _skip_map8
            from svt_av1_tpu.pipeline import cdef_stage
            skip16 = _skip_map(decisions, self.sp.height // 16,
                               coded_w // 16)
            skip8 = _skip_map8(decisions, self.sp.height // 8,
                               coded_w // 8)
            if fp.cdef_bits:
                recon = cdef_stage.cdef_apply(
                    recon, skip16, fp.cdef_strength_list,
                    fp.cdef_damping, bd=self.sp.bit_depth,
                    sb_idx=tdec.cdef_idx, skip8=skip8)
            else:
                recon = cdef_stage.cdef_apply(recon, skip16,
                                              fp.cdef_strengths,
                                              fp.cdef_damping,
                                              bd=self.sp.bit_depth,
                                              skip8=skip8)
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
        refresh = fp.refresh_frame_flags
        if fp.frame_type == obu.KEY_FRAME and fp.show_frame:
            refresh = 0xFF
        end_cdfs = (tdec.cdfs
                    if not fp.disable_frame_end_update_cdf else init_cdfs)
        end_nmv = (tdec.nmv
                   if not fp.disable_frame_end_update_cdf else init_nmv)
        stored = {k: recon[k] for k in ("y", "u", "v")}
        from svt_av1_tpu.codec import mv_pred as _mvp
        if refresh:
            hint_map = {e: fp.ref_hints[e - 1] for e in range(1, 8)} \
                if not is_intra else {}
            side = _mvp.ref_frame_side(hint_map, fp.order_hint,
                                       self.sp.order_hint_bits) \
                if not is_intra else [0] * 8
            field = _mvp.save_motion_field(
                decisions, (self.sp.height + 3) >> 2,
                (coded_w + 3) >> 2, side,
                tuple(hint_map.get(e, 0) for e in range(1, 8)),
                fp.order_hint, is_intra)
        for i in range(8):
            if refresh & (1 << i):
                self.slots[i] = stored
                self.slot_cdfs[i] = end_cdfs
                self.slot_nmv[i] = end_nmv
                self.slot_hints[i] = fp.order_hint
                self.slot_mvfield[i] = field
        recon["decisions"] = decisions
        self.last_decisions = decisions
        return recon, fp.show_frame

    def _decode_frame_tiled(self, fp, tile_data: bytes, coded_w: int,
                            n_tiles: int):
        """Multi-tile (column) intra frame: split the tile group, decode
        each tile with its own contexts/CDFs, merge, reconstruct with
        tile-clamped intra availability."""
        assert fp.frame_type == obu.KEY_FRAME, \
            "tiles wired for intra frames this round"
        assert fp.log2_tile_rows == 0
        assert fp.cdef_bits == 0, \
            "per-SB CDEF + multi-tile: single-tile only this round"
        # tile group: start/end flag bit (0) + byte alignment
        assert (tile_data[0] & 0x80) == 0
        pos = 1
        tiles = []
        for i in range(n_tiles - 1):
            sz = int.from_bytes(tile_data[pos:pos + 4], "little") + 1
            pos += 4
            tiles.append(tile_data[pos:pos + sz])
            pos += sz
        tiles.append(tile_data[pos:])
        layout = obu.tile_cols_layout(coded_w, fp.log2_tile_cols)
        decisions = {}
        for (s, e), data in zip(layout, tiles):
            tw = min(e * 64, coded_w) - s * 64
            tdec = TileDecoder(tw, self.sp.height, fp.base_q_idx,
                               reduced_tx_set=fp.reduced_tx_set,
                               update_cdfs=not fp.disable_cdf_update,
                               frame_is_intra=True)
            tdec.enable_filter_intra = self.sp.enable_filter_intra
            tdec.allow_palette = bool(fp.allow_screen_content_tools)
            tdec.bit_depth = self.sp.bit_depth
            if (s, e) == layout[0]:   # context_update_tile_id = 0
                t0 = tdec
            for (r4, c4), d in tdec.decode(data).items():
                import dataclasses as _dc
                d = _dc.replace(d, c4=c4 + s * 16)
                decisions[(r4, d.c4)] = d
        if not fp.disable_frame_end_update_cdf:
            end_cdfs, end_nmv = t0.cdfs, t0.nmv
        else:
            end_cdfs = end_nmv = None
        tile_starts16 = tuple(s * 4 for s, _ in layout)
        recon = reconstruct_from_decisions(
            decisions, coded_w, self.sp.height, fp.base_q_idx,
            bd=self.sp.bit_depth, tile_starts=tile_starts16)
        recon = apply_loop_filter(recon, fp)
        if self.sp.enable_cdef:
            from svt_av1_tpu.api.encoder import _skip_map
            from svt_av1_tpu.pipeline import cdef_stage
            skip16 = _skip_map(decisions, self.sp.height // 16,
                               coded_w // 16)
            recon = cdef_stage.cdef_apply(recon, skip16,
                                          fp.cdef_strengths,
                                          fp.cdef_damping,
                                          bd=self.sp.bit_depth)
        stored = {k: recon[k] for k in ("y", "u", "v")}
        for i in range(8):
            self.slots[i] = stored
            self.slot_mvfield[i] = None
            self.slot_cdfs[i] = end_cdfs
            self.slot_nmv[i] = end_nmv
        recon["decisions"] = decisions
        self.last_decisions = decisions
        return recon, fp.show_frame
