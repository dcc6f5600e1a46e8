"""Encoder handle + public API, mirroring EbSvtAv1Enc.h semantics:

  Encoder(config)          ~ svt_av1_enc_init_handle + set_parameter + init
  enc.send_picture(frame)  ~ svt_av1_enc_send_picture
  enc.get_packet()         ~ svt_av1_enc_get_packet
  enc.get_recon()          ~ svt_av1_get_recon
  enc.stream_header()      ~ svt_av1_enc_stream_header

Supports all-intra and IPPP GOP structures (intra_period_length),
MCTF lookahead, scene-cut keyframes, 2-pass VBR, the full in-loop
filter chain (DLF/CDEF/superres/LR), and a single-slot DPB with CDF
forward chaining."""
from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, Dict, Optional

import numpy as np

from svt_av1_tpu.api.config import ConfigError, EncoderConfig
from svt_av1_tpu.codec import obu
from svt_av1_tpu.codec.syntax import TileEncoder
from svt_av1_tpu.pipeline import inter_encoder, intra_encoder
from svt_av1_tpu.pipeline.rate_control import RateControlState


# mapping from CRF/QP (0..63) to AV1 qindex (0..255): qindex = qp * 4
def qp_to_qindex(qp: int) -> int:
    return min(255, max(1, qp * 4))


def default_filter_level(qindex: int) -> int:
    """Simple qindex->deblock level heuristic (the reference searches
    levels per frame, dlf_process.c; search lands with the DLF stage)."""
    return int(np.clip((qindex * 3) // 32, 0, 63)) >> 1


@dataclasses.dataclass
class Packet:
    data: bytes
    pts: int               # display order of the content (poc)
    frame_type: int
    recon: Optional[Dict[str, np.ndarray]] = None
    stats: Optional[dict] = None   # --enable-stat-report analog
    displayed: bool = True  # False for hidden (show_frame=0) frames


def _align16(x: int) -> int:
    return (x + 15) & ~15


def _superres_upscale_frame(recon, out_w: int, bd: int = 8):
    """Normative horizontal superres upscale of all three planes."""
    from svt_av1_tpu.ops.resize import superres_upscale
    dt = recon["y"].dtype
    out = dict(recon)
    out["y"] = np.asarray(superres_upscale(
        recon["y"].astype(np.int32)[None], out_w, bd))[0].astype(dt)
    for p_ in ("u", "v"):
        out[p_] = np.asarray(superres_upscale(
            recon[p_].astype(np.int32)[None], out_w >> 1, bd))[0].astype(dt)
    return out


def _variance_qmap(y: np.ndarray, base_q: int) -> np.ndarray:
    """Per-64x64 qindex from luma variance (the variance-boost AQ
    analog, Docs/Appendix-Variance-Boost.md): smooth superblocks get a
    lower qindex (banding protection), busy ones a higher one.  Deltas
    are multiples of 1 << delta_q_res (= 4)."""
    h, w = y.shape
    sh, sw = (h + 63) // 64, (w + 63) // 64
    qmap = np.zeros((sh, sw), np.int32)
    yp = np.pad(y.astype(np.float64), ((0, sh * 64 - h), (0, sw * 64 - w)),
                mode="edge")
    blocks = yp.reshape(sh, 64, sw, 64).transpose(0, 2, 1, 3)
    var = blocks.var(axis=(2, 3)) + 1.0
    med = max(float(np.median(var)), 1.0)
    delta = np.clip(np.round(np.log2(var / med) * 2.0), -3, 3) * 4
    # positive deltas must keep base_q+delta congruent mod
    # (1 << delta_q_res) below 255, or the decoder's clamped
    # CurrentQIndex diverges from the qindex we quantized with
    res_mask = (1 << 2) - 1  # delta_q_res = 2
    delta_hi = (255 - base_q) & ~res_mask
    delta = np.clip(delta.astype(np.int32), None, delta_hi)
    return np.clip(base_q + delta, 1, 255)


def _segment_qmap(y: np.ndarray, base_q: int):
    """Segment-based AQ: variance deltas -> SEG_LVL_ALT_Q segments.

    Returns ((SegmentationParams, per-SB segment-id map), per-SB qindex
    map for the MD quantizer)."""
    from svt_av1_tpu.codec import segmentation as seg_mod
    h, w = y.shape
    sh, sw = (h + 63) // 64, (w + 63) // 64
    yp = np.pad(y.astype(np.float64),
                ((0, sh * 64 - h), (0, sw * 64 - w)), mode="edge")
    blocks = yp.reshape(sh, 64, sw, 64).transpose(0, 2, 1, 3)
    var = blocks.var(axis=(2, 3)) + 1.0
    med = max(float(np.median(var)), 1.0)
    delta = (np.clip(np.round(np.log2(var / med) * 2.0), -3, 3) * 4
             ).astype(np.int32)
    deltas = sorted(set(delta.reshape(-1).tolist()))[:8]
    seg_of = {d: i for i, d in enumerate(deltas)}
    seg_map = np.vectorize(
        lambda d: seg_of.get(d, len(deltas) - 1))(delta).astype(np.int32)
    params = seg_mod.alt_q_params(deltas)
    qmap = np.clip(base_q + np.array(deltas, np.int32)[seg_map], 1, 255)
    return (params, seg_map), qmap


def _skip_map(decisions, gh: int, gw: int) -> np.ndarray:
    """(gh, gw) bool: skip flag per 16x16 cell, filled from each leaf
    decision's true block size (varpart emits 32x32 leaves)."""
    m = np.zeros((gh, gw), bool)
    from svt_av1_tpu.codec import constants as cc
    for d in decisions.values():
        by, bx = d.r4 // 4, d.c4 // 4
        nw = max(1, int(cc.block_size_wide[d.bsize]) >> 4)
        nh = max(1, int(cc.block_size_high[d.bsize]) >> 4)
        m[by:by + nh, bx:bx + nw] = d.skip
    return m


def _skip_map8(decisions, gh8: int, gw8: int) -> np.ndarray:
    """(gh8, gw8) bool: skip flag per 8x8 CDEF unit from each leaf's
    true extent — the spec granularity (an 8x8 unit is skipped iff all
    its mi are skip), needed once 8x8 partition leaves exist."""
    m = np.zeros((gh8, gw8), bool)
    from svt_av1_tpu.codec import constants as cc
    for d in decisions.values():
        nw = max(1, int(cc.block_size_wide[d.bsize]) >> 3)
        nh = max(1, int(cc.block_size_high[d.bsize]) >> 3)
        by, bx = d.r4 // 2, d.c4 // 2
        m[by:by + nh, bx:bx + nw] = d.skip
    return m


class Encoder:
    def __init__(self, config: EncoderConfig):
        from svt_av1_tpu.utils.cache import ensure_compile_cache
        ensure_compile_cache()   # env-configured persistent XLA cache
        self.cfg = config.validate()
        # round 1 codes full 16x16 blocks: pad the coded size up and
        # signal the true size as the render size (edge-partition blocks
        # land with the variable-partition MD)
        self.render_w = config.source_width
        self.render_h = config.source_height
        self.coded_w = _align16(config.source_width)
        self.coded_h = _align16(config.source_height)
        # super-resolution (round 1: fixed half-width, all-intra, and
        # only when the downscaled width keeps the 16-px grid)
        self.sr_denom = 8
        if (config.superres_mode > 0
                and config.intra_period_length in (-2, 0)
                and self.coded_w % 32 == 0):
            self.sr_denom = 16
        self.sr_w = (self.coded_w * 8 + self.sr_denom // 2) \
            // self.sr_denom
        self.sp = obu.SequenceParams(
            width=self.coded_w, height=self.coded_h,
            bit_depth=config.encoder_bit_depth,
            still_picture=config.avif,
            reduced_still_picture_header=config.avif,
            enable_cdef=config.cdef_level > 0,
            enable_superres=self.sr_denom != 8,
            enable_restoration=config.enable_restoration_filtering > 0,
            film_grain_params_present=(
                config.film_grain_denoise_strength > 0))
        self._packets: Deque[Packet] = deque()
        self._pts = 0
        self._eos_sent = False
        self._la: Deque = deque()      # lookahead source frames
        self._tf_hist = []             # last raw frame (TF backward ref)
        self._prev_hist = None         # luma histogram (scene-cut det)
        self._ahd_running = None       # per-region AHD running average
        self._scene_cut = False
        # 2-pass: collect stats in pass 1; apply the plan in pass 2
        self._fp_stats = [] if config.pass_ == 1 else None
        self._q_plan = None
        # decoded-picture buffer (slot 0): last refreshed recon at the
        # coded size, post loop filter — what the decoder predicts from
        self._ref: Optional[Dict[str, np.ndarray]] = None
        # end-of-frame CDF state saved with the ref (primary_ref_frame)
        self._ref_cdfs = None
        self._ref_nmv = None
        fps = (config.frame_rate_numerator
               / max(config.frame_rate_denominator, 1))
        self._rc = RateControlState.create(config, fps)
        from svt_av1_tpu.pipeline.presets import features_for
        self._feat = features_for(config.enc_mode)
        self.sp.enable_screen_content = bool(
            self._feat.palette and config.encoder_bit_depth == 8)
        # filter-intra: sequence flag + MD pseudo-mode candidates
        self.sp.enable_filter_intra = self._feat.filter_intra
        self.sp.enable_interintra_compound = self._feat.interintra
        from svt_av1_tpu.codec import constants as cc
        self._md_modes = self._feat.intra_modes
        if self._feat.filter_intra:
            self._md_modes = self._feat.intra_modes + tuple(
                cc.FI_MODE_BASE + k
                for k in range(cc.FILTER_INTRA_MODES))
        # film grain params: estimated from the first key-frame source
        # (noise_model.py), cached; falls back to the strength preset
        self._grain_params = None
        self._grain_estimated = False
        self._seq_hdr_sent = False
        # tile columns (log2, SVT tile_columns semantics); block-column
        # starts derive from the spec's uniform SB spacing.  Wired for
        # the all-intra fast path; other paths stay single-tile.
        self._log2_tile_cols = max(0, min(int(config.tile_columns), 4))
        from svt_av1_tpu.codec.obu import tile_cols_layout
        self._tile_starts = tuple(
            s * 4 for s, _ in tile_cols_layout(self.sr_w,
                                               self._log2_tile_cols))
        if len(self._tile_starts) == 1:
            self._log2_tile_cols = 0
        # hierarchical (random access) prediction structure: explicit
        # hierarchical_levels with a GOP that has inter frames
        self._hier = 0
        self._arf_q = None   # base-layer ratio qindex (crf_qindex_calc)
        self._chain_cdfs = None  # newest adapted FrameCDFs (rate refresh)
        if (config.hierarchical_levels > 0
                and config.intra_period_length not in (-2, 0)
                and config.pred_structure == 2):
            self._hier = min(5, config.hierarchical_levels)
            self._h_frames: Dict[int, tuple] = {}  # poc -> (y, u, v)
            self._h_next_in = 0       # next arriving poc
            self._h_sched = 0         # first unscheduled poc
            self._h_anchor = None     # display poc of last coded anchor
            self._h_anchor_src = None  # anchor's padded source luma (TPL)
            self._h_cuts = set()      # scene-cut pocs
            self._h_activity = {}     # poc -> mean AHD (dynamic GoP)
            self._dpb: Dict[int, int] = {}       # stored poc -> slot
            self._slot_free = set(range(8))
            self._slot_recon: Dict[int, Dict] = {}
            self._slot_state: Dict[int, tuple] = {}
            # per-slot saved motion fields (spec 7.20 / 7.9 tmvp)
            self._slot_mvfield: Dict[int, object] = {}
            # order hints: random-access GOPs signal display order so
            # skip-mode (spec 5.9.22) can pick the fwd/bwd ref pair
            self.sp.enable_order_hint = True
            self.sp.enable_ref_frame_mvs = bool(self._feat.tmvp)
            self._slot_hint = [0] * 8            # per-slot order hints
        # fused fast GOP path (pipeline/gop_fast.py): inter frames run
        # as 2 device programs + 1 bundled pull; DPB recon stays on
        # device.  8-bit single-tile scope; other configs use the
        # round-2 stage path.
        self._fast = (self._hier > 0
                      and config.encoder_bit_depth == 8
                      and self.sr_denom == 8
                      and config.film_grain_denoise_strength == 0
                      and self._log2_tile_cols == 0
                      and not config.avif
                      and config.sframe_dist <= 0)
        # pulling recon off the device costs a ~30 ms round trip per
        # frame on a tunneled TPU: callers that don't consume
        # Packet.recon (the bench) can turn it off
        self.recon_enabled = True
        if config.pass_ == 2 and config.rc_stats_buffer:
            from svt_av1_tpu.pipeline import rate_control as rc_mod
            stats = rc_mod.unpack_first_pass_stats(config.rc_stats_buffer)
            self._q_plan = rc_mod.plan_second_pass(
                stats, config.target_bit_rate, fps,
                min_q=max(4, config.min_qp_allowed * 4),
                max_q=min(255, config.max_qp_allowed * 4))
            self._rc.two_pass_q = self._q_plan

    # -- API surface ---------------------------------------------------------
    def stream_header(self) -> bytes:
        return obu.write_sequence_header(self.sp)

    def send_picture(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                     eos: bool = False):
        """Feed one frame (planar numpy).  Without MCTF the encode is
        synchronous; with enable_tf the encoder holds a small lookahead
        so key frames can be temporally filtered against future frames
        (the reference's picture-decision delay)."""
        if self.cfg.avif and (self._pts + len(self._la)) >= 1:
            # reference parity: enc_handle.c:5367-5373 rejects a second
            # picture in AVIF (single-picture) mode
            raise ValueError(
                "AVIF mode supports exactly one input picture")
        y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
        # plane-geometry validation (the reference contains wrong-size
        # input by copying what fits and zero-filling the remainder,
        # enc_handle.c:5434-5446; a library API is better served by a
        # clear error than silent padding)
        eh, ew = self.cfg.source_height, self.cfg.source_width
        ch, cw = (eh + 1) // 2, (ew + 1) // 2
        if y.shape != (eh, ew) or u.shape != (ch, cw) \
                or v.shape != (ch, cw):
            raise ValueError(
                f"picture plane shapes {y.shape}/{u.shape}/{v.shape} "
                f"do not match the configured {ew}x{eh} 4:2:0 geometry "
                f"(expected {(eh, ew)}/{(ch, cw)}/{(ch, cw)})")
        want = np.uint16 if self.cfg.encoder_bit_depth > 8 else np.uint8
        if y.dtype != want or u.dtype != want or v.dtype != want:
            raise ValueError(
                f"picture dtype {y.dtype}/{u.dtype}/{v.dtype} does not "
                f"match encoder_bit_depth={self.cfg.encoder_bit_depth} "
                f"(expected {np.dtype(want).name})")
        if self._hier:
            self._detect_scene_cut(y)
            if self._scene_cut:
                self._h_cuts.add(self._h_next_in)
            self._h_activity[self._h_next_in] = self._last_ahd
            self._h_frames[self._h_next_in] = (
                np.asarray(y), np.asarray(u), np.asarray(v))
            self._h_next_in += 1
            self._drain_hier(flush=eos)
            if eos:
                self._eos_sent = True
            return
        self._la.append((np.asarray(y), np.asarray(u), np.asarray(v)))
        self._drain(flush=eos)
        if eos:
            self._eos_sent = True

    def flush(self):
        """Signal EOS without a new picture — the reference's
        ``svt_av1_enc_send_picture`` with ``p_buffer == NULL`` and the
        EOS flag set (the pattern ffmpeg's libsvtav1 wrapper uses)."""
        if self._hier:
            self._drain_hier(flush=True)
        else:
            self._drain(flush=True)
        self._eos_sent = True

    def _tf_active(self) -> bool:
        return (self.cfg.enable_tf > 0
                and self.cfg.intra_period_length not in (-2, 0))

    def _drain(self, flush: bool):
        if self._hier:
            self._drain_hier(flush)
            return
        while self._la:
            if (self._tf_active() and self._frame_is_key(self._pts)
                    and len(self._la) < 3 and not flush):
                return  # wait for lookahead
            y, u, v = self._la.popleft()
            if self.cfg.intra_period_length not in (-2, 0):
                self._detect_scene_cut(y)
            if self._tf_active() and self._frame_is_key(self._pts):
                from svt_av1_tpu.pipeline import tf_stage
                neighbors = list(self._tf_hist) + list(self._la)[:2]
                if neighbors:
                    y, u, v = tf_stage.mctf_filter_frame(
                        (y, u, v), neighbors)
            self._tf_hist = [(y, u, v)]
            self._packets.append(self._encode_frame(y, u, v, self._pts))
            self._pts += 1

    # -- hierarchical (random access) GOP ------------------------------------
    def _is_key_poc(self, poc: int) -> bool:
        period = self.cfg.intra_period_length
        if poc == 0 or poc in self._h_cuts:
            return True
        if period == -1:
            return False
        return poc % (period + 1) == 0

    def _drain_hier(self, flush: bool):
        """Schedule complete mini-GoPs from the lookahead (the picture-
        decision mini-GoP assembly analog, pd_process.c:639-860)."""
        from svt_av1_tpu.pipeline import gop
        N = 1 << self._hier
        while True:
            p0 = self._h_sched
            if p0 not in self._h_frames:
                return
            if self._h_anchor is None or self._is_key_poc(p0):
                if self.cfg.enable_tpl_la and not flush:
                    # hold the key until its TPL lookahead is in
                    la = 0
                    while (p0 + 1 + la in self._h_frames
                           and not self._is_key_poc(p0 + 1 + la)):
                        la += 1
                    if la < N:
                        return
                self._encode_key_job(p0)
                self._h_sched = p0 + 1
                continue
            avail = 0
            while p0 + avail in self._h_frames:
                avail += 1
            # dynamic mini-GoP sizing (pd_process.c:639-860 role):
            # high-activity windows (histogram AHD above half the
            # scene threshold) halve the pyramid so deep B layers do
            # not span unstable content
            N_eff = N
            if N >= 4:
                win = [self._h_activity.get(p0 + i, 0.0)
                       for i in range(min(N, max(avail, 1)))]
                if win and max(win) > 0.5 * self._SCENE_TH:
                    N_eff = N // 2
            n = 0
            while n < min(N_eff, avail):
                if self._is_key_poc(p0 + n):
                    break
                n += 1
            if (n < N_eff and n == avail and not flush
                    and not self._is_key_poc(p0 + n)):
                return  # mini-GoP may still grow
            self._encode_minigop(p0, n)
            self._h_sched = p0 + n

    def _encode_key_job(self, poc: int):
        from svt_av1_tpu.utils.profiling import stage
        y, u, v = self._h_frames.pop(poc)
        if self._tf_active():
            from svt_av1_tpu.pipeline import tf_stage
            neighbors = [self._h_frames[p] for p in (poc + 1, poc + 2)
                         if p in self._h_frames]
            if neighbors:
                with stage("key_tf"):
                    y, u, v = tf_stage.mctf_filter_frame((y, u, v),
                                                         neighbors)
        y, u, v = self._pad(y, u, v)
        qindex = self._base_q_for(poc)
        qmap = None
        if self.cfg.enable_tpl_la:
            # TPL over the key + lookahead IPP chain: how much does the
            # future lean on this key frame (and on which of its SBs)?
            from svt_av1_tpu.pipeline import tpl
            chain = [y]
            for p in range(poc + 1, poc + 1 + (1 << self._hier)):
                if p not in self._h_frames or self._is_key_poc(p):
                    break
                chain.append(self._pad(*self._h_frames[p])[0])
            deps = [None] + [[i - 1] for i in range(1, len(chain))]
            if self._fast:
                from svt_av1_tpu.pipeline import gop_fast
                with stage("key_tpl"):
                    stats = gop_fast.tpl_group_stats(chain, deps)
            else:
                stats = [tpl.tpl_frame_stats(chain[0], None)]
                for i in range(1, len(chain)):
                    stats.append(tpl.tpl_frame_stats(chain[i],
                                                     chain[i - 1]))
            dep0 = tpl.synthesize(stats, deps)[0]
            from svt_av1_tpu.pipeline import rate_control as rc_mod
            qindex, self._arf_q = rc_mod.crf_qindex_calc(
                qindex, tpl.r0_of(stats[0], dep0), 0, self._hier,
                True, bd=self.cfg.encoder_bit_depth)
            qmap = tpl.beta_qmap(stats[0], dep0, qindex,
                                 bd=self.cfg.encoder_bit_depth)
            if np.all(qmap == qindex):
                qmap = None
        else:
            qindex = max(1, qindex - qindex // self._feat.kf_boost_div)
        pal_cands = None
        if (self.sp.enable_screen_content and qmap is None
                and not self._feat.varpart):
            pal_cands = intra_encoder.palette_md_candidates(
                y, qindex, bd=self.cfg.encoder_bit_depth)
        self._frame_allow_sct = pal_cands is not None
        with stage("key_intra_md"):
            decisions, recon = intra_encoder.encode_intra_frame(
                y, u, v, qindex, modes=self._md_modes,
                bd=self.cfg.encoder_bit_depth, qmap=qmap,
                rdoq=self._feat.rdoq, tx_search=self._feat.tx_search,
                angle_deltas=self._feat.angle_deltas,
                cfl=self._feat.cfl,
                exact_rates=(self._feat.exact_rates
                             and self._feat.exact_rates_intra),
                palette_cands=pal_cands)
        prefilt = None
        dlf_wants = bool(self.cfg.enable_dlf_flag)
        if (self._fast and (dlf_wants or self.sp.enable_cdef)
                and (not dlf_wants or self._feat.dlf_search)):
            from svt_av1_tpu.pipeline import gop_fast
            from svt_av1_tpu.pipeline.cdef_stage import SEARCH_SET
            skip16 = _skip_map(decisions, self.coded_h // 16,
                               self.sr_w // 16)
            _key_filters_stage = stage("key_filters")
            _key_filters_stage.__enter__()
            prefilt = gop_fast.run_key_filters(
                dict(y=y, u=u, v=v), recon, skip16, qindex,
                bd=self.cfg.encoder_bit_depth,
                cdef_cands=SEARCH_SET[:self._feat.cdef_candidates],
                dlf_on=dlf_wants, cdef_on=self.sp.enable_cdef,
                max_bits=3 if self._feat.cdef_sb else 0)
            _key_filters_stage.__exit__(None, None, None)
        with stage("key_packetize"):
            pkt, full, tenc = self._packetize(
                decisions, recon, qindex, poc, is_key=True,
                src=dict(y=y, u=u, v=v), chain=None, return_state=True,
                delta_q=qmap is not None, prefilt=prefilt)
        self._h_anchor_src = y
        # key refresh (0xFF): our map keeps the key in slot 0 only
        self._dpb = {poc: 0}
        self._slot_free = set(range(1, 8))
        self._slot_recon = {0: full}
        self._slot_state = {0: (tenc.cdfs, tenc.nmv)}
        self._slot_mvfield = {}
        self._chain_cdfs = tenc.cdfs
        self._slot_hint = [poc & ((1 << self.sp.order_hint_bits) - 1)] * 8
        self._h_anchor = poc
        self._h_prev_anchor = None
        self._finish_packet(pkt, qindex)

    def _base_q_for(self, poc: int) -> int:
        if self._q_plan is not None and poc < len(self._q_plan):
            return int(self._q_plan[poc])
        if self._rc.onepass is not None:
            return self._rc.pick_q(self._is_key_poc(poc) if self._hier
                                   else False, 0, poc)
        return self._rc.frame_qindex()

    def _finish_packet(self, pkt: Packet, qindex: int, layer: int = 0):
        self._packets.append(pkt)
        # every coded frame takes the per-frame bandwidth credit in the
        # buffer model; no-show bases are displayed later through
        # show_existing packets (a few bytes, not routed through RC)
        self._rc.feedback(len(pkt.data) * 8, qindex,
                          pkt.frame_type == obu.KEY_FRAME, layer)
        if self._fp_stats is not None:
            self._fp_stats.append(
                (len(pkt.data) * 8, qindex,
                 float(pkt.frame_type == obu.KEY_FRAME)))

    def _encode_minigop(self, p0: int, n: int):
        from svt_av1_tpu.pipeline import gop
        anchor = self._h_anchor
        assert anchor == p0 - 1
        events = gop.minigop_schedule(anchor, n)
        end_poc = anchor + n
        if self._tf_active() and n >= 2:
            # MCTF the mini-GoP base (alt-ref role): the reference's
            # main temporal-filter customer (pd_process.c:3345-3385,
            # temporal_filtering.c:4106) — every other frame in the
            # pyramid predicts from it, so denoising it pays across
            # the whole mini-GoP.  Neighbors: the adjacent sources on
            # both sides that are still in the lookahead window.
            from svt_av1_tpu.pipeline import tf_stage
            neigh = [self._h_frames[p]
                     for p in (end_poc - 1, end_poc + 1, end_poc - 2,
                               end_poc + 2)
                     if p in self._h_frames and not self._is_key_poc(p)]
            if neigh:
                from svt_av1_tpu.utils.profiling import stage
                with stage("gop_tf"):
                    self._h_frames[end_poc] = \
                        tf_stage.mctf_filter_frame(
                            self._h_frames[end_poc], neigh[:3])
        mref = bool(self._feat.mref and self._fast)
        if mref:
            # the base frame's GOLDEN-role ref: the previous mini-GoP's
            # anchor, kept alive one extra mini-GoP (see keep_poc below)
            prev_anchor = getattr(self, "_h_prev_anchor", None)
            if (prev_anchor is not None and prev_anchor in self._dpb
                    and events and isinstance(events[0], gop.CodeEvent)):
                events[0].gld_poc = prev_anchor
        last_use: Dict[int, int] = {}
        for i, ev in enumerate(events):
            if isinstance(ev, gop.CodeEvent):
                last_use[ev.last_poc] = i
                if ev.bwd_poc is not None:
                    last_use[ev.bwd_poc] = i
                if mref and ev.gld_poc is not None:
                    last_use[ev.gld_poc] = max(
                        i, last_use.get(ev.gld_poc, 0))
            else:
                last_use[ev.poc] = i
        # keep the current anchor stored past this mini-GoP so the NEXT
        # base can search it as GOLDEN (freed there once its use passes)
        keep_poc = anchor if mref else None
        base_q = self._base_q_for(p0)
        tpl_r0 = None
        if self.cfg.enable_tpl_la:
            # TPL over anchor + mini-GoP along BOTH pyramid edges
            # (LAST + ALTREF), in decode order so reverse processing
            # sees every child before its reference; extended with an
            # IPP lookahead tail so the next anchor earns its credit
            # (the lad_mg window, initial_rc_process.c:421-432)
            from svt_av1_tpu.pipeline import tpl
            src_of = {anchor: self._h_anchor_src}
            for p in range(p0, p0 + n):
                src_of[p] = self._pad(*self._h_frames[p])[0]
            order = [anchor]
            deps: list = [None]
            idx_of = {anchor: 0}
            for ev in events:
                if not isinstance(ev, gop.CodeEvent):
                    continue
                idx_of[ev.poc] = len(order)
                order.append(ev.poc)
                d = [idx_of[ev.last_poc]]
                if ev.bwd_poc is not None:
                    d.append(idx_of[ev.bwd_poc])
                deps.append(d)
            end_poc = anchor + n
            tail = end_poc
            for p in range(end_poc + 1, end_poc + 1 + n):
                if p not in self._h_frames or self._is_key_poc(p):
                    break
                src_of[p] = self._pad(*self._h_frames[p])[0]
                idx_of[p] = len(order)
                order.append(p)
                deps.append([idx_of[tail]])
                tail = p
            from svt_av1_tpu.utils.profiling import stage
            if self._fast:
                # whole-group dispenser: ONE device program + pull
                from svt_av1_tpu.pipeline import gop_fast
                with stage("gop_tpl"):
                    stats = gop_fast.tpl_group_stats(
                        [src_of[p] for p in order], deps)
            else:
                stats = []
                for i, p in enumerate(order):
                    refs = (None if deps[i] is None
                            else [src_of[order[j]] for j in deps[i]])
                    stats.append(tpl.tpl_frame_stats(src_of[p], refs))
            with stage("gop_tpl_synth"):
                mc_dep = tpl.synthesize(stats, deps)
            tpl_r0 = {p: tpl.r0_of(stats[i], mc_dep[i])
                      for i, p in enumerate(order)}
            self._h_anchor_src = src_of[end_poc]
        def q_for(ev):
            if self._rc.onepass is not None and self._q_plan is None:
                # 1-pass VBR/CBR: per-frame regulate_q from the buffer
                # model (rc_process.c:1931), not the CRF qstep path
                return self._rc.pick_q(False, ev.layer, ev.poc)
            if tpl_r0 is not None:
                # reference CRF model (rc_process.c:781): base scales
                # its qstep by sqrt(r0)*0.9, mids interpolate from the
                # base's q toward cq, leaves code at cq
                from svt_av1_tpu.pipeline import rate_control as rc_mod
                q, arf = rc_mod.crf_qindex_calc(
                    base_q, tpl_r0[ev.poc], ev.layer, self._hier,
                    False, arf_q=self._arf_q,
                    ref_layer=max(0, ev.layer - 1),
                    is_leaf=ev.layer >= self._hier,
                    bd=self.cfg.encoder_bit_depth)
                if ev.layer == 0:
                    self._arf_q = arf
                return q
            return gop.layer_qindex(base_q, ev.layer, self._hier + 1)

        if self._fast:
            # pipelined: dispatch EVERY frame's device programs first
            # (recon chains stay on device as futures), then pull + EC
            # in decode order — host entropy coding overlaps the
            # device's work on later frames (the process-parallelism
            # analog of enc_handle.c:716-783 thread provisioning)
            records = []
            for i, ev in enumerate(events):
                if isinstance(ev, gop.CodeEvent):
                    records.append(self._dispatch_inter_fast(ev,
                                                             q_for(ev)))
                else:
                    slot = self._dpb[ev.poc]
                    records.append(("show", ev.poc, slot,
                                    self._slot_recon[slot]))
                for poc, li in list(last_use.items()):
                    if (li == i and poc != end_poc and poc != keep_poc
                            and poc in self._dpb):
                        slot = self._dpb.pop(poc)
                        self._slot_free.add(slot)
                        self._slot_recon.pop(slot, None)
            for rec in records:
                if rec[0] == "show":
                    self._emit_show_existing_fast(rec[1], rec[2], rec[3])
                else:
                    self._collect_inter_fast(rec)
            self._h_anchor = end_poc
            self._h_prev_anchor = anchor
            return
        for i, ev in enumerate(events):
            if isinstance(ev, gop.CodeEvent):
                if tpl_r0 is not None:
                    self._encode_inter_job(ev, q_for(ev), layered=False)
                else:
                    self._encode_inter_job(ev, base_q)
            else:
                self._emit_show_existing(ev.poc)
            for poc, li in list(last_use.items()):
                if li == i and poc != end_poc and poc in self._dpb:
                    slot = self._dpb.pop(poc)
                    self._slot_free.add(slot)
                    self._slot_recon.pop(slot, None)
                    self._slot_state.pop(slot, None)
        self._h_anchor = end_poc
        self._h_prev_anchor = anchor

    def _encode_inter_job(self, ev, base_q: int, layered: bool = True):
        from svt_av1_tpu.codec import mv_pred
        from svt_av1_tpu.pipeline import gop
        y, u, v = self._h_frames.pop(ev.poc)
        y, u, v = self._pad(y, u, v)
        qindex = (gop.layer_qindex(base_q, ev.layer, self._hier + 1)
                  if layered else base_q)
        last_slot = self._dpb[ev.last_poc]
        refs = {mv_pred.LAST_FRAME: self._slot_recon[last_slot]}
        bwd_slot = None
        if ev.bwd_poc is not None:
            bwd_slot = self._dpb[ev.bwd_poc]
            refs[mv_pred.ALTREF_FRAME] = self._slot_recon[bwd_slot]
        from svt_av1_tpu.utils.profiling import stage
        with stage("device_md_inter"):
            decisions, recon, gm, interp = \
                inter_encoder.encode_inter_frame(
                    y, u, v, refs, qindex, modes=self._feat.intra_modes,
                    bd=self.cfg.encoder_bit_depth,
                    hme_rad2=self._feat.hme_rad2,
                    hme_rad0=self._feat.hme_rad0,
                    subpel_ring=self._feat.subpel_ring,
                    exact_rates=self._feat.exact_rates)
        slot = min(self._slot_free) if ev.store else None
        if ev.store:
            self._slot_free.remove(slot)

        def fp_setup(fp):
            fp.show_frame = ev.shown
            fp.showable_frame = not ev.shown
            fp.refresh_frame_flags = (1 << slot) if ev.store else 0
            idx = [last_slot] * 7
            if bwd_slot is not None:
                # the backward ref maps ONLY to ALTREF so the spec
                # skip-mode derivation picks (LAST, ALTREF) — the pair
                # compound decisions actually signal
                idx[mv_pred.ALTREF_FRAME - 1] = bwd_slot
            fp.ref_frame_idx = tuple(idx)
            fp.primary_ref_frame = 0  # chain CDFs from LAST

        pkt, full, tenc = self._packetize(
            decisions, recon, qindex, ev.poc, is_key=False,
            src=dict(y=y, u=u, v=v),
            chain=self._slot_state[last_slot], fp_setup=fp_setup,
            return_state=True, gm=gm, interp=interp)
        if ev.store:
            self._dpb[ev.poc] = slot
            self._slot_recon[slot] = full
            self._slot_state[slot] = (tenc.cdfs, tenc.nmv)
            self._chain_cdfs = tenc.cdfs
            self._slot_hint[slot] = \
                ev.poc & ((1 << self.sp.order_hint_bits) - 1)
        pkt.displayed = ev.shown
        if not ev.shown:
            pkt.recon = None
        self._finish_packet(pkt, qindex, ev.layer)

    def _dispatch_inter_fast(self, ev, qindex: int):
        """Phase 1 of a fast inter frame: dispatch the two fused device
        programs (pipeline/gop_fast.py) and register the frame's device
        recon futures as its DPB slot — NO host pull happens here, so a
        whole mini-GoP of dispatches queues back-to-back."""
        from svt_av1_tpu.utils.profiling import stage
        with stage("dispatch_inter"):
            return self._dispatch_inter_fast_inner(ev, qindex)

    def _dispatch_inter_fast_inner(self, ev, qindex: int):
        from svt_av1_tpu.codec import mv_pred
        from svt_av1_tpu.pipeline import gop_fast
        from svt_av1_tpu.pipeline.cdef_stage import SEARCH_SET
        y, u, v = self._h_frames.pop(ev.poc)
        y, u, v = self._pad(y, u, v)
        last_slot = self._dpb[ev.last_poc]
        refs = {mv_pred.LAST_FRAME: self._slot_recon[last_slot]}
        bwd_slot = None
        if ev.bwd_poc is not None:
            bwd_slot = self._dpb[ev.bwd_poc]
            refs[mv_pred.ALTREF_FRAME] = self._slot_recon[bwd_slot]
        gld_slot = None
        if (self._feat.mref and ev.gld_poc is not None
                and ev.gld_poc in self._dpb):
            gld_slot = self._dpb[ev.gld_poc]
            refs[mv_pred.GOLDEN_FRAME] = self._slot_recon[gld_slot]
        h, w = self.coded_h, self.coded_w
        src_pack = np.concatenate(
            [np.asarray(y, np.uint8),
             np.concatenate([np.asarray(u, np.uint8),
                             np.asarray(v, np.uint8)], axis=1)], axis=0)
        # newest adapted CDF state available at dispatch time (the
        # pipelined loop collects after dispatching the mini-GoP, so
        # this lags by one stage — still content-matched, unlike the
        # default-CDF static tables)
        cdf_state = (self._chain_cdfs
                     if self._feat.adapted_rates else None)
        pend = gop_fast.run_inter_frame(
            src_pack, refs, qindex, h, w,
            modes=self._feat.intra_modes,
            ring=self._feat.subpel_ring,
            rad2=self._feat.hme_rad2, rad0=self._feat.hme_rad0,
            cdef_cands=SEARCH_SET[:self._feat.cdef_candidates],
            dlf_on=bool(self.cfg.enable_dlf_flag),
            cdef_on=self.sp.enable_cdef, cdf_state=cdf_state,
            hp=self._feat.hp_mv, obmc=self._feat.obmc,
            interintra=self._feat.interintra,
            exact_rates=self._feat.exact_rates,
            skip_mode=self.sp.enable_order_hint,
            tx_search=self._feat.tx_search,
            split8=self._feat.part8)
        slot = min(self._slot_free) if ev.store else None
        # snapshot the reference order hints in DECODE order (collect
        # runs after later dispatches may have overwritten slot hints)
        idx = [last_slot] * 7
        if bwd_slot is not None:
            # bwd ref maps only to ALTREF (see fp_setup note)
            idx[mv_pred.ALTREF_FRAME - 1] = bwd_slot
        if gld_slot is not None:
            idx[mv_pred.GOLDEN_FRAME - 1] = gld_slot
        ref_hints = tuple(self._slot_hint[i] for i in idx)
        if ev.store:
            self._slot_free.remove(slot)
            self._dpb[ev.poc] = slot
            self._slot_recon[slot] = pend.recon
            self._slot_hint[slot] = \
                ev.poc & ((1 << self.sp.order_hint_bits) - 1)
        return ("code", ev, pend, qindex, last_slot, bwd_slot, slot,
                (y, u, v), ref_hints, gld_slot)

    def _collect_inter_fast(self, rec):
        """Phase 2: the one bundled pull + entropy coding + packet."""
        from svt_av1_tpu.pipeline import gop_fast
        from svt_av1_tpu.utils.profiling import stage
        (_, ev, pend, qindex, last_slot, bwd_slot, slot, src,
         ref_hints, gld_slot) = rec
        with stage("device_md_inter"):
            decisions, recon_dev, header = \
                gop_fast.collect_inter_frame(pend)
        pkt, tenc = self._packetize_fast(decisions, header, qindex, ev,
                                         last_slot, bwd_slot, slot,
                                         ref_hints, gld_slot)
        if ev.store:
            self._slot_state[slot] = (tenc.cdfs, tenc.nmv)
            self._chain_cdfs = tenc.cdfs
        pkt.displayed = ev.shown
        if ev.shown and (self.recon_enabled or self.cfg.stat_report):
            y, u, v = src
            full = {k: np.asarray(recon_dev[k]) for k in ("y", "u", "v")}
            pkt.recon = dict(
                y=full["y"][:self.render_h, :self.render_w],
                u=full["u"][:(self.render_h + 1) // 2,
                            :(self.render_w + 1) // 2],
                v=full["v"][:(self.render_h + 1) // 2,
                            :(self.render_w + 1) // 2])
            if self.cfg.stat_report:
                from svt_av1_tpu.utils import metrics
                pkt.stats = metrics.frame_stats(
                    dict(y=y, u=u, v=v), pkt.recon,
                    self.cfg.encoder_bit_depth)
        self._finish_packet(pkt, qindex, ev.layer)

    def _emit_show_existing_fast(self, poc: int, slot: int, recon_dev):
        data = obu.temporal_delimiter() + obu.write_show_existing(slot)
        recon = None
        if self.recon_enabled or self.cfg.stat_report:
            full = {k: np.asarray(v) for k, v in recon_dev.items()}
            recon = dict(
                y=full["y"][:self.render_h, :self.render_w],
                u=full["u"][:(self.render_h + 1) // 2,
                            :(self.render_w + 1) // 2],
                v=full["v"][:(self.render_h + 1) // 2,
                            :(self.render_w + 1) // 2])
        self._packets.append(Packet(data=data, pts=poc,
                                    frame_type=obu.INTER_FRAME,
                                    recon=recon))

    def _packetize_fast(self, decisions, header, qindex, ev, last_slot,
                        bwd_slot, slot, ref_hints=None, gld_slot=None):
        """OBU assembly for a fast-path inter frame: filter decisions
        arrive precomputed in ``header`` (no host filter stages)."""
        from svt_av1_tpu.codec import mv_pred
        from svt_av1_tpu.pipeline.cdef_stage import cdef_damping
        from svt_av1_tpu.utils.profiling import stage
        fp = obu.FrameParams(frame_type=obu.INTER_FRAME,
                             show_frame=ev.shown, base_q_idx=qindex,
                             render_width=self.render_w,
                             render_height=self.render_h)
        fp.showable_frame = not ev.shown
        fp.refresh_frame_flags = (1 << slot) if ev.store else 0
        idx = [last_slot] * 7
        if bwd_slot is not None:
            # bwd ref maps only to ALTREF (see fp_setup note)
            idx[mv_pred.ALTREF_FRAME - 1] = bwd_slot
        if gld_slot is not None:
            idx[mv_pred.GOLDEN_FRAME - 1] = gld_slot
        fp.ref_frame_idx = tuple(idx)
        fp.primary_ref_frame = 0
        gm = header["gm"]
        fp.gm_trans = tuple(gm.get(i + 1) for i in range(7))
        fp.interpolation_filter = header["interp"]
        if self.cfg.enable_dlf_flag:
            ly, lu, lv = header["dlf_levels"]
            fp.filter_level = (ly, ly)
            fp.filter_level_uv = (lu, lv)
        if header["cdef"] is not None:
            fp.cdef_damping = cdef_damping(qindex)
            fp.cdef_bits = header["cdef"]["bits"]
            fp.cdef_strengths = header["cdef"]["sets"][0]
        fp.reference_select = any(
            d.ref2 for d in decisions.values() if d.is_inter)
        fp.allow_high_precision_mv = self._feat.hp_mv
        fp.is_motion_mode_switchable = self._feat.obmc
        mask = (1 << self.sp.order_hint_bits) - 1
        fp.order_hint = ev.poc & mask
        fp.ref_hints = (ref_hints if ref_hints is not None
                        else tuple(self._slot_hint[i] for i in idx))
        sm_pair = (obu.skip_mode_refs(fp.order_hint, fp.ref_hints,
                                      self.sp.order_hint_bits)
                   if (fp.reference_select
                       and self.sp.enable_order_hint) else None)
        fp.skip_mode_present = sm_pair is not None
        fp.use_ref_frame_mvs = bool(self.sp.enable_ref_frame_mvs
                                    and self.sp.enable_order_hint
                                    and not fp.error_resilient_mode)
        tenc = TileEncoder(self.sr_w, self.sp.height, qindex,
                           reduced_tx_set=fp.reduced_tx_set,
                           update_cdfs=not fp.disable_cdf_update,
                           frame_is_intra=False,
                           init_cdfs=self._slot_state[last_slot][0],
                           init_nmv=self._slot_state[last_slot][1])
        if fp.skip_mode_present:
            tenc.skip_mode_present = True
            tenc.skip_mode_frames = sm_pair
            tenc.interp_filter = fp.interpolation_filter
        tenc.enable_filter_intra = self.sp.enable_filter_intra
        tenc.enable_masked_compound = self.sp.enable_masked_compound
        tenc.enable_interintra = self.sp.enable_interintra_compound
        tenc.is_motion_mode_switchable = fp.is_motion_mode_switchable
        tenc.reference_select = fp.reference_select
        if fp.allow_high_precision_mv:
            from svt_av1_tpu.codec import mv as mv_mod
            tenc.mv_precision = mv_mod.MV_SUBPEL_HIGH
        tenc.set_gm(fp.gm_trans)
        hint_map = {e: fp.ref_hints[e - 1] for e in range(1, 8)}
        tenc.cur_hint = fp.order_hint
        tenc.ref_hints = hint_map
        tenc.order_hint_bits = self.sp.order_hint_bits
        if fp.use_ref_frame_mvs:
            slot_fields = {e: self._slot_mvfield.get(idx[e - 1])
                           for e in range(1, 8)}
            with stage("tmvp_setup"):
                tenc.tmvp = mv_pred.setup_motion_field(
                    slot_fields, hint_map, fp.order_hint,
                    self.sp.order_hint_bits, tenc.mi_rows,
                    tenc.mi_cols, fp.allow_high_precision_mv)
        with stage("host_ec"):
            tile_data = tenc.encode(decisions)
        if ev.store and self.sp.enable_ref_frame_mvs:
            side = mv_pred.ref_frame_side(hint_map, fp.order_hint,
                                          self.sp.order_hint_bits)
            with stage("save_mvfield"):
                self._slot_mvfield[slot] = mv_pred.save_motion_field(
                    decisions, tenc.mi_rows, tenc.mi_cols, side,
                    fp.ref_hints, fp.order_hint, is_intra=False)
        tu = obu.temporal_delimiter()
        if not self._seq_hdr_sent:
            tu += obu.write_sequence_header(self.sp)
            tu += self._metadata_obus()
            self._seq_hdr_sent = True
        tu += obu.write_frame_obu(self.sp, fp, tile_data)
        pkt = Packet(data=tu, pts=ev.poc, frame_type=obu.INTER_FRAME,
                     recon=None)
        return pkt, tenc

    def _emit_show_existing(self, poc: int):
        slot = self._dpb[poc]
        data = obu.temporal_delimiter() + obu.write_show_existing(slot)
        recon = None
        if self.recon_enabled or self.cfg.stat_report:
            full = {k: np.asarray(v)
                    for k, v in self._slot_recon[slot].items()}
            recon = dict(
                y=full["y"][:self.render_h, :self.render_w],
                u=full["u"][:(self.render_h + 1) // 2,
                            :(self.render_w + 1) // 2],
                v=full["v"][:(self.render_h + 1) // 2,
                            :(self.render_w + 1) // 2])
        self._packets.append(Packet(data=data, pts=poc,
                                    frame_type=obu.INTER_FRAME,
                                    recon=recon))

    def send_pictures(self, frames, eos: bool = False):
        """Batched submit: frames = [(y, u, v), ...].  All frames run as
        one device program (all-intra); EC still per frame on the host.
        The TPU-native analog of the reference's picture parallelism."""
        if (self.cfg.intra_period_length not in (-2, 0)
                or self.sr_denom != 8):
            # GOP with inter frames or superres: sequential path
            for (y, u, v) in frames:
                self.send_picture(y, u, v)
            if eos:
                self._eos_sent = True
            return
        qindex = (self._rc.pick_q(True, 0, self._pts)
                  if self._rc.onepass is not None
                  else self._rc.frame_qindex())
        from svt_av1_tpu.codec import fast_ec
        arrays_ok = (fast_ec.available() and qindex > 0
                     and self.cfg.encoder_bit_depth == 8
                     and not self.sp.enable_restoration
                     and not self.sp.enable_cdef
                     and not self.sp.enable_filter_intra)

        from svt_av1_tpu.utils.profiling import stage

        def emit(results, q, srcs):
            for (decisions, recon), src in zip(results, srcs):
                with stage("host_ec"):
                    if arrays_ok:
                        pkt = self._packetize_arrays(
                            decisions, recon, q, self._pts)
                    else:
                        pkt = self._packetize(
                            decisions, recon, q, self._pts)
                if self.cfg.stat_report:
                    from svt_av1_tpu.utils import metrics
                    pkt.stats = metrics.frame_stats(
                        dict(y=src[0], u=src[1], v=src[2]), pkt.recon,
                        self.cfg.encoder_bit_depth)
                self._packets.append(pkt)
                self._rc.feedback(len(pkt.data) * 8, q, True)
                if self._fp_stats is not None:
                    self._fp_stats.append((len(pkt.data) * 8, q, 1.0))
                self._pts += 1

        # overlap: device compute of chunk k+1 runs while the host
        # entropy-codes chunk k (JAX dispatch is asynchronous)
        CH = 32
        padded = [self._pad(y, u, v) for (y, u, v) in frames]
        pending = None
        for i in range(0, len(padded), CH):
            q = ((self._rc.pick_q(True, 0, self._pts)
                  if self._rc.onepass is not None
                  else self._rc.frame_qindex()) if i else qindex)
            chunk = padded[i:i + CH]
            with stage("device_dispatch"):
                launched = intra_encoder.encode_intra_frames_launch(
                    chunk, q,
                    modes=(self._md_modes if not arrays_ok
                           else self._feat.intra_modes),
                    bd=self.cfg.encoder_bit_depth,
                    tile_starts=(self._tile_starts if arrays_ok
                                 else (0,)),
                    rdoq=self._feat.rdoq,
                    exact_rates=(self._feat.exact_rates
                                 and self._feat.exact_rates_intra))
            if pending is not None:
                with stage("device_wait_transfer"):
                    results = intra_encoder.encode_intra_frames_finish(
                        pending[0], as_arrays=arrays_ok)
                emit(results, pending[1], pending[2])
            pending = (launched, q, chunk)
        if pending is not None:
            with stage("device_wait_transfer"):
                results = intra_encoder.encode_intra_frames_finish(
                    pending[0], as_arrays=arrays_ok)
            emit(results, pending[1], pending[2])
        if eos:
            self._eos_sent = True

    def _metadata_obus(self) -> bytes:
        """HDR CLL / mastering-display metadata OBUs, emitted with the
        sequence header (metadata_handle.c surface)."""
        out = b""
        if self.cfg.content_light:
            try:
                cll, fall = (int(x) for x in
                             self.cfg.content_light.split(","))
                out += obu.write_metadata_hdr_cll(cll, fall)
            except ValueError:
                raise ConfigError("bad content-light string") from None
        if self.cfg.mastering_display:
            import re
            s = self.cfg.mastering_display
            m = {k: (float(a), float(b)) for k, a, b in re.findall(
                r"(G|B|R|WP|L)\(([\d.]+),([\d.]+)\)", s)}
            if set(m) != {"G", "B", "R", "WP", "L"}:
                raise ConfigError("bad mastering-display string")
            out += obu.write_metadata_hdr_mdcv(
                (m["R"], m["G"], m["B"]), m["WP"], m["L"][0], m["L"][1])
        return out

    def reconfigure(self, target_bit_rate=None, qp=None):
        """On-the-fly reconfiguration (resource_coordination
        update_rate_info role): adjust the rate target / base quantizer
        between pictures without resetting encoder state."""
        if target_bit_rate is not None:
            self.cfg.target_bit_rate = int(target_bit_rate)
            fps = (self.cfg.frame_rate_numerator
                   / max(self.cfg.frame_rate_denominator, 1))
            self._rc.target_bits_per_frame = \
                max(target_bit_rate, 1) / max(fps, 1e-6)
            if self._rc.onepass is not None:
                # retarget the buffer model, keep the learned
                # correction factors (svt_av1_resize_reset_rc posture)
                op = self._rc.onepass
                bw = max(float(target_bit_rate), 1.0)
                op.avg_frame_bandwidth = bw / max(fps, 1e-6)
                op.optimal_buffer_level = 0.600 * bw
                op.maximum_buffer_size = 1.000 * bw
                op.buffer_level = min(op.buffer_level,
                                      op.maximum_buffer_size)
        if qp is not None:
            if not (0 <= qp <= 63):
                raise ConfigError(f"bad qp {qp}")
            self.cfg.qp = int(qp)
            self._rc.qindex = qp_to_qindex(qp)

    def get_stream_info(self, info_id: int = 0):
        """svt_av1_enc_get_stream_info parity: id 0 returns the
        first-pass stats blob (STREAM_INFO_FIRST_PASS_STATS_OUT)."""
        if info_id == 0:
            return self.get_stats()
        raise ValueError(f"unknown stream info id {info_id}")

    def _grain(self, y=None, u=None, v=None):
        """Film-grain params for the frame header: AR-model estimation
        from the source (noise_model.c:2279 role) on the first key
        frame, cached for the sequence; strength-preset fallback when
        the source is clean or unavailable."""
        if not self._grain_estimated and y is not None:
            self._grain_estimated = True
            from svt_av1_tpu.pipeline import noise_model
            try:
                p, _ = noise_model.estimate_grain_params(
                    y, u, v, bd=self.cfg.encoder_bit_depth)
            except Exception:
                p = None
            self._grain_params = p
        if self._grain_params is not None:
            return self._grain_params
        from svt_av1_tpu.codec.film_grain import default_grain_params
        return default_grain_params(
            self.cfg.film_grain_denoise_strength)

    def _packetize_arrays(self, bundle, recon, qindex, pts) -> Packet:
        """Array-native key-frame packetization (no per-block objects)."""
        from svt_av1_tpu.codec import fast_ec
        ym, um, qy, qu, qv, gh, gw = bundle
        fp = obu.FrameParams(frame_type=obu.KEY_FRAME, show_frame=True,
                             base_q_idx=qindex,
                             render_width=self.render_w,
                             render_height=self.render_h)
        if self.cfg.film_grain_denoise_strength > 0:
            fp.film_grain = self._grain()
        if self.cfg.enable_dlf_flag:
            lvl_y = default_filter_level(qindex)
            fp.filter_level = (lvl_y, lvl_y)
            lvl_uv = max(0, lvl_y - 2)
            fp.filter_level_uv = (lvl_uv, lvl_uv)
            recon = intra_encoder.apply_loop_filter(recon, fp)
        self._ref = {k: recon[k] for k in ("y", "u", "v")}
        starts = self._tile_starts
        if len(starts) > 1:
            # tile-parallel EC (ec_process.c:233-291 analog): tile
            # columns entropy-code independently; the native coder
            # releases the GIL so threads give real parallelism
            fp.log2_tile_cols = self._log2_tile_cols
            bounds = [(starts[i], (starts[i + 1]
                                   if i + 1 < len(starts) else gw))
                      for i in range(len(starts))]

            def enc_tile(b):
                c0, c1 = b
                sl = np.s_[:, c0:c1]
                te = TileEncoder((c1 - c0) * 16, self.sp.height, qindex,
                                 update_cdfs=True, frame_is_intra=True)
                cut = lambda a: np.ascontiguousarray(
                    a.reshape(gh, gw, -1)[sl]).reshape(
                        gh * (c1 - c0), -1)
                data = fast_ec.encode_intra_tile_arrays(
                    te, cut(ym).reshape(-1), cut(um).reshape(-1),
                    cut(qy), cut(qu), cut(qv))
                return data, te

            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(len(bounds)) as pool:
                results = list(pool.map(enc_tile, bounds))
            tile_data = [d for d, _ in results]
            # frame-end CDF state comes from context_update_tile_id = 0
            self._ref_cdfs = results[0][1].cdfs
            self._ref_nmv = results[0][1].nmv
        else:
            tenc = TileEncoder(self.sp.width, self.sp.height, qindex,
                               update_cdfs=True, frame_is_intra=True)
            tile_data = fast_ec.encode_intra_tile_arrays(tenc, ym, um,
                                                         qy, qu, qv)
            self._ref_cdfs = tenc.cdfs
            self._ref_nmv = tenc.nmv
        tu = obu.temporal_delimiter()
        if not self._seq_hdr_sent:
            tu += obu.write_sequence_header(self.sp)
            tu += self._metadata_obus()
            self._seq_hdr_sent = True
        tu += obu.write_frame_obu(self.sp, fp, tile_data)
        recon_out = dict(
            y=recon["y"][:self.render_h, :self.render_w],
            u=recon["u"][:(self.render_h + 1) // 2,
                         :(self.render_w + 1) // 2],
            v=recon["v"][:(self.render_h + 1) // 2,
                         :(self.render_w + 1) // 2])
        return Packet(data=tu, pts=pts, frame_type=obu.KEY_FRAME,
                      recon=recon_out)

    def send_eos(self):
        self._eos_sent = True

    def get_packet(self) -> Optional[Packet]:
        if self._packets:
            return self._packets.popleft()
        return None

    @property
    def done(self) -> bool:
        return self._eos_sent and not self._packets

    # -- internals -----------------------------------------------------------
    def _pad(self, y, u, v):
        """Edge-replicate to the coded (16-aligned) size."""
        if (self.coded_w == self.render_w
                and self.coded_h == self.render_h):
            return np.asarray(y), np.asarray(u), np.asarray(v)
        py = self.coded_h - self.render_h
        px = self.coded_w - self.render_w
        y = np.pad(np.asarray(y), ((0, py), (0, px)), mode="edge")
        u = np.pad(np.asarray(u), ((0, py // 2), (0, px // 2)),
                   mode="edge")
        v = np.pad(np.asarray(v), ((0, py // 2), (0, px // 2)),
                   mode="edge")
        return y, u, v

    def _frame_is_key(self, pts: int) -> bool:
        """GOP structure from intra_period_length (SVT semantics):
        -2 auto (round 1: all intra), 0 all intra, -1 first frame only,
        N>0 a key frame every N+1 frames.  Scene cuts (histogram
        distance, the picture-decision analog of pd_process.c:274)
        force a key frame in GOP modes."""
        period = self.cfg.intra_period_length
        if period in (-2, 0):
            return True
        if self._scene_cut:
            return True
        if period == -1:
            return pts == 0
        return pts % (period + 1) == 0

    # region-vote scene change (pd_process.c:274-365 scene_change
    # detector): per-region 256-bin histogram AHD against a running
    # average, abrupt when the AHD error exceeds SCENE_TH-per-64x64
    # (expressed here as a pixel fraction so it is resolution-exact
    # rather than >>12-truncated), fade suppression via region mean
    # intensity, cut when >= 50% of regions vote.  The reference also
    # consults the FUTURE frame to reject single-frame flashes; this
    # detector is causal (no lookahead frame at detection time), so
    # flashes cost one spurious key rather than a missed cut.
    _SCENE_TH = 3000.0 / 4096.0   # SCENE_TH * NUM64x64INPIC, normalized
    _FADE_TH = 3                  # mean-intensity delta on 8-bit scale

    def _detect_scene_cut(self, y: np.ndarray) -> None:
        bd_shift = self.cfg.encoder_bit_depth - 8
        yy = (np.asarray(y).astype(np.int64) >> bd_shift)
        h, w = yy.shape
        R = 4 if h >= 64 else 1
        C = 4 if w >= 64 else 1
        rid = (np.minimum(np.arange(h) * R // h, R - 1)[:, None] * C
               + np.minimum(np.arange(w) * C // w, C - 1)[None, :])
        flat_id = rid.reshape(-1)
        hist = np.bincount(flat_id * 256 + yy.reshape(-1),
                           minlength=R * C * 256) \
            .reshape(R * C, 256).astype(np.float64)
        npix = hist.sum(axis=1)
        hist /= npix[:, None]
        means = (np.bincount(flat_id, weights=yy.reshape(-1),
                             minlength=R * C) / npix)
        self._last_ahd = 0.0
        if self._prev_hist is None:
            self._scene_cut = False
            self._ahd_running = None
        else:
            prev_hist, prev_means = self._prev_hist
            ahd = np.abs(hist - prev_hist).sum(axis=1)
            if self._ahd_running is None:
                self._ahd_running = ahd.copy()
            ahd_err = np.abs(self._ahd_running - ahd)
            abrupt = (ahd_err > self._SCENE_TH) & (ahd >= ahd_err)
            aid = np.abs(means - prev_means)
            scene = abrupt & (aid >= self._FADE_TH)
            self._ahd_running = np.where(
                abrupt, self._ahd_running,
                (3.0 * self._ahd_running + ahd) / 4.0)
            vote_th = (R * C + 1) // 2
            self._scene_cut = int(scene.sum()) >= vote_th
            self._last_ahd = float(ahd.mean())
            if int(abrupt.sum()) >= vote_th:
                self._ahd_running = ahd.copy()
        self._prev_hist = (hist, means)

    def get_stats(self) -> bytes:
        """First-pass stats blob for pass 2 (svt_av1_enc_get... analog;
        feed back via EncoderConfig.rc_stats_buffer)."""
        from svt_av1_tpu.pipeline import rate_control as rc_mod
        assert self._fp_stats is not None, "not a pass-1 encoder"
        return rc_mod.pack_first_pass_stats(self._fp_stats)

    def stage_stats(self):
        """Per-stage host timing accumulated since process start (the
        observability analog of SRM occupancy reports / SVT_LOG)."""
        from svt_av1_tpu.utils import profiling
        return profiling.stage_stats()

    def _encode_frame(self, y, u, v, pts, qindex_override=None,
                      _depth=0) -> Packet:
        will_be_key = self._frame_is_key(pts) or self._ref is None
        if qindex_override is not None:
            qindex = int(qindex_override)
        elif self._q_plan is not None and pts < len(self._q_plan):
            qindex = int(self._q_plan[pts])
        elif self._rc.onepass is not None:
            qindex = self._rc.pick_q(will_be_key, 0, pts)
        else:
            qindex = self._rc.frame_qindex()
        # recode loop (rc_process.c:2708 recode_loop_test analog): the
        # DPB/CDF state must rewind before a re-encode of this frame
        dpb_snap = (self._ref, self._ref_cdfs, self._ref_nmv)
        y, u, v = self._pad(y, u, v)
        src_full = dict(y=y, u=u, v=v)
        if self.sr_denom != 8:
            # encoder-side horizontal downscale (non-normative); the
            # loop upscales back with the normative kernel
            y = ((y[:, 0::2].astype(np.int32)
                  + y[:, 1::2].astype(np.int32) + 1) >> 1).astype(y.dtype)
            u = ((u[:, 0::2].astype(np.int32)
                  + u[:, 1::2].astype(np.int32) + 1) >> 1).astype(u.dtype)
            v = ((v[:, 0::2].astype(np.int32)
                  + v[:, 1::2].astype(np.int32) + 1) >> 1).astype(v.dtype)
        from svt_av1_tpu.utils.profiling import stage
        is_key = self._frame_is_key(pts) or self._ref is None
        gop_has_inter = self.cfg.intra_period_length not in (-2, 0)
        if (is_key and gop_has_inter and self._q_plan is None
                and qindex_override is None
                and self._rc.onepass is None):
            # key-frame boost: keys are referenced by the whole GOP, so
            # spend more bits on them (rc_process.c kf boost analog);
            # recode retries keep their raised qindex
            qindex = max(1, qindex - qindex // self._feat.kf_boost_div)
        qmap = None
        seg_info = None
        if (self.cfg.enable_adaptive_quantization and is_key
                and not self._feat.varpart):
            if self.cfg.enable_adaptive_quantization == 2:
                # segment-based AQ: the variance deltas become
                # SEG_LVL_ALT_Q segments (segmentation.c role)
                seg_info, qmap = _segment_qmap(y, qindex)
            else:
                qmap = _variance_qmap(y, qindex)
        if is_key:
            if self._feat.varpart and qmap is None:
                # 32/16 partition MD (quality presets); mixed tx sizes
                # deblock via the mask-aware filter in _packetize
                from svt_av1_tpu.pipeline import varpart
                with stage("device_md_intra"):
                    decisions, recon = varpart.encode_intra_frame_varpart(
                        y, u, v, qindex, modes=self._md_modes,
                        bd=self.cfg.encoder_bit_depth)
            else:
                pal_cands = None
                if self.sp.enable_screen_content and qmap is None:
                    pal_cands = intra_encoder.palette_md_candidates(
                        y, qindex, bd=self.cfg.encoder_bit_depth)
                self._frame_allow_sct = pal_cands is not None
                with stage("device_md_intra"):
                    decisions, recon = intra_encoder.encode_intra_frame(
                        y, u, v, qindex, modes=self._md_modes,
                        bd=self.cfg.encoder_bit_depth, qmap=qmap,
                        rdoq=self._feat.rdoq,
                        tx_search=self._feat.tx_search,
                        angle_deltas=self._feat.angle_deltas,
                        cfl=self._feat.cfl,
                        exact_rates=(self._feat.exact_rates
                                     and self._feat.exact_rates_intra),
                        palette_cands=pal_cands)
        else:
            with stage("device_md_inter"):
                decisions, recon, gm, interp = \
                inter_encoder.encode_inter_frame(
                    y, u, v, self._ref, qindex,
                    modes=self._feat.intra_modes,
                    bd=self.cfg.encoder_bit_depth,
                    hme_rad2=self._feat.hme_rad2,
                    hme_rad0=self._feat.hme_rad0,
                    subpel_ring=self._feat.subpel_ring,
                    exact_rates=self._feat.exact_rates)
        # switch frames (S_FRAME, Docs/Appendix-Switch-Frame.md role):
        # every sframe_dist-th inter frame codes as an error-resilient
        # switch point (default CDFs, refresh-all)
        sframe = (not is_key and self.cfg.sframe_dist > 0
                  and pts % self.cfg.sframe_dist == 0)

        def _sframe_setup(fp):
            fp.frame_type = obu.S_FRAME
            fp.error_resilient_mode = True
            fp.refresh_frame_flags = 0xFF
            fp.primary_ref_frame = obu.PRIMARY_REF_NONE

        pkt = self._packetize(decisions, recon, qindex, pts,
                              is_key=is_key, src=dict(y=y, u=u, v=v),
                              src_full=src_full,
                              delta_q=(qmap is not None
                                       and seg_info is None),
                              seg=seg_info,
                              gm=None if is_key else gm,
                              interp=0 if is_key else interp,
                              fp_setup=_sframe_setup if sframe else None)
        if (_depth == 0 and self._rc.mode in (1, 2)
                and self._q_plan is None):
            # strong overshoot vs the per-frame budget: re-encode once
            # at a materially higher qindex (keys keep their boost)
            bits = len(pkt.data) * 8
            limit = (8.0 if is_key else 3.0)                 * self._rc.target_bits_per_frame
            if bits > limit and qindex < self._rc.max_qindex:
                newq = min(self._rc.max_qindex,
                           max(qindex + 16, int(qindex * 1.25)))
                self._ref, self._ref_cdfs, self._ref_nmv = dpb_snap
                return self._encode_frame(
                    y, u, v, pts, qindex_override=newq, _depth=1)
        if self.cfg.stat_report and pkt.recon is not None:
            from svt_av1_tpu.utils import metrics
            ss = src_full or dict(y=y, u=u, v=v)
            pkt.stats = metrics.frame_stats(
                ss, pkt.recon, self.cfg.encoder_bit_depth)
        self._rc.feedback(len(pkt.data) * 8, qindex, is_key)
        if self._fp_stats is not None:
            self._fp_stats.append((len(pkt.data) * 8, qindex,
                                   float(is_key)))
        return pkt

    def _packetize(self, decisions, recon, qindex, pts,
                   is_key: bool = True, src=None,
                   src_full=None, delta_q: bool = False,
                   fp_setup=None, chain="auto",
                   return_state: bool = False, gm=None,
                   seg=None, interp: int = 0, prefilt=None) -> Packet:
        """Filters + entropy coding + OBU assembly for one frame.

        fp_setup: optional callable mutating the FrameParams (hierarchical
        GOP sets show_frame / refresh / ref_frame_idx / primary_ref).
        chain: "auto" = single-slot CDF chaining via self._ref_cdfs;
        None = no chaining; (cdfs, nmv) = explicit state.
        return_state: also return (full filtered recon, tile encoder).
        prefilt: (recon, deblocked, fp_updates, cdef_idx_map) from
        gop_fast.run_key_filters — DLF+CDEF already done (fused fast
        path); skips the in-line filter stages."""
        frame_type = obu.KEY_FRAME if is_key else obu.INTER_FRAME
        fp = obu.FrameParams(frame_type=frame_type, show_frame=True,
                             base_q_idx=qindex,
                             render_width=self.render_w,
                             render_height=self.render_h)
        if is_key and getattr(self, "_frame_allow_sct", False):
            fp.allow_screen_content_tools = True
            self._frame_allow_sct = False
        auto_chain = chain == "auto"
        if not is_key and auto_chain:
            fp.refresh_frame_flags = 0x01
            if self._ref_cdfs is not None:
                fp.primary_ref_frame = 0  # chain CDFs from slot 0
        if gm:
            fp.gm_trans = tuple(gm.get(i + 1) for i in range(7))
        if not is_key:
            fp.interpolation_filter = interp
        if fp_setup is not None:
            fp_setup(fp)
        if delta_q:
            fp.delta_q_present = True
            fp.delta_q_res = 2
        if seg is not None:
            fp.segmentation = seg[0]
        if self.cfg.film_grain_denoise_strength > 0:
            fp.film_grain = self._grain(
                src["y"] if src is not None else None,
                src["u"] if src is not None else None,
                src["v"] if src is not None else None)
        from svt_av1_tpu.utils.profiling import stage
        if prefilt is not None:
            recon, deblocked, fpu, cdef_idx_map = prefilt
            for k, val in fpu.items():
                setattr(fp, k, val)
        elif self.cfg.enable_dlf_flag:
            # uniform filtering is conformant for the fixed 16x16 grid
            # (every filtered edge is a block (PU) edge, and the spec
            # filters PU edges regardless of skip, deblocking_filter.c:
            # 260 `... || pu_edge`); mixed-size frames (varpart 32/64
            # leaves) use the mask-aware filter instead
            from svt_av1_tpu.codec import constants as _cc
            mixed = any(d.bsize != _cc.BLOCK_16X16
                        for d in decisions.values())
            with stage("dlf"):
                if mixed:
                    from svt_av1_tpu.pipeline import dlf_stage
                    flens = dlf_stage.flens_from_maps(
                        dlf_stage.maps_from_decisions(
                            decisions, self.coded_h // 4,
                            self.sr_w // 4))
                    if self._feat.dlf_search and src is not None:
                        recon = dlf_stage.search_and_apply_masked(
                            src, recon, fp, flens,
                            bd=self.cfg.encoder_bit_depth)
                    else:
                        lvl_y = default_filter_level(qindex)
                        fp.filter_level = (lvl_y, lvl_y)
                        lvl_uv = max(0, lvl_y - 2)
                        fp.filter_level_uv = (lvl_uv, lvl_uv)
                        recon = dlf_stage.apply_masked(
                            recon, fp, flens,
                            bd=self.cfg.encoder_bit_depth)
                elif self._feat.dlf_search and src is not None:
                    # per-plane level search (dlf_process.c:106-131)
                    from svt_av1_tpu.pipeline import dlf_stage
                    recon = dlf_stage.search_and_apply(
                        src, recon, fp, bd=self.cfg.encoder_bit_depth)
                else:
                    lvl_y = default_filter_level(qindex)
                    fp.filter_level = (lvl_y, lvl_y)
                    lvl_uv = max(0, lvl_y - 2)
                    fp.filter_level_uv = (lvl_uv, lvl_uv)
                    recon = intra_encoder.apply_loop_filter(recon, fp)
        if prefilt is None:
            deblocked = recon  # post-DLF, pre-CDEF (LR boundary source)
        if prefilt is None and self.sp.enable_cdef and src is not None:
            from svt_av1_tpu.pipeline import cdef_stage
            skip16 = _skip_map(decisions, self.coded_h // 16,
                               self.sr_w // 16)
            fp.cdef_damping = cdef_stage.cdef_damping(qindex)
            with stage("cdef"):
                if self._feat.cdef_sb:
                    # per-SB strengths (cdef_bits > 0), idx coded in
                    # the tile at each SB's first non-skip block
                    bits, sets, cdef_idx_map = cdef_stage.cdef_search_sb(
                        src, recon, skip16, qindex,
                        bd=self.cfg.encoder_bit_depth,
                        max_candidates=self._feat.cdef_candidates)
                    fp.cdef_bits = bits
                    fp.cdef_strengths = sets[0]
                    fp.cdef_strength_list = sets if bits else None
                    recon = cdef_stage.cdef_apply(
                        recon, skip16, sets, fp.cdef_damping,
                        bd=self.cfg.encoder_bit_depth,
                        sb_idx=cdef_idx_map)
                else:
                    cdef_idx_map = None
                    fp.cdef_strengths = cdef_stage.cdef_search(
                        src, recon, skip16, qindex,
                        bd=self.cfg.encoder_bit_depth,
                        max_candidates=self._feat.cdef_candidates)
                    recon = cdef_stage.cdef_apply(
                        recon, skip16, fp.cdef_strengths,
                        fp.cdef_damping,
                        bd=self.cfg.encoder_bit_depth)
        elif prefilt is None:
            cdef_idx_map = None
        if self.sr_denom != 8 and src is not None:
            # normative horizontal upscale (spec 7.16): after CDEF,
            # before loop restoration; LR then works at full width,
            # with its deblocked boundary rows upscaled the same way
            fp.superres_denom = self.sr_denom
            recon = _superres_upscale_frame(recon, self.coded_w,
                                            self.cfg.encoder_bit_depth)
            deblocked = _superres_upscale_frame(
                deblocked, self.coded_w, self.cfg.encoder_bit_depth)
        lr_info = None
        if self.sp.enable_restoration and src is not None:
            from svt_av1_tpu.codec import lr as lr_mod
            from svt_av1_tpu.pipeline import lr_stage
            with stage("restoration"):
                deblocked = {k: np.asarray(v)
                             for k, v in deblocked.items()}
                bounds = lr_stage.save_boundaries(deblocked)
                lr_info = lr_mod.make_lr_info(self.coded_w, self.coded_h)
                lr_stage.search_lr(src_full or src, recon, bounds,
                                   lr_info,
                                   bd=self.cfg.encoder_bit_depth,
                                   eps_set=self._feat.lr_eps)
                fp.lr_types = tuple(i.frame_type for i in lr_info)
                recon = lr_stage.apply_lr(recon, bounds, lr_info,
                                          bd=self.cfg.encoder_bit_depth)
        if auto_chain:
            self._ref = {k: recon[k] for k in ("y", "u", "v")}
            do_chain = fp.primary_ref_frame != obu.PRIMARY_REF_NONE
            init_cdfs = self._ref_cdfs if do_chain else None
            init_nmv = self._ref_nmv if do_chain else None
        elif chain is not None:
            init_cdfs, init_nmv = chain
        else:
            init_cdfs = init_nmv = None
        tenc = TileEncoder(self.sr_w, self.sp.height, qindex,
                           reduced_tx_set=fp.reduced_tx_set,
                           update_cdfs=not fp.disable_cdf_update,
                           frame_is_intra=is_key,
                           init_cdfs=init_cdfs,
                           init_nmv=init_nmv)
        if lr_info is not None:
            tenc.set_lr(lr_info)
        tenc.enable_filter_intra = self.sp.enable_filter_intra
        tenc.allow_palette = bool(fp.allow_screen_content_tools)
        tenc.bit_depth = self.cfg.encoder_bit_depth
        tenc.enable_masked_compound = self.sp.enable_masked_compound
        tenc.enable_interintra = self.sp.enable_interintra_compound
        tenc.is_motion_mode_switchable = fp.is_motion_mode_switchable
        if not is_key:
            fp.reference_select = any(
                d.ref2 for d in decisions.values() if d.is_inter)
            tenc.reference_select = fp.reference_select
        if self.sp.enable_order_hint:
            mask = (1 << self.sp.order_hint_bits) - 1
            fp.order_hint = pts & mask
            if not is_key:
                fp.ref_hints = tuple(self._slot_hint[i]
                                     for i in fp.ref_frame_idx)
                if fp.error_resilient_mode or fp.frame_type == obu.S_FRAME:
                    fp.ref_order_hints = tuple(self._slot_hint)
                sm_pair = (obu.skip_mode_refs(fp.order_hint,
                                              fp.ref_hints,
                                              self.sp.order_hint_bits)
                           if fp.reference_select else None)
                fp.skip_mode_present = sm_pair is not None
                if fp.skip_mode_present:
                    tenc.skip_mode_present = True
                    tenc.skip_mode_frames = sm_pair
                    tenc.interp_filter = fp.interpolation_filter
        if seg is not None:
            # per-SB segment ids -> mi granularity for the tile coder
            mi_map = np.repeat(np.repeat(seg[1], 16, 0), 16, 1)
            tenc.set_segmentation(fp.segmentation,
                                  mi_map[:tenc.mi_rows, :tenc.mi_cols])
        if fp.cdef_bits:
            tenc.set_cdef(fp.cdef_bits, cdef_idx_map)
        if not is_key:
            tenc.set_gm(fp.gm_trans)
        if fp.delta_q_present:
            tenc.set_delta_q(fp.delta_q_res)
        with stage("host_ec"):
            tile_data = tenc.encode(decisions)
        if auto_chain and not fp.disable_frame_end_update_cdf:
            self._ref_cdfs = tenc.cdfs
            self._ref_nmv = tenc.nmv
        tu = obu.temporal_delimiter()
        if not self._seq_hdr_sent:
            tu += obu.write_sequence_header(self.sp)
            tu += self._metadata_obus()
            self._seq_hdr_sent = True
        tu += obu.write_frame_obu(self.sp, fp, tile_data)
        recon_out = dict(
            y=recon["y"][:self.render_h, :self.render_w],
            u=recon["u"][:(self.render_h + 1) // 2,
                         :(self.render_w + 1) // 2],
            v=recon["v"][:(self.render_h + 1) // 2,
                         :(self.render_w + 1) // 2])
        pkt = Packet(data=tu, pts=pts, frame_type=frame_type,
                     recon=recon_out)
        if return_state:
            return pkt, recon, tenc
        return pkt
