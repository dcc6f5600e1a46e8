"""Preset feature matrix: enc_mode (M0..M13) -> tool levels.

The reference's enc_mode_config.c (8.8k LoC) maps presets to feature
levels for every tool; this is our (round-1) analog controlling the
mode-decision width and in-loop search effort.  Speed presets shrink
the intra candidate set, the CDEF/LR search spaces, and the motion
search, trading quality for throughput."""
from __future__ import annotations

import dataclasses
import os
from typing import Tuple

from svt_av1_tpu.codec import constants as cc

_ALL_MODES = (cc.DC_PRED, cc.V_PRED, cc.H_PRED, cc.SMOOTH_PRED,
              cc.PAETH_PRED, cc.D135_PRED, cc.D113_PRED, cc.D157_PRED,
              cc.D45_PRED, cc.D67_PRED, cc.D203_PRED)


@dataclasses.dataclass(frozen=True)
class PresetFeatures:
    intra_modes: Tuple[int, ...]
    hme_rad2: int          # coarse HME radius (1/4 res)
    hme_rad0: int          # full-res refinement radius
    subpel_ring: bool      # quarter-pel ring in inter pass A
    cdef_candidates: int   # prefix of cdef_stage.SEARCH_SET
    lr_eps: Tuple[int, ...]
    kf_boost_div: int      # key-frame qindex boost = qindex // div
    varpart: bool = False  # 32/16 square partition MD (intra frames)
    rdoq: bool = False     # RD-optimized quantization (ops/rdoq.py;
                           # measured BD-negative here, see its doc)
    tx_search: bool = False  # luma tx-type search (DTT4+IDTX set)
    angle_deltas: bool = False  # directional-mode angle refinement
    cfl: bool = False        # chroma-from-luma candidate
    dlf_search: bool = False  # per-plane DLF level search (vs heuristic)
    cdef_sb: bool = False     # per-SB CDEF strengths (cdef_bits > 0)
    filter_intra: bool = False  # recursive filter-intra candidates
    adapted_rates: bool = False  # per-frame MD rate tables from the
                                 # primary-ref adapted CDFs
    exact_rates: bool = False  # context-exact device coefficient rate
                               # model (ops/coef_rate) in MD costs
    exact_rates_intra: bool = True  # apply exact_rates on intra/key
                                    # MD too (A/B split: the exact
                                    # model wins on skip-vs-code inter
                                    # decisions; intra mode ranking may
                                    # prefer the biased curves)
    hp_mv: bool = False      # 1/8-pel MVs + subpel refinement ring
                             # (allow_high_precision_mv)
    obmc: bool = False       # OBMC_CAUSAL motion mode (overlapped MC)
    interintra: bool = False  # inter-intra compound (smooth blend)
    part8: bool = False      # 8x8 partition-split alternative in the
                             # inter pass-A MD (per-sub MV, TX_8X8)
    tmvp: bool = False       # temporal MV prediction (spec 7.9
                             # projected motion field in the MV stacks)
    palette: bool = False    # screen-content palette MD on key frames
                             # (+ sequence SELECT screen content tools)


def features_for(enc_mode: int) -> PresetFeatures:
    m = max(0, min(13, int(enc_mode)))
    if m <= 4:        # quality presets
        f = PresetFeatures(_ALL_MODES, 8, 7, True, 8,
                           tuple(range(16)), 3, varpart=True,
                           tx_search=True, angle_deltas=True,
                           cfl=True, dlf_search=True, cdef_sb=True,
                           filter_intra=True, obmc=True,
                           interintra=True)
    elif m <= 8:
        f = PresetFeatures(_ALL_MODES[:8], 8, 5, True, 6,
                           tuple(range(0, 16, 2)), 3, tx_search=True,
                           angle_deltas=True, cfl=True,
                           dlf_search=True, obmc=True,
                           interintra=True)
    elif m <= 11:
        f = PresetFeatures(_ALL_MODES[:6], 6, 4, True, 4,
                           (0, 4, 8, 12), 4)
    else:
        f = PresetFeatures(_ALL_MODES[:4], 4, 3, False, 3,
                           (0, 8), 4)
    env = os.environ.get("SVT_TPU_FEAT")
    if env:
        # A/B hook (tools/bdrate.py): "adapted_rates=1,exact_rates=0"
        kw = {}
        for item in env.split(","):
            k, _, v = item.partition("=")
            cur = getattr(f, k.strip())   # raises on unknown field
            kw[k.strip()] = type(cur)(int(v))
        f = dataclasses.replace(f, **kw)
    return f
