"""Reference MV stack construction (AV1 spec §7.10.2 find_mv_stack).

Normative derivation, identically run by encoder and decoder; behavioral
reference: adaptive_mv_pred.c setup_ref_mv_list / scan_row_mbmi /
scan_col_mbmi / scan_blk_mbmi / scan_row_col_light / sort_mvp_table.

Round-1 scope: single reference frame, no temporal (ref-frame) MVs
(sequence signals enable_ref_frame_mvs = 0), global motion identity
(gm candidate = (0,0)).  MVs are (row, col) in 1/8-pel units.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

MAX_REF_MV_STACK_SIZE = 8
MAX_MV_REF_CANDIDATES = 2
REF_CAT_LEVEL = 640
MVREF_ROWS = 3
MV_BORDER = 16 * 8
NEWMV_OFFSET_BIT = 0      # low bits: newmv context
GLOBALMV_OFFSET = 3
REFMV_OFFSET = 4

INTRA_FRAME = 0
LAST_FRAME = 1
LAST2_FRAME = 2
LAST3_FRAME = 3
GOLDEN_FRAME = 4
BWDREF_FRAME = 5
ALTREF2_FRAME = 6
ALTREF_FRAME = 7

# inter prediction modes (PredictionMode tail; intra modes are 0..12)
NEARESTMV = 13
NEARMV = 14
GLOBALMV = 15
NEWMV = 16


def have_newmv(mode: int) -> bool:
    return mode == NEWMV


@dataclasses.dataclass
class MiGrid:
    """Per-4x4 mode info used by MV prediction (one frame)."""
    mi_rows: int
    mi_cols: int

    def __post_init__(self):
        shp = (self.mi_rows, self.mi_cols)
        self.ref_frame = np.full(shp, INTRA_FRAME, np.int8)
        self.mode = np.zeros(shp, np.uint8)
        self.mv = np.zeros(shp + (2,), np.int16)   # (row, col) 1/8 pel
        self.w4 = np.ones(shp, np.int8)            # block width in MI units
        self.h4 = np.ones(shp, np.int8)
        # compound: second reference (0 = NONE) and its MV
        self.ref2 = np.zeros(shp, np.int8)
        self.mv2 = np.zeros(shp + (2,), np.int16)

    def set_block(self, r4, c4, bw4, bh4, ref, mode, mv_row, mv_col,
                  ref2=0, mv2=(0, 0)):
        sl = (slice(r4, r4 + bh4), slice(c4, c4 + bw4))
        self.ref_frame[sl] = ref
        self.mode[sl] = mode
        self.mv[sl + (0,)] = mv_row
        self.mv[sl + (1,)] = mv_col
        self.w4[sl] = bw4
        self.h4[sl] = bh4
        self.ref2[sl] = ref2
        self.mv2[sl + (0,)] = mv2[0]
        self.mv2[sl + (1,)] = mv2[1]


class _Stack:
    def __init__(self):
        self.mvs: List[Tuple[int, int]] = []
        self.weights: List[int] = []

    def add(self, mv, len_, weight):
        for i, m in enumerate(self.mvs):
            if m == mv:
                self.weights[i] += weight * len_
                return
        if len(self.mvs) < MAX_REF_MV_STACK_SIZE:
            self.mvs.append(mv)
            self.weights.append(weight * len_)


def _clamp(v, lo, hi):
    return max(lo, min(hi, v))


@dataclasses.dataclass
class MvStack:
    mvs: List[Tuple[int, int]]      # clamped, padded to >= 2
    weights: List[int]
    count: int                      # true refmv_count (>= 2 after fill)
    mode_context: int

    def drl_ctx(self, idx: int) -> int:
        """av1_drl_ctx (rd_cost.h:69)."""
        w0 = self.weights[idx]
        w1 = self.weights[idx + 1]
        if w0 >= REF_CAT_LEVEL:
            return 0 if w1 >= REF_CAT_LEVEL else 1
        return 2 if w1 < REF_CAT_LEVEL else 0


def find_mv_stack(grid: MiGrid, mi_row: int, mi_col: int, bw4: int,
                  bh4: int, ref: int = LAST_FRAME, sb_mi: int = 16,
                  gm_mv=(0, 0)) -> MvStack:
    """Returns the ranked, clamped reference-MV stack + mode context.

    gm_mv: this reference's global motion vector — GLOBALMV neighbors
    contribute it and it pads an underfull stack (identity = (0,0))."""
    st = _Stack()
    mi_rows, mi_cols = grid.mi_rows, grid.mi_cols
    up = mi_row > 0
    left = mi_col > 0
    row_adj = 0  # blocks >= 8x8 only in round 1
    col_adj = 0
    max_row_offset = 0
    max_col_offset = 0
    if up:
        max_row_offset = max(-(MVREF_ROWS << 1) + row_adj, -mi_row)
    if left:
        max_col_offset = max(-(MVREF_ROWS << 1) + col_adj, -mi_col)

    counts = dict(row_match=0, col_match=0, newmv=0)
    processed = dict(rows=0, cols=0)

    def add_candidate(r, c, len_, weight, which):
        if grid.ref_frame[r, c] != ref:
            return
        mv = (int(grid.mv[r, c, 0]), int(grid.mv[r, c, 1]))
        # GLOBALMV blocks contribute this ref's global mv
        if grid.mode[r, c] == GLOBALMV:
            mv = tuple(gm_mv)
        st.add(mv, len_, weight)
        if have_newmv(int(grid.mode[r, c])):
            counts["newmv"] += 1
        counts[which] += 1

    def scan_row(row_offset):
        end_mi = min(bw4, mi_cols - mi_col, 16)
        col_off = 1 if abs(row_offset) > 1 else 0
        i = 0
        while i < end_mi:
            r = mi_row + row_offset
            c = mi_col + col_off + i
            cw4 = int(grid.w4[r, c])
            ch4 = int(grid.h4[r, c])
            len_ = min(bw4, cw4)
            if abs(row_offset) > 1:
                len_ = max(len_, 2)
            weight = 2
            if bw4 >= 2 and bw4 <= cw4:
                inc = min(-max_row_offset + row_offset + 1, ch4)
                weight = max(weight, inc)
                processed["rows"] = inc - row_offset - 1
            add_candidate(r, c, len_, weight, "row_match")
            i += len_

    def scan_col(col_offset):
        end_mi = min(bh4, mi_rows - mi_row, 16)
        row_off = 1 if abs(col_offset) > 1 else 0
        i = 0
        while i < end_mi:
            r = mi_row + row_off + i
            c = mi_col + col_offset
            cw4 = int(grid.w4[r, c])
            ch4 = int(grid.h4[r, c])
            len_ = min(bh4, ch4)
            if abs(col_offset) > 1:
                len_ = max(len_, 2)
            weight = 2
            if bh4 >= 2 and bh4 <= ch4:
                inc = min(-max_col_offset + col_offset + 1, cw4)
                weight = max(weight, inc)
                processed["cols"] = inc - col_offset - 1
            add_candidate(r, c, len_, weight, "col_match")
            i += len_

    def scan_blk(dr, dc, which):
        r, c = mi_row + dr, mi_col + dc
        if 0 <= r < mi_rows and 0 <= c < mi_cols:
            add_candidate(r, c, 2, 2, which)

    if abs(max_row_offset) >= 1:
        scan_row(-1)
    if abs(max_col_offset) >= 1:
        scan_col(-1)
    if _has_top_right(mi_row, mi_col, bw4, bh4, sb_mi, mi_cols):
        scan_blk(-1, bw4, "row_match")

    nearest_match = (counts["row_match"] > 0) + (counts["col_match"] > 0)
    newmv_count = counts["newmv"]
    st.weights = [w + REF_CAT_LEVEL for w in st.weights]

    # temporal MVs: disabled (enable_ref_frame_mvs = 0)

    scan_blk(-1, -1, "row_match")
    for idx in range(2, MVREF_ROWS + 1):
        row_offset = -(idx << 1) + 1 + row_adj
        col_offset = -(idx << 1) + 1 + col_adj
        if abs(row_offset) <= abs(max_row_offset) \
                and abs(row_offset) > processed["rows"]:
            scan_row(row_offset)
        if abs(col_offset) <= abs(max_col_offset) \
                and abs(col_offset) > processed["cols"]:
            scan_col(col_offset)

    ref_match_count = (counts["row_match"] > 0) + (counts["col_match"] > 0)
    mode_context = 0
    if nearest_match == 0:
        if ref_match_count >= 1:
            mode_context |= 1
        if ref_match_count == 1:
            mode_context |= (1 << REFMV_OFFSET)
        elif ref_match_count >= 2:
            mode_context |= (2 << REFMV_OFFSET)
    elif nearest_match == 1:
        mode_context |= 2 if newmv_count > 0 else 3
        if ref_match_count == 1:
            mode_context |= (3 << REFMV_OFFSET)
        elif ref_match_count >= 2:
            mode_context |= (4 << REFMV_OFFSET)
    else:
        mode_context |= 4 if newmv_count >= 1 else 5
        mode_context |= (5 << REFMV_OFFSET)

    # sort by weight (exact bubble from the reference, stable order)
    mvs, weights = st.mvs, st.weights
    n = len(mvs)
    ln = n
    while ln > 0:
        nr = 0
        for i in range(1, ln):
            if weights[i - 1] < weights[i]:
                mvs[i - 1], mvs[i] = mvs[i], mvs[i - 1]
                weights[i - 1], weights[i] = weights[i], weights[i - 1]
                nr = i
        ln = nr

    # light rescan to fill 2 candidates (single-ref path)
    count = n
    if n < MAX_MV_REF_CANDIDATES:
        mi_size = min(min(16, bw4), min(16, bh4),
                      mi_cols - mi_col, mi_rows - mi_row)
        for (scan_r, fixed, step_attr) in ((True, -1, "w4"),
                                           (False, -1, "h4")):
            if len(mvs) >= MAX_MV_REF_CANDIDATES:
                break
            valid = (abs(max_row_offset) >= 1 if scan_r
                     else abs(max_col_offset) >= 1)
            idx = 0
            while valid and idx < mi_size \
                    and len(mvs) < MAX_MV_REF_CANDIDATES:
                if scan_r:
                    r, c = mi_row - 1, mi_col + idx
                else:
                    r, c = mi_row + idx, mi_col - 1
                cb = int(getattr(grid, step_attr)[r, c])
                if grid.ref_frame[r, c] > INTRA_FRAME:
                    mv = (int(grid.mv[r, c, 0]), int(grid.mv[r, c, 1]))
                    if mv not in mvs:
                        mvs.append(mv)
                        weights.append(2)
                idx += cb
        while len(mvs) < MAX_MV_REF_CANDIDATES:
            mvs.append(tuple(gm_mv))
            weights.append(2)
        count = len(mvs)

    # clamp
    bw_px = bw4 * 4
    bh_px = bh4 * 4
    to_left = -(mi_col * 4 * 8)
    to_right = (mi_cols - bw4 - mi_col) * 4 * 8
    to_top = -(mi_row * 4 * 8)
    to_bottom = (mi_rows - bh4 - mi_row) * 4 * 8
    out = []
    for (r, c) in mvs:
        rr = _clamp(r, to_top - bh_px * 8 - MV_BORDER,
                    to_bottom + bh_px * 8 + MV_BORDER)
        cc = _clamp(c, to_left - bw_px * 8 - MV_BORDER,
                    to_right + bw_px * 8 + MV_BORDER)
        out.append((rr, cc))
    return MvStack(mvs=out, weights=weights, count=count,
                   mode_context=mode_context)


def _has_top_right(mi_row, mi_col, bw4, bh4, sb_mi, mi_cols) -> int:
    """has_top_right for square blocks (adaptive_mv_pred.c:266)."""
    bs = max(bw4, bh4)
    if bs > 16:
        return 0
    if mi_col + bw4 >= mi_cols or mi_row == 0:
        return 0
    mask_row = mi_row & (sb_mi - 1)
    mask_col = mi_col & (sb_mi - 1)
    has_tr = not ((mask_row & bs) and (mask_col & bs))
    b = bs
    while b < sb_mi:
        if mask_col & b:
            if (mask_col & (2 * b)) and (mask_row & (2 * b)):
                has_tr = 0
                break
        else:
            break
        b <<= 1
    return int(has_tr)


def gm_block_mv(model, r4: int, c4: int, bsize: int,
                allow_hp: bool = False):
    """Global-motion vector for a block (spec gm_get_motion_vector).

    model: (row, col) 1/8-pel translation, or a 6-tuple wmmat
    (ROTZOOM/affine) projected at the block center."""
    from svt_av1_tpu.codec import constants as cc
    if model is None:
        return (0, 0)
    if len(model) == 2:
        return tuple(model)
    mat = model
    bw = int(cc.block_size_wide[bsize])
    bh = int(cc.block_size_high[bsize])
    x = c4 * 4 + bw // 2 - 1
    y = r4 * 4 + bh // 2 - 1
    xc = (mat[2] - (1 << 16)) * x + mat[3] * y + mat[0]
    yc = mat[4] * x + (mat[5] - (1 << 16)) * y + mat[1]
    shift = 13 if allow_hp else 14
    scale = 1 if allow_hp else 2

    def rpot_s(v, n):
        m = (abs(v) + (1 << (n - 1))) >> n
        return -m if v < 0 else m

    return (rpot_s(yc, shift) * scale, rpot_s(xc, shift) * scale)


@dataclasses.dataclass
class MvStackComp:
    """Compound reference-MV stack: entries are MV pairs."""
    pairs: List[Tuple[Tuple[int, int], Tuple[int, int]]]
    weights: List[int]
    count: int
    mode_context: int

    def drl_ctx(self, idx: int) -> int:
        w0 = self.weights[idx]
        w1 = self.weights[idx + 1]
        if w0 >= REF_CAT_LEVEL:
            return 0 if w1 >= REF_CAT_LEVEL else 1
        return 2 if w1 < REF_CAT_LEVEL else 0


def find_mv_stack_comp(grid: MiGrid, mi_row: int, mi_col: int, bw4: int,
                       bh4: int, ref_pair, sb_mi: int = 16,
                       gm_mvs=((0, 0), (0, 0))) -> MvStackComp:
    """Compound-pair MV stack (spec 7.10.2 with rf[1] > NONE): the same
    neighbor traversal as the single-ref stack, matching blocks whose
    (ref, ref2) equals the pair; underfull stacks pad with the global
    pair then zeros."""
    ref0, ref1 = ref_pair
    st_pairs: List[Tuple] = []
    st_w: List[int] = []

    def stack_add(pair, len_, weight):
        for i, p in enumerate(st_pairs):
            if p == pair:
                st_w[i] += weight * len_
                return
        if len(st_pairs) < MAX_REF_MV_STACK_SIZE:
            st_pairs.append(pair)
            st_w.append(weight * len_)

    mi_rows, mi_cols = grid.mi_rows, grid.mi_cols
    up = mi_row > 0
    left = mi_col > 0
    max_row_offset = max(-(MVREF_ROWS << 1), -mi_row) if up else 0
    max_col_offset = max(-(MVREF_ROWS << 1), -mi_col) if left else 0
    counts = dict(row_match=0, col_match=0, newmv=0)

    def add_candidate(r, c, len_, weight, which):
        if (int(grid.ref_frame[r, c]) != ref0
                or int(grid.ref2[r, c]) != ref1):
            return
        p0 = (int(grid.mv[r, c, 0]), int(grid.mv[r, c, 1]))
        p1 = (int(grid.mv2[r, c, 0]), int(grid.mv2[r, c, 1]))
        if grid.mode[r, c] == GLOBALMV:
            p0, p1 = tuple(gm_mvs[0]), tuple(gm_mvs[1])
        stack_add((p0, p1), len_, weight)
        if have_newmv(int(grid.mode[r, c])):
            counts["newmv"] += 1
        counts[which] += 1

    def scan_row(row_offset):
        end_mi = min(bw4, mi_cols - mi_col, 16)
        col_off = 1 if abs(row_offset) > 1 else 0
        i = 0
        while i < end_mi:
            r = mi_row + row_offset
            c = mi_col + col_off + i
            cw4 = int(grid.w4[r, c])
            len_ = min(bw4, cw4)
            if abs(row_offset) > 1:
                len_ = max(len_, 2)
            add_candidate(r, c, len_, 2, "row_match")
            i += len_

    def scan_col(col_offset):
        end_mi = min(bh4, mi_rows - mi_row, 16)
        row_off = 1 if abs(col_offset) > 1 else 0
        i = 0
        while i < end_mi:
            r = mi_row + row_off + i
            c = mi_col + col_offset
            ch4 = int(grid.h4[r, c])
            len_ = min(bh4, ch4)
            if abs(col_offset) > 1:
                len_ = max(len_, 2)
            add_candidate(r, c, len_, 2, "col_match")
            i += len_

    if abs(max_row_offset) >= 1:
        scan_row(-1)
    if abs(max_col_offset) >= 1:
        scan_col(-1)
    if _has_top_right(mi_row, mi_col, bw4, bh4, sb_mi, mi_cols):
        r, c = mi_row - 1, mi_col + bw4
        if 0 <= c < mi_cols:
            add_candidate(r, c, 2, 2, "row_match")

    nearest_match = (counts["row_match"] > 0) + (counts["col_match"] > 0)
    newmv_count = counts["newmv"]
    st_w[:] = [w + REF_CAT_LEVEL for w in st_w]

    if mi_row > 0 and mi_col > 0:
        add_candidate(mi_row - 1, mi_col - 1, 2, 2, "row_match")
    for idx in range(2, MVREF_ROWS + 1):
        off = -(idx << 1) + 1
        if abs(off) <= abs(max_row_offset):
            scan_row(off)
        if abs(off) <= abs(max_col_offset):
            scan_col(off)

    ref_match_count = (counts["row_match"] > 0) + (counts["col_match"] > 0)
    mode_context = 0
    if nearest_match == 0:
        if ref_match_count >= 1:
            mode_context |= 1
        if ref_match_count == 1:
            mode_context |= (1 << REFMV_OFFSET)
        elif ref_match_count >= 2:
            mode_context |= (2 << REFMV_OFFSET)
    elif nearest_match == 1:
        mode_context |= 2 if newmv_count > 0 else 3
        if ref_match_count == 1:
            mode_context |= (3 << REFMV_OFFSET)
        elif ref_match_count >= 2:
            mode_context |= (4 << REFMV_OFFSET)
    else:
        mode_context |= 4 if newmv_count >= 1 else 5
        mode_context |= (5 << REFMV_OFFSET)

    # weight sort (stable bubble, as single-ref)
    n = len(st_pairs)
    ln = n
    while ln > 0:
        nr = 0
        for i in range(1, ln):
            if st_w[i - 1] < st_w[i]:
                st_pairs[i - 1], st_pairs[i] = st_pairs[i], st_pairs[i - 1]
                st_w[i - 1], st_w[i] = st_w[i], st_w[i - 1]
                nr = i
        ln = nr

    while len(st_pairs) < MAX_MV_REF_CANDIDATES:
        pad = (tuple(gm_mvs[0]), tuple(gm_mvs[1]))
        if pad in st_pairs:
            pad = ((0, 0), (0, 0))
        if pad in st_pairs:
            pad = ((0, 0), (0, 2 * (len(st_pairs) + 1)))
        st_pairs.append(pad)
        st_w.append(2)

    # clamp both MVs of every pair (same rule as the single-ref stack)
    bw_px, bh_px = bw4 * 4, bh4 * 4
    to_left = -(mi_col * 4 * 8)
    to_right = (mi_cols - bw4 - mi_col) * 4 * 8
    to_top = -(mi_row * 4 * 8)
    to_bottom = (mi_rows - bh4 - mi_row) * 4 * 8

    def cl(mv):
        r = _clamp(mv[0], to_top - bh_px * 8 - MV_BORDER,
                   to_bottom + bh_px * 8 + MV_BORDER)
        c = _clamp(mv[1], to_left - bw_px * 8 - MV_BORDER,
                   to_right + bw_px * 8 + MV_BORDER)
        return (r, c)

    st_pairs = [(cl(p0), cl(p1)) for (p0, p1) in st_pairs]
    return MvStackComp(pairs=st_pairs, weights=st_w,
                       count=max(len(st_pairs), 2),
                       mode_context=mode_context)
