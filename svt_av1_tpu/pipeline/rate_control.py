"""Rate control (host): CRF/CQP plus reactive 1-pass VBR/CBR.

Reference behavior surface: rc_process.c (qindex selection per frame,
bits-per-frame targeting, buffer model) — Docs/Appendix-Rate-Control.md.
Round-1 scope: all-intra streams.  CRF maps qp -> qindex directly; VBR
and CBR run a leaky-bucket controller that adapts the next frame's
base_q_idx from the realized bitrate (TPL-driven boosts land with the
lookahead stage)."""
from __future__ import annotations

import dataclasses

import numpy as np


def qp_to_qindex(qp: int) -> int:
    return min(255, max(1, qp * 4))


@dataclasses.dataclass
class RateControlState:
    mode: int                 # 0 = CQP/CRF, 1 = VBR, 2 = CBR
    target_bits_per_frame: float
    qindex: int
    min_qindex: int = 4
    max_qindex: int = 255
    buffer_bits: float = 0.0   # accumulated (actual - target)
    # CBR reacts faster and bounds the buffer harder
    gain: float = 0.04

    @classmethod
    def create(cls, cfg, fps: float):
        qindex = qp_to_qindex(cfg.qp)
        tbr = max(cfg.target_bit_rate, 1)
        mode = cfg.rate_control_mode
        return cls(mode=mode,
                   target_bits_per_frame=tbr / max(fps, 1e-6),
                   qindex=qindex,
                   min_qindex=max(4, cfg.min_qp_allowed * 4),
                   max_qindex=min(255, cfg.max_qp_allowed * 4),
                   gain=0.08 if mode == 2 else 0.03)

    def frame_qindex(self) -> int:
        return int(np.clip(self.qindex, self.min_qindex, self.max_qindex))

    def update(self, frame_bits: int):
        """Feedback after packetization (the reference's
        RC_PACKETIZATION_FEEDBACK_RESULT path)."""
        if self.mode == 0:
            return
        if getattr(self, "two_pass_q", None) is not None:
            return  # 2nd pass: per-frame q comes from the stats plan
        err = frame_bits - self.target_bits_per_frame
        self.buffer_bits += err
        # proportional on the frame error + integral on the buffer
        adj = (self.gain * err / max(self.target_bits_per_frame, 1.0)
               + 0.5 * self.gain * self.buffer_bits
               / max(self.target_bits_per_frame, 1.0))
        self.qindex = int(np.clip(self.qindex + 24 * np.tanh(adj),
                                  self.min_qindex, self.max_qindex))
        # CBR: clamp the buffer to one second of bits
        if self.mode == 2:
            cap = self.target_bits_per_frame * 30
            self.buffer_bits = float(np.clip(self.buffer_bits, -cap, cap))


# ---------------------------------------------------------------------------
# 2-pass VBR (reference: firstpass.c stats + pass2_strategy.c allocation)
# ---------------------------------------------------------------------------

STATS_MAGIC = b"SVTTPU1P"


def pack_first_pass_stats(entries) -> bytes:
    """entries: list of (frame_bits, qindex, is_key).  The first-pass
    analog of FIRSTPASS_STATS (firstpass.h), serialized for
    rc_stats_buffer."""
    arr = np.array(entries, dtype=np.float64)
    return STATS_MAGIC + arr.tobytes()


def unpack_first_pass_stats(buf: bytes) -> np.ndarray:
    assert buf[:8] == STATS_MAGIC, "bad first-pass stats buffer"
    return np.frombuffer(buf[8:], dtype=np.float64).reshape(-1, 3)


def plan_second_pass(stats: np.ndarray, target_bit_rate: float,
                     fps: float, min_q: int = 4, max_q: int = 255
                     ) -> np.ndarray:
    """Per-frame qindex plan from first-pass complexity.

    Bit allocation proportional to first-pass bits (complexity proxy),
    inverted through the R ~ 1/qstep model around the first-pass
    operating point (the pass2_strategy.c group-allocation analog,
    flattened to per-frame for the round-1 IPPP structure)."""
    from svt_av1_tpu.ops.quant import ac_q
    n = len(stats)
    total_budget = target_bit_rate / max(fps, 1e-6) * n
    bits1 = np.maximum(stats[:, 0], 1.0)
    q1 = stats[:, 1].astype(np.int32)
    # proportional allocation with a mild flattening exponent (avoids
    # starving easy frames entirely)
    share = bits1 ** 0.75
    target = total_budget * share / share.sum()
    qsteps1 = np.array([ac_q(int(q), bd=8) for q in q1], np.float64)
    # R ~ c / qstep  =>  qstep2 = qstep1 * bits1 / target
    qstep2 = qsteps1 * bits1 / np.maximum(target, 1.0)
    # invert qstep -> qindex by table search
    table = np.array([ac_q(i, bd=8) for i in range(256)], np.float64)
    plan = np.searchsorted(table, qstep2).clip(min_q, max_q)
    return plan.astype(np.int32)
