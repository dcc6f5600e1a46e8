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
