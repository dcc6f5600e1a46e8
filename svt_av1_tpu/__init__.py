"""svt_av1_tpu — a TPU-native AV1 video encoder.

A from-scratch re-design of the capabilities of SVT-AV1 (reference:
/root/reference, v3.0.2) for TPU hardware:

  * Device side (JAX / XLA / Pallas): all per-pixel compute — transforms,
    quantization, intra/inter prediction, motion-search SAD reductions,
    in-loop filters — expressed as fixed-shape programs batched over the
    64x64 superblocks of a frame (and over frames / streams on a device
    mesh via ``jax.sharding``).
  * Host side (Python + C++): the inherently serial, bit-exact parts —
    the multi-symbol range coder, OBU syntax, CDF state, rate control,
    picture decision / DPB management — mirroring the public API surface
    of ``EbSvtAv1Enc.h`` (reference Source/API/EbSvtAv1Enc.h).

Layout:
  api/       EbSvtAv1Enc-compatible encoder API + configuration
  ops/       JAX / Pallas device kernels (transforms, quant, intra, SAD, ...)
  codec/     bit-exact host codec logic (range coder, CDFs, OBU, tiles)
  pipeline/  encoder orchestration (picture decision, RC, frame encode)
  parallel/  device-mesh scale-out (multi-stream batching, shard_map)
  utils/     y4m / IVF IO, bit IO, logging
  app/       CLI application (SvtAv1EncApp equivalent)
  native/    C++ host components (fast range coder loop)
"""

__version__ = "0.1.0"
