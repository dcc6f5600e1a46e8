#!/bin/sh
# Build the EbSvtAv1Enc-compatible C ABI shim (svt_av1_tpu/native/capi.c)
# into libSvtAv1EncTpu.so, linking the running Python for the embedded
# encoder pipeline.
#
# If the reference SVT-AV1 public headers are available
# ($SVT_AV1_API_DIR, default /root/reference/Source/API),
# tools/gen_capi_abi.py probes their struct layouts first and the shim
# builds BINARY-COMPATIBLE with downstream plugins compiled against
# stock EbSvtAv1Enc.h (REAL ABI mode).  Without them the shim builds
# with its compact standalone layout.
set -e
cd "$(dirname "$0")/.."
python3 tools/gen_capi_abi.py || true
CFLAGS=$(python3-config --includes)
LDFLAGS=$(python3-config --ldflags --embed 2>/dev/null \
          || python3-config --ldflags)
gcc -shared -fPIC -O2 $CFLAGS svt_av1_tpu/native/capi.c \
    -o svt_av1_tpu/native/libSvtAv1EncTpu.so $LDFLAGS
echo "built svt_av1_tpu/native/libSvtAv1EncTpu.so"
