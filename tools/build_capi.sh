#!/bin/sh
# Build the EbSvtAv1Enc-compatible C ABI shim (svt_av1_tpu/native/capi.c)
# into libSvtAv1EncTpu.so, linking the running Python for the embedded
# encoder pipeline.
set -e
cd "$(dirname "$0")/.."
CFLAGS=$(python3-config --includes)
LDFLAGS=$(python3-config --ldflags --embed 2>/dev/null \
          || python3-config --ldflags)
gcc -shared -fPIC -O2 $CFLAGS svt_av1_tpu/native/capi.c \
    -o svt_av1_tpu/native/libSvtAv1EncTpu.so $LDFLAGS
echo "built svt_av1_tpu/native/libSvtAv1EncTpu.so"
