#!/bin/sh
# Build the reference SVT-AV1 C library as the bit-exactness test
# oracle (tests/oracle.py). Two quirks of the reference build:
#   * CMAKE_C_VISIBILITY_PRESET=hidden hides every internal kernel the
#     oracle tests call -> strip the flag from the generated makefiles
#     (re-running cmake would restore it, so sed the .make files only);
#   * the output dir is hardcoded to ${source}/Bin -> redirect it so
#     nothing is written under /root/reference.
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/svtoracle}
rm -rf "$OUT" && mkdir -p "$OUT" && cd "$OUT"
cmake "$REF" -DCMAKE_BUILD_TYPE=Release -DCOMPILE_C_ONLY=ON \
      -DBUILD_APPS=OFF -DBUILD_TESTING=OFF > cmake.log 2>&1
grep -rl "$REF/Bin" . --include='*.make' --include='link.txt' \
    --include='*.cmake' | xargs sed -i "s#$REF/Bin#$OUT/Bin#g"
grep -rl 'fvisibility=hidden' . --include='*.make' \
    | xargs sed -i 's/-fvisibility=hidden//g'
# the redirected output dir is not created by the patched makefiles;
# without it the final link fails on a clean machine
mkdir -p "$OUT/Bin/Release"
make -j"$(nproc)" SvtAv1Enc -B > make.log 2>&1
echo "oracle: $OUT/Bin/Release/libSvtAv1Enc.so"
nm -D "$OUT"/Bin/Release/libSvtAv1Enc.so.* | grep -c ' T ' \
    | sed 's/^/exported kernels: /'
