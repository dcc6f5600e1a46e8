"""EbSvtAv1Enc-compatible C ABI (svt_av1_tpu/native/capi.c): build the
shim + a pure-C client and run one encode through the embedded Python
pipeline (the ffmpeg/gstreamer integration surface, reference
Source/API/EbSvtAv1Enc.h:951-1061)."""
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


API_DIR = os.environ.get("SVT_AV1_API_DIR",
                         "/root/reference/Source/API")


@pytest.mark.skipif(shutil.which("gcc") is None, reason="needs gcc")
@pytest.mark.skipif(not os.path.isfile(
    os.path.join(API_DIR, "EbSvtAv1Enc.h")),
    reason="reference public headers not installed")
def test_capi_encode_roundtrip(tmp_path):
    """Client compiled against the REFERENCE EbSvtAv1Enc.h (the
    ffmpeg-plugin surface) must work against the TPU shim binary."""
    subprocess.run(["sh", os.path.join(ROOT, "tools/build_capi.sh")],
                   check=True, capture_output=True)
    exe = str(tmp_path / "capi_test")
    subprocess.run(
        ["gcc", os.path.join(ROOT, "tools/test_capi.c"), "-o", exe,
         "-I", API_DIR,
         "-L", os.path.join(ROOT, "svt_av1_tpu/native"),
         "-lSvtAv1EncTpu",
         f"-Wl,-rpath,{os.path.join(ROOT, 'svt_av1_tpu/native')}"],
        check=True, capture_output=True)
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    r = subprocess.run([exe], env=env, capture_output=True, text=True,
                       timeout=280)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "CAPI OK" in r.stdout
