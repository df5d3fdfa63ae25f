#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

North star (BASELINE.md): >= 30 fps 1080p all-intra Main encode per chip.
Until the encoder reaches that config, the headline metric tracks the
decode path (bit-exact all-intra decode throughput at 1080p).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
TESTDATA = os.path.join(REPO, "testdata")
ORACLE_ENC = os.path.join(REPO, ".oracle", "bin", "TAppEncoder")


def ensure_stream():
    clip = os.path.join(TESTDATA, "bench_1080p.yuv")
    stream = os.path.join(TESTDATA, "bench_1080p.bin")
    os.makedirs(TESTDATA, exist_ok=True)
    if not os.path.exists(stream):
        if not os.path.exists(clip):
            subprocess.run([sys.executable,
                            os.path.join(REPO, "tools", "make_test_clip.py"),
                            clip, "--width", "1920", "--height", "1080",
                            "--frames", "4"], check=True,
                           capture_output=True)
        if not os.path.exists(ORACLE_ENC):
            subprocess.run([os.path.join(REPO, "tools", "build_oracle.sh")],
                           check=True, capture_output=True)
        subprocess.run([ORACLE_ENC,
                        "-c", "/root/reference/cfg/encoder_intra_main.cfg",
                        "-i", clip, "-wdt", "1920", "-hgt", "1080",
                        "-f", "4", "-fr", "30", "-b", stream,
                        "-o", "/dev/null", "--SEIpictureDigest=1"],
                       check=True, capture_output=True)
    return stream


def main():
    stream = ensure_stream()
    from thevc_tpu.decoder.top import Decoder

    data = open(stream, "rb").read()
    # warm-up (compile caches etc.)
    Decoder().decode_stream(data)
    t0 = time.time()
    pics = Decoder().decode_stream(data)
    dt = time.time() - t0
    assert all(p.digest_ok for p in pics), "bit-exactness failure in bench"
    fps = len(pics) / dt
    print(json.dumps({
        "metric": "1080p_allintra_decode_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
