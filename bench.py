#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

North star (BASELINE.md): >= 30 fps 1080p all-intra Main encode per chip.
The headline metric is now the true north star: 1080p all-intra encode
throughput, with the output stream verified BYTE-EXACT against the HM
reference encoder (so the speed is measured at full conformance).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
TESTDATA = os.path.join(REPO, "testdata")
ORACLE_ENC = os.path.join(REPO, ".oracle", "bin", "TAppEncoder")
FRAMES = 4


def ensure_inputs():
    clip = os.path.join(TESTDATA, "bench_1080p.yuv")
    stream = os.path.join(TESTDATA, "bench_1080p.bin")
    os.makedirs(TESTDATA, exist_ok=True)
    if not os.path.exists(clip):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_test_clip.py"),
                        clip, "--width", "1920", "--height", "1080",
                        "--frames", str(FRAMES)], check=True,
                       capture_output=True)
    if not os.path.exists(stream):
        if not os.path.exists(ORACLE_ENC):
            subprocess.run([os.path.join(REPO, "tools", "build_oracle.sh")],
                           check=True, capture_output=True)
        subprocess.run([ORACLE_ENC,
                        "-c", "/root/reference/cfg/encoder_intra_main.cfg",
                        "-i", clip, "-wdt", "1920", "-hgt", "1080",
                        "-f", str(FRAMES), "-fr", "30", "-b", stream,
                        "-o", "/dev/null", "--SEIpictureDigest=1"],
                       check=True, capture_output=True)
    return clip, stream


def main():
    clip, oracle_stream = ensure_inputs()
    from thevc_tpu.utils.cfg import parse_args
    from thevc_tpu.encoder.top import Encoder

    argv = ["-c", "/root/reference/cfg/encoder_intra_main.cfg",
            "-i", clip, "-wdt", "1920", "-hgt", "1080",
            "-f", str(FRAMES), "-fr", "30", "-b", "/dev/null",
            "-o", "/dev/null", "--SEIpictureDigest=1"]

    # warm-up (native build, caches)
    warm = Encoder(parse_args(
        argv[:1] + argv[1:2] + argv[2:]))  # fresh cfg
    warm.verbose = False
    wcfg = parse_args(argv)
    wcfg.frames_to_be_encoded = 1
    warm = Encoder(wcfg)
    warm.verbose = False
    warm.encode(None)

    cfg = parse_args(argv)
    enc = Encoder(cfg)
    enc.verbose = False
    t0 = time.time()
    stream = enc.encode(None)
    dt = time.time() - t0

    ref = open(oracle_stream, "rb").read()
    if os.path.exists(oracle_stream):
        assert stream == ref, "bench stream is not byte-exact vs HM"
    fps = FRAMES / dt
    print(json.dumps({
        "metric": "1080p_allintra_encode_fps_byte_exact_vs_HM",
        "value": round(fps, 4),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
