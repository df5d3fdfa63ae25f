"""Encoder CLI: python -m thevc_tpu.apps.encoder -c encoder_intra_main.cfg \
   -i in.yuv -b str.bin -o rec.yuv -wdt W -hgt H -f N -fr FPS

Behavioral reference: TAppEncoder/encmain.cpp + TAppEncTop.cpp.
"""

from __future__ import annotations

import sys

from ..encoder.top import Encoder
from ..utils.cfg import parse_args


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    cfg = parse_args(argv)
    if not cfg.input_file or not cfg.bitstream_file:
        print("usage: encoder -c cfg [-i in.yuv -b out.bin -o rec.yuv "
              "-wdt W -hgt H -f N -fr FPS]", file=sys.stderr)
        return 1
    enc = Encoder(cfg)
    enc.encode(cfg.bitstream_file)
    n = max(enc.frames_encoded, 1)
    fr = cfg.frame_rate or 30
    kbps = enc.total_bits * fr / n / 1000.0
    print(f"SUMMARY: {enc.frames_encoded} frames, {kbps:.4f} kbps, "
          f"Y-PSNR {enc.psnr_sums[0]/n:.4f} "
          f"U-PSNR {enc.psnr_sums[1]/n:.4f} "
          f"V-PSNR {enc.psnr_sums[2]/n:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
