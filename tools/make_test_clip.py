#!/usr/bin/env python
"""Generate deterministic synthetic YUV 4:2:0 test clips.

No JCT-VC test sequences ship with the reference, so bit-exactness testing
uses synthetic content: smooth gradients (exercise planar/DC/angular intra),
textured noise regions (exercise RDOQ/coefficient coding), moving structures
(exercise motion search for inter configs), and sharp edges (deblocking).
"""

import argparse
import numpy as np


def make_frame_motion(w, h, t, bit_depth=8, seed=1234):
    """Moving-content frame: global pan + independently moving textured
    objects + a zooming checker — structured motion, minimal noise
    (VERDICT r04 item #2: quality evidence must include moving content,
    not just noise clips)."""
    maxv = (1 << bit_depth) - 1
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    # global pan (3.5, 1.25) px/frame over a smooth 2-D base
    gx, gy = xx - 3.5 * t, yy - 1.25 * t
    y = 0.45 * maxv + 0.22 * maxv * np.sin(gx * 0.017) * np.cos(gy * 0.023)
    y += 0.10 * maxv * np.sin((gx + gy) * 0.0061)

    # textured disc moving along a lissajous path (local motion)
    cx = w / 2 + 0.3 * w * np.sin(0.31 * t)
    cy = h / 2 + 0.3 * h * np.cos(0.23 * t)
    r2 = (xx - cx) ** 2 + (yy - cy) ** 2
    disc = r2 < (min(w, h) / 6.0) ** 2
    tex = 0.5 * maxv + 0.25 * maxv * np.sin((xx - cx) * 0.4) \
        * np.sin((yy - cy) * 0.4)
    y = np.where(disc, tex, y)

    # zooming checkerboard patch (scale change defeats pure translation)
    s = 8.0 * (1.0 + 0.04 * t)
    chk = ((xx // s + yy // s) % 2) * 0.3 * maxv + 0.35 * maxv
    my0, mx0 = int(h * 0.1), int(w * 0.6)
    my1, mx1 = min(h, my0 + h // 4), min(w, mx0 + w // 4)
    y[my0:my1, mx0:mx1] = chk[my0:my1, mx0:mx1]

    # sharp bar sweeping horizontally (occlusion + deblock stress)
    bx = int((0.05 * w + 6.3 * t) % (w - 12))
    y[:, bx:bx + 10] = 0.9 * maxv

    y = np.clip(np.rint(y), 0, maxv)
    cb = 0.5 * maxv + 0.18 * maxv * np.sin((xx[::2, ::2] - 3.5 * t) * 0.03)
    cr = 0.5 * maxv + 0.18 * maxv * np.cos((yy[::2, ::2] - 1.25 * t) * 0.025)
    cb = np.clip(np.rint(cb), 0, maxv)
    cr = np.clip(np.rint(cr), 0, maxv)
    return y, cb, cr


def make_frame(w, h, t, bit_depth=8, seed=1234):
    maxv = (1 << bit_depth) - 1
    rng = np.random.RandomState(seed + t)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    # diagonal gradient, drifting over time (global motion ~ (2,1) px/frame)
    y = 0.35 * maxv + 0.3 * maxv * ((xx - 2 * t) / w + (yy - t) / h)

    # moving sinusoidal texture
    y += 0.08 * maxv * np.sin((xx - 2 * t) * 0.35) * np.sin((yy - t) * 0.21)

    # sharp-edged moving square
    sq = min(48, w // 4, h // 4)
    sx, sy = (w // 4 + 3 * t) % max(w - sq - 1, 1), (h // 3 + 2 * t) % max(h - sq - 1, 1)
    y[sy:sy + sq, sx:sx + sq] = 0.8 * maxv

    # static textured band (film-grain-ish, same seed each frame => static)
    grain = np.random.RandomState(seed).randn(h // 4, w) * 0.03 * maxv
    y[3 * h // 4:3 * h // 4 + h // 4, :] += grain[: h - 3 * h // 4, :]

    # small amount of temporal noise
    y += rng.randn(h, w) * 0.004 * maxv

    y = np.clip(np.rint(y), 0, maxv)

    cb = 0.5 * maxv + 0.2 * maxv * np.sin((xx[::2, ::2] - 2 * t) * 0.02)
    cr = 0.5 * maxv + 0.2 * maxv * np.cos((yy[::2, ::2] - t) * 0.03)
    cb = np.clip(np.rint(cb), 0, maxv)
    cr = np.clip(np.rint(cr), 0, maxv)
    return y, cb, cr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--bit-depth", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--style", choices=("default", "motion"),
                    default="default")
    args = ap.parse_args()

    gen = make_frame_motion if args.style == "motion" else make_frame
    dtype = "<u2" if args.bit_depth > 8 else np.uint8
    with open(args.output, "wb") as f:
        for t in range(args.frames):
            y, cb, cr = gen(args.width, args.height, t,
                            args.bit_depth, args.seed)
            for plane in (y, cb, cr):
                f.write(plane.astype(dtype).tobytes())
    print(f"wrote {args.frames} frames {args.width}x{args.height} "
          f"{args.bit_depth}-bit to {args.output}")


if __name__ == "__main__":
    main()
