"""Native decode core: build + ctypes bindings.

The shared library is compiled on first use with g++ (no pybind11 in the
image; plain C ABI + ctypes).  The CABAC tables are generated from
cabac/tables.py so there is a single source of truth.

Set THEVC_NATIVE=0 to disable (pure-Python paths remain bit-exact).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "codec_core.so"
_SRC = _DIR / "codec_core.cpp"
_HDR = _DIR / "tables_gen.h"

_lib = None
_tried = False


def _gen_tables_header() -> None:
    from ..cabac import tables as T

    def arr2d(name, a):
        rows = ",\n  ".join(
            "{" + ",".join(str(int(v)) for v in row) + "}" for row in a)
        return (f"static const uint8_t {name}[{a.shape[0]}]"
                f"[{a.shape[1]}] = {{\n  {rows}}};\n")

    def arr1d(name, a):
        vals = ",".join(str(int(v)) for v in a)
        return f"static const uint8_t {name}[{len(a)}] = {{{vals}}};\n"

    with open(_HDR, "w") as fh:
        fh.write("// generated from thevc_tpu/cabac/tables.py — do not edit\n")
        fh.write(arr2d("kLPS", np.asarray(T.LPS_TABLE)))
        fh.write(arr1d("kRenorm", np.asarray(T.RENORM_TABLE)))
        fh.write(arr1d("kNextMPS", np.asarray(T.NEXT_STATE_MPS)))
        fh.write(arr1d("kNextLPS", np.asarray(T.NEXT_STATE_LPS)))


def _build() -> bool:
    try:
        _gen_tables_header()
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               str(_SRC), "-o", str(_SO)]
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


class BsEngine(ctypes.Structure):
    _fields_ = [
        ("buf", ctypes.c_char_p),
        ("buf_len", ctypes.c_int64),
        ("idx", ctypes.c_int64),
        ("held", ctypes.c_uint64),
        ("num_held", ctypes.c_int32),
        ("num_bits_read", ctypes.c_int64),
        ("range", ctypes.c_int32),
        ("value", ctypes.c_int64),
        ("bits_needed", ctypes.c_int32),
        ("overflow", ctypes.c_int32),
    ]


class AvailMaps(ctypes.Structure):
    _fields_ = [
        ("order", ctypes.c_void_p),
        ("in_pic", ctypes.c_void_p),
        ("ctu", ctypes.c_void_p),
        ("tile", ctypes.c_void_p),
        ("sstart", ctypes.c_void_p),
        ("pad", ctypes.c_int32),
        ("w", ctypes.c_int32),
        ("uw", ctypes.c_int32),
    ]


class IntraParams(ctypes.Structure):
    _fields_ = [
        ("stride", ctypes.c_int32),
        ("cstride", ctypes.c_int32),
        ("unit", ctypes.c_int32),
        ("avail_div", ctypes.c_int32),
        ("is_luma", ctypes.c_int32),
        ("dc_val", ctypes.c_int32),
        ("max_val", ctypes.c_int32),
        ("bit_inc", ctypes.c_int32),
        ("dct4", ctypes.c_void_p),
        ("dct8", ctypes.c_void_p),
        ("dct16", ctypes.c_void_p),
        ("dct32", ctypes.c_void_p),
        ("dst4", ctypes.c_void_p),
        ("pcm_plane", ctypes.c_void_p),
        ("pcm_stride", ctypes.c_int32),
    ]


class CoeffCtxOffsets(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in
                ("o_last_x", "o_last_y", "o_sig", "o_sig_cg", "o_one",
                 "o_abs", "num_sig_luma")]


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("THEVC_NATIVE", "1") == "0":
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.parse_coeff_nxn.restype = ctypes.c_int
        lib.parse_coeff_nxn.argtypes = [
            ctypes.POINTER(BsEngine), ctypes.c_void_p,
            ctypes.POINTER(CoeffCtxOffsets),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.intra_recon_tus.restype = None
        lib.intra_recon_tus.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(AvailMaps), ctypes.POINTER(IntraParams)]
        lib.deblock_luma.restype = None
        lib.deblock_luma.argtypes = [ctypes.c_void_p] + \
            [ctypes.c_int] * 2 + [ctypes.c_void_p] * 6 + [ctypes.c_int] * 6
        lib.deblock_chroma.restype = None
        lib.deblock_chroma.argtypes = [ctypes.c_void_p] * 2 + \
            [ctypes.c_int] * 2 + [ctypes.c_void_p] * 7 + [ctypes.c_int] * 5
        _lib = lib
    except Exception:
        _lib = None
    return _lib


_offsets_struct = None


def coeff_ctx_offsets() -> CoeffCtxOffsets:
    global _offsets_struct
    if _offsets_struct is None:
        from ..cabac import contexts as cc
        _offsets_struct = CoeffCtxOffsets(
            cc.O_LAST_X, cc.O_LAST_Y, cc.O_SIG, cc.O_SIG_CG, cc.O_ONE,
            cc.O_ABS, cc.NUM_SIG_FLAG_CTX_LUMA)
    return _offsets_struct
