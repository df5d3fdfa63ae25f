"""Pallas residual kernel: bit-exactness vs the numpy reference and an
end-to-end digest-exact decode with the Pallas path forced.

On the CPU CI mesh the kernel runs in Pallas interpret mode (the Mosaic-
compiled path is exercised on real TPU hardware by the bench); both share
the same kernel body, so structural regressions fail here.
"""

import numpy as np
import pytest

from tests.conftest import TESTDATA


@pytest.mark.parametrize("size,use_dst,bit_inc", [
    (4, False, 0), (4, True, 0), (8, False, 0), (16, False, 0),
    (32, False, 0), (4, True, 2), (8, False, 2), (32, False, 2),
])
def test_pallas_residual_parity(size, use_dst, bit_inc):
    from thevc_tpu.ops import transforms as tops
    from thevc_tpu.ops import jx_pallas
    rng = np.random.RandomState(size + bit_inc)
    for n in (64, 129):          # exercises the lane-padding path
        q = rng.randint(-32768, 32768, (n, size, size)).astype(np.int16)
        qp = rng.randint(0, 64, n).astype(np.int32)
        ref = tops.inverse_transform(
            tops.dequant(q.astype(np.int32), qp, bit_inc),
            use_dst, bit_inc).astype(np.int16)
        got = np.asarray(jx_pallas.residual_pipeline_planar(
            q, qp, use_dst, bit_inc, interpret=True))
        assert np.array_equal(got, ref)


@pytest.mark.parametrize("size,bit_inc", [(4, 0), (8, 0), (16, 0),
                                          (32, 0), (8, 2), (64, 2)])
def test_pallas_satd_sweep_parity(size, bit_inc):
    from thevc_tpu.encoder.rdcost import calc_had_batched
    from thevc_tpu.ops import jx_pallas
    rng = np.random.RandomState(size + bit_inc)
    hi = 256 << bit_inc
    org = rng.randint(0, hi, (size, size)).astype(np.int32)
    preds = rng.randint(0, hi, (35, size, size)).astype(np.int32)
    ref = np.asarray(calc_had_batched(org, preds, bit_inc))
    got = np.asarray(jx_pallas.satd_sweep_planar(org, preds, bit_inc,
                                                 interpret=True))
    assert np.array_equal(got, ref)


def test_pallas_device_decode_digest_exact(golden_intra_stream, tmp_path,
                                           monkeypatch):
    """E2E: all-intra decode with THEVC_DEVICE=1 and the Pallas residual
    kernel forced — recon byte-identical to the HM encoder's."""
    import contextlib
    import io
    from thevc_tpu.apps.decoder import main as decoder_main
    from thevc_tpu.ops import device
    monkeypatch.setenv("THEVC_DEVICE", "1")
    monkeypatch.setenv("THEVC_PALLAS", "1")
    device.reset_cache()
    try:
        out = tmp_path / "pallas.yuv"
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = decoder_main(["-b", str(golden_intra_stream["bin"]),
                               "-o", str(out)])
        assert rc == 0
        log = buf.getvalue()
        assert log.count("(OK)") == golden_intra_stream["frames"]
        assert out.read_bytes() == golden_intra_stream["rec"].read_bytes()
    finally:
        device.reset_cache()
