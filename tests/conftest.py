"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so multi-chip sharding logic
(jax.sharding.Mesh over tp/dp axes) is exercised without TPU hardware.
Set THEVC_TEST_TPU=1 to run on the real device instead.
"""

import os

if not os.environ.get("THEVC_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import subprocess

import pytest

# The axon TPU plugin's register() (sitecustomize) force-sets the
# jax_platforms CONFIG to "axon,cpu", which beats the env var — any
# jax.devices() call then initializes the axon backend and claims (or,
# when the tunnel is down, hangs on) the remote TPU.  Re-pin the config
# to cpu-only BEFORE the first backend init so the suite is hermetic.
if not os.environ.get("THEVC_TEST_TPU"):
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE_BIN = REPO / ".oracle" / "bin"
TESTDATA = REPO / "testdata"


def have_oracle() -> bool:
    return (ORACLE_BIN / "TAppEncoder").exists()


@pytest.fixture(scope="session")
def oracle():
    """Paths to the HM reference binaries (built by tools/build_oracle.sh)."""
    if not have_oracle():
        pytest.skip("HM oracle not built (run tools/build_oracle.sh)")
    return ORACLE_BIN


@pytest.fixture(scope="session")
def test_clip():
    """Deterministic synthetic 416x240 clip, 8 frames."""
    TESTDATA.mkdir(exist_ok=True)
    clip = TESTDATA / "clip_416x240.yuv"
    if not clip.exists():
        subprocess.run(
            ["python", str(REPO / "tools" / "make_test_clip.py"), str(clip),
             "--width", "416", "--height", "240", "--frames", "8"],
            check=True)
    return clip


def ensure_clip(name: str, width: int, height: int, frames: int):
    """Create (if missing) a deterministic synthetic clip in testdata/.

    Shared clips like clip_96x80_9f.yuv are used across test modules;
    every user must call this so tests stay order-independent."""
    TESTDATA.mkdir(exist_ok=True)
    clip = TESTDATA / name
    if not clip.exists():
        subprocess.run(
            ["python", str(REPO / "tools" / "make_test_clip.py"), str(clip),
             "--width", str(width), "--height", str(height),
             "--frames", str(frames)],
            check=True)
    return clip


def oracle_encode(cfg: str, clip, out_bin, out_rec, frames=2, extra=()):
    """Run the HM oracle encoder with the given base cfg."""
    cmd = [str(ORACLE_BIN / "TAppEncoder"),
           "-c", f"/root/reference/cfg/{cfg}",
           "-i", str(clip), "-wdt", "416", "-hgt", "240",
           "-f", str(frames), "-fr", "30",
           "-b", str(out_bin), "-o", str(out_rec),
           "--SEIpictureDigest=1", *extra]
    subprocess.run(cmd, check=True, capture_output=True)


@pytest.fixture(scope="session")
def golden_intra_stream(oracle, test_clip):
    """HM-encoded all-intra Main stream + reconstruction (2 frames, QP32)."""
    out_bin = TESTDATA / "intra_main_q32.bin"
    out_rec = TESTDATA / "intra_main_q32_rec.yuv"
    if not out_bin.exists() or not out_rec.exists():
        oracle_encode("encoder_intra_main.cfg", test_clip, out_bin, out_rec)
    return {"bin": out_bin, "rec": out_rec, "width": 416, "height": 240,
            "frames": 2}


@pytest.fixture(scope="session")
def test_clip_small(oracle):
    """Deterministic synthetic 176x144 clip, 9 frames (inter configs)."""
    TESTDATA.mkdir(exist_ok=True)
    clip = TESTDATA / "clip_176x144_9f.yuv"
    if not clip.exists():
        subprocess.run(
            ["python", str(REPO / "tools" / "make_test_clip.py"), str(clip),
             "--width", "176", "--height", "144", "--frames", "9"],
            check=True)
    return clip


def oracle_encode_small(cfg: str, clip, out_bin, frames=9, extra=()):
    cmd = [str(ORACLE_BIN / "TAppEncoder"),
           "-c", f"/root/reference/cfg/{cfg}",
           "-i", str(clip), "-wdt", "176", "-hgt", "144",
           "-f", str(frames), "-fr", "30",
           "-b", str(out_bin), "-o", "/dev/null",
           "--SEIpictureDigest=1", *extra]
    subprocess.run(cmd, check=True, capture_output=True)
