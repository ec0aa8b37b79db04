"""H.264 end-to-end bit-exactness: our decoder vs the reference binary.

Randomized conformance streams (tests/streamgen/h264_enc.py), decoded by the
compiled reference (`h264dec -d 1 -o`) and by m2dec_tpu; cropped raw output
must match byte-for-byte. The DPB is capped at 1 and streams carry one
trailing dummy picture so all real frames flush before end-of-stream.
"""

import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from streamgen.h264_enc import H264IntraGen, H264StreamGen  # noqa: E402

from m2dec_tpu.codecs.h264.decoder import H264Decoder  # noqa: E402
from m2dec_tpu.runtime.output import cropped_nv12_bytes  # noqa: E402


def run_case(reference_bins, tmp_path, gen, pattern, n_real):
    data = gen.generate(pattern)
    src = tmp_path / "in.264"
    src.write_bytes(data)
    subprocess.run(
        [str(reference_bins["h264dec"]), "-d", "1", "-o", "in.264"],
        cwd=tmp_path, capture_output=True,
    )
    golden = (tmp_path / "in.out").read_bytes()
    dec = H264Decoder(dpb_max=1)
    dec.set_data(data)
    frames = dec.decode_all()
    ours = b"".join(cropped_nv12_bytes(f) for f in frames)
    fs = gen.w * gen.h * 3 // 2
    assert len(golden) >= n_real * fs
    assert ours[: len(golden)] == golden


@pytest.mark.parametrize("seed", range(2))
def test_ipcm(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path, H264StreamGen(48, 32, seed=seed), "III", 2)


@pytest.mark.parametrize("seed", range(4))
def test_intra_cavlc(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path, H264IntraGen(48, 32, seed=seed), "III", 2)


@pytest.mark.parametrize("seed", range(4))
def test_intra_deblock(reference_bins, tmp_path, seed):
    run_case(
        reference_bins, tmp_path,
        H264IntraGen(80, 48, seed=seed, qp=28, disable_deblock=False), "II", 1,
    )


def test_intra_cif(reference_bins, tmp_path):
    run_case(
        reference_bins, tmp_path,
        H264IntraGen(176, 144, seed=10, qp=30, disable_deblock=False), "II", 1,
    )


@pytest.mark.parametrize("qp,qpidx", [(44, 0), (33, -4), (33, 12), (24, 4)])
def test_intra_qp_range(reference_bins, tmp_path, qp, qpidx):
    run_case(
        reference_bins, tmp_path,
        H264IntraGen(64, 48, seed=8, qp=qp, chroma_qp_index=qpidx,
                     disable_deblock=False), "II", 1,
    )


from streamgen.h264_enc import H264InterGen  # noqa: E402


@pytest.mark.parametrize("seed", range(4))
def test_p_slices(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path, H264InterGen(48, 32, seed=seed), "IPPI", 3)


def test_p_umv(reference_bins, tmp_path):
    run_case(
        reference_bins, tmp_path,
        H264InterGen(48, 32, seed=9, mvd_range=200, skip_prob=0.1,
                     intra_prob=0), "IPPI", 3,
    )


def test_p_multiref(reference_bins, tmp_path):
    run_case(
        reference_bins, tmp_path,
        H264InterGen(64, 48, seed=5, num_ref_frames=4), "IPPPPI", 5,
    )


def test_p_deblock_cif(reference_bins, tmp_path):
    run_case(
        reference_bins, tmp_path,
        H264InterGen(176, 144, seed=7, num_ref_frames=2, qp=30,
                     disable_deblock=False), "IPPI", 3,
    )
