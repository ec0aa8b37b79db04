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


from streamgen.h264_enc import H264BGen  # noqa: E402


def run_case_b(reference_bins, tmp_path, gen, pattern, n_real):
    """B streams need the reference's auto DPB (h264dec ignores -d for lib
    init, h264.cpp:1219-1226 derives dpb from the level), so decode with
    dpb_max=-1 and compare the full reordered output prefix."""
    data = gen.generate(pattern)
    src = tmp_path / "in.264"
    src.write_bytes(data)
    subprocess.run(
        [str(reference_bins["h264dec"]), "-o", "in.264"],
        cwd=tmp_path, capture_output=True,
    )
    golden = (tmp_path / "in.out").read_bytes()
    dec = H264Decoder()
    dec.set_data(data)
    frames = dec.decode_all()
    ours = b"".join(cropped_nv12_bytes(f) for f in frames)
    fs = gen.w * gen.h * 3 // 2
    assert len(golden) >= n_real * fs
    assert ours[: len(golden)] == golden


@pytest.mark.parametrize("seed", range(3))
def test_b_explicit_partitions(reference_bins, tmp_path, seed):
    run_case_b(
        reference_bins, tmp_path,
        H264BGen(48, 32, seed=seed, skip_prob=0, intra_prob=0,
                 num_ref_frames=2), "IPBPB", 5,
    )


@pytest.mark.parametrize("seed", range(3))
def test_b_direct_spatial(reference_bins, tmp_path, seed):
    run_case_b(
        reference_bins, tmp_path,
        H264BGen(48, 32, seed=seed, skip_prob=0.25, intra_prob=0.15,
                 num_ref_frames=2, b_direct_prob=0.3, direct_spatial=1),
        "IPBPBB", 6,
    )


@pytest.mark.parametrize("seed", range(3))
def test_b_direct_temporal(reference_bins, tmp_path, seed):
    run_case_b(
        reference_bins, tmp_path,
        H264BGen(48, 32, seed=seed, skip_prob=0.2, intra_prob=0.1,
                 num_ref_frames=2, b_direct_prob=0.3, direct_spatial=0),
        "IPBPBB", 6,
    )


def test_b_cif_spatial(reference_bins, tmp_path):
    run_case_b(
        reference_bins, tmp_path,
        H264BGen(176, 144, seed=11, skip_prob=0.2, intra_prob=0.1,
                 num_ref_frames=4, b_direct_prob=0.3, direct_spatial=1,
                 qp=30), "IPBBPBBPB", 9,
    )


def test_b_cif_temporal_umv(reference_bins, tmp_path):
    run_case_b(
        reference_bins, tmp_path,
        H264BGen(176, 144, seed=12, skip_prob=0.15, intra_prob=0.05,
                 num_ref_frames=3, b_direct_prob=0.35, direct_spatial=0,
                 mvd_range=120), "IPBBPBB", 7,
    )


def test_b_after_idr(reference_bins, tmp_path):
    """B with a single ref in both lists, straight after the IDR; also
    covers the L1 col pages existing for every ref slot (init_mb_buffer,
    h264.cpp:539-544)."""
    run_case_b(
        reference_bins, tmp_path,
        H264BGen(48, 32, seed=3, skip_prob=0.2, intra_prob=0,
                 num_ref_frames=2, b_direct_prob=0.3), "IB", 2,
    )


class _BFutureGen(H264BGen):
    """Display order == decode order: every B's POC is above all refs, so
    L0 and L1 sort identically — pins the reference's dead is_same_list
    swap (h264.cpp:10977-10994)."""

    def generate(self, pattern="IPB"):
        out = bytearray()
        self._nal(out, 3, 7, self._sps)
        self._nal(out, 3, 8, self._pps)
        self.n_refs_avail = 0
        for disp, c in enumerate(pattern):
            self.poc_lsb = (disp * 2) % (1 << self.log2_max_poc_lsb)
            if c == "I":
                self.frame_num = 0
                self.poc_lsb = 0
                self._nal(out, 3, 5, lambda w: self._slice_I(w, idr=True))
                self.frame_num = 1
                self.n_refs_avail = 1
            elif c == "P":
                self._nal(out, 2, 1, lambda w: self._slice_P(w))
                self.frame_num = (self.frame_num + 1) % (1 << self.log2_max_frame_num)
                self.n_refs_avail = min(self.n_refs_avail + 1, self.num_ref_frames)
            else:
                self._nal(out, 0, 1, lambda w: self._slice_B(w))
        return bytes(out)


@pytest.mark.parametrize("spatial", [0, 1])
def test_b_identical_ref_lists(reference_bins, tmp_path, spatial):
    run_case_b(
        reference_bins, tmp_path,
        _BFutureGen(48, 32, seed=2, skip_prob=0.2, intra_prob=0,
                    num_ref_frames=2, b_direct_prob=0.3,
                    direct_spatial=spatial), "IPBB", 4,
    )


def test_single_mb_pictures(reference_bins, tmp_path):
    """16x16 (one MB per picture) streams; needs the set_dpb_max quirk
    chain (int16 level table x int/uint32 division x int8 store,
    h264.cpp:1219-1226 + h264.h:151). Level 3.0 keeps the reference out
    of its max=0 heap-corruption domain."""
    gen = H264IntraGen(16, 16, seed=0, qp=30, disable_deblock=False)
    gen.level_idc = 30
    run_case_b(reference_bins, tmp_path, gen, "III", 3)


from streamgen.h264_enc import H264CabacIGen  # noqa: E402


@pytest.mark.parametrize("seed", range(4))
def test_cabac_intra(reference_bins, tmp_path, seed):
    run_case_b(reference_bins, tmp_path,
               H264CabacIGen(48, 32, seed=seed), "III", 3)


@pytest.mark.parametrize("seed", range(2))
def test_cabac_intra_deblock(reference_bins, tmp_path, seed):
    run_case_b(
        reference_bins, tmp_path,
        H264CabacIGen(80, 48, seed=seed, qp=28, disable_deblock=False),
        "II", 2,
    )


def test_cabac_intra_cif(reference_bins, tmp_path):
    run_case_b(
        reference_bins, tmp_path,
        H264CabacIGen(176, 144, seed=20, qp=30, disable_deblock=False),
        "II", 2,
    )


@pytest.mark.parametrize("qp,qpidx", [(44, 0), (33, -4), (24, 4)])
def test_cabac_intra_qp_range(reference_bins, tmp_path, qp, qpidx):
    run_case_b(
        reference_bins, tmp_path,
        H264CabacIGen(64, 48, seed=7, qp=qp, chroma_qp_index=qpidx,
                      disable_deblock=False), "II", 2,
    )


# -- CABAC P/B via the CAVLC->CABAC transcoder -------------------------
import random  # noqa: E402

from streamgen.h264_transcode import transcode_to_cabac  # noqa: E402


class _TGen:
    """Wrap a CAVLC generator: generate() returns the CABAC transcode."""

    def __init__(self, base, rng_seed=0):
        self.base = base
        self.w, self.h = base.w, base.h
        self.rng_seed = rng_seed

    def generate(self, pattern):
        return transcode_to_cabac(self.base.generate(pattern),
                                  random.Random(self.rng_seed))


def run_case_cabac_tc(reference_bins, tmp_path, base, pattern, n_real):
    """Differential vs the reference AND semantic round-trip vs the
    original CAVLC stream (guards against both decoders desyncing
    identically on a broken transcode)."""
    cavlc = base.generate(pattern)
    data = transcode_to_cabac(cavlc, random.Random(0))
    src = tmp_path / "in.264"
    src.write_bytes(data)
    subprocess.run(
        [str(reference_bins["h264dec"]), "-o", "in.264"],
        cwd=tmp_path, capture_output=True,
    )
    golden = (tmp_path / "in.out").read_bytes()
    dec = H264Decoder()
    dec.set_data(data)
    ours = b"".join(cropped_nv12_bytes(f) for f in dec.decode_all())
    fs = base.w * base.h * 3 // 2
    assert len(golden) >= n_real * fs
    assert ours[: len(golden)] == golden
    d1 = H264Decoder()
    d1.set_data(cavlc)
    orig = b"".join(cropped_nv12_bytes(f) for f in d1.decode_all())
    assert ours == orig, "transcode changed reconstruction"


@pytest.mark.parametrize("seed", range(2))
def test_cabac_p_slices(reference_bins, tmp_path, seed):
    run_case_cabac_tc(
        reference_bins, tmp_path,
        H264InterGen(48, 32, seed=seed, skip_prob=0.2), "IPPI", 4)


def test_cabac_p_multiref_ref0(reference_bins, tmp_path):
    run_case_cabac_tc(
        reference_bins, tmp_path,
        H264InterGen(64, 48, seed=5, num_ref_frames=4), "IPPPPI", 6)


@pytest.mark.parametrize("spatial", [0, 1])
def test_cabac_b_slices(reference_bins, tmp_path, spatial):
    run_case_cabac_tc(
        reference_bins, tmp_path,
        H264BGen(48, 32, seed=spatial, skip_prob=0.25, intra_prob=0.15,
                 num_ref_frames=2, b_direct_prob=0.3,
                 direct_spatial=spatial), "IPBPBB", 6)


def test_cabac_b_cif(reference_bins, tmp_path):
    run_case_cabac_tc(
        reference_bins, tmp_path,
        H264BGen(176, 144, seed=11, skip_prob=0.2, intra_prob=0.1,
                 num_ref_frames=4, b_direct_prob=0.3, direct_spatial=1,
                 qp=30), "IPBBPBB", 7)


# -- High profile (transform_8x8_mode) ---------------------------------
from streamgen.h264_enc import H264HighGen  # noqa: E402


@pytest.mark.parametrize("seed", range(3))
def test_high_i8x8(reference_bins, tmp_path, seed):
    run_case_b(reference_bins, tmp_path,
               H264HighGen(48, 32, seed=seed, intra_prob=0, skip_prob=0),
               "II", 2)


@pytest.mark.parametrize("seed", range(2))
def test_high_p(reference_bins, tmp_path, seed):
    run_case_b(reference_bins, tmp_path,
               H264HighGen(48, 32, seed=seed, intra_prob=0.2,
                           skip_prob=0.15), "IPPI", 4)


def test_high_deblock(reference_bins, tmp_path):
    run_case_b(
        reference_bins, tmp_path,
        H264HighGen(80, 48, seed=1, intra_prob=0.15, skip_prob=0.15,
                    qp=29, disable_deblock=False), "IPPI", 4)


@pytest.mark.parametrize("seed", range(2))
def test_high_cabac_transcode(reference_bins, tmp_path, seed):
    run_case_cabac_tc(
        reference_bins, tmp_path,
        H264HighGen(48, 32, seed=seed, intra_prob=0.2, skip_prob=0.15),
        "IPPI", 4)


# -- weighted prediction ------------------------------------------------
from streamgen.h264_enc import H264WeightedGen  # noqa: E402


@pytest.mark.parametrize("seed", range(2))
def test_weighted_p_explicit(reference_bins, tmp_path, seed):
    run_case_b(reference_bins, tmp_path,
               H264WeightedGen(48, 32, seed=seed, skip_prob=0.15,
                               intra_prob=0.1, num_ref_frames=2,
                               b_direct_prob=0), "IPP", 3)


@pytest.mark.parametrize("idc", [1, 2])
def test_weighted_b(reference_bins, tmp_path, idc):
    run_case_b(reference_bins, tmp_path,
               H264WeightedGen(48, 32, seed=idc, skip_prob=0.15,
                               intra_prob=0.1, num_ref_frames=2,
                               b_direct_prob=0.3, bipred_idc=idc),
               "IPBPB", 5)


# -- MMCO / long-term references ---------------------------------------
from streamgen.h264_enc import H264MmcoGen  # noqa: E402


@pytest.mark.parametrize("plan,pat", [
    ({2: [(1, 2, 0)]}, "IPPPPP"),               # drop oldest short-term
    ({1: [(6, 0, 0)], 3: [(2, 0, 0)]}, "IPPPPP"),  # cur->long, then unmark
    ({2: [(5, 0, 0)]}, "IPPPP"),                # full reset
    ({2: [(4, 1, 0), (3, 1, 0)]}, "IPPPPP"),    # max-long + short->long
])
def test_mmco(reference_bins, tmp_path, plan, pat):
    run_case_b(reference_bins, tmp_path,
               H264MmcoGen(48, 32, seed=len(pat), num_ref_frames=3,
                           skip_prob=0.1, intra_prob=0.1, mmco_plan=plan),
               pat, len(pat))


# -- multi-slice pictures ----------------------------------------------
from streamgen.h264_enc import H264MultiSliceGen  # noqa: E402


@pytest.mark.parametrize("rps", [1, 2])
def test_multi_slice_pictures(reference_bins, tmp_path, rps):
    run_case_b(
        reference_bins, tmp_path,
        H264MultiSliceGen(64, 48, seed=rps, rows_per_slice=rps, qp=29,
                          disable_deblock=False), "II", 2)


# -- field_pic_flag streams (reference decodes them with frame machinery;
#    CABAC selects the field significance-map contexts) ------------------
class _FieldIntraGen(H264IntraGen):
    field_pics = True


class _FieldCabacIGen(H264CabacIGen):
    field_pics = True


class _FieldBGen(H264BGen):
    field_pics = True


@pytest.mark.parametrize("seed", range(2))
def test_field_flag_intra(reference_bins, tmp_path, seed):
    run_case(reference_bins, tmp_path,
             _FieldIntraGen(64, 48, seed=seed, qp=28,
                            disable_deblock=False), "III", 2)


def test_field_flag_cabac_intra(reference_bins, tmp_path):
    run_case(reference_bins, tmp_path,
             _FieldCabacIGen(64, 48, seed=7, qp=30, disable_deblock=False),
             "II", 1)


def test_field_flag_b(reference_bins, tmp_path):
    run_case_b(reference_bins, tmp_path,
               _FieldBGen(48, 32, seed=1, skip_prob=0.25, intra_prob=0.15,
                          num_ref_frames=2, b_direct_prob=0.3,
                          direct_spatial=1), "IPBPB", 5)
