"""Native C++ H.265 Phase A vs the Python Phase A: the plans must be
identical field-for-field, and the full native+JAX pipeline's output
must match the Python decoder byte-for-byte."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from streamgen.h265_enc import ALL_MODES, H265StreamGen  # noqa: E402

from m2dec_tpu.codecs.h265.headers import H265Decoder  # noqa: E402
from m2dec_tpu.native import load_h265  # noqa: E402
from m2dec_tpu.runtime.output import cropped_nv12_bytes  # noqa: E402

_FIELDS = ("coef_y", "coef_cb", "coef_cr", "tu_y", "tu_cb", "tu_cr",
           "slot", "mv", "dbv", "dbh", "dbcv", "dbch", "sao_idx",
           "sao_opt", "sao_off", "ops_l", "ops_c")


def run_case(gen, n):
    if load_h265() is None:
        pytest.skip("native h265parse unavailable")
    data = gen.generate(n)
    d1 = H265Decoder()
    d1.set_data(data)
    frames_py = d1.decode_all(collect_plans=True)
    d2 = H265Decoder()
    d2.set_data(data)
    frames_nat = d2.decode_all(backend="native")
    assert len(d1.plans) == len(d2.plans)
    for i, (a, b) in enumerate(zip(d1.plans, d2.plans)):
        for f in _FIELDS:
            va, vb = getattr(a, f), getattr(b, f)
            assert va.shape == vb.shape, f"pic {i} field {f} shape"
            assert np.array_equal(va, vb), \
                f"pic {i} field {f}: " \
                f"{np.count_nonzero(va != vb)} diffs"
    out_py = b"".join(cropped_nv12_bytes(f) for f in frames_py)
    out_nat = b"".join(cropped_nv12_bytes(f) for f in frames_nat)
    assert out_py == out_nat


CASES = {
    "intra": (dict(seed=1), (64, 48), 2),
    "intra32_strong": (dict(seed=22, ctb_log2=5, qp=14, cbf_prob=0.3,
                            modes=ALL_MODES, strong_smoothing=1,
                            split_prob=0.3), (96, 64), 2),
    "nonaligned": (dict(seed=3), (52, 36), 2),
    "residual_deep": (dict(seed=14, ctb_log2=5, qp=16, split_prob=0.8,
                           nxn_prob=0.8, cbf_prob=0.6), (64, 64), 2),
    "angular_all": (dict(seed=21, qp=14, cbf_prob=0.4,
                         modes=ALL_MODES), (64, 48), 3),
    "tskip_sdh": (dict(seed=32, qp=14, cbf_prob=0.7, modes=ALL_MODES,
                       transform_skip=1, sign_data_hiding=1,
                       split_prob=0.7, nxn_prob=0.8), (64, 48), 2),
    "deblock32": (dict(seed=43, qp=37, ctb_log2=5, cbf_prob=0.4,
                       modes=ALL_MODES, deblock=1, max_level=1),
                  (96, 64), 2),
    "sao_deblock": (dict(seed=53, qp=32, cbf_prob=0.5, modes=ALL_MODES,
                         sao=1, deblock=1, max_level=1), (64, 48), 3),
    "p_filters": (dict(seed=62, qp=32, cbf_prob=0.4, modes=ALL_MODES,
                       deblock=1, sao=1, max_level=1), (64, 48),
                  "IPPP"),
    "p_amvp_mvd": (dict(seed=72, qp=14, ctb_log2=5, cbf_prob=0.3,
                        modes=ALL_MODES, tmvp=1, amvp_prob=1.0,
                        skip_prob=0.0, max_mvd=300), (96, 64), "IPP"),
    "b_filters": (dict(seed=82, qp=32, cbf_prob=0.4, modes=ALL_MODES,
                       tmvp=1, deblock=1, sao=1, max_level=1), (64, 48),
                  "IPBPB"),
    "amp": (dict(seed=92, qp=14, cbf_prob=0.4, modes=ALL_MODES, tmvp=1,
                 part_mode_prob=0.6, amp=1), (64, 48), "IPB"),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_native_plan_parity(case):
    kw, (w, h), n = CASES[case]
    run_case(H265StreamGen(w, h, **kw), n)


def test_native_truncation_abandons_picture():
    """Mid-slice truncation: the native Phase A must abandon the
    picture exactly like the Python decoder (the reference's refill
    longjmp, bitio.c:112-128) — never complete it from the BitReader's
    zero-padded tail."""
    gen = H265StreamGen(64, 48, seed=3)
    data = gen.generate("IPP")
    for frac in (85, 70, 55):
        cut = data[: len(data) * frac // 100]
        dp = H265Decoder()
        dp.set_data(cut)
        exp = dp.decode_all()
        dn = H265Decoder()
        dn.set_data(cut)
        got = dn.decode_all(backend="native")
        assert len(got) == len(exp), f"cut {frac}%"
        for a, b in zip(exp, got):
            assert np.array_equal(a.y, b.y)
            assert np.array_equal(a.cb, b.cb)
            assert np.array_equal(a.cr, b.cr)
