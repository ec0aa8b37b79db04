"""CLI parity tests: m2dec_tpu.apps.h264dec vs the reference h264dec
binary (src/app/h264dec.cpp) — same flags, same output bytes, same
stderr, same exit codes.

Covered reference behaviors:
- -o / -O writing <basename>.out in CWD (outfilename, h264dec.cpp:31-48)
- -e emptify and -b/-d dead-variable acceptance (h264dec.cpp:113-125,170)
- -f frame-skip scan + header replay, including the reference bug chain
  that makes it decode the full stream anyway (see runtime/skip.py)
- -m MPEG-2 ES input and extension-based codec detection
  (detect_file, m2decoder.h:236-260)
- truncated-stream per-picture error containment with graceful DPB
  drain (setjmp at h264.cpp:673, drain at m2decoder.h:137-143)
- usage text + exit 1 on bad options (BlameUser, h264dec.cpp:88-103)
"""

import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from streamgen.h264_enc import H264BGen, H264InterGen, H264IntraGen  # noqa: E402
from streamgen.mpeg2_enc import Mpeg2StreamGen  # noqa: E402

from m2dec_tpu.apps import h264dec as cli  # noqa: E402


def run_ref(reference_bins, cwd, args):
    r = subprocess.run([str(reference_bins["h264dec"]), *args],
                       cwd=cwd, capture_output=True)
    return r.returncode, r.stderr.decode()


def run_ours(monkeypatch, capsys, cwd, args):
    monkeypatch.chdir(cwd)
    try:
        code = cli.main(args)
    except SystemExit as e:  # pragma: no cover
        code = e.code
    return code, capsys.readouterr().err


@pytest.fixture(scope="module")
def streams(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    (d / "inter.264").write_bytes(
        H264InterGen(80, 48, seed=7, num_ref_frames=2).generate("IPPIPPP"))
    (d / "intra.264").write_bytes(
        H264IntraGen(48, 48, seed=3).generate("III"))
    (d / "b.264").write_bytes(
        H264BGen(80, 48, seed=5, num_ref_frames=2).generate("IPBPB"))
    # trailing dummy picture: the reference MPEG-2 path longjmps at EOS
    es = Mpeg2StreamGen(80, 48, seed=11).generate("IPPBP" + "I")
    (d / "mp.m2v").write_bytes(es)
    (d / "mp_es.264").write_bytes(es)  # wrong extension; -m forces MPEG-2
    return d


def case(reference_bins, monkeypatch, capsys, streams, name, flags,
         prefix_only=False):
    src = streams / name
    out = streams / (name.rsplit(".", 1)[0] + ".out")
    out.unlink(missing_ok=True)
    ref_code, ref_err = run_ref(reference_bins, streams, [*flags, src.name])
    golden = out.read_bytes() if out.exists() else b""
    out.unlink(missing_ok=True)
    our_code, our_err = run_ours(monkeypatch, capsys, streams,
                                 [*flags, src.name])
    ours = out.read_bytes() if out.exists() else b""
    assert our_err == ref_err
    if prefix_only:
        assert golden and ours[: len(golden)] == golden
    else:
        assert ours == golden
        assert our_code == ref_code
    return golden


@pytest.mark.parametrize("flags", [["-o"], ["-O"], ["-e", "-o"],
                                   ["-b", "-o"], ["-d", "16", "-o"],
                                   ["-e", "-O"]])
@pytest.mark.parametrize("name", ["inter.264", "intra.264", "b.264"])
def test_flag_matrix(reference_bins, monkeypatch, capsys, streams, name,
                     flags):
    golden = case(reference_bins, monkeypatch, capsys, streams, name, flags)
    assert golden  # decoded something


@pytest.mark.parametrize("skip", [1, 2, 3, 4, 99])
@pytest.mark.parametrize("name", ["inter.264", "intra.264"])
def test_skip_frames(reference_bins, monkeypatch, capsys, streams, name,
                     skip):
    """-f: stderr reports the scan result; output is still the full
    stream (reference header-replay fallthrough, runtime/skip.py)."""
    golden = case(reference_bins, monkeypatch, capsys, streams, name,
                  ["-f", str(skip), "-o"])
    assert golden


def test_mpeg2_forced_and_detected(reference_bins, monkeypatch, capsys,
                                   streams):
    """-m forces MPEG-2 on a .264 name; .m2v auto-detects. The reference
    crashes at EOS after emitting all real frames (hence prefix compare,
    like tests/test_mpeg2_decode.py)."""
    g1 = case(reference_bins, monkeypatch, capsys, streams, "mp_es.264",
              ["-m", "-o"], prefix_only=True)
    g2 = case(reference_bins, monkeypatch, capsys, streams, "mp.m2v",
              ["-o"], prefix_only=True)
    fs = 80 * 48 * 3 // 2
    assert len(g1) >= 5 * fs and g1 == g2


def test_truncated_stream_containment(reference_bins, monkeypatch, capsys,
                                      streams, tmp_path):
    """Mid-picture truncation: both decoders emit the completed frames
    and exit 0 (per-picture error containment + DPB drain)."""
    data = (streams / "inter.264").read_bytes()
    # cut inside the 5th picture (well past the second IDR)
    (tmp_path / "trunc.264").write_bytes(data[: int(len(data) * 0.67)])
    ref_code, ref_err = run_ref(reference_bins, tmp_path,
                                ["-o", "trunc.264"])
    golden = (tmp_path / "trunc.out").read_bytes()
    (tmp_path / "trunc.out").unlink()
    our_code, our_err = run_ours(monkeypatch, capsys, tmp_path,
                                 ["-o", "trunc.264"])
    ours = (tmp_path / "trunc.out").read_bytes()
    assert (our_code, our_err) == (ref_code, ref_err)
    assert ours == golden and golden  # partial but equal output


def test_usage_errors(reference_bins, monkeypatch, capsys, streams):
    for args in [[], ["-d", "33", "inter.264"], ["-o"],
                 ["-o", "missing_file.264"]]:
        ref_code, ref_err = run_ref(reference_bins, streams, args)
        our_code, our_err = run_ours(monkeypatch, capsys, streams, args)
        assert our_err == ref_err, args
        assert our_code == ref_code == 1, args


def test_force_exec_traps(monkeypatch, capsys, streams, tmp_path):
    """-x masks decode errors (h264dec.cpp -x + trap handler): a stream
    that raises in our decoder exits 0 under -x."""
    # genuinely malformed payload (not just truncated): SPS with garbage
    (tmp_path / "bad.264").write_bytes(b"\x00\x00\x01\x67" + b"\xff" * 8
                                       + b"\x00\x00\x01\x65\x88" + b"\xff" * 4)
    code, err = run_ours(monkeypatch, capsys, tmp_path,
                         ["-x", "-o", "bad.264"])
    assert code == 0


def test_h264_jax_backend_cli(reference_bins, monkeypatch, capsys,
                              streams):
    """--jax routes H.264 through the two-phase engine (C++ Phase A +
    jitted Phase B); output must stay byte-equal to the reference
    (which of course runs without the extension flag)."""
    out = streams / "inter.out"
    out.unlink(missing_ok=True)
    run_ref(reference_bins, streams, ["-o", "inter.264"])
    golden = out.read_bytes()
    out.unlink()
    code, _ = run_ours(monkeypatch, capsys, streams,
                       ["--jax", "-o", "inter.264"])
    assert code == 0
    assert out.read_bytes() == golden and golden


def test_h264_turbo_cli(reference_bins, monkeypatch, capsys, streams):
    """--turbo (overlapped Phase A / batched async Phase B,
    runtime/turbo.py) must also stay byte-equal to the reference."""
    out = streams / "inter.out"
    out.unlink(missing_ok=True)
    run_ref(reference_bins, streams, ["-o", "inter.264"])
    golden = out.read_bytes()
    out.unlink()
    code, _ = run_ours(monkeypatch, capsys, streams,
                       ["--turbo", "-o", "inter.264"])
    assert code == 0
    assert out.read_bytes() == golden and golden


def test_thrplay_playlist(reference_bins, monkeypatch, capsys, streams):
    """thrplay parity: -o playlist writes one <basename>.out per input
    (FileWriterUnit::change), bytes equal to the reference decode; -s is
    in the reference optstring but unhandled -> usage exit 1."""
    from m2dec_tpu.apps import thrplay

    monkeypatch.chdir(streams)
    (streams / "inter.out").unlink(missing_ok=True)
    (streams / "b.out").unlink(missing_ok=True)
    assert thrplay.main(["-o", "-e", "inter.264", "b.264"]) == 0
    capsys.readouterr()
    for name in ("inter", "b"):
        ours = (streams / f"{name}.out").read_bytes()
        (streams / f"{name}.out").unlink()
        run_ref(reference_bins, streams, ["-o", f"{name}.264"])
        assert ours == (streams / f"{name}.out").read_bytes()
    assert thrplay.main(["-s", "inter.264"]) == 1
    assert thrplay.main([]) == 1
    assert thrplay.main(["-f", "2", "inter.264"]) == 1  # below 3..256
    capsys.readouterr()


def test_skip_scan_values():
    """h264_skip_scan unit: counts frame heads, remembers last IDR."""
    from m2dec_tpu.runtime.skip import h264_skip_scan

    sps = b"\x00\x00\x01\x67\xAA"
    pps = b"\x00\x00\x01\x68\xBB"
    idr = b"\x00\x00\x01\x65\x88\x00"
    p = b"\x00\x00\x01\x41\x9A\x00"
    data = sps + pps + idr + p + p + idr + p
    # skip 1: only frames 1..2 scanned; last IDR is frame 0 at offset 10
    sk, off, hdrs = h264_skip_scan(data, 1)
    assert (sk, off) == (0, 10)
    assert [data[a + 3] & 31 for a, b in hdrs] == [7, 8]
    # skip 4: sees the 4th head (second IDR, 3 frames skipped)
    sk, off, hdrs = h264_skip_scan(data, 4)
    assert (sk, off) == (3, 10 + 3 * 6)
    # no IDR at all -> -1
    sk, off, hdrs = h264_skip_scan(sps + pps + p + p, 5)
    assert (sk, off) == (-1, 0)


def test_device_checksum_golden_mode(reference_bins, monkeypatch,
                                     tmp_path, streams):
    """-C: per-frame device checksums (runtime/golden.py) must equal
    the host checksums of the reference binary's raw output — the
    full-speed golden mode for the frames-stay-in-HBM contract."""
    import subprocess

    from m2dec_tpu.apps.h264dec import main as h264dec_main
    from m2dec_tpu.runtime.golden import host_cks_file

    name = "inter.264"  # 80x48 (streams fixture)
    data = (streams / name).read_bytes()
    (tmp_path / name).write_bytes(data)
    subprocess.run([str(reference_bins["h264dec"]), "-o", name],
                   cwd=tmp_path, capture_output=True)
    raw = (tmp_path / "inter.out").read_bytes()
    monkeypatch.chdir(tmp_path)
    rc = h264dec_main(["-C", name])
    assert rc == 0
    got = (tmp_path / "inter.out").read_text()
    assert got == host_cks_file(raw, 80, 48)
