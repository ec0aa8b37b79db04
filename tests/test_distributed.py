"""Multi-process (multi-host model) smoke test: 2 jax.distributed
processes decode GOP shards with a cross-process DPB page exchange
(tests/distributed/worker.py)."""

import pathlib
import socket
import subprocess
import sys


def test_two_process_dpb_exchange():
    worker = pathlib.Path(__file__).parent / "distributed" / "worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0]
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
