#!/usr/bin/env python3
"""Verify a device-golden .cks file against a raw NV12 dump (e.g. the
reference binary's `-o` output): tools/verify_cks.py <file.cks>
<file.out> <width> <height>. Exit 0 iff every frame line matches."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from m2dec_tpu.runtime.golden import host_cks_file  # noqa: E402


def main(argv):
    cks_path, raw_path, w, h = argv[0], argv[1], int(argv[2]), int(argv[3])
    got = pathlib.Path(cks_path).read_text()
    want = host_cks_file(pathlib.Path(raw_path).read_bytes(), w, h)
    if got == want:
        print(f"OK: {got.count(chr(10))} frames match")
        return 0
    print("MISMATCH")
    for i, (a, b) in enumerate(zip(got.splitlines(), want.splitlines())):
        if a != b:
            print(f"  line {i}: got {a!r} want {b!r}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
