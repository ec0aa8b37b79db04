"""Wrap an elementary stream into an MPEG Program Stream (test muxer).

Emits MPEG-1-layout pack headers (the reference demuxer skips a flat 8
bytes after 0xba, mpeg_demux.cpp:46-48) and MPEG-2-style video PES
packets (stream id 0xe0, '10' flag byte + header_data_length)."""


def mux_ps(es: bytes, packet_size=1500, with_system=True) -> bytes:
    out = bytearray()
    pos = 0
    first = True
    while pos < len(es):
        chunk = es[pos : pos + packet_size]
        pos += len(chunk)
        # pack header: MPEG-1 layout (4 bits '0010', SCR..), 8 bytes body
        out += b"\x00\x00\x01\xba"
        out += bytes([0x21, 0x00, 0x01, 0x00, 0x01, 0x80, 0x1F, 0xFF])
        if first and with_system:
            # a non-video packet to exercise the skip path (padding PES)
            out += b"\x00\x00\x01\xbe" + (6).to_bytes(2, "big") + b"\xff" * 6
            first = False
        hdr = bytes([0x80, 0x00, 0x00])  # MPEG-2 PES: no flags, hlen 0
        out += b"\x00\x00\x01\xe0"
        out += (len(chunk) + len(hdr)).to_bytes(2, "big")
        out += hdr
        out += chunk
    out += b"\x00\x00\x01\xb9"
    return bytes(out)


def mux_ps_aligned(es: bytes, with_system=True) -> bytes:
    """Mux with PES boundaries aligned to top-level start codes (picture/
    sequence), avoiding the reference's mid-structure packet-boundary
    quirks (its dec_bits refill across PES payloads)."""
    cuts = [0]
    i = 0
    while True:
        i = es.find(b"\x00\x00\x01", i + 1)
        if i < 0:
            break
        if es[i + 3] in (0x00, 0xB3, 0xB7):  # picture/seq/end
            cuts.append(i)
    cuts.append(len(es))
    out = bytearray()
    first = True
    for a, b in zip(cuts, cuts[1:]):
        if a == b:
            continue
        chunk = es[a:b]
        out += b"\x00\x00\x01\xba"
        out += bytes([0x21, 0x00, 0x01, 0x00, 0x01, 0x80, 0x1F, 0xFF])
        if first and with_system:
            out += b"\x00\x00\x01\xbe" + (6).to_bytes(2, "big") + b"\xff" * 6
            first = False
        hdr = bytes([0x80, 0x00, 0x00])
        out += b"\x00\x00\x01\xe0"
        out += (len(chunk) + len(hdr)).to_bytes(2, "big")
        out += hdr
        out += chunk
    out += b"\x00\x00\x01\xb9"
    return bytes(out)
