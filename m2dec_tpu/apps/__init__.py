"""Command-line tools (reference src/app parity: m2dec, h264dec)."""
