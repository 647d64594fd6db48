"""Utilities: CRC oracles, YUV dump helpers, logging."""
