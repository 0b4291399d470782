"""Columnar series codecs: Gorilla-style XOR floats, delta-of-delta
timestamps, lossless text blocks."""
