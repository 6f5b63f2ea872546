"""Shared bounded RIFF chunk walker (WAV + WebP ride the same
container grammar; review r5: two near-identical walkers drifted into
audio.py and webp.py within one change set, so the walk lives once).

Contract: validates the RIFF magic + form type, yields (tag, body)
pairs with every declared size checked against the buffer, honors the
word alignment padding byte, raises ValueError on corrupt structure.
"""
from __future__ import annotations

import struct
from typing import Iterator


def walk_riff(data: bytes, form: bytes,
              *, strict_sizes: bool = False) -> Iterator[
                  tuple[bytes, bytes]]:
    """Yield (fourcc, body) for each chunk of a RIFF/``form`` file.

    ``strict_sizes=True`` raises when the top-level RIFF size or a
    chunk's declared size runs past the buffer (WebP probing wants
    corrupt = loud); ``strict_sizes=False`` ignores the RIFF size
    field and truncates chunk bodies to the real bytes (the WAV
    fallback's behavior — real streaming writers emit 0/0xFFFFFFFF
    RIFF sizes, and the decoder's own format checks reject corrupt
    remainders)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != form:
        raise ValueError(
            f"not a RIFF/{form.decode('latin-1').strip()} stream")
    if strict_sizes:
        (riff_size,) = struct.unpack("<I", data[4:8])
        if riff_size + 8 > len(data) + 1:  # 1-byte pad slack
            raise ValueError(f"RIFF size {riff_size} overruns the "
                             f"file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if strict_sizes and len(body) < size:
            raise ValueError(f"chunk {tag!r} truncated "
                             f"({len(body)}/{size} bytes)")
        yield tag, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
