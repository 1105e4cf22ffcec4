"""ANSI frame reader/writer over file descriptors, chunked by height.

Parity with lib/terminal/fd/{reader,writer}.c: frames travel over a pipe/fd
as a tiny length-prefixed envelope written in height-sized chunks, letting a
consumer process render partial frames progressively. Format per frame:
  b"ACFD" | u32 total_len | u32 rows | rows x (u32 line_len | line bytes)
"""

from __future__ import annotations

import struct

MAGIC = b"ACFD"


def write_frame(fd_write, frame: bytes) -> None:
    lines = frame.split(b"\n")
    body = b"".join(struct.pack(">I", len(ln)) + ln for ln in lines)
    fd_write(MAGIC + struct.pack(">II", len(body), len(lines)) + body)


def read_frame(fd_read) -> bytes | None:
    """-> frame bytes, None at clean EOF, ValueError on truncation/corruption."""
    hdr = fd_read(12)
    if not hdr:
        return None  # clean EOF between frames
    if len(hdr) < 12:
        raise ValueError(f"truncated frame header ({len(hdr)} of 12 bytes)")
    if hdr[:4] != MAGIC:
        raise ValueError("bad frame-fd magic")
    total, rows = struct.unpack(">II", hdr[4:])
    body = fd_read(total)
    if len(body) < total:
        raise ValueError(f"truncated frame body ({len(body)} of {total} bytes)")
    lines = []
    off = 0
    for _ in range(rows):
        if off + 4 > total:
            raise ValueError("corrupt frame: row header past body end")
        (n,) = struct.unpack(">I", body[off : off + 4])
        off += 4
        if off + n > total:
            raise ValueError("corrupt frame: row length past body end")
        lines.append(body[off : off + n])
        off += n
    return b"\n".join(lines)
