#!/usr/bin/env python3
"""Generate fixtures/media_magic.parquet — genuine binary format
headers for the oracle-checked magic-byte sniff entry
(`mm_format_sniff_magic`).

Why this exists (r13 verdict #7): the corpus-backed `mm_format_sniff`
entry is green, but the documents corpus is prose, so the driver's
oracle only ever exercises the miss -> histogram-fallback path; the
magic-byte HIT path (including >0x7F prefixes that a string cast would
UTF-8-mangle) was pinned only by a unit spec. This fixture commits a
small payload table whose rows carry real JPEG/PNG/GIF/PDF/ZIP/... 
headers so the broadcast-join verdict path is oracle-checked on
genuine non-ASCII prefixes, plus miss rows for both fallback verdicts.

Deterministic: fixed byte literals, no RNG, no clock. Regenerating
yields a byte-identical table.
"""
import pyarrow as pa
import pyarrow.parquet as pq

# (name, header bytes) — headers from the published magic-number
# tables (libmagic/IANA); filler chosen to exercise both printable and
# high-byte histogram regimes.
HIGH = bytes(range(0x80, 0xC0))  # 64 high bytes -> binary verdict
PROSE = b" the quick brown fox jumps over the lazy dog, twice over. "

rows = [
    # binary-magic hits: >0x7F prefix bytes, binary-ish tails
    (1, bytes([0x89]) + b"PNG\r\n\x1a\n" + HIGH + b"IHDR" + HIGH),
    (2, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"\x00\x10JFIF\x00" + HIGH),
    (3, bytes([0xFF, 0xD8, 0xFF, 0xE1]) + b"\x00\x18Exif\x00\x00" + HIGH),
    (4, b"GIF89a" + bytes([0x2C, 0x00, 0x00]) + HIGH + HIGH),
    # printable-magic hits over mostly-printable bodies: the sniffed
    # format must OVERRIDE a 'text' histogram verdict
    (5, b"%PDF-1.7\n1 0 obj\n<< /Type /Catalog >>\n" + PROSE),
    (6, b"PK\x03\x04" + bytes([0x14, 0x00, 0x06, 0x00]) + HIGH + PROSE),
    (7, b"Rar!\x1a\x07\x01\x00" + HIGH),
    (8, b"OggS\x00\x02" + HIGH + HIGH),
    (9, b"fLaC\x00\x00\x00\x22" + HIGH),
    (10, b"RIFF\x24\x08\x00\x00WAVEfmt " + HIGH),
    (11, b"<!DOCTYPE html><html><body>hello</body></html>" + PROSE),
    (12, b"<?xml version=\"1.0\"?><root>x</root>" + PROSE),
    # misses: both fallback verdicts, plus an exactly-4-byte payload
    # (prefix == whole payload) on the hit path
    (13, bytes([0x01, 0x02, 0x03, 0x04]) + HIGH + HIGH + HIGH),
    (14, PROSE * 3),
    (15, b"GIF8"),
]

table = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "payload": pa.array([r[1] for r in rows], pa.binary()),
})
pq.write_table(table, "fixtures/media_magic.parquet")
print(f"wrote fixtures/media_magic.parquet: {table.num_rows} rows")
