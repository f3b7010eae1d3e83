#!/usr/bin/env python3
"""DuckDB side of the nanolog portability pin (see
graft.functions.NanologPortability): recompute CRC32 of the big-endian
floor(ln(k)*1e9+0.5) stream per range and compare against the recorded
constants. A DuckDB upgrade whose ln rounds differently fails HERE
instead of silently desynchronizing sent_nb_eval's oracle. The JVM side
is pinned by FunctionsSpec against the same constants.

Usage: python3 tools/nanolog_check.py   (exits non-zero on mismatch)
"""
import sys
import zlib

import duckdb

# keep in sync with NanologPortability.Ranges
RANGES = [
    (1, 2_000_000, 1743986948),
    (2_000_001, 20_000_000, 4139499043),
    (20_000_001, 50_000_000, 3221527147),
    (50_000_001, 100_000_000, 2456336427),
]

rc = 0
for lo, hi, want in RANGES:
    rows = duckdb.sql(
        f"""SELECT CAST(floor(ln(CAST(i AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS v
            FROM generate_series({lo},{hi}) t(i) ORDER BY i"""
    ).fetchnumpy()["v"]
    got = zlib.crc32(rows.astype(">i8").tobytes())
    ok = "PASS" if got == want else "FAIL"
    if got != want:
        rc = 1
    print(f"{ok} nanolog [{lo},{hi}] crc32={got} want={want}")
sys.exit(rc)
