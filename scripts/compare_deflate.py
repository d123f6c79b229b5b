#!/usr/bin/env python3
"""Two-sided check for px10_deflate_scan — the one mapPartitions scan
in the suite. DuckDB has no deflate, so the driver's SQL oracle can't
replay it; this twin recomputes the banded census with CPython's zlib
and diffs it against the Spark dump, the same pattern as
compare_docs.py for the document read path.

Engine-equivalence contract (why byte-size equality is expected):
 - graft side: java.util.zip.Deflater(BEST_SPEED) = zlib level 1,
   default strategy, zlib wrapper (2-byte header + adler32), one
   stream per document (`CompressionSignals.deflateRatio`).
 - twin side: zlib.compress(raw, 1) — same library (CPython links
   madler zlib; the JDK bundles the same), same level/strategy/wbits.
 - verified size-identical on real fixture documents before adoption;
   if a JDK ever switches to zlib-ng the sizes diverge LOUDLY (every
   band shifts), never subtly.
Semantics mirrored from the Scala scan:
 - null text -> empty bytes -> raw_bytes 0, ratio 0
 - ratio = compressed * 1000 // raw_len (both positive: Java's
   truncating long division == Python's floor division)
 - band = ratio // 100 (Spark `div`)

Usage: compare_deflate.py <sfDir> <verifyOutDir>
NOT part of the Scala library — dev tooling only.
"""
import glob
import sys
import zlib
from collections import defaultdict

import pandas as pd


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    want = defaultdict(lambda: [0, 0])  # (source, band) -> [n, bytes]
    for source, text in zip(docs["source"], docs["text"]):
        raw = (text or "").encode("utf-8") if isinstance(text, str) \
            else b""
        if raw:
            ratio = len(zlib.compress(raw, 1)) * 1000 // len(raw)
        else:
            ratio = 0
        cell = want[(source, ratio // 100)]
        cell[0] += 1
        cell[1] += len(raw)

    files = glob.glob(f"{out_dir}/px10_deflate_scan/*.parquet")
    if not files:
        print("FAIL px10_deflate_scan: no parquet dump found")
        sys.exit(1)
    got = pd.concat([pd.read_parquet(f) for f in files])
    got_map = {(r.source, int(r.band)): (int(r.n_docs), int(r.raw_bytes))
               for r in got.itertuples()}
    want_map = {k: (v[0], v[1]) for k, v in want.items()}
    if got_map == want_map:
        print(f"PASS px10_deflate_scan (zlib twin, {len(got_map)} bands)")
        sys.exit(0)
    only_got = sorted(set(got_map) - set(want_map))
    only_want = sorted(set(want_map) - set(got_map))
    diff = sorted(k for k in set(got_map) & set(want_map)
                  if got_map[k] != want_map[k])
    for k in only_got[:5]:
        print(f"FAIL band only in spark: {k} -> {got_map[k]}")
    for k in only_want[:5]:
        print(f"FAIL band only in twin:  {k} -> {want_map[k]}")
    for k in diff[:5]:
        print(f"FAIL band mismatch {k}: spark {got_map[k]} "
              f"!= twin {want_map[k]}")
    sys.exit(1)


if __name__ == "__main__":
    main()
