#!/usr/bin/env python3
"""Rebuild the round-5 adversarial gate corpus (BASELINE.md round-5
closing section) from the committed document set.

The corpus is the driver's generated tables with `documents` replaced by
102 handcrafted stress documents: NULL text, empty / whitespace-only /
NBSP-padded docs, emoji, CJK, HTML fragments, \r and \t noise, 20k-char
single lines, multi-line paragraph structure, and boundary-ratio line
mixes — the shapes the generated testdata never exercises. Running the
full oracle board against it is what exposed the engine/mirror
divergences fixed in round 5 (zero-word shingle candidacy, NULL-text
quality fall-through, DuckDB-vs-Spark trim semantics, RE2 NBSP classes,
empty-aggregate NULL poisoning, single-line mirror assumptions).

Usage: gen_adversarial.py <src_sf_dir> <out_dir>
  e.g. gen_adversarial.py /root/testdata/sf0.01 /tmp/sfadv
then:  sbt -batch "runMain graft.Verify <out_dir> /tmp/verify_adv"
       python3 tools/check_oracles.py /tmp/verify_adv <out_dir>

Expected board: 140/146 green; the 6 non-green rows are the documented
driver-corpus-shaped zone/TEI/24-col mirrors (see Queries.keptLinesCtes).
"""
import json
import os
import shutil
import sys

import duckdb


def main(src_sf_dir, out_dir):
    here = os.path.dirname(os.path.abspath(__file__))
    docs = json.load(open(os.path.join(here, "adversarial_docs.json")))
    os.makedirs(out_dir, exist_ok=True)
    for t in sorted(os.listdir(src_sf_dir)):
        if t.endswith(".parquet") and t != "documents.parquet":
            shutil.copyfile(os.path.join(src_sf_dir, t), os.path.join(out_dir, t))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO d VALUES (?, ?, ?, ?, ?)",
        [(x["doc_id"], x["text"], x["lang"], x["source"], x["n_chars"])
         for x in docs])
    con.execute(
        f"COPY (SELECT * FROM d ORDER BY doc_id) TO "
        f"'{os.path.join(out_dir, 'documents.parquet')}' (FORMAT PARQUET)")
    print(f"wrote {len(docs)} adversarial documents + "
          f"{len(os.listdir(out_dir)) - 1} copied tables to {out_dir}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
