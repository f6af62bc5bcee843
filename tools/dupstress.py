#!/usr/bin/env python3
"""Build dedup stress corpora. Two modes:

dup4 (default): every document and embedding duplicated 4x with disjoint
id shifts (texts/vectors byte-identical across copies). The adversarial
case for pairwise dedup: true-pair count is quadratic in the copy
factor, so runtime must scale with pair OUTPUT, not corpus^2.

hotshingle: a corpus where ONE token trigram dominates — every doc opens
with the same boilerplate line and additionally repeats it mid-text, so
a single shingle hash owns ~2 positions x n_docs. The adversarial case
for dedup_substring's membership step: without the salted pre-count +
broadcast bypass, all those positions land in ONE window partition.
Run dedup_substring over the result and it must complete with bounded
per-partition rows (spill at worst), producing dup spans on every doc.

Usage: python3 tools/dupstress.py <srcSfDir> <dstDir> [mode [nDocs]]
  mode: dup4 (default) | hotshingle
Driver-side tooling only (pyarrow); the engine just reads the result.
"""
import os, sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def dup4(table, idcol):
    if table.num_rows == 0:
        return table  # nothing to duplicate; pc.max would yield null
    maxid = pc.max(table[idcol]).as_py() + 1
    idx = table.schema.get_field_index(idcol)
    return pa.concat_tables(
        table.set_column(idx, idcol, pc.add(table[idcol], i * maxid))
        for i in range(4))


BOILER = "terms of service apply to all content"


def hotshingle(n_docs):
    rows = []
    for i in range(n_docs):
        # boilerplate head + unique middle + boilerplate again: the
        # shared shingles occur twice per doc, unique tokens between
        text = f"{BOILER} unique{i} token{i} filler{i} {BOILER}"
        rows.append((i, text, "en", "stress", len(text)))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })


def main(src, dst, mode="dup4", n_docs=100000):
    os.makedirs(dst, exist_ok=True)
    if mode == "hotshingle":
        pq.write_table(hotshingle(n_docs), f"{dst}/documents.parquet")
        return
    pq.write_table(dup4(pq.read_table(f"{src}/documents.parquet"), "doc_id"),
                   f"{dst}/documents.parquet")
    pq.write_table(dup4(pq.read_table(f"{src}/embeddings.parquet"), "vec_id"),
                   f"{dst}/embeddings.parquet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4] or ["dup4"]),
         *map(int, sys.argv[4:5]))
