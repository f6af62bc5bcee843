#!/usr/bin/env python3
"""Build a 4x duplicate-heavy stress corpus: every document and embedding
duplicated 4x with disjoint id shifts (texts/vectors byte-identical across
copies). The adversarial case for dedup: true-pair count is quadratic in
the copy factor, so runtime must scale with pair OUTPUT, not corpus^2.

Usage: python3 tools/dupstress.py <srcSfDir> <dstDir>
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


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    pq.write_table(dup4(pq.read_table(f"{src}/documents.parquet"), "doc_id"),
                   f"{dst}/documents.parquet")
    pq.write_table(dup4(pq.read_table(f"{src}/embeddings.parquet"), "vec_id"),
                   f"{dst}/embeddings.parquet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
