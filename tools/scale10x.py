#!/usr/bin/env python3
"""Build a 10x key-shifted copy of an sf directory for scale-ratio runs.

Usage: python3 tools/scale10x.py <srcSfDir> <dstDir> [copies]

Methodology (PERF.md "10x scale-up pass"): cardinalities grow by
disjoint key-shifting (copy i adds i * (max_key + 1) to every join key),
so there is NO artificial duplicate inflation across copies:
- dims (region, nation) stay single-copy; their keys are not shifted
  anywhere, so every copy's customers/suppliers still join them;
- document texts get a per-copy prefix tag AND every 4th token replaced
  by a copy-specific token (same positions in every doc of the copy, so
  near-dup structure is preserved WITHIN each copy) — a prefix tag
  alone leaves cross-copy texts ~96% identical, which simhash/minhash
  correctly flag as near-dups and the pair count inflates 45x;
- embeddings are component-rotated per copy (norm- and within-copy-
  cosine-preserving, cross-copy structure decorrelated);
- events keep their timestamps (per-window counts scale 10x) and the
  TIMESTAMP(NANOS) physical type (parquet version 2.6).

Driver-side tooling only (pyarrow) — the engine under test never runs
this; it just reads the resulting directory like any other sf dir.
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def shifted(table, col, shift, i):
    idx = table.schema.get_field_index(col)
    arr = pc.add(table.column(col), i * shift)
    return table.set_column(idx, table.schema.field(idx), arr)


def main(src, dst, copies=10):
    import os
    import functools
    os.makedirs(dst, exist_ok=True)

    @functools.lru_cache(maxsize=None)
    def load(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def dump(name, table):
        pq.write_table(table, f"{dst}/{name}.parquet", version="2.6",
                       coerce_timestamps=None, compression="snappy")

    # One shift base per KEY DOMAIN, derived from the table that OWNS the
    # key — a foreign key must shift by the owner's base, not its own
    # column max, or referential integrity silently breaks whenever some
    # owner keys are absent from the referencing table (e.g. customers
    # with no orders: max(o_custkey) < max(c_custkey) would point copy-1
    # orders at the wrong customers).
    def base(name, col):
        return pc.max(load(name).column(col)).as_py() + 1

    shifts = {
        "c_custkey": base("customer", "c_custkey"),
        "s_suppkey": base("supplier", "s_suppkey"),
        "p_partkey": base("part", "p_partkey"),
        "o_orderkey": base("orders", "o_orderkey"),
        "event_id": base("events", "event_id"),
    }
    shifts["o_custkey"] = shifts["c_custkey"]
    shifts["l_orderkey"] = shifts["o_orderkey"]
    shifts["l_partkey"] = shifts["p_partkey"]
    shifts["l_suppkey"] = shifts["s_suppkey"]
    shifts["user_id"] = shifts["c_custkey"]  # events.user_id ⋈ c_custkey

    def key_shift(name, keys):
        t = load(name)
        out = []
        for i in range(copies):
            c = t
            for k in keys:
                c = shifted(c, k, shifts[k], i)
            out.append(c)
        dump(name, pa.concat_tables(out))

    # dims: single copy
    for name in ("region", "nation"):
        dump(name, load(name))

    key_shift("customer", ["c_custkey"])
    key_shift("supplier", ["s_suppkey"])
    key_shift("part", ["p_partkey"])
    key_shift("orders", ["o_orderkey", "o_custkey"])
    key_shift("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    key_shift("events", ["event_id", "user_id"])

    docs = load("documents")
    dshift = base("documents", "doc_id")
    out = []
    for i in range(copies):
        c = shifted(docs, "doc_id", dshift, i)
        if i > 0:
            def perturb(t):
                toks = t.split(" ")
                for j in range(0, len(toks), 4):
                    toks[j] = f"v{i}w{j}"
                return f"v{i} " + " ".join(toks)
            texts = pa.array([perturb(t) for t in c.column("text").to_pylist()])
            c = c.set_column(c.schema.get_field_index("text"),
                             c.schema.field("text"), texts)
        out.append(c)
    dump("documents", pa.concat_tables(out))

    emb = load("embeddings")
    # vec_id joins doc_id (mm_crossmodal_join): shift by the DOCUMENTS
    # base — embeddings' own max (fewer vectors than docs) would land
    # copy-i vectors on copy-j documents
    vshift = dshift
    vecs = emb.column("embedding").to_pylist()
    out = []
    for i in range(copies):
        c = shifted(emb, "vec_id", vshift, i)
        if i > 0:
            rolled = pa.array([v[i:] + v[:i] for v in vecs],
                              type=emb.schema.field("embedding").type)
            c = c.set_column(c.schema.get_field_index("embedding"),
                             c.schema.field("embedding"), rolled)
        out.append(c)
    dump("embeddings", pa.concat_tables(out))
    print(f"wrote {copies}x corpus to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
