"""Fabricate a scaled-up perf dataset from an existing sf directory
(round 6 scale checks; guide §1 "optimizations must hold at both sizes").

Replicates every fact table R times with shifted keys so referential
integrity, per-key group sizes and violation densities are preserved
(each replica is an independent shard of the same distribution — totals
scale linearly, per-group structure stays constant):

- keys get a per-replica offset of (max_key + 1), applied consistently
  across FK pairs (orders.o_custkey follows customer, lineitem follows
  orders/part/supplier, events.user_id gets its own space, ...);
- document TEXT is perturbed with a per-replica Caesar map on every 5th
  token (position offset varies by replica) — same byte length (n_chars
  stays truthful), different shingles, so cross-replica docs are NOT
  near-duplicates and dedup candidate counts scale linearly instead of
  quadratically;
- embedding vectors get a tiny per-(replica, dim) additive perturbation
  so cross-replica vectors are not bit-identical (no pathological
  distance ties in top-k);
- dimension tables (region, nation) are copied once — fact FKs into them
  are untouched.

Output layout is realistic multi-file: <out>/<table>.parquet/ is a
DIRECTORY with one file per replica (so scans have real splits, unlike
the single-file single-row-group sf fixtures).

Usage: python tools/make_scaled_sf.py [src_sf_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ("region", "nation")
FACTS = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# table -> {column: key-space} ; every column sharing a key-space gets the
# same per-replica offset (max over the space's defining column + 1)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
# key-space -> (table, column) that defines its width
SPACE_DEF = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _caesar(tok: str, shift: int) -> str:
    # same-length token rewrite; only lowercase ascii rotates, so byte
    # length (and n_chars) is exactly preserved
    return "".join(
        chr((ord(c) - 97 + shift) % 26 + 97) if "a" <= c <= "z" else c for c in tok
    )


def _perturb_text(text: str, rep: int) -> str:
    if rep == 0 or not text:
        return text
    toks = text.split(" ")
    start = rep % 5
    for p in range(start, len(toks), 5):
        toks[p] = _caesar(toks[p], rep)
    return " ".join(toks)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in DIMS + FACTS}
    width = {
        space: pc.max(tables[t][c]).as_py() + 1 for space, (t, c) in SPACE_DEF.items()
    }

    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        d = f"{out}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        pq.write_table(tables[t], f"{d}/part-00000.parquet")
        print(t, tables[t].num_rows, "(copied once)")

    for t in FACTS:
        base = tables[t]
        d = f"{out}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        for rep in range(reps):
            tt = base
            for col, space in KEYED[t].items():
                idx = tt.schema.get_field_index(col)
                shifted = pc.add(tt[col], pa.scalar(rep * width[space], tt[col].type))
                tt = tt.set_column(idx, tt.schema.field(idx), shifted)
            if t == "documents" and rep:
                idx = tt.schema.get_field_index("text")
                texts = [_perturb_text(v, rep) for v in tt["text"].to_pylist()]
                tt = tt.set_column(
                    idx, tt.schema.field(idx), pa.array(texts, type=pa.string())
                )
            if t == "embeddings" and rep:
                idx = tt.schema.get_field_index("embedding")
                col = tt["embedding"].combine_chunks()
                vals = col.values.to_numpy(zero_copy_only=False).copy()
                import numpy as np

                j = np.arange(len(vals))
                vals += ((rep * 31 + j) % 7 - 3).astype("float32") * 1e-3
                new = pa.ListArray.from_arrays(
                    col.offsets, pa.array(vals, type=pa.float32())
                )
                tt = tt.set_column(idx, tt.schema.field(idx), new)
            pq.write_table(tt, f"{d}/part-{rep:05d}.parquet")
        print(t, base.num_rows, "x", reps)

    open(f"{out}/_DONE", "w").close()
    print("wrote", out)


if __name__ == "__main__":
    main()
