#!/usr/bin/env python3
"""Dev evidence tool: tile the driver's sf0.1 star schema to an
sf1-equivalent so a bench tier exists where per-row work dominates
Spark's fixed job overhead (at sf0.1 the engine total is ~80% scheduler
overhead; r7 verdict item 5).

Tiling, not re-synthesis: copy k of each fact/dim row shifts every join
key by k*KEY_STRIDE, so referential integrity, key distributions, and
selectivities match the driver data exactly at 10x the volume. The two
content tables are perturbed per tile so self-similarity workloads
scale like a larger corpus instead of degenerating into 10-way
exact-duplicate groups:
  - documents: every word is prefixed with the tile tag (t1w042 ...),
    so shingle/minhash/jaccard candidates stay within-tile (a 10x
    corpus with 10x the dup groups), token counts and doc lengths are
    preserved, and vocab grows with the corpus as a real one would.
    n_chars is recomputed.
  - embeddings: vectors are np.roll'ed by the tile index — norms (and
    the int8-quantization workload) are preserved, directions change,
    so no cross-tile cosine~1 twin structure is planted.
region/nation are shared dimensions and copied as-is.

Physical schemas are preserved column-for-column (timestamp[us] stays
timestamp[us] — Tables.load's NTZ handling applies unchanged).

Usage: python3 tools/gen_star_sf1.py --mult 10 --out /tmp/graft_sf1
"""
import argparse
import os
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000  # > any sf0.1 key; keeps shifted keys disjoint

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def shifted(tbl: pa.Table, name: str, k: int) -> pa.Table:
    out = tbl
    for c in SHIFT_COLS[name]:
        i = out.schema.get_field_index(c)
        out = out.set_column(i, out.schema.field(i),
                             pc.add(out.column(c), k * KEY_STRIDE))
    if name == "documents" and k > 0:
        tag = f"t{k}"
        texts = tbl.column("text").to_pylist()
        new = [None if t is None else
               " ".join(tag + w for w in t.split(" ")) for t in texts]
        i = out.schema.get_field_index("text")
        out = out.set_column(i, out.schema.field(i),
                             pa.array(new, pa.string()))
        j = out.schema.get_field_index("n_chars")
        out = out.set_column(j, out.schema.field(j),
                             pa.array([None if t is None else len(t)
                                       for t in new], pa.int64()))
    if name == "embeddings" and k > 0:
        emb = tbl.column("embedding").combine_chunks()
        # np.array on a ragged/None list would crash (or build an
        # object array) — make the no-null, fixed-dim assumption loud
        assert emb.null_count == 0, \
            "embeddings.embedding has nulls; tiling assumes none"
        mat = np.array(emb.to_pylist(), dtype=np.float32)
        dim = mat.shape[1]
        # roll by k % dim ALONE would alias tiles k and k+dim onto the
        # same directions (cross-tile cosine~1 twins this tool exists
        # to avoid) — so each tile also gets a deterministic ±1 sign
        # mask (seeded by the tile index): norms and the int8-
        # quantization workload are preserved exactly, directions are
        # distinct across tiles for any k (equal-roll tiles differ by
        # independent sign patterns).
        signs = np.random.RandomState(k).choice(
            np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        rolled = np.roll(mat, k % dim, axis=1) * signs
        i = out.schema.get_field_index("embedding")
        out = out.set_column(
            i, out.schema.field(i),
            pa.array(list(rolled), pa.list_(pa.float32())))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    # the vector workloads (knn/ann/semantic-dedup) need far more rows
    # than a 10x tile of the 2k-vector table to dominate fixed
    # overhead — r8 verdict item 4 asks for ~200k vectors (=100x)
    ap.add_argument("--emb-mult", type=int, default=None,
                    help="tile count for embeddings (default: --mult)")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    emb_mult = a.emb_mult if a.emb_mult is not None else a.mult
    os.makedirs(a.out, exist_ok=True)
    for name in COPY_AS_IS:
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tbl, f"{a.out}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows (shared dim)")
    for name in SHIFT_COLS:
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        mult = emb_mult if name == "embeddings" else a.mult
        # A <name>.parquet DIRECTORY of ~8 MB files (≥ 8 of them) with
        # ~4 row groups each — the multi-file shape every real cluster
        # output has, at writer-realistic sizes. Two measured failure
        # modes bracket this choice (CORES_SCALE.md r11):
        #  - the old single-file row_group_size=1_000_000 layout put
        #    documents (50k rows) and embeddings (200k rows) into ONE
        #    row group each — and a Parquet row group is the
        #    scan-split granularity, so every content-table scan (and
        #    the codegen pipeline fused into it: regex, shingling,
        #    dot products) ran in ONE task at any core count, at the
        #    sf10 tier too (100 tiles still < 1M rows; DuckDB
        #    parallelizes by row group as well, so the committed
        #    ratios stayed fair while both engines ran serial scans);
        #  - the first fix (one file per TILE) made embeddings 100 ×
        #    0.31 MB files with 250-row row groups, and the
        #    iterative/multi-pass vector ops paid per-split overhead
        #    every pass (isolated A/B: dedup_embed_lsh 2.9 → 4.2 s,
        #    ann_pq_probe 5.9 → 7.4 s vs the single-file control).
        out_dir = f"{a.out}/{name}.parquet"
        os.makedirs(out_dir, exist_ok=True)
        big = pa.concat_tables(
            [shifted(tbl, name, k) for k in range(mult)])
        total_bytes = os.path.getsize(f"{SRC}/{name}.parquet") * mult
        n_files = max(8, round(total_bytes / (8 << 20)))
        rows_per_file = -(-big.num_rows // n_files)  # ceil
        row_group = max(1024, rows_per_file // 4)
        i, part = 0, 0
        while i < big.num_rows:
            pq.write_table(
                big.slice(i, rows_per_file),
                f"{out_dir}/part-{part:05d}.parquet",
                row_group_size=row_group)
            i += rows_per_file
            part += 1
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows "
              f"({part} files, {row_group} rows/group)")


if __name__ == "__main__":
    main()
