#!/usr/bin/env python3
"""Driver-side synthesizer for the dedup/ANN scale-stress corpora.

Writes the same layout graft.examples.ScaleGen produces in-cluster
(planted near/exact twins, an identical-text mega-cluster, a
stop-shingle prefix, embedding twins) so the harness's recall and
hot-bucket assertions have closed-form ground truth:

  documents_clean.parquet  doc_id, text, lang, n_chars
  documents_adv.parquet    clean + mega-cluster (ids >= 3n)
  doc_pairs.parquet        a_id, b_id, kind in {near, exact}
  embeddings.parquet       vec_id, label, embedding float[64]
  emb_pairs.parquet        a_id, b_id  (cosine >= 0.999 twins)

Usage: python3 tools/gen_scale.py --docs 1000000 --vecs 100000 \
           --out /tmp/graft_scale
(Vectorized numpy generation; ~1e6 docs in well under a minute. The
Scala ScaleGen is the canonical in-cluster form — at real scale the
corpus generator itself must be distributed; this exists for
driver-side workflows that want the files without sbt.)
"""
import argparse
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

STOP = "the quick brown fox jumps"


def doc_texts(rng, n, words_per=30, vocab=50000):
    u = rng.random((n, words_per))
    idx = (u ** 3 * vocab).astype(np.int64)  # zipf-ish head
    flat = np.char.add("w", np.char.zfill(idx.astype("U5"), 5))
    texts = np.array([" ".join(row) for row in flat], dtype=object)
    stop_mask = (np.arange(n) % 3) == 0
    texts[stop_mask] = STOP + " " + texts[stop_mask]
    return texts


def doc_table(ids, texts):
    langs = np.array(["en", "fr", "de"], dtype=object)[ids % 3]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int32()),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--vecs", type=int, default=100000)
    ap.add_argument("--mega", type=int, default=0,
                    help="mega-cluster size (default docs/50, min 2000)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    n, m = a.docs, a.vecs
    mega = a.mega or max(2000, n // 50)
    rng = np.random.default_rng(a.seed)
    os.makedirs(a.out, exist_ok=True)

    base_ids = np.arange(n, dtype=np.int64)
    base_texts = doc_texts(rng, n)
    near_src = base_ids[base_ids % 10 == 0]
    near_texts = np.array(
        [base_texts[i] + f" zz{i}" for i in near_src], dtype=object)
    exact_src = base_ids[base_ids % 100 == 7]
    exact_texts = base_texts[exact_src]
    clean = doc_table(
        np.concatenate([base_ids, near_src + n, exact_src + 2 * n]),
        np.concatenate([base_texts, near_texts, exact_texts]))
    pq.write_table(clean, f"{a.out}/documents_clean.parquet")

    mega_ids = 3 * n + np.arange(mega, dtype=np.int64)
    mega_texts = np.repeat(doc_texts(rng, 1), mega)
    adv = pa.concat_tables([clean, doc_table(mega_ids, mega_texts)])
    pq.write_table(adv, f"{a.out}/documents_adv.parquet")

    pairs = pa.table({
        "a_id": pa.array(np.concatenate([near_src, exact_src]),
                         pa.int64()),
        "b_id": pa.array(np.concatenate([near_src + n,
                                         exact_src + 2 * n]), pa.int64()),
        "kind": pa.array(["near"] * len(near_src) +
                         ["exact"] * len(exact_src), pa.string()),
    })
    pq.write_table(pairs, f"{a.out}/doc_pairs.parquet")

    # embeddings: 2000 blobs + cosine>=0.999 twins for ids ≡ 0 (mod 10)
    dim = 64
    centers = rng.uniform(-1, 1, (2000, dim))
    vid = np.arange(m, dtype=np.int64)
    basev = (centers[vid % 2000] +
             rng.uniform(-0.25, 0.25, (m, dim))).astype(np.float32)
    twin_src = vid[vid % 10 == 0]
    twins = (basev[twin_src] +
             rng.uniform(-0.004, 0.004,
                         (len(twin_src), dim))).astype(np.float32)
    allv = np.concatenate([basev, twins])
    all_ids = np.concatenate([vid, twin_src + m])
    emb = pa.table({
        "vec_id": pa.array(all_ids, pa.int64()),
        "label": pa.array((all_ids % 50).astype(np.int32), pa.int32()),
        "embedding": pa.array(list(allv),
                              pa.list_(pa.float32(), dim)),
    })
    pq.write_table(emb, f"{a.out}/embeddings.parquet")
    pq.write_table(pa.table({
        "a_id": pa.array(twin_src, pa.int64()),
        "b_id": pa.array(twin_src + m, pa.int64()),
    }), f"{a.out}/emb_pairs.parquet")
    print(f"wrote scale corpora to {a.out}: clean={clean.num_rows} "
          f"adv={adv.num_rows} pairs={pairs.num_rows} "
          f"emb={emb.num_rows}")


if __name__ == "__main__":
    main()
