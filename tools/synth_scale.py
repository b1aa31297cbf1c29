"""Synthesize a larger scale factor from sf0.1 for the SCALE rehearsal.

Usage:
    python tools/synth_scale.py [--mult 10] [--out /tmp/pws_scale/sf1]

Builds documents/embeddings/events at MULT x the sf0.1 row counts, plus
symlinks for the small dimension tables, so any registered query can run
against the output dir. Deterministic (fixed numpy seeds per replica).

Design constraint — the statistic that must stay SCALE-INVARIANT is
duplicate/near-duplicate DENSITY, not duplicate identity: a naive
replicate-with-small-perturbation generator would turn every replica into
a near-dup of its original, making pair-materializing operators (x102,
x104, x115) look super-linear for corpus reasons rather than engine
reasons. So replicas resample ~50% of tokens from a same-language
vocabulary bag (8-gram shingle survival ~0.4% -> effectively unrelated
text), and a planted ~1% of each replica's docs are genuine near-dups
(2% substitution) plus ~0.2% exact dups, mirroring the sf0.1 rates.

The output is for TIMING ONLY (tools/scale_rehearsal.py); it is never
oracle-compared, so statistical realism beats bit-level fidelity.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _write(table: pa.Table, out: str, name: str) -> None:
    """Write a parquet table, first removing any existing path.

    A previous version of this tool symlinked orders/lineitem into the
    out dir; pq.write_table on a stale symlink would FOLLOW it and
    silently overwrite the canonical /root/testdata fixture. Unlinking
    first makes a stale out dir (symlink or regular file) harmless.
    """
    dst = os.path.join(out, f"{name}.parquet")
    if os.path.islink(dst) or os.path.exists(dst):
        os.unlink(dst)
    pq.write_table(table, dst)


def _docs(mult: int, out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = t["doc_id"].to_numpy()
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()
    n = len(doc_id)

    # per-language vocabulary bags for replacement draws
    vocab: dict[str, np.ndarray] = {}
    for lg in set(lang):
        bag: list[str] = []
        for txt, l2 in zip(text, lang):
            if l2 == lg:
                bag.extend(txt.split(" "))
        vocab[lg] = np.asarray(bag, dtype=object)

    ids, texts, langs, sources, nchars = (
        list(doc_id), list(text), list(lang), list(source),
        [len(s) for s in text],
    )
    for k in range(1, mult):
        rng = np.random.default_rng(1000 + k)
        for i in range(n):
            toks = np.asarray(text[i].split(" "), dtype=object)
            r = rng.random(len(toks))
            if rng.random() < 0.012:
                sub = r < 0.02     # planted near-dup of the original
            elif rng.random() < 0.002:
                sub = r < 0.0      # planted exact dup
            else:
                sub = r < 0.5      # fresh text from the same-lang bag
            if sub.any():
                bag = vocab[lang[i]]
                toks[sub] = bag[rng.integers(0, len(bag), int(sub.sum()))]
            s = " ".join(toks.tolist())
            ids.append(int(doc_id[i]) + k * n)
            texts.append(s)
            langs.append(lang[i])
            sources.append(source[i])
            nchars.append(len(s))

    _write(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(nchars, pa.int64()),
            }
        ),
        out,
        "documents",
    )
    print(f"documents: {len(ids)} rows")


def _embeddings(mult: int, out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vec_id = t["vec_id"].to_numpy()
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    label = t["label"].to_numpy()
    n, d = emb.shape

    all_ids = [vec_id]
    all_emb = [emb]
    all_lab = [label]
    for k in range(1, mult):
        rng = np.random.default_rng(2000 + k)
        # rotate within the label cluster structure: heavy noise makes a
        # genuinely new point; renormalize to keep the unit-norm fixture
        # convention
        noisy = emb + rng.normal(0.0, 0.35, size=emb.shape).astype(np.float32)
        noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
        all_ids.append(vec_id + k * n)
        all_emb.append(noisy.astype(np.float32))
        all_lab.append(label)

    _write(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for m in all_emb for row in m],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    np.concatenate(all_lab).astype("int32"), pa.int32()
                ),
            }
        ),
        out,
        "embeddings",
    )
    print(f"embeddings: {sum(len(x) for x in all_ids)} rows")


def _events(mult: int, out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = t.num_rows
    n_users = 1500  # sf0.1 user-id range
    ts_type = t.schema.field("ts").type
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    parts = [t]
    for k in range(1, mult):
        rng = np.random.default_rng(3000 + k)
        # new user block in the SAME time window (growth = more users,
        # constant per-user density) with a small ts jitter so no two
        # replicas collide on the exact tick
        jitter = rng.integers(-30 * per_sec, 30 * per_sec, n)  # +-30 s
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        t["event_id"].to_numpy() + k * n, pa.int64()
                    ),
                    "ts": pa.array(
                        t["ts"].cast(pa.int64()).to_numpy() + jitter,
                        pa.int64(),
                    ).cast(ts_type),
                    "user_id": pa.array(
                        t["user_id"].to_numpy() + k * n_users, pa.int64()
                    ),
                    "event_type": t["event_type"],
                    "value": t["value"],
                    "props": t["props"],
                }
            )
        )
    merged = pa.concat_tables(parts)
    _write(merged, out, "events")
    print(f"events: {merged.num_rows} rows")


def _tpch(mult: int, out: str) -> None:
    """Scale the relational fact tables (round-8: the S-series rehearsal).

    Replica k shifts o_orderkey/l_orderkey by k * KEYSPAN so orders and
    lineitem stay join-consistent; dimension keys (custkey, partkey,
    suppkey) keep their original ranges — growth means more facts per
    dimension row, which is how real warehouses grow. Dates/prices pass
    through so predicate selectivity and value distributions are
    scale-invariant."""
    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    lineitem = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    keyspan = int(
        max(
            orders["o_orderkey"].to_numpy().max(),
            lineitem["l_orderkey"].to_numpy().max(),
        )
        + 1
    )
    for name, t, keycol in (
        ("orders", orders, "o_orderkey"),
        ("lineitem", lineitem, "l_orderkey"),
    ):
        parts = [t]
        base_keys = t[keycol].to_numpy()
        for k in range(1, mult):
            cols = {c: t[c] for c in t.column_names}
            cols[keycol] = pa.array(base_keys + k * keyspan, pa.int64())
            parts.append(pa.table(cols))
        merged = pa.concat_tables(parts)
        _write(merged, out, name)
        print(f"{name}: {merged.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/pws_scale/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    _docs(args.mult, args.out)
    _embeddings(args.mult, args.out)
    _events(args.mult, args.out)
    _tpch(args.mult, args.out)
    # small dims pass through unchanged
    for name in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(args.out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    print(f"done: {args.out}")


if __name__ == "__main__":
    main()
