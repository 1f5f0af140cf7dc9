"""Round-4 BPE scale demonstration (VERDICT r3 item 1 "done" check):
a 500-merge TRAIN and a 1k-merge ENCODE complete at sf0.1 with bounded
plan-compile time.

- train: ``bpe_merges_fast`` — one distributed word-count pass over
  the sf0.1 documents corpus, then the incremental-delta driver loop.
- encode: ``bpe_encode_fast`` — constant-size map-only plan, Arrow
  batches, memoized per-word pieces; applied with the 1000-merge
  table trained above.
- segmented window chain: ``bpe_encode(checkpoint_every=16)`` at a
  192-merge budget — shows the SQL-replayable path also survives a
  production-ish budget with per-segment (not per-corpus) compile
  cost; per-segment plans carry <=16*5 windows and zero fresh
  exchanges after the first segment (tests/test_plan_gates_r4.py).

Usage: python scripts/bpe_scale_check.py [sf_dir] [n_train] [n_encode]
Prints one JSON line with timings + row counts.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grandiso_networkx_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_encode = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    from grandiso_networkx_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_fast,
        bpe_merges_fast,
    )

    spark = get_spark(app_name="bpe-scale", shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out: dict = {"sf_dir": sf_dir}

    t0 = time.time()
    m500 = bpe_merges_fast(docs, n_merges=500)
    out["train_500_rows"] = m500.count()
    out["train_500_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    mtab = bpe_merges_fast(docs, n_merges=n_train)
    mlist = [
        (r["left"], r["right"]) for r in mtab.orderBy("merge_idx").collect()
    ]
    out["train_1000_rows"] = len(mlist)
    out["train_1000_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    enc = bpe_encode_fast(docs, mlist[:n_encode])
    out["encode_fast_rows"] = enc.count()
    out["encode_fast_merges"] = min(n_encode, len(mlist))
    out["encode_fast_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    enc_seg = bpe_encode(docs, mlist[:192], checkpoint_every=16)
    out["encode_segmented_rows"] = enc_seg.count()
    out["encode_segmented_merges"] = min(192, len(mlist))
    out["encode_segmented_sec"] = round(time.time() - t0, 2)

    # The sf0.1 documents corpus has a small synthetic vocabulary and
    # saturates (all words fully merged) before ~100 merges, so the
    # 500/1000-merge legs need a richer corpus: a SEEDED deterministic
    # one — 30k distinct words (len 6-14, 8-letter alphabet for pair
    # collisions), Zipf-weighted into 50k docs of 30 words.
    import numpy as np

    rng = np.random.RandomState(7)
    nw = 30_000
    lens = rng.randint(6, 15, size=nw)
    letters = np.array(list("abcdefgh"))
    vocab = [
        "".join(letters[rng.randint(0, len(letters), size=ln)])
        for ln in lens
    ]
    ranks = np.arange(1, nw + 1, dtype="float64")
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    picks = rng.choice(nw, size=(50_000, 30), p=p)
    import pandas as pd

    varr = np.array(vocab, dtype=object)
    rich = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": np.arange(50_000, dtype="int64"),
                "text": [" ".join(varr[row]) for row in picks],
            }
        )
    ).repartition(32).localCheckpoint()

    t0 = time.time()
    mrich = bpe_merges_fast(docs=rich, n_merges=n_train)
    rlist = [
        (r["left"], r["right"]) for r in mrich.orderBy("merge_idx").collect()
    ]
    out["rich_train_merges"] = len(rlist)
    out["rich_train_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    enc_rich = bpe_encode_fast(rich, rlist[:n_encode])
    out["rich_encode_fast_rows"] = enc_rich.count()
    out["rich_encode_fast_merges"] = min(n_encode, len(rlist))
    out["rich_encode_fast_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
