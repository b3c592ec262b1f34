"""Streaming-ingest throughput smoke: is per-batch cost flat as the
corpus grows?

The r6 verdict's last scale-killer was invisible to the query-level
bench: the per-micro-batch dedup joins re-scanned (and re-exploded) the
whole persisted minhash index, so batch wall time grew ~linearly with
corpus size. This harness makes that defect class mechanical: feed N
identical-size micro-batches into a growing corpus, print per-batch
wall seconds, and exit nonzero if the tail batches cost materially more
than the head batches.

Usage:
    python tools/ingest_smoke.py [N_BATCHES] [DOCS_PER_BATCH]

Defaults: 12 batches x 400 docs. Documents are deterministic synthetic
text (seeded RNG) with a controlled duplicate/near-dup rate so every
gate in the pipeline does real work each batch.

Pass/fail: median(last 3 batch walls) / median(batches 2-4) <= 2.0.
(Batch 1 is excluded from the head — it pays table creation. The
corpus grows 4x between head and tail, so a linear-in-corpus batch
cost would show up as a ~3-4x ratio; genuinely flat cost plus commit
overhead lands near 1.)
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu data spark stream batch "
    "corpus token model train filter shuffle scan index digest"
).split()


def make_docs(rng: random.Random, start_id: int, n: int) -> list[tuple]:
    docs = []
    for i in range(n):
        doc_id = start_id + i
        roll = rng.random()
        if roll < 0.05 and start_id > 0:
            # exact duplicate of an earlier doc's text (same seed path)
            dup_rng = random.Random(rng.randrange(start_id))
            text = " ".join(dup_rng.choices(WORDS, k=60))
        else:
            text = " ".join(random.Random(doc_id).choices(WORDS, k=60))
            if roll < 0.10:
                text += " extra tail token"  # near-dup of the base text
        docs.append((doc_id, text, "en", "smoke", None))
    return docs


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from konohadataplatform_spark.session import get_spark
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    spark = get_spark(app_name="ingest-smoke")
    tmp = tempfile.mkdtemp(prefix="ingest_smoke_")
    catalog = SnapshotCatalog(spark, tmp)
    pipe = DocIngestPipeline(spark, catalog, "smoke", maintain_every=0)
    rng = random.Random(7)

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    walls: list[float] = []
    for b in range(n_batches):
        docs = spark.createDataFrame(
            make_docs(rng, b * per_batch, per_batch), schema
        )
        t0 = time.perf_counter()
        pipe.apply_batch(docs, batch_id=b)
        walls.append(round(time.perf_counter() - t0, 3))
        print(
            f"batch {b:02d}: {walls[-1]:6.3f}s  "
            f"corpus={catalog.current_snapshot('smoke').row_count}",
            flush=True,
        )

    head = statistics.median(walls[1:4])
    tail = statistics.median(walls[-3:])
    ratio = round(tail / head, 2)
    print(json.dumps({
        "metric": "ingest_per_batch_wall",
        "batches": n_batches,
        "docs_per_batch": per_batch,
        "walls": walls,
        "head_median": round(head, 3),
        "tail_median": round(tail, 3),
        "tail_over_head": ratio,
        "unit": "sec",
    }))
    spark.stop()
    if ratio > 2.0:
        print(f"FAIL: tail batches {ratio}x head — per-batch cost is "
              "growing with corpus size", file=sys.stderr)
        return 1
    print(f"OK: tail/head = {ratio}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
