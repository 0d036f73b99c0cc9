"""One-off evidence run: the full streaming composition at sf0.1 —
dedup-on-ingest -> per-batch dim-refreshed enrichment -> REAL routed
fan-out write (streaming.routed_sink) — with per-sink count parity of
the WRITTEN output checked against the batch path (fingerprint dedup +
enrich) over the same rows.

The pytest (`test_dedup_enrich_stream_routed_fanout`) pins the same
parity on 120 rows; this script is the at-scale rehearsal the round
record cites in BASELINE.md: ~590k turns through micro-batched
ingestion into the same one-directory-per-sink layout the batch job
writes, byte-compatible for downstream per-sink consumers.

Usage: python scripts/streaming_fanout_sf01.py [sf_dir]
Prints one JSON line with wall times, sink count, row totals, parity.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from fluent_plugin_kubernetes_metadata_filter_spark import streaming  # noqa: E402
from fluent_plugin_kubernetes_metadata_filter_spark.enrich import enrich  # noqa: E402
from fluent_plugin_kubernetes_metadata_filter_spark.io import aux_dir  # noqa: E402
from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import (  # noqa: E402
    _content_fingerprint,
)
from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session  # noqa: E402


def main() -> dict:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app="stream-fanout-sf01", master="local[16]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = aux_dir(sf)
    out = tempfile.mkdtemp(prefix="stream-routed-")
    ckpt = tempfile.mkdtemp(prefix="stream-ckpt-")
    staged = tempfile.mkdtemp(prefix="stream-in-")
    try:
        # stage the single-file transcripts table as 8 files so the file
        # source genuinely micro-batches (maxFilesPerTrigger=2 -> 4
        # batches), exercising cross-batch dedup state and per-batch dim
        # refresh instead of one availableNow mega-batch
        spark.read.parquet(f"{base}/transcripts.parquet").repartition(8) \
            .write.parquet(f"{staged}/transcripts.parquet")
        stream = streaming.read_transcript_stream(
            spark, f"{staged}/transcripts.parquet", max_files_per_trigger=2,
            glob="*.parquet",
        )
        loader = streaming.default_dims_loader(spark, sf)
        t0 = time.time()
        # BACKFILL watermark sizing: the staged files interleave event
        # times (repartition is hash order), so a live-tail 30-minute
        # delay would classify ~half of batches 2..4 as late and DROP
        # them — measured: written 588,293 of 1,175,527 with the
        # default. A historical replay sizes the watermark to the
        # replay horizon (state stays bounded by the corpus being
        # finite); the live-tail TTL trade is dedup_stream's documented
        # contract and is exercised by the pinned-ts pytest instead.
        q = streaming.dedup_enrich_stream(
            stream, loader, streaming.routed_sink(out), checkpoint_dir=ckpt,
            delay="3650 days",
        )
        q.awaitTermination(1800)
        stream_wall = round(time.time() - t0, 1)

        written = {
            (r.sink or "__passthrough__"): r.n
            for r in spark.read.parquet(out)
            .groupBy(F.col("namespace_name").cast("string").alias("sink"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        t1 = time.time()
        pods, ns = loader()
        src = spark.read.parquet(f"{base}/transcripts.parquet")
        batch_in = (
            src.withColumn("_fp", _content_fingerprint("text"))
            .dropDuplicates(["_fp"])
            .drop("_fp")
        )
        batch = {
            (r.sink or "__passthrough__"): r.n
            for r in enrich(batch_in, pods, ns)
            .groupBy(F.col("namespace_name").alias("sink"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        batch_wall = round(time.time() - t1, 1)
        result = {
            "sf": sf,
            "input_rows": src.count(),
            "written_rows": sum(written.values()),
            "n_sinks": len(written),
            "stream_wall_s": stream_wall,
            "batch_wall_s": batch_wall,
            "parity": written == batch,
            "mismatches": {
                k: (written.get(k), batch.get(k))
                for k in set(written) | set(batch)
                if written.get(k) != batch.get(k)
            },
        }
        print(json.dumps(result))
        return result
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
