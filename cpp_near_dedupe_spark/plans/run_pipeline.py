"""spark-submit entry point for the dedupe pipeline.

Usage (local sandbox; on a cluster drop --master and submit with
``spark-submit --py-files cpp_near_dedupe_spark.zip -m ...``):

    python3 -m cpp_near_dedupe_spark.plans.run_pipeline \
        --input /path/to/pages_parquet --output /tmp/out \
        --checkpoint-dir /tmp/ckpt --threshold 0.7

Flags mirror the reference CLI (`/root/reference/CPPDeduper/
CPPDeduper.cpp:314-376`): --jaccardSim -> --threshold, --numMinhashKeys ->
--num-hashes, --bands, --dataColumnName -> --text-col. The reference's
``-m/--buckets`` flag is omitted: it was dead (a CLI bug wrote it into
numBands, `CPPDeduper.cpp:362`) and our band keys don't use bucket counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="PySpark near-dedupe pipeline")
    p.add_argument("--input", required=True, help="pages parquet dir or iceberg:<table>")
    p.add_argument("--output", required=True, help="output parquet dir (deduped pages)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--num-hashes", type=int, default=256)
    p.add_argument("--bands", type=int, default=64)
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--minhash-key-size", type=int, default=64, choices=(32, 64),
                   help="shingle hash width (reference -s flag): 64=XXH64, 32=FNV variant")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--order-col", default=None)
    p.add_argument("--hot-band-cap", type=int, default=None,
                   help="bucket size cap before star-routing (default: DedupeConfig)")
    p.add_argument("--pair-topology", default=None, choices=("chain_star", "all_pairs"),
                   help="per-bucket candidate topology (default: DedupeConfig)")
    p.add_argument("--master", default=None, help="e.g. local[8]; default from session")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--progress-interval", type=float, default=10.0,
                   help="seconds between live progress lines on stderr "
                        "(reference's 10 s ticker); 0 disables")
    args = p.parse_args(argv)

    from ..config import DedupeConfig
    from ..session import build_session
    from ..sources.pages import load_pages, with_doc_id
    from ..operators.resolve import dedupe_output
    from .pipeline import run_pipeline

    cfg_kw = dict(
        shingle_k=args.shingle_k,
        hash_bits=args.minhash_key_size,
        num_hashes=args.num_hashes,
        bands=args.bands,
        threshold=args.threshold,
        id_col=args.id_col,
        text_col=args.text_col,
        order_col=args.order_col,
    )
    if args.hot_band_cap is not None:
        cfg_kw["hot_band_cap"] = args.hot_band_cap
    if args.pair_topology is not None:
        cfg_kw["pair_topology"] = args.pair_topology
    cfg = DedupeConfig(**cfg_kw)
    cfg.validate()
    spark = build_session(
        app_name="near-dedupe",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    from .telemetry import ProgressTicker

    ticker = None
    if args.progress_interval > 0:
        ticker = ProgressTicker(spark, interval=args.progress_interval).start()

    docs = with_doc_id(load_pages(spark, args.input), cfg)
    n_in = docs.count()

    # pipeline-proper timing: sketch → bands → pairs → score → CC → resolve,
    # materialized via the resolved aggregate. The passthrough output copy
    # (the reference's separate post-drain file-splice phase,
    # DupeResolverThread.h:138-196) is timed separately — it is disk-bound
    # payload I/O, not pipeline compute.
    t0 = time.time()
    # the resume token binds to the input CONTENT, not just its path: a
    # rewritten-in-place input (same path, different rows) must invalidate
    # stage checkpoints rather than silently resume over stale data
    res = run_pipeline(
        spark, docs, cfg,
        checkpoint_dir=args.checkpoint_dir,
        input_token=f"{args.input}:rows={n_in}",
    )
    n_dupes = res.resolved.filter("NOT is_kept").count()
    pipeline_wall = time.time() - t0

    t1 = time.time()
    kept = dedupe_output(docs, res.resolved, cfg)
    kept.write.mode("overwrite").parquet(args.output)
    output_wall = time.time() - t1

    n_out = spark.read.parquet(args.output).count()
    summary = {
        "input_rows": n_in,
        "output_rows": n_out,
        "duplicates_removed": n_in - n_out,
        "pipeline_wall_sec": round(pipeline_wall, 2),
        "output_write_sec": round(output_wall, 2),
        "wall_sec": round(time.time() - t0, 2),
        "docs_per_sec": round(n_in / max(pipeline_wall, 1e-9), 1),
        "config_fingerprint": cfg.fingerprint(),
    }
    assert n_in - n_out == n_dupes, "dupe accounting mismatch"
    if ticker is not None:
        ticker.stop()
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
