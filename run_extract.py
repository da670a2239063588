"""CLI entry point for spark-submit (the engine's run_dpsk_ocr_*.py):

    spark-submit --py-files dist/deepseek_ocr_spark.zip run_extract.py \
        --input <documents-or-pages parquet> --output <dir> \
        --job spans|pages|locate|dedup|cluster|curate|trainprep \
        [--label title] [--no-resume] [--partitions N]
        (--output is the signature-store dir for dedup/cluster; cluster
        consolidates the store's dup log into transitive duplicate
        clusters and ignores --input; trainprep turns a curated corpus
        into holdout + temperature-mixed + packed training shards)

Local run: python run_extract.py --input ... --output ... --job spans
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=False)
    ap.add_argument("--output", required=False)
    ap.add_argument(
        "--job",
        choices=[
            "spans", "pages", "locate", "dedup", "cluster", "curate",
            "trainprep",
        ],
        default="spans",
    )
    ap.add_argument("--label", default="title", help="span kind for --job locate")
    ap.add_argument(
        "--benchmark",
        default=None,
        help="eval-set parquet for --job curate decontamination (optional)",
    )
    ap.add_argument(
        "--keep-cols",
        default="",
        help="comma-separated metadata columns --job curate carries "
        "through to the curated corpus (e.g. 'lang' so --job trainprep "
        "can mix on it)",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if args.partitions is not None and args.job != "spans":
        ap.error("--partitions only applies to --job spans")
    if args.job != "cluster" and not args.input:
        ap.error(f"--input required for --job {args.job}")

    from deepseek_ocr_spark import jobs
    from deepseek_ocr_spark.session import get_spark

    spark = get_spark(app_name=f"extract-{args.job}")
    if args.job == "spans":
        if not args.output:
            ap.error("--output required for --job spans")
        stats = jobs.run_spans_job(
            spark,
            args.input,
            args.output,
            resume=not args.no_resume,
            partitions=args.partitions,
        )
        print(json.dumps(stats))
    elif args.job == "pages":
        if not args.output:
            ap.error("--output required for --job pages")
        docs = jobs.run_pages_job(spark, args.input, args.output)
        print(json.dumps({"docs": docs.count()}))
    elif args.job == "dedup":
        if not args.output:
            ap.error("--output (the signature-store dir) required for --job dedup")
        print(json.dumps(jobs.run_dedup_job(spark, args.input, args.output)))
    elif args.job == "cluster":
        if not args.output:
            ap.error("--output (the signature-store dir) required for --job cluster")
        print(json.dumps(jobs.run_cluster_job(spark, args.output)))
    elif args.job == "trainprep":
        if not args.output:
            ap.error("--output required for --job trainprep")
        print(
            json.dumps(jobs.run_training_prep_job(spark, args.input, args.output))
        )
    elif args.job == "curate":
        if not args.output:
            ap.error("--output required for --job curate")
        print(
            json.dumps(
                jobs.run_curation_job(
                    spark,
                    args.input,
                    args.output,
                    benchmark_path=args.benchmark,
                    keep_cols=tuple(
                        c for c in args.keep_cols.split(",") if c
                    ),
                )
            )
        )
    else:
        out = jobs.locate_job(spark, args.input, args.label)
        for r in out.limit(20).collect():
            print(json.dumps(r.asDict()))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
