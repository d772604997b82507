"""End-to-end command-line entry point — the reference's batch journey
(engine_test.py:6-30 run_dedup / app.py:80-126 process-all loop, minus the
Streamlit UI), runnable without writing any Python:

    python -m datafusion_dedup_ai_spark INPUT [INPUT ...]
        [--column NAME] [--out DIR] [--hard 0.90] [--soft 0.85]
        [--no-subsidiary-fold] [--order-column NAME]

Per input file (csv/xlsx, format-dispatched like the reference):

1. read it (sources.read_input), auto-detecting the company-name column as
   the first string column when --column is omitted (reference
   engine_test.py:14-16); a file missing the requested column is warned
   about and skipped, not fatal (app.py:91-92);
2. run the full dedup pipeline (plans.pipeline.dedup_pipeline);
3. write the reference's three workbooks (outputs.py:22-59) into --out
   (default: the input file's directory, engine_test.py:21-22):
   company_duplicates_final.xlsx (clusters + canonical_summary + settings
   sheets), golden_mapping.xlsx (mapping), high_confidence_review.xlsx
   (review) — with one input the reference's exact filenames, with several
   the per-file names app.py uses (dedup_final_<name>.xlsx, ...);
4. print the stats quadruple (engine_test.py:25-28).

``--order-column``: a unique numeric key making row_order deterministic
without a global sort (mandatory at scale — see operators/blocking.py
prepare_names). Without it, row_order falls back to the name-sorted rank:
correct and deterministic, but a single-partition sort, fine only at
CLI-file scale.

Subcommand — the LLM-pipeline journey (round-10):

    python -m datafusion_dedup_ai_spark curate DOCS.parquet [--out DIR]

runs the oracle-gated clean_corpus -> deterministic split -> manifest
composition over a (doc_id, text) parquet and writes manifest.parquet +
stats.json (see curate_main).
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m datafusion_dedup_ai_spark",
        description="Dedupe company names in csv/xlsx files into the "
        "reference's three report workbooks.",
    )
    p.add_argument("inputs", nargs="+", help="input .csv/.xlsx file(s)")
    p.add_argument("--column", help="company-name column (default: first string column)")
    p.add_argument("--out", help="output directory (default: each input's directory)")
    p.add_argument("--hard", type=float, default=0.90, help="hard match threshold")
    p.add_argument("--soft", type=float, default=0.85, help="soft match threshold")
    p.add_argument(
        "--no-subsidiary-fold",
        action="store_true",
        help="disable the subsidiary-suffix folding step",
    )
    p.add_argument(
        "--order-column",
        help="unique numeric key column for deterministic row_order at scale",
    )
    return p


def _build_curate_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m datafusion_dedup_ai_spark curate",
        description="Curate a (doc_id, text) parquet corpus into a training "
        "manifest: quality/language filter -> exact dedup -> near-dup "
        "removal -> deterministic 80/10/10 split -> chunk counts.",
    )
    p.add_argument("docs", help="input parquet with doc_id BIGINT, text STRING")
    p.add_argument(
        "--out",
        help="output directory (default: <docs dir>/curated); writes "
        "manifest.parquet + stats.json",
    )
    p.add_argument(
        "--bpe-tokens",
        action="store_true",
        help="train a BPE piece vocabulary on the input corpus and add "
        "real-tokenizer n_bpe_tokens per doc (token-budget planning "
        "consumes these; whitespace n_tokens is the cheap default)",
    )
    p.add_argument(
        "--near-dup-tier",
        choices=("exact", "minhash"),
        default="exact",
        help="near-dup victim generator: 'exact' (word-bigram Jaccard "
        "self-join — ground truth, quadratic in per-shingle document "
        "frequency) or 'minhash' (LSH candidates + two-phase verify at "
        "the same threshold — the scale tier; recall follows the LSH "
        "S-curve, see clean_corpus_frame)",
    )
    return p


def curate_main(argv: list[str], spark=None) -> int:
    """The LLM-pipeline counterpart of the dedup journey (round-9 verdict
    #8): run the registered clean_corpus -> split -> manifest composition
    (queries_curation.training_manifest_frame, every stage oracle-gated)
    over a user parquet, no Python required. Writes manifest.parquet and a
    per-split stats.json, prints the stats table."""
    import json

    from datafusion_dedup_ai_spark.queries_curation import (
        training_manifest_frame,
    )
    from datafusion_dedup_ai_spark.session import build_session

    args = _build_curate_parser().parse_args(argv)
    owns_session = spark is None
    if owns_session:
        spark = build_session(app_name="curate-cli")
    try:
        docs = spark.read.parquet(args.docs)
        missing = {"doc_id", "text"} - set(docs.columns)
        if missing:
            print(
                f"{args.docs}: missing required column(s) {sorted(missing)}",
                file=sys.stderr,
            )
            return 1
        out_dir = args.out or os.path.join(
            os.path.dirname(os.path.abspath(args.docs)), "curated"
        )
        bpe_pieces = None
        if args.bpe_tokens:
            # Train on the input corpus itself (the hash_fixtures shape:
            # word counts -> deterministic count-then-lex merges). The
            # vocabulary-sized collect is the documented driver-side-model
            # exception — Heaps-law-small on any corpus.
            from pyspark.sql import functions as F

            from datafusion_dedup_ai_spark.functions import text as T
            from datafusion_dedup_ai_spark.operators import tokenizer as TK

            wc = (
                docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
                .where(F.col("tok") != "")
                .groupBy("tok")
                .agg(F.count("*").alias("c"))
                .collect()
            )
            bpe_pieces = TK.bpe_vocab_pieces([(r["tok"], r["c"]) for r in wc])
        manifest = training_manifest_frame(
            docs, bpe_pieces=bpe_pieces, near_dup_tier=args.near_dup_tier
        )
        manifest.write.mode("overwrite").parquet(
            os.path.join(out_dir, "manifest.parquet")
        )
        from pyspark.sql import functions as F

        written = spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))
        aggs = [
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chunks").alias("n_chunks"),
        ]
        if "n_bpe_tokens" in written.columns:
            aggs.append(F.sum("n_bpe_tokens").alias("n_bpe_tokens"))
        stats_rows = (
            written.groupBy("split").agg(*aggs).orderBy("split").collect()
        )
        n_in = docs.count()
        stats = {
            "input_docs": n_in,
            "kept_docs": sum(r["n_docs"] for r in stats_rows),
            "near_dup_tier": args.near_dup_tier,
            "splits": {
                r["split"]: {
                    "n_docs": r["n_docs"],
                    "n_tokens": int(r["n_tokens"]),
                    "n_chunks": int(r["n_chunks"]),
                    **(
                        {"n_bpe_tokens": int(r["n_bpe_tokens"])}
                        if "n_bpe_tokens" in r.asDict()
                        else {}
                    ),
                }
                for r in stats_rows
            },
        }
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2, sort_keys=True)
        print("\nCuration Complete!")
        print(f"Input Docs: {stats['input_docs']}")
        print(f"Kept Docs: {stats['kept_docs']}")
        for split, s in stats["splits"].items():
            print(
                f"  {split}: {s['n_docs']} docs, {s['n_tokens']} tokens, "
                f"{s['n_chunks']} chunks"
            )
        print(f"Manifest written to: {out_dir}")
        return 0
    finally:
        if owns_session:
            spark.stop()


def main(argv: list[str] | None = None, spark=None) -> int:
    """CLI body. ``spark``: tests inject their shared session (then it is
    NOT stopped here); the command line builds and owns one."""
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "curate":
        return curate_main(argv[1:], spark)
    args = _build_parser().parse_args(argv)

    from datafusion_dedup_ai_spark.config import DedupConfig
    from datafusion_dedup_ai_spark.plans.pipeline import (
        canonical_summary,
        dedup_pipeline,
        golden_mapping,
        high_confidence_review,
        run_stats,
    )
    from datafusion_dedup_ai_spark.session import build_session
    from datafusion_dedup_ai_spark.sources.readers import (
        first_string_column,
        read_input,
    )
    from datafusion_dedup_ai_spark.sources.sinks import (
        settings_sheet,
        write_xlsx_bytes,
    )

    config = DedupConfig(
        hard_threshold=args.hard,
        soft_threshold=args.soft,
        no_subsidiary_fold=args.no_subsidiary_fold,
    )
    owns_session = spark is None
    if owns_session:
        spark = build_session(app_name="dedup-cli")
    single = len(args.inputs) == 1
    rc = 0
    try:
        for path in args.inputs:
            print(f"Loading file: {path}")
            df = read_input(spark, path)
            column = args.column or first_string_column(df)
            if column not in df.columns:
                print(
                    f"Skipping {path}: column {column!r} not found.",
                    file=sys.stderr,
                )
                rc = 1
                continue
            clusters = dedup_pipeline(
                df, column, config, order_col=args.order_column
            )
            # Reference clusters-sheet projection (outputs.py:23-24) —
            # block_key is internal and stays out of the workbook.
            sheet_cols = [
                "row_order",
                "original_name",
                "normalized_name",
                "base_name",
                "cluster_id",
                "cluster_size",
                "canonical_name",
                "confidence",
                "reason",
            ]
            out_dir = args.out or os.path.dirname(os.path.abspath(path))
            os.makedirs(out_dir, exist_ok=True)
            stem = os.path.basename(path)
            names = (
                ("company_duplicates_final.xlsx", "golden_mapping.xlsx",
                 "high_confidence_review.xlsx")
                if single
                else (f"dedup_final_{stem}.xlsx", f"golden_{stem}.xlsx",
                      f"review_{stem}.xlsx")
            )
            write_xlsx_bytes(
                {
                    "clusters": clusters.select(*sheet_cols),
                    "canonical_summary": canonical_summary(clusters),
                    "settings": settings_sheet(config, spark),
                },
                out_dir,
                names[0],
            )
            write_xlsx_bytes(
                {"mapping": golden_mapping(clusters)}, out_dir, names[1]
            )
            write_xlsx_bytes(
                {"review": high_confidence_review(clusters).select(*sheet_cols)},
                out_dir,
                names[2],
            )
            s = run_stats(clusters).collect()[0]
            print("\nProcessing Complete!")
            print(f"Total Rows: {s['total_rows']}")
            print(f"Total Clusters: {s['total_clusters']}")
            print(f"Multi-record Clusters: {s['multi_record_clusters']}")
            print(
                f"High-confidence Review Rows: {s['high_confidence_review_rows']}"
            )
            print(f"Reports written to: {out_dir}")
    finally:
        if owns_session:
            spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
