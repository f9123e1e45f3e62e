#!/usr/bin/env python3
"""Stable kernel micro-benchmarks (no Spark): the numbers BENCH.md's kernel
tables cite, measured the same way every round.

Usage: python tools/kernel_bench.py [--reps N]

Measures best-of-N (host vCPU contention on this sandbox swings single
runs ±30%, so compare best-window numbers, and never run Spark
concurrently):

- Cold_Email_Hacks.pdf  (44-page text-heavy book; reference Rust: 85 ms)
- Higgs arXiv paper     (38 pages, TJ-kerned dense text + 245 image refs)
- synthetic corpus mix  (3,000 docs, PDF/HTML/mega/corrupt tiers)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

COLD = "/root/reference/test-pdfs/Cold_Email_Hacks.pdf"
HIGGS = (
    "/root/reference/oxidize-pdf-core/tests/fixtures/"
    "issue_272_higgs_arxiv_1207_7214.pdf"
)


def best_of(fn, reps: int) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from oxidizepdf_spark.corpus import generate_corpus
    from oxidizepdf_spark.kernel.extract import (
        extract_document_spans,
        extract_pdf_bytes,
    )

    from oxidizepdf_spark.kernel.textstate import ExtractionOptions

    out = {}
    for name, path in (("cold_email_sec", COLD), ("higgs_sec", HIGGS)):
        data = open(path, "rb").read()
        out[name] = round(best_of(lambda: extract_pdf_bytes(data), args.reps), 4)
        # layout mode (positioned fragments): the path tables/elements/
        # annotations covered_text/reading-order queries pay
        out[name.replace("_sec", "_layout_sec")] = round(
            best_of(
                lambda: extract_pdf_bytes(
                    data, options=ExtractionOptions(preserve_layout=True)
                ),
                args.reps,
            ),
            4,
        )

    pairs = list(generate_corpus(n_docs=3000, seed=42))
    triples = [
        [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r, _ in pairs
    ]

    def corpus_pass():
        for t in triples:
            extract_document_spans(t)

    sec = best_of(corpus_pass, max(2, args.reps - 1))
    out["synthetic_ms_per_doc"] = round(sec / len(triples) * 1e3, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
