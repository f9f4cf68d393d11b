"""Triple-level precision/recall vs the reference extractor — the north
rule's acceptance metric (P/R >= 0.95), computed end-to-end and printed as
one JSON line so it can be checked without reading the pytest suite.

Runs the Spark pipeline kernel chain over a deterministic synthetic corpus,
replays the reference extractor (pytest's differential oracle,
tests/ref_oracle.py) serially over the identical pages + dimension data,
and scores the emitted (subj, pred, obj) triple sets per document.

    python tools/parity_report.py --docs 500 [--seed 7]

The suite's differential tests assert the stronger field-for-field claim
(tests/test_pipeline_e2e.py::test_spark_claims_match_reference_on_whole_corpus);
this tool reports the headline metric at the granularity the rule names.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sage_spark.datagen import build_groups, make_page, synth_webtext  # noqa: E402
from sage_spark.kernel.pagetext import text_from_html  # noqa: E402
from sage_spark.operators.extraction import extract_claims_stage, extract_documents  # noqa: E402
from sage_spark.pipeline import _first_per_doc  # noqa: E402
from sage_spark.session import build_spark  # noqa: E402
from tests.ref_oracle import RefSession, load_reference_saia  # noqa: E402

RUN_TS = "2026-05-01T00:00:00+00:00"


def triple(claim: dict) -> tuple:
    return (
        claim["subject_entity_id"] or claim["subject_key"],
        claim["predicate"],
        claim["object_entity_id"] or claim["object_key"] or claim["value_text"],
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--persons", type=int, default=20)
    args = ap.parse_args()

    saia = load_reference_saia()
    spark = build_spark(app_name="parity-report")
    spark.sparkContext.setLogLevel("ERROR")

    webtext, persons_df = synth_webtext(spark, args.docs, n_persons=args.persons, seed=args.seed)
    persons = [r.asDict() for r in persons_df.collect()]
    groups = build_groups()

    documents = _first_per_doc(extract_documents(webtext, lang_filter="en"))
    spark_claims = extract_claims_stage(documents, persons, groups, run_ts=RUN_TS)
    got = {
        (r["doc_id"], triple(r.asDict()))
        for r in spark_claims.select(
            "doc_id", "subject_entity_id", "subject_key", "predicate",
            "object_entity_id", "object_key", "value_text",
        ).collect()
    }

    # serial reference replay over the identical pages + dimensions
    session = RefSession(persons, groups)
    expected: set = set()
    seen_docs: set[str] = set()
    pages = [make_page(i, args.seed, persons, 8) for i in range(args.docs)]
    for page in sorted(pages, key=lambda p: p["url"]):
        if page["lang"] != "en":
            continue
        text = text_from_html(page["html"])
        doc_id = hashlib.sha256(text.encode()).hexdigest()
        if doc_id in seen_docs:
            continue
        seen_docs.add(doc_id)
        ctx = saia.GroundingContext(
            source_kind=page["source"],
            source_doc_id=doc_id,
            source_message_id=page["message_id"],
            linked_message_id=None,
            sender_id=page["sender_id"],
            receiver_ids=list(page["receiver_ids"]),
            conversation_id=page["conversation_id"],
            conversation_type=page["conversation_type"],
            group_id=page["group_id"],
            sent_at=page["warc_ts"].isoformat() + "+00:00",
            source=page["source"],
        )
        cleaned = saia._prepare_text(text)
        if not saia._is_source_eligible(ctx, cleaned):
            continue
        for claim in saia.extract_claims_from_text(cleaned, ctx, session=session):
            expected.add((doc_id, triple(claim)))

    tp = len(got & expected)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(expected) if expected else 1.0
    print(
        json.dumps(
            {
                "docs": args.docs,
                "docs_ingested": documents.count(),
                "spark_triples": len(got),
                "reference_triples": len(expected),
                "true_positives": tp,
                "precision": round(precision, 6),
                "recall": round(recall, 6),
                "criterion": "P/R >= 0.95 (north rule)",
                "pass": precision >= 0.95 and recall >= 0.95,
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
