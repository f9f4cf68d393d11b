"""Two-parallelism scaling benchmark (north rule evidence).

No real cluster exists in this sandbox, so the N -> 4N executor criterion is
evidenced by running the identical KG-construction job at local[8] and
local[32] on the identical deterministic input and reporting per-core
throughput scaling efficiency:

    efficiency = (docs_per_sec_32 / docs_per_sec_8) / (32 / 8)

Each measurement runs in its own subprocess (fresh JVM — no warm-cache
bleed). Results land on stdout as JSON and are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from sage_spark.session import build_spark
from sage_spark.datagen import build_groups, synth_webtext
from sage_spark.operators.canonicalize import canonicalize_claims, split_facts
from sage_spark.operators.extraction import extract_claims_stage, extract_documents

cores = {cores}
n_docs = {n_docs}
spark = build_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
webtext, persons_df = synth_webtext(spark, n_docs, n_persons=200, seed=7, partitions=cores * 2)
webtext = webtext.localCheckpoint(eager=True)
persons = [r.asDict() for r in persons_df.collect()]
# warmup: spin up python workers + JIT before timing
extract_documents(webtext.limit(64)).count()
t0 = time.perf_counter()
docs = extract_documents(webtext, lang_filter="en")
claims = extract_claims_stage(docs, persons, build_groups(), run_ts="2026-05-01T00:00:00+00:00")
union = canonicalize_claims(claims, None, seen_at="2026-05-01T00:00:00+00:00")
n = split_facts(union).count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "seconds": dt, "docs": n_docs, "facts": n, "docs_per_sec": n_docs / dt}}))
"""


def run_at(cores: int, n_docs: int) -> dict:
    code = _CHILD.format(root=str(ROOT), cores=cores, n_docs=n_docs)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, check=True)
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    low = run_at(8, n_docs)
    high = run_at(32, n_docs)
    efficiency = (high["docs_per_sec"] / low["docs_per_sec"]) / (32 / 8)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "local8": low,
                "local32": high,
                "speedup": round(high["docs_per_sec"] / low["docs_per_sec"], 3),
                "scaling_efficiency": round(efficiency, 3),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
