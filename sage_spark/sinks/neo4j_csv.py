"""Neo4j bulk-import CSV export — the migration sink for reference users.

The reference materializes its graph by pushing every node and edge
through a per-row Cypher ``MERGE`` session (app/pipeline.py:157-224
Document/Chunk/Person + PART_OF/SENT/RECEIVED_BY; app/saia.py:1076-1242
Claim/CanonicalFact + HAS_CLAIM/HAS_FACT/OBJECT_ENTITY/SUPPORTS/
CONTRADICTS/SUPERSEDED_BY) — throughput capped at driver round-trip
speed. A user migrating that deployment to this engine still needs the
graph IN Neo4j for their existing Cypher/UI surface; the supported way
to load a graph of this size is ``neo4j-admin database import`` over
CSV, not Cypher.

This sink writes that CSV layout straight from the
:class:`~sage_spark.store.TableStore` in one distributed pass per table:

* ``nodes/<Label>/part-*`` — headerless CSV part files (any number of
  part files per label; neo4j-admin accepts a regex of data files), with
  a driver-written one-line header at ``headers/<Label>.csv`` carrying
  the ``:ID`` / typed-property / ``:LABEL`` column roles;
* ``rels/<name>/part-*`` + ``headers/relationships.csv`` with
  ``:START_ID,:END_ID,:TYPE`` — the store's ``edges`` table, the
  claim⋈fact evidence edges, and the chunk→document PART_OF edges;
* ``Entity`` nodes synthesized for every relationship endpoint the store
  tables don't cover (person ids, group ids, mention keys) so the import
  passes referential-integrity checks without a separate person dim;
* ``import.sh`` — the exact ``neo4j-admin database import full``
  invocation for the produced layout.

Scale: each node file is one column-pruned scan + distributed CSV write
(no shuffle); the Entity derivation is a distinct + left-anti join keyed
on the id — the only shuffle, over the id columns alone. Quoting is
RFC4180 (quote ``"`` doubled as the escape — neo4j-admin's default);
array properties use the ``;`` array delimiter with a typed ``[]``
header suffix.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..store import TableStore

# store table -> (node label, id column, property columns). Embeddings are
# excluded by default (float[] properties bloat the import ~10x and Neo4j
# vector indexes load separately); pass include_embeddings=True to keep them.
NODE_TABLES: dict[str, tuple[str, str, list[str]]] = {
    "documents": (
        "Document",
        "doc_id",
        ["url", "sender", "receivers", "subject", "summary", "timestamp", "source", "lang"],
    ),
    "chunks": ("Chunk", "chunk_id", ["doc_id", "seq", "summary"]),
    "claims": (
        "Claim",
        "claim_id",
        ["doc_id", "claim_type", "predicate", "subject_key", "object_key", "value_text", "canonical_key"],
    ),
    "facts": (
        "CanonicalFact",
        "fact_id",
        ["canonical_key", "claim_type", "predicate", "subject_key", "object_key", "value_text", "status"],
    ),
}

_SCALAR_SUFFIX = {
    "string": "",
    "int": ":int",
    "bigint": ":long",
    "float": ":float",
    "double": ":double",
    "boolean": ":boolean",
}


def _csv_writer(df: DataFrame):
    # escape='"' doubles embedded quotes (RFC4180) — neo4j-admin's default
    # quote handling; Spark's own default escape is backslash, which
    # neo4j-admin would read literally.
    return df.write.mode("overwrite").option("quote", '"').option("escape", '"')


def _node_projection(df: DataFrame, id_col: str, label: str, props: list[str]) -> tuple[list[str], DataFrame]:
    """(header fields, projected DataFrame) for one node file: the id column
    as the global :ID, each property with its neo4j type suffix (arrays
    ;-joined with a []-suffixed header), and a literal :LABEL column."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    header = [f"{id_col}:ID"]
    cols = [F.col(id_col)]
    for name in props:
        t = types[name]
        if t.startswith("array<"):
            inner = t[6 : -1]
            suffix = (_SCALAR_SUFFIX.get(inner, "") or ":string").lstrip(":")
            header.append(f"{name}:{suffix}[]")
            cols.append(F.concat_ws(";", F.col(name)).alias(name))
        else:
            header.append(f"{name}{_SCALAR_SUFFIX.get(t, '')}")
            cols.append(F.col(name))
    header.append(":LABEL")
    cols.append(F.lit(label).alias("_label"))
    return header, df.select(*cols)


def export_neo4j_admin_csv(
    spark: SparkSession,
    store: TableStore,
    out_dir: str,
    *,
    include_embeddings: bool = False,
) -> dict[str, int]:
    """Export the KG store as a ``neo4j-admin database import`` CSV layout
    under ``out_dir``; returns {surface: row count}."""
    out = Path(out_dir)
    (out / "headers").mkdir(parents=True, exist_ok=True)
    counts: dict[str, int] = {}
    id_frames: list[DataFrame] = []

    tables = {t: spec for t, spec in NODE_TABLES.items()}
    if include_embeddings:
        tables["chunks"] = ("Chunk", "chunk_id", ["doc_id", "seq", "summary", "embedding"])

    for table, (label, id_col, props) in tables.items():
        df = store.read(spark, table)
        header, proj = _node_projection(df, id_col, label, props)
        _csv_writer(proj).csv(str(out / "nodes" / label))
        (out / "headers" / f"{label}.csv").write_text(",".join(header) + "\n")
        counts[f"nodes:{label}"] = proj.count()
        id_frames.append(df.select(F.col(id_col).alias("id")))

    # relationship surfaces: (name, DataFrame[:START_ID, :END_ID, :TYPE])
    edges = store.read(spark, "edges").select("src", "dst", "type")
    cfe = store.read(spark, "claim_fact_edges").select(
        F.col("claim_id").alias("src"), F.col("fact_id").alias("dst"), F.col("relation_type").alias("type")
    )
    part_of = store.read(spark, "chunks").select(
        F.col("chunk_id").alias("src"), F.col("doc_id").alias("dst"), F.lit("PART_OF").alias("type")
    )
    rels = {"edges": edges, "claim_fact": cfe, "part_of": part_of}
    for name, rdf in rels.items():
        rdf = rdf.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        _csv_writer(rdf).csv(str(out / "rels" / name))
        counts[f"rels:{name}"] = rdf.count()
        rels[name] = rdf
    (out / "headers" / "relationships.csv").write_text(":START_ID,:END_ID,:TYPE\n")

    # endpoints with no node row yet (person ids, group ids, mention keys,
    # SAIARun ids) become generic Entity nodes so referential integrity holds
    endpoints = None
    for rdf in rels.values():
        both = rdf.select(F.col("src").alias("id")).unionByName(rdf.select(F.col("dst").alias("id")))
        endpoints = both if endpoints is None else endpoints.unionByName(both)
    known = id_frames[0]
    for extra in id_frames[1:]:
        known = known.unionByName(extra)
    entities = endpoints.distinct().join(known, "id", "left_anti").select(
        F.col("id"), F.lit("Entity").alias("_label")
    )
    _csv_writer(entities).csv(str(out / "nodes" / "Entity"))
    (out / "headers" / "Entity.csv").write_text("id:ID,:LABEL\n")
    counts["nodes:Entity"] = entities.count()

    node_args = "".join(
        f'  --nodes="$DIR/headers/{label}.csv,$DIR/nodes/{label}/part-.*" \\\n'
        for label in [spec[0] for spec in tables.values()] + ["Entity"]
    )
    rel_args = "".join(
        f'  --relationships="$DIR/headers/relationships.csv,$DIR/rels/{name}/part-.*" \\\n'
        for name in rels
    )
    (out / "import.sh").write_text(
        "#!/bin/sh\n"
        "# Bulk-load this export into a (stopped) Neo4j database:\n"
        'DIR="$(cd "$(dirname "$0")" && pwd)"\n'
        "neo4j-admin database import full \\\n"
        "  --multiline-fields=true --array-delimiter=';' \\\n"
        f"{node_args}{rel_args}"
        "  sage\n"
    )
    return counts
