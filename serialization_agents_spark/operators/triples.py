"""Triple materialization — (subj, pred, obj) rows from canonical agents
and linked mentions (north_star: foaf types, skos labels, owl:sameAs
cross-links, plus page->agent provenance edges).

The reference stops at the `registry.agents` lookup collection; the
triple surface is our KG materialization of the same content:

- rdf:type        foaf:Person / foaf:Organization   (from `type`)
- skos:prefLabel  name_controlled
- skos:altLabel   every altForms name that differs from the prefLabel
  (/root/reference/lib/utils_shadowcat.js:244-263 accumulates these)
- owl:sameAs      viaf.org / wikidata / dbpedia / id.loc.gov IRIs
  (the ids the reference carries as wikidata/lcId/dbpedia fields,
  lib/utils_shadowcat.js:233-240)
- dct:contributor page-url -> agent edges (provenance; one per mention,
  the analogue of the reference writing the resolved agent back into the
  source bib, lib/utils_shadowcat.js:112-144)

All narrow ops (select + explode + union) over already-aggregated data:
no shuffle is introduced by materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGENT_IRI_PREFIX = "registry:agent/"


def agent_iri(col) -> F.Column:
    return F.concat(F.lit(AGENT_IRI_PREFIX), col)


def materialize_triples(canonical: DataFrame, linked: DataFrame | None = None) -> DataFrame:
    subj = agent_iri(F.col("entity_key"))

    types = canonical.select(
        subj.alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.when(F.col("type") == "corporate", "foaf:Organization")
        .otherwise("foaf:Person")
        .alias("obj"),
    )

    pref = canonical.where(F.col("name_controlled").isNotNull()).select(
        subj.alias("subj"),
        F.lit("skos:prefLabel").alias("pred"),
        F.col("name_controlled").alias("obj"),
    )

    alt = (
        canonical.select(
            subj.alias("subj"), F.col("name_controlled"),
            F.explode("alt_forms").alias("af"),
        )
        .where(F.col("af.name") != F.col("name_controlled"))
        .select("subj", F.lit("skos:altLabel").alias("pred"), F.col("af.name").alias("obj"))
        .dropDuplicates()
    )

    same_viaf = canonical.select(subj.alias("subj"), F.explode("viaf").alias("id")).select(
        "subj", F.lit("owl:sameAs").alias("pred"),
        F.concat(F.lit("http://viaf.org/viaf/"), F.col("id")).alias("obj"),
    )
    scalar_links = []
    for col, prefix in [
        ("wikidata", "http://www.wikidata.org/entity/"),
        ("dbpedia", "http://dbpedia.org/resource/"),
        ("lc_id", "http://id.loc.gov/authorities/names/"),
    ]:
        scalar_links.append(
            canonical.where(F.col(col).isNotNull()).select(
                subj.alias("subj"), F.lit("owl:sameAs").alias("pred"),
                F.concat(F.lit(prefix), F.col(col)).alias("obj"),
            )
        )

    out = types.unionByName(pref).unionByName(alt).unionByName(same_viaf)
    for df in scalar_links:
        out = out.unionByName(df)

    if linked is not None:
        contrib = linked.select(
            F.col("url").alias("subj"),
            F.lit("dct:contributor").alias("pred"),
            agent_iri(F.col("entity_key")).alias("obj"),
        ).dropDuplicates()
        # remap merged entity keys to their canonical key
        remap = canonical.select(
            F.explode(
                F.array_union(F.array(F.col("entity_key")), F.col("merge_source"))
            ).alias("member_key"),
            F.col("entity_key").alias("canonical_key"),
        )
        contrib = (
            contrib.withColumn(
                "member_key", F.expr(f"substring(obj, {len(AGENT_IRI_PREFIX) + 1})")
            )
            # entity-count-sized dimension: let AQE pick broadcast vs shuffle
            .join(remap, "member_key", "left")
            .select(
                "subj", "pred",
                F.coalesce(agent_iri(F.col("canonical_key")), F.col("obj")).alias("obj"),
            )
            .dropDuplicates()
        )
        out = out.unionByName(contrib)
    return out
