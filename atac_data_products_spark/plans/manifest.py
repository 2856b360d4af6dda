"""The manifest-build pipeline (make_uuids_tsv.py parity).

Reference flow (entry point 1, SURVEY.md §3.1): ES bool query → hit
unnesting → 52-line imperative donor-concept extraction → positional
DataFrame assembly → TSV with index column.

Spark-first: the search stays a thin mockable boundary (sources.rest);
donor extraction is explode + pivot with an explicit concept list; the
column zip is plain per-row projection (no positional assembly); the
sink drops the index artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import first_match_pivot
from ..sources.rest import apply_search

# Concept → output column (make_uuids_tsv.py:95-103).
DONOR_CONCEPTS = {
    "Age": "age",
    "Sex": "sex",
    "Height": "height",
    "Weight": "weight",
    "Body mass index": "bmi",
    "Cause of death": "cause_of_death",
    "Race": "race",
}


def search_datasets(hits: DataFrame, organ_code: str | None = None) -> DataFrame:
    """The reference's ES bool query (make_uuids_tsv.py:15-38): ATACseq +
    public + latest-revision, optional organ; 10k page window."""
    must = [
        {"match": {"dataset_type": "ATACseq"}},
        {"match": {"data_access_level": "public"}},
    ]
    if organ_code is not None:
        must.append({"match": {"origin_samples_organ": organ_code}})
    dsl = {
        "query": {"bool": {"must": must, "must_not": [{"exists": {"field": "next_revision_uuid"}}]}},
        "from": 0,
        "size": 10_000,
        # deterministic page cursor (ES search_after contract): uuid is
        # the hits' unique id, so the 10k window is the same row set on
        # every run/retry/plan — lexicographic VARCHAR order, matched
        # byte-for-byte by the oracle's ORDER BY uuid LIMIT
        "sort": ["uuid"],
    }
    return apply_search(hits, dsl)


def extract_donor_metadata(hits: DataFrame) -> DataFrame:
    """Donor concept/value lists → 7 columns (make_uuids_tsv.py:91-142).

    The reference iterates organ_donor_data then living_donor_data,
    last-wins.  Deterministic re-expression: explode both arrays with a
    priority (living=1 > organ=0) and pivot with max_by(value, priority)
    — same winner, order-free, one shuffle.
    """
    def explode_arr(col: str, prio: int) -> DataFrame:
        return hits.select(
            "uuid",
            F.explode(F.col(col)).alias("rec"),
            F.lit(prio).alias("priority"),
        ).select(
            "uuid",
            F.col("rec.grouping_concept_preferred_term").alias("concept"),
            F.col("rec.preferred_term").alias("term_value"),
            F.col("rec.data_value").alias("data_value"),
            "priority",
        )

    recs = explode_arr("organ_donor_data", 0).unionByName(
        explode_arr("living_donor_data", 1)
    )
    # Sex/Race/Cause of death use preferred_term; numeric concepts use
    # data_value (make_uuids_tsv.py:105-122).
    term_concepts = ["Sex", "Race", "Cause of death"]
    recs = recs.select(
        "uuid",
        "concept",
        F.when(F.col("concept").isin(term_concepts), F.col("term_value"))
        .otherwise(F.col("data_value"))
        .alias("value"),
        "priority",
    ).where(F.col("concept").isin(list(DONOR_CONCEPTS)))

    pivoted = first_match_pivot(
        recs, "uuid", "concept", "value", list(DONOR_CONCEPTS), priority_col="priority"
    )
    renames = [F.col("uuid")] + [
        F.col(f"`{concept}`").alias(out) for concept, out in DONOR_CONCEPTS.items()
    ]
    return pivoted.select(*renames)


def build_manifest(hits: DataFrame, organ_code: str | None = None) -> DataFrame:
    """Full manifest plan: filter → donor extraction → join (replacing the
    reference's positional pd.concat, make_uuids_tsv.py:153-157, with a
    keyed left join so datasets lacking donor metadata keep nulls)."""
    selected = search_datasets(hits, organ_code)
    donors = extract_donor_metadata(selected)
    return (
        selected.select("uuid", "hubmap_id")
        .join(donors, "uuid", "left")
        .select(
            "uuid", "hubmap_id",
            "age", "sex", "height", "weight", "bmi", "cause_of_death", "race",
        )
    )
