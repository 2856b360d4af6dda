"""REST/search-source boundary (SURVEY.md §2.1 scan_rest_search).

The reference POSTs an Elasticsearch bool query to the HuBMAP search API
(make_uuids_tsv.py:23-64) — its only "pushdown".  The engine keeps that a
thin, mockable boundary: the *query semantics* (must/match equality,
must_not/exists, from/size paging) compile to DataFrame filters + limit,
so they run identically against a live fetch materialized with
``spark.createDataFrame`` or against any local table in tests.  No test
or query path touches the network.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fetch_search_hits(
    spark,
    url: str,
    dsl: dict,
    schema: str,
    timeout: float = 30.0,
):
    """Live search fetch (the network side of scan_rest_search,
    make_uuids_tsv.py:41-64): POST the DSL, follow the search API's
    redirect contract, unnest the ES hit envelope, and materialize a
    DataFrame under an explicit schema.

    Redirects: besides standard Location-header 3xx (urllib follows
    those, converting a 303 POST into a GET per RFC 9110), the search
    API offloads oversized responses as a **bodyless-Location 303 whose
    redirect URL is the response BODY** (a presigned object-store URL) —
    the reference follows that URL with a plain GET
    (make_uuids_tsv.py:50-59: ``response.text.strip()`` then
    ``requests.get``).  urllib surfaces a Location-less 303 as an
    ``HTTPError``, which carries the body; we mirror the reference's
    strip+GET exactly.

    Hit envelope (make_uuids_tsv.py:67-88): rows are each hit's
    ``_source`` object; hits without the envelope pass through as-is.
    An empty/missing ``hits.hits`` yields an empty frame under the
    same schema.

    Driver-side by design — the result is a small manifest-shaped set
    (≤ the ES page window), immediately broadcastable.  Exercised in
    tests against a stdlib ``http.server`` fixture (no network); the
    compiled-filter path is the tested query semantics, this is the
    thin I/O shim around it.
    """
    import json as _json
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=_json.dumps(dsl).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = _json.load(resp)
    except urllib.error.HTTPError as e:
        if e.code != 303:
            raise
        # Location-less 303: the redirect URL is the response body
        redirect_url = e.read().decode().strip()
        with urllib.request.urlopen(redirect_url, timeout=timeout) as resp:
            payload = _json.load(resp)
    hits = [h.get("_source", h) for h in payload.get("hits", {}).get("hits", [])]
    return spark.createDataFrame(hits, schema)


def compile_bool_query(dsl: dict) -> Column | None:
    """Compile the ES bool-query subset the reference uses into a Column.

    Supported (make_uuids_tsv.py:15-36): ``bool.must`` of ``match``
    equality clauses and ``bool.must_not`` of ``exists`` clauses.  Dotted
    field paths address struct fields, exactly as in Spark column syntax.
    """
    bool_q = dsl.get("query", dsl).get("bool", {})
    conds: list[Column] = []
    for clause in bool_q.get("must", []):
        if "match" in clause:
            for field, value in clause["match"].items():
                conds.append(F.col(field) == F.lit(value))
        else:
            raise NotImplementedError(f"unsupported must clause: {clause}")
    for clause in bool_q.get("must_not", []):
        if "exists" in clause:
            conds.append(F.col(clause["exists"]["field"]).isNull())
        else:
            raise NotImplementedError(f"unsupported must_not clause: {clause}")
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _sort_columns(sort_spec) -> list[Column]:
    """ES-style sort spec → Spark sort columns.  Accepts the two forms
    the ES search API takes: a bare field name (asc), or
    ``{field: {"order": "asc"|"desc"}}``.

    Null ordering: ES's sort contract places missing values LAST by
    default (``missing: _last``) for BOTH directions, and DuckDB's
    default ORDER BY is likewise NULLS LAST in both directions
    (verified empirically).  Spark's bare ``asc()``/``desc()`` are
    NULLS FIRST for asc — so a nullable sort cursor whose page window
    binds would pick a different page than both ES and the oracle.
    Pin nulls-last explicitly on both directions."""
    cols: list[Column] = []
    for entry in sort_spec:
        if isinstance(entry, str):
            cols.append(F.col(entry).asc_nulls_last())
            continue
        (field, opts), = entry.items()
        order = (opts or {}).get("order", "asc") if isinstance(opts, dict) else opts
        cols.append(
            F.col(field).desc_nulls_last()
            if order == "desc"
            else F.col(field).asc_nulls_last()
        )
    return cols


def apply_search(df: DataFrame, dsl: dict) -> DataFrame:
    """Apply a compiled bool query + paging window to a DataFrame.

    ES ``from``/``size`` paging (make_uuids_tsv.py:24-25) needs a total
    order to be deterministic — ES itself only guarantees a stable page
    under an explicit ``sort`` (its search_after contract; score/doc
    order is shard- and refresh-dependent).  The engine makes that
    explicit: a DSL with ``size`` MUST carry ``sort``.  A bare
    ``df.limit(n)`` takes an arbitrary plan-dependent subset the moment
    the window binds (it never binds at the reference's data size, which
    is why the reference gets away without one) — on a cluster the
    picked rows would differ per run, per task retry, and per AQE
    re-plan.  ``orderBy().limit()`` compiles to TakeOrderedAndProject —
    distributed per-partition top-N, merged at the driver — so the
    deterministic form costs no extra shuffle at any scale.
    """
    cond = compile_bool_query(dsl)
    if cond is not None:
        df = df.filter(cond)
    frm = dsl.get("from", 0)
    if frm not in (0, None):
        raise NotImplementedError("non-zero 'from' paging not used by the reference")
    size = dsl.get("size")
    if size is not None:
        sort_spec = dsl.get("sort")
        if not sort_spec:
            raise ValueError(
                "DSL with 'size' must carry an ES 'sort' spec: an unsorted "
                "page window is nondeterministic the moment it binds "
                "(plan-, retry-, and AQE-dependent row pick)"
            )
        df = df.orderBy(*_sort_columns(sort_spec)).limit(size)
    return df
