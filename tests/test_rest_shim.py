"""Live REST shim exercised against a stdlib http.server (round 11).

``fetch_search_hits`` is the network side of scan_rest_search — until
this round it was import-gated and never exercised, so the reference's
redirect + hit-envelope behavior (make_uuids_tsv.py:41-88) had no test.
These tests run it against a loopback ``http.server`` fixture: no
external network, no new dependencies, sandbox-safe.

Contracts pinned (all mirrored from the reference):

* 200: POST the DSL, rows are each hit's ``_source``
  (make_uuids_tsv.py:67-88).
* Location-less 303: the redirect URL is the response BODY, followed
  with a plain GET (make_uuids_tsv.py:50-59 — the search API's
  presigned-URL offload for oversized responses; requests/urllib
  auto-follow only Location-header redirects, so this branch is
  engine code, not library behavior).
* Location-header 303: standard library follow (POST→GET per RFC 9110).
* Empty / missing hits envelope: empty frame, schema intact.
* non-303 errors propagate.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from atac_data_products_spark.sources.rest import fetch_search_hits

SCHEMA = "uuid string, hubmap_id string"

HITS_PAYLOAD = {
    "hits": {
        "total": {"value": 2},
        "hits": [
            {"_id": "a", "_source": {"uuid": "u1", "hubmap_id": "HBM1"}},
            {"_id": "b", "_source": {"uuid": "u2", "hubmap_id": "HBM2"}},
        ],
    }
}


class _Handler(BaseHTTPRequestHandler):
    """Routes:

    /search           -> 200 + hit envelope; records the POSTed DSL
    /search-empty     -> 200 + empty envelope
    /offload          -> 303, redirect URL in the BODY (no Location)
    /offload-header   -> 303 with a Location header (standard follow)
    /offloaded        -> 200 + hit envelope (GET target of the 303s)
    /boom             -> 500
    """

    posted_bodies: list[dict] = []
    got_offloaded_get = False

    def log_message(self, *a):  # silence test output
        pass

    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n)
        if self.path == "/search":
            _Handler.posted_bodies.append(json.loads(raw))
            self._json(200, HITS_PAYLOAD)
        elif self.path == "/search-empty":
            self._json(200, {"hits": {"hits": []}})
        elif self.path == "/offload":
            target = f"http://{self.headers['Host']}/offloaded\n"
            body = target.encode()
            self.send_response(303)  # no Location: URL travels in the body
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/offload-header":
            self.send_response(303)
            self.send_header(
                "Location", f"http://{self.headers['Host']}/offloaded"
            )
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif self.path == "/boom":
            self._json(500, {"error": "internal"})
        else:
            self._json(404, {"error": "not found"})

    def do_GET(self):
        if self.path == "/offloaded":
            _Handler.got_offloaded_get = True
            self._json(200, HITS_PAYLOAD)
        else:
            self._json(404, {"error": "not found"})


@pytest.fixture(scope="module")
def base_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()


DSL = {
    "query": {"bool": {"must": [{"match": {"dataset_type": "ATACseq"}}]}},
    "size": 10000,
    "sort": ["uuid"],
}


def test_200_posts_dsl_and_unnests_source(spark, base_url):
    _Handler.posted_bodies.clear()
    df = fetch_search_hits(spark, f"{base_url}/search", DSL, SCHEMA)
    assert [tuple(r) for r in df.orderBy("uuid").collect()] == [
        ("u1", "HBM1"),
        ("u2", "HBM2"),
    ]
    # the DSL travels verbatim as the POST body (the reference's
    # requests.post(url, json=payload) contract)
    assert _Handler.posted_bodies == [DSL]


def test_bodyless_location_303_follows_body_url(spark, base_url):
    _Handler.got_offloaded_get = False
    df = fetch_search_hits(spark, f"{base_url}/offload", DSL, SCHEMA)
    assert df.count() == 2
    assert _Handler.got_offloaded_get, "303 body URL was not GET-followed"


def test_location_header_303_standard_follow(spark, base_url):
    _Handler.got_offloaded_get = False
    df = fetch_search_hits(spark, f"{base_url}/offload-header", DSL, SCHEMA)
    assert df.count() == 2
    assert _Handler.got_offloaded_get


def test_empty_envelope_yields_empty_frame(spark, base_url):
    df = fetch_search_hits(spark, f"{base_url}/search-empty", DSL, SCHEMA)
    assert df.count() == 0
    assert df.columns == ["uuid", "hubmap_id"]


def test_non_303_errors_propagate(spark, base_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        fetch_search_hits(spark, f"{base_url}/boom", DSL, SCHEMA)
