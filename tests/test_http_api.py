"""Supervisor HTTP control plane (http_api.py vs supervisor.go:78-95).

A live ThreadingHTTPServer on an ephemeral port, driven with urllib —
covers the route table, the jresp envelope, the reference's exact
basic-auth failure modes, gzip ingest, the stats merge grammar, admin
auth, the TSV (not JSON) BigQuery passthrough, and the Slack endpoint.
"""

from __future__ import annotations

import base64
import gzip
import json
import urllib.error
import urllib.request

import pytest

from cloudpelican_lsd_spark.engine import CloudPelicanEngine
from cloudpelican_lsd_spark.http_api import SupervisorHTTP
from cloudpelican_lsd_spark.sources.tables import logs_view

AUTH = "Basic " + base64.b64encode(b"usr:pwd").decode()


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    eng = CloudPelicanEngine(spark, logs_view(spark, sf_dir), sf_dir=sf_dir)
    sup = SupervisorHTTP(
        eng,
        username="usr",
        password="pwd",
        admin_password="adm",
        slack_token="slacktok",
    )
    url = sup.start()
    yield sup, url
    sup.stop()


def call(
    url: str,
    method: str = "GET",
    body: bytes | None = None,
    auth: str | None = AUTH,
    headers: dict | None = None,
):
    req = urllib.request.Request(url, data=body, method=method)
    if auth:
        req.add_header("Authorization", auth)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as ex:
        return ex.code, ex.read().decode()


def jcall(*args, **kw):
    code, text = call(*args, **kw)
    assert code == 200, text
    return json.loads(text)


def test_auth_failure_modes(server):
    _, url = server
    # supervisor.go:822-843 exact texts
    code, text = call(f"{url}/ping", auth=None)
    assert (code, text) == (400, "bad syntax a")
    code, text = call(f"{url}/ping", auth="Bearer xyz")
    assert (code, text) == (400, "bad syntax b")
    bad = "Basic " + base64.b64encode(b"usr:wrong").decode()
    code, text = call(f"{url}/ping", auth=bad)
    assert (code, text) == (401, "authorization failed")


def test_home_and_ping(server):
    _, url = server
    assert jcall(f"{url}/")["hello"] == "This is the CloudPelican supervisor"
    assert jcall(f"{url}/ping") == {"status": True, "pong": True}


def test_filter_crud_and_results_cursor(server):
    sup, url = server
    # validation errors use the jresp envelope (status=false, HTTP 200)
    r = jcall(f"{url}/filter?name=nore", "POST")
    assert r["status"] is False and "regex" in r["errors"][0]
    r = jcall(f"{url}/filter?name=web&regex=error", "POST")
    fid = r["filter_id"]
    assert r["status"] is True and fid

    listed = jcall(f"{url}/filter")["filters"]
    assert listed[fid]["name"] == "web" and listed[fid]["regex"] == "error"

    # results ingest: plain + gzip, then cursor reads (supervisor.go:450-514)
    lines = b"line one error\nline two ok\n"
    r = jcall(f"{url}/filter/{fid}/result", "PUT", body=lines)
    assert r["ack"] is True and r["lines"] == 2
    gz = gzip.compress(b"line three gz\n")
    r = jcall(
        f"{url}/filter/{fid}/result",
        "PUT",
        body=gz,
        headers={"Content-Encoding": "gzip"},
    )
    assert r["lines"] == 1

    r = jcall(f"{url}/filter/{fid}/result?result_offset=0")
    assert r["results"] == ["line one error", "line two ok", "line three gz"]
    cursor = r["result_offset"]
    assert cursor >= 3
    r2 = jcall(f"{url}/filter/{fid}/result?result_offset={cursor}")
    assert r2["results"] == [] and r2["result_offset"] == 0
    # missing/invalid offset
    assert jcall(f"{url}/filter/{fid}/result")["status"] is False
    # unknown filter
    assert jcall(f"{url}/filter/zz/result?result_offset=0")["status"] is False

    # delete: True then False (supervisor.go:795-810)
    assert jcall(f"{url}/filter/{fid}", "DELETE")["deleted"] is True
    assert jcall(f"{url}/filter/{fid}", "DELETE")["deleted"] is False


def test_stats_merge_and_outliers_and_admin(server):
    sup, url = server
    fid = jcall(f"{url}/filter?name=st&regex=x", "POST")["filter_id"]
    # PutStatsFilters grammar: f=<id>_m=<metric>_b=<bucket> -> count;
    # unknown-filter and malformed keys are skipped, not errors
    body = json.dumps({f"f={fid}_m=1_b=600": 4, f"f={fid}_m=2_b=600": 1,
                       "f=missing_m=1_b=0": 9, "garbage": 5}).encode()
    r = jcall(f"{url}/stats/filters", "PUT", body=body)
    assert r["updates"] == 2
    # merge-on-put: second PUT increments
    jcall(f"{url}/stats/filters", "PUT",
          body=json.dumps({f"f={fid}_m=1_b=600": 3}).encode())
    stats = jcall(f"{url}/filter/{fid}/stats")["stats"]
    assert stats == {"1": {"600": 7}, "2": {"600": 1}}

    # outliers: validation + store
    assert jcall(f"{url}/filter/{fid}/outlier", "POST")["status"] is False
    r = jcall(f"{url}/filter/{fid}/outlier?timestamp=1700000000&score=0.8", "POST")
    assert r["stored"] is True and len(sup.state.outliers) == 1

    # admin routes need admin_password (adminAuth :812-819)
    code, text = call(f"{url}/admin/truncate/outliers", "DELETE")
    assert (code, text) == (401, "authorization failed")
    r = jcall(f"{url}/admin/truncate/outliers?admin_password=adm", "DELETE")
    assert r["truncated"] == 1 and list(sup.state.outliers) == []
    r = jcall(f"{url}/admin/truncate/stats?admin_password=adm", "DELETE")
    assert r["truncated"] >= 1
    assert jcall(f"{url}/filter/{fid}/stats")["stats"] == {}

    # admin config lands in engine session config via execute()
    r = jcall(f"{url}/admin/config?admin_password=adm&key=k1&value=v1", "PUT")
    assert r["config"]["k1"] == "v1"
    assert sup.engine.session["config"]["k1"] == "v1"


def test_bigquery_query_tsv(server):
    _, url = server
    code, text = call(
        f"{url}/bigquery/query",
        "POST",
        body=b"SELECT r_name FROM region ORDER BY r_name LIMIT 2",
    )
    assert code == 200
    assert text.splitlines() == ["AFRICA", "AMERICA"]  # TSV, not JSON (:276)
    code, text = call(f"{url}/bigquery/query", "POST", body=b"")
    assert code == 400


def test_slack_endpoint(server):
    _, url = server
    body = "token=slacktok&text=" + urllib.parse.quote("show filters")
    code, text = call(f"{url}/slack", "POST", body=body.encode(), auth=None)
    assert code == 200  # its own auth model: form token, no basic auth
    code, _ = call(
        f"{url}/slack", "POST", body=b"token=wrong&text=ping", auth=None
    )
    assert code == 401
    # command errors come back as chat text, never 5xx
    code, text = call(
        f"{url}/slack",
        "POST",
        body=b"token=slacktok&text=definitely not a command",
        auth=None,
    )
    assert code == 200 and text.startswith("error:")


def test_invalid_utf8_bodies_never_drop_the_connection(server):
    """A stray invalid byte in /slack or /bigquery/query must produce a
    normal HTTP answer (errors='replace'), never an uncaught
    UnicodeDecodeError killing the handler thread mid-response."""
    _, url = server
    code, _ = call(
        f"{url}/slack", "POST", body=b"\xff\xfetoken=x&text=ping", auth=None
    )
    assert code == 401  # replaced bytes -> wrong token -> clean 401
    code, text = call(
        f"{url}/bigquery/query", "POST", body=b"\xff\xfeSELECT 1"
    )
    assert code in (200, 400)  # parsed-with-replacement or clean error
    assert text  # a real response body, not a reset connection


def test_stats_put_skips_malformed_counts(server):
    """A non-integer count value is skipped per-entry (never a dropped
    connection), and valid entries in the same batch still ack."""
    _, url = server
    fid = jcall(f"{url}/filter?name=mixed&regex=y", "POST")["filter_id"]
    body = json.dumps(
        {f"f={fid}_m=1_b=0": "abc", f"f={fid}_m=1_b=60": [1], f"f={fid}_m=1_b=120": 2}
    ).encode()
    r = jcall(f"{url}/stats/filters", "PUT", body=body)
    assert r["status"] is True and r["updates"] == 1
    assert jcall(f"{url}/filter/{fid}/stats")["stats"] == {"1": {"120": 2}}


def test_slack_closed_without_configured_token(spark, sf_dir):
    """Secure default: no slack_token configured -> the endpoint rejects
    everything (it is the one route that bypasses basic auth)."""
    eng = CloudPelicanEngine(spark, logs_view(spark, sf_dir), sf_dir=sf_dir)
    sup = SupervisorHTTP(eng, username="u", password="p")  # token unset
    url = sup.start()
    try:
        code, _ = call(f"{url}/slack", "POST", body=b"text=ping", auth=None)
        assert code == 401
        code, _ = call(f"{url}/slack", "POST", body=b"token=&text=ping", auth=None)
        assert code == 401
    finally:
        sup.stop()


def test_malformed_body_returns_jresp_not_dropped_connection(server):
    """Round-2 review: a corrupt gzip body or bad Content-Length must
    answer with the jresp error envelope (reference: 'Invalid GZIP' via
    jresp), not abort the connection mid-request."""
    sup, url = server
    r = jcall(f"{url}/filter?name=bodyhard&regex=x", "POST")
    fid = r["filter_id"]
    try:
        # corrupt gzip: header says gzip, payload is not
        r = jcall(
            f"{url}/filter/{fid}/result",
            "PUT",
            body=b"this is not gzip",
            headers={"Content-Encoding": "gzip"},
        )
        assert r["status"] is False and "Invalid GZIP" in r["errors"][0]
        # truncated gzip stream (valid magic, cut mid-deflate)
        gz = gzip.compress(b"x" * 4096)[:20]
        r = jcall(
            f"{url}/filter/{fid}/result",
            "PUT",
            body=gz,
            headers={"Content-Encoding": "gzip"},
        )
        assert r["status"] is False and "Invalid GZIP" in r["errors"][0]
        # the connection/server survives: a normal request still works
        r = jcall(f"{url}/filter/{fid}/result", "PUT", body=b"still alive\n")
        assert r["ack"] is True and r["lines"] == 1
    finally:
        jcall(f"{url}/filter/{fid}", "DELETE")


def test_gzip_bomb_capped_before_buffering(server):
    """Decompression stops at max_body_bytes — a tiny gzip body that
    inflates past the cap is rejected without materializing it."""
    sup, url = server
    r = jcall(f"{url}/filter?name=bomb&regex=x", "POST")
    fid = r["filter_id"]
    old = sup.max_body_bytes
    sup.max_body_bytes = 1 << 16  # 64 KiB cap for the test
    try:
        bomb = gzip.compress(b"\0" * (1 << 22))  # 4 MiB of zeros, ~4 KiB wire
        assert len(bomb) < (1 << 16)
        r = jcall(
            f"{url}/filter/{fid}/result",
            "PUT",
            body=bomb,
            headers={"Content-Encoding": "gzip"},
        )
        assert r["status"] is False and "too large" in r["errors"][0]
    finally:
        sup.max_body_bytes = old
        jcall(f"{url}/filter/{fid}", "DELETE")


def test_nonloopback_bind_requires_explicit_credentials(spark, sf_dir):
    """Default cloudpelican/cloudpelican creds are loopback-only."""
    eng = CloudPelicanEngine(spark, logs_view(spark, sf_dir), sf_dir=sf_dir)
    sup = SupervisorHTTP(eng)  # default credentials
    with pytest.raises(ValueError, match="default credentials"):
        sup.start(host="0.0.0.0")
    # loopback with defaults still fine
    url = sup.start()
    try:
        code, _ = call(f"{url}/ping", auth="Basic " + base64.b64encode(b"cloudpelican:cloudpelican").decode())
        assert code == 200
    finally:
        sup.stop()


def test_negative_content_length_rejected(server):
    """A negative Content-Length must answer jresp immediately — read(-1)
    would block until client EOF and pin the handler thread."""
    import http.client

    sup, url = server
    host = url.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=10)
    try:
        conn.putrequest("PUT", "/stats/filters", skip_accept_encoding=True)
        conn.putheader("Authorization", AUTH)
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()  # would hang before the fix
        body = json.loads(resp.read().decode())
        assert body["status"] is False
        assert "Content-Length" in body["errors"][0]
    finally:
        conn.close()
