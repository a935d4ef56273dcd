"""Supervisor HTTP control plane — the reference's REST surface on stdlib.

Mirrors the route table of supervisor.go:78-95 and the Slack slash-command
endpoint (supervisor.go:97-273, PostSlack :111-273) over
``http.server.ThreadingHTTPServer`` — no web framework, so it runs in this
container and on any executorless driver node:

    GET    /                          hello            (:406)
    GET    /ping                      liveness         (:396)
    POST   /filter?name=&regex=       create filter    (:416)
    GET    /filter                    list filters     (:673)
    DELETE /filter/{id}               delete filter    (:795)
    GET    /filter/{id}/result?result_offset=N         (:450)
    PUT    /filter/{id}/result        ingest lines     (:611, gzip ok)
    GET    /filter/{id}/stats                          (:515)
    POST   /filter/{id}/outlier?timestamp=&score=      (:546)
    PUT    /stats/filters             merge counters   (:684, gzip ok)
    DELETE /admin/truncate/outliers   admin            (:382)
    DELETE /admin/truncate/stats      admin            (:368)
    PUT    /admin/config?key=&value=  admin            (:353)
    POST   /bigquery/query            SQL in body, TSV out (NOT JSON, :276)
    POST   /slack                     form token/text → chat answer (:111)

Response envelope follows the reference's jresp (RobinUS2/golang-jresp):
``{"status": true, ...}`` on success, ``{"status": false, "errors": [..]}``
on failure.  Auth is HTTP Basic with the reference's exact failure modes —
400 ``bad syntax a``/``bad syntax b``, 401 ``authorization failed``
(supervisor.go:822-843); admin routes additionally require the
``admin_password`` query parameter (adminAuth, :812-819).

Divergences (documented): Go's json marshal of the filter struct uses the
Go field names — here the listing uses lower-case keys; the BigQuery
passthrough executes on Spark via ``engine.search`` (legacy-dialect shim
included) instead of dialing BigQuery.

State model matches the reference supervisor: results and stats arrive
over PUT from the stream processor (the Storm topology there, the
Structured Streaming job here) and live in bounded in-memory stores —
10k-message ring buffer per filter (max-msg-memory, supervisor.go:52),
10k-line ingest batch cap (max-msg-batch, :53).  Heavy/batch questions go
through /bigquery/query → Spark, so the HTTP process itself never holds
unbounded state.
"""

from __future__ import annotations

import base64
import gzip
import hmac
import io
import json
import threading
import zlib
from collections import OrderedDict, deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from cloudpelican_lsd_spark.engine import CloudPelicanEngine, slack_command


class _BodyError(Exception):
    """Malformed request body (bad Content-Length, corrupt/oversized gzip);
    answered with the jresp error envelope, never a dropped connection."""


class SupervisorState:
    """Bounded in-memory stores behind the REST surface (thread-safe)."""

    #: newest stats buckets kept per (filter, metric) — 14 days of
    #: minutes; older keys are evicted so a long-lived supervisor's
    #: memory stays bounded (the table TTL analog of the 10k result ring)
    MAX_STATS_BUCKETS = 20160

    def __init__(self, max_msg_memory: int = 10000) -> None:
        self.lock = threading.Lock()
        self.max_msg_memory = max_msg_memory
        #: filter_id -> deque[(monotonic id, raw line)] — 10k FIFO ring
        self.results: dict[str, deque] = {}
        self._next_id = 0
        #: filter_id -> metric -> bucket -> count (bucket set capped)
        self.stats: dict[str, dict[int, dict[int, int]]] = {}
        #: bounded like the result ring — oldest alerts roll off
        self.outliers: deque = deque(maxlen=max_msg_memory)

    def add_results(self, filter_id: str, lines: list[str]) -> bool:
        with self.lock:
            buf = self.results.setdefault(
                filter_id, deque(maxlen=self.max_msg_memory)
            )
            for line in lines:
                self._next_id += 1
                buf.append((self._next_id, line))
        return True

    def read_results(self, filter_id: str, offset: int) -> tuple[int, list[str]]:
        with self.lock:
            buf = list(self.results.get(filter_id, ()))
        lines = [line for rid, line in buf if rid > offset]
        # drained buffer -> result_offset 0, EXACTLY like the reference
        # (supervisor.go:492-508 returns resultsMaxOffset=0 when nothing
        # is newer); a polling client must keep ITS OWN high-water mark,
        # the reference CLI does (supervisorcon.go keeps the max it saw)
        max_off = max((rid for rid, _ in buf if rid > offset), default=0)
        return max_off, lines

    def add_stats(self, filter_id: str, metric: int, bucket: int, count: int) -> bool:
        with self.lock:
            m = self.stats.setdefault(filter_id, {}).setdefault(metric, {})
            m[bucket] = m.get(bucket, 0) + count
            # bound the bucket set: evict the OLDEST buckets past the cap
            # (matches the reference's 7d stats purge; without this a
            # long-lived supervisor leaks one dict entry per new minute
            # forever)
            if len(m) > self.MAX_STATS_BUCKETS:
                for b in sorted(m)[: len(m) - self.MAX_STATS_BUCKETS]:
                    del m[b]
        return True


class SupervisorHTTP:
    """The supervisor server: routes + auth around a CloudPelicanEngine."""

    def __init__(
        self,
        engine: CloudPelicanEngine,
        username: str = "cloudpelican",
        password: str = "cloudpelican",
        admin_password: str | None = None,
        slack_token: str | None = None,
        max_msg_memory: int = 10000,
        max_msg_batch: int = 10000,
        max_body_bytes: int = 32 * 1024 * 1024,
    ) -> None:
        self.engine = engine
        self.username = username
        self.password = password
        self.admin_password = admin_password
        self.slack_token = slack_token
        self.max_msg_batch = max_msg_batch
        self.max_body_bytes = max_body_bytes
        self.state = SupervisorState(max_msg_memory)
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------------

    def start(self, port: int = 0, host: str = "127.0.0.1") -> str:
        """Serve on a daemon thread; returns the base URL (port 0 = any).

        Binding beyond loopback requires non-default credentials — the
        reference ships cloudpelican/cloudpelican defaults, but exposing
        those on a routable interface is an open door."""
        if host not in ("127.0.0.1", "localhost") and (
            self.username, self.password
        ) == ("cloudpelican", "cloudpelican"):
            raise ValueError(
                "refusing to bind non-loopback with default credentials; "
                "pass explicit username/password"
            )
        api = self

        class Handler(_SupervisorHandler):
            sup = api

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        host, p = self._server.server_address[:2]
        return f"http://{host}:{p}"

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()

    # -- shared helpers -----------------------------------------------------

    def find_filter(self, filter_id: str):
        for f in self.engine.catalog.list(include_temp=True):
            if f.id == filter_id:
                return f
        return None


class _SupervisorHandler(BaseHTTPRequestHandler):
    sup: SupervisorHTTP  # injected subclass attribute

    # -- plumbing -----------------------------------------------------------

    def log_message(self, fmt, *args):  # quiet test output
        pass

    def _send(self, body: str, code: int = 200, ctype: str = "application/json"):
        data = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _jresp_ok(self, **kv):
        self._send(json.dumps({"status": True, **kv}))

    def _jresp_err(self, msg: str):
        # jresp.Error: HTTP 200 with status=false, like the reference
        self._send(json.dumps({"status": False, "errors": [msg]}))

    def _basic_auth(self) -> bool:
        """supervisor.go:822-843 — exact failure modes."""
        auth = self.headers.get("Authorization")
        if not auth:
            self._send("bad syntax a", 400, "text/plain")
            return False
        parts = auth.split(" ", 1)
        if len(parts) != 2 or parts[0] != "Basic":
            self._send("bad syntax b", 400, "text/plain")
            return False
        try:
            user, _, pwd = base64.b64decode(parts[1]).decode().partition(":")
        except Exception:
            user, pwd = "", ""
        # constant-time compare (round-2 review: `!=` is a timing side
        # channel on a network-facing supervisor); single non-short-circuit
        # AND so user and password checks always both run
        ok_user = hmac.compare_digest(
            user.encode(), self.sup.username.encode()
        )
        ok_pwd = hmac.compare_digest(
            pwd.encode(), self.sup.password.encode()
        )
        if not (ok_user & ok_pwd):
            self._send("authorization failed", 401, "text/plain")
            return False
        return True

    def _admin_auth(self, q) -> bool:
        """supervisor.go:812-819 — no password configured = open.
        Constant-time compare for the same reason _basic_auth uses it."""
        if not self.sup.admin_password:
            return True
        return hmac.compare_digest(
            q.get("admin_password", [""])[0].encode(),
            self.sup.admin_password.encode(),
        )

    def _body(self) -> bytes:
        """Read (and maybe gunzip) the request body.

        Hardened per round-2 review: a malformed Content-Length or a
        corrupt gzip stream returns the reference's jresp error envelope
        (supervisor.go answers 'Invalid GZIP' via jresp) instead of
        aborting the connection, and decompression is chunked with a hard
        output cap so a gzip bomb cannot buffer unbounded memory before
        the line-batch cap is applied (the reference's streaming scanner
        stops at maxMsgBatch lines)."""
        try:
            n = int(self.headers.get("Content-Length") or 0)
        except ValueError as ex:
            raise _BodyError(f"Invalid Content-Length: {ex}") from ex
        if n < 0:
            # read(-1) would block until client EOF, pinning the handler
            # thread — a negative length is always malformed
            raise _BodyError("Invalid Content-Length: negative")
        raw = self.rfile.read(min(n, self.sup.max_body_bytes + 1))
        if len(raw) > self.sup.max_body_bytes:
            raise _BodyError("Request body too large")
        if self.headers.get("Content-Encoding") == "gzip":
            gz = gzip.GzipFile(fileobj=io.BytesIO(raw))
            chunks, total = [], 0
            try:
                while True:
                    chunk = gz.read(65536)
                    if not chunk:
                        break
                    total += len(chunk)
                    if total > self.sup.max_body_bytes:
                        raise _BodyError("Invalid GZIP: decompressed too large")
                    chunks.append(chunk)
            except (OSError, EOFError, zlib.error) as ex:
                raise _BodyError(f"Invalid GZIP: {ex}") from ex
            raw = b"".join(chunks)
        return raw

    # -- routing ------------------------------------------------------------

    def _route(self, method: str):
        url = urlparse(self.path)
        q = parse_qs(url.query)
        parts = [p for p in url.path.split("/") if p]

        # Slack endpoint: its own auth model (form token), text answer
        if method == "POST" and parts == ["slack"]:
            return self._post_slack()

        if not self._basic_auth():
            return None

        if method == "GET" and not parts:
            return self._jresp_ok(hello="This is the CloudPelican supervisor")
        if method == "GET" and parts == ["ping"]:
            return self._jresp_ok(pong=True)
        if parts[:1] == ["filter"] and len(parts) == 1:
            if method == "POST":
                return self._post_filter(q)
            if method == "GET":
                return self._get_filters()
        if parts[:1] == ["filter"] and len(parts) == 2 and method == "DELETE":
            return self._delete_filter(parts[1])
        if parts[:1] == ["filter"] and len(parts) == 3:
            fid, leaf = parts[1], parts[2]
            if leaf == "result" and method == "GET":
                return self._get_results(fid, q)
            if leaf == "result" and method == "PUT":
                return self._put_results(fid)
            if leaf == "stats" and method == "GET":
                return self._get_stats(fid)
            if leaf == "outlier" and method == "POST":
                return self._post_outlier(fid, q)
        if method == "PUT" and parts == ["stats", "filters"]:
            return self._put_stats()
        if parts[:2] == ["admin", "truncate"] and method == "DELETE":
            if not self._admin_auth(q):
                return self._send("authorization failed", 401, "text/plain")
            with self.sup.state.lock:
                if parts[2:] == ["outliers"]:
                    n = len(self.sup.state.outliers)
                    self.sup.state.outliers.clear()
                    return self._jresp_ok(truncated=n)
                if parts[2:] == ["stats"]:
                    n = sum(len(m) for m in self.sup.state.stats.values())
                    self.sup.state.stats.clear()
                    return self._jresp_ok(truncated=n)
        if method == "PUT" and parts == ["admin", "config"]:
            if not self._admin_auth(q):
                return self._send("authorization failed", 401, "text/plain")
            key = q.get("key", [""])[0].strip()
            value = q.get("value", [""])[0]
            if not key:
                return self._jresp_err("Please provide a key")
            cfg = self.sup.engine.execute(f"configure supervisor {key}={value}")
            return self._jresp_ok(config=cfg)
        if method == "POST" and parts == ["bigquery", "query"]:
            return self._post_query()
        return self._send("not found", 404, "text/plain")

    # -- handlers -----------------------------------------------------------

    def _post_filter(self, q):
        regex = q.get("regex", [""])[0].strip()
        if not regex:
            return self._jresp_err("Please provide a regex")
        name = q.get("name", [""])[0].strip()
        if not name:
            return self._jresp_err("Please provide a name")
        try:
            f = self.sup.engine.catalog.create(
                name, regex, client_host=self.client_address[0]
            )
        except Exception as ex:
            return self._jresp_err(f"Failed to create filter: {ex}")
        return self._jresp_ok(filter_id=f.id)

    def _get_filters(self):
        filters = OrderedDict(
            (
                f.id,
                {"id": f.id, "name": f.name, "regex": f.regex},
            )
            for f in self.sup.engine.catalog.list()
        )
        return self._jresp_ok(filters=filters)

    def _delete_filter(self, fid: str):
        f = self.sup.find_filter(fid)
        if f is None:
            return self._jresp_ok(deleted=False)
        self.sup.engine.catalog.drop(f.name)
        return self._jresp_ok(deleted=True)

    def _get_results(self, fid: str, q):
        if self.sup.find_filter(fid) is None:
            return self._jresp_err(f"Filter {fid} not found")
        off_str = q.get("result_offset", [""])[0]
        if not off_str:
            return self._jresp_err("Please provide a result offset")
        try:
            offset = int(off_str)
        except ValueError as ex:
            return self._jresp_err(f"Please provide a valid result offset: {ex}")
        max_off, lines = self.sup.state.read_results(fid, offset)
        return self._jresp_ok(result_offset=max_off, results=lines)

    def _put_results(self, fid: str):
        if self.sup.find_filter(fid) is None:
            return self._jresp_err(f"Filter {fid} not found")
        text = self._body().decode("utf-8", errors="replace")
        lines = text.splitlines()[: self.sup.max_msg_batch]  # max-msg-batch cap
        ack = self.sup.state.add_results(fid, lines)
        return self._jresp_ok(ack=ack, lines=len(lines))

    def _get_stats(self, fid: str):
        if self.sup.find_filter(fid) is None:
            return self._jresp_err(f"Filter {fid} not found")
        with self.sup.state.lock:
            metrics = self.sup.state.stats.get(fid, {})
            m = {
                str(metric): {str(b): v for b, v in buckets.items()}
                for metric, buckets in metrics.items()
            }
        return self._jresp_ok(stats=m)

    def _post_outlier(self, fid: str, q):
        if self.sup.find_filter(fid) is None:
            return self._jresp_err(f"Filter {fid} not found")
        ts = q.get("timestamp", [""])[0].strip()
        if not ts:
            return self._jresp_err("Please provide a timestamp")
        try:
            ts_i = int(ts)
        except ValueError as ex:
            return self._jresp_err(f"Please provide a valid timestamp: {ex}")
        score = q.get("score", [""])[0].strip()
        if not score:
            return self._jresp_err("Please provide a score")
        try:
            score_f = float(score)
        except ValueError as ex:
            return self._jresp_err(f"Please provide a valid score: {ex}")
        with self.sup.state.lock:
            self.sup.state.outliers.append(
                {"filter_id": fid, "timestamp": ts_i, "score": score_f}
            )
        return self._jresp_ok(stored=True)

    def _put_stats(self):
        try:
            data = json.loads(self._body().decode("utf-8"))
            if not isinstance(data, dict):
                # a real raise, not assert: `python -O` strips asserts
                # and a JSON array body would then crash below as a 500
                # instead of this clean 4xx
                raise ValueError("stats body must be a JSON object")
        except Exception as ex:
            return self._jresp_err(f"Invalid request JSON: {ex}")
        updates = 0
        # keys are "f=<id>_m=<metric>_b=<bucket>" (supervisor.go:733-771);
        # malformed keys AND malformed count values are skipped, not
        # errors — the reference logs-and-continues per entry, and a
        # half-processed batch must still ack the valid rows
        for k, count in data.items():
            try:
                count_i = int(count)
            except (TypeError, ValueError):
                continue
            fid, metric, bucket = "", 0, 0
            for pair in str(k).split("_"):
                kk, _, vv = pair.partition("=")
                if kk == "f":
                    fid = vv
                elif kk == "m" and vv.lstrip("-").isdigit():
                    metric = int(vv)
                elif kk == "b" and vv.lstrip("-").isdigit():
                    bucket = int(vv)
            if not fid or self.sup.find_filter(fid) is None:
                continue
            if self.sup.state.add_stats(fid, metric, bucket, count_i):
                updates += 1
        return self._jresp_ok(updates=updates)

    def _post_query(self):
        """BigQuery passthrough: SQL in the body, TSV out (NOT JSON,
        supervisor.go:276) — executes on Spark via engine.search."""
        from cloudpelican_lsd_spark.engine import df_to_tsv

        # errors="replace": a stray invalid byte must produce the error
        # envelope (or a parse error), never an uncaught UnicodeDecodeError
        # dropping the connection (same hardening as _put_results)
        sql = self._body().decode("utf-8", errors="replace").strip()
        if not sql:
            return self._send("empty query", 400, "text/plain")
        try:
            body = df_to_tsv(self.sup.engine.search(sql), max_rows=10000)
        except Exception as ex:
            return self._send(f"error: {ex}", 400, "text/plain")
        return self._send(body, 200, "text/tab-separated-values")

    def _post_slack(self):
        body = self._body().decode("utf-8", errors="replace")
        form = {k: v[0] for k, v in parse_qs(body).items()}
        # secure default: with no token CONFIGURED the endpoint is closed —
        # the reference reads slack_token via GetNotEmpty (config required);
        # an unset token must not mean "accept anything" on the one route
        # that bypasses basic auth
        # constant-time compare: this is the one route that BYPASSES
        # basic auth, gated solely by this token
        if not self.sup.slack_token or not hmac.compare_digest(
            form.get("token", "").encode(), self.sup.slack_token.encode()
        ):
            return self._send("invalid token", 401, "text/plain")
        text = form.get("text", "")
        out = slack_command(self.sup.engine, text)  # 12 KB cap inside
        return self._send(out, 200, "text/plain")

    # -- verb dispatch ------------------------------------------------------

    def _dispatch(self, method: str):
        try:
            self._route(method)
        except _BodyError as ex:
            # malformed body → jresp error envelope, connection stays up
            self._jresp_err(str(ex))

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")

    def do_PUT(self):
        self._dispatch("PUT")

    def do_DELETE(self):
        self._dispatch("DELETE")
