"""Minimal in-process Elasticsearch ``_bulk`` stub (pure stdlib).

Implements just enough of the bulk API to integration-test
``es_bulk_writer`` over real HTTP: ndjson action/document pairs,
``index`` (upsert by _id) and ``delete`` actions, a JSON response
with per-item statuses, and an optional fault schedule (the first N
requests answer 503) to exercise the retry path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class EsStub:
    def __init__(self, fail_first: int = 0, backpressure_first: int = 0):
        self.docs: dict[tuple[str, str], dict] = {}   # (index, _id) -> doc
        self.requests = 0
        self.fail_first = fail_first
        # first N requests answer 200 but reject every SECOND index
        # action with an item-level 429 (real ES backpressure shape)
        self.backpressure_first = backpressure_first
        self.action_counts: list[int] = []    # actions seen per request
        self._lock = threading.Lock()
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_POST(self):
                if not self.path.endswith("/_bulk"):
                    self.send_error(404)
                    return
                body = self.rfile.read(
                    int(self.headers["Content-Length"])).decode()
                with stub._lock:
                    stub.requests += 1
                    if stub.requests <= stub.fail_first:
                        self.send_error(503, "simulated overload")
                        return
                    throttling = (stub.requests
                                  <= stub.backpressure_first)
                    items = []
                    lines = [ln for ln in body.splitlines() if ln.strip()]
                    i = 0
                    while i < len(lines):
                        action = json.loads(lines[i])
                        kind = next(iter(action))
                        meta = action[kind]
                        key = (meta["_index"], meta["_id"])
                        if kind == "index":
                            if throttling and len(items) % 2 == 1:
                                items.append({"index": {
                                    "status": 429,
                                    "error": {"type":
                                              "es_rejected_execution"}}})
                                i += 2
                                continue
                            stub.docs[key] = json.loads(lines[i + 1])
                            items.append({"index": {"status": 200}})
                            i += 2
                        elif kind == "delete":
                            existed = stub.docs.pop(key, None) is not None
                            items.append({"delete": {
                                "status": 200 if existed else 404,
                                "result": "deleted" if existed
                                          else "not_found"}})
                            i += 1
                        else:
                            items.append({kind: {"status": 400}})
                            i += 1
                    stub.action_counts.append(len(items))
                # like real ES: any item status >= 300 flips the flag
                # (including delete-of-missing 404s)
                errors = any(next(iter(it.values()))["status"] >= 300
                             for it in items)
                resp = json.dumps({"errors": errors,
                                   "items": items}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}"
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()
