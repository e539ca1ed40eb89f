"""Persistent retrieval service over a ``QueryEngine``.

The reference's only "serving" story is batch scoring through ``caffe
test`` / a pycaffe forward (tools/caffe.cpp:229-296,
do_trec_qa_clean.py:617-652): load weights, score a file, exit.  This
module completes the production path the rebuild is designed for: a
long-lived process that owns the device, keeps the candidate pool packed
on-chip, and answers queries over HTTP -- stdlib ``http.server`` only
(this sandbox and most TPU hosts have no web framework).

Endpoints (all JSON):

  GET  /healthz  liveness + pool facts
  GET  /stats    rolling latency percentiles + counters
  POST /query    {"tokens": [[int,...],...]} or {"text": ["...",...]},
                 optional "k" (default 10) and "rerank" (shortlist size;
                 0 = single-phase).  Scalar forms ("text": "...", one
                 token row) are accepted and auto-batched.  Returns
                 {"results": [{"topk": [[candidate_index, score],...]},
                 ...], "latency_ms": ...}.

Raw-text queries are tokenized exactly like the data pipeline
(lowercase whitespace split, OOV -> unknown_idx, center-pad to the
model's question length -- do_trec_qa_clean.py:184-203 semantics via
``data.trec_qa.encode_tokens``), so a server pointed at a prepped data
dir serves the same index space the model was trained on.

Device work is serialized with a lock: the engine dispatches to ONE
device stream, and interleaved dispatch from request threads would only
queue behind it anyway (and through a remote tunnel can deadlock a
second process -- CLAUDE.md tunnel rules; same one-owner discipline).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Stats:
    def __init__(self, window: int = 512):
        self.lock = threading.Lock()
        self.latencies_ms = deque(maxlen=window)
        self.queries = 0
        self.rows = 0
        self.errors = 0

    def record(self, ms: float, rows: int):
        with self.lock:
            self.latencies_ms.append(ms)
            self.queries += 1
            self.rows += rows

    def record_error(self):
        with self.lock:
            self.errors += 1

    def snapshot(self) -> dict:
        with self.lock:
            lat = sorted(self.latencies_ms)
            out = {"queries_served": self.queries,
                   "query_rows": self.rows,
                   "errors": self.errors}
            if lat:
                out["p50_ms"] = lat[len(lat) // 2]
                out["p90_ms"] = lat[min(len(lat) - 1,
                                        int(len(lat) * 0.9))]
            return out


class QAServer:
    """HTTP façade over a built ``QueryEngine``.

    engine: a QueryEngine whose ``build_index`` has run.
    state:  model state (BN stats) -- required for rerank requests.
    vocab_words: index-ordered word array (vocab.npz["words"]) enabling
        "text" queries; unknown_idx/pad_idx follow build_vocab's layout
        (n and n+1, data/trec_qa.py).
    """

    def __init__(self, engine, *, state=None, vocab_words=None,
                 q_len: int | None = None, host: str = "127.0.0.1",
                 port: int = 0, default_k: int = 10,
                 max_batch: int = 1024):
        if engine.pool_size == 0:
            raise ValueError("engine has no index; call build_index first")
        self.engine = engine
        self.state = state
        self.q_len = q_len or engine.cfg.question_len
        self.default_k = default_k
        self.max_batch = max_batch
        self.stats = _Stats()
        self._device_lock = threading.Lock()
        if vocab_words is not None:
            words = [str(w) for w in np.asarray(vocab_words).tolist()]
            self.vocab = {w: i for i, w in enumerate(words)}
            self.unknown_idx = len(words)
            self.pad_idx = len(words) + 1
        else:
            self.vocab = None
            # token rows can still be padded: the engine's vocab tail is
            # [unknown, pad] by build_vocab construction
            self.unknown_idx = engine.cfg.vocab_size - 2
            self.pad_idx = engine.cfg.vocab_size - 1
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; stats carry the signal
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, server.health())
                elif self.path == "/stats":
                    self._send(200, server.stats.snapshot())
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path != "/query":
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        req = json.loads(self.rfile.read(n) or b"{}")
                    except json.JSONDecodeError as e:
                        raise _BadRequest(f"invalid JSON: {e}") from e
                    payload = server.handle_query(req)
                    self._send(200, payload)
                except _BadRequest as e:
                    server.stats.record_error()
                    self._send(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 -- keep serving
                    server.stats.record_error()
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self.host, self.port = self.httpd.server_address[:2]
        self._thread = None

    # ------------------------------------------------------------- public
    def health(self) -> dict:
        eng = self.engine
        return {"ok": True, "pool": int(eng.pool_size),
                "pool_dtype": eng.quant or str(np.dtype(eng.pool_dtype)),
                "q_len": self.q_len, "text_queries": self.vocab is not None,
                **self.stats.snapshot()}

    def start(self):
        """Serve in a background thread (returns immediately)."""
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------ queries
    def encode_texts(self, texts: list[str]) -> np.ndarray:
        if self.vocab is None:
            raise _BadRequest("server started without a vocabulary; "
                              "send 'tokens' instead of 'text'")
        from ..data.trec_qa import encode_tokens
        rows = [encode_tokens(t.lower().split(), self.vocab,
                              self.unknown_idx, self.pad_idx, self.q_len)
                for t in texts]
        return np.asarray(rows, np.int32)

    def _pad_tokens(self, rows) -> np.ndarray:
        out = np.full((len(rows), self.q_len), self.pad_idx, np.int32)
        for i, r in enumerate(rows):
            try:
                ids = np.asarray(r, np.int32).ravel()[: self.q_len]
            except (TypeError, ValueError) as e:
                raise _BadRequest(f"row {i} of 'tokens' is not an id "
                                  f"list: {e}") from e
            if (ids < 0).any() or (ids >= self.engine.cfg.vocab_size).any():
                raise _BadRequest(
                    f"token ids of row {i} outside [0, "
                    f"{self.engine.cfg.vocab_size})")
            pad_b = max(0, (self.q_len - len(ids)) // 2)  # center, like prep
            out[i, pad_b: pad_b + len(ids)] = ids
        return out

    def handle_query(self, req: dict) -> dict:
        if not isinstance(req, dict):
            raise _BadRequest("body must be a JSON object")
        try:
            k = int(req.get("k", self.default_k))
            rerank = int(req.get("rerank", 0))
        except (TypeError, ValueError) as e:
            raise _BadRequest(f"'k'/'rerank' must be integers: {e}") from e
        if k < 1:
            raise _BadRequest(f"k must be >= 1, got {k}")
        if rerank < 0:
            raise _BadRequest(f"rerank must be >= 0, got {rerank}")
        if "text" in req:
            texts = req["text"]
            if isinstance(texts, str):
                texts = [texts]
            if not texts or not all(isinstance(t, str) for t in texts):
                raise _BadRequest("'text' must be a string or list of them")
            q = self.encode_texts(texts)
        elif "tokens" in req:
            rows = req["tokens"]
            if not isinstance(rows, list):
                raise _BadRequest("'tokens' must be a list of ids or a "
                                  "list of id lists")
            if rows and isinstance(rows[0], (int, float)):
                rows = [rows]
            if not rows:
                raise _BadRequest("'tokens' is empty")
            q = self._pad_tokens(rows)
        else:
            raise _BadRequest("body needs 'text' or 'tokens'")
        if len(q) > self.max_batch:
            raise _BadRequest(f"batch {len(q)} exceeds max_batch "
                              f"{self.max_batch}")
        t0 = time.perf_counter()
        with self._device_lock:
            if rerank:
                if self.state is None:
                    raise _BadRequest("rerank needs model state; server "
                                      "started without it")
                vals, idx = self.engine.query_rerank(
                    self.state, q, k=k, shortlist=rerank)
            else:
                vals, idx = self.engine.query(q, k=k)
            vals = np.asarray(vals)  # host fetch fences the device work
            idx = np.asarray(idx)
        ms = (time.perf_counter() - t0) * 1e3
        self.stats.record(ms, len(q))
        return {
            "results": [
                {"topk": [[int(i), float(v)] for i, v in zip(ri, rv)]}
                for ri, rv in zip(idx, vals)],
            "latency_ms": round(ms, 3),
            "k": k,
        }


class _BadRequest(ValueError):
    pass
