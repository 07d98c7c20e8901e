"""Technical HTTP surface + tracing — the reference's observability chain.

Re-expresses the last three SURVEY.md §2 rows that were previously descoped:

  O6  Prometheus /metrics + /liveness + /readiness
      (/root/reference/internal/http/server.go:83-86,
       internal/http/handler/monitoring.go:19-21,
       internal/metrics/kafka.go:26-50 — the three per-topic Kafka counters)
  U4  SSE fan-out of debug events to N concurrent clients
      (/root/reference/internal/http/handler/debug.go:45-110,
       internal/debug/debugger.go:22-49)
  O5  OpenTelemetry tracer provider — noop when no collector endpoint is
      configured, real OTel SDK when importable, JSON-lines span recorder
      otherwise (/root/reference/internal/service/otel.go:19-69)

Everything here is stdlib-only (http.server / threading / queue / json) so it
runs in any Spark driver. Spark-first contract: counters are incremented with
*batch aggregates* (one `Observation` result per micro-batch, riding the
write job), never per row — a 1000-executor cluster must not funnel 10^10
per-row callbacks through the driver. The debug tap is bounded (`limit(n)`
per epoch), exactly like the reference's single-buffered debug channel
drops volume beyond what a human can watch.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


# ---------------------------------------------------------------------------
# O6 — Prometheus counters (internal/metrics/kafka.go parity)
# ---------------------------------------------------------------------------


class KafkaRecorder:
    """Per-topic produce/success/error counters with Prometheus text
    exposition. Metric names match internal/metrics/kafka.go:26-50 so a
    dashboard built for the reference reads this endpoint unchanged."""

    _METRICS = (
        (
            "kafka_client_produce_counter_total",
            "This represent the number of messages pushed by Kafka client",
        ),
        (
            "kafka_producer_event_success_counter_total",
            "This represent the number of successful messages pushed into Kafka",
        ),
        (
            "kafka_producer_event_error_counter_total",
            "This represent the number of error messages handled by Kafka producer",
        ),
    )

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, dict[str, float]] = {
            name: {} for name, _ in self._METRICS
        }

    def _inc(self, metric: str, topic: str, n: float) -> None:
        if n < 0:
            raise ValueError("counters only go up")
        with self._lock:
            by_topic = self._counters[metric]
            by_topic[topic] = by_topic.get(topic, 0.0) + n

    def inc_produce(self, topic: str, n: float = 1) -> None:
        self._inc("kafka_client_produce_counter_total", topic, n)

    def inc_success(self, topic: str, n: float = 1) -> None:
        self._inc("kafka_producer_event_success_counter_total", topic, n)

    def inc_error(self, topic: str, n: float = 1) -> None:
        self._inc("kafka_producer_event_error_counter_total", topic, n)

    def value(self, metric: str, topic: str) -> float:
        with self._lock:
            return self._counters[metric].get(topic, 0.0)

    def exposition(self) -> str:
        """Prometheus text format 0.0.4 (the promhttp.Handler() output)."""
        out = []
        with self._lock:
            for name, help_ in self._METRICS:
                out.append(f"# HELP {name} {help_}")
                out.append(f"# TYPE {name} counter")
                for topic in sorted(self._counters[name]):
                    v = self._counters[name][topic]
                    body = int(v) if float(v).is_integer() else v
                    out.append(f'{name}{{topic="{topic}"}} {body}')
        return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# U4 — debug event fan-out hub (internal/debug/debugger.go parity)
# ---------------------------------------------------------------------------


class Debugger:
    """Fan-out hub: every subscriber gets every event added after it
    subscribed (debug.go:93-110 broadcasts each event to all client
    channels). Per-client queues are bounded with drop-oldest so one stalled
    browser can never backpressure the engine (the reference's 1-buffered
    channel instead blocks the producer — an acceptable divergence, noted)."""

    def __init__(self, context: dict | None = None, max_queue: int = 256):
        self._context = dict(context or {})
        self._max_queue = max_queue
        self._lock = threading.Lock()
        self._clients: set[queue.Queue] = set()

    # -- reference Debugger surface -------------------------------------
    def enabled(self) -> bool:
        return True

    def context(self) -> dict:
        """The UI template context (debugger.go:52-57 exposes db/collection;
        here: whatever the caller passed — table path, topic...)."""
        return dict(self._context)

    def add(self, message: dict | None) -> None:
        """Message → debug Event, error-tolerant (debugger.go:22-49: nil and
        unparseable messages are silently skipped; for `update` ops the
        payload shown is the update description, else the full document)."""
        if message is None:
            return
        try:
            env = json.loads(message["value"])
            op = env.get("operationType")
            # update → show the update description (debugger.go:36-38);
            # envelopes produced with ignoreUpdateDescription carry only
            # fullDocument, so fall back rather than show nothing
            doc = env.get("fullDocument")
            if op == "update" and env.get("updateDescription") is not None:
                doc = env.get("updateDescription")
            event = {
                "timestamp": int(env.get("clusterTime") or 0),
                "id": str(message.get("key", "")),
                "operation": op,
                "value": json.dumps(doc, sort_keys=True),
            }
        except (KeyError, TypeError, ValueError):
            return
        self._publish(event)

    def _publish(self, event: dict) -> None:
        with self._lock:
            clients = list(self._clients)
        for q in clients:
            try:
                q.put_nowait(event)
            except queue.Full:
                try:  # drop-oldest, keep the feed live
                    q.get_nowait()
                    q.put_nowait(event)
                except (queue.Empty, queue.Full):
                    pass

    # -- subscription management (debug.go newClients/closingClients) ---
    def subscribe(self) -> queue.Queue:
        q: queue.Queue = queue.Queue(maxsize=self._max_queue)
        with self._lock:
            self._clients.add(q)
        return q

    def unsubscribe(self, q: queue.Queue) -> None:
        with self._lock:
            self._clients.discard(q)

    @property
    def n_clients(self) -> int:
        with self._lock:
            return len(self._clients)


# ---------------------------------------------------------------------------
# O5 — tracer provider (internal/service/otel.go parity)
# ---------------------------------------------------------------------------


class _NoopSpan:
    def set_attribute(self, key, value):  # noqa: ARG002
        return None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class NoopTracerProvider:
    """trace.NewNoopTracerProvider() analog (otel.go:23-27): tracing is
    disabled when no collector endpoint is configured."""

    enabled = False

    def start_span(self, name: str, attributes: dict | None = None):  # noqa: ARG002
        return _NoopSpan()


class _LogSpan:
    def __init__(self, log, name, attributes):
        self._log = log
        self._rec = {"name": name, "attributes": dict(attributes or {})}

    def set_attribute(self, key, value):
        self._rec["attributes"][key] = value

    def __enter__(self):
        self._t0 = time.monotonic()
        self._rec["start_unix"] = time.time()
        return self

    def __exit__(self, exc_type, exc, tb):  # noqa: ARG002
        self._rec["duration_s"] = round(time.monotonic() - self._t0, 6)
        self._rec["status"] = "ERROR" if exc_type else "OK"
        self._log.emit(self._rec)
        return False


class JsonSpanTracerProvider:
    """Span recorder used when the real OTel SDK is absent: spans land in a
    MetricsLog-style JSON-lines file — same batching role as otel.go's
    BatchSpanProcessor, queryable after the run."""

    enabled = True

    def __init__(self, metrics_log, service_name: str = "kmw-spark"):
        self._log = metrics_log
        self._service = service_name

    def start_span(self, name: str, attributes: dict | None = None):
        attrs = {"service.name": self._service, **(attributes or {})}
        return _LogSpan(self._log, name, attrs)


def get_tracer_provider(
    collector_endpoint: str = "",
    *,
    app_name: str = "kmw-spark",
    span_log=None,
):
    """Container.GetTracerProvider() parity (otel.go:19-69): empty endpoint →
    noop provider; else the real OTel SDK (OTLP exporter, service.name
    resource) when the packages are importable, falling back to the
    JSON-lines recorder (`span_log`, a MetricsLog) in this sandbox."""
    if not collector_endpoint:
        return NoopTracerProvider()
    try:
        from opentelemetry import trace as _trace  # noqa: F401
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (  # noqa: F401
            OTLPSpanExporter,
        )
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor

        provider = TracerProvider(
            resource=Resource.create({"service.name": app_name})
        )
        provider.add_span_processor(
            BatchSpanProcessor(OTLPSpanExporter(endpoint=collector_endpoint, insecure=True))
        )

        class _OtelAdapter:
            enabled = True

            def __init__(self, p):
                self._tracer = p.get_tracer("kafka_mongo_watcher_spark")

            def start_span(self, name, attributes=None):
                return self._tracer.start_as_current_span(name, attributes=attributes or {})

        return _OtelAdapter(provider)
    except ImportError:
        if span_log is None:
            raise ValueError(
                "OTel SDK not installed and no span_log fallback provided"
            ) from None
        return JsonSpanTracerProvider(span_log, service_name=app_name)


# ---------------------------------------------------------------------------
# The technical HTTP server (internal/http/server.go parity)
# ---------------------------------------------------------------------------


class TechServer:
    """`/metrics`, `/liveness`, `/readiness`, and (when a debugger is
    wired) `/sse/event` — the reference's technical server routes
    (server.go:83-105). pprof and the HTML debug UI are intentionally not
    reproduced (Go-runtime/browser-asset surfaces, SURVEY §2.4-2.5)."""

    def __init__(
        self,
        *,
        recorder: KafkaRecorder | None = None,
        debugger: Debugger | None = None,
        addr: str = "127.0.0.1",
        port: int = 0,
        ping_interval_s: float = 10.0,
    ):
        self.recorder = recorder or KafkaRecorder()
        self.debugger = debugger
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: ARG002 — quiet
                return None

            def _text(self, status: int, body: str, ctype="text/plain; charset=utf-8"):
                data = body.encode()
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
                path = self.path.split("?", 1)[0]
                if path in ("/liveness", "/readiness"):
                    # monitoring.go:19-21 — 200, empty body
                    self._text(200, "")
                elif path == "/metrics":
                    self._text(
                        200,
                        outer.recorder.exposition(),
                        ctype="text/plain; version=0.0.4; charset=utf-8",
                    )
                elif path == "/sse/event" and outer.debugger is not None:
                    self._serve_sse()
                else:
                    self._text(404, "not found\n")

            def _serve_sse(self):
                # debug.go:45-91 — headers, `opened` hello, event/ping loop
                self.send_response(200)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "keep-alive")
                self.end_headers()
                q = outer.debugger.subscribe()
                try:
                    self._send_sse("opened", str(int(time.time())))
                    while not outer._closing.is_set():
                        try:
                            event = q.get(timeout=outer._ping_interval)
                        except queue.Empty:
                            self._send_sse("ping", str(int(time.time())))
                            continue
                        self._send_sse("event", json.dumps(event, sort_keys=True))
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client went away (debug.go:64-67)
                finally:
                    outer.debugger.unsubscribe(q)

            def _send_sse(self, event: str, data: str):
                self.wfile.write(f"event: {event}\ndata: {data}\n\n".encode())
                self.wfile.flush()

        self._ping_interval = ping_interval_s
        self._closing = threading.Event()
        self._httpd = ThreadingHTTPServer((addr, port), Handler)
        self._httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    @property
    def url(self) -> str:
        host, port = self.address
        return f"http://{host}:{port}"

    def start(self) -> "TechServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="kmw-tech-http", daemon=True
        )
        self._thread.start()
        return self

    def close(self) -> None:
        # server.Close() → graceful Shutdown (server.go:69-71)
        self._closing.set()
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
