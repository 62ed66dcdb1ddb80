"""Failure-notification hook — the reference pipeline's on-failure
alert chain, re-expressed with a pluggable transport.

Reference parity: ETL_FABRIC.json:1 wires, per layer, a
``Lookup_Error_{Bronce,Silver,Gold}`` activity (``SELECT TOP 1 … FROM
{layer}_execution_log WHERE status = 'Failed' ORDER BY timestamp
DESC``, fired only when the layer activity Failed) into an
``Email_Notificacion_Error_*`` activity whose body carries the failed
layer, timestamp, execution id, and error details. The LOOKUP half has
been in this engine since round 1 (``plans/logs.py:latest_failures``,
driver-checked as q09's family); this module adds the SEND half.

An engine cannot assume an Office365 connector, so the transport is a
SEAM with three concrete implementations and a composite:

- :class:`FileNotifier` — appends one JSON line per notification to a
  local/DBFS path. Durable, dependency-free, greppable; the default
  for air-gapped runs and for tests.
- :class:`WebhookNotifier` — ``urllib`` POST of the notification JSON
  to an HTTP endpoint (the self-hosted analog of the reference's mail
  connector: Slack/Teams/SMTP-bridge webhooks all take this shape).
  Network errors are reported, never raised: a dead alert channel must
  not fail a pipeline whose data work succeeded.
- :class:`CallableNotifier` — wraps any ``fn(notification_dict)``.
- :class:`CompositeNotifier` — fan-out to several transports.

Orchestration wiring mirrors the reference's DAG: the CLI
(``python -m spaceparts_data_pipeline_spark --notify-file/--notify-
webhook``) calls :func:`notify_on_failure` per FAILED layer after the
run, each notification rendered from that layer's latest execution-log
failure row.
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import asdict, dataclass

from pyspark.sql import SparkSession

from spaceparts_data_pipeline_spark.plans import logs


@dataclass
class Notification:
    """One failure alert — the fields the reference's mail body
    interpolates (layer, when, execution id, details), plus the failed
    table for multi-table layers (the reference's warehouse variant
    carries the same via ``activity_name``)."""

    layer: str
    subject: str
    body: str
    execution_id: str | None = None
    table_name: str | None = None
    error_message: str | None = None
    timestamp: str | None = None

    def as_dict(self) -> dict:
        return asdict(self)


class FileNotifier:
    """Append each notification as one JSON line to ``path``. Like every
    transport here, delivery failure (unwritable path) returns False
    and records ``last_error`` — it never raises into the pipeline."""

    def __init__(self, path: str):
        self.path = path
        self.last_error: str | None = None

    def send(self, notification: Notification) -> bool:
        try:
            with open(self.path, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(notification.as_dict(), ensure_ascii=False) + "\n")
            self.last_error = None
            return True
        except OSError as exc:
            self.last_error = str(exc)
            return False


class CallableNotifier:
    """Adapter for any ``fn(notification_dict)`` transport. Like every
    transport here it never raises: a crashing callable returns False
    with ``last_error`` set, so CompositeNotifier still attempts the
    remaining transports and the pipeline's summary still prints."""

    def __init__(self, fn):
        self.fn = fn
        self.last_error: str | None = None

    def send(self, notification: Notification) -> bool:
        try:
            self.fn(notification.as_dict())
            self.last_error = None
            return True
        except Exception as exc:  # noqa: BLE001 — alert channel must not raise
            self.last_error = str(exc)
            return False


class WebhookNotifier:
    """POST the notification JSON to ``url``. Delivery failures return
    False (and keep the error on ``last_error``) instead of raising —
    an unreachable alert endpoint must not fail the pipeline run it is
    reporting on."""

    def __init__(self, url: str, timeout_s: float = 10.0):
        self.url = url
        self.timeout_s = timeout_s
        self.last_error: str | None = None

    def send(self, notification: Notification) -> bool:
        import urllib.request

        try:
            # Request construction INSIDE the try: a malformed/schemeless
            # URL raises ValueError at construction, and the never-raise
            # contract covers configuration errors too — a bad webhook
            # URL must not crash a pipeline whose data work succeeded
            req = urllib.request.Request(
                self.url,
                data=json.dumps(notification.as_dict(), ensure_ascii=False).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                self.last_error = None
                return 200 <= resp.status < 300
        except Exception as exc:  # noqa: BLE001 — alert channel must not raise
            self.last_error = str(exc)
            return False


class CompositeNotifier:
    """Fan out to several transports — EVERY transport is attempted
    (no short-circuit: the file landing must not suppress the webhook
    the on-call channel reads); True if any delivery succeeded."""

    def __init__(self, notifiers):
        self.notifiers = list(notifiers)

    def send(self, notification: Notification) -> bool:
        results = [bool(n.send(notification)) for n in self.notifiers]
        return any(results)


def render_failure(layer: str, row, pipeline: str = "spaceparts-pipeline") -> Notification:
    """Render one execution-log failure row into the reference's alert
    shape (layer, timestamp, execution id, error details —
    ETL_FABRIC.json:1 ``Email_Notificacion_Error_*`` body fields)."""
    ts = row["execution_timestamp"]
    ts_s = ts.isoformat(sep=" ") if isinstance(ts, dt.datetime) else str(ts)
    subject = f"ERROR in {layer} layer — pipeline {pipeline}"
    body = (
        f"Pipeline {pipeline} failed in the {layer} layer.\n"
        f"Failed table: {row['table_name']}\n"
        f"Timestamp (UTC): {ts_s}\n"
        f"Execution ID: {row['execution_id']}\n"
        f"Details: {row['message'] or '(no message recorded)'}"
    )
    return Notification(
        layer=layer,
        subject=subject,
        body=body,
        execution_id=row["execution_id"],
        table_name=row["table_name"],
        error_message=row["message"],
        timestamp=ts_s,
    )


def notify_on_failure(
    spark: SparkSession,
    log_table: str,
    layer: str,
    notifier,
    execution_id: str | None = None,
    pipeline: str = "spaceparts-pipeline",
) -> bool:
    """The reference's ``Lookup_Error_* → Email_Notificacion_Error_*``
    chain for one layer: read the LATEST failure row from ``log_table``
    (``logs.latest_failures`` — the same TOP-1-by-timestamp lookup,
    ≤1 driver-side row), render it, send it. Optionally scoped to one
    ``execution_id`` so an old failure row can never re-alert on a
    later healthy run. Returns True iff a notification was sent."""
    if not spark.catalog.tableExists(log_table):
        return False
    rows = logs.latest_failures(spark, log_table, execution_id=execution_id).collect()
    if not rows:
        return False
    return bool(notifier.send(render_failure(layer, rows[0], pipeline=pipeline)))


def notify_failed_layers(
    spark: SparkSession,
    failed_layers: dict[str, str | None],
    notifier,
    pipeline: str = "spaceparts-pipeline",
) -> tuple[list[str], dict[str, str]]:
    """Run :func:`notify_on_failure` for each failed layer and harvest
    per-transport delivery errors. ``failed_layers`` maps layer name →
    execution id to scope the failure-row lookup to (or None for
    unscoped). Returns ``(notified_layers, notify_errors)`` where
    ``notify_errors`` keys are ``"<TransportClass>:<layer>"``.

    Each transport's ``last_error`` is RESET before each layer's send:
    when a layer's notify finds no failure row (log table missing, no
    scoped row) and sends nothing, a previous layer's stale
    ``last_error`` must not be harvested under the new layer key —
    that would report a delivery failure for a send that never
    happened (r14 advice #1)."""
    parts = (notifier.notifiers if isinstance(notifier, CompositeNotifier)
             else [notifier])
    notified: list[str] = []
    errors: dict[str, str] = {}
    for layer, execution_id in failed_layers.items():
        for part in parts:
            part.last_error = None
        if notify_on_failure(spark, f"{layer}_execution_log", layer,
                             notifier, execution_id=execution_id,
                             pipeline=pipeline):
            notified.append(layer)
        # harvest delivery failures PER SEND (last_error resets on a
        # later success): a dead transport must be visible in the
        # summary, not silent
        for part in parts:
            err = getattr(part, "last_error", None)
            if err:
                errors[f"{type(part).__name__}:{layer}"] = err
    return notified, errors
