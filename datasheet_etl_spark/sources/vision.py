"""External-call stage: the Spark shape of the reference's Vision API
client (vision_client.py:235-307 HTTP call, :459-479 retry/backoff,
:446-451 cost budget; mock double :310-355).

This is survey §4 custom-work item 1: Catalyst can't see inside an
external call, so the *engine* owns the physical design:

- **Arrow-batched mapInPandas** — per-batch client reuse, vectorized
  transfer, no per-row Python overhead beyond the call itself.
- **Rate partitioning** — ``rate_partitions`` sizes the stage to the
  API's concurrency limit, NOT the cluster's cores (1000 executors
  hitting a 20-concurrent-request API is an outage, not throughput).
- **In-UDF retry with exponential backoff** — Spark task retry would
  re-call the API for every row in the task; per-row retry contains the
  blast radius.
- **Budget guard, distributed honestly** — executors cannot read a
  global spend counter (accumulators are write-only on executors), so
  the budget is split per-partition up front and enforced locally;
  the accumulator reports actual spend to the driver for observability.
  Rows past the partition's share emit status='skipped_budget' rather
  than failing the job (the reference stops calling at 100% budget).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VISION_OUT_SCHEMA = (
    "media_id long, status string, attempts int, cost_usd double, "
    "n_chars long, n_digits long, first_token string"
)


class MockVisionClient:
    """Deterministic test double: 'extracts' cheap features from the
    payload text — enough structure for the stage's output to be
    SQL-reproducible, so the plumbing itself is oracle-checkable."""

    cost_per_call = 0.002  # demo price per table, progress_20260213_2225.md:28

    def extract(self, payload: bytes) -> dict:
        text = payload.decode("utf-8", errors="replace")
        toks = [t for t in text.split() if t]
        return {
            "n_chars": len(text),
            "n_digits": sum(ch in "0123456789" for ch in text),
            "first_token": toks[0] if toks else "",
        }


class HttpVisionClient:
    """The REAL HTTP client (ref: vision_client.py:235-307): POST the
    payload, parse the JSON response — one request per media item, a
    hard timeout so a hung endpoint fails the row instead of wedging
    the executor, and errors surfaced as exceptions for the stage's
    in-UDF retry/backoff to handle. NOT a subclass of the mock — the
    stage's client contract is just ``.extract(payload) -> dict`` +
    ``.cost_per_call``.

    ``cost_per_call`` MUST be set to the endpoint's real price — the
    stage's budget guard and spend accumulator bill with it, so a wrong
    value means a real overrun (the default matches the reference's
    demo price purely for test parity with the mock).

    Instantiated per partition inside ``vision_extract_stage`` (the
    factory runs in the Python worker), so connections/credentials are
    never pickled through the plan. Exercised end-to-end in
    tests/test_vision_stage.py against a loopback ``http.server`` —
    the full urllib POST → JSON → retry path, no network required;
    pointing it at a production endpoint is a URL + price change.
    """

    def __init__(
        self,
        endpoint: str,
        timeout_s: float = 60.0,
        cost_per_call: float = MockVisionClient.cost_per_call,
    ):
        self.endpoint = endpoint
        self.timeout_s = timeout_s
        self.cost_per_call = cost_per_call

    def extract(self, payload: bytes) -> dict:
        import json
        import urllib.request

        req = urllib.request.Request(
            self.endpoint,
            data=payload,
            headers={"Content-Type": "application/octet-stream"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))


class FlakyMockVisionClient(MockVisionClient):
    """Fails deterministically on the first ``fail_attempts`` tries for
    payloads whose id hits ``fail_mod`` — exercises the retry path."""

    def __init__(self, fail_mod: int = 3, fail_attempts: int = 2):
        self.fail_mod = fail_mod
        self.fail_attempts = fail_attempts
        self._attempts: dict[int, int] = {}

    def extract_with_id(self, media_id: int, payload: bytes) -> dict:
        seen = self._attempts.get(media_id, 0) + 1
        self._attempts[media_id] = seen
        if media_id % self.fail_mod == 0 and seen <= self.fail_attempts:
            raise ConnectionError(f"mock transient failure #{seen} for {media_id}")
        return self.extract(payload)


def vision_extract_stage(
    media: DataFrame,
    client_factory: Callable[[], MockVisionClient] | None = None,
    id_col: str = "media_id",
    payload_col: str = "content",
    max_retries: int = 3,
    backoff_base_s: float = 0.0,
    budget_usd: float | None = None,
    rate_partitions: int | None = None,
) -> DataFrame:
    """The external-call stage. Returns one row per input with extraction
    fields, attempt count, per-row cost, and status ∈ {ok, failed,
    skipped_budget}. Drops the payload column on output (binary hygiene).
    """
    spark = media.sparkSession
    spent_acc = spark.sparkContext.accumulator(0.0)

    if rate_partitions is not None:
        media = media.repartition(rate_partitions)
    n_parts = rate_partitions or media.rdd.getNumPartitions() or 1
    partition_budget = None if budget_usd is None else budget_usd / n_parts

    factory = client_factory or MockVisionClient

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = factory()
        call = getattr(client, "extract_with_id", None)
        local_spent = 0.0
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                media_id = int(media_id)
                if partition_budget is not None and local_spent >= partition_budget:
                    rows.append(
                        {
                            "media_id": media_id,
                            "status": "skipped_budget",
                            "attempts": 0,
                            "cost_usd": 0.0,
                            "n_chars": None,
                            "n_digits": None,
                            "first_token": None,
                        }
                    )
                    continue
                attempts, result, err = 0, None, None
                while attempts < max_retries:
                    attempts += 1
                    try:
                        payload_b = bytes(payload)
                        result = (
                            call(media_id, payload_b)
                            if call is not None
                            else client.extract(payload_b)
                        )
                        break
                    except Exception as exc:  # transient external failure
                        err = exc
                        if attempts < max_retries and backoff_base_s > 0:
                            time.sleep(backoff_base_s * (2 ** (attempts - 1)))
                cost = client.cost_per_call * attempts
                local_spent += cost
                spent_acc.add(cost)
                if result is None:
                    rows.append(
                        {
                            "media_id": media_id,
                            "status": f"failed: {type(err).__name__}",
                            "attempts": attempts,
                            "cost_usd": cost,
                            "n_chars": None,
                            "n_digits": None,
                            "first_token": None,
                        }
                    )
                else:
                    rows.append(
                        {
                            "media_id": media_id,
                            "status": "ok",
                            "attempts": attempts,
                            "cost_usd": cost,
                            **result,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    out = media.mapInPandas(op, schema=VISION_OUT_SCHEMA)
    out._vision_spent_accumulator = spent_acc  # observability handle
    return out
