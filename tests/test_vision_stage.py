"""External-call stage (S8): retry containment, budget guard, binary
hygiene, and Arrow batch integrity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def media(spark):
    from datasheet_etl_spark.io import load_table
    from datasheet_etl_spark.operators.multimodal import synth_media

    docs = load_table(spark, SF_ORACLE, "documents").limit(60)
    return synth_media(docs).cache()


def test_ok_path_features_and_hygiene(spark, media):
    from datasheet_etl_spark.sources import vision_extract_stage

    out = vision_extract_stage(media)
    assert "content" not in out.columns  # payload dropped after the stage
    rows = out.collect()
    assert len(rows) == 60
    assert all(r["status"] == "ok" and r["attempts"] == 1 for r in rows)
    assert all(abs(r["cost_usd"] - 0.002) < 1e-12 for r in rows)
    assert all(r["n_chars"] > 0 for r in rows)


def test_flaky_client_retries_then_succeeds(spark, media):
    from datasheet_etl_spark.sources import FlakyMockVisionClient, vision_extract_stage

    out = vision_extract_stage(
        media,
        client_factory=lambda: FlakyMockVisionClient(fail_mod=3, fail_attempts=2),
        max_retries=3,
    ).collect()
    for r in out:
        if r["media_id"] % 3 == 0:
            assert r["status"] == "ok" and r["attempts"] == 3, r
            assert abs(r["cost_usd"] - 0.006) < 1e-12  # each attempt billed
        else:
            assert r["status"] == "ok" and r["attempts"] == 1, r


def test_exhausted_retries_fail_row_not_job(spark, media):
    from datasheet_etl_spark.sources import FlakyMockVisionClient, vision_extract_stage

    out = vision_extract_stage(
        media,
        client_factory=lambda: FlakyMockVisionClient(fail_mod=5, fail_attempts=99),
        max_retries=2,
    ).collect()
    failed = [r for r in out if r["media_id"] % 5 == 0]
    assert failed and all(
        r["status"].startswith("failed") and r["n_chars"] is None and r["attempts"] == 2
        for r in failed
    )
    assert all(r["status"] == "ok" for r in out if r["media_id"] % 5 != 0)


def test_budget_guard_skips_not_fails(spark, media):
    from datasheet_etl_spark.sources import vision_extract_stage

    # 60 rows × $0.002 = $0.12 full spend; cap well below it
    out = vision_extract_stage(media, budget_usd=0.03, rate_partitions=2)
    rows = out.collect()
    skipped = [r for r in rows if r["status"] == "skipped_budget"]
    ok = [r for r in rows if r["status"] == "ok"]
    assert len(rows) == 60 and skipped and ok
    assert all(r["cost_usd"] == 0.0 and r["n_chars"] is None for r in skipped)
    # pre-call guard: overshoot bounded by one in-flight call per partition
    spent = sum(r["cost_usd"] for r in rows)
    assert spent <= 0.03 + 2 * 0.002 + 1e-9
    # driver-side observability accumulator saw the same spend
    assert abs(out._vision_spent_accumulator.value - spent) < 1e-9


def test_rate_partitioning_bounds_concurrency(spark, media):
    from datasheet_etl_spark.sources import vision_extract_stage

    out = vision_extract_stage(media, rate_partitions=2)
    assert out.rdd.getNumPartitions() == 2


@pytest.fixture(scope="module")
def loopback_server():
    """A real HTTP endpoint on 127.0.0.1: POST body in, JSON features
    out — the same extraction contract as MockVisionClient, so the
    HTTP path must produce byte-identical stage output. /flaky returns
    503 for the first two hits of each distinct payload, proving the
    stage's in-UDF retry against genuine HTTP errors."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from datasheet_etl_spark.sources.vision import MockVisionClient

    hits: dict[bytes, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = self.rfile.read(int(self.headers["Content-Length"]))
            if self.path == "/flaky":
                with lock:
                    n = hits.get(payload, 0) + 1
                    hits[payload] = n
                if n <= 2:
                    self.send_response(503)
                    self.end_headers()
                    return
            body = json.dumps(MockVisionClient().extract(payload)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_client_end_to_end_matches_mock(spark, media, loopback_server):
    """S8's real path: urllib POST from executor Python workers to a
    live HTTP server; output must equal the in-process mock exactly."""
    from datasheet_etl_spark.sources import vision_extract_stage
    from datasheet_etl_spark.sources.vision import HttpVisionClient

    url = f"{loopback_server}/extract"
    via_http = vision_extract_stage(
        media, client_factory=lambda: HttpVisionClient(url)
    )
    via_mock = vision_extract_stage(media)
    a = sorted(map(tuple, via_http.collect()))
    b = sorted(map(tuple, via_mock.collect()))
    assert a == b
    assert all(r[1] == "ok" for r in a)


def test_http_client_retries_real_503(spark, media, loopback_server):
    """Each payload's first two POSTs return HTTP 503; the in-UDF retry
    must absorb them and land every row at attempts == 3."""
    from datasheet_etl_spark.sources import vision_extract_stage
    from datasheet_etl_spark.sources.vision import HttpVisionClient

    url = f"{loopback_server}/flaky"
    out = vision_extract_stage(
        media.limit(10),
        client_factory=lambda: HttpVisionClient(url),
        max_retries=3,
    ).collect()
    assert len(out) == 10
    assert all(r["status"] == "ok" and r["attempts"] == 3 for r in out)
