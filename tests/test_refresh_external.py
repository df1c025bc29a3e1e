"""EP-2 refresh composition + external-source harness tests."""

import json
import os
import tempfile

from stock_data_warehouse_spark.pipeline import refresh_warehouse
from stock_data_warehouse_spark.sources.external import fetch_distributed


def test_refresh_warehouse_end_to_end_and_idempotent(spark):
    out = tempfile.mkdtemp()
    r1 = refresh_warehouse(spark, out)
    # fixture census: 3 lists, 9 unique tickers, 7 published,
    # FFF (no data) + III (no price) skipped
    assert (r1["lists"], r1["unique_tickers"]) == (3, 9)
    assert (r1["published"], r1["skipped"]) == (7, 2)
    assert r1["changed"] == 7

    # serving artifacts: one JSON per ticker + nested manifest
    files = sorted(os.listdir(os.path.join(out, "json")))
    assert files == [f"{t}.json" for t in
                     ("AAA", "BBB", "CC-C", "DDD", "EEE", "GGG", "HHH")]
    with open(os.path.join(out, "_manifest.json")) as f:
        doc = json.load(f)
    assert doc["lists"]["income"] == ["GGG", "HHH", "GGG", "III"]

    # second run: unchanged → publishes nothing (OP-T2 idempotence)
    r2 = refresh_warehouse(spark, out)
    assert r2["changed"] == 0 and r2["published"] == 7


def test_published_json_has_22_field_schema(spark):
    """OP-S5 byte-layout parity (VERDICT r2 item 4): the per-ticker
    file is literally ``{ticker}.json`` and carries the reference's
    full 22-field record (fetch_data.py:246-273,312-314)."""
    out = tempfile.mkdtemp()
    refresh_warehouse(spark, out)
    path = os.path.join(out, "json", "AAA.json")
    assert os.path.exists(path)
    with open(path) as f:
        rec = json.load(f)
    expected = {
        "ticker", "name", "price", "market_cap", "revenue_ttm",
        "net_income_ttm", "ocf_ttm", "capex_ttm", "sbc_ttm",
        "buyback_ttm", "total_debt", "cash_and_equivalents",
        "book_value_ttm", "shares_outstanding", "beta", "roe",
        "analyst_growth_estimate", "forward_eps", "dividend_yield",
        "sector_type", "currency_code", "last_updated",
    }
    assert set(rec) == expected and len(expected) == 22
    assert rec["ticker"] == "AAA" and rec["currency_code"] == "USD"


class _QuoteHandler:
    """Counting fixture server: GET /quote/{ticker} → {"price": ...}.
    Tickers ending in 'R' get one 503 before succeeding (transient);
    tickers starting with 'Z' always 404 (permanent). Request arrival
    times are recorded for the rate-limit assertion."""

    @staticmethod
    def make(state):
        import http.server
        import json as _json
        import time as _time

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                ticker = self.path.rsplit("/", 1)[-1]
                state["times"].append(_time.monotonic())
                state["count"] += 1
                if ticker.startswith("Z"):
                    self.send_response(404)
                    self.end_headers()
                    return
                if ticker.endswith("R") and ticker not in state["warm"]:
                    state["warm"].add(ticker)
                    self.send_response(503)
                    self.end_headers()
                    return
                body = _json.dumps(
                    {"price": float(sum(ticker.encode()) % 1000) + 0.5}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return Handler


def test_http_transport_with_token_bucket(spark):
    """OP-S4/T3 live-shaped demo (VERDICT r2 item 5): a real HTTP
    round-trip through mapInPandas against a local fixture, with the
    token bucket bounding the request rate and the 503→retry→200 path
    exercised end-to-end."""
    import http.server
    import threading
    import time as _time

    from stock_data_warehouse_spark.sources.external import http_fetcher

    state = {"count": 0, "warm": set(), "times": []}
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _QuoteHandler.make(state))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        tickers = ["AAPL", "MSFT", "NVDA", "AMZN", "GOOG", "METR",
                   "ZZZ", "TSLA"]
        df = spark.createDataFrame([(t,) for t in tickers],
                                   "ticker string").coalesce(1)
        t0 = _time.monotonic()
        rows = {r["ticker"]: r for r in fetch_distributed(
            df, fetcher=http_fetcher(base),
            rate_per_sec=25.0, burst=1).collect()}
        elapsed = _time.monotonic() - t0

        assert rows["AAPL"]["ok"] and rows["AAPL"]["attempts"] == 1
        # METR: 503 first, then 200 via the single retry (OP-E2)
        assert rows["METR"]["ok"] and rows["METR"]["attempts"] == 2
        # ZZZ: permanent 404 → skip-on-failure row (OP-E1)
        assert not rows["ZZZ"]["ok"] and rows["ZZZ"]["price"] is None
        # every request (retry included) hit the server exactly once
        assert state["count"] == len(tickers) + 1
        # token bucket: 9 requests at 25/s with burst 1 needs ≥ 8/25 s
        # of refill; assert with slack against timer jitter
        assert elapsed >= (state["count"] - 1) / 25.0 * 0.7, elapsed
    finally:
        srv.shutdown()
        srv.server_close()


def test_token_bucket_refill_and_burst():
    from stock_data_warehouse_spark.sources.external import TokenBucket
    import time as _time

    bucket = TokenBucket(rate=100.0, burst=3)
    t0 = _time.monotonic()
    for _ in range(3):
        bucket.acquire()  # burst drains instantly
    burst_t = _time.monotonic() - t0
    assert burst_t < 0.02, burst_t
    t1 = _time.monotonic()
    for _ in range(5):
        bucket.acquire()  # 5 more need ≥ 5/100 s of refill
    refill_t = _time.monotonic() - t1
    assert refill_t >= 0.05 * 0.7, refill_t


def test_fetch_distributed_retry_and_skip(spark):
    df = spark.createDataFrame(
        [("AAPL",), ("BRR",), ("ZZZ",)], "ticker string").coalesce(1)
    rows = {r["ticker"]: r for r in fetch_distributed(df).collect()}
    assert rows["AAPL"]["ok"] and rows["AAPL"]["attempts"] == 1
    # transient first attempt → retry-once succeeds (OP-E2)
    assert rows["BRR"]["ok"] and rows["BRR"]["attempts"] == 2
    # permanent failure → skip-on-failure row, job survives (OP-E1)
    assert not rows["ZZZ"]["ok"] and rows["ZZZ"]["price"] is None
