"""External-API source harness — OP-S4, OP-E2, OP-T3 (SURVEY.md §2.1).

The reference fetches each ticker over HTTPS inside a sequential loop
with ``sleep(1)`` pacing and one retry (fetch_data.py:134-140,316). The
Spark shape is a ``mapInPandas`` fan-out: each partition opens its own
connection pool, paces itself, retries transient failures once, and
emits nulls for permanent failures (skip-on-failure, OP-E1) — so a
1000-executor cluster fetches 1000-wide while honoring a per-partition
rate limit.

The transport is injectable; the default is a deterministic stub
(no network in this container). Swapping in a real HTTP client changes
only ``fetcher``.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType([
    T.StructField("ticker", T.StringType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("attempts", T.IntegerType()),
    T.StructField("ok", T.BooleanType()),
])


class TransientError(Exception):
    """Retryable failure (the reference's info-fetch hiccup, F:136-140)."""


def stub_fetcher(ticker: str) -> float:
    """Deterministic stand-in for the yfinance call: fails transiently
    once for tickers ending in 'R', permanently for tickers starting
    with 'Z' (the ANSS/REALTY/TSMC skip census), else returns a price
    derived from the ticker bytes."""
    if ticker.startswith("Z"):
        raise ValueError(f"no data for {ticker}")
    if ticker.endswith("R") and not getattr(stub_fetcher, "_warm", set()) \
            .__contains__(ticker):
        warm = getattr(stub_fetcher, "_warm", set())
        warm.add(ticker)
        stub_fetcher._warm = warm
        raise TransientError(f"transient for {ticker}")
    return float(sum(ticker.encode()) % 1000) + 0.5


class TokenBucket:
    """Per-partition token-bucket rate limiter (OP-T3 proper form).

    ``rate`` tokens/second refill, ``burst`` capacity; every request
    consumes one token and blocks until one is available. This is what
    the reference's ``sleep(1)`` (fetch_data.py:316) actually encodes —
    "≤ 1 request/second to the upstream" — but bucket-shaped: short
    bursts up to ``burst`` are allowed, the sustained rate is bounded,
    and the limiter composes with retries (a retry consumes a token
    too). One bucket per partition ⇒ a P-partition job sustains at
    most P·rate aggregate requests/second — size P to the upstream's
    documented quota."""

    def __init__(self, rate: float, burst: int = 1):
        if rate <= 0:
            raise ValueError("rate must be > 0")
        self.rate = float(rate)
        self.capacity = float(max(1, burst))
        self.tokens = self.capacity
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity,
                              self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            time.sleep((1.0 - self.tokens) / self.rate)


def http_fetcher(base_url: str,
                 timeout_sec: float = 5.0) -> Callable[[str], float]:
    """A real (stdlib-urllib) HTTP transport for :func:`fetch_distributed`:
    GET ``{base_url}/quote/{ticker}`` expecting ``{"price": <float>}``.
    5xx responses and socket errors raise :class:`TransientError` (the
    retryable class); 4xx and malformed bodies are permanent failures.
    The returned closure captures only strings/floats, so it pickles to
    executors. Used against a local fixture server in the tests — the
    live-connector shape without any network dependency in CI."""

    def fetch(ticker: str) -> float:
        import json as _json
        import urllib.error
        import urllib.request
        url = f"{base_url}/quote/{ticker}"
        try:
            with urllib.request.urlopen(url, timeout=timeout_sec) as r:
                body = _json.loads(r.read().decode("utf-8"))
        except urllib.error.HTTPError as exc:
            if exc.code >= 500:
                raise TransientError(f"{ticker}: HTTP {exc.code}")
            raise ValueError(f"{ticker}: HTTP {exc.code}")
        except OSError as exc:  # conn refused/reset, timeout
            raise TransientError(f"{ticker}: {exc}")
        price = body.get("price")
        if price is None:
            raise ValueError(f"{ticker}: no price in response")
        return float(price)

    return fetch


def fetch_distributed(tickers: DataFrame,
                      fetcher: Callable[[str], float] = stub_fetcher,
                      pacing_sec: float = 0.0,
                      retry_once: bool = True,
                      rate_per_sec: float | None = None,
                      burst: int = 1) -> DataFrame:
    """Fan the per-key external fetch out over the cluster.

    - OP-T3: ``rate_per_sec`` installs a :class:`TokenBucket` per
      partition — every request (retries included) consumes a token,
      so the sustained upstream rate is bounded at P·rate_per_sec for
      P partitions. ``pacing_sec`` remains as the simpler fixed-sleep
      throttle (the literal ``sleep(1)`` shape); use one or the other.
    - OP-E2: one retry on :class:`TransientError` (F:136-140).
    - OP-E1: permanent failures emit ``ok=false`` rows (the caller
      filters), never abort the job.
    """

    def fetch_partition(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate_per_sec, burst) if rate_per_sec else None
        for pdf in batches:
            out = []
            for ticker in pdf["ticker"]:
                price, attempts, ok = None, 0, False
                for attempt in (1, 2) if retry_once else (1,):
                    attempts = attempt
                    if bucket is not None:
                        bucket.acquire()
                    try:
                        price = fetcher(ticker)
                        ok = True
                        break
                    except TransientError:
                        time.sleep(pacing_sec)
                        continue
                    except Exception:
                        break
                out.append((ticker, price, attempts, ok))
                if pacing_sec:
                    time.sleep(pacing_sec)
            yield pd.DataFrame(
                out, columns=["ticker", "price", "attempts", "ok"])

    return tickers.select("ticker").mapInPandas(
        fetch_partition, schema=FETCH_SCHEMA)
