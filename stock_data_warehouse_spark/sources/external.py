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


def fetch_distributed(tickers: DataFrame,
                      fetcher: Callable[[str], float] = stub_fetcher,
                      pacing_sec: float = 0.0,
                      retry_once: bool = True) -> DataFrame:
    """Fan the per-key external fetch out over the cluster.

    - OP-T3: ``pacing_sec`` sleeps between requests *per partition* —
      the declarative form of the reference's global ``sleep(1)``; with
      P partitions the aggregate rate is P keys/pacing_sec.
    - OP-E2: one retry on :class:`TransientError` (F:136-140).
    - OP-E1: permanent failures emit ``ok=false`` rows (the caller
      filters), never abort the job.
    """

    def fetch_partition(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ticker in pdf["ticker"]:
                price, attempts, ok = None, 0, False
                for attempt in (1, 2) if retry_once else (1,):
                    attempts = attempt
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
