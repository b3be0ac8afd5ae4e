"""Provider plug-in registry (reference §2.8 extension point:
``historical/providers.py:6-12``, ``streaming/providers.py:6-12``).

A provider contributes: a fetch callable for historical bars (S1), a frame
iterator for live streams (S2), and exchange config (timezone, session
hours).  The engine core never imports a specific provider — services look
them up here, so adding a vendor is one ``register`` call.

Network clients are deliberately injectable: the bundled EODHD provider
ships a ``mock_fetch``/``mock_frames`` pair (the reference's CI mode,
``eodhd_historical_service.py:84-109``) so every engine semantic is
testable offline; a real deployment registers the same shape wrapping its
HTTP/WebSocket client.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class ExchangeConfig:
    """Reference eodhd_config.py:20-30."""

    timezone: str = "America/New_York"
    session_open: str = "09:30"
    session_close: str = "16:00"
    trading_days: tuple[int, ...] = (0, 1, 2, 3, 4)  # Mon-Fri


@dataclass
class Provider:
    name: str
    exchanges: dict[str, ExchangeConfig] = field(default_factory=dict)
    # (ticker, exchange, interval, start, end) -> list of raw bar dicts
    fetch_historical: Callable[..., list[dict[str, Any]]] | None = None
    # one-shot alternate transport tried on the first fetch failure (the
    # reference's IPv6 re-resolution, eodhd_historical_service.py:112-146)
    fetch_fallback: Callable[..., list[dict[str, Any]]] | None = None
    # (tickers, exchange, stream_type) -> iterator of raw frame dicts
    stream_frames: Callable[..., Any] | None = None


_REGISTRY: dict[str, Provider] = {}


def register(provider: Provider) -> None:
    _REGISTRY[provider.name] = provider


def get(name: str) -> Provider:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown provider {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def registered() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Bundled mock provider (offline CI mode)
# ---------------------------------------------------------------------------


def _mock_fetch(ticker, exchange, interval, start, end):
    """Deterministic fake bars shaped like the EODHD REST payloads
    (reference mock responses, eodhd_historical_service.py:84-109)."""
    if interval in ("d", "w", "m"):
        return [
            {
                "date": "2024-10-25",
                "open": 534.65,
                "high": 537.2601,
                "low": 531.414,
                "close": 532.26,
                "adjusted_close": 527.1013,
                "volume": 4327190,
            },
            {
                "date": "2024-10-28",
                "open": 535.00,
                "high": 538.00,
                "low": 533.00,
                "close": 537.00,
                "adjusted_close": 531.80,
                "volume": 4000000,
            },
        ]
    return [
        {
            "timestamp": 1751463000,
            "open": 617.23999,
            "high": 618.71997,
            "low": 616.609985,
            "close": 618.599975,
            "volume": 11824245,
        },
        {"timestamp": 1751466600, "open": 618.6, "high": 619.0, "low": 617.5, "close": 618.1, "volume": None},
    ]


def _mock_frames(tickers, exchange, stream_type):
    """Fake WebSocket frames (reference eodhd_streaming_service.py:193-204)."""
    if stream_type == "quotes":
        yield {"s": tickers[0], "t": 1755526651074, "ap": 643.205, "bp": 643.1985, "as": 1, "bs": 1}
        yield {"s": tickers[0], "t": 1755526652000, "ap": 643.25, "bp": 643.20, "as": 2, "bs": 1}
    else:
        yield {"s": tickers[0], "t": 1755526571834, "p": 643.155, "v": 10}
        yield {"s": tickers[0], "t": 1755526651074, "p": 642.99, "v": 7}


register(
    Provider(
        name="EODHD-mock",
        exchanges={"US": ExchangeConfig()},
        fetch_historical=_mock_fetch,
        stream_frames=_mock_frames,
    )
)
