"""Optional LLM enrichment stage (reference M4) — STUBBED client.

The reference can route pages/images through an OpenAI-compatible LLM
when ``use_llm`` is on (gate ``extraction_converter.py:157``; clients
``llm/hf_client.py``, ``llm/openai_client.py``; provider validation
``llm/provider_validator.py:21-97``).  Its default is OFF
(``globals.py:41``), and enrichment is outside the span-equality
invariant — so here the *dataflow* is real (an Arrow-batched mapInPandas
stage over heading/caption spans) while the client call is a
deterministic fake behind a NotImplementedError-guarded real path,
exactly like the multimodal decode stub.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# C5: provider normalization — lowercase/strip, alias map, fuzzy suggest
# (reference llm/provider_validator.py:49-97, difflib cutoff 0.6)
CANONICAL_PROVIDERS = ("openai", "anthropic", "huggingface", "together")
PROVIDER_ALIASES = {"hf": "huggingface", "oai": "openai", "gpt": "openai"}


def validate_provider(name: str) -> tuple[str | None, str | None]:
    """(canonical_name, suggestion) — canonical when valid/aliased, else
    a closest-match suggestion (difflib, cutoff 0.6) like the reference."""
    import difflib

    norm = (name or "").strip().lower()
    if norm in CANONICAL_PROVIDERS:
        return norm, None
    if norm in PROVIDER_ALIASES:
        return PROVIDER_ALIASES[norm], None
    close = difflib.get_close_matches(norm, CANONICAL_PROVIDERS, n=1, cutoff=0.6)
    return None, (close[0] if close else None)


def call_llm_real(prompt: str, provider: str):  # pragma: no cover
    """Real client path — no LLM SDK ships in this container."""
    raise NotImplementedError(
        "LLM enrichment requires an OpenAI-compatible client; this "
        "container ships none — the pipeline uses the deterministic stub"
    )


def _fake_llm(text: str) -> str:
    """Deterministic stand-in: a 'summary' that is a pure function of the
    input (first + last token, length)."""
    toks = text.split()
    if not toks:
        return "[empty]"
    return f"[{toks[0]}..{toks[-1]}|{len(toks)}w]"


def _fake_transport(prompts: list[str]) -> list[str]:
    """Default transport: deterministic fake, one 'response' per prompt."""
    return [_fake_llm(p or "") for p in prompts]


def real_transport(prompts: list[str]) -> list[str]:  # pragma: no cover
    """The real-path transport guard: swap in an OpenAI-compatible
    batch call here (reference ``llm/openai_client.py:31-63`` wraps the
    same chat-completions surface); absent SDK → explicit error."""
    raise NotImplementedError(
        "real LLM transport requires an OpenAI-compatible SDK; this "
        "container ships none"
    )


class TransientLLMError(Exception):
    """A retryable failure (HTTP 429/5xx analog): the client backs off
    and retries up to max_retries, then re-raises."""


class _TokenBucket:
    """Requests-per-second limiter (token bucket, thread-safe).  The
    clock/sleep hooks are injectable so tests run on a fake clock."""

    def __init__(self, rate: float, burst: int, clock=None, sleep=None):
        import threading
        import time as _time

        self.rate = float(rate)
        self.burst = int(burst)
        self.tokens = float(burst)
        self.clock = clock or _time.monotonic
        self.sleep = sleep or _time.sleep
        self.last = self.clock()
        self.lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self.lock:
                now = self.clock()
                self.tokens = min(
                    self.burst, self.tokens + (now - self.last) * self.rate
                )
                self.last = now
                if self.tokens >= 1.0:
                    self.tokens -= 1.0
                    return
                wait = (1.0 - self.tokens) / self.rate
            self.sleep(wait)


class BatchedLLMClient:
    """The production client shape the reference's per-page loop lacks:
    micro-batched requests, bounded concurrency, token-bucket rate
    limiting, exponential-backoff retries on transient errors — with the
    transport injectable (deterministic fake by default, real SDK via
    :func:`real_transport`).

    One instance per executor process (build it inside the mapInPandas
    closure): concurrency and rate limits are then per-executor, which
    is how a real cluster partitions a provider-wide request budget."""

    def __init__(
        self,
        transport=None,
        batch_size: int = 8,
        max_concurrency: int = 4,
        requests_per_sec: float = 50.0,
        max_retries: int = 3,
        backoff_base: float = 0.05,
        clock=None,
        sleep=None,
    ):
        import time as _time

        self.transport = transport or _fake_transport
        self.batch_size = int(batch_size)
        self.max_concurrency = int(max_concurrency)
        self.max_retries = int(max_retries)
        self.backoff_base = float(backoff_base)
        self.sleep = sleep or _time.sleep
        self.bucket = _TokenBucket(
            requests_per_sec, burst=max(1, int(requests_per_sec)),
            clock=clock, sleep=sleep,
        )

    def _call_with_retry(self, batch: list[str]) -> list[str]:
        attempt = 0
        while True:
            self.bucket.acquire()
            try:
                out = self.transport(batch)
                if len(out) != len(batch):  # a real API bug surface
                    raise ValueError(
                        f"transport returned {len(out)} responses "
                        f"for {len(batch)} prompts"
                    )
                return out
            except TransientLLMError:
                attempt += 1
                if attempt > self.max_retries:
                    raise
                self.sleep(self.backoff_base * (2 ** (attempt - 1)))

    def complete_many(self, prompts: list[str]) -> list[str]:
        """All prompts → responses, order-preserving: chunk into batches,
        run up to max_concurrency batches in flight."""
        from concurrent.futures import ThreadPoolExecutor

        prompts = list(prompts)
        batches = [
            prompts[i : i + self.batch_size]
            for i in range(0, len(prompts), self.batch_size)
        ]
        if not batches:
            return []
        with ThreadPoolExecutor(max_workers=self.max_concurrency) as pool:
            results = list(pool.map(self._call_with_retry, batches))
        return [r for batch_out in results for r in batch_out]


def enrich_spans(
    extracted: DataFrame,
    kinds=("heading", "caption"),
    client_factory=None,
) -> DataFrame:
    """Attach an ``enrichment`` column to the selected span kinds via an
    Arrow-batched stage (the reference's per-page LLM loop, reshaped):
    each executor batch goes through a :class:`BatchedLLMClient`
    (micro-batching + concurrency + rate limit + retries)."""
    target = extracted.filter(F.col("kind").isin(*kinds))
    factory = client_factory or BatchedLLMClient

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = factory()  # one client per executor task stream
        for pdf in batches:
            pdf = pdf.copy()
            pdf["enrichment"] = client.complete_many(
                [t or "" for t in pdf["text"]]
            )
            yield pdf

    return target.mapInPandas(
        run,
        schema="doc_id string, kind string, text string, media_ref string, "
               "offset int, enrichment string",
    )
