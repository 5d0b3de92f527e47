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


def enrich_spans(extracted: DataFrame, kinds=("heading", "caption")) -> DataFrame:
    """Attach an ``enrichment`` column to the selected span kinds via an
    Arrow-batched stage (the reference's per-page LLM loop, reshaped)."""
    target = extracted.filter(F.col("kind").isin(*kinds))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["enrichment"] = [_fake_llm(t or "") for t in pdf["text"]]
            yield pdf

    return target.mapInPandas(
        run,
        schema="doc_id string, kind string, text string, media_ref string, "
               "offset int, enrichment string",
    )
