"""LLM provider adapters for the batch executor (reference: llm_executor.py).

The reference implements OpenAI and Anthropic HTTP adapters with an
asyncio semaphore and retry loop (llm_executor.py:234-248) and falls
back to a keyless mock provider. Here each adapter is a plain
``list[str] -> list[str]`` callable executed inside
``SparkLLMExecutor``'s Arrow-batch loop on executors — cluster
parallelism replaces the semaphore (concurrency = partitions), and the
executor's bounded-attempt retry wraps every batch.

Only public HTTP APIs and env-keyed credentials are used
(``OPENAI_API_KEY`` / ``ANTHROPIC_API_KEY``); with no key configured,
``get_provider`` returns the deterministic offline mock, exactly like
the reference's keyless path (llm_executor.py:411-432). stdlib urllib
keeps executors dependency-free.
"""

from __future__ import annotations

import json
import os
import urllib.request
from collections.abc import Callable

from .executor import mock_provider

OPENAI_URL = "https://api.openai.com/v1/chat/completions"
ANTHROPIC_URL = "https://api.anthropic.com/v1/messages"
ANTHROPIC_VERSION = "2023-06-01"

DEFAULT_MODELS = {
    "openai": "gpt-3.5-turbo",  # reference llm_executor.py:37 default
    "anthropic": "claude-3-5-haiku-latest",
}

# Reference cost tiers (llm_executor.py:310-316): GPT-4-family models
# bill at 30x/30x the base per-token rates, selected by substring —
# the same `"gpt-4" in model` test the reference uses.
BASE_PROMPT_RATE = 0.000001
BASE_COMPLETION_RATE = 0.000002
GPT4_PROMPT_RATE = 0.00003
GPT4_COMPLETION_RATE = 0.00006


def token_rates(model: str | None) -> tuple[float, float]:
    """(prompt_rate, completion_rate) per token for ``model``."""
    if model and "gpt-4" in model:
        return GPT4_PROMPT_RATE, GPT4_COMPLETION_RATE
    return BASE_PROMPT_RATE, BASE_COMPLETION_RATE


def _post_json(url: str, headers: dict, payload: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def openai_provider(
    model: str,
    api_key: str,
    max_tokens: int = 1024,
    timeout: float = 60.0,
    url: str = OPENAI_URL,
) -> Callable[[list[str]], list[str]]:
    """Chat-completions adapter; one request per prompt, per batch."""

    def call(prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            body = _post_json(
                url,
                {"Authorization": f"Bearer {api_key}"},
                {
                    "model": model,
                    "max_tokens": max_tokens,
                    "messages": [{"role": "user", "content": p}],
                },
                timeout,
            )
            out.append(body["choices"][0]["message"]["content"])
        return out

    return call


def anthropic_provider(
    model: str,
    api_key: str,
    max_tokens: int = 1024,
    timeout: float = 60.0,
    url: str = ANTHROPIC_URL,
) -> Callable[[list[str]], list[str]]:
    """Messages-API adapter; one request per prompt, per batch."""

    def call(prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            body = _post_json(
                url,
                {"x-api-key": api_key, "anthropic-version": ANTHROPIC_VERSION},
                {
                    "model": model,
                    "max_tokens": max_tokens,
                    "messages": [{"role": "user", "content": p}],
                },
                timeout,
            )
            out.append("".join(b.get("text", "") for b in body["content"]))
        return out

    return call


def get_provider(
    name: str = "openai", model: str | None = None
) -> tuple[Callable[[list[str]], list[str]], str, bool]:
    """Resolve (provider_callable, model_name, is_mock).

    Keyless environments get the deterministic mock — the pipeline
    always runs, like the reference's keyless fallback.
    """
    model = model or os.environ.get("LLM_MODEL") or DEFAULT_MODELS.get(name)
    if model is None:
        raise ValueError(f"unknown provider: {name!r}")
    if name == "openai":
        key = os.environ.get("OPENAI_API_KEY")
        if key:
            return openai_provider(model, key), model, False
    elif name == "anthropic":
        key = os.environ.get("ANTHROPIC_API_KEY")
        if key:
            return anthropic_provider(model, key), model, False
    else:
        raise ValueError(f"unknown provider: {name!r}")
    return (lambda prompts: mock_provider(prompts, model)), model, True
