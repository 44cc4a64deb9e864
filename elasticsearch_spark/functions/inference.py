"""semantic_text plumbing (x-pack inference + ``SemanticTextFieldMapper`` /
``SemanticQueryBuilder``): a registry of inference models keyed by
inference_id, an ingest-time embed step, and the query-side text→vector
bridge.

The reference calls a served inference endpoint per chunk; none serves in
this environment, so the model registry is PLUGGABLE (production drop-in: a
batched client inside the same pandas UDF) and the default is a
deterministic feature-hashing bag-of-words embedder — a real embedding
(cosine similarity is meaningful: shared vocabulary ⇒ higher score), not a
mock, and byte-reproducible across runs/executors.

Scale shape: ingest embedding is one Arrow-batched pandas UDF over the text
column (embarrassingly parallel, no shuffle); the query embedding is one
driver-side call on one string. The semantic query itself then runs the
exact knn path (JVM zip_with dot product, TakeOrderedAndProject top-k).
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# inference_id -> batch embedder: list[str] -> list[list[float]]
INFERENCE_MODELS: dict[str, object] = {}


def register_inference(inference_id: str, fn) -> None:
    """PUT /_inference/{id} analog: register a batch text-embedding model."""
    INFERENCE_MODELS[inference_id] = fn


def hash_embed(texts: list[str], dims: int = 64) -> list[list[float]]:
    """Deterministic feature-hashing embedder (the default model): each
    token's md5 picks a dimension and a sign, counts accumulate, the vector
    L2-normalizes. Same text → same vector, everywhere, forever."""
    out = []
    for t in texts:
        v = [0.0] * dims
        for tok in _TOKEN_RE.findall((t or "").lower()):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            v[h % dims] += 1.0 if (h >> 8) % 2 else -1.0
        n = math.sqrt(sum(x * x for x in v))
        out.append([x / n for x in v] if n else v)
    return out


def _resolve(inference_id: str):
    """'' / 'hash_embed' → the deterministic default; any OTHER unknown id
    refuses loudly (matching the completion registry's contract) — a silent
    hash_embed fallback would embed queries in a different space than the
    registered model embedded the documents, and knn would return garbage
    similarities with zero diagnostics."""
    if inference_id in ("", "hash_embed"):
        return hash_embed
    if inference_id not in INFERENCE_MODELS:
        raise KeyError(
            f"unknown inference id {inference_id!r}; register it with "
            "register_inference() (the deterministic default is '' / 'hash_embed')")
    return INFERENCE_MODELS[inference_id]


def embed_text(text: str, inference_id: str = "", dims: int = 64) -> list[float]:
    """Query-side single-string embedding (driver, one tiny call)."""
    fn = _resolve(inference_id)
    return (fn(texts=[text], dims=dims) if fn is hash_embed else fn([text]))[0]


def embed_column(
    df: DataFrame,
    field: str,
    inference_id: str = "",
    dims: int = 64,
    out_col: str | None = None,
) -> DataFrame:
    """Ingest-time semantic_text step: adds ``{field}__embedding``
    (array<float>) via one Arrow-batched pandas UDF. The model function is
    captured in the closure (cloudpickle ships it to executors — same
    model as analysis.tokens_udf uses for custom chains)."""
    fn = _resolve(inference_id)

    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(s: pd.Series) -> pd.Series:
        texts = ["" if x is None else str(x) for x in s]
        vecs = fn(texts=texts, dims=dims) if fn is hash_embed else fn(texts)
        return pd.Series(vecs)

    return df.withColumn(out_col or f"{field}__embedding", _udf(F.col(field)))


# completion_id -> batch completion model: list[str] -> list[str]
# (the reference's completion task type — an LLM endpoint; none serves in
# this environment, so registration is mandatory and there is NO fake
# default: an unregistered id refuses loudly)
COMPLETION_MODELS: dict[str, object] = {}


def register_completion(inference_id: str, fn) -> None:
    """PUT /_inference/completion/{id} analog: register a batch
    prompt→completion model (``list[str] -> list[str]``)."""
    COMPLETION_MODELS[inference_id] = fn


def completion_column(
    df: DataFrame,
    prompt_col: str,
    inference_id: str,
    out_col: str = "completion",
) -> DataFrame:
    """Batch completion over a prompt column via one Arrow-batched pandas
    UDF (the ES|QL COMPLETION command's execution shape: the reference
    streams row batches to the inference endpoint; here the registered
    model function receives the same batches executor-side)."""
    if inference_id not in COMPLETION_MODELS:
        raise ValueError(
            f"no completion model registered under {inference_id!r} "
            "(register_completion first — this engine ships no LLM)"
        )
    fn = COMPLETION_MODELS[inference_id]

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        prompts = ["" if x is None else str(x) for x in s]
        return pd.Series(fn(prompts))

    return df.withColumn(out_col, _udf(F.col(prompt_col)))
