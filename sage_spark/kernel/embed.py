"""Embedding kernel.

Production path: sentence-transformers all-mpnet-base-v2 (768-dim), loaded as
a per-executor singleton inside a scalar-iterator pandas UDF (the reference
lru-caches the model process-wide, app/utils.py:58-78). The model weights are
not available in this container, so the default embedder is a deterministic
hash-projection stand-in with the same interface and unit-norm output; the
north rule's P/R metric does not depend on embedding values.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_DIM = 64
EMBED_INPUT_MAX_CHARS = 5000  # services.py:1538, saia.py:1136


def hash_embedding(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit-norm vector derived from sha256 of the text.

    Stable across processes/partitions (no Python hash randomization), cheap,
    and collision-resistant enough that identical texts — and only identical
    texts, in practice — map to identical vectors.
    """
    digest = hashlib.sha256((text or "")[:EMBED_INPUT_MAX_CHARS].encode("utf-8")).digest()
    seed = int.from_bytes(digest[:8], "big", signed=False)
    rng = np.random.default_rng(seed)
    vec = rng.standard_normal(dim)
    norm = float(np.linalg.norm(vec))
    if norm == 0.0:  # pragma: no cover - standard_normal never all-zero
        return [0.0] * dim
    return (vec / norm).astype(np.float64).tolist()


class SentenceEmbedder:
    """Per-executor embedding singleton. Tries sentence-transformers first;
    falls back to the hash projection when the library or weights are
    unavailable."""

    _instance: "SentenceEmbedder | None" = None

    def __init__(self, model_name: str = "sentence-transformers/all-mpnet-base-v2", dim: int = DEFAULT_DIM) -> None:
        self.dim = dim
        self._model = None
        try:  # pragma: no cover - model not present in this container
            from sentence_transformers import SentenceTransformer  # noqa: PLC0415

            self._model = SentenceTransformer(model_name)
            self.dim = self._model.get_sentence_embedding_dimension()
        except Exception:
            self._model = None

    @classmethod
    def get(cls) -> "SentenceEmbedder":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def encode(self, texts: list[str]) -> list[list[float]]:
        if self._model is not None:  # pragma: no cover
            return [v.tolist() for v in self._model.encode([t[:EMBED_INPUT_MAX_CHARS] for t in texts])]
        return [hash_embedding(t, self.dim) for t in texts]
