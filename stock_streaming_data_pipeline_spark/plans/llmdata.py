"""LLM-training-data operators over ``documents`` / ``embeddings``.

Filled in incrementally: dedup (exact / n-gram Jaccard / MinHash-LSH /
SimHash), similarity search, text analysis, multimodal plumbing.
"""

from __future__ import annotations
