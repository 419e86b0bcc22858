"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. See each submodule's docstring for the
scale posture; everything is declarative DataFrame + JVM expressions,
with mapInPandas only where a codec genuinely needs Python."""

from . import dedup, hashing, multimodal, similarity, textstats  # noqa: F401
