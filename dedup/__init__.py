"""final_deduplicator_spark: a from-scratch PySpark-native near-duplicate
detection + clustering engine (the batch, set-at-a-time generalization of
AleKolar/Final_deduplicator's event-dedup semantics — see SURVEY.md §0).
"""

from .config import DedupConfig, DEFAULT_CONFIG

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
