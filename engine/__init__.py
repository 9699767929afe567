"""PySpark-native inverted-index + BM25 engine (spark-graft of
BD2KGenomics/dcc-metadata-indexer's delegated Elasticsearch search layer).

See SURVEY.md for the blueprint. The reference checkout at /root/reference
is empty (SURVEY.md §0); reference anchors cite the public repo's
reconstructed structure and BASELINE.json's authoritative north rule.
"""

from engine.config import IndexConfig

__all__ = ["IndexConfig"]
