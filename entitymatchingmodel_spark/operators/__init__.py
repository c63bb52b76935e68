"""DataFrame operators: indexing, scoring, aggregation, dedup, ANN."""
