"""Relational operators re-expressing the reference's queue semantics.

Each module declares DataFrame transformations (never collect loops),
so Catalyst owns physical planning: scans get pushdown/pruning, joins
get broadcast/SMJ selection + AQE, aggregates get partial aggregation.
"""
