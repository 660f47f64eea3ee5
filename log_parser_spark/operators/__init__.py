"""Dataflow operators: parse, enrich, route, aggregate, top-N, sessionize,
dedup, similarity, text-stats — the SURVEY.md §2 inventory re-expressed as
DataFrame transformations."""
