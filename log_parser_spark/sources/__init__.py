"""Sources & sinks: token-sequence table reader, lookup tables, atomic
write-audit-publish sink with snapshot manifest (Iceberg-style semantics)."""
