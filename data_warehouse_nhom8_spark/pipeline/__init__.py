"""Pipeline composites: the reference's ELT flows re-expressed as
single Catalyst plans + a parquet-backed run ledger."""
