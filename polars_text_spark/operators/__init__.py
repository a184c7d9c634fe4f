"""DataFrame -> DataFrame operators (jobs, not Column expressions)."""
